#!/usr/bin/env python3
"""Generate the committed WARC fixture corpus under src/main/resources/graft/warc/.

The fixture backs the `warc_host_stats` driver-contract query: its oracle is
a VALUES literal of exact per-host (n_docs, n_chars) counts derived HERE,
independently of the Scala parser, from the body strings below. Re-running
this script is deterministic (no timestamps, fixed record order).

Expected host rollup (responses only; text = body after the first blank
line; host = lowercased URL host, '' when the URL has none):

  host           n_docs  n_chars
  ''             1       13     ("no url record")
  alpha.example  3       44     (14 "alpha page one" + 21 "alpha page two longer"
                                 + 9 "case host")
  beta.example   2       26     (9 "beta body" + 17 "beta second page!")
  gamma.example  1       0      (header-only response: empty text)
"""
import gzip
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                   "resources", "graft", "warc")


def record(wtype, url, block):
    head = "WARC/1.0\r\n" + f"WARC-Type: {wtype}\r\n"
    if url is not None:
        head += f"WARC-Target-URI: {url}\r\n"
    head += ("WARC-Date: 2024-01-01T00:00:00Z\r\n"
             f"Content-Length: {len(block)}\r\n\r\n")
    return head.encode("ascii") + block + b"\r\n\r\n"


def http(body):
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + body.encode("ascii"))


OUT_URLS = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                        "resources", "graft", "warc_urls")

# Second fixture (graft/warc_urls): URL VARIANTS of the same pages, backing
# the `warc_url_dedup` driver row. Expected canonical-URL rollup (responses
# only; canonicalUrl = lowercase, strip scheme + leading www., drop ?query/
# #fragment, trim trailing slash; keep_url = lexicographic min raw url):
#
#   canon_url          keep_url                       n_fetches  n_raw_urls
#   alpha.example/a    http://alpha.example/a         5          4
#   beta.example       http://beta.example/           2          2
#   beta.example/page  http://beta.example/page?id=1  2          2


def main():
    os.makedirs(OUT, exist_ok=True)
    part0 = (
        # a request record: must be excluded from documents
        record("request", "http://alpha.example/a",
               b"GET /a HTTP/1.1\r\nHost: alpha.example\r\n")
        + record("response", "http://alpha.example/a", http("alpha page one"))
        + record("response", "http://alpha.example/b",
                 http("alpha page two longer"))
        + record("response", "http://beta.example/x", http("beta body"))
        # scheme/host case must normalize to alpha.example
        + record("response", "HTTPS://Alpha.example/c", http("case host"))
        # header-only response: empty text (the ANSI divide-guard case)
        + record("response", "http://gamma.example/empty",
                 b"HTTP/1.1 204 No Content\r\n\r\n")
        # metadata record: also excluded
        + record("metadata", "http://alpha.example/a", b"fetchTimeMs: 12\r\n")
    )
    with open(os.path.join(OUT, "cc-000.warc"), "wb") as f:
        f.write(part0)

    part1 = (
        record("response", "http://beta.example/y", http("beta second page!"))
        # no WARC-Target-URI header: url '', host ''
        + record("response", None, http("no url record"))
    )
    # mtime=0 keeps the gzip bytes deterministic across runs
    with open(os.path.join(OUT, "cc-001.warc.gz"), "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(part1)
    print(f"wrote {OUT}/cc-000.warc and cc-001.warc.gz")

    os.makedirs(OUT_URLS, exist_ok=True)
    urls0 = (
        # request record: excluded from documents, exercises type filtering
        record("request", "http://alpha.example/a",
               b"GET /a HTTP/1.1\r\nHost: alpha.example\r\n")
        + record("response", "http://alpha.example/a", http("alpha one"))
        # leading www. strips to the same canonical page
        + record("response", "http://www.alpha.example/a", http("alpha two"))
        # scheme/host case + tracking query + fragment all normalize away
        + record("response", "https://ALPHA.example/a?utm_source=news#frag",
                 http("alpha three"))
        # trailing slash trims
        + record("response", "http://alpha.example/a/", http("alpha four"))
        # exact raw refetch: n_fetches > n_raw_urls
        + record("response", "http://alpha.example/a", http("alpha refetch"))
    )
    with open(os.path.join(OUT_URLS, "cc-urls-000.warc"), "wb") as f:
        f.write(urls0)
    urls1 = (
        # root with and without trailing slash / scheme variant
        record("response", "http://beta.example/", http("beta root"))
        + record("response", "https://beta.example", http("beta root again"))
        # same page, distinct query params: one canonical page
        + record("response", "http://beta.example/page?id=1", http("beta page 1"))
        + record("response", "http://beta.example/page?id=2", http("beta page 2"))
    )
    with open(os.path.join(OUT_URLS, "cc-urls-001.warc.gz"), "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(urls1)
    print(f"wrote {OUT_URLS}/cc-urls-000.warc and cc-urls-001.warc.gz")


if __name__ == "__main__":
    main()
