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


if __name__ == "__main__":
    main()
