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

    make_html_fixture()
    make_block_fixture()


# Third fixture (graft/warc_html): genuine HTML pages backing the
# `warc_html_extract` driver row — the HTML→text stage every web-corpus
# pipeline (CCNet / C4 / FineWeb) runs before any quality gate. The
# expected (title, text) pairs below are derived BY HAND from the page
# markup under the documented extraction rules (head/script/style/comment
# blocks dropped, block-closing tags and <br> become newlines, remaining
# tags become spaces, the core entity set decodes, whitespace collapses),
# independently of the Scala implementation; n_chars = len(text) is
# printed by this script for the oracle literal.

PAGE_A = """<!DOCTYPE html>
<html lang="en">
<head>
<title> Site A &amp; Friends </title>
<style type="text/css">
body { color: #333; }
</style>
<script>
var trap = "<p>not body text</p>";
</script>
</head>
<body>
<!-- nav boilerplate: <p>hidden</p> -->
<h1>Welcome</h1>
<p>First&nbsp;paragraph with <b>bold</b> and a <a href="/x">link</a>.</p>
<p>Maths: 3 &lt; 4 &gt; 2, &quot;quoted&quot;, it&#39;s fine.</p>
<ul>
<li>alpha</li>
<li>beta</li>
</ul>
</body>
</html>"""
# hand-derived: title text lives in <head> so it is NOT body text; inline
# closing tags (</a>, </b>) become spaces, hence "link ." with the
# documented space before the period
PAGE_A_TITLE = "Site A & Friends"
PAGE_A_TEXT = ("Welcome\n"
               "First paragraph with bold and a link .\n"
               "Maths: 3 < 4 > 2, \"quoted\", it's fine.\n"
               "alpha\n"
               "beta")

PAGE_B = """<html><body><div>Line one<br>Line two<br/>and &amp; three.</div>
<script type="text/javascript">document.write("<ul><li>spam</li></ul>");</script>
</body></html>"""
# hand-derived: no <title> anywhere -> title ''; both <br> spellings break
# lines; the fake list markup inside the script string must NOT surface
PAGE_B_TITLE = ""
PAGE_B_TEXT = "Line one\nLine two\nand & three."

# plain-text record: no tags, '<' with no closing '>' survives as text,
# bare '&' (not an entity) survives, runs of spaces collapse
PLAIN_BODY = "no markup: 1 < 2, just   text &  spaces"
PLAIN_TITLE = ""
PLAIN_TEXT = "no markup: 1 < 2, just text & spaces"

PAGE_C = """<html><head><title>C &lt;3 page</title></head><body>
<table><tr><td>k</td><td>v</td></tr></table>
<p>Done&nbsp;&nbsp;here.</p>
</body></html>"""
# hand-derived: title decodes &lt;; <td> cells join with spaces, </tr> and
# </table> break lines, double &nbsp; collapses to one space
PAGE_C_TITLE = "C <3 page"
PAGE_C_TEXT = "k v\nDone here."


# Fourth fixture (graft/warc_block): hosts exercising the URL/domain
# blocklist gate (`url_filter` driver row) — the C4/RefinedWeb badlist
# filter that runs before anything else touches the bytes. Blocklist
# entries (WarcSource.UrlBlocklist): 'tracker.example' (registered-domain
# rule) and 'spam.good.example' (exact-host rule). An entry blocks host h
# iff h == entry OR h ends with '.' + entry (dot-boundary: the lookalike
# 'nottracker.example' must NOT match 'tracker.example'). Expected audit
# rows, derived BY HAND from the URLs below (host = lowercased URL host,
# '' when absent; rule = the MOST SPECIFIC matching entry, '' when clean):
#
#   url                                   host                    blocked rule
#   ''                                    ''                      false   ''
#   http://ads.tracker.example/pixel      ads.tracker.example     true    tracker.example
#   http://good.example/page              good.example            false   ''
#   http://localhost/x                    localhost               false   ''
#   http://nottracker.example/ok          nottracker.example      false   ''
#   http://shop.spam.good.example/buy2    shop.spam.good.example  true    spam.good.example
#   http://spam.good.example/buy          spam.good.example       true    spam.good.example
#   http://tracker.example/lp             tracker.example         true    tracker.example
#   https://Deep.Sub.TRACKER.example/x    deep.sub.tracker.example true   tracker.example
def make_block_fixture():
    out = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                       "resources", "graft", "warc_block")
    os.makedirs(out, exist_ok=True)
    part0 = (
        # request record: excluded from documents
        record("request", "http://good.example/page",
               b"GET /page HTTP/1.1\r\nHost: good.example\r\n")
        + record("response", "http://good.example/page", http("good page"))
        + record("response", "http://tracker.example/lp", http("tracker lp"))
        + record("response", "http://ads.tracker.example/pixel", http("pixel"))
        # case-insensitive host normalization on a deep subdomain
        + record("response", "https://Deep.Sub.TRACKER.example/x", http("deep"))
        # lookalike host: suffix match must respect the dot boundary
        + record("response", "http://nottracker.example/ok", http("lookalike"))
    )
    with open(os.path.join(out, "cc-block-000.warc"), "wb") as f:
        f.write(part0)
    part1 = (
        record("response", "http://spam.good.example/buy", http("spam host"))
        + record("response", "http://shop.spam.good.example/buy2",
                 http("spam sub"))
        # single-label host: the suffix chain degenerates to [host]
        + record("response", "http://localhost/x", http("local"))
        # no WARC-Target-URI: url '', host '', clean
        + record("response", None, http("no url"))
    )
    with open(os.path.join(out, "cc-block-001.warc.gz"), "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(part1)
    print(f"wrote {out}/cc-block-000.warc and cc-block-001.warc.gz")


def make_html_fixture():
    out = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                       "resources", "graft", "warc_html")
    os.makedirs(out, exist_ok=True)

    def http_typed(body, ctype):
        return ((f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n\r\n")
                .encode("ascii") + body.encode("ascii"))

    part0 = (
        # request record: excluded from documents
        record("request", "http://site-a.example/index",
               b"GET /index HTTP/1.1\r\nHost: site-a.example\r\n")
        + record("response", "http://site-a.example/index",
                 http_typed(PAGE_A, "text/html"))
        + record("response", "http://site-b.example/post",
                 http_typed(PAGE_B, "text/html"))
        + record("response", "http://plain.example/readme",
                 http_typed(PLAIN_BODY, "text/plain"))
        # header-only response: empty body -> empty text, empty title
        + record("response", "http://site-b.example/empty",
                 b"HTTP/1.1 204 No Content\r\n\r\n")
    )
    with open(os.path.join(out, "cc-html-000.warc"), "wb") as f:
        f.write(part0)

    part1 = (
        record("response", "http://site-c.example/nested",
               http_typed(PAGE_C, "text/html"))
        # metadata record: excluded from documents
        + record("metadata", "http://site-c.example/nested",
                 b"fetchTimeMs: 7\r\n")
    )
    with open(os.path.join(out, "cc-html-001.warc.gz"), "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(part1)
    print(f"wrote {out}/cc-html-000.warc and cc-html-001.warc.gz")
    print("expected warc_html_extract rows (url, title, n_chars):")
    for url, title, text in [
        ("http://plain.example/readme", PLAIN_TITLE, PLAIN_TEXT),
        ("http://site-a.example/index", PAGE_A_TITLE, PAGE_A_TEXT),
        ("http://site-b.example/empty", "", ""),
        ("http://site-b.example/post", PAGE_B_TITLE, PAGE_B_TEXT),
        ("http://site-c.example/nested", PAGE_C_TITLE, PAGE_C_TEXT),
    ]:
        print(f"  {url!r:36} {title!r:22} {len(text)}")


# Sixth fixture (graft/warc_links): anchor-rich pages backing the
# `html_links` driver row — the crawl-graph extraction every Common Crawl
# derivative ships (outlinks + anchor text). Extraction rules (pinned):
# only double-quoted href attributes match (the dominant crawl form — the
# single-quoted page below proves the pin); (?is) so tags match in any
# case across lines; anchor text = inner tags -> spaces, entities decoded,
# whitespace collapsed, trimmed; <a> without href is not a link. Expected
# rows, derived BY HAND from the markup below:
#
#   url                       href                        anchor
#   http://hub.example/start  http://alpha.example/a      Alpha & Co
#   http://hub.example/start  http://alpha.example/a2     Alpha & Co
#   http://hub.example/start  /local/page                 the local page
#   http://hub.example/start  http://beta.example/b?q=1   beta list
#   http://upper.example/g    HTTP://Gamma.example/G      Gamma Page
#   (http://nolinks.example/t and http://squote.example/s yield no rows)
# The second alpha link repeats the SAME anchor text at a different href,
# so the anchor_texts rollup has a domain with n_links=2, n_unique=1.
PAGE_LINKS_HUB = (
    '<html><body>\n'
    '<p>See <a href="http://alpha.example/a">Alpha &amp; Co</a> and\n'
    '<a class="x" href="/local/page">the <b>local</b> page</a>.</p>\n'
    '<a href="http://beta.example/b?q=1">beta  list</a>\n'
    '<a href="http://alpha.example/a2">Alpha &amp; Co</a>\n'
    '<a name="x">no href anchor</a>\n'
    '</body></html>')
PAGE_LINKS_UPPER = '<HTML><BODY><A HREF="HTTP://Gamma.example/G">Gamma\nPage</A></BODY></HTML>'
PAGE_LINKS_NONE = '<html><body><p>plain text, zero anchors</p></body></html>'
PAGE_LINKS_SQUOTE = "<html><body><a href='/sq'>single quoted is not matched</a></body></html>"


def make_links_fixture():
    out = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                       "resources", "graft", "warc_links")
    os.makedirs(out, exist_ok=True)
    part0 = (
        record("request", "http://hub.example/start",
               b"GET /start HTTP/1.1\r\nHost: hub.example\r\n")
        + record("response", "http://hub.example/start",
                 http(PAGE_LINKS_HUB))
        + record("response", "http://nolinks.example/t",
                 http(PAGE_LINKS_NONE))
    )
    with open(os.path.join(out, "cc-links-000.warc"), "wb") as f:
        f.write(part0)
    part1 = (
        record("response", "http://upper.example/g", http(PAGE_LINKS_UPPER))
        + record("response", "http://squote.example/s",
                 http(PAGE_LINKS_SQUOTE))
    )
    with open(os.path.join(out, "cc-links-001.warc.gz"), "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(part1)
    print(f"wrote {out}/cc-links-000.warc and cc-links-001.warc.gz")


# Seventh + eighth fixtures (graft/wet, graft/wat): the OTHER two formats
# Common Crawl publishes alongside WARC (VERDICT r12 #2). Both are the same
# Content-Length-framed record walk — only the record type and block
# payload differ:
#
#   WET  - `conversion` records; block = the EXTRACTED PLAIN TEXT of the
#          page (no HTTP headers). This fixture's bodies are the HAND-
#          DERIVED extraction strings of the graft/warc_html pages
#          (PAGE_*_TEXT above), so a conformance spec can assert
#          documentsFromWet(wet) == htmlExtract(documentsFromWarc(html))
#          text-for-text by URL.
#   WAT  - `metadata` records; block = a JSON envelope
#          (Envelope.Payload-Metadata.HTTP-Response-Metadata.{Response-
#          Message.Status, Headers.Content-Type, HTML-Metadata.{Head.
#          Title, Links[{path,url,text}]}}). This fixture's Links arrays
#          are the HAND-DERIVED link rows of the graft/warc_links pages,
#          so wat_outlinks must equal html_links row-for-row.
#
# Expected wet_host_stats rollup (conversion records only; text = whole
# block; host = lowercased URL host):
#
#   host            n_docs  n_chars
#   plain.example   1       36
#   site-a.example  1       96
#   site-b.example  2       30      (30 "Line one..." + 0 empty)
#   site-c.example  1       14
#
# Expected wat_page_meta rows (url, status, content_type, title, n_links):
#
#   http://hub.example/start    200  text/html  ''           4
#   http://nolinks.example/t    200  text/html  ''           0
#   http://squote.example/s     404  text/html  Not Found    0
#   http://upper.example/g      200  text/html  Upper Gamma  1
def make_wet_wat_fixture():
    import json
    out_wet = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                           "resources", "graft", "wet")
    out_wat = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                           "resources", "graft", "wat")
    os.makedirs(out_wet, exist_ok=True)
    os.makedirs(out_wat, exist_ok=True)

    def conversion(url, text):
        return record("conversion", url, text.encode("ascii"))

    # warcinfo preamble (real WET/WAT files start with one; must be
    # excluded by the conversion/metadata type filter)
    info = record("warcinfo", None, b"software: graft-fixture\r\n")

    wet0 = (info
            + conversion("http://site-a.example/index", PAGE_A_TEXT)
            + conversion("http://site-b.example/post", PAGE_B_TEXT)
            + conversion("http://plain.example/readme", PLAIN_TEXT))
    with open(os.path.join(out_wet, "cc-000.warc.wet"), "wb") as f:
        f.write(wet0)
    wet1 = (conversion("http://site-b.example/empty", "")
            + conversion("http://site-c.example/nested", PAGE_C_TEXT))
    with open(os.path.join(out_wet, "cc-001.warc.wet.gz"), "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(wet1)
    print(f"wrote {out_wet}/cc-000.warc.wet and cc-001.warc.wet.gz")
    print("expected wet_host_stats rows (host, n_docs, n_chars):")
    stats = {}
    for url, text in [("http://site-a.example/index", PAGE_A_TEXT),
                      ("http://site-b.example/post", PAGE_B_TEXT),
                      ("http://plain.example/readme", PLAIN_TEXT),
                      ("http://site-b.example/empty", ""),
                      ("http://site-c.example/nested", PAGE_C_TEXT)]:
        host = url.split("://")[1].split("/")[0]
        n, c = stats.get(host, (0, 0))
        stats[host] = (n + 1, c + len(text))
    for h in sorted(stats):
        print(f"  ({h!r}, {stats[h][0]}, {stats[h][1]}),")

    # compression_ratio oracle: zlib level-6 deflate of the SAME WET bodies,
    # computed by CPython's zlib independently of java.util.zip.Deflater
    # (both wrap canonical zlib; a ScalaTest tripwire asserts the JVM
    # produces these exact lengths, so a bundled-zlib divergence would fail
    # the spec before it could fail the driver gate)
    print("expected compression_ratio rows (url, n_bytes, deflate_bytes, "
          "ratio_bp):")
    import zlib
    for url, text in sorted([
            ("http://site-a.example/index", PAGE_A_TEXT),
            ("http://site-b.example/post", PAGE_B_TEXT),
            ("http://plain.example/readme", PLAIN_TEXT),
            ("http://site-b.example/empty", ""),
            ("http://site-c.example/nested", PAGE_C_TEXT)]):
        raw = text.encode("utf-8")
        dl = len(zlib.compress(raw, 6))
        print(f"  ({url!r}, {len(raw)}, {dl}, "
              f"{10000 * dl // max(len(raw), 1)}),")

    def wat(url, status, ctype, title, links):
        env = {"Envelope": {
            "WARC-Header-Metadata": {"WARC-Target-URI": url,
                                     "WARC-Type": "response"},
            "Payload-Metadata": {"HTTP-Response-Metadata": {
                "Response-Message": {"Status": str(status)},
                "Headers": {"Content-Type": ctype},
                "HTML-Metadata": (
                    ({"Head": {"Title": title}} if title else {})
                    | ({"Links": [{"path": "A@/href", "url": u, "text": t}
                                  for (u, t) in links]} if links else {}))
            }}}}
        return record("metadata", url,
                      json.dumps(env, sort_keys=True).encode("ascii"))

    hub_links = [("http://alpha.example/a", "Alpha & Co"),
                 ("/local/page", "the local page"),
                 ("http://beta.example/b?q=1", "beta list"),
                 ("http://alpha.example/a2", "Alpha & Co")]
    wat0 = (info
            + wat("http://hub.example/start", 200, "text/html", "", hub_links)
            + wat("http://nolinks.example/t", 200, "text/html", "", []))
    with open(os.path.join(out_wat, "cc-000.warc.wat"), "wb") as f:
        f.write(wat0)
    wat1 = (wat("http://upper.example/g", 200, "text/html", "Upper Gamma",
                [("HTTP://Gamma.example/G", "Gamma Page")])
            + wat("http://squote.example/s", 404, "text/html", "Not Found",
                  []))
    with open(os.path.join(out_wat, "cc-001.warc.wat.gz"), "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(wat1)
    print(f"wrote {out_wat}/cc-000.warc.wat and cc-001.warc.wat.gz")


# Ninth fixture (graft/warc_sitemap): sitemap.xml documents backing the
# `sitemap_urls` driver row — the robots.txt companion every polite
# crawler consumes for seed discovery (the sitemaps.org protocol).
# Extraction rules (pinned): a response is a sitemap iff its body carries
# a <urlset or <sitemapindex root tag (case-insensitive); <url> blocks
# yield kind='url' rows, <sitemap> blocks (index files — the recursion
# seed for the next fetch round) yield kind='sitemap' rows; loc is
# REQUIRED (blocks without one are dropped), whitespace-trimmed, with the
# core entity set decoded (&amp; in URLs is mandatory XML escaping);
# lastmod/priority are optional strings, '' when absent. Expected rows,
# derived BY HAND from the bodies below:
#
#   sitemap_url                          kind     loc                                lastmod      priority
#   http://a.example/sitemap.xml         url      http://a.example/                  2024-01-01   1.0
#   http://a.example/sitemap.xml         url      http://a.example/big.zip           ''           ''
#   http://a.example/sitemap.xml         url      http://a.example/graft-only/hidden ''           ''
#   http://a.example/sitemap.xml         url      http://a.example/page?x=1&y=2      ''           ''
#   http://a.example/sitemap.xml         url      http://a.example/spaced            2024-02-03   ''
#   http://a.example/sitemap.xml         url      http://b.example/notmap            ''           ''
#   http://a.example/sitemap.xml         url      http://tracker.example/lp2         ''           ''
#   http://a.example/sitemap_index.xml   sitemap  http://a.example/sitemap.xml       2024-01-05   ''
#   http://a.example/sitemap_index.xml   sitemap  http://a.example/sitemap2.xml.gz   ''           ''
#   (the /notmap page and the loc-less <url> block yield no rows)
#
# The last four locs exist for the `crawl_frontier` composition row
# (sitemap seeds -> blocklist -> robots -> already-fetched dedup; drop
# precedence blocked > disallowed > fetched). Against the robots fixture's
# a.example rules (graftbot group: Disallow /graft-only/ and /*.zip$ —
# the specific group REPLACES '*'), the pinned UrlBlocklist
# ('tracker.example') and this fixture's own fetched pages
# (a.example/sitemap.xml, a.example/sitemap_index.xml, b.example/notmap),
# the expected frontier verdicts are:
#
#   http://a.example/                    fetch       (canonical 'a.example' unfetched)
#   http://a.example/big.zip             disallowed  (wildcard /*.zip$)
#   http://a.example/graft-only/hidden   disallowed
#   http://a.example/page?x=1&y=2        fetch
#   http://a.example/spaced              fetch
#   http://b.example/notmap              fetched     (this crawl already has it)
#   http://tracker.example/lp2           blocked     (registered-domain blocklist)
SITEMAP_A = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>http://a.example/</loc><lastmod>2024-01-01</lastmod><priority>1.0</priority></url>
<url><loc>http://a.example/page?x=1&amp;y=2</loc></url>
<url><loc>
  http://a.example/spaced
</loc><lastmod>2024-02-03</lastmod></url>
<url><lastmod>2024-03-01</lastmod></url>
<url><loc>http://a.example/graft-only/hidden</loc></url>
<url><loc>http://a.example/big.zip</loc></url>
<url><loc>http://tracker.example/lp2</loc></url>
<url><loc>http://b.example/notmap</loc></url>
</urlset>"""
SITEMAP_INDEX = """<?xml version="1.0"?>
<SITEMAPINDEX>
<sitemap><loc>http://a.example/sitemap.xml</loc><lastmod>2024-01-05</lastmod></sitemap>
<sitemap><loc>http://a.example/sitemap2.xml.gz</loc></sitemap>
</SITEMAPINDEX>"""


def make_sitemap_fixture():
    out = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                       "resources", "graft", "warc_sitemap")
    os.makedirs(out, exist_ok=True)

    def http_xml(body):
        return (b"HTTP/1.1 200 OK\r\nContent-Type: application/xml\r\n\r\n"
                + body.encode("ascii"))

    part0 = (
        record("response", "http://a.example/sitemap.xml",
               http_xml(SITEMAP_A))
        + record("response", "http://b.example/notmap",
                 http("just a page, <url> marker without a sitemap root"))
    )
    with open(os.path.join(out, "cc-sitemap-000.warc"), "wb") as f:
        f.write(part0)
    part1 = record("response", "http://a.example/sitemap_index.xml",
                   http_xml(SITEMAP_INDEX))
    with open(os.path.join(out, "cc-sitemap-001.warc.gz"), "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(part1)
    print(f"wrote {out}/cc-sitemap-000.warc and cc-sitemap-001.warc.gz")


if __name__ == "__main__":
    main()
    make_links_fixture()
    make_wet_wat_fixture()
    make_sitemap_fixture()
