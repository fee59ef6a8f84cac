#!/usr/bin/env python3
"""Generate the committed robots.txt WARC fixture
(src/main/resources/graft/warc_robots) backing the `robots_rules` and
`robots_gate` driver rows, with the expected VALUES rows hand-derived
HERE (the make_warc_fixture.py pattern — same record framing).

RFC 9309 semantics the operators pin (and this fixture exercises):
  * groups: consecutive User-agent lines share the following rule lines;
    a User-agent line AFTER rule lines starts a new group
  * comments (#...) stripped, keys case-insensitive, values trimmed
  * an EMPTY Allow/Disallow value is no rule at all (allow-all idiom)
  * group selection for agent A: the A-specific group if the host has
    one, else the '*' group, else no rules (allowed); groups never merge
  * rule match: path startswith(prefix); LONGEST prefix wins; on a
    length tie Allow wins; no matching rule -> allowed

Hosts:
  a.example   '*' group (Disallow /private/, Allow /private/ok,
              Disallow /tmp) AND a graftbot group (Disallow /graft-only/)
              -> for agent graftbot ONLY the graftbot group applies:
              /private/x is ALLOWED for graftbot (the classic
              group-selection trap), /graft-only/secret is disallowed
  b.example   '*' group with an empty Disallow -> zero rules, allow all
  c.example   no robots.txt at all -> allow all
  d.example   only an 'otherbot' group -> graftbot falls back to '*',
              which does not exist -> allow all

Expected robots_rules rows (host, agent, rule, prefix) — 'group' rows
mark group PRESENCE (an empty agent-specific group must still win group
selection):
  ('a.example', '*', 'group', ''),
  ('a.example', 'graftbot', 'group', ''),
  ('b.example', '*', 'group', ''),
  ('d.example', 'otherbot', 'group', ''),
  ('a.example', '*', 'disallow', '/private/'),
  ('a.example', '*', 'allow', '/private/ok'),
  ('a.example', '*', 'disallow', '/tmp'),
  ('a.example', 'graftbot', 'disallow', '/graft-only/'),
  ('a.example', 'graftbot', 'disallow', '/*.zip$'),
  ('d.example', 'otherbot', 'disallow', '/'),

Expected robots_gate rows for agent 'graftbot'
(url, host, path, allowed, matched_prefix):
  a.example/private/x        -> allowed (graftbot group only; no match)
  a.example/files/x.zip      -> DISALLOWED via the RFC 9309 wildcard+anchor
                                rule /*.zip$
  a.example/graft-only/secret-> DISALLOWED via /graft-only/
  b.example/anything         -> allowed (empty-value rule dropped)
  c.example/whatever         -> allowed (no robots.txt)
  d.example/page             -> allowed (no '*' fallback group)
"""
import gzip
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                   "resources", "graft", "warc_robots")


def record(wtype, url, block):
    head = "WARC/1.0\r\n" + f"WARC-Type: {wtype}\r\n"
    if url is not None:
        head += f"WARC-Target-URI: {url}\r\n"
    head += ("WARC-Date: 2024-01-01T00:00:00Z\r\n"
             f"Content-Length: {len(block)}\r\n\r\n")
    return head.encode("ascii") + block + b"\r\n\r\n"


def http(body, ctype=b"text/plain"):
    return (b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype + b"\r\n\r\n"
            + body.encode("ascii"))


ROBOTS_A = """# graft fixture robots
User-Agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /tmp

User-agent: GraftBot
Disallow: /graft-only/   # trailing comment
Disallow: /*.zip$
"""

ROBOTS_B = """User-agent: *
Disallow:
"""

ROBOTS_D = """User-agent: otherbot
Disallow: /
"""


def main():
    os.makedirs(OUT, exist_ok=True)
    part0 = (
        record("response", "http://a.example/robots.txt", http(ROBOTS_A))
        + record("response", "http://b.example/robots.txt", http(ROBOTS_B))
        + record("response", "http://a.example/private/x",
                 http("private page", b"text/html"))
        + record("response", "http://a.example/graft-only/secret",
                 http("agent-gated page", b"text/html"))
        + record("response", "http://b.example/anything",
                 http("open page b", b"text/html"))
        + record("response", "http://a.example/files/x.zip",
                 http("zipped artifact", b"application/zip"))
    )
    with open(os.path.join(OUT, "cc-robots-000.warc"), "wb") as f:
        f.write(part0)
    part1 = (
        record("response", "http://d.example/robots.txt", http(ROBOTS_D))
        + record("response", "http://c.example/whatever",
                 http("no robots host", b"text/html"))
        + record("response", "http://d.example/page",
                 http("other-bot-only rules", b"text/html"))
    )
    gz = os.path.join(OUT, "cc-robots-001.warc.gz")
    with open(gz, "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
            f.write(part1)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
