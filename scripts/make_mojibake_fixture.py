#!/usr/bin/env python3
"""Generate the committed mojibake-repair fixture under
src/main/resources/graft/mojibake/ and print the expected `fix_mojibake`
rows.

The repair under test: CP1252 double-encoding (UTF-8 bytes misread as
CP1252 and re-encoded) undone by the inverse trip — map the 27 CP1252
specials back to their 0x80-0x9F bytes, encode ISO-8859-1, decode strict
UTF-8 — attempted only when the text carries a double-encode marker
(Curation.MojibakeDoubleEncMarkers: 'Ã', 'Â', 'â€'), every char fits a
byte after the specials map, and the decode is clean. This script
implements the SAME semantics independently with Python's own codec
machinery (sloppy-cp1252 per byte: CP1252 table, undefined bytes pass
through as C1 controls) and prints the expected rows the Scala oracle
embeds as a VALUES literal — so the Spark expression chain
(translate → encode → decode → guards) is checked against CPython's
codecs on identical input.

Pinned limitations the fixture documents:
  * whole-string repair only (any char > 0xFF after the specials map
    aborts — doc 7's mixed CJK + mojibake stays untouched);
  * repair runs ONCE (doc 8's triple-encoded é comes back still
    double-encoded — one more pass of the same operator finishes it);
  * a bare marker with no continuation byte after it is NOT mojibake and
    must survive untouched (doc 4).

All fixture content is BMP-only: astral chars would make Spark's UTF-16
length() disagree with DuckDB's codepoint length().
"""
import gzip
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                   "resources", "graft", "mojibake")

# the 27 defined CP1252 mappings for bytes 0x80-0x9F
CP1252 = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8a: "Š", 0x8b: "‹", 0x8c: "Œ",
    0x8e: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9a: "š", 0x9b: "›",
    0x9c: "œ", 0x9e: "ž", 0x9f: "Ÿ",
}
INV = {v: k for k, v in CP1252.items()}
MARKERS = ["Ã", "Â", "â€"]  # Ã, Â, â€


def sloppy_decode(bs: bytes) -> str:
    """Bytes → str the way mojibake happens: CP1252 where defined,
    pass-through C1 controls elsewhere (what lenient real-world decoders
    do with the 5 undefined CP1252 bytes)."""
    return "".join(CP1252.get(b, chr(b)) for b in bs)


def mojibake(clean: str) -> str:
    return sloppy_decode(clean.encode("utf-8"))


def repair(text: str):
    """The pinned repair; returns (repaired_flag, out_text). The trigger is
    script-agnostic: any UTF-8 lead byte (0xC2-0xF4) followed by a
    continuation byte (0x80-0xBF) in the byte view — a superset of the
    Latin MARKERS the audit counts (Greek/Cyrillic mojibake has no Latin
    marker but always shows lead+continuation)."""
    pre = [INV.get(ch, ord(ch)) for ch in text]
    if not any(0xC2 <= a <= 0xF4 and 0x80 <= b <= 0xBF
               for a, b in zip(pre, pre[1:])):
        return 0, text
    if any(v > 0xFF for v in pre):
        return 0, text  # not byte-representable -> whole-string abort
    try:
        return 1, bytes(pre).decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return 0, text


DOCS = [
    # (doc_id, lang, source, text)
    (1, "fr", "web", mojibake("Café résumé")),
    (2, "en", "web", mojibake("“quoted” and — dash")),
    (3, "en", "web", mojibake("price €100 • item")),
    (4, "en", "web", "Ã is a letter of some alphabets"),
    (5, "en", "cc", "plain ascii text"),
    (6, "zh", "cc", "中文文档"),
    (7, "en", "cc", mojibake("naïve") + " 中文"),
    (8, "fr", "books", mojibake(mojibake("été"))),
    (9, "en", "books", ""),
    (10, "de", "books", mojibake("before after")),
]


def main():
    os.makedirs(OUT, exist_ok=True)
    lines = []
    for doc_id, lang, source, text in DOCS:
        esc = (text.replace("\\", "\\\\").replace('"', '\\"'))
        lines.append(f'{{"doc_id": {doc_id}, "text": "{esc}", '
                     f'"lang": "{lang}", "source": "{source}", '
                     f'"n_chars": {len(text)}}}')
    with open(os.path.join(OUT, "part-000.jsonl.gz"), "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(("\n".join(lines) + "\n").encode("utf-8"))
    print(f"wrote {OUT}/part-000.jsonl.gz")
    print("\nexpected fix_mojibake rows (doc_id, repaired, text_out, n_chars_out):")
    for doc_id, _, _, text in DOCS:
        flag, out = repair(text)
        print(f"  ({doc_id}, {flag}, '{out}', {len(out)}),")


if __name__ == "__main__":
    main()
