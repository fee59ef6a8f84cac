#!/usr/bin/env python3
"""Generate the committed JSONL fixture corpus under
src/main/resources/graft/jsonl/.

The fixture backs the `jsonl_ingest` driver-contract query: its oracle is
a VALUES literal of the exact rows below, written BY HAND here
independently of JsonlSource.readJsonl, so the row checks the whole
explicit-schema JSONL read chain: gzip and plain part files, unicode,
embedded tab/newline escapes, an empty text, and the PERMISSIVE corrupt
line (which must yield exactly one all-null row, not a job abort).

Re-running this script is deterministic (gzip mtime pinned to 0).

Expected jsonl_ingest rows (doc_id, lang, source, n_chars, text):
  NULL  NULL NULL   NULL  NULL            (the corrupt line)
  1     en   web    11    'hello world'
  2     fr   books  16    'bonjour le monde'
  3     en   web    0     ''
  4     de   web    11    'unicode ü ß'
  5     en   cc     15    'tab\tand\nnewline'
"""
import gzip
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                   "resources", "graft", "jsonl")

PART0 = "\n".join([
    '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}',
    '{"doc_id": 2, "text": "bonjour le monde", "lang": "fr", "source": "books", "n_chars": 16}',
    # corrupt line: PERMISSIVE mode must surface it as one all-null row
    'this line is not json {',
    '{"doc_id": 3, "text": "", "lang": "en", "source": "web", "n_chars": 0}',
]) + "\n"

PART1 = "\n".join([
    '{"doc_id": 4, "text": "unicode \\u00fc \\u00df", "lang": "de", "source": "web", "n_chars": 11}',
    '{"doc_id": 5, "text": "tab\\tand\\nnewline", "lang": "en", "source": "cc", "n_chars": 15}',
]) + "\n"


def main():
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "part-000.jsonl.gz"), "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(PART0.encode("utf-8"))
    with open(os.path.join(OUT, "part-001.jsonl"), "w", encoding="utf-8") as f:
        f.write(PART1)
    print(f"wrote {OUT}/part-000.jsonl.gz and part-001.jsonl")


if __name__ == "__main__":
    main()
