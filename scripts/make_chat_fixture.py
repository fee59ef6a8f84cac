#!/usr/bin/env python3
"""Generate the committed chat-conversation JSONL fixture under
src/main/resources/graft/chat/.

The fixture backs the `chat_turns` / `chat_stats` / `chat_gate` /
`chat_dedup` driver-contract queries (SFT-format conversations: one JSON
object per line with conv_id, source, and a messages[] array of
{role, content} turns). The oracles in operators/Chat.scala embed these
SAME raw lines as a VALUES CTE and re-parse them with DuckDB's own JSON
parser — a genuinely independent parse of the identical bytes, so any
drift between this script and the oracle text fails the driver gate.

Edge cases exercised:
  conv 1  leading system turn, valid alternation      (sft_a)
  conv 2  no system, valid 2-turn                     (sft_a)
  conv 3  same prompt as conv 1 (cross-source dup)    (sft_b)
  conv 4  double-user turn -> bad_alternation         (sft_b)
  conv 5  assistant-first singleton -> bad_start      (sft_b)
  conv 6  empty assistant content -> empty_turn       (sft_c)
  conv 7  5-turn multi-round, valid                   (sft_c)
  (corrupt line -> PERMISSIVE null row, dropped by every chat query)
  conv 9  whitespace/case variant of conv 1's prompt  (sft_d)
  conv 10 unicode content                             (sft_d)
  conv 11 ends on a user turn -> bad_end              (sft_d)
  conv 12 lone user turn -> too_short                 (sft_d)

Re-running is deterministic (gzip mtime pinned to 0).
"""
import gzip
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                   "resources", "graft", "chat")

PART0 = "\n".join([
    '{"conv_id":1,"source":"sft_a","messages":[{"role":"system","content":"You are helpful."},{"role":"user","content":"What is 2+2?"},{"role":"assistant","content":"4."}]}',
    '{"conv_id":2,"source":"sft_a","messages":[{"role":"user","content":"Translate hello"},{"role":"assistant","content":"bonjour"}]}',
    '{"conv_id":3,"source":"sft_b","messages":[{"role":"user","content":"What is 2+2?"},{"role":"assistant","content":"Four."}]}',
    '{"conv_id":4,"source":"sft_b","messages":[{"role":"user","content":"A"},{"role":"user","content":"B"},{"role":"assistant","content":"C"}]}',
    '{"conv_id":5,"source":"sft_b","messages":[{"role":"assistant","content":"Hi there"}]}',
    '{"conv_id":6,"source":"sft_c","messages":[{"role":"user","content":"Tell me a joke"},{"role":"assistant","content":""}]}',
    '{"conv_id":7,"source":"sft_c","messages":[{"role":"system","content":"Be brief."},{"role":"user","content":"Sum 1..3?"},{"role":"assistant","content":"6."},{"role":"user","content":"And 1..4?"},{"role":"assistant","content":"10."}]}',
    # corrupt line: PERMISSIVE mode must yield one all-null row, not an abort
    '{"conv_id": 8, "messages": [',
]) + "\n"

PART1 = "\n".join([
    '{"conv_id":9,"source":"sft_d","messages":[{"role":"user","content":"  What   is 2+2? "},{"role":"assistant","content":"4"}]}',
    '{"conv_id":10,"source":"sft_d","messages":[{"role":"user","content":"Unicode \\u00fc \\u00df \\u4e2d\\u6587"},{"role":"assistant","content":"ok"}]}',
    '{"conv_id":11,"source":"sft_d","messages":[{"role":"system","content":"x"},{"role":"user","content":"hello"},{"role":"assistant","content":"world"},{"role":"user","content":"again"}]}',
    '{"conv_id":12,"source":"sft_d","messages":[{"role":"user","content":"hi"}]}',
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
