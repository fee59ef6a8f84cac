package graft

import graft.operators.Chat

/** The SFT chat-conversation family (§2 #39): fixture-pinned expectations
  * derived by hand from scripts/make_chat_fixture.py's comment table, plus
  * structural edges the fixture can't carry (they'd break oracle row
  * parity): an empty messages array and a stray mid-conversation system
  * turn. */
class ChatSpec extends SparkTestBase {
  import spark.implicits._

  test("read is PERMISSIVE: the corrupt line is one null row, not an abort") {
    val raw = Chat.readChat(spark, Chat.FixtureDir).collect()
    assert(raw.length == 12)
    assert(raw.count(_.isNullAt(0)) == 1) // conv 8's broken line
  }

  test("chat_turns preserves array order at the turn grain") {
    val t7 = Chat.chatTurns(spark, "unused")
      .where($"conv_id" === 7).orderBy($"turn_idx").collect()
      .map(r => (r.getLong(2), r.getString(3), r.getString(4)))
    assert(t7.toSeq == Seq(
      (0L, "system", "Be brief."), (1L, "user", "Sum 1..3?"),
      (2L, "assistant", "6."), (3L, "user", "And 1..4?"),
      (4L, "assistant", "10.")))
  }

  test("chat_stats: alternation flag and counters per conversation") {
    val got = Chat.chatStats(spark, "unused").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getString(6), r.getString(7), r.getLong(9)))).toMap
    // conv 1: 3 turns, 1 system, 1 user, 1 assistant, system→assistant, alt ok
    assert(got(1L) == ((3L, 1L, 1L, 1L, "system", "assistant", 1L)))
    assert(got(4L)._7 == 0L) // double user
    assert(got(5L)._7 == 0L) // assistant-first
    assert(got(11L)._7 == 1L) // user-terminal is still a valid alternation
    assert(got(7L) == ((5L, 1L, 2L, 2L, "system", "assistant", 1L)))
  }

  test("chat_stats counts unicode content in codepoints") {
    val r = Chat.chatStats(spark, "unused").where($"conv_id" === 10)
      .collect().head
    // "Unicode ü ß 中文" (14) + "ok" (2)
    assert(r.getAs[Long]("total_chars") == 16L)
  }

  test("chat_gate pins one reason per conversation with fixed precedence") {
    val got = Chat.chatGate(spark, "unused").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(got == Map(
      1L -> ((1L, "ok")), 2L -> ((1L, "ok")), 3L -> ((1L, "ok")),
      4L -> ((0L, "bad_alternation")), 5L -> ((0L, "bad_start")),
      6L -> ((0L, "empty_turn")), 7L -> ((1L, "ok")),
      9L -> ((1L, "ok")), 10L -> ((1L, "ok")),
      11L -> ((0L, "bad_end")), 12L -> ((0L, "too_short"))))
  }

  test("chat_dedup groups case/whitespace prompt variants across sources") {
    val got = Chat.chatDedup(spark, "unused").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 9) // 11 parsed convs, the 2+2 prompt folds 3→1
    // the only multi-conversation group: convs 1, 3, 9 over 3 sources
    assert(got.filter(_._1 > 1).toSeq == Seq((3L, 3L, 1L)))
  }

  test("structural edges: empty messages array and stray mid-chat system") {
    val d = java.nio.file.Files.createTempDirectory("graft-chat-edge").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d/p.jsonl"),
      Seq(
        """{"conv_id":100,"source":"x","messages":[]}""",
        """{"conv_id":101,"source":"x","messages":[{"role":"user","content":"a"},{"role":"system","content":"late"},{"role":"assistant","content":"b"}]}""",
      ).mkString("", "\n", "\n"))
    val df = Chat.readChat(spark, d).where($"messages".isNotNull)
    // reuse the registered operators by pointing them at a temp fixture is
    // not possible (they pin the classpath fixture), so assert the shared
    // expressions through a local projection identical to chatGate's CASE
    val gate = df.selectExpr("conv_id",
      """CASE
        | WHEN size(slice(transform(messages, m -> m.role),
        |     IF(size(messages) > 0 AND messages[0].role = 'system', 2, 1),
        |     size(messages))) = 0 THEN 'bad_start'
        | ELSE 'other' END AS reason""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gate(100L) == "bad_start")
    val alt = df.selectExpr("conv_id",
      """IF(size(messages) > 1 AND
        |   forall(transform(slice(transform(messages, m -> m.role),
        |       IF(messages[0].role = 'system', 2, 1), size(messages)),
        |       (r, i) -> r = IF(i % 2 = 0, 'user', 'assistant')), b -> b),
        |   1, 0) AS ok""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(alt(101L) == 0) // the stray system matches neither parity slot
  }
}
