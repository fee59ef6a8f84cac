package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions.col

/** The pure-SQL surface: the reference's whole anagram pipeline expressed
  * as ONE `spark.sql` statement over a registered view, using the
  * SQL-registered custom expression (`sort_chars`) plus built-ins — and
  * asserted row-for-row equal to the DataFrame operator. A user of the
  * library who lives entirely in SQL gets the same engine: same codegen'd
  * signature expression, same plan shapes, no Scala required. */
class SqlSurfaceSpec extends SparkTestBase {

  test("pure-SQL anagram pipeline equals the DataFrame operator") {
    val dir = writeDocsFixture(Seq(
      1L -> "Care! race acre part the of",
      2L -> "trap rapt; listen silent care x9mixed",
      3L -> "enlist stone notes tones dog god",
    ))
    spark.read.parquet(s"$dir/documents.parquet")
      .createOrReplaceTempView("sql_docs")
    val stopList = TextFns.Stopwords.map(s => s"'${s.replace("'", "''")}'")
      .mkString("(", ", ", ")")
    // Spark SQL string literals process backslash escapes — double them so
    // the regexes arrive intact
    def q(re: String) = re.replace("\\", "\\\\")
    val sql = spark.sql(
      s"""WITH toks AS (
         |  SELECT explode(split(text, '${q(TextFns.WsTokenRe)}')) AS tok
         |  FROM sql_docs
         |), words AS (
         |  SELECT DISTINCT regexp_replace(lower(tok), '${q(TextFns.TrimRe)}', '')
         |    AS word
         |  FROM toks WHERE tok <> ''
         |), clean AS (
         |  SELECT word FROM words
         |  WHERE word RLIKE '${q(TextFns.LettersRe)}' AND word NOT IN $stopList
         |)
         |SELECT sort_chars(word) AS sig,
         |  array_join(array_sort(collect_set(word)), ' ') AS anagrams,
         |  count(*) AS n_words
         |FROM clean GROUP BY 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val df = graft.operators.Anagrams.anagramGroupsOf(
        spark.read.parquet(s"$dir/documents.parquet"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(sql == df && sql.nonEmpty)
    // the families planted above actually grouped
    val bySig = sql.map(t => t._1 -> t._2).toMap
    assert(bySig("acer").split(" ").toSet == Set("care", "race", "acre"))
    assert(bySig("eilnst").split(" ").toSet == Set("listen", "silent", "enlist"))
  }

  test("pure-SQL near-dup candidates via registered minhash machinery") {
    val dir = writeDocsFixture(Seq(
      1L -> ("the quick brown fox jumps over the lazy dog " * 3),
      2L -> ("the quick brown fox jumps over the lazy dog " * 3),
      3L -> "completely different content about catalyst and tungsten here",
    ))
    spark.read.parquet(s"$dir/documents.parquet")
      .createOrReplaceTempView("sql_docs2")
    // shingle → minhash signature from plain SQL via the registered
    // expressions bound to graft's published constants
    val sig = spark.sql(
      s"""SELECT doc_id,
         |  minhash_sig(shingle_poly_hash(text, ${graft.operators.Dedup.ShingleK},
         |    ${graft.operators.Dedup.ShingleB}L, ${graft.operators.Dedup.P}L)) AS sig
         |FROM sql_docs2
         |WHERE length(text) >= ${graft.operators.Dedup.ShingleK}""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // identical docs share the whole signature; the unrelated doc does not
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
    assert(sig(1L).length == graft.operators.Dedup.K)
  }
}
