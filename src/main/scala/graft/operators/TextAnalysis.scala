package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns._

/** LLM-pipeline text analysis (SURVEY.md §2 #22-25): language ID, quality
  * scoring, token counting, winnowing fingerprints. All single-pass
  * projections/aggregations of codegen'd built-ins — no UDFs — so at 100 TB
  * each is one scan with map-side partials and (for fingerprints) one
  * vocabulary-bounded shuffle.
  */
object TextAnalysis {

  private def docs(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Tiny per-language stopword profiles for the n-gram/stopword heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "you", "that"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "que", "est", "pour"),
    "es" -> Seq("el", "los", "las", "de", "y", "un", "una", "que", "es", "para"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "就", "不", "人"),
  )

  private def toks(c: Column): Column =
    filter(transform(split(c, WsTokenRe), t => lower(t)), t => t =!= "")

  private def hits(c: Column, words: Seq[String]): Column =
    size(filter(toks(c), t => t.isin(words: _*))).cast("long")

  private def sqlHits(expr: String, words: Seq[String]): String = {
    val lst = words.map(sqlLit).mkString("(", ", ", ")")
    s"len(list_filter(list_transform(string_split_regex($expr, '\\s+'), t -> lower(t)), t -> t <> '' AND t IN $lst))"
  }

  // ---- #22 language ID --------------------------------------------------
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val scored = docs(spark, dir).select(
      col("doc_id") +: col("lang").as("labeled_lang") +:
        LangProfiles.map { case (l, ws) => hits(col("text"), ws).as(s"hits_$l") }: _*)
    val langs = LangProfiles.map(_._1)
    // argmax with fixed priority order (earlier language wins ties)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last)) {
      case ((l, i), rest) =>
        val geAll = langs.drop(i + 1)
          .map(o => col(s"hits_$l") >= col(s"hits_$o")).reduce(_ && _)
        when(geAll, lit(l)).otherwise(rest)
    }
    scored.withColumn("pred_lang", pred)
  }
  val langIdSql: String = {
    val langs = LangProfiles.map(_._1)
    val hitCols = LangProfiles
      .map { case (l, ws) => s"${sqlHits("text", ws)} AS hits_$l" }.mkString(",\n  ")
    val pred = langs.init.zipWithIndex.foldRight(s"'${langs.last}'") {
      case ((l, i), rest) =>
        val geAll = langs.drop(i + 1).map(o => s"hits_$l >= hits_$o").mkString(" AND ")
        s"CASE WHEN $geAll THEN '$l' ELSE $rest END"
    }
    s"""WITH scored AS (
       |  SELECT doc_id, lang AS labeled_lang,
       |  $hitCols
       |  FROM documents
       |)
       |SELECT *, $pred AS pred_lang FROM scored""".stripMargin
  }

  // ---- #23 quality scoring ---------------------------------------------
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      length(col("text")).cast("long").as("len_chars"),
      regexp_count(col("text"), lit("\\S+")).cast("long").as("n_tokens"),
      hits(col("text"), Stopwords).as("n_stopwords"),
      regexp_count(col("text"), lit(PunctRe)).cast("long").as("n_punct"),
    ).withColumn("stopword_ratio",
        round(col("n_stopwords").cast("double") / col("n_tokens"), 4))
      .withColumn("punct_ratio",
        round(col("n_punct").cast("double") / col("len_chars"), 4))
      .withColumn("quality",
        round(least(col("n_tokens").cast("double") / lit(50.0), lit(1.0))
          * (lit(1.0) - col("n_stopwords").cast("double") / col("n_tokens")), 4))
  val qualityScoreSql: String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS len_chars,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       |    CAST(${sqlHits("text", Stopwords)} AS BIGINT) AS n_stopwords,
       |    CAST(len(regexp_extract_all(text, '[^\\p{L}\\p{N}\\s]')) AS BIGINT) AS n_punct
       |  FROM documents
       |)
       |SELECT *,
       |  round(CAST(n_stopwords AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
       |  round(CAST(n_punct AS DOUBLE) / len_chars, 4) AS punct_ratio,
       |  round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
       |    * (1.0 - CAST(n_stopwords AS DOUBLE) / n_tokens), 4) AS quality
       |FROM base""".stripMargin

  // ---- #24 token counting ----------------------------------------------
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      regexp_count(col("text"), lit("\\S+")).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit(BpeTokenRe)).cast("long").as("bpe_tokens"),
    )
  val tokenCountSql: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
       |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens
       |FROM documents""".stripMargin

  // ---- #25 winnowing fingerprints (k=5 char-grams, window w=4) ----------
  val FpK = 5
  val FpW = 4
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val grams = docs(spark, dir)
      .where(length(col("text")) >= FpK)
      .select(col("doc_id"), length(col("text")).as("len"), col("text"),
        explode(sequence(lit(1), length(col("text")) - (FpK - 1))).as("pos"))
      .select(col("doc_id"), col("len"), col("pos"),
        md5Long(col("text").substr(col("pos"), lit(FpK))).as("h"))
    val win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, FpW - 1)
    grams
      .withColumn("wmin", min(col("h")).over(win))
      .where(col("pos") <= col("len") - (FpK - 1) - (FpW - 1))
      .groupBy("doc_id")
      .agg(
        countDistinct(col("wmin")).as("n_fp"),
        array_join(transform(sort_array(collect_set(col("wmin"))),
          _.cast("string")), " ").as("fp"))
  }
  val fingerprintSql: String =
    s"""WITH grams AS (
       |  SELECT d.doc_id, length(d.text) AS len, g.pos,
       |    ${sqlMd5Long(s"substr(d.text, CAST(g.pos AS INTEGER), $FpK)")} AS h
       |  FROM documents d, unnest(range(1, length(d.text) - ${FpK - 1} + 1)) AS g(pos)
       |  WHERE length(d.text) >= $FpK
       |), wins AS (
       |  SELECT doc_id, len, pos,
       |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
       |                 ROWS BETWEEN CURRENT ROW AND ${FpW - 1} FOLLOWING) AS wmin
       |  FROM grams
       |)
       |SELECT doc_id, count(DISTINCT wmin) AS n_fp,
       |  list_aggr(list_transform(list_sort(list(DISTINCT wmin)),
       |    x -> CAST(x AS VARCHAR)), 'string_agg', ' ') AS fp
       |FROM wins WHERE pos <= len - ${FpK - 1} - ${FpW - 1}
       |GROUP BY doc_id""".stripMargin
}
