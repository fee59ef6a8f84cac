package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextFns._

/** The reference's product pipeline (anagram groups over a corpus), §2 #1-14,
  * re-expressed as declarative Spark plans. One wide transform end-to-end:
  * per-doc dedup and the combiner (mapphase/combine.go) are realized by
  * Spark's map-side partial aggregation; the fnv-hash shuffle
  * (reducephase/shuffle.go:84-93) is the exchange on groupBy(sig).
  *
  * Scale: shuffle bytes are bounded by |distinct words| per map partition
  * (vocabulary-sized, not corpus-sized); no key can skew beyond the words
  * sharing one signature (≤ dozens). See SURVEY.md §4.
  */
object Anagrams {

  def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Clean words WITHOUT any distinct: the downstream `collect_set` dedups
    * (map-side partially, then globally), so the anagram plan needs exactly
    * ONE shuffle. The reference's per-doc dedup (split.go:119-133) and
    * combiner (combine.go) exist to shrink shuffle volume — in Spark that
    * role is played by the partial ObjectHashAggregate, not by extra
    * exchanges. */
  def cleanWordsRawOf(docsDf: DataFrame): DataFrame =
    docsDf
      .select(explode(split(col("text"), WsTokenRe)).as("tok"))
      .where(col("tok") =!= "")
      .select(trimNonAlpha(lower(col("tok"))).as("word"))
      .where(isCleanWord(col("word")))

  /** Distinct corpus-wide clean words (mapphase/map.go:60-77 preprocessing). */
  def cleanWordsOf(docsDf: DataFrame): DataFrame =
    cleanWordsRawOf(docsDf).distinct()

  private val vocabCache = Materialized.register(
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])

  /** The distinct clean-word vocabulary, materialized once per (session,
    * corpus) and shared by every anagram-family query — vocabulary-sized
    * (≈1e6 rows for English at ANY corpus scale), so at 100 TB this is the
    * natural columnar intermediate: the corpus tokenize+explode runs once,
    * and six downstream queries read a frame that fits in one executor. */
  def cleanWords(spark: SparkSession, dir: String): DataFrame =
    Materialized.cached(vocabCache, spark, dir)(
      cleanWordsOf(docs(spark, dir)).persist(StorageLevel.MEMORY_AND_DISK))

  /** Signature → sorted distinct word set. Two-stage: dedup words first
    * (shuffle on word, map-side partial — shuffle bytes ≈ distinct words
    * per partition, same order as shuffling sigs directly), THEN compute
    * the signature sort once per distinct word instead of once per token
    * occurrence. Measured on the 100-book workload: sig-per-token 11.7 s
    * vs 6.3 s two-stage — the letter sort is the hot op, the extra
    * vocabulary-sized exchange is noise. */
  def anagramGroupsOf(docsDf: DataFrame): DataFrame =
    groupsFromWords(cleanWordsOf(docsDf))

  /** The reduce over any clean-word frame; collect_set dedups, so raw and
    * distinct word frames give identical groups. */
  def groupsFromWords(words: DataFrame): DataFrame =
    words
      .groupBy(signature(col("word")).as("sig"))
      .agg(sort_array(collect_set(col("word"))).as("set"))
      .select(col("sig"), array_join(col("set"), " ").as("anagrams"),
        size(col("set")).cast("long").as("n_words"))

  /** The full reduce on any (doc_id, text) frame: group by signature,
    * set-dedup, sort, keep >1, format (reducephase/reduce.go:57-115 +
    * 36-52). Used by both the parquet queries and the raw-file source. */
  def anagramLinesOf(docsDf: DataFrame): DataFrame =
    anagramGroupsOf(docsDf)
      .where(col("n_words") > 1)
      .select(concat(col("sig"), lit(": "), col("anagrams")).as("line"))

  private val cleanWordsCte =
    s"""WITH toks AS (
       |  SELECT DISTINCT lower(t.w) AS word
       |  FROM documents d, unnest(string_split_regex(d.text, '\\s+')) AS t(w)
       |  WHERE t.w <> ''
       |), clean AS (
       |  SELECT DISTINCT ${sqlTrim("word")} AS word FROM toks
       |  WHERE ${sqlIsCleanWord(sqlTrim("word"))}
       |)""".stripMargin

  // ---- #1 ingest: pushed-filter + pruned-column scan --------------------
  def ingestDocuments(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"), col("source"), col("n_chars"))
      .where(col("n_chars") > 0)
  val ingestDocumentsSql =
    "SELECT doc_id, source, n_chars FROM documents WHERE n_chars > 0"

  // ---- #2 byte→string normalization (mapphase/split.go:78-87) -----------
  def utf8Normalize(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      md5(decode(encode(col("text"), "UTF-8"), "UTF-8")).as("text_md5"),
    )
  val utf8NormalizeSql = "SELECT doc_id, md5(text) AS text_md5 FROM documents"

  // ---- #2b Unicode NFC normalization (custom expression; DuckDB twin is
  // the native nfc_normalize) ---------------------------------------------
  def normalizeUnicode(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      md5(org.apache.spark.sql.graft.NormalizeNfc(col("text"))).as("nfc_md5"),
      length(org.apache.spark.sql.graft.NormalizeNfc(col("text"))).cast("long").as("nfc_len"))
  val normalizeUnicodeSql =
    """SELECT doc_id, md5(nfc_normalize(text)) AS nfc_md5,
      |  CAST(length(nfc_normalize(text)) AS BIGINT) AS nfc_len
      |FROM documents""".stripMargin

  // ---- #3 Gutenberg header/footer strip (mapphase/split.go:90-116) ------
  def stripGutenbergQ(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      length(stripGutenberg(col("text"))).cast("long").as("stripped_len"),
      md5(stripGutenberg(col("text"))).as("stripped_md5"),
    )
  val stripGutenbergSql =
    s"""SELECT doc_id,
       |  length(${sqlStripGutenberg("text")}) AS stripped_len,
       |  md5(${sqlStripGutenberg("text")}) AS stripped_md5
       |FROM documents""".stripMargin

  // ---- #4 tokenize (mapphase/split.go:68) -------------------------------
  def tokenize(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), WsTokenRe)).as("token"))
      .where(col("token") =!= "")
  val tokenizeSql =
    s"""SELECT d.doc_id, t.w AS token
       |FROM documents d, unnest(string_split_regex(d.text, '\\s+')) AS t(w)
       |WHERE t.w <> ''""".stripMargin

  // ---- #5 per-doc lowercase+dedup (mapphase/split.go:119-133) -----------
  // Map-only: the per-doc word set is row-local (exactly the reference's
  // in-memory map per split), so sort-distinct happens inside the row —
  // no (doc, word) exchange. Population guard (≥1 token) matches the
  // explode+groupBy form.
  def docUniqueWords(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), filter(
        transform(split(col("text"), WsTokenRe), t => lower(t)),
        t => t =!= "").as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"),
        array_join(array_sort(array_distinct(col("toks"))), " ").as("words"))
  val docUniqueWordsSql =
    s"""SELECT doc_id,
       |  list_aggr(list_sort(list(DISTINCT lower(t.w))), 'string_agg', ' ') AS words
       |FROM documents d, unnest(string_split_regex(d.text, '\\s+')) AS t(w)
       |WHERE t.w <> ''
       |GROUP BY doc_id""".stripMargin

  // ---- #6 partition sizing (mapphase/split.go:137-161); rows-only -------
  def partitionStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).repartition(32)
      .groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("n_docs"))

  // ---- #7 preprocessing (mapphase/map.go:82-151) ------------------------
  def preprocessWords(spark: SparkSession, dir: String): DataFrame =
    cleanWords(spark, dir)
  val preprocessWordsSql = s"$cleanWordsCte SELECT word FROM clean"

  // ---- #8 anagram key (mapphase/map.go:60-77) ---------------------------
  def anagramSignatures(spark: SparkSession, dir: String): DataFrame =
    cleanWords(spark, dir).select(col("word"), signature(col("word")).as("sig"))
  val anagramSignaturesSql =
    s"$cleanWordsCte SELECT word, ${sqlSignature("word")} AS sig FROM clean"

  // ---- #9 combiner semantics per doc (mapphase/combine.go:13-47) --------
  // The whole per-doc combine (preprocess → signature → group → set-union)
  // is a pure function of the document, exactly as the reference computes
  // it in memory per split — SigGroups runs it as ONE row-local pass, so
  // the query is a map-only projection (the relational form needed a
  // (doc, word)-distinct exchange plus a (doc, sig) aggregation exchange).
  def combinePerDoc(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        explode(org.apache.spark.sql.graft.SigGroups(
          split(col("text"), WsTokenRe), Stopwords)).as("g"))
      .select(col("doc_id"), col("g.sig").as("sig"), col("g.words").as("words"))
  val combinePerDocSql =
    s"""WITH toks AS (
       |  SELECT DISTINCT d.doc_id, lower(t.w) AS word
       |  FROM documents d, unnest(string_split_regex(d.text, '\\s+')) AS t(w)
       |  WHERE t.w <> ''
       |), clean AS (
       |  SELECT DISTINCT doc_id, ${sqlTrim("word")} AS word FROM toks
       |  WHERE ${sqlIsCleanWord(sqlTrim("word"))}
       |)
       |SELECT doc_id, ${sqlSignature("word")} AS sig,
       |  list_aggr(list_sort(list(DISTINCT word)), 'string_agg', ' ') AS words
       |FROM clean GROUP BY 1, 2""".stripMargin

  // ---- #10 shuffle partitioner (reducephase/shuffle.go:84-93) -----------
  // fnv-mod-N re-expressed with the engines' shared md5-based hash; the real
  // exchange in the anagram plan is Spark's hash partitioning on sig.
  def shuffleAssignment(spark: SparkSession, dir: String): DataFrame =
    cleanWords(spark, dir)
      .select(signature(col("word")).as("sig")).dropDuplicates("sig")
      .groupBy(pmod(md5Long(col("sig")), lit(32)).as("bucket"))
      .agg(count(lit(1)).as("n_sigs"))
  val shuffleAssignmentSql =
    s"""$cleanWordsCte, sigs AS (
       |  SELECT DISTINCT ${sqlSignature("word")} AS sig FROM clean
       |)
       |SELECT ${sqlMd5Long("sig")} % 32 AS bucket, count(*) AS n_sigs
       |FROM sigs GROUP BY 1""".stripMargin

  // ---- #11+#13 the reduce: global set-dedup, sort, keep >1 --------------
  // Reads the materialized vocabulary (identical result: collect_set
  // dedups either way), so the corpus explode doesn't re-run per query.
  def anagramGroups(spark: SparkSession, dir: String): DataFrame =
    groupsFromWords(cleanWords(spark, dir))
  val anagramGroupsSql =
    s"""$cleanWordsCte
       |SELECT ${sqlSignature("word")} AS sig,
       |  list_aggr(list_sort(list(DISTINCT word)), 'string_agg', ' ') AS anagrams,
       |  count(*) AS n_words
       |FROM clean GROUP BY 1""".stripMargin

  /** reducephase/reduce.go:57-115 — only groups with >1 distinct word. */
  def anagrams(spark: SparkSession, dir: String): DataFrame =
    anagramGroups(spark, dir).where(col("n_words") > 1)
      .select("sig", "anagrams")
  val anagramsSql =
    s"""$cleanWordsCte
       |SELECT sig, anagrams FROM (
       |  SELECT ${sqlSignature("word")} AS sig,
       |    list_aggr(list_sort(list(DISTINCT word)), 'string_agg', ' ') AS anagrams,
       |    count(*) AS n
       |  FROM clean GROUP BY 1
       |) WHERE n > 1""".stripMargin

  /** Sentinel docs with known anagram families. The sf0.01 oracle corpus
    * happens to contain no >1-member anagram group, so the `anagrams` row
    * passes vacuously (0 = 0). This variant unions deterministic sentinel
    * texts with the corpus and runs the SAME reduce, making the keep->1
    * filter (reducephase/reduce.go:88-97) verifiable with rows > 0 at any
    * SF. The product query (`anagrams`) stays unseeded. */
  val SentinelTexts: Seq[String] = Seq(
    "listen silent enlist inlets",
    "stone tones notes onset seton",
    "dusty study parse spare spear reaps pares")

  def anagramsSeeded(spark: SparkSession, dir: String): DataFrame = {
    val sentinels = spark.createDataFrame(
      SentinelTexts.map(Tuple1.apply)).toDF("text")
    // corpus side reads the materialized vocabulary; only the three
    // sentinel rows run through the tokenizer here
    val words = cleanWords(spark, dir).union(cleanWordsRawOf(sentinels))
    groupsFromWords(words).where(col("n_words") > 1).select("sig", "anagrams")
  }
  val anagramsSeededSql: String = {
    val sentinelValues = SentinelTexts.map(sqlLit).map(v => s"($v)").mkString(", ")
    s"""WITH srcdocs AS (
       |  SELECT text FROM documents
       |  UNION ALL SELECT * FROM (VALUES $sentinelValues) v(text)
       |), toks AS (
       |  SELECT DISTINCT lower(t.w) AS word
       |  FROM srcdocs d, unnest(string_split_regex(d.text, '\\s+')) AS t(w)
       |  WHERE t.w <> ''
       |), clean AS (
       |  SELECT DISTINCT ${sqlTrim("word")} AS word FROM toks
       |  WHERE ${sqlIsCleanWord(sqlTrim("word"))}
       |)
       |SELECT sig, anagrams FROM (
       |  SELECT ${sqlSignature("word")} AS sig,
       |    list_aggr(list_sort(list(DISTINCT word)), 'string_agg', ' ') AS anagrams,
       |    count(*) AS n
       |  FROM clean GROUP BY 1
       |) WHERE n > 1""".stripMargin
  }

  // ---- #12 formatted output lines (reducephase/reduce.go:36-52) ---------
  def anagramOutputLines(spark: SparkSession, dir: String): DataFrame =
    anagramGroups(spark, dir)
      .select(concat(col("sig"), lit(": "), col("anagrams")).as("line"))
  val anagramOutputLinesSql =
    s"""$cleanWordsCte
       |SELECT concat(${sqlSignature("word")}, ': ',
       |  list_aggr(list_sort(list(DISTINCT word)), 'string_agg', ' ')) AS line
       |FROM clean GROUP BY ${sqlSignature("word")}""".stripMargin
}
