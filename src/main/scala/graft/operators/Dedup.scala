package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextFns._

/** LLM-pipeline deduplication (SURVEY.md §2 #15-19).
  *
  * Scale design (100 TB): every near-dup variant generates candidate pairs
  * through bucketed joins (LSH bands / simhash chunks / hyperplane buckets),
  * never all-pairs. Signature aggregation is map-side partial (min/sum are
  * commutative), so the only corpus-sized shuffle is the shingle explode
  * feeding it — and that explode runs ONCE per corpus: the per-doc
  * signature+shingle-set frame is materialized (persist locally; a columnar
  * table at cluster scale) and shared by the minhash, jaccard, components
  * and survivors queries instead of being recomputed from raw text by each.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Per-(session, corpus) materialized intermediates. Local analog of
    * writing the signature table to parquet once and reading it from every
    * downstream job — the four LSH-family queries share one shingle pass. */
  private val sigSetCache = Materialized.register(
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])
  private val candCache = Materialized.register(
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])
  private val pairsCache = Materialized.register(
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])
  private val compCache = Materialized.register(
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])
  private val prCache = Materialized.register(
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])

  // ---- #15 exact dedup --------------------------------------------------
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(sha2(col("text"), 256).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
  val dedupExactSql: String =
    """SELECT sha256(text) AS text_hash, min(doc_id) AS keep_doc_id,
      |  count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  // ---- #15b exact dedup after canonicalization --------------------------
  /** CCNet-shape canonical dedup: lowercase, collapse every non-alnum run
    * to one space, trim — THEN hash. Catches near-copies that differ only
    * in case/punctuation/whitespace, which raw-byte hashing (#15) misses.
    * Same scale shape as #15: row-local canonicalization, one shuffle on a
    * uniform 16-byte key. */
  def dedupCanonical(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")))
        .as("canon_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
  val dedupCanonicalSql: String =
    """SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
      |  AS canon_hash,
      |  min(doc_id) AS keep_doc_id, count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  // ---- MinHash machinery (shared by #16 and #17) ------------------------
  /** Mersenne prime 2^31-1; a*h stays under 2^62 → no BIGINT overflow in
    * either engine. Coefficients are fixed constants shared with the oracle. */
  val P = 2147483647L
  val K = 32 // signature length
  /** 8 bands × 4 rows → s-curve knee ≈ (1/8)^(1/4) ≈ 0.59: candidates are
    * near-dups, not everything sharing vocabulary. (16×2 measured 434 s at
    * sf0.1 from candidate blowup on the shared-vocab corpus; 8×4 + the
    * bucket cap brings the whole family to seconds.) */
  val Bands = 8
  val Rows = K / Bands
  /** Drop band buckets larger than this: an over-full bucket is a
    * non-discriminative hash (stopword-like shingle profile) and would emit
    * O(n²) candidate pairs; standard LSH practice at corpus scale. */
  val BucketCap = 64
  val CoefA: IndexedSeq[Long] = (0 until K).map(i => ((2L * i + 1) * 1299721L + 15485863L) % P)
  val CoefB: IndexedSeq[Long] = (0 until K).map(i => (i.toLong * 32452843L + 49979687L) % P)
  val ShingleK = 5

  /** Rolling-hash base for shingles (see ShinglePolyHash). */
  val ShingleB = 131L

  /** The same fold as ShinglePolyHash, unrolled: ((…*B + ord_j) % P)…
    * Shared with the winnowing-fingerprint oracle (same k=5 hash space). */
  private[operators] def sqlShingleHash(textExpr: String, posExpr: String): String =
    sqlShingleHashK(textExpr, posExpr, ShingleK)

  /** k-parameterized form — the dup-span oracle hashes longer windows. */
  private[operators] def sqlShingleHashK(textExpr: String, posExpr: String,
      k: Int): String =
    (0 until k).foldLeft("CAST(0 AS BIGINT)") { (acc, j) =>
      s"(($acc * $ShingleB + ord(substr($textExpr, CAST($posExpr AS INTEGER) + $j, 1))) % $P)"
    }

  // MATERIALIZED hints (DuckDB ≥0.9): without them DuckDB INLINES a CTE at
  // every reference site, so `sig` (referenced 8× by the band explode + 2×
  // by the signature joins) re-ran the whole shingle pipeline ~10× per
  // oracle — measured r8: minhash_calibration needed >2 GB no-spill and
  // 2.2 s; with the hints it runs in <512 MB and 0.15 s. This is what let
  // the driver's gate DuckDB OOM-wedge on the minhash family in r7.
  private[operators] val shinglesCte =
    s"""WITH sh AS MATERIALIZED (
       |  SELECT DISTINCT d.doc_id,
       |    ${sqlShingleHash("d.text", "g.pos")} AS h
       |  FROM documents d,
       |    unnest(range(1, length(d.text) - ${ShingleK - 1} + 1)) AS g(pos)
       |  WHERE length(d.text) >= $ShingleK
       |)""".stripMargin

  /** The materialized LSH intermediate: one row per doc carrying BOTH the
    * K-component minhash signature (s0..s{K-1}) and the distinct shingle-hash
    * set (hs). ENTIRELY map-only: the rolling-hash array and the K fused
    * minima (MinhashSig) are row-local projections, so no shingle ever
    * leaves its document's row — the previous aggregation formulation
    * exploded the corpus into shingles and shuffled them to compute values
    * that never needed the exchange. Persisted per (session, corpus) —
    * minhash reads the signatures, jaccard reads signatures+sets,
    * components/survivors read the pair graph derived from it. At 100 TB
    * this is the signature table you write to parquet once per corpus
    * snapshot, and writing it is a map-only job. */
  def sigSets(spark: SparkSession, dir: String): DataFrame =
    Materialized.cached(sigSetCache, spark, dir)(
      docs(spark, dir)
        // same population as the explode formulation: ≥1 shingle
        .where(length(col("text")) >= ShingleK)
        .select(col("doc_id"), org.apache.spark.sql.graft.ShinglePolyHash(
          col("text"), ShingleK, ShingleB, P).as("raw"))
        // hs is SORTED ascending: every consumer is set-semantic (explode,
        // size, intersection size), and sorted+distinct arrays let the
        // pair verifications run the zero-alloc two-pointer
        // SortedLongIntersectCount instead of array_intersect's per-row
        // boxed hash set (the measured hot spot of the verify joins)
        .select(col("doc_id"), sort_array(array_distinct(col("raw"))).as("hs"),
          org.apache.spark.sql.graft.MinhashSig(col("raw"), CoefA, CoefB, P).as("sig"))
        .select(col("doc_id") +: col("hs") +:
          (0 until K).map(i => col("sig").getItem(i).as(s"s$i")): _*)
        .persist(StorageLevel.MEMORY_AND_DISK))

  /** One row per doc: s0..s{K-1} minhash signature (pruned read of the
    * materialized intermediate). */
  def signatures(spark: SparkSession, dir: String): DataFrame =
    sigSets(spark, dir).drop("hs")

  private val signaturesCte: String = {
    val aggs = (0 until K)
      .map(i => s"min((h * ${CoefA(i)} + ${CoefB(i)}) % $P) AS s$i")
      .mkString(",\n    ")
    s"""$shinglesCte, sig AS MATERIALIZED (
       |  SELECT doc_id,
       |    $aggs
       |  FROM sh GROUP BY doc_id
       |)""".stripMargin
  }

  /** Per-band (doc_id, band, key) rows in SQL — ONE builder shared by the
    * candidate CTE and the tuning report, so the bucketing they describe
    * can never silently diverge. */
  private def bandedRowsSql: String =
    (0 until Bands).map { j =>
      val key = (0 until Rows).map(r => s"CAST(s${j * Rows + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $j AS band, $key AS key FROM sig"
    }.mkString("\n  UNION ALL\n  ")

  private val bandedCte: String = {
    val rowsSql = bandedRowsSql
    s"""$signaturesCte, banded AS MATERIALIZED (
       |  $rowsSql
       |), kept AS (
       |  SELECT band, key FROM banded GROUP BY 1, 2
       |  HAVING count(*) BETWEEN 2 AND $BucketCap
       |), bk AS MATERIALIZED (
       |  SELECT b.doc_id, b.band, b.key FROM banded b
       |  JOIN kept k ON b.band = k.band AND b.key = k.key
       |), cand AS MATERIALIZED (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM bk x JOIN bk y
       |    ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
       |)""".stripMargin
  }

  /** doc_id → (band, key) exploded from a signature frame. */
  private def bandedOf(sig: DataFrame): DataFrame = {
    val bandStructs = (0 until Bands).map { j =>
      struct(lit(j).as("band"),
        concat_ws(",", (0 until Rows).map(r => col(s"s${j * Rows + r}")): _*).as("key"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Bare LSH candidate pairs from band buckets (never all-pairs),
    * materialized once per (session, corpus): minhash estimation AND
    * jaccard verification consume it, so the band explode + capped
    * self-join execute once. Buckets larger than BucketCap are dropped
    * before the self-join, bounding its output to |buckets|·cap²
    * regardless of corpus size. */
  def candidatePairs(spark: SparkSession, dir: String): DataFrame =
    Materialized.cached(candCache, spark, dir) {
      val banded = bandedOf(signatures(spark, dir))
      val kept = banded.groupBy("band", "key")
        .agg(count(lit(1)).as("bn"))
        .where(col("bn").between(2, BucketCap))
        .select("band", "key")
      val bk = banded.join(kept, Seq("band", "key"))
      bk.as("x").join(bk.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key")
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  // ---- #16f LSH tuning report (band/bucket health dashboard) -------------
  /** The dashboard that TUNES the LSH machinery: per band — bucket count,
    * member rows, the largest bucket, singleton buckets (rows generating
    * no candidates), overflow buckets silently dropped by the
    * [[BucketCap]] guard, and the exact candidate-pair volume the kept
    * buckets generate (Σ bn·(bn−1)/2). At 100 TB this is how a bucket
    * blow-up (bad band width, adversarial content) is DETECTED before it
    * melts the pair join — the report reads the same materialized
    * signature frame and is two bounded aggregations (nothing is ever
    * per-pair). All-integer outputs. */
  def lshTuningReport(spark: SparkSession, dir: String): DataFrame =
    bandedOf(signatures(spark, dir))
      .groupBy(col("band"), col("key"))
      .agg(count(lit(1)).as("bn"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(col("bn")).cast("long").as("n_rows"),
        max(col("bn")).cast("long").as("max_bucket"),
        sum(when(col("bn") === 1L, 1L).otherwise(0L)).as("n_singleton"),
        sum(when(col("bn") > BucketCap, 1L).otherwise(0L)).as("n_overflow"),
        sum(when(col("bn").between(2L, BucketCap),
          org.apache.spark.sql.graft.ExactMath.intDiv(
            col("bn") * (col("bn") - 1L), lit(2L))).otherwise(0L))
          .cast("long").as("pairs_generated"))
      .select(col("band").cast("long").as("band"), col("n_buckets"),
        col("n_rows"), col("max_bucket"), col("n_singleton"),
        col("n_overflow"), col("pairs_generated"))
  val lshTuningReportSql: String = {
    s"""$signaturesCte, banded AS (
       |  $bandedRowsSql
       |), buckets AS (
       |  SELECT band, key, count(*) AS bn FROM banded GROUP BY 1, 2
       |)
       |SELECT CAST(band AS BIGINT) AS band, count(*) AS n_buckets,
       |  CAST(sum(bn) AS BIGINT) AS n_rows,
       |  CAST(max(bn) AS BIGINT) AS max_bucket,
       |  CAST(sum(CASE WHEN bn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singleton,
       |  CAST(sum(CASE WHEN bn > $BucketCap THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_overflow,
       |  CAST(sum(CASE WHEN bn BETWEEN 2 AND $BucketCap
       |    THEN (bn * (bn - 1)) // 2 ELSE 0 END) AS BIGINT) AS pairs_generated
       |FROM buckets GROUP BY 1""".stripMargin
  }

  // ---- #16 MinHash near-dup: signature-estimated similarity -------------
  /** 0.5 in exact basis points: sim_hat is matches/K, an integer ratio, so
    * both the emitted value and the threshold stay in pure integer math
    * (§6 float policy — a threshold must never read a round(DOUBLE)). */
  val MinhashSimBp = 5000L
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    // Cached pair set joined back to the persisted signature table (both
    // sides materialized — no shingle or band work re-executes). The pair
    // side carries a shuffle_hash hint: since sigSets became a map-only
    // projection its size estimate comes from the parquet scan, and the
    // planner would otherwise BROADCAST the signature table (corpus-sized
    // at scale — the one frame that must never broadcast) instead of
    // hash-joining on the uniform doc_id key.
    val sig = sigSets(spark, dir)
    val matches = (0 until K)
      .map(i => when(col(s"a.s$i") === col(s"b.s$i"), 1).otherwise(0))
      .reduce(_ + _)
    candidatePairs(spark, dir).hint("shuffle_hash")
      .join(sig.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sig.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        bp(matches, lit(K)).as("sim_hat_bp"))
      .where(col("sim_hat_bp") >= MinhashSimBp)
  }
  val dedupMinhashSql: String = {
    val matches = (0 until K)
      .map(i => s"CASE WHEN a.s$i = b.s$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""$bandedCte
       |SELECT doc_a, doc_b,
       |  ${sqlBp(s"($matches)", K.toString)} AS sim_hat_bp
       |FROM cand
       |JOIN sig a ON doc_a = a.doc_id
       |JOIN sig b ON doc_b = b.doc_id
       |WHERE ${sqlBp(s"($matches)", K.toString)} >= $MinhashSimBp""".stripMargin
  }

  /** The near-dup pair graph, materialized once per (session, corpus):
    * components and survivors iterate over it without re-running LSH. */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    Materialized.cached(pairsCache, spark, dir)(
      dedupMinhash(spark, dir).select("doc_a", "doc_b")
        .persist(StorageLevel.MEMORY_AND_DISK))

  // ---- #17 exact n-gram Jaccard on LSH candidates -----------------------
  /** 0.35 in exact basis points (§6: Jaccard is |∩|/|∪|, an integer ratio —
    * the r4 verdict flagged thresholding on round(DOUBLE) as the
    * highest-risk fragility in the repo). */
  val JaccardBp = 3500L

  private val overlapCache = Materialized.register(
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])

  /** Per-candidate-pair overlap counts (doc_a, doc_b, inter, na, nb),
    * materialized once per (session, corpus): the expensive part of exact
    * verification — one array_intersect over every LSH candidate pair,
    * joined through the corpus-sized shingle-set table — runs ONCE, and
    * Jaccard (#17) and containment (#17b) are row-local arithmetic over
    * this pair-bounded frame. shuffle_hash for the same reason as
    * dedupMinhash: never broadcast the corpus-sized shingle-set table. */
  def pairOverlaps(spark: SparkSession, dir: String): DataFrame =
    Materialized.cached(overlapCache, spark, dir) {
      val cand = candidatePairs(spark, dir).hint("shuffle_hash")
      val shSets = sigSets(spark, dir).select(col("doc_id"), col("hs"))
      cand
        .join(shSets.as("a"), col("doc_a") === col("a.doc_id"))
        .join(shSets.as("b"), col("doc_b") === col("b.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          org.apache.spark.sql.graft.SortedLongIntersectCount(
            col("a.hs"), col("b.hs")).as("inter"),
          size(col("a.hs")).as("na"), size(col("b.hs")).as("nb"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // Candidates, shingle sets AND the per-pair intersection counts come
    // from materialized intermediates — this query is row-local arithmetic
    // over the pair-bounded overlap frame. Exact basis points: floor
    // monotonicity makes `jaccard_bp >= 3500` ≡ `inter/union >= 0.35`.
    pairOverlaps(spark, dir)
      .select(col("doc_a"), col("doc_b"),
        bp(col("inter"), col("na") + col("nb") - col("inter")).as("jaccard_bp"))
      .where(col("jaccard_bp") >= JaccardBp)
  }
  val dedupNgramJaccardSql: String =
    s"""$bandedCte, sizes AS MATERIALIZED (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
       |), inter AS (
       |  SELECT doc_a, doc_b, count(*) AS inter
       |  FROM cand
       |  JOIN sh sa ON doc_a = sa.doc_id
       |  JOIN sh sb ON doc_b = sb.doc_id AND sa.h = sb.h
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b,
       |  ${sqlBp("inter", "(na.n + nb.n - inter)")} AS jaccard_bp
       |FROM inter
       |JOIN sizes na ON doc_a = na.doc_id
       |JOIN sizes nb ON doc_b = nb.doc_id
       |WHERE ${sqlBp("inter", "(na.n + nb.n - inter)")} >= $JaccardBp""".stripMargin

  // ---- #17d exact prefix-filtered Jaccard join (PPJoin-style) ------------
  /** EXACT set-similarity self-join at word-Jaccard ≥ [[PrefixJaccardBp]]
    * via prefix filtering (Chaudhuri/Xiao's PPJoin family): the zero-
    * false-negative complement to the LSH path — band bucketing can MISS
    * a true pair (it is probabilistic by design; `minhash_calibration`
    * prices the error), while two sets with Jaccard ≥ τ MUST share a
    * token inside each other's (n − ⌈τ·n⌉ + 1)-token prefix, so prefix
    * candidates are COMPLETE. Pinned: the same 5-gram shingle-hash sets
    * as the whole minhash family ([[sigSets]] — the corpus pass is
    * shared, not re-run); prefix ordering is rarest-document-frequency-
    * first (df asc, hash asc — the standard ordering that keeps prefix
    * buckets small); ⌈τ·n⌉ = (8n+9) div 10, all-integer; the PPJoin SIZE
    * filter (10·na ≥ 8·nb both ways) and POSITIONAL filter
    * (1 + min(na−rka, nb−rkb) ≥ ⌈τ/(1+τ)·(na+nb)⌉ = (8(na+nb)+17) div 18
    * — the remaining-token overlap upper bound at the shared token's
    * prefix positions) prune inside the candidate join: measured at
    * sf0.1 they collapse 3.2M raw prefix candidates to 482k, which is
    * what keeps exact verification pair-local cheap. Prefix buckets
    * larger than [[PrefixBucketCap]] are dropped before the self-join
    * (the LSH BucketCap discipline): a shingle shared by hundreds of
    * documents' RARE-end prefixes means vocabulary collapse, and the cap
    * is the documented audit hook — completeness holds for every pair
    * with at least one sub-cap shared prefix token.
    *
    * Scale shape: ONE explode of the materialized sets → df rollup; the
    * per-doc prefix rank is a doc-partitioned window (never global); the
    * candidate self-join is bounded by Σ bucket² ≤ |buckets|·cap²; exact
    * verification joins the pair-bounded candidates back through the
    * cached set table (shuffle_hash — never broadcast the corpus). */
  val PrefixJaccardBp = 8000L
  val PrefixBucketCap = 256L
  /** The PPJoin PREFIX INDEX (h, doc_id, n, rk) — the per-corpus artifact
    * the exact join probes (kept prefix tokens in rarest-first rank
    * order, hot buckets dropped), materialized once per (session, corpus)
    * exactly like the banded LSH signature table: the token explode, the
    * document-frequency join and the per-doc rank window all run once. */
  private val prefixIndexCache = Materialized.register(
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])
  private def prefixIndex(spark: SparkSession, dir: String): DataFrame =
    Materialized.cached(prefixIndexCache, spark, dir) {
      import org.apache.spark.sql.expressions.Window
      val sets = sigSets(spark, dir).select(col("doc_id"), col("hs"))
      val tokens = sets.select(col("doc_id"), explode(col("hs")).as("h"),
        size(col("hs")).cast("long").as("n"))
      val freq = tokens.groupBy(col("h")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id").orderBy(col("df"), col("h"))
      val prefix = tokens.join(freq, "h")
        .select(col("doc_id"), col("h"), col("n"),
          row_number().over(w).cast("long").as("rk"))
        .where(col("rk") <= col("n") - expr("(8 * n + 9) DIV 10") + 1)
      val kept = prefix.groupBy(col("h")).agg(count(lit(1)).as("bn"))
        .where(col("bn").between(2L, PrefixBucketCap))
        .select(col("h"))
      prefix.join(kept, "h")
        .select(col("h"), col("doc_id"), col("n"), col("rk"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  def dedupPrefixExact(spark: SparkSession, dir: String): DataFrame = {
    val sets = sigSets(spark, dir).select(col("doc_id"), col("hs"))
    val pf = prefixIndex(spark, dir)
    val cand = pf.select(col("h"), col("doc_id").as("doc_a"),
        col("n").as("na0"), col("rk").as("rka"))
      .join(pf.select(col("h").as("h2"), col("doc_id").as("doc_b"),
          col("n").as("nb0"), col("rk").as("rkb")),
        col("h") === col("h2") && col("doc_a") < col("doc_b") &&
          col("na0") * 10L >= col("nb0") * 8L &&
          col("nb0") * 10L >= col("na0") * 8L &&
          lit(1L) + least(col("na0") - col("rka"), col("nb0") - col("rkb"))
            >= expr("(8 * (na0 + nb0) + 17) DIV 18"))
      .select(col("doc_a"), col("doc_b")).distinct()
    cand.hint("shuffle_hash")
      .join(sets.select(col("doc_id").as("ia"), col("hs").as("hsa")),
        col("doc_a") === col("ia"))
      .join(sets.select(col("doc_id").as("ib"), col("hs").as("hsb")),
        col("doc_b") === col("ib"))
      .select(col("doc_a"), col("doc_b"),
        org.apache.spark.sql.graft.SortedLongIntersectCount(
          col("hsa"), col("hsb")).as("inter"),
        (size(col("hsa")) + size(col("hsb"))).cast("long").as("szsum"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("szsum") - col("inter")).as("n_union"))
      .where(col("inter") * lit(10000L)
        >= lit(PrefixJaccardBp) * col("n_union"))
      .withColumn("jaccard_bp", bp(col("inter"), col("n_union")))
  }
  val dedupPrefixExactSql: String =
    s"""$shinglesCte, dfreq AS MATERIALIZED (
       |  SELECT h, count(*) AS df FROM sh GROUP BY 1
       |), dsz AS MATERIALIZED (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
       |), pre AS MATERIALIZED (
       |  SELECT doc_id, h, rk, n FROM (
       |    SELECT s.doc_id, s.h,
       |      row_number() OVER (PARTITION BY s.doc_id ORDER BY f.df, s.h)
       |        AS rk,
       |      d.n
       |    FROM sh s JOIN dfreq f USING (h) JOIN dsz d USING (doc_id))
       |  WHERE rk <= n - (8 * n + 9) // 10 + 1
       |), keptp AS (
       |  SELECT h FROM pre GROUP BY 1
       |  HAVING count(*) BETWEEN 2 AND $PrefixBucketCap
       |), pf AS MATERIALIZED (
       |  SELECT p.doc_id, p.h, p.rk, p.n FROM pre p JOIN keptp USING (h)
       |), cand AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM pf a JOIN pf b ON a.h = b.h AND a.doc_id < b.doc_id
       |    AND a.n * 10 >= b.n * 8 AND b.n * 10 >= a.n * 8
       |    AND 1 + least(a.n - a.rk, b.n - b.rk)
       |      >= (8 * (a.n + b.n) + 17) // 18
       |), ov AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS inter
       |  FROM cand c
       |  JOIN sh x ON x.doc_id = c.doc_a
       |  JOIN sh y ON y.doc_id = c.doc_b AND y.h = x.h
       |  GROUP BY 1, 2
       |)
       |SELECT o.doc_a, o.doc_b, o.inter,
       |  na.n + nb.n - o.inter AS n_union,
       |  ${graft.functions.TextFns.sqlBp("o.inter",
             "(na.n + nb.n - o.inter)")} AS jaccard_bp
       |FROM ov o
       |JOIN dsz na ON o.doc_a = na.doc_id
       |JOIN dsz nb ON o.doc_b = nb.doc_id
       |WHERE o.inter * 10000 >= $PrefixJaccardBp * (na.n + nb.n - o.inter)""".stripMargin

  // ---- #16g MinHash calibration (estimate vs exact error curve) ----------
  /** How good is the K=32 signature as a Jaccard estimator ON THIS CORPUS —
    * the calibration audit that justifies (or re-sizes) K before anyone
    * trusts `sim_hat_bp` thresholds: per 500-bp error bucket, how many
    * candidate pairs land there and the mean/max |sim_hat − exact| gap.
    * Pure composition of the materialized frames (signature matches from
    * the sig table, exact Jaccard from the overlap frame) — row-local
    * arithmetic over the pair-bounded frame, one ≤21-key rollup. All
    * integer math. */
  def minhashCalibration(spark: SparkSession, dir: String): DataFrame = {
    val sig = sigSets(spark, dir)
    val matches = (0 until K)
      .map(i => when(col(s"a.s$i") === col(s"b.s$i"), 1).otherwise(0))
      .reduce(_ + _)
    val est = candidatePairs(spark, dir).hint("shuffle_hash")
      .join(sig.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sig.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"), bp(matches, lit(K)).as("sim_hat_bp"))
    val exact = pairOverlaps(spark, dir)
      .select(col("doc_a"), col("doc_b"),
        bp(col("inter"), col("na") + col("nb") - col("inter")).as("jaccard_bp"))
    est.join(exact, Seq("doc_a", "doc_b"))
      .select(abs(col("sim_hat_bp") - col("jaccard_bp")).as("err_bp"))
      .groupBy(org.apache.spark.sql.graft.ExactMath.intDiv(
        col("err_bp"), lit(500L)).as("err_bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        org.apache.spark.sql.graft.ExactMath.intDiv(
          sum(col("err_bp")), count(lit(1))).as("mean_err_bp"),
        max(col("err_bp")).cast("long").as("max_err_bp"))
  }
  val minhashCalibrationSql: String = {
    val matchesSql = (0 until K)
      .map(i => s"CASE WHEN sa.s$i = sb.s$i THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")
    s"""$bandedCte, est AS (
       |  SELECT doc_a, doc_b, ${sqlBp(matchesSql, K.toString)} AS sim_hat_bp
       |  FROM cand JOIN sig sa ON doc_a = sa.doc_id
       |            JOIN sig sb ON doc_b = sb.doc_id
       |), sizes AS MATERIALIZED (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
       |), inter AS (
       |  SELECT doc_a, doc_b, count(*) AS inter
       |  FROM cand
       |  JOIN sh ha ON doc_a = ha.doc_id
       |  JOIN sh hb ON doc_b = hb.doc_id AND ha.h = hb.h
       |  GROUP BY 1, 2
       |), exact AS (
       |  -- LEFT from cand: a zero-overlap candidate (band key matched on a
       |  -- minhash value collision with no shared shingle) has NO row in
       |  -- inter but the Spark side (size(array_intersect)=0) still emits
       |  -- it — coalesce keeps the frames aligned on such pairs
       |  SELECT c.doc_a, c.doc_b,
       |    ${sqlBp("coalesce(i.inter, 0)",
                    "(na.n + nb.n - coalesce(i.inter, 0))")} AS jaccard_bp
       |  FROM cand c
       |  LEFT JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
       |  JOIN sizes na ON c.doc_a = na.doc_id
       |  JOIN sizes nb ON c.doc_b = nb.doc_id
       |), err AS (
       |  SELECT abs(e.sim_hat_bp - x.jaccard_bp) AS err_bp
       |  FROM est e JOIN exact x ON e.doc_a = x.doc_a AND e.doc_b = x.doc_b
       |)
       |SELECT err_bp // 500 AS err_bucket, count(*) AS n_pairs,
       |  CAST(sum(err_bp) AS BIGINT) // count(*) AS mean_err_bp,
       |  CAST(max(err_bp) AS BIGINT) AS max_err_bp
       |FROM err GROUP BY 1""".stripMargin
  }

  // ---- #17b asymmetric containment on LSH candidates --------------------
  /** Jaccard containment C(A→B) = |A∩B|/|A|: the asymmetric signal that
    * catches a document EMBEDDED in a larger one (quote farms, wrapper
    * pages), which symmetric Jaccard dilutes below threshold as the host
    * grows. Same scale shape as #17 — materialized candidate pairs joined
    * to the materialized shingle sets, exact intersection only on the
    * LSH-blocked pair set, never all-pairs. A pair is reported when EITHER
    * direction's containment clears the threshold. */
  /** 0.5 in exact basis points (§6). */
  val ContainmentBp = 5000L
  def minhashContainment(spark: SparkSession, dir: String): DataFrame =
    pairOverlaps(spark, dir)
      .select(col("doc_a"), col("doc_b"),
        bp(col("inter"), col("na")).as("contain_a_bp"),
        bp(col("inter"), col("nb")).as("contain_b_bp"))
      .where(col("contain_a_bp") >= ContainmentBp
        || col("contain_b_bp") >= ContainmentBp)
  val minhashContainmentSql: String =
    s"""$bandedCte, sizes AS MATERIALIZED (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
       |), inter AS (
       |  SELECT doc_a, doc_b, count(*) AS inter
       |  FROM cand
       |  JOIN sh sa ON doc_a = sa.doc_id
       |  JOIN sh sb ON doc_b = sb.doc_id AND sa.h = sb.h
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b,
       |  ${sqlBp("inter", "na.n")} AS contain_a_bp,
       |  ${sqlBp("inter", "nb.n")} AS contain_b_bp
       |FROM inter
       |JOIN sizes na ON doc_a = na.doc_id
       |JOIN sizes nb ON doc_b = nb.doc_id
       |WHERE ${sqlBp("inter", "na.n")} >= $ContainmentBp
       |   OR ${sqlBp("inter", "nb.n")} >= $ContainmentBp""".stripMargin

  // ---- dedup clusters: connected components over the near-dup graph -----
  /** Near-dup pairs are only half the dedup story: transitive duplicates
    * (A~B, B~C) must land in one cluster so a single representative (the
    * min doc_id) survives. Iterative min-label propagation — each round is
    * a distributed join+agg, converging in O(component diameter) rounds
    * (tiny for dup clusters). The oracle reaches the same unique fixpoint
    * through a recursive CTE. The result (a tiny doc→component frame) is
    * itself cached per (session, corpus) so survivors reads it for free. */
  /** The persisted RDD behind a localCheckpoint'd frame (a LogicalRDD
    * leaf) — tracked so per-round checkpoint blocks can be released once
    * the final labels are persisted (ADVICE r3: clearAll on the final
    * frame alone left every round's blocks pinned in the block manager). */
  private def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collectLeaves().collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Durable finish for an iterative loop: write the FINAL (tiny,
    * pair-graph-bounded) frame to scratch parquet and serve the persisted
    * read-back. localCheckpoint lineage is unrecoverable on executor loss,
    * so before this the finished labels/ranks had NO recompute path once
    * the round checkpoints were released (the r7/r8 documented caveat);
    * rooting the result at a file scan survives losing every cached block
    * for one bounded write. Set `graft.scratchDir` to shared storage
    * (HDFS/S3) on a real cluster; the default — the driver-local tmp dir —
    * is exactly as durable as local mode itself. */
  private[graft] def durableFinish(spark: SparkSession, tag: String,
      df: DataFrame): DataFrame = {
    val base = spark.conf.getOption("graft.scratchDir").getOrElse {
      // ADVICE r9: on a real multi-node cluster the java.io.tmpdir default
      // is NOT shared storage — executors would commit parquet parts to
      // their own local disks and the read-back would silently return
      // partial labels. Fail fast instead of computing wrong data.
      // local-cluster[...] (the multi-JVM smoke) is single-host, so its
      // tmpdir IS shared; everything else needs an explicit scratchDir.
      val master = spark.sparkContext.master
      require(spark.sparkContext.isLocal || master.startsWith("local-cluster"),
        s"graft.scratchDir must point at shared storage (HDFS/S3/NFS) when " +
          s"running on a multi-node cluster (master=$master); the " +
          "java.io.tmpdir fallback is only correct on a single host")
      s"${sys.props("java.io.tmpdir")}/graft-scratch-${spark.sparkContext.applicationId}"
    }
    val path = s"$base/$tag"
    df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path).persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Scratch-path tag unique to (session instance, corpus dir). */
  private[operators] def scratchTag(name: String, spark: SparkSession, dir: String): String =
    s"$name-${(Materialized.sessionKey(spark, dir).hashCode & 0x7fffffff).toHexString}"

  def dedupComponents(spark: SparkSession, dir: String): DataFrame =
    Materialized.cached(compCache, spark, dir) {
      // The pair graph comes pre-materialized — no LSH re-execution here.
      componentsOfPairs(spark, minhashPairs(spark, dir),
        scratchTag("components", spark, dir))
    }

  /** Min-label + pointer-jumping connected components over ANY
    * (doc_a, doc_b) pair frame — the loop [[dedupComponents]] always ran,
    * factored (r12) so the media near-dup pair graphs (image/audio) get
    * the same checkpoint-disciplined clustering. Returns (doc_id,
    * component); only docs in the pair graph appear. */
  private[operators] def componentsOfPairs(spark: SparkSession,
      pairs: DataFrame, tag: String): DataFrame = {
      val edges0 = pairs
        .select(col("doc_a"), col("doc_b"))
        .union(pairs.select(col("doc_b"), col("doc_a")))
        .toDF("src", "dst")
      val nEdges = edges0.count()
      // iterative-loop execution profile (see pagerankOn): each round is
      // 3 fixed-shape joins + 1 count — per-exchange AQE planning jobs and
      // 32-way tiny shuffles dominate on a pair-graph-bounded frame
      Scale.loopSession(spark, nEdges) { cs =>
      val edges = Scale.rebind(cs, edges0).localCheckpoint(false)
      val ckpts = scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
      checkpointRdd(edges).foreach(ckpts += _)
      // localCheckpoint each round: labels is referenced 3× per round, so
      // without lineage truncation the logical plan grows ~3^rounds and
      // planning time explodes (measured 111 s at sf0.1; ~5 s with it).
      // LAZY checkpoints: the convergence count is the materializing
      // action, so each round runs ONE job instead of two (eager
      // checkpoint + count measured 7.4 s for 11 rounds on a 926-edge
      // graph — per-round fixed cost dominates on small graphs)
      var labels = edges.select(col("src").as("doc")).distinct()
        .withColumn("lbl", col("doc"))
        .localCheckpoint(false)
      checkpointRdd(labels).foreach(ckpts += _)
      var changed = 1L
      var rounds = 0
      // neighbor-min + pointer jumping (lbl := lbl of my lbl) converges in
      // O(log n) rounds even on long chains; one action per round
      while (changed > 0 && rounds < 50) {
        val nbrMin = edges
          .join(labels.withColumnRenamed("doc", "dst2"), col("dst") === col("dst2"))
          .groupBy(col("src").as("doc"))
          .agg(min(col("lbl")).as("nlbl"))
        val stepped = labels.join(nbrMin, Seq("doc"), "left")
          .select(col("doc"), col("lbl").as("old"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("mid"))
        val jumped = stepped
          .join(labels.select(col("doc").as("j_doc"), col("lbl").as("j_lbl")),
            col("mid") === col("j_doc"), "left")
          .select(col("doc"), col("old"),
            least(col("mid"), coalesce(col("j_lbl"), col("mid"))).as("lbl"))
          .localCheckpoint(false)
        checkpointRdd(jumped).foreach(ckpts += _)
        val t0 = System.nanoTime()
        changed = jumped.where(col("lbl") =!= col("old")).count()
        if (sys.env.contains("GRAFT_DEBUG_CC"))
          System.err.println(s"[cc] round=$rounds changed=$changed ms=${(System.nanoTime() - t0) / 1000000}")
        labels = jumped.select("doc", "lbl")
        rounds += 1
      }
      // Practically unreachable with pointer jumping (O(log n) rounds), but
      // a silent non-converged exit would hand wrong components downstream —
      // fail loudly instead (ADVICE r2).
      if (changed > 0)
        throw new IllegalStateException(
          s"dedupComponents did not converge after $rounds rounds (changed=$changed)")
      // Durably finish (scratch parquet + persisted read-back), and only
      // then drop every round's checkpoint blocks — including the last
      // round's, which the durable copy replaces. This both returns
      // O(rounds × |graph|) of block-manager storage that clearAll() could
      // never reach AND leaves the labels recomputable from the file scan
      // even if every cached block is lost (DedupSpec locks the recompute).
      val result = durableFinish(spark, tag,
        labels.select(col("doc").as("doc_id"), col("lbl").as("component")))
      result.count()
      ckpts.foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
      result
      }
  }
  val dedupComponentsSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  ${dedupMinhashSql.linesIterator.mkString("\n  ")}
       |), e AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), r(doc, lbl) AS (
       |  SELECT src, src FROM e
       |  UNION
       |  SELECT e.src, r.lbl FROM e JOIN r ON e.dst = r.doc
       |)
       |SELECT doc AS doc_id, min(lbl) AS component FROM r GROUP BY 1""".stripMargin

  // ---- #16h duplicate-cluster size census --------------------------------
  /** The cluster-size histogram over the near-dup components — the audit
    * row that distinguishes "many doc pairs" (size-2 clusters: organic
    * near-dups) from "few giant clusters" (size-100 mirrors/templates,
    * where survivor selection deletes hundreds of docs per keep). Reads
    * the CACHED component labels (no LSH re-execution): one
    * component-keyed rollup (pair-graph-bounded) and one ≤|sizes|-key
    * histogram. All-integer outputs. */
  def dupClusterSizes(spark: SparkSession, dir: String): DataFrame =
    dedupComponents(spark, dir)
      .groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
      .select(col("sz").cast("long").as("cluster_size"), col("n_clusters"))
  val dupClusterSizesSql: String =
    s"""WITH comp AS (
       |  ${dedupComponentsSql.linesIterator.mkString("\n  ")}
       |), cs AS (
       |  SELECT component, count(*) AS sz FROM comp GROUP BY 1
       |)
       |SELECT CAST(sz AS BIGINT) AS cluster_size, count(*) AS n_clusters
       |FROM cs GROUP BY 1""".stripMargin

  // ---- #19e PageRank over the near-dup pair graph ------------------------
  /** Duplication-hub centrality: PageRank over the (symmetrized) near-dup
    * pair graph — the doc with high rank is the TEMPLATE many others copy
    * (boilerplate hubs, mirror roots), a strictly richer signal than raw
    * degree. Same distributed-iteration discipline as [[dedupComponents]]:
    * a fixed [[PrRounds]] rounds of one bounded join+agg each (edges are
    * the pair graph — tiny relative to the corpus), per-round
    * localCheckpoint lineage truncation, the only driver-side values are
    * the node count and the loop counter. Rows-only BY DESIGN: a
    * data-dependent iterative fixpoint over division results has no
    * single-SQL oracle; the spec brute-forces the same iteration on the
    * collected graph. */
  val PrRounds = 10
  val PrDamp = 0.85

  /** The PR loop over an explicit (src, dst) edge frame — factored out so
    * the spec can drive it with a hand-built graph. Every node must appear
    * as a src (symmetrize first): then out-degrees are ≥ 1 and no mass
    * dangles. */
  /** `nodes`: optional one-column ("src") node universe. Default (None,
    * the dup-graph path) derives nodes from edge sources — correct there
    * because the near-dup graph is symmetrized, so every node has
    * out-edges. A DIRECTED graph (the crawl link graph) must pass the
    * full src∪dst universe or pure-sink nodes would get no rank row;
    * sinks keep out-degree 0, contribute nothing, and their teleport mass
    * simply vanishes (the standard dangling-mass-dropped simplification —
    * ranks are comparable, not a stochastic-matrix fixpoint; pinned). */
  private[graft] def pagerankOn(edges: DataFrame,
      tag: String = s"pagerank-adhoc-${java.util.UUID.randomUUID()}",
      nodes: Option[DataFrame] = None): DataFrame = {
    val spark = edges.sparkSession
    // checkpoint the edge frame before anything reads it: the callers'
    // edge lineages re-parse their source per action (the WARC fixture
    // parse measured ~1 s/scan), and this function reads edges from five
    // places (degrees, two counts, the loop rebind, the final join)
    val e0 = edges.localCheckpoint(false)
    val outDeg = e0.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // deg is also checkpointed up front: the optional `nodes` universe
    // carries the caller's source lineage too, and deg is read four times
    val deg0 = (nodes match {
      case None => outDeg
      case Some(ns) => ns.select(col("src")).distinct()
        .join(outDeg, Seq("src"), "left")
        .select(col("src"), coalesce(col("deg"), lit(0L)).as("deg"))
    }).localCheckpoint(false)
    val ckpts = scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    checkpointRdd(e0).foreach(ckpts += _)
    checkpointRdd(deg0).foreach(ckpts += _)
    val n = deg0.count()
    if (n == 0)
      return deg0.select(col("src").as("doc_id"), col("deg").as("degree"),
        lit(0.0).as("pr"))
    val nEdges = e0.count()
    // the loop's fixed-shape rounds run under the iterative-loop execution
    // profile (Scale.loopSession): on a bounded graph, AQE's per-exchange
    // planning jobs are the dominant cost of every round (measured 161
    // jobs / 21 s wall for a 10-round loop over a 5-node fixture graph)
    Scale.loopSession(spark, math.max(n, nEdges)) { cs =>
      val deg = Scale.rebind(cs, deg0).localCheckpoint(false)
      val edgesW = Scale.rebind(cs, e0).join(deg.where(col("deg") > 0), "src")
        .localCheckpoint(false)
      checkpointRdd(deg).foreach(ckpts += _)
      checkpointRdd(edgesW).foreach(ckpts += _)
      var ranks = deg.select(col("src").as("doc"), lit(1.0 / n).as("pr"))
        .localCheckpoint(false)
      checkpointRdd(ranks).foreach(ckpts += _)
      for (_ <- 1 to PrRounds) {
        val contrib = edgesW
          .join(ranks, col("src") === col("doc"))
          .groupBy(col("dst"))
          .agg(sum(col("pr") / col("deg")).as("inflow"))
        ranks = deg.select(col("src").as("doc"))
          .join(contrib, col("doc") === col("dst"), "left")
          .select(col("doc"),
            (lit((1.0 - PrDamp) / n)
              + lit(PrDamp) * coalesce(col("inflow"), lit(0.0))).as("pr"))
          .localCheckpoint(false)
        checkpointRdd(ranks).foreach(ckpts += _)
      }
      // Same release discipline as dedupComponents: durable finish first
      // (scratch parquet + persisted read-back — the ranks keep a recompute
      // path after the round checkpoints are freed), then drop the blocks.
      // Finished via the PARENT session so readers keep its adaptive conf.
      val out = durableFinish(spark, tag,
        ranks.join(deg, col("doc") === col("src"))
          .select(col("doc").as("doc_id"), col("deg").as("degree"),
            round(col("pr"), 6).cast("decimal(14,6)").cast("double").as("pr")))
      out.count()
      ckpts.foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
      out
    }
  }

  /** HITS (Kleinberg) hubs-and-authorities over a directed edge frame —
    * PageRank's complement: authority rewards being pointed at BY good
    * hubs (the quality-content signal), hub rewards pointing AT good
    * authorities (the directory/index signal); a crawl frontier wants
    * high-authority domains to fetch and high-hub domains to re-mine for
    * links. Pinned variant: [[HitsRounds]] synchronized rounds of the
    * power iteration with L1 normalization each half-step (deterministic —
    * no RNG, no tolerance test), nodes = src∪dst so pure sinks/sources get
    * rows. Scale shape: node-grain frames only — each half-round is ONE
    * join + ONE agg on the edge frame plus a 1-row L1 sum (the only
    * driver-side value, the pagerankOn bounded-fixpoint discipline);
    * rounds localCheckpoint so lineage stays flat, blocks freed after the
    * durable finish. */
  val HitsRounds = 8
  private[graft] def hitsOn(edges: DataFrame, tag: String): DataFrame = {
    val spark = edges.sparkSession
    val e0 = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val nodes0 = e0.select(col("src"))
      .union(e0.select(col("dst").as("src"))).distinct()
      .select(col("src").as("node")).localCheckpoint(false)
    val n = nodes0.count()
    if (n == 0)
      return nodes0.select(col("node").as("domain"),
        lit(0L).as("out_degree"), lit(0L).as("in_degree"),
        lit(0.0).as("hub"), lit(0.0).as("auth"))
    val nEdges = e0.count()
    // iterative-loop execution profile (see pagerankOn): 2 collects + 2
    // checkpoints per round make HITS even more round-trip-bound than PR
    Scale.loopSession(spark, math.max(n, nEdges), roundLiterals = true) { cs =>
    val e = Scale.rebind(cs, e0).localCheckpoint(false)
    val nodes = Scale.rebind(cs, nodes0).localCheckpoint(false)
    val ckpts = scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    checkpointRdd(e).foreach(ckpts += _)
    checkpointRdd(nodes).foreach(ckpts += _)
    checkpointRdd(e0).foreach(ckpts += _)
    checkpointRdd(nodes0).foreach(ckpts += _)
    var hub = nodes.select(col("node"), lit(1.0 / n).as("hub"))
      .localCheckpoint(false)
    checkpointRdd(hub).foreach(ckpts += _)
    var auth = nodes.select(col("node"), lit(1.0 / n).as("auth"))
    for (_ <- 1 to HitsRounds) {
      val rawAuth = e.join(hub, col("src") === col("node"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("raw"))
      val aSum = rawAuth.agg(sum(col("raw")).as("s"))
        .collect().headOption.map(_.getDouble(0)).getOrElse(1.0)
      auth = nodes
        .join(rawAuth, col("node") === col("dst"), "left")
        .select(col("node"),
          (coalesce(col("raw"), lit(0.0)) / lit(aSum)).as("auth"))
        .localCheckpoint(false)
      checkpointRdd(auth).foreach(ckpts += _)
      val rawHub = e.join(auth, col("dst") === col("node"))
        .groupBy(col("src")).agg(sum(col("auth")).as("raw"))
      val hSum = rawHub.agg(sum(col("raw")).as("s"))
        .collect().headOption.map(_.getDouble(0)).getOrElse(1.0)
      hub = nodes
        .join(rawHub, col("node") === col("src"), "left")
        .select(col("node"),
          (coalesce(col("raw"), lit(0.0)) / lit(hSum)).as("hub"))
        .localCheckpoint(false)
      checkpointRdd(hub).foreach(ckpts += _)
    }
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_degree"))
    val inDeg = e.groupBy(col("dst")).agg(count(lit(1)).as("in_degree"))
    val out = durableFinish(spark, tag,
      nodes
        .join(outDeg, col("node") === col("src"), "left").drop("src")
        .join(inDeg, col("node") === col("dst"), "left").drop("dst")
        .join(hub.withColumnRenamed("node", "hn"), col("node") === col("hn"))
        .drop("hn")
        .join(auth.withColumnRenamed("node", "an"), col("node") === col("an"))
        .drop("an")
        .select(col("node").as("domain"),
          coalesce(col("out_degree"), lit(0L)).as("out_degree"),
          coalesce(col("in_degree"), lit(0L)).as("in_degree"),
          round(col("hub"), 6).cast("decimal(14,6)").cast("double")
            .as("hub"),
          round(col("auth"), 6).cast("decimal(14,6)").cast("double")
            .as("auth")))
    out.count()
    ckpts.foreach(r => try r.unpersist(false) catch { case _: Throwable => () })
    out
    }
  }

  def dupPagerank(spark: SparkSession, dir: String): DataFrame =
    // the rank table is a per-corpus artifact like the component labels:
    // materialize once per (session, corpus) — the 10-round loop re-running
    // per invocation measured ~14 s of pure per-round job overhead at sf0.1
    Materialized.cached(prCache, spark, dir) {
      val pairs = minhashPairs(spark, dir)
      pagerankOn(
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))),
        scratchTag("pagerank", spark, dir))
    }

  /** Non-representative members of near-dup clusters — the docs a dedup
    * pass REMOVES. Tiny (bounded by the pair graph, not the corpus), so
    * downstream anti-joins broadcast it. */
  def droppedDocs(spark: SparkSession, dir: String): DataFrame =
    dedupComponents(spark, dir)
      .where(col("doc_id") =!= col("component"))
      .select("doc_id")

  /** The end product of near-dedup: every doc_id that survives — cluster
    * representatives (min id per component) plus all docs outside the
    * near-dup graph. This is the frame a training pipeline feeds onward. */
  def dedupSurvivors(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select("doc_id")
      .join(droppedDocs(spark, dir), Seq("doc_id"), "left_anti")
  val dedupSurvivorsSql: String =
    s"""WITH comp AS (
       |  ${dedupComponentsSql.linesIterator.mkString("\n  ")}
       |)
       |SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> component)""".stripMargin

  /** Quality-argmax cluster representatives — the keep policy production
    * dedup actually ships (RefinedWeb/FineWeb keep the best-scoring
    * member of a near-dup cluster, not an arbitrary one; `dedup_survivors`
    * is the min-id policy): one row per component with the member of
    * highest heuristic quality (tie: min doc_id), its score, and the
    * cluster size. The two policies' delta is auditable by joining this
    * against `dedup_survivors`.
    *
    * Scale: the component frame is pair-graph-bounded; quality rides the
    * one-pass codegen'd profile through a doc_id equi-join; the window is
    * component-keyed, so its partitions are cluster-sized — never global. */
  def dedupBestSurvivors(spark: SparkSession, dir: String): DataFrame = {
    val comp = dedupComponents(spark, dir)
    // r14 (mirrors the oracle's r11 spill fix): profile ONLY the docs in
    // the pair-graph-bounded component frame — the semi-join prunes the
    // corpus BEFORE the per-doc regex profile pass, which previously ran
    // over every document on every invocation.
    val q = docs(spark, dir)
      .join(comp.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        TextAnalysis.qualityBpFrom(TextAnalysis.profileCol).as("quality_bp"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
    comp
      .join(q, Seq("doc_id"))
      .withColumn("n_members", count(lit(1)).over(w))
      .withColumn("rk", row_number().over(
        w.orderBy(col("quality_bp").desc, col("doc_id"))))
      .where(col("rk") === 1)
      .select(col("component"), col("doc_id"), col("quality_bp"),
        col("n_members"))
  }
  lazy val dedupBestSurvivorsSql: String =
    // Spill-friendly shape (VERDICT r11 #1: this oracle OOM'd the loaded
    // driver box): the quality expression is evaluated ONLY for docs in
    // the pair-graph-bounded comp frame (the r11 CTE profiled all of
    // `documents` first), and the two corpus windows are replaced by one
    // bounded GROUP BY + a semi-join back — group-hash aggregation goes
    // out-of-core in DuckDB where a window partition materializes. comp is
    // referenced twice → MATERIALIZED so the recursive label propagation
    // runs once, not per reference.
    s"""WITH comp AS MATERIALIZED (
       |  ${dedupComponentsSql.linesIterator.mkString("\n  ")}
       |), q AS (
       |  SELECT doc_id, ${TextAnalysis.sqlQualityBpExpr} AS quality_bp
       |  FROM documents
       |  WHERE doc_id IN (SELECT doc_id FROM comp)
       |), j AS (
       |  SELECT component, c.doc_id AS doc_id, quality_bp
       |  FROM comp c JOIN q USING (doc_id)
       |), best AS (
       |  SELECT component, count(*) AS n_members,
       |    max(quality_bp) AS best_bp
       |  FROM j GROUP BY 1
       |)
       |SELECT j.component, min(j.doc_id) AS doc_id, b.best_bp AS quality_bp,
       |  CAST(b.n_members AS BIGINT) AS n_members
       |FROM j JOIN best b ON j.component = b.component
       |  AND j.quality_bp = b.best_bp
       |GROUP BY 1, 3, 4""".stripMargin

  // ---- #16c per-source duplication inflation ------------------------------
  /** How much of each feed is duplicate weight — the per-source view of
    * the drop decision (dedup_report shows WHICH feeds overlap; this shows
    * what each feed LOSES): per source, doc count, near-dup drops
    * (non-representative component members), survivors, and the drop rate
    * in exact bp. The dropped list is bounded by the pair graph and joins
    * the pruned (doc_id, source) scan; the rollup runs on ~10¹ source
    * keys with map-side partials. */
  def dupInflationBySource(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"), col("source"))
      .join(droppedDocs(spark, dir).withColumn("dropped", lit(1L)),
        Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("dropped"), lit(0L))).as("n_dropped"))
      .select(col("source"), col("n_docs"), col("n_dropped"),
        (col("n_docs") - col("n_dropped")).as("n_survivors"),
        graft.functions.TextFns.bp(col("n_dropped"), col("n_docs"))
          .as("drop_bp"))
  lazy val dupInflationBySourceSql: String =
    s"""WITH comp AS (
       |  ${dedupComponentsSql.linesIterator.mkString("\n  ")}
       |), drp AS (
       |  SELECT doc_id FROM comp WHERE doc_id <> component
       |)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dropped,
       |  CAST(count(*) - sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_survivors,
       |  ${graft.functions.TextFns.sqlBp(
            "sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)",
            "count(*)")} AS drop_bp
       |FROM documents doc LEFT JOIN drp d ON doc.doc_id = d.doc_id
       |GROUP BY 1""".stripMargin

  // ---- #16d train/test near-dup leakage audit -----------------------------
  /** Does the eval split leak through near-duplicates? Exact-match
    * decontamination misses paraphrased/near-dup leakage — this audit
    * counts minhash near-dup pairs per unordered split pair of the
    * reproducible [[Curation.trainSplit]] assignment, flagging the
    * cross-split rows (a train↔test pair means the test doc's content is
    * effectively in training). The pair graph is bounded and BROADCASTS
    * into two joins against the map-only split frame (the dedup_report
    * shape); the rollup runs on ≤ 6 unordered split-pair keys. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val sp = Curation.trainSplit(spark, dir).select(col("doc_id"), col("split"))
    sp.as("a").join(broadcast(minhashPairs(spark, dir)),
        col("doc_a") === col("a.doc_id"))
      .join(sp.as("b"), col("doc_b") === col("b.doc_id"))
      .groupBy(least(col("a.split"), col("b.split")).as("split_x"),
        greatest(col("a.split"), col("b.split")).as("split_y"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leak", col("split_x") =!= col("split_y"))
  }
  lazy val splitLeakageSql: String =
    s"""WITH pairs AS (
       |  ${dedupMinhashSql.linesIterator.mkString("\n  ")}
       |), sp AS (
       |  ${Curation.trainSplitSql.linesIterator.mkString("\n  ")}
       |)
       |SELECT least(sa.split, sb.split) AS split_x,
       |  greatest(sa.split, sb.split) AS split_y,
       |  count(*) AS n_pairs,
       |  least(sa.split, sb.split) <> greatest(sa.split, sb.split) AS leak
       |FROM pairs
       |JOIN sp sa ON doc_a = sa.doc_id
       |JOIN sp sb ON doc_b = sb.doc_id
       |GROUP BY 1, 2""".stripMargin

  // ---- #16b cross-source duplication report ------------------------------
  /** Where does duplication come from? Near-dup pair counts per unordered
    * source pair — the diagnostic that tells a curation run which feeds
    * overlap (mirror sites, scrape overlap) before it decides what to
    * drop. The pair graph is bounded and BROADCASTS into two joins against
    * a pruned (doc_id, source) scan; the agg runs on ≤|sources|² keys. */
  def dedupReport(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashPairs(spark, dir)
    val src = docs(spark, dir).select(col("doc_id"), col("source"))
    src.as("a").join(broadcast(pairs), col("doc_a") === col("a.doc_id"))
      .join(src.as("b"), col("doc_b") === col("b.doc_id"))
      .groupBy(
        least(col("a.source"), col("b.source")).as("source_x"),
        greatest(col("a.source"), col("b.source")).as("source_y"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("doc_a")).as("n_docs_a"),
        countDistinct(col("doc_b")).as("n_docs_b"))
  }
  val dedupReportSql: String =
    s"""WITH pairs AS (
       |  ${dedupMinhashSql.linesIterator.mkString("\n  ")}
       |)
       |SELECT least(da.source, db.source) AS source_x,
       |  greatest(da.source, db.source) AS source_y,
       |  count(*) AS n_pairs,
       |  count(DISTINCT doc_a) AS n_docs_a,
       |  count(DISTINCT doc_b) AS n_docs_b
       |FROM pairs
       |JOIN documents da ON doc_a = da.doc_id
       |JOIN documents db ON doc_b = db.doc_id
       |GROUP BY 1, 2""".stripMargin

  // ---- #16c incremental dedup (new batch vs existing corpus) -------------
  /** The production daily-increment shape: dedup the fresh batch AGAINST
    * the standing corpus without re-pairing the corpus with itself. Here
    * odd doc_ids stand in for the increment and even ids for the corpus
    * (deterministic at every SF). Both sides read the SAME materialized
    * signature frame; only bands are exploded, the join is new×existing on
    * (band, key) — never corpus×corpus — and existing-side buckets above
    * BucketCap are dropped exactly like the self-join case. At 100 TB the
    * existing side is the signature table on disk, bucketed by band key,
    * and the increment probes matching buckets only. */
  /** Candidate phase of [[dedupIncremental]] (band-bucket probe with the
    * over-full-bucket cap), factored out so ScaleSpec can assert the
    * on-disk bucketed probe is candidate-set-IDENTICAL to this in-memory
    * form — not merely a superset (ADVICE r8). */
  private[graft] def incrementalCandidates(spark: SparkSession, dir: String): DataFrame = {
    val existing = bandedOf(signatures(spark, dir).where(col("doc_id") % 2 === 0))
    val fresh = bandedOf(signatures(spark, dir).where(col("doc_id") % 2 === 1))
    val keptOld = existing.groupBy("band", "key")
      .agg(count(lit(1)).as("bn")).where(col("bn") <= BucketCap)
      .select("band", "key")
    fresh.as("f")
      .join(existing.join(keptOld, Seq("band", "key")).as("e"), Seq("band", "key"))
      .select(col("f.doc_id").as("new_doc"), col("e.doc_id").as("old_doc"))
      .distinct()
  }

  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val sig = sigSets(spark, dir)
    val cand = incrementalCandidates(spark, dir)
    val matches = (0 until K)
      .map(i => when(col(s"a.s$i") === col(s"b.s$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.hint("shuffle_hash")
      .join(sig.as("a"), col("new_doc") === col("a.doc_id"))
      .join(sig.as("b"), col("old_doc") === col("b.doc_id"))
      .select(col("new_doc"), col("old_doc"),
        bp(matches, lit(K)).as("sim_hat_bp"))
      .where(col("sim_hat_bp") >= MinhashSimBp)
  }
  val dedupIncrementalSql: String = {
    val matches = (0 until K)
      .map(i => s"CASE WHEN a.s$i = b.s$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    val bandRows = (j: String) => (0 until Bands).map { b =>
      val key = (0 until Rows).map(r => s"CAST(s${b * Rows + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, $key AS key FROM sig WHERE doc_id % 2 = $j"
    }.mkString("\n  UNION ALL\n  ")
    s"""$signaturesCte, banded_old AS (
       |  ${bandRows("0")}
       |), banded_new AS (
       |  ${bandRows("1")}
       |), kept_old AS (
       |  SELECT band, key FROM banded_old GROUP BY 1, 2
       |  HAVING count(*) <= $BucketCap
       |), cand AS (
       |  SELECT DISTINCT f.doc_id AS new_doc, e.doc_id AS old_doc
       |  FROM banded_new f
       |  JOIN banded_old e ON f.band = e.band AND f.key = e.key
       |  JOIN kept_old k ON e.band = k.band AND e.key = k.key
       |)
       |SELECT new_doc, old_doc,
       |  ${sqlBp(s"($matches)", K.toString)} AS sim_hat_bp
       |FROM cand
       |JOIN sig a ON new_doc = a.doc_id
       |JOIN sig b ON old_doc = b.doc_id
       |WHERE ${sqlBp(s"($matches)", K.toString)} >= $MinhashSimBp""".stripMargin
  }

  /** The 100 TB form of [[dedupIncremental]]'s existing side, demonstrated:
    * the standing corpus's banded signature table written to DISK bucketed
    * (and sorted) by the band-bucket key, so a daily increment's probe join
    * reshuffles ONLY the increment — the corpus-sized table is read
    * in-place, bucket-for-bucket, with no exchange above its scan, and the
    * over-full-bucket cap aggregates on the same bucketing (also
    * exchange-free). Returns the candidate (new_doc, old_doc) pairs —
    * row-identical to the in-memory probe's candidate phase; ScaleSpec
    * locks both the equivalence and the single-exchange plan shape.
    * `table` is a registered bucketed table (re)written per call: in
    * production it is written once per corpus snapshot and probed by every
    * subsequent increment. */
  def incrementalProbeBucketed(spark: SparkSession, dir: String,
      table: String = "graft_sig_banded_b", buckets: Int = 16): DataFrame = {
    val bkey = concat_ws(":", col("band"), col("key"))
    val existing = bandedOf(signatures(spark, dir).where(col("doc_id") % 2 === 0))
      .select(col("doc_id"), bkey.as("bkey"))
    Scale.writeBucketed(existing, table, "bkey", buckets)
    val exT = spark.table(table)
    val keptOld = exT.groupBy("bkey").agg(count(lit(1)).as("bn"))
      .where(col("bn") <= BucketCap).select("bkey")
    val fresh = bandedOf(signatures(spark, dir).where(col("doc_id") % 2 === 1))
      .select(col("doc_id").as("new_doc"), bkey.as("bkey"))
    fresh.join(exT.join(keptOld, Seq("bkey")).as("e"), Seq("bkey"))
      .select(col("new_doc"), col("e.doc_id").as("old_doc"))
      .distinct()
  }

  // ---- #16e Bloom-probe incremental segment membership -------------------
  /** The cheapest daily-increment membership test: a Bloom filter built
    * over the standing corpus's segment hashes prefilters the fresh batch's
    * segments MAP-ONLY (one filter blob evaluated per row, no join), and
    * only the might-contain survivors — true repeats plus the filter's ~1%
    * false positives — reach the exact confirm semi-join. Result semantics
    * are EXACT (the confirm join removes every false positive; Bloom
    * filters have no false negatives), so the oracle is a plain join.
    * Segment-level (same SegLen windows as `dedup_segments`) rather than
    * whole-document because that's where increment-time membership bites:
    * boilerplate and quoted passages recur across batches even when no
    * document is an exact copy.
    *
    * Scale: at 100 TB the standing corpus's segment-hash set is ~10^10
    * keys → a sharded filter (or one ~12 GB blob at 1% fpp — size via
    * [[BloomItems]]/[[BloomBits]]); built once, evaluated map-side, so the
    * mostly-novel fresh batch shuffles only its survivor fraction into the
    * confirm join instead of all of it. This is Catalyst's own injected
    * runtime Bloom join filter (BloomFilterAggregate + might_contain) made
    * explicit, because in the incremental pipeline the corpus-side scan
    * lives in a different job than the probe. Same odd/even increment
    * convention as [[dedupIncremental]]. */
  val BloomItems = 1000000L
  val BloomBits = 8388608L // 2^23 bits = 1 MiB ≈ 2% fpp at 1M items (8.4 bits/key)
  def dedupBloom(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graft.Bloom
    // materialized: this query reads the segment frame from four plan
    // branches (bloom build, prefilter, confirm join, totals)
    val segs = Curation.segmentsCached(spark, dir)
    val old = segs.where(col("doc_id") % 2 === 0).select(col("sh"))
    val fresh = segs.where(col("doc_id") % 2 === 1)
    val bf = old.agg(Bloom.bloomAgg(col("sh"), BloomItems, BloomBits).as("bf"))
    val seen = fresh.where(Bloom.mightContain(bf, col("sh")))
      .join(old.distinct().hint("shuffle_hash"), Seq("sh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("ns"))
    fresh.groupBy("doc_id").agg(count(lit(1)).as("n_segments"))
      .join(seen, Seq("doc_id"), "left")
      .select(col("doc_id").as("new_doc"), col("n_segments"),
        coalesce(col("ns"), lit(0L)).as("n_seen_segments"),
        bp(coalesce(col("ns"), lit(0L)), col("n_segments")).as("seen_bp"))
  }
  // lazy: references Curation.SegLen, and Curation's own init reads Dedup
  // vals — eager init here would deadlock the two objects' <clinit>
  lazy val dedupBloomSql: String =
    s"""WITH toksx AS (
       |  SELECT doc_id, list_filter(list_transform(
       |    string_split_regex(text, '\\s+'), t -> lower(t)), t -> t <> '') AS t
       |  FROM documents
       |), segs AS (
       |  SELECT doc_id,
       |    ${sqlMd5Long("g.s")} AS sh
       |  FROM toksx, unnest(list_transform(range(1, ((len(t) - 1) // ${Curation.SegLen}) + 2),
       |    i -> list_aggr(t[(i - 1) * ${Curation.SegLen} + 1 : (i - 1) * ${Curation.SegLen} + ${Curation.SegLen}],
       |      'string_agg', ' '))) AS g(s)
       |  WHERE len(t) >= 1
       |), old AS (
       |  SELECT DISTINCT sh FROM segs WHERE doc_id % 2 = 0
       |), fresh AS (
       |  SELECT doc_id, sh FROM segs WHERE doc_id % 2 = 1
       |)
       |SELECT f.doc_id AS new_doc, count(*) AS n_segments,
       |  CAST(sum(CASE WHEN o.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_seen_segments,
       |  ${sqlBp("sum(CASE WHEN o.sh IS NOT NULL THEN 1 ELSE 0 END)", "count(*)")}
       |    AS seen_bp
       |FROM fresh f LEFT JOIN old o ON f.sh = o.sh
       |GROUP BY 1""".stripMargin

  /** 60-bit simhash over distinct lowercase tokens; 4×15-bit chunk blocking
    * guarantees recall for hamming ≤ 3 (pigeonhole). */
  val SimhashBits = 60
  val SimhashChunks = 4
  val ChunkBits = SimhashBits / SimhashChunks
  val HammingMax = 3
  /** Same guard as the LSH BucketCap: a 15-bit chunk value shared by more
    * than this many docs is non-discriminative (e.g. near-empty docs whose
    * chunk is all zeros) and would emit O(n²) pairs from one hot key. The
    * pigeonhole recall guarantee is sacrificed only for those degenerate
    * buckets — standard blocking practice at corpus scale. */
  val ChunkCap = 64

  private val simhashCache = Materialized.register(
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])

  /** One row per doc, materialized per (session, corpus): both sides of the
    * chunk-blocked self-join consume it without re-reading the corpus.
    *
    * The whole hash is ONE codegen'd projection (Simhash60): tokenize +
    * dedup inside the row with array built-ins, then a single-pass md5
    * bit-vote — a map-only stage with zero shuffles. The previous shape
    * (explode → (doc, token)-distinct shuffle → 60-conditional-sum
    * aggregation shuffle) moved the tokenized corpus through two exchanges
    * to compute a value that never needed to leave its row. Bit-identical
    * to the oracle's explode+sum formulation because the vote sums commute
    * over any token order. */
  def simhashes(spark: SparkSession, dir: String): DataFrame =
    Materialized.cached(simhashCache, spark, dir) {
      val toks = array_distinct(filter(
        transform(split(col("text"), WsTokenRe), t => lower(t)), t => t =!= ""))
      docs(spark, dir)
        .select(col("doc_id"),
          org.apache.spark.sql.graft.Simhash60(toks).as("simhash"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  private[operators] val simhashCte: String = {
    val sums = (0 until SimhashBits)
      .map(i => s"sum(CASE WHEN (th >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS c$i")
      .mkString(",\n    ")
    val value = (0 until SimhashBits)
      .map(i => s"CASE WHEN c$i > 0 THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT DISTINCT d.doc_id, ${sqlMd5Long("lower(t.w)")} AS th
       |  FROM documents d, unnest(string_split_regex(d.text, '\\s+')) AS t(w)
       |  WHERE t.w <> ''
       |), bitsums AS (
       |  SELECT doc_id,
       |    $sums
       |  FROM toks GROUP BY doc_id
       |), sim AS (
       |  SELECT doc_id, CAST($value AS BIGINT) AS simhash FROM bitsums
       |)""".stripMargin
  }

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val sim = simhashes(spark, dir)
    val chunkStructs = (0 until SimhashChunks).map { j =>
      struct(lit(j).as("cidx"),
        shiftright(col("simhash"), j * ChunkBits)
          .bitwiseAND((1L << ChunkBits) - 1).as("chunk"))
    }
    val chunked = sim
      .select(col("doc_id"), col("simhash"), explode(array(chunkStructs: _*)).as("ck"))
      .select(col("doc_id"), col("simhash"),
        col("ck.cidx").as("cidx"), col("ck.chunk").as("chunk"))
    // Cap chunk buckets before the self-join (mirrors the LSH BucketCap):
    // bounds candidate output to |buckets|·cap² regardless of corpus size.
    val kept = chunked.groupBy("cidx", "chunk")
      .agg(count(lit(1)).as("cn")).where(col("cn").between(2, ChunkCap))
      .select("cidx", "chunk")
    val ck = chunked.join(kept, Seq("cidx", "chunk"))
    ck.as("x").join(ck.as("y"),
        col("x.cidx") === col("y.cidx") && col("x.chunk") === col("y.chunk")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= HammingMax)
  }
  val dedupSimhashSql: String = {
    val chunkRows = (0 until SimhashChunks).map { j =>
      s"SELECT doc_id, simhash, $j AS cidx, (simhash >> ${j * ChunkBits}) & ${(1L << ChunkBits) - 1} AS chunk FROM sim"
    }.mkString("\n  UNION ALL\n  ")
    s"""$simhashCte, chunked AS (
       |  $chunkRows
       |), ckept AS (
       |  SELECT cidx, chunk FROM chunked GROUP BY 1, 2
       |  HAVING count(*) BETWEEN 2 AND $ChunkCap
       |), ck AS (
       |  SELECT c.doc_id, c.simhash, c.cidx, c.chunk FROM chunked c
       |  JOIN ckept k ON c.cidx = k.cidx AND c.chunk = k.chunk
       |)
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
       |FROM ck x JOIN ck y
       |  ON x.cidx = y.cidx AND x.chunk = y.chunk AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= $HammingMax""".stripMargin
  }

  // ---- corpus dedup dashboard (one-row composition over shared frames) --
  /** The summary row a curation run logs after dedup: corpus size, exact
    * groups, near-dup pair/cluster counts, survivors. Every input is an
    * aggregate of an ALREADY-MATERIALIZED frame (pair graph, component
    * labels) or a single count — five 1-row frames broadcast-joined, so
    * the dashboard costs five tiny aggregations, never re-running LSH. */
  def dedupSummary(spark: SparkSession, dir: String): DataFrame = {
    def one(df: DataFrame, as: String) = df.agg(count(lit(1)).as(as))
    val docsN = one(spark.read.parquet(s"$dir/documents.parquet"), "n_docs")
    val exactN = one(dedupExact(spark, dir), "n_exact_groups")
    val pairsN = one(minhashPairs(spark, dir), "n_neardup_pairs")
    val compN = one(dedupComponents(spark, dir), "n_clustered_docs")
    val survN = one(dedupSurvivors(spark, dir), "n_survivors")
    docsN.crossJoin(broadcast(exactN)).crossJoin(broadcast(pairsN))
      .crossJoin(broadcast(compN)).crossJoin(broadcast(survN))
  }
  lazy val dedupSummarySql: String =
    s"""SELECT
       |  (SELECT count(*) FROM documents) AS n_docs,
       |  (SELECT count(*) FROM (
       |    ${dedupExactSql.linesIterator.mkString("\n    ")}
       |  )) AS n_exact_groups,
       |  (SELECT count(*) FROM (
       |    ${dedupMinhashSql.linesIterator.mkString("\n    ")}
       |  )) AS n_neardup_pairs,
       |  (SELECT count(*) FROM (
       |    ${dedupComponentsSql.linesIterator.mkString("\n    ")}
       |  )) AS n_clustered_docs,
       |  (SELECT count(*) FROM (
       |    ${dedupSurvivorsSql.linesIterator.mkString("\n    ")}
       |  )) AS n_survivors""".stripMargin

  // ---- #19 embedding-cosine near-dup ------------------------------------
  val CosineThreshold = 0.4 // tuned to the synthetic embeddings (max pairwise cos ~0.51)
  val Dim = 64

  /** Codegen'd left-fold dot product (graft.functions.FloatDotProduct) —
    * bit-identical to the oracle's explicit left-assoc chain (same IEEE op
    * sequence), unlike an unordered SUM over unnest. */
  def dotExpr(a: String, b: String): Column =
    org.apache.spark.sql.graft.FloatDotProduct(col(a), col(b))
  def sqlDotExpr(a: String, b: String): String =
    (0 until Dim).map(i =>
      s"CAST($a[${i + 1}] AS DOUBLE) * CAST($b[${i + 1}] AS DOUBLE)")
      .mkString(" + ")

  /** Blocked by multi-table signed-random-hyperplane LSH (the shape
    * production near-dup dedup uses at scale): per table t, each vector
    * equi-joins only vectors whose 8-bit bucket_t is within hamming 1 of
    * its own (side b exploded to its 9 probe buckets, side a keeps its
    * home bucket — never a cartesian); candidates are the UNION over
    * NumTables independent tables, so a pair kept with probability p per
    * table survives with 1-(1-p)^L overall (recall math in BASELINE.md).
    * The oracle mirrors the same blocking — identical pairs both engines. */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    // Norms once per vector (not per pair): 3× less math in the pair loop.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id") +: col("embedding") +:
        sqrt(dotExpr("embedding", "embedding")).as("nrm") +:
        (0 until Similarity.NumTables).map(t =>
          Similarity.bucketColT("embedding", t).as(s"bucket$t")): _*)
    val probeMasks = 0L +: (0 until Similarity.NumPlanes).map(j => 1L << j)
    val cos = dotExpr("a.embedding", "b.embedding") / (col("a.nrm") * col("b.nrm"))
    def tablePairs(t: Int): DataFrame = {
      val probed = emb.select(col("vec_id"), col("embedding"), col("nrm"),
        explode(array(probeMasks.map(m =>
          col(s"bucket$t").bitwiseXOR(lit(m))): _*)).as("pb"))
      emb.as("a").join(probed.as("b"),
          col(s"a.bucket$t") === col("b.pb") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          cos.as("cos_raw"))
    }
    // §6: the threshold reads the RAW cosine — dot/sqrt/divide are
    // exact-rounded IEEE ops evaluated in the same order by both engines,
    // so the unrounded doubles (and hence the kept row set) are
    // bit-identical; only the EMITTED value is rounded, to a pinned
    // decimal so the compare never hashes engine-formatted doubles.
    (0 until Similarity.NumTables).map(tablePairs).reduce(_ union _)
      .dropDuplicates("vec_a", "vec_b")
      .where(col("cos_raw") >= CosineThreshold)
      .select(col("vec_a"), col("vec_b"),
        round(col("cos_raw"), 4).cast("decimal(14,4)").cast("double").as("cos"))
  }
  // ---- #19d semantic ↔ lexical dedup agreement ---------------------------
  /** The audit a curation pipeline runs on its semantic dedup: for every
    * embedding near-dup pair, the exact n-gram Jaccard of the two linked
    * documents (vec_id ≡ doc_id in this corpus). High cosine + low Jaccard
    * = paraphrase-level duplication only embeddings catch; high both =
    * lexical copy the cheaper pipeline would have caught. The pair side is
    * bounded by the near-dup graph and BROADCASTS; the shingle sets come
    * from the shared materialized frame, so no corpus-scale work runs
    * beyond the two bounded joins. */
  def semanticLexicalAgreement(spark: SparkSession, dir: String): DataFrame = {
    val pairs = dedupEmbedding(spark, dir)
    val shSets = sigSets(spark, dir).select(col("doc_id"), col("hs"))
    val inter = org.apache.spark.sql.graft.SortedLongIntersectCount(
      col("a.hs"), col("b.hs"))
    shSets.as("a").join(broadcast(pairs), col("vec_a") === col("a.doc_id"))
      .join(shSets.as("b"), col("vec_b") === col("b.doc_id"))
      .select(col("vec_a"), col("vec_b"), col("cos"),
        bp(inter, size(col("a.hs")) + size(col("b.hs")) - inter).as("jaccard_bp"))
  }
  lazy val semanticLexicalAgreementSql: String = {
    val body = dedupEmbeddingSql
    // splice the embedding-pair CTEs and the shingle CTE into one WITH
    val embWith = body.stripPrefix("WITH ")
    val cteEnd = embWith.lastIndexOf(")\nSELECT")
    val embCtes = embWith.substring(0, cteEnd + 1)
    val shCte = shinglesCte.stripPrefix("WITH ")
    // inter LEFT-joins to pairs (ADVICE r4): a zero-overlap pair — exactly
    // the paraphrase-only signal this audit exists to surface — must emit
    // jaccard_bp = 0 in both engines, not vanish from the oracle side.
    s"""WITH $embCtes, pairs AS (
       |  SELECT vec_a, vec_b, CAST(CAST(round(cos_raw, 4) AS DECIMAL(14,4)) AS DOUBLE) AS cos
       |  FROM cand WHERE cos_raw >= $CosineThreshold
       |), $shCte, sizes AS MATERIALIZED (
       |  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
       |), inter AS (
       |  SELECT vec_a, vec_b, count(*) AS inter
       |  FROM pairs
       |  JOIN sh sa ON vec_a = sa.doc_id
       |  JOIN sh sb ON vec_b = sb.doc_id AND sa.h = sb.h
       |  GROUP BY 1, 2
       |)
       |SELECT p.vec_a, p.vec_b, p.cos,
       |  ${sqlBp("coalesce(i.inter, 0)",
                  "(na.n + nb.n - coalesce(i.inter, 0))")} AS jaccard_bp
       |FROM pairs p
       |LEFT JOIN inter i ON p.vec_a = i.vec_a AND p.vec_b = i.vec_b
       |JOIN sizes na ON p.vec_a = na.doc_id
       |JOIN sizes nb ON p.vec_b = nb.doc_id""".stripMargin
  }

  // lazy: referencing Similarity at Dedup's own <clinit> would close an
  // initialization cycle (Similarity.Planes reads Dedup.Dim during ITS
  // <clinit>; if that triggers Dedup's, this val must not call back into
  // the half-initialized Similarity). Forced at first oracle render.
  lazy val dedupEmbeddingSql: String = {
    val cos = s"(${sqlDotExpr("a.embedding", "b.embedding")}) / (a.nrm * b.nrm)"
    val masks = (0L +: (0 until Similarity.NumPlanes).map(j => 1L << j))
      .mkString("[", ", ", "]")
    val bucketCols = (0 until Similarity.NumTables)
      .map(t => s"${Similarity.sqlBucketT("embedding", t)} AS bucket$t")
      .mkString(",\n    ")
    val tableSelects = (0 until Similarity.NumTables).map { t =>
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $cos AS cos_raw
         |  FROM e a JOIN (
         |    SELECT vec_id, embedding, nrm, xor(bucket$t, m.m) AS pb
         |    FROM e, unnest($masks) AS m(m)
         |  ) b ON a.bucket$t = b.pb AND a.vec_id < b.vec_id""".stripMargin
    }.mkString("\n  UNION\n  ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding,
       |    sqrt(${sqlDotExpr("embedding", "embedding")}) AS nrm,
       |    $bucketCols
       |  FROM embeddings
       |), cand AS (
       |  $tableSelects
       |)
       |SELECT vec_a, vec_b, CAST(CAST(round(cos_raw, 4) AS DECIMAL(14,4)) AS DOUBLE) AS cos
       |FROM cand
       |WHERE cos_raw >= $CosineThreshold""".stripMargin
  }

  // ---- #17c blocked edit-distance join (short-field fuzzy matching) ------
  /** Near-duplicate detection for SHORT fields (names, titles, product
    * labels) where shingle/minhash machinery is overkill: an edit-distance
    * self-join made tractable by blocking. Candidate generation is an
    * EQUI-join on a cheap block key (first token) with a length-difference
    * prefilter — a length gap > [[FuzzyLevMax]] already proves the distance
    * exceeds the bound, so Levenshtein (O(len²) per pair) runs only on
    * survivors. One shuffle on the block key; pair volume is quadratic per
    * block, which is the knob: at 100 TB you sharpen the key (first token →
    * first token + length bucket) exactly like the LSH band/bucket-cap
    * guards upstream, never widen to all-pairs. Output is the per-(block,
    * distance) pair census — the downstream merge step consumes pairs; the
    * census is the auditable summary both engines can agree on exactly
    * (integer distances, integer counts). */
  val FuzzyLevMax = 2

  /** Dedup-first: the edit-distance join runs over DISTINCT names with a
    * multiplicity weight, never over rows — the same vocabulary trick as
    * the anagram reduce and BPE training. Row-level pair counts come back
    * exactly: equal-name pairs are m·(m−1)/2 per name (no join at all),
    * cross-name pairs are m_a·m_b per surviving distinct-name pair. The
    * first cut of this operator joined raw rows and spent 38 s at sf0.1 on
    * ~20M Levenshtein calls for the SAME 64×64 distinct-name grid — the
    * benchmark-measured reason this shape is mandatory. */
  def fuzzyNamePairs(spark: SparkSession, dir: String): DataFrame = {
    val names = spark.read.parquet(s"$dir/part.parquet")
      .groupBy(col("p_name").as("nm"))
      .agg(count(lit(1)).as("m"))
      .select(col("nm"), col("m"),
        split(col("nm"), " ").getItem(0).as("blk"))
    val sameName = names.where(col("m") >= 2)
      .groupBy(col("blk"), lit(0L).as("d"))
      .agg(sum(org.apache.spark.sql.graft.ExactMath.intDiv(
        col("m") * (col("m") - 1), lit(2L))).cast("long").as("n_pairs"))
    val a = names.select(col("nm").as("nm_a"), col("m").as("m_a"), col("blk"))
    val b = names.select(col("nm").as("nm_b"), col("m").as("m_b"),
      col("blk").as("blk_b"))
    val crossName = a.join(b, col("blk") === col("blk_b")
        && col("nm_a") < col("nm_b")
        && abs(length(col("nm_a")) - length(col("nm_b"))) <= FuzzyLevMax)
      .select(col("blk"), (col("m_a") * col("m_b")).as("w"),
        levenshtein(col("nm_a"), col("nm_b")).cast("long").as("d"))
      .where(col("d") <= FuzzyLevMax)
      .groupBy(col("blk"), col("d"))
      .agg(sum(col("w")).cast("long").as("n_pairs"))
    sameName.unionByName(crossName)
      .groupBy(col("blk"), col("d"))
      .agg(sum(col("n_pairs")).cast("long").as("n_pairs"))
  }
  val fuzzyNamePairsSql: String =
    s"""WITH p AS (
       |  SELECT p_partkey AS pk, p_name AS nm,
       |    string_split(p_name, ' ')[1] AS blk
       |  FROM part
       |), pr AS (
       |  SELECT a.blk, CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS d
       |  FROM p a JOIN p b ON a.blk = b.blk AND a.pk < b.pk
       |  WHERE abs(length(a.nm) - length(b.nm)) <= $FuzzyLevMax
       |)
       |SELECT blk, d, count(*) AS n_pairs
       |FROM pr WHERE d <= $FuzzyLevMax GROUP BY 1, 2""".stripMargin
}
