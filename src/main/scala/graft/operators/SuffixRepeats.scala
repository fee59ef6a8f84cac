package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** EXACTSUBSTR repeat structure at UNBOUNDED threshold — the suffix-array
  * machinery `dup_span_exact` deliberately fixes to one window size,
  * generalized: distributed prefix-doubling suffix RANKING over the whole
  * corpus laid end-to-end in one address space, yielding
  *
  *  - `suffix_repeats`: the repeat SPECTRUM — for every power-of-two block
  *    length (1, 2, 4, … up to [[MaxBlock]]), how many distinct substrings
  *    of that length repeat, how many positions they cover, the largest
  *    clone family, and how many repeat ACROSS documents. One row per
  *    level: the dashboard that says "this corpus has 40 MB of 4 KB-scale
  *    boilerplate" — information no fixed-K window statistic can give.
  *  - `longest_repeat`: the exact length of the longest repeated substring
  *    (binary-search refinement between doubling levels), its occurrence
  *    count and a witness excerpt.
  *
  * Algorithm (Manber–Myers prefix doubling, the standard distributed
  * suffix-array construction): rank₀ = dense rank of the character;
  * rank_{2k}(i) = dense rank of (rank_k(i), rank_k(i+k)). Every step is a
  * corpus-sized equi-join (the k-shift) plus [[Scale.denseRankByRange]] —
  * the range-partitioned, O(partitions)-driver-state dense rank, NOT an
  * unpartitioned window. Documents are laid out by
  * [[Scale.exclusivePrefixSums]] of their lengths; no separator characters
  * are needed because rank equality is exact substring equality, and every
  * REPORTED group filters to positions whose whole block lies inside its
  * document (`pos + block ≤ doc_len`), so windows spanning document
  * boundaries can never join a reported family.
  *
  * Scale: construction is O(n log L_max) shuffle bytes (the published
  * cost of distributed suffix sorting) run ONCE per corpus snapshot and
  * materialized, exactly like the LSH signature table — at 100 TB this is
  * the scheduled EXACTSUBSTR indexing job, and the spectrum/longest reads
  * are bounded aggregations over the cached level tables. Per-round
  * lineage is truncated with localCheckpoint (the components discipline).
  * [[MaxBlock]] caps the doubling at 4096-char blocks — not a semantic
  * threshold like SpanK (reported repeats are exact at EVERY length up to
  * the cap, and `longest_repeat` is exact whenever the true maximum is
  * under 2·MaxBlock−1, i.e. 8 KB — far beyond any fixed-window span
  * statistic); corpora with longer clones report the capped bound.
  *
  * Rows-only BY DESIGN (like `bpe_merges`): an iterative data-dependent
  * fixpoint with driver-side round control has no single-SQL oracle; the
  * spec brute-forces the spectrum and the longest repeat on fixtures. */
object SuffixRepeats {

  private def docs(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/documents.parquet")

  val MaxBlock = 4096L // doubling cap: levels 1,2,…,4096

  // level tables are localCheckpoint'd (block-manager-backed) rather than
  // persisted frames, so this cache registers a clear hook instead of
  // joining the DataFrame registry
  private val levelsCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), Seq[(Long, DataFrame)]]
  Materialized.registerClearable(() => levelsCache.clear())
  private val spectrumCache = Materialized.register(
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])
  private val longestCache = Materialized.register(
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])

  /** (gpos, doc_id, pos, doc_len, ch) — the corpus at char resolution in
    * one global address space (same inherent cost as `dup_span_stats`). */
  private def charFrame(spark: SparkSession, dir: String): DataFrame = {
    val lens = docs(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("doc_len"))
      .where(col("doc_len") > 0)
    val offsets = Scale.exclusivePrefixSums(lens, "doc_id", "doc_len", "doc_off")
    docs(spark, dir)
      .join(offsets, "doc_id")
      .select(col("doc_id"), col("doc_len"), col("doc_off"),
        posexplode(split(col("text"), "")).as(Seq("pos", "ch")))
      .select((col("doc_off") + col("pos")).as("gpos"), col("doc_id"),
        col("pos").cast("long").as("pos"), col("doc_len"), col("ch"))
  }

  /** Doubling levels [(blockLen, (gpos, doc_id, pos, doc_len, rank))],
    * materialized per (session, corpus). Construction stops when a level
    * has no within-document duplicate block (longer repeats are then
    * impossible), or at [[MaxBlock]]. */
  private[operators] def levels(spark: SparkSession, dir: String): Seq[(Long, DataFrame)] =
    levelsCache.getOrElseUpdate(Materialized.sessionKey(spark, dir), {
      val chars = charFrame(spark, dir)
      var t = Scale.denseRankByRange(chars, Seq("ch"), "rank")
        .select("gpos", "doc_id", "pos", "doc_len", "rank")
        .localCheckpoint(true)
      val out = scala.collection.mutable.ListBuffer.empty[(Long, DataFrame)]
      var block = 1L
      out += ((block, t))
      var go = hasValidDup(t, block)
      while (go && block < MaxBlock) {
        val shifted = t.select((col("gpos") - block).as("gpos"),
          col("rank").as("rank2"))
        val paired = t.join(shifted, Seq("gpos"), "left")
          .select(col("gpos"), col("doc_id"), col("pos"), col("doc_len"),
            col("rank"), coalesce(col("rank2"), lit(-1L)).as("rank2"))
        block = block * 2
        t = Scale.denseRankByRange(paired, Seq("rank", "rank2"), "r")
          .select(col("gpos"), col("doc_id"), col("pos"), col("doc_len"),
            col("r").as("rank"))
          .localCheckpoint(true)
        out += ((block, t))
        go = hasValidDup(t, block)
      }
      out.toSeq
    })

  /** Does any length-`block` substring repeat WITHIN document bounds? */
  private def hasValidDup(t: DataFrame, block: Long): Boolean =
    !t.where(col("pos") + block <= col("doc_len"))
      .groupBy(col("rank")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).limit(1).isEmpty

  /** The repeat spectrum: one row per doubling level. All-BIGINT. */
  def suffixRepeats(spark: SparkSession, dir: String): DataFrame =
    Materialized.cached(spectrumCache, spark, dir) {
      import spark.implicits._
      val rows = levels(spark, dir).map { case (block, t) =>
        val r = t.where(col("pos") + block <= col("doc_len"))
          .groupBy(col("rank"))
          .agg(count(lit(1)).as("sz"), countDistinct(col("doc_id")).as("nd"))
          .where(col("sz") >= 2)
          .agg(count(lit(1)).as("n_groups"),
            coalesce(sum(col("sz")), lit(0L)).as("n_positions"),
            coalesce(max(col("sz")), lit(0L)).as("max_group"),
            coalesce(sum(when(col("nd") >= 2, 1L).otherwise(0L)), lit(0L))
              .as("n_groups_xdoc"))
          .collect()(0)
        (block, r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
      rows.toDF("block_len", "n_groups", "n_positions", "max_group",
          "n_groups_xdoc")
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** Exact longest repeated substring: binary-search refinement with the
    * two-overlapping-blocks equality test — s[i,i+L) = s[j,j+L) iff the
    * level-k blocks at i,j AND at i+L−2ᵏ,j+L−2ᵏ agree (2ᵏ ≤ L < 2ᵏ⁺¹). */
  def longestRepeat(spark: SparkSession, dir: String): DataFrame =
    Materialized.cached(longestCache, spark, dir) {
      import spark.implicits._
      val lvls = levels(spark, dir)
      // largest level with a valid duplicate (construction ran one level
      // past it unless capped, so the bound below is exact up to the cap)
      val dupLevels = lvls.filter { case (b, t) => hasValidDup(t, b) }
      if (dupLevels.isEmpty) {
        Seq((0L, 0L, 0L, "")).toDF("max_len", "n_occurrences", "n_groups", "sample")
      } else {
        val (bk, tk) = dupLevels.last
        def dupAt(len: Long): Boolean = !keysAt(tk, bk, len)
          .groupBy("r1", "r2").agg(count(lit(1)).as("c"))
          .where(col("c") >= 2).limit(1).isEmpty
        val maxDocLen = tk.agg(max(col("doc_len"))).collect()(0).getLong(0)
        var lo = bk // known dup
        var hi = math.min(2 * bk - 1, maxDocLen) // exact bound (see scaladoc)
        while (lo < hi) {
          val mid = (lo + hi + 1) / 2
          if (dupAt(mid)) lo = mid else hi = mid - 1
        }
        val keys = keysAt(tk, bk, lo)
        val dupKeys = keys.groupBy("r1", "r2").agg(count(lit(1)).as("c"))
          .where(col("c") >= 2)
        val members = keys.join(dupKeys.hint("shuffle_hash"), Seq("r1", "r2"))
        val stats = members
          .agg(count(lit(1)).as("n_occ"), min(col("gpos")).as("wit"))
          .collect()(0)
        val nGroups = dupKeys.count()
        val wit = members.where(col("gpos") === stats.getLong(1))
          .select("doc_id", "pos").collect()(0)
        val sample = docs(spark, dir)
          .where(col("doc_id") === wit.getLong(0))
          .select(substring(col("text"), wit.getLong(1).toInt + 1, lo.toInt)
            .as("s")).collect()(0).getString(0)
        Seq((lo, stats.getLong(0), nGroups, sample))
          .toDF("max_len", "n_occurrences", "n_groups", "sample")
      }
    }

  /** Block length for [[repeatCoverage]] — the ExactSubstr-style scale at
    * which repeated content is considered "duplicated text" for the
    * per-document drop criterion. */
  val CoverageBlock = 64L

  /** Per-document EXACTSUBSTR coverage — the production drop criterion
    * from the dedup literature at doc granularity: how many of a doc's
    * characters sit inside a ≥[[CoverageBlock]]-char block that occurs
    * elsewhere in the corpus (covered chars are the union of that doc's
    * repeated 64-char windows). Reads the CACHED level-64 rank table;
    * interval union is per-doc window arithmetic (fixed-length sorted
    * intervals ⇒ contribution = min(B, pos − prev pos)), so the only new
    * work is one bounded count on the dup ranks and one doc-keyed rollup.
    * Exact basis points (§6); docs shorter than the block report 0. */
  def repeatCoverage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = CoverageBlock
    val allDocs = docs(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    val covered = levels(spark, dir).find(_._1 == B) match {
      // the dup chain died before level B ⇒ no B-char repeat exists
      case None => spark.emptyDataFrame
        .withColumn("doc_id", lit(0L)).withColumn("covered", lit(0L))
        .select("doc_id", "covered").limit(0)
      case Some((_, f)) =>
        val valid = f.where(col("pos") + B <= col("doc_len"))
          .select(col("doc_id"), col("pos"), col("rank"))
        val dupRanks = valid.groupBy(col("rank"))
          .agg(count(lit(1)).as("c")).where(col("c") >= 2).select("rank")
        val w = Window.partitionBy("doc_id").orderBy("pos")
        valid.join(dupRanks.hint("shuffle_hash"), Seq("rank"))
          .withColumn("contrib", least(lit(B),
            col("pos") - coalesce(lag(col("pos"), 1).over(w), lit(-B))))
          .groupBy(col("doc_id"))
          .agg(sum(col("contrib")).cast("long").as("covered"))
    }
    allDocs.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("covered"), lit(0L)).as("covered_chars"),
        graft.functions.TextFns.bp(coalesce(col("covered"), lit(0L)),
          greatest(col("n_chars"), lit(1L))).as("covered_bp"))
  }
  val repeatCoverageSql: String = {
    val B = CoverageBlock
    s"""WITH win AS MATERIALIZED (
       |  SELECT d.doc_id, CAST(g.p AS BIGINT) AS pos,
       |    md5(substr(d.text, CAST(g.p AS INTEGER), $B)) AS w
       |  FROM documents d, unnest(range(1, length(d.text) - $B + 2)) AS g(p)
       |  WHERE length(d.text) >= $B
       |), fam AS (
       |  SELECT w FROM win GROUP BY w HAVING count(*) >= 2
       |), cov AS (
       |  SELECT doc_id,
       |    least($B, pos - coalesce(lag(pos)
       |      OVER (PARTITION BY doc_id ORDER BY pos), pos - $B)) AS c
       |  FROM win JOIN fam USING (w)
       |), agg AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS covered
       |  FROM cov GROUP BY 1
       |)
       |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
       |  coalesce(a.covered, 0) AS covered_chars,
       |  ${graft.functions.TextFns.sqlBp("coalesce(a.covered, 0)",
             "greatest(length(d.text), 1)")} AS covered_bp
       |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin
  }

  /** DuckDB oracle for the SPECTRUM: though the Spark side derives it from
    * the iterative doubling ranks, the OUTPUT is independently computable
    * by brute force — explode every in-document window at each power-of-two
    * length and census the repeated families. The level-cutoff rule mirrors
    * construction: level 1 always; level 2L present iff level L had any
    * repeated family (valid-dup monotonicity makes the lag test
    * transitive); capped at [[MaxBlock]]. The ORACLE cost is O(n·log L)
    * window strings — fine at gate SF; the distributed side exists because
    * this brute force is the thing that does NOT scale. */
  val suffixRepeatsSql: String = {
    val powers = Iterator.iterate(1L)(_ * 2).takeWhile(_ <= MaxBlock)
      .map(l => s"($l)").mkString(", ")
    s"""WITH lv AS (SELECT CAST(p AS BIGINT) AS L FROM (VALUES $powers) t(p)),
       |win AS MATERIALIZED (
       |  -- family key = md5 of the window, not the raw up-to-4 KB string:
       |  -- 10x smaller grouping state (the whole gate stays no-spill),
       |  -- exact to 128-bit-collision certainty (the repo-wide md5 key
       |  -- precedent)
       |  SELECT l.L,
       |    md5(substr(d.text, CAST(g.p AS INTEGER), CAST(l.L AS INTEGER))) AS w,
       |    d.doc_id
       |  FROM documents d
       |  JOIN lv l ON length(d.text) >= l.L
       |  , unnest(range(1, length(d.text) - l.L + 2)) AS g(p)
       |), fam AS MATERIALIZED (
       |  SELECT L, w, count(*) AS sz, count(DISTINCT doc_id) AS nd
       |  FROM win GROUP BY 1, 2
       |), per_level AS (
       |  SELECT lv.L AS block_len,
       |    coalesce(count(*) FILTER (WHERE f.sz >= 2), 0) AS n_groups,
       |    coalesce(CAST(sum(f.sz) FILTER (WHERE f.sz >= 2) AS BIGINT), 0)
       |      AS n_positions,
       |    coalesce(CAST(max(f.sz) FILTER (WHERE f.sz >= 2) AS BIGINT), 0)
       |      AS max_group,
       |    coalesce(count(*) FILTER (WHERE f.sz >= 2 AND f.nd >= 2), 0)
       |      AS n_groups_xdoc
       |  FROM lv LEFT JOIN fam f ON f.L = lv.L
       |  GROUP BY 1
       |), cut AS (
       |  SELECT *, lag(n_groups) OVER (ORDER BY block_len) AS prev_groups
       |  FROM per_level
       |)
       |SELECT block_len, n_groups, n_positions, max_group, n_groups_xdoc
       |FROM cut WHERE block_len = 1 OR prev_groups > 0""".stripMargin
  }

  /** (gpos, doc_id, pos, r1, r2) for the two-block length-`len` equality
    * key at each position whose window fits its document. */
  private def keysAt(tk: DataFrame, block: Long, len: Long): DataFrame = {
    val d = len - block
    val base = tk.select(col("gpos"), col("doc_id"), col("pos"),
      col("doc_len"), col("rank").as("r1"))
    val withR2 =
      if (d == 0) base.withColumn("r2", lit(0L))
      else base.join(
        tk.select((col("gpos") - d).as("gpos"), col("rank").as("r2")),
        Seq("gpos"))
    withR2.where(col("pos") + len <= col("doc_len"))
      .select("gpos", "doc_id", "pos", "r1", "r2")
  }
}
