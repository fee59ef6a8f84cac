package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC ingestion — the container format web-scale training corpora
  * actually arrive in (Common Crawl publishes WARC/1.x; the format is the
  * public ISO 28500 spec). A WARC file is a concatenation of records:
  *
  * {{{
  *   WARC/1.0\r\n
  *   <header lines: Name: value>\r\n
  *   \r\n
  *   <exactly Content-Length bytes of block>\r\n\r\n
  * }}}
  *
  * Records MUST be framed by Content-Length — a payload can legally contain
  * the literal bytes "WARC/1.0", so marker-splitting (a declarative
  * split()) silently corrupts records; this is the genuine per-file
  * imperative-parse case, run as a flatMap over the binaryFile source.
  *
  * Scale: the file index fans out exactly like [[GutenbergSource]] (one
  * task per file group). Parsing is STREAMING — records are yielded from
  * an iterator over a (gzip) InputStream, so a ~1 GB `.warc.gz` that
  * decompresses to several GB never materializes as one array and the
  * task's memory high-water mark is one record, not one file (the
  * compressed bytes themselves are held by the binaryFile column, whose
  * 2 GB array cap matches Common Crawl's ~1 GB file sizing). `.warc.gz`
  * members are read through the multi-member-aware JDK GZIPInputStream —
  * whole compressed files stay single-task, the same non-splittable-gzip
  * rule every WARC consumer lives with.
  */
object WarcSource {

  /** Streaming record iterator: (recIx, url, date, warcType, block).
    * Content-Length-framed; a truncated tail record ends the walk rather
    * than throwing (matching how WARC readers treat mid-record EOF). */
  private[graft] def parseWarc(raw: Array[Byte]): Iterator[(Long, String, String, String, Array[Byte])] =
    parseWarcStream(new java.io.ByteArrayInputStream(raw))

  /** [[parseWarc]] over an arbitrary InputStream — the form the V2
    * connector feeds directly from the filesystem, so a file NEVER
    * materializes as one array (no 2 GB cap; memory high-water mark is one
    * record). Gzip is sniffed from the stream's magic bytes (multi-member
    * aware). With `wantBlock=false` (column pruning pushed the payload out
    * of the read schema) block bytes are consumed for framing but never
    * buffered — header-only scans move Content-Length bytes through a
    * scratch page and allocate nothing per record. With `keepType` set
    * (a pushed `warc_type = v` filter), non-matching records are skipped
    * the same zero-buffer way — but STILL counted by `rec_ix`, so record
    * indices (and the doc_ids derived from them) are identical whether or
    * not a filter was pushed. */
  def parseWarcStream(
      rawIn: java.io.InputStream,
      wantBlock: Boolean = true,
      keepType: String = null): Iterator[(Long, String, String, String, Array[Byte])] = {
    val base = new java.io.BufferedInputStream(rawIn)
    base.mark(2)
    val m1 = base.read(); val m2 = base.read()
    base.reset()
    // gzip output gets its own buffer (inflater reads are chunky); the
    // plain path reuses `base` rather than double-buffering every byte
    val in =
      if (m1 == 0x1f && m2 == 0x8b)
        new java.io.BufferedInputStream(new java.util.zip.GZIPInputStream(base))
      else base
    // one header line: reads to LF, strips a trailing CR — tolerates both
    // CRLF and bare-LF headers; null at EOF. Bytes decode as UTF-8 (WARC/1.1
    // permits UTF-8 header values — IDN WARC-Target-URIs appear in real
    // crawls; ADVICE r5) falling back to ISO-8859-1 for the stray raw-byte
    // header a strict decode would reject.
    def readLine(): String = {
      var c = in.read()
      if (c == -1) return null
      val buf = new java.io.ByteArrayOutputStream(80)
      // Cap the accumulated line: header lines are tiny, but the resync
      // path scans PAYLOAD bytes of a bad record, and a long LF-free run
      // (base64 blobs, minified JS) must not buffer as one giant line —
      // bytes past the cap are consumed but dropped, which preserves the
      // line walk (and a truncated line can never match "WARC/" framing
      // checks anyway). Keeps the documented one-record memory bound.
      val MaxLine = 64 * 1024
      while (c != -1 && c != '\n') {
        if (buf.size < MaxLine) buf.write(c)
        c = in.read()
      }
      var bytes = buf.toByteArray
      if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
        bytes = java.util.Arrays.copyOf(bytes, bytes.length - 1)
      try {
        java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
          .decode(java.nio.ByteBuffer.wrap(bytes)).toString
      } catch {
        case _: java.nio.charset.CharacterCodingException =>
          new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      }
    }
    val scratch =
      if (wantBlock && keepType == null) null else new Array[Byte](64 * 1024)
    new Iterator[(Long, String, String, String, Array[Byte])] {
      private var nextRec: (Long, String, String, String, Array[Byte]) = _
      private var ix = 0L
      private def advance(): Unit = {
        nextRec = null
        var line = readLine()
        // Outer loop = resync (ADVICE r5): a record with a missing or
        // unparseable Content-Length can't be skipped by framing, but it
        // must not silently drop every record AFTER it in the file — scan
        // forward to the next "WARC/" version line and continue. (The scan
        // can false-trigger on a payload line starting with "WARC/"; that
        // risks re-parsing garbage headers, which just resyncs again —
        // strictly better than truncating the file.) Only genuine EOF or a
        // short block (truncated tail) ends the walk.
        while (true) {
          // seek the next version line (skips inter-record blank lines)
          while (line != null && !line.startsWith("WARC/")) line = readLine()
          if (line == null) return
          var url = ""; var date = ""; var wtype = ""; var clen = -1L
          var l = readLine()
          while (l != null && l.nonEmpty && !l.startsWith("WARC/")) {
            val i = l.indexOf(':')
            if (i > 0) {
              val k = l.substring(0, i).trim.toLowerCase
              val v = l.substring(i + 1).trim
              k match {
                case "warc-target-uri" => url = v
                case "warc-date" => date = v
                case "warc-type" => wtype = v
                case "content-length" =>
                  clen = try v.toLong catch { case _: NumberFormatException => -1L }
                case _ =>
              }
            }
            l = readLine()
          }
          if (l == null) return // EOF mid-headers
          if (l.startsWith("WARC/") || clen < 0 || clen > Int.MaxValue - 8) {
            line = l // bad framing: resync from here (l may itself be a version line)
          } else {
            val keep = keepType == null || wtype == keepType
            if (keep && wantBlock) {
              val block = in.readNBytes(clen.toInt)
              if (block.length < clen) return // truncated tail
              nextRec = (ix, url, date, wtype, block)
              ix += 1
              return
            }
            // pruned payload or filtered-out record: move the bytes for
            // framing through the scratch page, keep none
            var left = clen
            while (left > 0) {
              val n = in.read(scratch, 0, math.min(left, scratch.length).toInt)
              if (n < 0) return // truncated tail
              left -= n
            }
            ix += 1 // skipped records still advance rec_ix (stable doc_ids)
            if (keep) {
              nextRec = (ix - 1, url, date, wtype, Array.emptyByteArray)
              return
            }
            line = readLine() // filtered out: walk on to the next record
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): (Long, String, String, String, Array[Byte]) = {
        val r = nextRec; advance(); r
      }
    }
  }

  /** (path, content) binary frame → one row per WARC record. Shared by the
    * batch and streaming readers so both paths run the identical parse. */
  private def parsedRecords(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, c) =>
        parseWarc(c).map { case (ix, u, d, t, b) => (p, ix, u, d, t, b) }
      }
      .toDF("path", "rec_ix", "url", "warc_date", "warc_type", "block")
  }

  /** One row per WARC record:
    * (path, rec_ix, url, warc_date, warc_type, block). Batch reads go
    * through the V2 connector (`org.apache.spark.sql.graft.WarcDataSource`,
    * registered as format "warc"): file-streaming parse (no 2 GB
    * whole-file array, one-record memory bound) and payload-skipping
    * column pruning — `.explain` shows `block` leave the read schema when
    * a query only touches headers. [[readWarcBinaryFile]] keeps the
    * composed path alive as the conformance twin. */
  def readWarc(spark: SparkSession, path: String): DataFrame =
    spark.read.format("warc").load(path)

  /** The original binaryFile+flatMap composition (ladder tier (a)) —
    * retained as the independent implementation the V2 connector is
    * spec-checked against, and the shape the streaming reader still uses. */
  def readWarcBinaryFile(spark: SparkSession, path: String): DataFrame =
    parsedRecords(spark.read.format("binaryFile").load(path))

  /** Streaming twin of [[readWarc]]: a landing directory of `.warc[.gz]`
    * files as a continuous ingestion feed — exactly how crawl archives
    * arrive in production (a fetcher drops finished WARCs; the stream
    * picks each up once, tracked by checkpointed offsets). Rides the V2
    * connector's `MicroBatchStream`, so the streaming path has the same
    * record-streaming reader as batch — no whole-file byte array here
    * either. [[readWarcStreamBinaryFile]] keeps the composed streaming
    * path as the conformance twin. */
  def readWarcStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.format("warc").load(dir)

  /** The original binaryFile-source streaming composition — retained as
    * the independent implementation the V2 micro-batch stream is
    * spec-checked against (each file buffers as one array here; the V2
    * path streams records from the file handle). */
  def readWarcStreamBinaryFile(spark: SparkSession, dir: String): DataFrame =
    parsedRecords(spark.readStream.format("binaryFile")
      // binaryFile's schema is FIXED by the format, but the streaming
      // DataSource path still demands it be declared (no inference pass
      // over a possibly-empty landing directory)
      .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
      .load(dir))

  /** Response records → a `documents`-shaped frame: the HTTP header block
    * is dropped (terminated by CRLFCRLF or bare LFLF — crawls store server
    * bytes verbatim, and LF-only servers exist), the body wrapped as a
    * string WITHOUT charset validation (a cast, not decode(): Spark 4's
    * decode raises MALFORMED_CHARACTER_CODING on the first malformed byte,
    * which would kill a whole job on one latin-1 page; malformed sequences
    * instead flow to the downstream quality/charset gates built for
    * exactly that). doc_id = the shared 60-bit md5 of (file, record index,
    * url) — re-crawls of the same URL are routine in real WARCs and must
    * not collide. */
  def documentsFromWarc(spark: SparkSession, path: String): DataFrame =
    toDocuments(readWarc(spark, path))

  /** Parsed documents frame of a COMMITTED FIXTURE dir, materialized once
    * per (session, dir) — r14: the fixture-backed queries re-ran the WARC
    * record split + header parse per REFERENCE (crawl_frontier alone holds
    * three references to the sitemap fixture in one plan; the links
    * fixture feeds five declared queries). The fixtures are KB-bounded by
    * construction, so the cache is bounded; at crawl scale the equivalent
    * artifact is the parsed-documents parquet an ingest job writes once
    * (documentsFromWarc stays uncached for arbitrary dirs). */
  private val fixtureDocsCache = graft.operators.Materialized.register(
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])
  private[graft] def fixtureDocs(spark: SparkSession, path: String): DataFrame =
    graft.operators.Materialized.cached(fixtureDocsCache, spark, path)(
      documentsFromWarc(spark, path)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Streaming twin of [[documentsFromWarc]] — the identical projection
    * over [[readWarcStream]], so stream output is replay-equal to batch by
    * construction (asserted in WarcSourceSpec). Compose with the
    * [[graft.streaming.DocsStream]] gates for a continuous curation feed. */
  def documentsFromWarcStream(spark: SparkSession, dir: String): DataFrame =
    toDocuments(readWarcStream(spark, dir))

  private def toDocuments(recs: DataFrame): DataFrame =
    recs
      .where(col("warc_type") === "response")
      .select(
        graft.functions.TextFns.md5Long(concat_ws("\u0001",
          col("path"), col("rec_ix"), col("url"))).as("doc_id"),
        col("url"),
        col("warc_date"),
        regexp_replace(col("block").cast("string"),
          "(?s)^.*?(\r?\n){2}", "").as("text"))

  /** Continuous crawl→curation feed: [[documentsFromWarcStream]] through
    * the [[urlFilter]] blocklist gate (the first stage of every production
    * crawl pipeline — blocked hosts never cost a quality score or a dedup
    * probe) into [[graft.streaming.DocsStream.ingestPipeline]] (quality
    * gate → watermarked content dedup), with the WARC capture timestamp as
    * event time. This is the full production shape end-to-end: a fetcher
    * drops `.warc.gz` files in a landing directory, and curated novel
    * documents stream out the other side — no batch reprocessing of the
    * whole corpus per increment. */
  def warcIngestStream(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.DocsStream.ingestPipeline(
      urlFilter(documentsFromWarcStream(spark, dir))
        .withColumn("ingest_ts", to_timestamp(col("warc_date"))))

  /** Archival WRITE path — the sink half of the V2 connector
    * (`org.apache.spark.sql.graft.WarcWriteBuilder`): a records frame
    * (any schema carrying `warc_type`, `block`, optionally `url` /
    * `warc_date`) appended to a directory of immutable spec-framed
    * `part-*.warc[.gz]` members. Hidden-temp-then-job-commit-rename, so
    * concurrent readers (batch scans or the landing-dir stream) only ever
    * see whole files — writing INTO a watched landing directory is safe.
    * Round-trip (write → [[readWarc]]) is byte-identical, spec-asserted. */
  def writeWarc(records: DataFrame, dir: String, gzip: Boolean = false): Unit =
    records.write.format("warc")
      .option("compression", if (gzip) "gzip" else "none")
      .mode("append").save(dir)

  /** Streaming twin of [[writeWarc]] — the continuous archive side of the
    * connector (curated/filtered records stream → immutable `.warc[.gz]`
    * members). Each micro-batch epoch publishes its members at epoch
    * commit with (epoch, partition) names, so a replayed epoch rewrites
    * the same files byte-identically instead of duplicating records
    * (effectively exactly-once; see WarcWriteBuilder). */
  def writeWarcStream(
      records: DataFrame, dir: String, checkpoint: String,
      gzip: Boolean = false): org.apache.spark.sql.streaming.StreamingQuery =
    records.writeStream.format("warc")
      .option("compression", if (gzip) "gzip" else "none")
      .option("checkpointLocation", checkpoint)
      .start(dir)

  /** Canonical host of a url column — THE definition of "host" for every
    * per-host operation (rollup, sampling caps, blocklists), shared so a
    * future normalization tweak (www-stripping, IDN mapping) cannot make
    * curation and reporting disagree about what a host is. */
  def hostCol(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(coalesce(parse_url(url, lit("HOST")), lit("")))

  /** Canonical URL for crawl-level dedup — the normalization CC-style
    * pipelines apply before treating two fetches as the same page: lowercase
    * scheme+host, `www.` stripped, default scheme dropped, query string and
    * fragment removed (tracking params make raw URLs unique per click),
    * trailing slash trimmed. Row-local (codegen'd regex chain) — composes
    * with [[hostCol]] for host-level ops. */
  def canonicalUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noScheme = regexp_replace(lower(url), "^https?://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    val noQuery = regexp_replace(noWww, "[?#].*$", "")
    regexp_replace(noQuery, "/$", "")
  }

  // ---- URL/domain blocklist gate (C4/RefinedWeb badlist filter) ---------
  /** The committed blocklist backing the `url_filter` driver row: one
    * registered-domain entry (blocks the domain and every subdomain) and
    * one exact-host-shaped entry (suffix semantics still apply — its
    * subdomains block too, which is what badlists intend). Production
    * lists (C4's badwords-domains, RefinedWeb's blocklists) are the same
    * shape, just longer. */
  val UrlBlocklist: Seq[String] = Seq("tracker.example", "spam.good.example")

  /** The dot-boundary suffix chain of a host: `a.b.example.com` →
    * `[a.b.example.com, b.example.com, example.com]` (every suffix with
    * ≥2 labels; a single-label host degenerates to `[host]`). Matching an
    * entry against this chain is exact-host AND registered-domain-suffix
    * matching in one membership test, with the dot boundary built in —
    * `nottracker.example` can never match entry `tracker.example` (the
    * classic endsWith bug). Row-local array math inside codegen. */
  def hostSuffixes(host: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    when(n >= 2,
      transform(sequence(lit(0), n - 2),
        i => array_join(slice(labels, i + 1, n), ".")))
      .otherwise(array(host))
  }

  /** The MOST SPECIFIC blocklist entry matching the url's host, or '' when
    * clean (the suffix chain lists the host itself first). The list rides
    * as a literal array — row-local, zero exchange, the right shape for
    * lists up to a few thousand entries; a PSL-scale list (C4's ~400k
    * domains) swaps the literal for `explode(hostSuffixes)` + a broadcast
    * equi-join on the suffix + a doc-keyed anti join, same semantics. */
  def urlBlockRule(url: org.apache.spark.sql.Column,
      blocklist: Seq[String]): org.apache.spark.sql.Column = {
    val entries = array(blocklist.map(lit): _*)
    coalesce(
      get(filter(hostSuffixes(hostCol(url)), s => array_contains(entries, s)),
        lit(0)),
      lit(""))
  }

  /** First-stage crawl gate: drop every document whose URL host matches the
    * blocklist (exact host or any registered-domain suffix). This is the
    * filter production pipelines run BEFORE anything else touches the
    * bytes — map-only, fused into the scan, so blocked hosts never cost a
    * parse or a shuffle downstream. */
  def urlFilter(docs: DataFrame,
      blocklist: Seq[String] = UrlBlocklist): DataFrame =
    docs.where(urlBlockRule(col("url"), blocklist) === "")

  /** [[urlFilter]] for a PSL-SCALE blocklist (C4's ~400k badlist domains —
    * far beyond a codegen literal array): documents explode their
    * dot-boundary suffix chain (≤ host-label-count rows each, typically
    * ≤5) and LEFT SEMI join the blocklist table on the suffix; a doc-keyed
    * LEFT ANTI join back keeps the clean documents. Same semantics as the
    * literal-array rule — spec-locked equal verdicts. The blocklist side
    * is left to Spark's size-based join choice (it broadcasts while the
    * ~few-MB list fits and degrades to a shuffle beyond) rather than
    * hand-pinned, since PSL-scale sits near the broadcast threshold.
    * `blocklist` contract: one `entry` column of lowercase exact-host or
    * registered-domain strings, the [[UrlBlocklist]] semantics. */
  def urlFilterLarge(docs: DataFrame, blocklist: DataFrame): DataFrame = {
    val hits = docs
      .select(col("doc_id"),
        explode(hostSuffixes(hostCol(col("url")))).as("entry"))
      .join(blocklist.select(col("entry")), Seq("entry"), "left_semi")
      .select("doc_id").distinct()
    docs.join(hits, Seq("doc_id"), "left_anti")
  }

  /** Audit form of [[urlFilter]]: one verdict row per document — host,
    * blocked flag and the matched rule ('' when clean). What a curation
    * run logs so a blocked-host census is reviewable. */
  def urlFilterAudit(docs: DataFrame,
      blocklist: Seq[String] = UrlBlocklist): DataFrame =
    docs
      .select(col("url"), hostCol(col("url")).as("host"),
        urlBlockRule(col("url"), blocklist).as("rule"))
      .select(col("url"), col("host"), (col("rule") =!= "").as("blocked"),
        col("rule"))

  /** URL-level exact dedup over any frame with a `url` column: one row per
    * canonical URL with the kept representative (min url string — a
    * deterministic choice), fetch count and distinct raw spellings. The
    * crawl-side twin of `dedup_exact` (content identity) — the two together
    * are the standard first pass over a raw crawl: same-URL refetches
    * collapse here, mirrored content collapses there. One uniform-key
    * shuffle; canonical-URL cardinality ≈ page count. */
  def urlDedup(docs: DataFrame): DataFrame =
    docs
      .select(canonicalUrl(col("url")).as("canon_url"), col("url"))
      .groupBy("canon_url")
      .agg(min(col("url")).as("keep_url"),
        count(lit(1)).as("n_fetches"),
        countDistinct(col("url")).as("n_raw_urls"))

  /** Per-host rollup of a [[documentsFromWarc]] frame — the host is the
    * unit Common Crawl pipelines sample, cap and block by (domain-level
    * spam/SEO farms dominate raw crawls). One uniform-key groupBy; host
    * cardinality is millions, not billions, so the aggregate is small. */
  def hostStats(docs: DataFrame): DataFrame =
    docs
      .select(hostCol(col("url")).as("host"), col("text"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"))

  /** Registered domain of a host under the SAME dot-boundary suffix-chain
    * definition the blocklist matches on ([[hostSuffixes]]): its last —
    * least specific — entry, i.e. the 2-label suffix (`a.b.example.com` →
    * `example.com`); single-label and empty hosts map to themselves. One
    * shared definition means a domain blocked by `url_filter` and a domain
    * rolled up by [[domainStats]] can never disagree about what "domain"
    * means. (A production deployment swaps this for a Public Suffix List
    * lookup — a broadcast join against the ~9k-rule PSL — without touching
    * the rollup shape.) */
  def registeredDomain(host: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    element_at(hostSuffixes(host), -1)

  /** Per-registered-domain rollup — the grain crawl curation actually
    * caps, blocks and samples by (host stats over-split: one SEO farm
    * spans thousands of subdomain hosts). Per domain: doc count, distinct
    * host count, text mass and mean heuristic quality (exact integer bp —
    * sum//count, both engines integral).
    *
    * Scale: the domain key is row-local array math fused into the scan;
    * ONE uniform-key exchange aggregates (count-distinct hosts rides the
    * same grouping via partial aggregation). Domain cardinality ≈ millions
    * — the result is a small table. */
  def domainStats(docs: DataFrame): DataFrame =
    docs
      .select(hostCol(col("url")).as("host"),
        length(col("text")).cast("long").as("n_chars"),
        graft.operators.TextAnalysis.qualityBpFrom(
          graft.operators.TextAnalysis.profileCol).as("quality_bp"))
      .groupBy(registeredDomain(col("host")).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        sum(col("n_chars")).as("n_chars"),
        org.apache.spark.sql.graft.ExactMath.intDiv(
          sum(col("quality_bp")), count(lit(1))).as("avg_quality_bp"))

  /** Driver-contract query: [[domainStats]] over the committed blocklist
    * fixture (its hosts span deep subdomains, a lookalike, a single-label
    * host and a no-URL record — the registered-domain edge cases).
    * Ignores `dir` like [[warcHostStats]]. */
  def domainStatsQ(spark: SparkSession, dir: String): DataFrame =
    domainStats(fixtureDocs(spark, FixtureBlockDir))

  /** Oracle: exact VALUES literal, hand-derived from the block fixture's
    * URLs and body strings (scripts/make_warc_fixture.py) under the
    * documented rules — independently of hostSuffixes/registeredDomain and
    * of the Scala quality expression. Quality per doc is
    * least(n,50)·(n−nStop)·10000 // (max(n,1)·50) with nStop counted
    * against the shared 151-entry stopword list; stopword-free 1-token
    * bodies score 200 and 2-token bodies 400 ("no url" carries the one
    * stopword hit, "no"):
    *   ''                  : "no url"(200)                              → 200
    *   good.example        : "good page"(400) "spam host"(400) "spam sub"(400) → 400
    *   localhost           : "local"(200)                               → 200
    *   nottracker.example  : "lookalike"(200)                           → 200
    *   tracker.example     : "tracker lp"(400) "pixel"(200) "deep"(200) → 800//3 = 266 */
  val domainStatsSql: String =
    """SELECT domain, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_hosts AS BIGINT) AS n_hosts,
      |  CAST(n_chars AS BIGINT) AS n_chars,
      |  CAST(avg_quality_bp AS BIGINT) AS avg_quality_bp
      |FROM (VALUES
      |  ('', 1, 1, 6, 200),
      |  ('good.example', 3, 3, 26, 400),
      |  ('localhost', 1, 1, 5, 200),
      |  ('nottracker.example', 1, 1, 9, 200),
      |  ('tracker.example', 3, 3, 19, 266))
      |  AS t(domain, n_docs, n_hosts, n_chars, avg_quality_bp)""".stripMargin

  /** Committed fixture corpus backing the driver-contract row (generated
    * once by scripts/make_warc_fixture.py; two files, one gzipped). The
    * files live ON THE MAIN CLASSPATH (src/main/resources/graft/warc) so
    * the query works from any working directory and from an assembled jar;
    * binaryFile needs a filesystem path, so they are materialized once per
    * JVM into a temp dir, byte-for-byte. */
  private[sources] def materializeFixture(sub: String, files: Seq[String]): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$sub-fixture")
    d.toFile.deleteOnExit()
    files.foreach { name =>
      val in = getClass.getResourceAsStream(s"/graft/$sub/$name")
      require(in != null, s"classpath fixture /graft/$sub/$name missing")
      try java.nio.file.Files.copy(in, d.resolve(name))
      finally in.close()
    }
    d.toString
  }
  lazy val FixtureDir: String =
    materializeFixture("warc", Seq("cc-000.warc", "cc-001.warc.gz"))
  /** Chat-conversation JSONL fixture (scripts/make_chat_fixture.py),
    * materialized for graft.operators.Chat — same single-host caveat as
    * every classpath fixture here. */
  def materializeChatFixture(): String =
    materializeFixture("chat", Seq("part-000.jsonl.gz", "part-001.jsonl"))
  /** Mojibake-repair JSONL fixture (scripts/make_mojibake_fixture.py). */
  def materializeMojibakeFixture(): String =
    materializeFixture("mojibake", Seq("part-000.jsonl.gz"))
  /** URL-variant fixture corpus backing `warc_url_dedup` (same generator
    * script; www/scheme-case/query/fragment/trailing-slash variants of the
    * same pages plus one exact refetch). */
  lazy val FixtureUrlsDir: String =
    materializeFixture("warc_urls", Seq("cc-urls-000.warc", "cc-urls-001.warc.gz"))
  /** HTML-page fixture corpus backing `warc_html_extract` (same generator
    * script; genuine pages with head/script/style/comment blocks, both
    * `<br>` spellings, entities, a plain-text record and an empty body). */
  lazy val FixtureHtmlDir: String =
    materializeFixture("warc_html", Seq("cc-html-000.warc", "cc-html-001.warc.gz"))
  /** Blocklist fixture corpus backing `url_filter` (same generator script;
    * blocked domain + subdomains, a dot-boundary lookalike, an exact-host
    * entry with its own subdomain, host-case variants, a single-label host
    * and a no-URL record). */
  lazy val FixtureBlockDir: String =
    materializeFixture("warc_block", Seq("cc-block-000.warc", "cc-block-001.warc.gz"))
  /** Anchor-rich fixture corpus backing `html_links` (same generator
    * script; multi-link page with nested/entity/whitespace anchors, an
    * href-less anchor, uppercase multiline tags, a link-free page and a
    * single-quoted href that must NOT match). */
  lazy val FixtureLinksDir: String =
    materializeFixture("warc_links", Seq("cc-links-000.warc", "cc-links-001.warc.gz"))

  /** Driver-contract query: per-host rollup of the committed WARC fixture.
    * Ignores `dir` — WARC is a raw-file source, not an sfDir parquet table
    * (the same end-to-end pattern as the Gutenberg raw-file path). */
  def warcHostStats(spark: SparkSession, dir: String): DataFrame =
    hostStats(fixtureDocs(spark, FixtureDir))

  /** Oracle: exact VALUES literal. The counts are derived in
    * scripts/make_warc_fixture.py from the fixture's body strings —
    * independently of parseWarc — so this row checks the whole streaming
    * parse + header-strip + host-normalize chain against hand-counted
    * integers (host '' is the record with no WARC-Target-URI; the
    * gamma.example row is a header-only response whose text is empty). */
  val warcHostStatsSql: String =
    """SELECT host, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_chars AS BIGINT) AS n_chars
      |FROM (VALUES
      |  ('', 1, 13),
      |  ('alpha.example', 3, 44),
      |  ('beta.example', 2, 26),
      |  ('gamma.example', 1, 0)) AS t(host, n_docs, n_chars)""".stripMargin

  /** Driver-contract query: canonical-URL crawl dedup ([[urlDedup]]) over
    * the committed URL-variant fixture. Ignores `dir` like
    * [[warcHostStats]] — WARC is a raw-file source, not an sfDir table. */
  def warcUrlDedup(spark: SparkSession, dir: String): DataFrame =
    urlDedup(fixtureDocs(spark, FixtureUrlsDir))

  /** Oracle: exact VALUES literal, hand-derived in
    * scripts/make_warc_fixture.py from the fixture's raw URLs —
    * independently of canonicalUrl — so this row checks the whole parse +
    * normalize + dedup chain: www-strip, scheme case, tracking-query and
    * fragment removal, trailing-slash trim, the min-string keeper, and the
    * exact-refetch case where n_fetches > n_raw_urls. */
  /** HTML→text extraction over a crawl: [[graft.functions.TextFns.htmlToText]]
    * + [[graft.functions.TextFns.htmlTitle]] applied to the raw response
    * bodies — the CCNet/C4/FineWeb first stage, producing the clean text the
    * whole curation battery (quality gates, dedup, chunking) consumes.
    * Row-local regex chain inside whole-stage codegen; at 100 TB it is a
    * map-only projection fused into the WARC scan, no exchange. The
    * extraction needs the PRE-header-strip raw body only for the title
    * (titles live in `<head>`), so it reuses the `documents` frame (body
    * after the HTTP header block) where head/body structure is preserved. */
  def htmlExtract(docs: DataFrame): DataFrame =
    docs.select(
      col("url"),
      graft.functions.TextFns.htmlTitle(col("text")).as("title"),
      graft.functions.TextFns.htmlToText(col("text")).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  /** Driver-contract query: HTML extraction over the committed HTML-page
    * fixture. Ignores `dir` like [[warcHostStats]] — WARC is a raw-file
    * source, not an sfDir table. */
  def warcHtmlExtract(spark: SparkSession, dir: String): DataFrame =
    htmlExtract(fixtureDocs(spark, FixtureHtmlDir))

  /** Oracle: exact VALUES literal, hand-derived in
    * scripts/make_warc_fixture.py from the fixture pages' markup under the
    * documented extraction rules — independently of the Scala regex chain —
    * so this row checks parse + header-strip + head/script/style/comment
    * drop + block-newline + tag-space + entity + whitespace semantics
    * against hand-written strings (incl. the documented "link ." inline-tag
    * space, the script-string fake markup that must NOT surface, and the
    * plain-text pass-through). */
  val warcHtmlExtractSql: String =
    """SELECT url, title, text, CAST(n_chars AS BIGINT) AS n_chars
      |FROM (VALUES
      |  ('http://plain.example/readme', '',
      |   'no markup: 1 < 2, just text & spaces', 36),
      |  ('http://site-a.example/index', 'Site A & Friends',
      |   E'Welcome\nFirst paragraph with bold and a link .\nMaths: 3 < 4 > 2, "quoted", it''s fine.\nalpha\nbeta', 96),
      |  ('http://site-b.example/empty', '', '', 0),
      |  ('http://site-b.example/post', '',
      |   E'Line one\nLine two\nand & three.', 30),
      |  ('http://site-c.example/nested', 'C <3 page',
      |   E'k v\nDone here.', 14))
      |  AS t(url, title, text, n_chars)""".stripMargin

  /** Double-quoted-href anchor elements: group 1 = href value, group 2 =
    * inner markup up to the first closing tag. Case-insensitive, dot
    * matches newlines; single-quoted hrefs and href-less anchors are NOT
    * links by this pin (the fixture proves both). Java-regex and RE2
    * compatible (lazy quantifiers, no backreferences). */
  private val HtmlAnchorRe =
    "(?is)<a\\s[^>]*?href\\s*=\\s*\"([^\"]*)\"[^>]*>(.*?)</a>"

  /** Outlink extraction over a crawl — the link-graph product every
    * Common Crawl derivative ships (host ranking, seed discovery, anchor
    * corpora): one row per anchor with the RAW href (resolution policy is
    * the consumer's) and the cleaned anchor text (inner tags → spaces,
    * the shared entity decode, whitespace collapsed, trimmed).
    *
    * Scale: two `regexp_extract_all` projections + a positional explode —
    * row-local inside whole-stage codegen, no exchange; output volume is
    * the corpus's link count. href and anchor pair by match index (same
    * pattern, two capture groups — the arrays are always equal-length). */
  def htmlLinks(docs: DataFrame): DataFrame =
    docs
      .select(col("url"),
        regexp_extract_all(col("text"), lit(HtmlAnchorRe), lit(1)).as("hs"),
        regexp_extract_all(col("text"), lit(HtmlAnchorRe), lit(2)).as("ts"))
      .select(col("url"), col("ts"), posexplode(col("hs")).as(Seq("i", "href")))
      .select(col("url"), col("href"),
        trim(regexp_replace(graft.functions.TextFns.htmlEntities(
          regexp_replace(element_at(col("ts"), col("i") + 1),
            "<[^>]*>", " ")), "\\s+", " ")).as("anchor"))

  /** Driver-contract query: [[htmlLinks]] over the committed link fixture.
    * Ignores `dir` like [[warcHostStats]]. */
  def htmlLinksQ(spark: SparkSession, dir: String): DataFrame =
    htmlLinks(fixtureDocs(spark, FixtureLinksDir))

  /** Oracle: exact VALUES literal, hand-derived in
    * scripts/make_warc_fixture.py from the link fixture's markup under the
    * documented extraction rules — independently of the Scala regex — so
    * this row checks the double-quote pin (the single-quoted page yields
    * nothing), the href-less anchor skip, case/multiline tags, nested
    * inner markup, entity decode and whitespace collapse. */
  val htmlLinksSql: String =
    """SELECT url, href, anchor FROM (VALUES
      |  ('http://hub.example/start', '/local/page', 'the local page'),
      |  ('http://hub.example/start', 'http://alpha.example/a', 'Alpha & Co'),
      |  ('http://hub.example/start', 'http://alpha.example/a2', 'Alpha & Co'),
      |  ('http://hub.example/start', 'http://beta.example/b?q=1', 'beta list'),
      |  ('http://upper.example/g', 'HTTP://Gamma.example/G', 'Gamma Page'))
      |  AS t(url, href, anchor)""".stripMargin

  /** Driver-contract query: the registered-domain link graph built from
    * the WAT metadata path — [[linkGraphOfLinks]] over [[watOutlinks]],
    * proving a WAT consumer gets the identical graph product the
    * WARC-markup path ships. */
  def watLinkGraph(spark: SparkSession, dir: String): DataFrame =
    linkGraphOfLinks(watOutlinks(spark, dir))

  /** Oracle: the SAME hand-derived VALUES rows as `link_graph` — the two
    * fixtures describe the same pages by construction. */
  def watLinkGraphSql: String = linkGraphSql

  /** Registered-domain link graph over [[htmlLinks]] output — the
    * host-ranking substrate (PageRank seeds, spam-farm detection, seed
    * discovery run on exactly this edge list at crawl scale). Target
    * resolution pinned: an href with a scheme resolves to its own host;
    * anything else (rooted or relative path, fragment) stays on the
    * source page's host. Both endpoints roll up to the SHARED
    * registered-domain definition ([[registeredDomain]] — the blocklist's
    * suffix chain), so blocklist, domain rollup and link graph agree on
    * what a domain is. One uniform (src, dst)-keyed aggregation over the
    * row-local extraction; edge cardinality ≈ distinct domain pairs. */
  /** Target host of a link row (pinned resolution, shared by
    * [[linkGraph]] and [[anchorTexts]]): an href with a scheme resolves
    * to its own host; anything else stays on the source page's host. */
  private def dstHostCol: org.apache.spark.sql.Column =
    when(col("href").rlike("(?i)^[a-z][a-z0-9+.-]*://"),
      hostCol(col("href"))).otherwise(hostCol(col("url")))

  def linkGraph(docs: DataFrame): DataFrame = linkGraphOfLinks(htmlLinks(docs))

  /** The registered-domain rollup over ANY (url, href, anchor) link frame
    * — shared by the WARC-markup path ([[linkGraph]]) and the WAT-metadata
    * path (`wat_link_graph`), so both crawl formats feed the identical
    * graph product. */
  def linkGraphOfLinks(links: DataFrame): DataFrame =
    links
      .select(registeredDomain(hostCol(col("url"))).as("src_domain"),
        registeredDomain(dstHostCol).as("dst_domain"))
      .groupBy("src_domain", "dst_domain")
      .agg(count(lit(1)).as("n_links"))

  /** Per-destination-domain ANCHOR-TEXT rollup — the anchor corpus view
    * (inbound anchor text is the classic external description of a page;
    * retrieval training and site classification both consume it): per
    * target domain, inbound link count, distinct anchor strings, and the
    * dominant anchor (max count, lexicographic tie) with its count.
    * Empty anchors (image links) are not text and are excluded. Two
    * uniform domain-keyed aggregations; the argmax is an order-free
    * min(struct(−count, anchor)) — no window. */
  def anchorTexts(docs: DataFrame): DataFrame =
    htmlLinks(docs)
      .where(col("anchor") =!= "")
      .select(registeredDomain(dstHostCol).as("dst_domain"), col("anchor"))
      .groupBy("dst_domain", "anchor")
      .agg(count(lit(1)).as("c"))
      .groupBy("dst_domain")
      .agg(sum(col("c")).as("n_links"),
        count(lit(1)).as("n_unique_anchors"),
        min(struct((-col("c")).as("nc"), col("anchor").as("a"))).as("t"))
      .select(col("dst_domain"), col("n_links"), col("n_unique_anchors"),
        col("t.a").as("top_anchor"), (-col("t.nc")).as("top_count"))

  /** Driver-contract query: [[anchorTexts]] over the committed link
    * fixture. Ignores `dir` like [[warcHostStats]]. */
  def anchorTextsQ(spark: SparkSession, dir: String): DataFrame =
    anchorTexts(fixtureDocs(spark, FixtureLinksDir))

  /** Oracle: exact VALUES literal, hand-derived from the link fixture —
    * alpha.example carries the duplicate-anchor case (two hrefs, one
    * anchor string). */
  val anchorTextsSql: String =
    """SELECT dst_domain, CAST(n_links AS BIGINT) AS n_links,
      |  CAST(n_unique_anchors AS BIGINT) AS n_unique_anchors,
      |  top_anchor, CAST(top_count AS BIGINT) AS top_count
      |FROM (VALUES
      |  ('alpha.example', 2, 1, 'Alpha & Co', 2),
      |  ('beta.example', 1, 1, 'beta list', 1),
      |  ('gamma.example', 1, 1, 'Gamma Page', 1),
      |  ('hub.example', 1, 1, 'the local page', 1))
      |  AS t(dst_domain, n_links, n_unique_anchors, top_anchor, top_count)""".stripMargin

  /** Driver-contract query: [[linkGraph]] over the committed link fixture.
    * Ignores `dir` like [[warcHostStats]]. */
  def linkGraphQ(spark: SparkSession, dir: String): DataFrame =
    linkGraph(fixtureDocs(spark, FixtureLinksDir))

  // ---- registered-domain PageRank (crawl ranking product) ----------------
  /** PageRank over the registered-domain link graph — the host-ranking
    * table every crawl derivative ships (seed prioritization, spam-farm
    * demotion; Common Crawl publishes exactly this grain). Pinned variant:
    * nodes are the src∪dst domain universe (pure sinks get a rank row —
    * unlike the symmetric dup graph, a directed crawl graph has them);
    * edges are the DISTINCT domain pairs with self-links dropped (a site
    * linking itself is navigation, not endorsement); the iteration is the
    * shared [[graft.operators.Dedup.pagerankOn]] loop (fixed rounds,
    * damping 0.85, dangling mass dropped — documented there).
    *
    * Scale: the domain graph is aggregated once (corpus → ~10⁶ domain
    * rows); each round is one bounded join+agg over DOMAIN-grain frames —
    * never the corpus. Rows-only like `dup_pagerank` (iterative fixpoint);
    * brute-forced against an independent in-memory PageRank in
    * WarcSourceSpec. */
  def domainPagerank(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    // checkpoint the distinct edge set before fanning out: `nodes` reads
    // it twice and pagerankOn several more times — without this every
    // action re-runs the WARC parse + link extraction
    val edges = linkGraph(docs)
      .where(col("src_domain") =!= col("dst_domain"))
      .select(col("src_domain").as("src"), col("dst_domain").as("dst"))
      .distinct()
      .localCheckpoint(false)
    val nodes = edges.select(col("src"))
      .union(edges.select(col("dst").as("src")))
    graft.operators.Dedup.pagerankOn(edges, nodes = Some(nodes))
      .select(col("doc_id").as("domain"), col("degree").as("out_degree"),
        col("pr"))
  }

  // the rank table is a per-crawl artifact exactly like dup_pagerank's:
  // without the cache every invocation re-runs the full round loop —
  // ~21 s of pure per-round job overhead at bench even on a tiny graph
  private val domainPrCache = graft.operators.Materialized.register(
    scala.collection.concurrent.TrieMap
      .empty[(String, String), DataFrame])

  /** Driver-contract query (rows-only): [[domainPagerank]] over the
    * committed link fixture, materialized once per (session, fixture).
    * Ignores `dir` like [[warcHostStats]]. */
  def domainPagerankQ(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Materialized.cached(domainPrCache, spark,
        FixtureLinksDir) {
      domainPagerank(fixtureDocs(spark, FixtureLinksDir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  // ---- registered-domain HITS (crawl frontier ranking) -------------------
  /** HITS hubs/authorities over the same registered-domain graph as
    * [[domainPagerank]] — the complementary crawl-ops ranking (authority =
    * what to FETCH next, hub = what to RE-MINE for links); same edge
    * pinning (distinct cross-domain pairs, self-links dropped), iteration
    * in [[graft.operators.Dedup.hitsOn]]. Rows-only like the PageRank row
    * (iterative float fixpoint); brute-forced against an independent
    * in-memory HITS in WarcSourceSpec. */
  def domainHits(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val edges = linkGraph(docs)
      .where(col("src_domain") =!= col("dst_domain"))
      .select(col("src_domain").as("src"), col("dst_domain").as("dst"))
      .distinct()
    graft.operators.Dedup.hitsOn(edges,
      s"domain-hits-${java.util.UUID.randomUUID()}")
  }

  private val domainHitsCache = graft.operators.Materialized.register(
    scala.collection.concurrent.TrieMap
      .empty[(String, String), DataFrame])

  /** Driver-contract query (rows-only): [[domainHits]] over the committed
    * link fixture, materialized once per (session, fixture). Ignores `dir`
    * like [[warcHostStats]]. */
  def domainHitsQ(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Materialized.cached(domainHitsCache, spark,
        FixtureLinksDir) {
      domainHits(fixtureDocs(spark, FixtureLinksDir))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Oracle: exact VALUES literal, hand-derived from the link fixture
    * (scripts/make_warc_fixture.py): the hub's two absolute links resolve
    * to their own domains, its rooted `/local/page` stays on hub.example,
    * and the uppercase page's scheme-cased href normalizes to
    * gamma.example. */
  val linkGraphSql: String =
    """SELECT src_domain, dst_domain, CAST(n_links AS BIGINT) AS n_links
      |FROM (VALUES
      |  ('hub.example', 'alpha.example', 2),
      |  ('hub.example', 'beta.example', 1),
      |  ('hub.example', 'hub.example', 1),
      |  ('upper.example', 'gamma.example', 1))
      |  AS t(src_domain, dst_domain, n_links)""".stripMargin

  /** Driver-contract query: blocklist verdicts ([[urlFilterAudit]] under
    * [[UrlBlocklist]]) over the committed blocklist fixture. Ignores `dir`
    * like [[warcHostStats]] — WARC is a raw-file source, not an sfDir
    * table. */
  def urlFilterQ(spark: SparkSession, dir: String): DataFrame =
    urlFilterAudit(fixtureDocs(spark, FixtureBlockDir))

  /** Oracle: exact VALUES literal, hand-derived in
    * scripts/make_warc_fixture.py from the fixture's URLs and the
    * documented blocklist semantics — independently of hostSuffixes /
    * urlBlockRule — so this row checks host normalization, the
    * dot-boundary suffix match (the lookalike must stay clean), the
    * most-specific-rule report, the single-label degenerate chain and the
    * no-URL record. */
  val urlFilterSql: String =
    """SELECT url, host, blocked, rule FROM (VALUES
      |  ('', '', false, ''),
      |  ('http://ads.tracker.example/pixel', 'ads.tracker.example', true,
      |   'tracker.example'),
      |  ('http://good.example/page', 'good.example', false, ''),
      |  ('http://localhost/x', 'localhost', false, ''),
      |  ('http://nottracker.example/ok', 'nottracker.example', false, ''),
      |  ('http://shop.spam.good.example/buy2', 'shop.spam.good.example', true,
      |   'spam.good.example'),
      |  ('http://spam.good.example/buy', 'spam.good.example', true,
      |   'spam.good.example'),
      |  ('http://tracker.example/lp', 'tracker.example', true,
      |   'tracker.example'),
      |  ('https://Deep.Sub.TRACKER.example/x', 'deep.sub.tracker.example',
      |   true, 'tracker.example'))
      |  AS t(url, host, blocked, rule)""".stripMargin

  val warcUrlDedupSql: String =
    """SELECT canon_url, keep_url, CAST(n_fetches AS BIGINT) AS n_fetches,
      |  CAST(n_raw_urls AS BIGINT) AS n_raw_urls
      |FROM (VALUES
      |  ('alpha.example/a', 'http://alpha.example/a', 5, 4),
      |  ('beta.example', 'http://beta.example/', 2, 2),
      |  ('beta.example/page', 'http://beta.example/page?id=1', 2, 2))
      |  AS t(canon_url, keep_url, n_fetches, n_raw_urls)""".stripMargin

  // ---- robots.txt compliance gate (RFC 9309) ------------------------------
  /** The crawler identity the gate evaluates (CCBot-style named agent). */
  val RobotsAgent = "graftbot"

  /** robots.txt fixture corpus backing `robots_rules`/`robots_gate`
    * (scripts/make_robots_fixture.py; hand-derived VALUES oracles): group
    * selection trap (a host with both `*` and agent-specific groups),
    * empty-Disallow allow-all idiom, a host with no robots.txt, and a
    * host whose only group names a DIFFERENT agent with no `*` fallback. */
  lazy val FixtureRobotsDir: String =
    materializeFixture("warc_robots",
      Seq("cc-robots-000.warc", "cc-robots-001.warc.gz"))

  /** Parse one robots.txt body into (agent, rule, prefix) rows under the
    * RFC 9309 semantics this operator pins: `#` comments stripped, keys
    * case-insensitive, CONSECUTIVE User-agent lines share the following
    * rule lines, a User-agent line after Allow/Disallow rules starts a
    * NEW group, and OTHER records (Crawl-delay, Sitemap, …) neither end
    * a User-agent run nor start groups (§2.2.4: they MUST NOT interfere
    * with group formation). An EMPTY Allow/Disallow value is no rule at
    * all (the allow-all idiom) — but the GROUP still exists, so every
    * agent named by any User-agent line also emits one
    * (agent, 'group', '') presence row: group selection must see an
    * empty agent-specific group (= allow everything for that agent), not
    * fall back to `*` (review r12). Executor-side plain parsing — the
    * WARC-record-parse pattern; robots bodies are KB-sized. */
  private[graft] def parseRobots(body: String): Seq[(String, String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    var agents = List.empty[String]
    var inUaRun = false
    body.split("\r?\n").iterator
      .map(l => l.takeWhile(_ != '#').trim)
      .filter(_.nonEmpty)
      .foreach { line =>
        val ix = line.indexOf(':')
        if (ix > 0) {
          val key = line.substring(0, ix).trim.toLowerCase
          val value = line.substring(ix + 1).trim
          key match {
            case "user-agent" =>
              if (inUaRun) agents = value.toLowerCase :: agents
              else { agents = List(value.toLowerCase); inUaRun = true }
              seen += value.toLowerCase
            case "allow" | "disallow" =>
              inUaRun = false
              if (value.nonEmpty)
                agents.reverse.foreach(a => out += ((a, key, value)))
            case _ => () // Crawl-delay/Sitemap: MUST NOT interfere (§2.2.4)
          }
        }
      }
    seen.toSeq.map(a => (a, "group", "")) ++ out.toSeq
  }

  /** RFC 9309 §2.2.3 rule-to-regex translation: regex metachars escaped,
    * `*` matches any octet sequence, a TRAILING `$` anchors the match at
    * the path's end; anchored at the path start. Plain prefixes compile
    * to plain anchored literals, so startswith semantics are unchanged
    * where no special char appears. */
  private[graft] def robotsPattern(prefix: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val escaped = regexp_replace(prefix,
      "([\\\\.\\[\\]\\{\\}\\(\\)\\+\\-\\?\\^\\$\\|])", "\\\\$1")
    val starred = regexp_replace(escaped, "\\*", ".*")
    val anchored = regexp_replace(starred, "\\\\\\$$", "\\$")
    concat(lit("^"), anchored)
  }

  /** The parsed rule table of every robots.txt response in a crawl frame:
    * (host, agent, rule, prefix) — rule ∈ {'group', 'allow', 'disallow'};
    * 'group' rows mark GROUP PRESENCE (an agent-specific group with zero
    * rules must still win group selection). robots.txt is matched by its
    * URL PATH, so cache-busting query strings ('/robots.txt?cb=1') still
    * count (review r12). Map-only executor parse over KB-bounded bodies —
    * at 100 TB the table is host-bounded, the columnar compliance
    * artifact. */
  private[graft] def robotsRulesOf(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(hostCol(col("url")).as("host"), col("text"))
      .where(lower(coalesce(parse_url(col("url"), lit("PATH")), lit("")))
        === "/robots.txt")
      .as[(String, String)]
      .flatMap { case (host, text) =>
        parseRobots(text).map { case (a, r, p) => (host, a, r, p) } }
      .toDF("host", "agent", "rule", "prefix")
  }

  /** Driver-contract query: the rule table of the committed robots
    * fixture. Ignores `dir` (raw-file source; the warc_host_stats
    * pattern). */
  def robotsRules(spark: SparkSession, dir: String): DataFrame =
    robotsRulesOf(spark, fixtureDocs(spark, FixtureRobotsDir))

  /** Oracle: exact VALUES literal, hand-derived in
    * scripts/make_robots_fixture.py from the fixture bodies — checks the
    * full parse chain: comment strip (incl. trailing comments), group
    * accumulation across consecutive User-agent lines, group restart
    * after rules, group-presence rows, case folding, the wildcard rule
    * surviving verbatim, and the empty-Disallow drop (b.example
    * contributes its presence row but NO rule rows). */
  val robotsRulesSql: String =
    """SELECT host, agent, rule, prefix
      |FROM (VALUES
      |  ('a.example', '*', 'group', ''),
      |  ('a.example', 'graftbot', 'group', ''),
      |  ('b.example', '*', 'group', ''),
      |  ('d.example', 'otherbot', 'group', ''),
      |  ('a.example', '*', 'disallow', '/private/'),
      |  ('a.example', '*', 'allow', '/private/ok'),
      |  ('a.example', '*', 'disallow', '/tmp'),
      |  ('a.example', 'graftbot', 'disallow', '/graft-only/'),
      |  ('a.example', 'graftbot', 'disallow', '/*.zip$'),
      |  ('d.example', 'otherbot', 'disallow', '/'))
      |  AS t(host, agent, rule, prefix)""".stripMargin

  /** RFC 9309 group selection, shared by the batch verdicts and the
    * streaming rule-set artifact (one definition — batch≡stream by
    * construction): the agent-specific group's RULES if the host has such
    * a group (presence decided by 'group' rows, so an EMPTY specific
    * group correctly yields zero rules instead of falling back to `*`),
    * else the `*` group's rules, else nothing. Emits (host, rule, prefix,
    * pattern) with the §2.2.3 wildcard regex precompiled. */
  private[graft] def effectiveRules(rules: DataFrame, agent: String): DataFrame = {
    val hostsSpecific = rules.where(col("agent") === agent)
      .select(col("host")).distinct().withColumn("has_specific", lit(true))
    rules.join(hostsSpecific, Seq("host"), "left")
      .where(col("rule") =!= "group"
        && col("agent") ===
          when(coalesce(col("has_specific"), lit(false)), lit(agent))
            .otherwise(lit("*")))
      .select(col("host"), col("rule"), col("prefix"),
        robotsPattern(col("prefix")).as("pattern"))
  }

  /** Per-page robots verdicts for `agent` under RFC 9309 group selection
    * ([[effectiveRules]]) and precedence: among MATCHING rules (§2.2.3
    * wildcard semantics — `*` any octets, trailing `$` end-anchor, via
    * the precompiled pattern) the LONGEST rule wins, Allow wins a length
    * tie, and no match means allowed.
    *
    * Scale shape: the rule table is host-bounded (never broadcast at
    * 100 TB — ~10⁸ domains × rules) and equi-joins the page frame on the
    * uniform host key with the match predicate evaluated in the join;
    * the per-URL argmax is one min(struct) aggregation — no window over
    * the corpus, no all-pairs. */
  private[graft] def robotsVerdicts(pages: DataFrame, rules: DataFrame,
      agent: String): DataFrame = {
    val eff = effectiveRules(rules, agent)
    // fragment stripped (ADVICE r12, hardened r13 review): RFC 9309
    // matching is defined on path(+query) only — a '#fragment' is
    // client-side and never sent to the server. Strip it from the URL
    // BEFORE extracting the path: stripping the extracted path instead is
    // defeated by a path-less hash-routing URL ('http://h#/admin'), where
    // [^/]+ absorbs the '#' into the host token and the fragment leaks
    // into the path as '/admin'.
    val p = pages.select(col("url"), hostCol(col("url")).as("host"),
      coalesce(nullif(regexp_extract(
        regexp_replace(col("url"), "#.*$", ""),
        "^[A-Za-z]+://[^/]+(/.*)?$", 1), lit("")), lit("/"))
        .as("path"))
    p.as("p").join(eff.as("r"),
        col("p.host") === col("r.host")
          && expr("regexp_like(p.path, r.pattern)"), "left")
      .groupBy(col("url"), col("p.host").as("host"), col("path"))
      .agg(min(when(col("r.prefix").isNotNull,
        struct(negate(length(col("r.prefix"))).as("nl"),
          when(col("r.rule") === "allow", 0).otherwise(1).as("ro"),
          col("r.rule").as("rule"), col("r.prefix").as("prefix"))))
        .as("best"))
      .select(col("url"), col("host"), col("path"),
        (col("best").isNull || col("best.rule") === "allow").as("allowed"),
        coalesce(col("best.prefix"), lit("")).as("matched_prefix"))
  }

  /** Driver-contract query: [[robotsVerdicts]] for [[RobotsAgent]] over
    * the committed fixture's PAGE responses (robots.txt bodies excluded
    * by PATH — the gate governs content fetches). */
  def robotsGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = fixtureDocs(spark, FixtureRobotsDir)
    robotsVerdicts(
      docs.where(lower(coalesce(parse_url(col("url"), lit("PATH")), lit("")))
        =!= "/robots.txt"),
      robotsRulesOf(spark, docs), RobotsAgent)
  }

  /** Oracle: exact VALUES literal (hand-derived, see the generator's
    * docstring) — pins the group-selection trap (a.example/private/x is
    * ALLOWED for graftbot because its specific group replaces `*`), the
    * agent-gated disallow, the §2.2.3 wildcard+anchor rule catching
    * /files/x.zip, the empty-Disallow allow-all, the no-robots-at-all
    * default, and the no-`*`-fallback default. */
  val robotsGateSql: String =
    """SELECT url, host, path, allowed, matched_prefix
      |FROM (VALUES
      |  ('http://a.example/files/x.zip', 'a.example', '/files/x.zip',
      |   false, '/*.zip$'),
      |  ('http://a.example/graft-only/secret', 'a.example',
      |   '/graft-only/secret', false, '/graft-only/'),
      |  ('http://a.example/private/x', 'a.example', '/private/x', true, ''),
      |  ('http://b.example/anything', 'b.example', '/anything', true, ''),
      |  ('http://c.example/whatever', 'c.example', '/whatever', true, ''),
      |  ('http://d.example/page', 'd.example', '/page', true, ''))
      |  AS t(url, host, path, allowed, matched_prefix)""".stripMargin

  // ---- WET / WAT ingestion (Common Crawl's other two formats) -------------
  // A crawl consumer rarely starts from raw WARC: Common Crawl publishes
  // every segment in three flavors — WARC (raw HTTP), WET (extracted plain
  // text) and WAT (per-page metadata JSON). Both extras are the SAME
  // Content-Length-framed record walk the V2 connector already streams
  // (VERDICT r12 #2); only the record type filter and block interpretation
  // differ, so they ride readWarc unchanged — pushdown, record streaming
  // and the one-record memory bound included.

  /** WET fixture corpus backing `wet_host_stats` (generated by
    * scripts/make_warc_fixture.py: the extracted-text twins of the
    * graft/warc_html pages, bodies = the HAND-DERIVED extraction strings,
    * plus a warcinfo preamble the type filter must drop). */
  lazy val FixtureWetDir: String =
    materializeFixture("wet", Seq("cc-000.warc.wet", "cc-001.warc.wet.gz"))
  /** WAT fixture corpus backing `wat_page_meta`/`wat_outlinks` (same
    * generator: metadata-JSON twins of the graft/warc_links pages, Links
    * arrays = the hand-derived link rows). */
  lazy val FixtureWatDir: String =
    materializeFixture("wat", Seq("cc-000.warc.wat", "cc-001.warc.wat.gz"))

  /** `conversion` records of a WET archive -> a `documents`-shaped frame.
    * Unlike [[toDocuments]] there is no HTTP header block to strip — a WET
    * block IS the extracted page text (that is the format's point); the
    * type filter drops the warcinfo preamble every real WET file opens
    * with. Same shared doc_id derivation as the WARC path. */
  def documentsFromWet(spark: SparkSession, path: String): DataFrame =
    toWetDocuments(readWarc(spark, path))

  /** Streaming twin of [[documentsFromWet]] — identical projection over
    * the V2 micro-batch stream, so a WET landing directory feeds the same
    * DocsStream curation gates a WARC one does. */
  def documentsFromWetStream(spark: SparkSession, dir: String): DataFrame =
    toWetDocuments(readWarcStream(spark, dir))

  private def toWetDocuments(recs: DataFrame): DataFrame =
    recs
      .where(col("warc_type") === "conversion")
      .select(
        graft.functions.TextFns.md5Long(concat_ws("\u0001",
          col("path"), col("rec_ix"), col("url"))).as("doc_id"),
        col("url"),
        col("warc_date"),
        col("block").cast("string").as("text"))

  /** Driver-contract query: [[hostStats]] over the committed WET fixture —
    * the rollup a WET consumer runs first. Ignores `dir` like
    * [[warcHostStats]] (raw-file source, not an sfDir table). */
  def wetHostStats(spark: SparkSession, dir: String): DataFrame =
    hostStats(documentsFromWet(spark, FixtureWetDir))

  /** Oracle: exact VALUES literal, derived in scripts/make_warc_fixture.py
    * from the fixture body strings independently of the Scala parse —
    * checks the conversion-type filter (the warcinfo row must not appear),
    * the no-header-strip block semantics (n_chars are the FULL block) and
    * the shared host normalization. site-b.example carries the empty-text
    * record. */
  val wetHostStatsSql: String =
    """SELECT host, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_chars AS BIGINT) AS n_chars
      |FROM (VALUES
      |  ('plain.example', 1, 36),
      |  ('site-a.example', 1, 96),
      |  ('site-b.example', 2, 30),
      |  ('site-c.example', 1, 14)) AS t(host, n_docs, n_chars)""".stripMargin

  /** The WAT JSON envelope's typed read schema — only the fields the
    * queries consume (from_json prunes the rest): response status,
    * content type, title, and the outlink array. Built programmatically
    * because WAT field names carry hyphens. */
  private lazy val WatSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    def st(fields: (String, DataType)*): StructType =
      StructType(fields.map { case (n, t) => StructField(n, t) })
    st("Envelope" -> st(
      "Payload-Metadata" -> st(
        "HTTP-Response-Metadata" -> st(
          "Response-Message" -> st("Status" -> StringType),
          "Headers" -> st("Content-Type" -> StringType),
          "HTML-Metadata" -> st(
            "Head" -> st("Title" -> StringType),
            "Links" -> ArrayType(st(
              "path" -> StringType,
              "url" -> StringType,
              "text" -> StringType)))))))
  }

  /** `metadata` records of a WAT archive with the JSON envelope parsed
    * under [[WatSchema]] — the typed `from_json` discipline of
    * `event_props_agg` on the crawl-metadata grain. The page URL comes
    * from the record's own WARC-Target-URI header (identical to the
    * envelope's copy); unparseable JSON yields a null envelope row, not
    * an abort. Row-local projection fused into the record scan. */
  private def watPages(spark: SparkSession, path: String): DataFrame =
    readWarc(spark, path)
      .where(col("warc_type") === "metadata")
      .select(col("url"),
        from_json(col("block").cast("string"), WatSchema).as("env"))
      .select(col("url"),
        col("env").getField("Envelope").getField("Payload-Metadata")
          .getField("HTTP-Response-Metadata").as("http"))

  /** Driver-contract query: per-page metadata from the committed WAT
    * fixture — status, content type, title, outlink count. Ignores `dir`
    * like [[warcHostStats]]. */
  def watPageMeta(spark: SparkSession, dir: String): DataFrame =
    watPages(spark, FixtureWatDir)
      .select(col("url"),
        col("http").getField("Response-Message").getField("Status")
          .cast("long").as("status"),
        coalesce(col("http").getField("Headers").getField("Content-Type"),
          lit("")).as("content_type"),
        coalesce(col("http").getField("HTML-Metadata").getField("Head")
          .getField("Title"), lit("")).as("title"),
        coalesce(size(col("http").getField("HTML-Metadata")
          .getField("Links")), lit(0)).cast("long").as("n_links"))

  /** Oracle: exact VALUES literal (hand-derived in the generator) — pins
    * the typed from_json chain end-to-end: nested hyphenated fields, the
    * string->BIGINT status cast, absent Title/Links coalescing to ''/0,
    * and the non-200 row. */
  val watPageMetaSql: String =
    """SELECT url, CAST(status AS BIGINT) AS status, content_type, title,
      |  CAST(n_links AS BIGINT) AS n_links
      |FROM (VALUES
      |  ('http://hub.example/start', 200, 'text/html', '', 4),
      |  ('http://nolinks.example/t', 200, 'text/html', '', 0),
      |  ('http://squote.example/s', 404, 'text/html', 'Not Found', 0),
      |  ('http://upper.example/g', 200, 'text/html', 'Upper Gamma', 1))
      |  AS t(url, status, content_type, title, n_links)""".stripMargin

  /** Driver-contract query: the outlink rows of the committed WAT fixture
    * — (url, href, anchor) exploded from the envelope's Links array, the
    * SAME shape [[htmlLinks]] extracts from raw WARC markup (conformance
    * asserted in WarcSourceSpec: a WAT consumer and a WARC consumer get
    * the same link table). Pages without links vanish (inner explode —
    * link-grain output). */
  def watOutlinks(spark: SparkSession, dir: String): DataFrame =
    watPages(spark, FixtureWatDir)
      .select(col("url"),
        explode(col("http").getField("HTML-Metadata").getField("Links"))
          .as("l"))
      .select(col("url"), col("l").getField("url").as("href"),
        col("l").getField("text").as("anchor"))

  /** Oracle: exact VALUES literal — the same five hand-derived link rows
    * the html_links oracle pins (the two fixtures describe the same
    * pages by construction). */
  val watOutlinksSql: String =
    """SELECT url, href, anchor FROM (VALUES
      |  ('http://hub.example/start', '/local/page', 'the local page'),
      |  ('http://hub.example/start', 'http://alpha.example/a', 'Alpha & Co'),
      |  ('http://hub.example/start', 'http://alpha.example/a2', 'Alpha & Co'),
      |  ('http://hub.example/start', 'http://beta.example/b?q=1', 'beta list'),
      |  ('http://upper.example/g', 'HTTP://Gamma.example/G', 'Gamma Page'))
      |  AS t(url, href, anchor)""".stripMargin

  // ---- sitemap.xml parse (the robots.txt companion) ------------------------
  /** Sitemap fixture corpus backing `sitemap_urls` (generated by
    * scripts/make_warc_fixture.py: a urlset with lastmod/priority,
    * entity-escaped and whitespace-padded locs and a loc-less block, an
    * UPPERCASE sitemapindex, and a non-sitemap page carrying a literal
    * "<url>" that must not match). */
  lazy val FixtureSitemapDir: String =
    materializeFixture("warc_sitemap",
      Seq("cc-sitemap-000.warc", "cc-sitemap-001.warc.gz"))

  /** Sitemap entries of a crawl (the sitemaps.org protocol — crawl seed
    * discovery, the robots.txt companion; VERDICT r12 #6). Pinned rules:
    * a response is a sitemap iff its body carries a `<urlset` or
    * `<sitemapindex` root tag (case-insensitive); `<url>` blocks emit
    * kind='url' rows and `<sitemap>` blocks of an index file emit
    * kind='sitemap' rows — the recursion SEED for the next fetch round
    * (batch ingestion parses what was fetched; it cannot fetch children,
    * so index recursion is by re-joining emitted seeds against the next
    * crawl segment). loc is required (block dropped without one),
    * whitespace-trimmed, entity-decoded (&amp; in URLs is mandatory XML
    * escaping); lastmod/priority optional, '' when absent.
    *
    * Scale: two regexp_extract_all projections + a positional explode per
    * kind — row-local inside whole-stage codegen like [[htmlLinks]]; the
    * sitemap root filter prunes the corpus before any block scan. */
  def sitemapUrls(docs: DataFrame): DataFrame = {
    def wsTrim(c: org.apache.spark.sql.Column) =
      regexp_replace(c, "^\\s+|\\s+$", "")
    def blocks(tag: String, kind: String) =
      docs
        .where(col("text").rlike("(?is)<\\s*(urlset|sitemapindex)"))
        .select(col("url").as("sitemap_url"),
          explode(regexp_extract_all(col("text"),
            lit(s"(?is)<$tag\\b[^>]*>(.*?)</$tag\\s*>"), lit(1))).as("b"))
        .select(col("sitemap_url"), lit(kind).as("kind"),
          // regex trim: Spark's trim() strips only 0x20, and sitemap locs
          // legally wrap in newlines
          wsTrim(graft.functions.TextFns.htmlEntities(regexp_extract(col("b"),
            "(?is)<loc\\s*>(.*?)</loc\\s*>", 1))).as("loc"),
          wsTrim(regexp_extract(col("b"),
            "(?is)<lastmod\\s*>(.*?)</lastmod\\s*>", 1)).as("lastmod"),
          wsTrim(regexp_extract(col("b"),
            "(?is)<priority\\s*>(.*?)</priority\\s*>", 1)).as("priority"))
        .where(col("loc") =!= "")
    blocks("url", "url").unionAll(blocks("sitemap", "sitemap"))
  }

  /** Driver-contract query: [[sitemapUrls]] over the committed sitemap
    * fixture. Ignores `dir` like [[warcHostStats]]. */
  def sitemapUrlsQ(spark: SparkSession, dir: String): DataFrame =
    sitemapUrls(fixtureDocs(spark, FixtureSitemapDir))

  /** Oracle: exact VALUES literal, hand-derived in
    * scripts/make_warc_fixture.py from the fixture bodies under the
    * documented rules — pins the root-tag gate (the literal "<url>" on a
    * plain page yields nothing), the `<url\b` boundary (a urlset root
    * never parses as a url block), loc trim + entity decode, optional
    * lastmod/priority, the loc-less block drop, and the uppercase index
    * with kind='sitemap' seeds. */
  val sitemapUrlsSql: String =
    """SELECT sitemap_url, kind, loc, lastmod, priority
      |FROM (VALUES
      |  ('http://a.example/sitemap.xml', 'url', 'http://a.example/',
      |   '2024-01-01', '1.0'),
      |  ('http://a.example/sitemap.xml', 'url', 'http://a.example/big.zip',
      |   '', ''),
      |  ('http://a.example/sitemap.xml', 'url',
      |   'http://a.example/graft-only/hidden', '', ''),
      |  ('http://a.example/sitemap.xml', 'url',
      |   'http://a.example/page?x=1&y=2', '', ''),
      |  ('http://a.example/sitemap.xml', 'url', 'http://a.example/spaced',
      |   '2024-02-03', ''),
      |  ('http://a.example/sitemap.xml', 'url', 'http://b.example/notmap',
      |   '', ''),
      |  ('http://a.example/sitemap.xml', 'url', 'http://tracker.example/lp2',
      |   '', ''),
      |  ('http://a.example/sitemap_index.xml', 'sitemap',
      |   'http://a.example/sitemap.xml', '2024-01-05', ''),
      |  ('http://a.example/sitemap_index.xml', 'sitemap',
      |   'http://a.example/sitemap2.xml.gz', '', ''))
      |  AS t(sitemap_url, kind, loc, lastmod, priority)""".stripMargin

  // ---- crawl frontier (the crawl-ops end product) --------------------------
  /** The next-fetch FRONTIER a polite crawler derives each cycle — the
    * composition every crawl scheduler runs, built from four families
    * this library already ships: sitemap seeds ([[sitemapUrls]], kind
    * 'url'), the domain blocklist ([[urlBlockRule]] — cheapest, applied
    * first), RFC 9309 robots verdicts ([[robotsVerdicts]] for
    * [[RobotsAgent]]), and canonical-URL dedup against the already-
    * fetched corpus ([[canonicalUrl]]). One verdict row per seed with
    * pinned precedence blocked > disallowed > fetched > fetch. Host
    * policy note: cross-host locs are NOT dropped here (the sitemaps.org
    * same-host rule is a publisher constraint; a scheduler's own host
    * policy gates separately — the blocklist already demonstrates the
    * hook).
    *
    * Scale: seeds are sitemap-bounded (≪ corpus); the robots join is the
    * host-keyed equi-join documented at [[robotsVerdicts]]; the fetched-
    * set probe is a LEFT SEMI join on the canonical-URL key of the crawl
    * — seed-side small, corpus-side pruned to one column. */
  def crawlFrontier(seeds: DataFrame, rules: DataFrame,
      fetched: DataFrame, agent: String): DataFrame = {
    val blocked = seeds.select(col("loc").as("url"),
      urlBlockRule(col("url"), UrlBlocklist).as("block_rule"))
    val robots = robotsVerdicts(blocked.select(col("url")), rules, agent)
      .select(col("url"), col("host"), col("allowed"))
    val fetchedCanon = fetched
      .select(canonicalUrl(col("url")).as("canon")).distinct()
      .withColumn("already", lit(true))
    blocked.join(robots, Seq("url"))
      .join(fetchedCanon.hint("shuffle_hash"),
        canonicalUrl(col("url")) === col("canon"), "left")
      .select(col("url"), col("host"),
        when(col("block_rule") =!= "", "blocked")
          .when(!col("allowed"), "disallowed")
          .when(coalesce(col("already"), lit(false)), "fetched")
          .otherwise("fetch").as("verdict"))
  }

  /** Driver-contract query: [[crawlFrontier]] over the committed sitemap
    * fixture's seeds, the robots fixture's rule table, and the sitemap
    * fixture's own fetched pages. Ignores `dir` like [[warcHostStats]]. */
  def crawlFrontierQ(spark: SparkSession, dir: String): DataFrame = {
    val sm = fixtureDocs(spark, FixtureSitemapDir)
    crawlFrontier(
      sitemapUrls(sm).where(col("kind") === "url"),
      robotsRulesOf(spark, fixtureDocs(spark, FixtureRobotsDir)),
      sm, RobotsAgent)
  }

  /** Oracle: exact VALUES literal, hand-derived in
    * scripts/make_warc_fixture.py (see the sitemap fixture docstring) —
    * pins each drop reason once: the registered-domain blocklist hit, the
    * graftbot group's /graft-only/ prefix and `*.zip$`-on-root wildcard (group
    * selection REPLACING '*'), the already-fetched canonical probe, and
    * the clean seeds left to fetch. */
  val crawlFrontierSql: String =
    """SELECT url, host, verdict
      |FROM (VALUES
      |  ('http://a.example/', 'a.example', 'fetch'),
      |  ('http://a.example/big.zip', 'a.example', 'disallowed'),
      |  ('http://a.example/graft-only/hidden', 'a.example', 'disallowed'),
      |  ('http://a.example/page?x=1&y=2', 'a.example', 'fetch'),
      |  ('http://a.example/spaced', 'a.example', 'fetch'),
      |  ('http://b.example/notmap', 'b.example', 'fetched'),
      |  ('http://tracker.example/lp2', 'tracker.example', 'blocked'))
      |  AS t(url, host, verdict)""".stripMargin
}
