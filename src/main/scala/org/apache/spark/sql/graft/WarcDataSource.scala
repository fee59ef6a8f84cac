package org.apache.spark.sql.graft

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 WARC connector: `spark.read.format("warc").load(path)`.
  *
  * The ladder-tier-(c) SOURCE counterpart of [[AsOfJoinNative]] — a full
  * `TableProvider`/`Scan`/`Batch` implementation rather than a composition
  * over `binaryFile`. Two properties the binaryFile path cannot offer:
  *
  *  - **True streaming reads.** The partition reader feeds
  *    [[graft.sources.WarcSource.parseWarcStream]] straight from the
  *    (optionally gzipped) file stream: a file never materializes as one
  *    byte array, so there is no 2 GB cap and the task's memory high-water
  *    mark is one record — a multi-GB uncompressed WARC streams fine.
  *  - **Column pruning pushed into the parse.** `SupportsPushDownRequiredColumns`
  *    receives Catalyst's pruned schema; when `block` is not required
  *    (host rollups, record counts, URL audits) payload bytes are moved
  *    through a scratch page for Content-Length framing and never
  *    buffered — the dominant byte volume of a crawl is allocated only
  *    when a query actually reads it.
  *
  * Scale: one `InputPartition` per file, exactly the fan-out unit crawls
  * arrive in (Common Crawl publishes ~1 GB `.warc.gz` members; gzip keeps
  * whole files single-task — the same non-splittable rule every WARC
  * consumer lives with). File enumeration accepts files, directories
  * (non-recursive, hidden files skipped) and globs, resolved through the
  * Hadoop filesystem API so any configured scheme (file://, hdfs://, s3a://)
  * works unchanged.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WarcDataSource.Schema
  // Writes hand the incoming frame's schema through getTable (the DSv2
  // external-metadata contract); the writer maps its fields BY NAME, so a
  // documents-shaped frame with extra columns still appends cleanly.
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new WarcTable(WarcDataSource.resolvePaths(properties), schema)
}

object WarcDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("rec_ix", LongType, nullable = false),
    StructField("url", StringType),
    StructField("warc_date", StringType),
    StructField("warc_type", StringType),
    StructField("block", BinaryType)))

  /** `.load(p)` arrives as option "path"; `.load(p1, p2, …)` as option
    * "paths", a JSON-encoded string array (the DSv2 path contract). */
  private[graft] def resolvePaths(props: util.Map[String, String]): Seq[String] = {
    val single = Option(props.get("path")).toSeq
    val multi = Option(props.get("paths")).toSeq.flatMap { js =>
      WarcStreamOffset.Mapper.readValue(js, classOf[Array[String]]).toSeq
    }
    val all = single ++ multi
    require(all.nonEmpty, "warc source: no path given (use .load(path))")
    all
  }

  /** Driver-side file enumeration: globs expand, directories list
    * non-recursively, hidden (`_`/`.`) files drop — the same conventions
    * as Spark's file sources. `strict` (batch) fails loudly on a path that
    * matches nothing (almost always a typo); the streaming caller passes
    * `strict=false`, because an empty landing directory/glob is the NORMAL
    * initial state of a drop-dir and must mean "no data yet", not a crash
    * inside latestOffset. */
  private[graft] def listFiles(
      paths: Seq[String], conf: Configuration, strict: Boolean = true): Seq[String] = {
    val statuses: Seq[FileStatus] = paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      require(!strict || matched.nonEmpty, s"warc source: path matches no files: $p")
      matched.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }
    }
    statuses
      .filter { st =>
        val n = st.getPath.getName
        !(n.startsWith("_") || n.startsWith("."))
      }
      .map(_.getPath.toString)
      .distinct
      .sorted
  }
}

private[graft] class WarcTable(paths: Seq[String], tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  def this(paths: Seq[String]) = this(paths, WarcDataSource.Schema)
  override def name(): String = s"warc(${paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(paths,
      Option(options.get("maxFilesPerTrigger")).map(_.toInt))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(paths.size == 1,
      s"warc sink: exactly one output directory expected, got $paths")
    new WarcWriteBuilder(paths.head, info.schema(),
      Option(info.options.get("compression")))
  }
}

private[graft] class WarcScanBuilder(paths: Seq[String], maxFilesPerTrigger: Option[Int])
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = WarcDataSource.Schema
  private var keepType: String = null
  private var accepted: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** The one filter worth pushing is `warc_type = v`: the reader then
    * skips non-matching records' payload bytes entirely (zero buffering —
    * request/metadata records are roughly half a real crawl). The accepted
    * filter is ALSO returned as residual, so Catalyst re-checks it
    * post-scan: pushdown here is a byte-skipping optimization, never a
    * correctness dependency. */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    filters.collectFirst {
      case f @ sources.EqualTo("warc_type", v: String) => (f, v)
    }.foreach { case (f, v) => keepType = v; accepted = Array(f) }
    filters // everything stays residual (re-checked after the scan)
  }
  override def pushedFilters(): Array[sources.Filter] = accepted

  override def build(): Scan =
    new WarcScan(paths, required, keepType, maxFilesPerTrigger)
}

private[graft] class WarcScan(
    paths: Seq[String],
    required: StructType,
    keepType: String,
    maxFilesPerTrigger: Option[Int])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"warc scan, columns [${required.fieldNames.mkString(", ")}]" +
      (if (keepType != null) s", pushed warc_type = $keepType" else "")

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    WarcDataSource.listFiles(paths, conf)
      .map(p => WarcInputPartition(p): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())
    new WarcReaderFactory(required, keepType, conf)
  }
  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new WarcMicroBatchStream(paths, required, keepType, maxFilesPerTrigger)
}

/** Micro-batch stream over a WARC landing directory: each trigger lists
  * the directory and processes exactly the files not covered by the start
  * offset — the append-only drop-dir contract crawl fetchers follow
  * (files are immutable once written). An offset is the sorted list of
  * files SEEN SO FAR — monotone: each new offset is the previous one plus
  * newly arrived files, so retention deleting an already-processed file
  * can never shrink the offset and a later re-created filename is not
  * reprocessed. JSON-encoded and self-describing, so restart-from-
  * checkpoint needs no side state. An empty landing dir is "no data yet",
  * never an error. `maxFilesPerTrigger` bounds each micro-batch, so a
  * large backlog commits incrementally instead of as one giant batch.
  * (Production-hardening note: a list-of-files offset is O(files seen);
  * Spark's own FileStreamSource graduates to a compacted file log at the
  * million-file mark — the natural upgrade path, orthogonal to the
  * record-streaming reader this source shares with batch.) Readers stream
  * records from the file handle exactly like the batch scan: no
  * whole-file byte array in the streaming path either — the
  * binaryFile-based twin buffers each file once. */
private[graft] class WarcMicroBatchStream(
    paths: Seq[String],
    required: StructType,
    keepType: String,
    maxFilesPerTrigger: Option[Int])
    extends streaming.MicroBatchStream
    with streaming.SupportsTriggerAvailableNow {

  private val conf = new SerializableConfiguration(
    SparkSession.active.sessionState.newHadoopConf())
  // pinned by prepareForTriggerAvailableNow: AvailableNow must drain to the
  // file set observed at query start, then stop
  private var pinnedTarget: Set[String] = null

  private def listNow(): Seq[String] =
    WarcDataSource.listFiles(paths, conf.value, strict = false)

  override def prepareForTriggerAvailableNow(): Unit =
    pinnedTarget = listNow().toSet

  /** start ∪ (up to maxFilesPerTrigger newly arrived files). */
  private def advance(start: WarcStreamOffset): WarcStreamOffset = {
    val target = if (pinnedTarget != null) pinnedTarget else listNow().toSet
    val seen = start.files.toSet
    val fresh = (target -- seen).toSeq.sorted
    WarcStreamOffset(
      start.files ++ maxFilesPerTrigger.map(fresh.take).getOrElse(fresh))
  }

  override def initialOffset(): streaming.Offset = WarcStreamOffset(Seq.empty)
  override def latestOffset(): streaming.Offset =
    advance(WarcStreamOffset(Seq.empty))
  override def latestOffset(
      start: streaming.Offset, limit: streaming.ReadLimit): streaming.Offset =
    advance(start.asInstanceOf[WarcStreamOffset])
  override def getDefaultReadLimit: streaming.ReadLimit =
    maxFilesPerTrigger
      .map(n => streaming.ReadLimit.maxFiles(n))
      .getOrElse(streaming.ReadLimit.allAvailable())
  override def deserializeOffset(json: String): streaming.Offset =
    WarcStreamOffset(
      WarcStreamOffset.Mapper.readValue(json, classOf[Array[String]]).toSeq)

  override def planInputPartitions(
      start: streaming.Offset, end: streaming.Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[WarcStreamOffset].files.toSet
    end.asInstanceOf[WarcStreamOffset].files
      .filterNot(seen)
      .map(p => WarcInputPartition(p): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required, keepType, conf)
  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

private[graft] case class WarcStreamOffset(files: Seq[String])
    extends streaming.Offset {
  override def json(): String =
    WarcStreamOffset.Mapper.writeValueAsString(files.sorted.toArray)
}

private[graft] object WarcStreamOffset {
  // ObjectMapper is thread-safe after configuration; one instance serves
  // every offset (de)serialization instead of one per call
  val Mapper = new com.fasterxml.jackson.databind.ObjectMapper()
}

/** Batch WARC WRITE path — the archival sink closing the connector's
  * source↔sink loop (`df.write.format("warc").mode("append").save(dir)`).
  *
  * Semantics follow the crawl-archive contract the read path assumes:
  * append-only immutable part files (no overwrite — re-curation writes a
  * new directory, the same reason the stream offset is monotone). Each
  * task streams its rows into ONE hidden temp file (`.uuid….tmp` — the
  * reader's listing skips `.`/`_` names, so concurrent readers never see
  * a half-written member); the driver's job commit renames every temp to
  * its visible `part-NNNNN.warc[.gz]` name only after ALL tasks succeed —
  * task failure/speculation leaves only hidden garbage, never a partial
  * visible file. Records are spec-framed exactly as the parser expects
  * (version line, headers, Content-Length, CRLF-CRLF trailer), so
  * write→read round-trips byte-identically — asserted in WarcSourceSpec,
  * including a payload containing the literal record marker.
  *
  * Scale: one file per task ≈ the ~1 GB member sizing crawls publish;
  * `compression=gzip` emits `.warc.gz` members (whole-file gzip, the
  * format's own non-splittable unit). No driver-side data movement —
  * commit is |tasks| renames of already-written files. */
private[graft] class WarcWriteBuilder(
    dir: String, schema: StructType, compression: Option[String])
    extends WriteBuilder {
  // field positions resolved BY NAME once, driver-side; url/date may be
  // absent (headers omitted), the payload column is required
  private def ixOf(n: String) = schema.fieldNames.indexOf(n)
  require(ixOf("block") >= 0 &&
      schema(ixOf("block")).dataType == BinaryType,
    s"warc sink needs a BINARY 'block' column; got ${schema.simpleString}")
  require(ixOf("warc_type") >= 0,
    s"warc sink needs a STRING 'warc_type' column; got ${schema.simpleString}")
  private val gzip = compression.map(_.toLowerCase) match {
    case None | Some("none") => false
    case Some("gzip") => true
    case Some(other) =>
      throw new IllegalArgumentException(
        s"warc sink: unsupported compression '$other' (gzip|none)")
  }

  override def build(): Write = new Write {
    private def factory() =
      new WarcWriterFactory(dir, gzip,
        ixOf("url"), ixOf("warc_date"), ixOf("warc_type"), ixOf("block"),
        new SerializableConfiguration(
          SparkSession.active.sessionState.newHadoopConf()))
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory = factory()
      override def commit(messages: Array[WriterCommitMessage]): Unit =
        WarcWriteBuilder.publish(messages)
      override def abort(messages: Array[WriterCommitMessage]): Unit =
        WarcWriteBuilder.discard(messages)
    }
    /** Streaming half (`df.writeStream.format("warc").start(dir)`): each
      * micro-batch epoch commits like a small batch job. Final member
      * names carry (epoch, partition) but NOT the task attempt, and
      * publish() replaces an existing member — so a restart that replays
      * an epoch rewrites the SAME file with the SAME bytes (record ids
      * are position-deterministic) instead of duplicating records: the
      * visible member set is effectively exactly-once without a side
      * file-log. */
    override def toStreaming: StreamingWrite = new StreamingWrite {
      override def createStreamingWriterFactory(
          info: PhysicalWriteInfo): StreamingDataWriterFactory = factory()
      override def commit(
          epochId: Long, messages: Array[WriterCommitMessage]): Unit =
        WarcWriteBuilder.publish(messages)
      override def abort(
          epochId: Long, messages: Array[WriterCommitMessage]): Unit =
        WarcWriteBuilder.discard(messages)
    }
  }
}

private[graft] object WarcWriteBuilder {
  /** Driver-side job/epoch commit: rename every task's hidden temp to its
    * visible name. An existing member with the final name is replaced —
    * that only happens on a replayed streaming epoch, whose bytes are
    * identical by construction (deterministic record ids, same rows). */
  def publish(messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    messages.foreach {
      case WarcCommitMessage(tmp, fin) if tmp != null =>
        val fs = new Path(tmp).getFileSystem(conf)
        val finP = new Path(fin)
        if (fs.exists(finP)) fs.delete(finP, false)
        require(fs.rename(new Path(tmp), finP),
          s"warc sink: commit rename failed: $tmp -> $fin")
      case _ => // empty partition: nothing written, nothing to publish
    }
  }
  def discard(messages: Array[WriterCommitMessage]): Unit = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    messages.foreach {
      case WarcCommitMessage(tmp, _) if tmp != null =>
        val p = new Path(tmp)
        try p.getFileSystem(conf).delete(p, false)
        catch { case _: java.io.IOException => } // best-effort cleanup
      case _ =>
    }
  }
}

private[graft] case class WarcCommitMessage(tmpPath: String, finalPath: String)
    extends WriterCommitMessage

private[graft] class WarcWriterFactory(
    dir: String, gzip: Boolean,
    urlIx: Int, dateIx: Int, typeIx: Int, blockIx: Int,
    conf: SerializableConfiguration)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(dir, gzip, urlIx, dateIx, typeIx, blockIx,
      partitionId, taskId, None, conf.value)
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new WarcDataWriter(dir, gzip, urlIx, dateIx, typeIx, blockIx,
      partitionId, taskId, Some(epochId), conf.value)
}

private[graft] class WarcDataWriter(
    dir: String, gzip: Boolean,
    urlIx: Int, dateIx: Int, typeIx: Int, blockIx: Int,
    partitionId: Int, taskId: Long, epoch: Option[Long],
    conf: Configuration) extends DataWriter[InternalRow] {

  private val ext = if (gzip) ".warc.gz" else ".warc"
  // Batch: taskId in BOTH names — a speculative/retried attempt writes its
  // own temp AND its own visible name, so a late loser's rename can't
  // clobber the winner (only one attempt's messages reach driver commit).
  // Streaming: the visible name is (epoch, partition) WITHOUT the attempt —
  // an epoch replayed after restart re-publishes the same member
  // idempotently (publish() replaces; bytes identical by construction) —
  // while the temp keeps the attempt id so concurrent attempts never
  // collide mid-write.
  private val stem = epoch match {
    case Some(e) => f"part-e$e%05d-$partitionId%05d"
    case None => f"part-$partitionId%05d-$taskId"
  }
  private val tmpPath = new Path(dir, f".$stem-$taskId$ext.tmp")
  private val finalPath = new Path(dir, f"$stem$ext")
  private val fs = tmpPath.getFileSystem(conf)
  private var out: java.io.OutputStream = null
  private var nRecords = 0L
  private val crlf = "\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def ensureOpen(): Unit = if (out == null) {
    fs.mkdirs(new Path(dir))
    val raw = fs.create(tmpPath, false)
    out = if (gzip) new java.util.zip.GZIPOutputStream(raw, 64 * 1024)
      else new java.io.BufferedOutputStream(raw, 64 * 1024)
  }

  private def utf8(s: String) =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def write(row: InternalRow): Unit = {
    ensureOpen()
    val block =
      if (row.isNullAt(blockIx)) Array.emptyByteArray else row.getBinary(blockIx)
    def strAt(ix: Int): String =
      if (ix < 0 || row.isNullAt(ix)) null else row.getUTF8String(ix).toString
    val headers = new StringBuilder("WARC/1.0\r\n")
    // deterministic record id (md5 of position + url): re-running the same
    // job writes byte-identical members — the repo-wide reproducibility rule
    val idSeed = s"${partitionId}\u0001${nRecords}\u0001${Option(strAt(urlIx)).getOrElse("")}"
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(utf8(idSeed))
    val hex = md5.map(b => f"$b%02x").mkString
    headers.append(s"WARC-Record-ID: <urn:uuid:${hex.substring(0, 8)}-" +
      s"${hex.substring(8, 12)}-${hex.substring(12, 16)}-" +
      s"${hex.substring(16, 20)}-${hex.substring(20, 32)}>\r\n")
    Option(strAt(typeIx)).foreach(v => headers.append(s"WARC-Type: $v\r\n"))
    Option(strAt(urlIx)).foreach(v => headers.append(s"WARC-Target-URI: $v\r\n"))
    Option(strAt(dateIx)).foreach(v => headers.append(s"WARC-Date: $v\r\n"))
    headers.append(s"Content-Length: ${block.length}\r\n\r\n")
    out.write(utf8(headers.toString))
    out.write(block)
    out.write(crlf); out.write(crlf) // record trailer
    nRecords += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out == null) WarcCommitMessage(null, null) // empty partition: no file
    else { out.close(); out = null; WarcCommitMessage(tmpPath.toString, finalPath.toString) }
  }
  override def abort(): Unit = {
    if (out != null) { try out.close() catch { case _: java.io.IOException => }; out = null }
    try fs.delete(tmpPath, false) catch { case _: java.io.IOException => }
  }
  override def close(): Unit =
    if (out != null) { out.close(); out = null }
}

private[graft] case class WarcInputPartition(path: String) extends InputPartition

private[graft] class WarcReaderFactory(
    required: StructType,
    keepType: String,
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(
      partition.asInstanceOf[WarcInputPartition].path, required, keepType, conf.value)
}

private[graft] class WarcPartitionReader(
    path: String,
    required: StructType,
    keepType: String,
    conf: Configuration) extends PartitionReader[InternalRow] {

  private val hPath = new Path(path)
  private val in = hPath.getFileSystem(conf).open(hPath)
  private val wantBlock = required.fieldNames.contains("block")
  // lazy: parseWarcStream does I/O up front (gzip sniff + first record).
  // If that throws during READER CONSTRUCTION, Spark never registers the
  // close() hook and the stream above would leak; deferred to the first
  // next(), the failure lands where close() is guaranteed to run.
  private lazy val records =
    graft.sources.WarcSource.parseWarcStream(in, wantBlock, keepType)
  // pruned-schema projection: required field -> full-tuple position
  private val proj: Array[Int] =
    required.fieldNames.map(WarcDataSource.Schema.fieldIndex)
  private val pathUtf8 = UTF8String.fromString(hPath.toString)
  private var cur: (Long, String, String, String, Array[Byte]) = _

  override def next(): Boolean =
    if (records.hasNext) { cur = records.next(); true } else false

  override def get(): InternalRow = {
    val values = new Array[Any](proj.length)
    var i = 0
    while (i < proj.length) {
      values(i) = proj(i) match {
        case 0 => pathUtf8
        case 1 => cur._1
        case 2 => UTF8String.fromString(cur._2)
        case 3 => UTF8String.fromString(cur._3)
        case 4 => UTF8String.fromString(cur._4)
        case 5 => cur._5
      }
      i += 1
    }
    new GenericInternalRow(values)
  }

  override def close(): Unit = in.close()
}
