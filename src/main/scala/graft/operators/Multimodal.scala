package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2 #26): media as opaque `binary`
  * columns with typed metadata extracted executor-side.
  *
  * The container has no image/audio codecs, so the decode step is a
  * deterministic STUB (dimensions derived from the content hash). What is
  * real — and what this operator demonstrates — is the Spark-side plumbing:
  * a typed `Dataset[DocBlob] → mapPartitions → Dataset[MediaMeta]` pipeline
  * with per-partition batch processing (the Scala analogue of a Pandas UDF
  * over mapInPandas), a fixed output schema, and no driver-side collect.
  * Swapping the stub for a real decoder changes only the closure body.
  */
object Multimodal {

  case class DocBlob(doc_id: Long, blob: Array[Byte])
  case class MediaMeta(doc_id: Long, byte_len: Long, fake_width: Long,
                       fake_height: Long, blob_md5: String)

  /** STUB decode: a real implementation would parse the media container
    * here; we derive deterministic "dimensions" from the md5 so the oracle
    * can verify the plumbing end-to-end. */
  def decodeStub(r: DocBlob): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(r.blob).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.take(15), 16)
    MediaMeta(r.doc_id, r.blob.length.toLong,
      1L + h % 1024L, 1L + (h >> 10) % 1024L, hex)
  }

  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      .as[DocBlob]
      .mapPartitions(_.map(decodeStub))
      .toDF()
  }

  // ---- REAL decoders (JDK codecs — no external libs) ---------------------
  // The synthetic driver tables carry no genuine media bytes, so these two
  // operators are exercised by specs over synthesized PNG/WAV fixtures
  // rather than oracle rows; the plumbing is identical to multimodalMeta
  // (typed Dataset → mapPartitions → fixed schema, executor-side only).

  case class ImageMeta(doc_id: Long, width: Long, height: Long,
                       n_pixels: Long, avg_luma: Double)

  /** (width, height, avg BT.601 luma rounded to 2dp) of a decoded image. */
  private def lumaOf(img: java.awt.image.BufferedImage): (Int, Int, Double) = {
    val (w, h) = (img.getWidth, img.getHeight)
    var luma = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        luma += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    (w, h, math.round(luma / (w.toLong * h) * 100) / 100.0)
  }

  /** Real image decode via javax.imageio (PNG/JPEG/BMP/GIF readers ship in
    * the JDK): dimensions + average ITU-R BT.601 luma. One decoder call per
    * blob, per partition, no driver involvement — the shape a 100 TB image
    * corpus runs with a native codec library swapped in. */
  def decodeImages(blobs: org.apache.spark.sql.Dataset[DocBlob]): org.apache.spark.sql.Dataset[ImageMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.blob))
      if (img == null) Iterator.empty // not an image this JDK can decode
      else {
        val (w, h, avg) = lumaOf(img)
        Iterator.single(ImageMeta(r.doc_id, w.toLong, h.toLong,
          w.toLong * h, avg))
      }
    })
  }

  case class ResizedImage(doc_id: Long, width: Long, height: Long,
                          resized: Array[Byte], avg_luma: Double)

  /** Real image RESIZE, executor-side: decode (JDK reader), scale to
    * targetW×targetH (bilinear Graphics2D — deterministic for a given JDK),
    * re-encode as PNG (lossless, so the emitted bytes round-trip exactly),
    * and report the resized frame's luma. This is the normalize-resolution
    * step an image-training pipeline runs between decode and feature
    * extraction; same typed mapPartitions plumbing as the other decoders —
    * at 100 TB it is one map-only pass rewriting the blob column. */
  def resizeImages(blobs: org.apache.spark.sql.Dataset[DocBlob],
      targetW: Int, targetH: Int): org.apache.spark.sql.Dataset[ResizedImage] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap { r =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.blob))
      if (img == null) Iterator.empty
      else {
        val out = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, targetW, targetH, null)
        g.dispose()
        val bytes = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bytes)
        val (_, _, avg) = lumaOf(out)
        Iterator.single(ResizedImage(r.doc_id, targetW.toLong, targetH.toLong,
          bytes.toByteArray, avg))
      }
    })
  }

  // ---- REAL video demux: MJPEG-in-AVI -------------------------------------
  case class VideoFrame(doc_id: Long, frame_idx: Long, width: Long,
                        height: Long, avg_luma: Double)

  /** The video stream chunks of an AVI container: a RIFF walk (32-bit LE
    * sizes, word-aligned chunks, LISTs recursed) collecting `##dc`/`##db`
    * payloads in stream order. Pure byte-format parsing — the AVI RIFF
    * layout is a public spec and needs no codec. */
  private[graft] def aviVideoChunks(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def fourcc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def walk(start: Int, end: Int): Unit = {
      var off = start
      var ok = true
      while (ok && off + 8 <= end) {
        val id = fourcc(off)
        // size stays a Long: a crafted u32 ≥ 2^31 narrowed to Int would go
        // negative, making the offset fail to advance (executor-hanging
        // infinite loop) or dataEnd < dataStart (copyOfRange throws).
        // Such sizes can never be honest in a byte[]-bounded blob, so the
        // walk stops at the malformed chunk instead (ADVICE r4).
        val size = u32(off + 4)
        if (size >= Int.MaxValue.toLong) ok = false
        else {
          val dataStart = off + 8
          val dataEnd = math.min(dataStart.toLong + size, end.toLong).toInt
          if (id == "LIST" && dataEnd >= dataStart + 4)
            walk(dataStart + 4, dataEnd) // skip the list-type fourcc
          else if (id.matches("\\d\\d(dc|db)"))
            out += java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          val next = dataStart.toLong + size + (size & 1L) // word-aligned
          // stop unless next strictly advances AND stays within bounds:
          // min(next, end+8).toInt could wrap negative for an end within
          // 8 bytes of Int.MaxValue (a ~2 GB blob), re-entering the loop
          // with a negative offset (ADVICE r5)
          if (next <= off || next > end.toLong) ok = false
          else off = next.toInt
        }
      }
    }
    if (bytes.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ")
      walk(12, math.min(12L + u32(4) - 4, bytes.length.toLong).toInt)
    out.toSeq
  }

  /** Real video demux + per-frame decode for MJPEG AVI (each `##dc` chunk
    * is a complete JPEG, decoded by the JDK's reader): one row per frame
    * with dimensions and average luma — the genuine one-to-many decode
    * `multimodalFrames` stubs for codec-bearing formats. Same plumbing:
    * typed flatMap, executor-side, fixed schema. */
  def demuxVideo(blobs: org.apache.spark.sql.Dataset[DocBlob]): org.apache.spark.sql.Dataset[VideoFrame] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap { r =>
      aviVideoChunks(r.blob).iterator.zipWithIndex.flatMap { case (chunk, i) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(chunk))
        if (img == null) Iterator.empty
        else {
          val (w, h, avg) = lumaOf(img)
          Iterator.single(VideoFrame(r.doc_id, i.toLong, w.toLong, h.toLong, avg))
        }
      }
    })
  }

  case class AudioMeta(doc_id: Long, sample_rate: Long, channels: Long,
                       n_frames: Long, duration_ms: Long)

  /** Real audio container parse via javax.sound.sampled (WAV/AIFF/AU ship
    * in the JDK): format + frame count + duration. */
  def decodeAudio(blobs: org.apache.spark.sql.Dataset[DocBlob]): org.apache.spark.sql.Dataset[AudioMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap { r =>
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.blob))
        val fmt = in.getFormat
        val frames = in.getFrameLength
        in.close()
        Iterator.single(AudioMeta(r.doc_id, fmt.getSampleRate.toLong,
          fmt.getChannels.toLong, frames,
          (frames * 1000.0 / fmt.getSampleRate).toLong))
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => Iterator.empty
      }
    })
  }

  case class Frame(doc_id: Long, frame_idx: Long, frame_off: Long, frame_md5: String)

  /** Frame sampling: the one-to-many decode shape (video → frames, audio →
    * windows). The STUB samples a fixed-stride byte window per frame; a real
    * decoder would demux the container instead. The plumbing — typed
    * flatMap, per-doc fan-out, fixed schema, executor-side only — is real. */
  val FrameStride = 64
  val FrameLen = 32
  def frameSample(r: DocBlob): Iterator[Frame] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = r.blob.length
    // floorDiv so blobs shorter than a frame yield 0 frames (matches the
    // oracle's `//` floor division)
    Iterator.range(0, math.max(Math.floorDiv(n - FrameLen, FrameStride) + 1, 0)).map { i =>
      val off = i * FrameStride
      val hex = md.digest(r.blob.slice(off, off + FrameLen))
        .map("%02x".format(_)).mkString
      Frame(r.doc_id, i.toLong, off.toLong, hex)
    }
  }

  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // The oracle frames by CHARACTER positions (substr on text) while this
    // side slices UTF-8 BYTES of the encoded blob — identical only when
    // every doc is pure ASCII (one byte per char). That assumption is
    // ENFORCED here, not assumed (ADVICE r3): a non-ASCII doc fails the
    // query loudly instead of silently producing divergent frame hashes.
    // (DuckDB v1.0.0 has no BLOB substring/md5, so the oracle cannot be
    // switched to byte slicing instead.)
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(octet_length(col("text")) === length(col("text")),
          encode(col("text"), "UTF-8"))
          .otherwise(raise_error(concat(
            lit("multimodal_frames: non-ASCII text in doc_id="), col("doc_id"),
            lit(" — byte-offset frames would diverge from character-offset oracle"))))
          .as("blob"))
      .as[DocBlob]
      .mapPartitions(_.flatMap(frameSample))
      .toDF()
  }
  /** Oracle twin (character offsets; ASCII equality enforced engine-side). */
  val multimodalFramesSql: String =
    s"""SELECT doc_id, g.i AS frame_idx, g.i * $FrameStride AS frame_off,
       |  md5(substr(text, CAST(g.i * $FrameStride + 1 AS INTEGER), $FrameLen)) AS frame_md5
       |FROM documents,
       |  unnest(range(0, greatest((length(text) - $FrameLen) // $FrameStride + 1, 0))) AS g(i)
       |WHERE length(text) >= 1""".stripMargin
  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  1 + CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 1024 AS fake_width,
      |  1 + (CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) >> 10) % 1024 AS fake_height,
      |  md5(text) AS blob_md5
      |FROM documents""".stripMargin
}
