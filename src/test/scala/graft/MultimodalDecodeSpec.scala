package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.DocBlob

/** Real-decoder specs over synthesized media fixtures: the JDK's own
  * codecs (javax.imageio, javax.sound.sampled) make image/WAV decode
  * genuinely executable in this container — no external libraries. */
class MultimodalDecodeSpec extends SparkTestBase {
  import spark.implicits._

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def wavBytes(sampleRate: Float, nFrames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("decodeImages reads real PNG bytes: dimensions and luma") {
    val blobs = Seq(
      DocBlob(1L, pngBytes(8, 4, 0xffffff)), // white → luma 255
      DocBlob(2L, pngBytes(3, 5, 0x000000)), // black → luma 0
      DocBlob(3L, "not an image".getBytes)   // undecodable → dropped
    ).toDS()
    val metas = Multimodal.decodeImages(blobs).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas.keySet == Set(1L, 2L))
    assert(metas(1L).width == 8 && metas(1L).height == 4 && metas(1L).n_pixels == 32)
    assert(metas(1L).avg_luma == 255.0)
    assert(metas(2L).width == 3 && metas(2L).height == 5 && metas(2L).avg_luma == 0.0)
  }

  test("decodeAudio reads real WAV bytes: format and duration") {
    val blobs = Seq(
      DocBlob(1L, wavBytes(8000f, 4000)), // 0.5 s mono @ 8 kHz
      DocBlob(2L, "not audio".getBytes)   // undecodable → dropped
    ).toDS()
    val metas = Multimodal.decodeAudio(blobs).collect()
    assert(metas.length == 1)
    val m = metas.head
    assert(m.doc_id == 1L && m.sample_rate == 8000L && m.channels == 1L)
    assert(m.n_frames == 4000L && m.duration_ms == 500L)
  }

  private def jpegBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** A minimal MJPEG AVI: RIFF('AVI ') wrapping LIST('movi') with one
    * `00dc` chunk per JPEG frame (word-aligned) — the layout the RIFF spec
    * defines; no header list needed for demux. */
  private def aviBytes(frames: Seq[Array[Byte]]): Array[Byte] = {
    def u32(v: Int): Array[Byte] =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val chunks = frames.flatMap { f =>
      val pad = if (f.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      "00dc".getBytes("US-ASCII") ++ u32(f.length) ++ f ++ pad
    }.toArray
    val movi = "movi".getBytes("US-ASCII") ++ chunks
    val list = "LIST".getBytes("US-ASCII") ++ u32(movi.length) ++ movi
    val body = "AVI ".getBytes("US-ASCII") ++ list
    "RIFF".getBytes("US-ASCII") ++ u32(body.length) ++ body
  }

  test("resizeImages rescales real PNGs and re-encodes losslessly") {
    val blobs = Seq(
      DocBlob(1L, pngBytes(16, 16, 0xffffff)), // white stays white at any size
      DocBlob(2L, pngBytes(9, 3, 0x000000)),
      DocBlob(3L, "not an image".getBytes)
    ).toDS()
    val out = Multimodal.resizeImages(blobs, 4, 4).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out.values.forall(r => r.width == 4L && r.height == 4L))
    // solid colors survive bilinear scaling exactly
    assert(out(1L).avg_luma == 255.0 && out(2L).avg_luma == 0.0)
    // the emitted PNG bytes decode back to the reported dimensions
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).resized))
    assert(back.getWidth == 4 && back.getHeight == 4)
    assert((back.getRGB(0, 0) & 0xffffff) == 0xffffff)
  }

  test("demuxVideo walks a real AVI container and decodes each MJPEG frame") {
    // three 16×8 frames: white, black, mid-gray
    val avi = aviBytes(Seq(
      jpegBytes(16, 8, 0xffffff), jpegBytes(16, 8, 0x000000),
      jpegBytes(16, 8, 0x808080)))
    val blobs = Seq(
      DocBlob(1L, avi),
      DocBlob(2L, "not a video container".getBytes) // non-RIFF → no frames
    ).toDS()
    val frames = Multimodal.demuxVideo(blobs).collect().sortBy(_.frame_idx)
    assert(frames.forall(_.doc_id == 1L) && frames.length == 3)
    assert(frames.forall(f => f.width == 16L && f.height == 8L))
    // JPEG is lossy; solid-color frames decode within a few luma units
    assert(frames(0).frame_idx == 0L && frames(0).avg_luma > 250.0)
    assert(frames(1).avg_luma < 5.0)
    assert(frames(2).avg_luma > 100.0 && frames(2).avg_luma < 160.0)
  }

  test("aviVideoChunks ignores truncated trailing chunks and non-video ids") {
    val good = jpegBytes(4, 4, 0xffffff)
    val avi = aviBytes(Seq(good))
    // append a dangling chunk header claiming more bytes than exist
    val truncated = avi ++ "00dc".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, 0, 0) ++ Array[Byte](1, 2, 3)
    val chunks = Multimodal.aviVideoChunks(truncated)
    assert(chunks.length == 1 && chunks.head.sameElements(good))
  }

  test("aviVideoChunks survives crafted u32 sizes >= 2^31 (no hang, no throw)") {
    // ADVICE r4: a chunk size with the high bit set narrowed to Int becomes
    // negative — the offset could fail to advance (infinite loop on the
    // executor) or produce dataEnd < dataStart (copyOfRange throws). The
    // walk must stop on the malformed chunk and keep what it parsed before.
    val good = jpegBytes(4, 4, 0xffffff)
    def u32(v: Long): Array[Byte] = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val goodChunk = "00dc".getBytes("US-ASCII") ++ u32(good.length) ++ good ++
      (if (good.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    // size = 0xFFFFFFF8 → -8 as Int: old code looped forever at this offset
    val evil = "00db".getBytes("US-ASCII") ++ u32(0xFFFFFFF8L) ++
      Array[Byte](9, 9, 9, 9)
    val movi = "movi".getBytes("US-ASCII") ++ goodChunk ++ evil
    val list = "LIST".getBytes("US-ASCII") ++ u32(movi.length) ++ movi
    val body = "AVI ".getBytes("US-ASCII") ++ list
    val avi = "RIFF".getBytes("US-ASCII") ++ u32(body.length) ++ body
    val chunks = Multimodal.aviVideoChunks(avi)
    assert(chunks.length == 1 && chunks.head.sameElements(good))
  }

  // ---- perceptual image hashing --------------------------------------------

  /** Structured test image (JDK-synthesized, independent of the committed
    * fixture): gradients + integer-hash noise so the DCT spectrum has no
    * knife-edge median ties. */
  private def patternPng(w: Int, h: Int, salt: Int, jpeg: Boolean = false,
      inverted: Boolean = false): Array[Byte] = {
    def nz(x: Int, y: Int, s: Int): Int = {
      var v = x * 2654435761L + y * 40503L + s * 69069L
      v &= 0xffffffffL; v ^= v >> 13; v = (v * 1274126177L) & 0xffffffffL
      ((v >> 8) % 97).toInt
    }
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 3 + y + nz(x, y, salt)) % 256
      val g = (x + y * 2 + nz(x, y, salt + 1)) % 256
      val b = (x * 2 + y * 3 + nz(x, y, salt + 2)) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    // structure: a bright block — the low-frequency content pHash keys on.
    // `inverted` moves it and flips it dark: a perceptually DIFFERENT
    // image (a different noise salt alone is perceptually the SAME image
    // and correctly hashes equal — verified while writing this test)
    if (inverted)
      for (y <- 5 * h / 8 until 7 * h / 8; x <- 0 until 2 * w / 5)
        img.setRGB(x, y, 0x0a1410)
    else
      for (y <- h / 8 until 3 * h / 8; x <- w / 5 until 4 * w / 5)
        img.setRGB(x, y, 0xfaf0e6)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, if (jpeg) "jpg" else "png", out)
    out.toByteArray
  }

  private def hashOf(blobs: Seq[DocBlob]): Map[Long, (Long, Long)] =
    Multimodal.imageHashes(blobs.toDS()).collect()
      .map(h => h.doc_id -> ((java.lang.Long.parseUnsignedLong(h.phash, 16),
        java.lang.Long.parseUnsignedLong(h.dhash, 16)))).toMap

  test("imageHashes: re-encode (PNG→JPEG) and 2× resize stay near; " +
      "distinct images stay far; undecodable blobs drop") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = patternPng(64, 64, 1)
    // JPEG re-encode: LOSSY — pixels change slightly, hashes must not move
    // far (the property byte-level dedup lacks entirely)
    val jpeg = patternPng(64, 64, 1, jpeg = true)
    // independent JDK-side 2× box resize of the same pattern: render the
    // pattern at 32×32 via averaging the 64×64 pixels
    val img64 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    val small = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      var (r, g, b) = (0, 0, 0)
      for (dy <- 0 to 1; dx <- 0 to 1) {
        val p = img64.getRGB(2 * x + dx, 2 * y + dy)
        r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
      }
      small.setRGB(x, y, ((r / 4) << 16) | ((g / 4) << 8) | (b / 4))
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(small, "png", out)
    // 6: below the 32x32 hash grid — an empty box cell would NaN-poison
    // the DCT into an all-zero hash that false-clusters every tiny image,
    // so sub-grid frames must be SKIPPED, not hashed. 7: a recognized PNG
    // signature with a truncated body THROWS in ImageIO (null is only for
    // unrecognized formats) — one corrupt blob must cost one skipped row.
    val corrupt = base.take(base.length / 2)
    val hs = hashOf(Seq(DocBlob(1L, base), DocBlob(2L, jpeg),
      DocBlob(3L, out.toByteArray), DocBlob(4L, patternPng(64, 64, 77, inverted = true)),
      DocBlob(5L, "not an image".getBytes),
      DocBlob(6L, patternPng(20, 20, 1)), DocBlob(7L, corrupt)))
    assert(hs.keySet == Set(1L, 2L, 3L, 4L))
    assert(ham(hs(1L)._1, hs(2L)._1) <= Multimodal.PhashMaxHamming,
      s"JPEG re-encode drifted ${ham(hs(1L)._1, hs(2L)._1)} phash bits")
    assert(ham(hs(1L)._1, hs(3L)._1) <= Multimodal.PhashMaxHamming,
      s"2x resize drifted ${ham(hs(1L)._1, hs(3L)._1)} phash bits")
    assert(ham(hs(1L)._1, hs(4L)._1) > Multimodal.PhashMaxHamming,
      "distinct images must not collide")
    assert(ham(hs(1L)._2, hs(4L)._2) > Multimodal.PhashMaxHamming,
      "distinct images must not dhash-collide")
  }

  // ---- video near-dup --------------------------------------------------------

  test("videoNearDupPairs: the same frames re-encoded at a different JPEG " +
      "quality pair up fully; different and one-sided videos pair with " +
      "nothing") {
    def jpegOf(png: Array[Byte], quality: Float): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      w.setOutput(ios)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      w.dispose(); ios.close()
      out.toByteArray
    }
    // three STRUCTURALLY distinct frame styles (noise-salt variation alone
    // is perceptually the same frame and correctly matches): bright block,
    // dark inverted block, coarse checkerboard
    def stylePng(salt: Int, style: Int): Array[Byte] = {
      def nz(x: Int, y: Int, s: Int): Int = {
        var v = x * 2654435761L + y * 40503L + s * 69069L
        v &= 0xffffffffL; v ^= v >> 13; v = (v * 1274126177L) & 0xffffffffL
        ((v >> 8) % 97).toInt
      }
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val r = (x * 3 + y + nz(x, y, salt)) % 256
        val g = (x + y * 2 + nz(x, y, salt + 1)) % 256
        val b = (x * 2 + y * 3 + nz(x, y, salt + 2)) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      style match {
        case 0 => for (y <- 8 until 24; x <- 12 until 52)
          img.setRGB(x, y, 0xfaf0e6)
        case 1 => for (y <- 40 until 56; x <- 0 until 26)
          img.setRGB(x, y, 0x0a1410)
        case _ => for (y <- 0 until 64; x <- 0 until 64)
          if (((x / 16) + (y / 16)) % 2 == 0) img.setRGB(x, y, 0xc8c8c8)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    def vid(salts: Seq[Int], styles: Seq[Int], q: Float): Array[Byte] =
      aviBytes(salts.zip(styles).map { case (sa, st) =>
        jpegOf(stylePng(sa, st), q) })
    val vidA = vid(Seq(1, 21, 41), Seq(0, 1, 2), 0.9f)
    val vidB = vid(Seq(1, 21, 41), Seq(0, 1, 2), 0.5f) // re-encode: same scenes
    val vidC = vid(Seq(500, 520, 540), Seq(1, 1, 1), 0.9f) // one shared style
    // one-sided trap (review r12): a 6-frame static scene all matching
    // ONE of vidA's three structures — 6/6 coverage on D's side but only
    // 1/3 on A's, so the bidirectional threshold must exclude the pair
    val vidD = vid(Seq.fill(6)(1), Seq.fill(6)(0), 0.9f)
    val got = Multimodal.videoNearDupPairs(Seq(
      DocBlob(1L, vidA), DocBlob(2L, vidB), DocBlob(3L, vidC),
      DocBlob(4L, vidD)).toDS())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toList
    assert(got == List((1L, 2L, 3L, 3L)),
      s"expected exactly the re-encode pair with 3/3 frames both sides: $got")
    // and the frame-hash substrate carries all 15 decodable frames
    assert(Multimodal.videoFrameHashes(Seq(DocBlob(1L, vidA),
      DocBlob(2L, vidB), DocBlob(3L, vidC), DocBlob(4L, vidD)).toDS())
      .count() == 15)
  }

  // ---- raw-DIB AVI fixture (the committed driver-row corpus) ---------------

  test("video fixture: raw-DIB frames decode exactly; the top-down JUNK-" +
      "interleaved re-container (vid1) keeps every frame hash; streams " +
      "without a vids strf are skipped") {
    val hashes = Multimodal.videoPhash(spark, "ignored")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(hashes.size == 24, "4 videos x 6 frames must all decode")
    // re-container invariance: vid1 stores the SAME pixels top-down with
    // JUNK chunks between frames — every container byte differs, every
    // perceptual hash must not
    for (k <- 0L to 5L) assert(hashes((1L, k)) == hashes((0L, k)),
      s"frame $k hash changed under re-containering")
    // vid2 shares exactly frames 0-3 with vid0
    for (k <- 0L to 3L) assert(hashes((2L, k)) == hashes((0L, k)))
    assert(hashes((2L, 4L)) != hashes((0L, 4L)))
    // the pair rollup: full match at 10000 bp, 4-of-6 at 6666, vid3 absent
    val pairs = Multimodal.dedupVideo(spark, "ignored")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(6)).toMap
    assert(pairs == Map((0L, 1L) -> 10000L, (0L, 2L) -> 6666L,
      (1L, 2L) -> 6666L))
    // a ##db chunk on a NON-vids stream must be skipped, not mis-decoded:
    // a fake AVI with an 'auds' strl and a 00db chunk yields no frames
    def u32le(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def chunk(tag: String, data: Array[Byte]) =
      tag.getBytes("US-ASCII") ++ u32le(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val strh = "auds".getBytes("US-ASCII") ++ new Array[Byte](52)
    val strlBody = "strl".getBytes("US-ASCII") ++ chunk("strh", strh) ++
      chunk("strf", new Array[Byte](16))
    val strl = "LIST".getBytes("US-ASCII") ++ u32le(strlBody.length) ++ strlBody
    val hdrlBody = "hdrl".getBytes("US-ASCII") ++ strl
    val hdrl = "LIST".getBytes("US-ASCII") ++ u32le(hdrlBody.length) ++ hdrlBody
    val moviBody = "movi".getBytes("US-ASCII") ++
      chunk("00db", Array.fill[Byte](48)(7))
    val movi = "LIST".getBytes("US-ASCII") ++ u32le(moviBody.length) ++ moviBody
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ u32le(body.length) ++ body
    assert(Multimodal.aviVideoChunks(avi).isEmpty)
  }

  // ---- audio fingerprinting -------------------------------------------------

  test("audioFingerprints: amplitude halving and re-containering keep the " +
      "fingerprint; a different envelope moves it far; non-PCM16 drops") {
    def ham(a: String, b: String) =
      java.lang.Long.bitCount(java.lang.Long.parseUnsignedLong(a, 16) ^
        java.lang.Long.parseUnsignedLong(b, 16))
    // JDK-synthesized signal, independent of the committed fixture: a
    // seeded up/down amplitude ladder (adjacent segment energies ~6x apart)
    def signal(n: Int, seed: Int): Array[Int] = {
      val segs = Array.tabulate(66)(i => i * n / 65)
      val out = new Array[Int](n)
      var a = 900 + (seed * 997) % 2200
      for (i <- 0 until 65) {
        for (k <- segs(i) until segs(i + 1)) {
          val v = (if (k % 7 < 4) a else -a) + ((k * (seed + 3)) % 101) - 50
          out(k) = math.max(-32768, math.min(32767, v))
        }
        var h = (i.toLong * 2654435761L + seed * 40503L) & 0xffffffffL
        h ^= h >> 13
        val up = ((h >> 5) & 1) == 1
        val nu = if (a * 5 / 2 <= 26000) a * 5 / 2 else -1
        val nd = if (a * 2 / 5 >= 900) a * 2 / 5 else -1
        a = if (up && nu > 0) nu else if (!up && nd > 0) nd
            else if (nu > 0) nu else nd
      }
      out
    }
    def wav(samples: Array[Int]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val pcm = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        pcm(2 * i) = (samples(i) & 0xff).toByte
        pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      }
      val in = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(in,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val base = signal(6000, 2)
    // 5: a recognized RIFF header with a truncated body — the reader
    // throws IOException, which must cost one skipped row, not a job abort
    val truncated = wav(base).take(60)
    val fps = Multimodal.audioFingerprints(Seq(
      DocBlob(1L, wav(base)),
      DocBlob(2L, wav(base.map(_ / 2))),
      DocBlob(3L, wav(signal(6000, 11))),
      DocBlob(4L, "not audio at all".getBytes),
      DocBlob(5L, truncated)).toDS())
      .collect().map(f => f.doc_id -> f).toMap
    assert(!fps.contains(4L) && fps.keySet.subsetOf(Set(1L, 2L, 3L, 5L)))
    assert(Set(1L, 2L, 3L).subsetOf(fps.keySet))
    assert(fps(1L).n_frames == 6000L && fps(1L).sample_rate == 8000L)
    assert(fps(1L).fp == fps(2L).fp, "amplitude halving moved the fp")
    assert(ham(fps(1L).fp, fps(3L).fp) > Multimodal.AudioMaxHamming,
      "distinct envelopes must not collide")
  }

  test("dedup_audio pairs exactly the copy cluster of the committed " +
      "fixture (re-containered + amplitude-halved)") {
    val got = Multimodal.dedupAudio(spark, "ignored").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 1L, 0L), (0L, 2L, 0L), (1L, 2L, 0L)))
    assert(Multimodal.audioFingerprint(spark, "ignored").count() == 5)
  }

  test("dedup_image pairs exactly the copy/resize cluster of the " +
      "committed fixture") {
    val got = Multimodal.dedupImage(spark, "ignored").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 1L, 0L), (0L, 2L, 0L), (1L, 2L, 0L)))
    // and the full hash table carries all 5 fixture images
    assert(Multimodal.imagePhash(spark, "ignored").count() == 5)
  }
}
