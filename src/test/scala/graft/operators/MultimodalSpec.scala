package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("media_id", "content")

  test("decode stub parses dimensions from the fake header") {
    val df = mediaDf(
      1L -> Multimodal.fakeImageBytes(640, 480, "xyz".getBytes),
      2L -> "not an image".getBytes)
    val out = Multimodal.decodeImages(df).collect()
      .map(d => d.mediaId -> ((d.width, d.height))).toMap
    assert(out(1L) == (640, 480))
    assert(out(2L) == (-1, -1)) // undecodable marked, not dropped
  }

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("real PNG bytes decode to true dimensions via ImageIO") {
    val df = mediaDf(1L -> pngBytes(17, 9), 2L -> pngBytes(3, 300))
    val out = Multimodal.decodeImages(df).collect()
      .map(d => d.mediaId -> ((d.width, d.height))).toMap
    assert(out(1L) == (17, 9))
    assert(out(2L) == (3, 300))
  }

  test("real PNG resize re-encodes a scaled bitmap") {
    val resized = Multimodal.resizeImage(pngBytes(64, 48), 16, 12)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized))
    assert(img.getWidth == 16 && img.getHeight == 12)
  }

  test("byte histogram features are L1-normalized with stable schema") {
    val df = mediaDf(1L -> Array.tabulate[Byte](256)(_.toByte))
    val row = Multimodal.byteHistogramFeatures(df).head()
    val feats = row.getSeq[Float](1)
    assert(feats.length == 16)
    assert(math.abs(feats.sum - 1.0f) < 1e-5) // uniform bytes → 1/16 each
    assert(feats.forall(f => math.abs(f - 1f / 16) < 1e-5))
    // schema matches the embeddings table convention
    val schema = Multimodal.byteHistogramFeatures(df).schema
    assert(schema("features").dataType.simpleString == "array<float>")
  }

  test("resize stub rewrites header and bounds payload") {
    val resized = Multimodal.resizeImage(
      Multimodal.fakeImageBytes(640, 480, ("p" * 100).getBytes), 4, 5)
    val s = new String(resized, "UTF-8").split("\\|", 4)
    assert(s(1) == "4" && s(2) == "5")
    assert(s(3).length == 20) // w*h payload bound
  }

  test("frame sampling keeps every Nth chunk with ordinals") {
    val df = mediaDf(7L -> (0 until 32).map(_.toByte).toArray)
    val frames = Multimodal.sampleFrames(df, frameBytes = 8, everyN = 2)
      .orderBy("frame_ordinal").collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 8))
  }

  test("null content yields defined rows, not executor NPEs") {
    val df = mediaDf(1L -> null, 2L -> "abcdefgh".getBytes)
    val hist = Multimodal.byteHistogramFeatures(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(hist(1L).forall(_ == 0f)) // zero histogram, row present
    assert(hist(2L).sum > 0f)
    val frames = Multimodal.sampleFrames(df)
    assert(frames.filter(col("media_id") === 1L).count() == 0) // no frames
    assert(frames.filter(col("media_id") === 2L).count() > 0)
  }

  test("aHash recovers a planted 63-bit tile pattern through PNG round-trip") {
    def tileImage(bits: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var t = 0
      while (t < 64) {
        val v = if (t < 63 && ((bits >> t) & 1L) == 1L) 0xffffff else 0
        val tx = (t % 8) * 2; val ty = (t / 8) * 2
        for (dx <- 0 to 1; dy <- 0 to 1) img.setRGB(tx + dx, ty + dy, v)
        t += 1
      }
      Multimodal.pngBytes(img)
    }
    val planted = 0x3a5c96f012345abcL & ((1L << 63) - 1)
    assert(Multimodal.aHash64(tileImage(planted)) == planted)
    assert(Multimodal.aHash64(tileImage(0L)) == 0L)
    assert(Multimodal.aHash64("not an image".getBytes) == -1L)
    assert(Multimodal.aHash64(null) == -1L)

    // pair detection: identical, 2-bit-flipped, and a far hash
    val flipped = planted ^ (1L << 5) ^ (1L << 20)
    val far = ~planted & ((1L << 63) - 1)
    val media = mediaDf(1L -> tileImage(planted), 2L -> tileImage(planted),
      3L -> tileImage(flipped), 4L -> tileImage(far))
    val pairs = Multimodal.aHashDedupPairs(media, maxHamming = 3)
      .orderBy("media_a", "media_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs == Seq((1L, 2L, 0), (1L, 3L, 2), (2L, 3L, 2)))

    // band join is an equi-join, never a cartesian pass
    val plan = Multimodal.aHashDedupPairs(media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("WAV round-trip: real encode + decode recover format and stats") {
    // stereo ramp: samples -100..99 interleaved over 100 frames
    val samples = Array.tabulate[Short](200)(i => (i - 100).toShort)
    val wav = Multimodal.wavBytes(12000, 2, samples)
    // RIFF/WAVE container actually written, not a fake header
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val out = Multimodal.decodeAudio(
      mediaDf(1L -> wav, 2L -> "not audio".getBytes, 3L -> null)).collect()
      .map(d => d.mediaId -> d).toMap
    val a = out(1L)
    assert(a.sampleRate == 12000 && a.channels == 2 &&
           a.bitsPerSample == 16 && a.nFrames == 100)
    assert(a.peak == 100) // max |i - 100| over 0..199
    val expectedRms = math.sqrt(
      (0 until 200).map(i => math.pow(i - 100, 2)).sum / 200)
    assert(math.abs(a.rms - expectedRms) < 1e-5, a.rms)
    assert(out(2L).sampleRate == -1 && out(3L).sampleRate == -1) // degrade
  }

  test("audio window sampling cuts real PCM windows, partial tail kept") {
    // mono, 80 frames, window 32 → windows of 32/32/16; everyN=2 keeps
    // ordinals 0 and 2 (the partial tail)
    val samples = Array.tabulate[Short](80)(i => (i + 1).toShort)
    val wav = Multimodal.wavBytes(8000, 1, samples)
    val wins = Multimodal.sampleAudioWindows(
        mediaDf(5L -> wav), windowFrames = 32, everyN = 2)
      .orderBy("window_ordinal").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(wins.toSeq == Seq((0L, 32L, 32), (2L, 16L, 80)))
  }

  test("animated GIF round-trip: real frames, exact gray levels, everyN") {
    // 5 solid-gray frames (height ≥ 5: the JDK GIF reader zeroes the
    // last row of shorter images); everyN=2 keeps ordinals 0, 2, 4 with
    // exact levels — the indexed gray palette survives losslessly
    val gif = Multimodal.gifBytes(
      (0 until 5).map(f => Multimodal.grayFrame(7, 6, 40 * f + 3)))
    val rows = Multimodal.sampleGifFrames(mediaDf(9L -> gif), everyN = 2)
      .orderBy("frame_ordinal").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      (0, 7, 6, 3.0), (2, 7, 6, 83.0), (4, 7, 6, 163.0)))
  }

  test("direct GIF89a encoder matches the JDK writer pixel-for-pixel") {
    // the fast encoder replaced ImageIO on the generator path; this is
    // the cross-validation contract from its scaladoc: decoding either
    // container yields identical frames, over levels incl. 0/255,
    // frame counts incl. 1, dims incl. the h=5 reader-quirk floor and
    // a frame big enough to force LZW clears + multiple sub-blocks
    def decodeAll(bytes: Array[Byte]): Seq[Seq[Int]] = {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      assert(readers.hasNext, "no reader accepted the payload")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        (0 until reader.getNumImages(true)).map { i =>
          val img = reader.read(i)
          (for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
            yield img.getRGB(x, y)).toSeq
        }
      } finally reader.dispose()
    }
    val cases = Seq(
      Seq(Multimodal.grayFrame(7, 5, 0)),
      Seq(Multimodal.grayFrame(6, 5, 255), Multimodal.grayFrame(6, 5, 1)),
      (0 until 4).map(f => Multimodal.grayFrame(9, 6, 40 * f + 3)),
      Seq(Multimodal.grayFrame(40, 20, 128))) // 800 px > 250-code clears
    cases.foreach { frames =>
      val ours = decodeAll(Multimodal.gifBytes(frames))
      val jdk = decodeAll(Multimodal.gifBytesJdk(frames))
      assert(ours == jdk, s"${frames.length} frames "
        + s"${frames.head.getWidth}x${frames.head.getHeight}")
    }
  }

  test("GIF89a encoder rejects mixed dimensions, palettes, non-indexed") {
    val a = Multimodal.grayFrame(6, 5, 10)
    intercept[IllegalArgumentException] {
      Multimodal.gifBytes(Seq(a, Multimodal.grayFrame(7, 5, 10)))
    }
    intercept[IllegalArgumentException] {
      Multimodal.gifBytes(Seq(
        new java.awt.image.BufferedImage(6, 5,
          java.awt.image.BufferedImage.TYPE_INT_RGB)))
    }
    // differing palette values
    val grays = Array.tabulate[Byte](256)(i => i.toByte)
    val shifted = Array.tabulate[Byte](256)(i => (i ^ 1).toByte)
    val cm2 = new java.awt.image.IndexColorModel(8, 256, shifted, grays, grays)
    val b = new java.awt.image.BufferedImage(6, 5,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm2)
    intercept[IllegalArgumentException] { Multimodal.gifBytes(Seq(a, b)) }
  }

  test("GIF frame sampling: undecodable and null content yield no rows") {
    val out = Multimodal.sampleGifFrames(mediaDf(
      1L -> "definitely not a gif".getBytes,
      2L -> null.asInstanceOf[Array[Byte]]))
    assert(out.count() == 0)
  }

  test("single-frame PNG through the frame sampler emits one frame") {
    val rows = Multimodal.sampleGifFrames(mediaDf(3L -> pngBytes(5, 6)),
        everyN = 3).collect()
    assert(rows.length == 1 && rows(0).getInt(2) == 5 && rows(0).getInt(3) == 6)
  }

  test("AVI/MJPEG round-trip: RIFF walk finds every frame, means exact") {
    // solid gray survives the lossy JPEG codec exactly (pure-DC blocks;
    // measured over all 256 levels — see rgbFrame scaladoc)
    val avi = Multimodal.aviMjpegBytes(
      (0 until 5).map(f => Multimodal.rgbFrame(9, 7, 50 * f + 2)))
    assert(Multimodal.aviMjpegFrames(avi).length == 5)
    val rows = Multimodal.sampleAviFrames(mediaDf(4L -> avi), everyN = 2)
      .orderBy("frame_ordinal").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      (0, 9, 7, 2.0), (2, 9, 7, 102.0), (4, 9, 7, 202.0)))
  }

  test("JPEG pure-DC exactness holds for EVERY level × generator dim") {
    // the mm_video_avi oracle pins decoded means bit-exactly through
    // the lossy codec; that is a JDK-codec property, so this guards it
    // over the full surface the query generates (256 levels × dims
    // 6..11 × 6..9) — a JDK whose JPEG plugin quantizes differently
    // fails HERE, not silently at the bench
    for (v <- 0 until 256; w <- 6 to 11; h <- 6 to 9) {
      val img = Multimodal.rgbFrame(w, h, v)
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.jpegBytes(img)))
      // EVERY pixel (the GIF reader's zeroed-last-row quirk proved
      // decoders can corrupt regions, which a spot pixel would miss)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = back.getRGB(x, y)
        assert(((rgb >> 16) & 0xff) == v && ((rgb >> 8) & 0xff) == v &&
               (rgb & 0xff) == v, s"level $v dims ${w}x$h pixel ($x,$y)")
      }
    }
  }

  test("AVI parser: non-AVI, truncated, and null payloads are safe") {
    assert(Multimodal.aviMjpegFrames("not riff at all".getBytes).isEmpty)
    assert(Multimodal.aviMjpegFrames(Array[Byte](1, 2, 3)).isEmpty)
    val avi = Multimodal.aviMjpegBytes(Seq(Multimodal.rgbFrame(8, 6, 77)))
    // truncating mid-frame loses that frame but never throws
    val truncated = java.util.Arrays.copyOfRange(avi, 0, avi.length - 10)
    assert(Multimodal.aviMjpegFrames(truncated).isEmpty)
    assert(Multimodal.sampleAviFrames(mediaDf(
      1L -> "x".getBytes, 2L -> null.asInstanceOf[Array[Byte]])).count() == 0)
    // hostile size fields (u32 ≥ 2^31, zero) must terminate, not loop
    val hostile = "RIFF".getBytes ++ Array[Byte](-1, -1, -1, -1) ++
      "AVI LIST".getBytes ++ Array[Byte](-1, -1, -1, 127) ++
      "movi00dc".getBytes ++ Array[Byte](0, 0, 0, 0) ++
      "00db".getBytes ++ Array[Byte](-1, -1, -1, -1) ++ new Array[Byte](16)
    assert(Multimodal.aviMjpegFrames(hostile).isEmpty)
  }

  test("MP4 box walk: two-track round-trip recovers every declared " +
       "quantity; malformed sizes terminate") {
    val bytes = Multimodal.mp4Bytes(1000L, 600L, Seq(
      ("vide", "avc1", 3000L, 100L, Seq(50, 60, 70), 64, 48),
      ("soun", "mp4a", 8000L, 1024L, Seq(20, 21), 0, 0)))
    val (brand, mts, mdur, tracks) = Multimodal.mp4Meta(bytes)
    assert(brand == "isom" && mts == 1000L && mdur == 600L)
    assert(tracks == Seq(
      Multimodal.Mp4Track("vide", "avc1", 3000L, 300L, 3L, 180L, 64, 48),
      Multimodal.Mp4Track("soun", "mp4a", 8000L, 2048L, 2L, 41L, 0, 0)))
    // truncation mid-moov: the walk stops at the region edge — no
    // exception, no read past the buffer
    val truncated = java.util.Arrays.copyOfRange(bytes, 0, 60)
    Multimodal.mp4Meta(truncated): Unit
    // hostile size fields (0 and > buffer) terminate the walk
    val hostile = Array.concat(
      Array[Byte](0, 0, 0, 0), "free".getBytes("US-ASCII"),
      Array[Byte](-1, -1, -1, -1), "moov".getBytes("US-ASCII"))
    assert(Multimodal.mp4Meta(hostile)._4.isEmpty)
  }

  test("MP4 version-1 full boxes: 64-bit mvhd/mdhd layouts parse to " +
       "the same declarations as v0") {
    // durations past the u32 range — the reason real long files use v1
    val mdur = 5000000000L
    val tracks = Seq(
      ("vide", "hvc1", 90000L, 3000L, Seq(10, 20, 30, 40), 3840, 2160),
      ("soun", "mp4a", 48000L, 1024L, Seq(7, 8), 0, 0))
    val v1 = Multimodal.mp4Meta(
      Multimodal.mp4Bytes(600L, mdur, tracks, version1 = true))
    assert(v1._1 == "isom" && v1._2 == 600L && v1._3 == mdur)
    // everything below mvhd/mdhd is version-independent: the v1 parse
    // must equal the v0 parse of the same declarations (modulo the
    // u32-truncated movie duration v0 cannot carry)
    val v0 = Multimodal.mp4Meta(Multimodal.mp4Bytes(600L, 599L, tracks))
    assert(v1._4 == v0._4)
    assert(v1._4.head.timescale == 90000L &&
      v1._4.head.durationTicks == 12000L)
  }

  test("MP4 demux: stco/stsc/stsz algebra recovers every sample's " +
       "exact bytes across tracks; hostile offsets never read out") {
    // two tracks with per-sample sizes: the payload is the tracks'
    // samples concatenated in track order
    val v = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5),
      Array[Byte](6, 7, 8, 9))
    val a = Seq(Array[Byte](10), Array[Byte](11, 12))
    val payload = Array.concat((v ++ a): _*)
    val bytes = Multimodal.mp4Bytes(1000L, 300L, Seq(
      ("vide", "raw ", 1000L, 100L, v.map(_.length), 1, 1),
      ("soun", "mp4a", 8000L, 1024L, a.map(_.length), 0, 0)),
      payload = Some(payload))
    val tracks = Multimodal.mp4Samples(bytes)
    assert(tracks.length == 2)
    assert(tracks(0).handler == "vide" && tracks(0).codec == "raw ")
    assert(tracks(0).samples.map(_.toSeq) == v.map(_.toSeq))
    assert(tracks(1).handler == "soun")
    assert(tracks(1).samples.map(_.toSeq) == a.map(_.toSeq))
    // a payload that disagrees with the declared sizes is a loud error
    intercept[IllegalArgumentException](Multimodal.mp4Bytes(1000L, 300L,
      Seq(("vide", "raw ", 1000L, 100L, Seq(5), 1, 1)),
      payload = Some(Array[Byte](1, 2))))
    // hostile stco (offset past the buffer) aborts that track's
    // extraction without reading out of bounds
    val hostile = bytes.clone()
    // find the first stco payload (offset field lives 8 bytes into
    // its body) and poison it
    val idx = {
      val pat = "stco".getBytes("US-ASCII")
      (0 until hostile.length - 4).find(i =>
        pat.indices.forall(j => hostile(i + j) == pat(j))).get
    }
    hostile(idx + 12) = 0x7f.toByte // first offset byte -> huge
    val tr = Multimodal.mp4Samples(hostile)
    assert(tr.head.samples.isEmpty,
      "a poisoned chunk offset must yield no samples, not a crash")
  }

  test("MP4 demux: forged table entry counts (stsz/stsc/stco) abort " +
       "the track before allocating — no OOM, no out-of-box reads") {
    val v = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5))
    val clean = Multimodal.mp4Bytes(1000L, 300L, Seq(
      ("vide", "raw ", 1000L, 100L, v.map(_.length), 1, 1)),
      payload = Some(Array.concat(v: _*)))
    def find(pat: String): Int = {
      val p = pat.getBytes("US-ASCII")
      (0 until clean.length - 4).find(i =>
        p.indices.forall(j => clean(i + j) == p(j))).get
    }
    // each table's declared count lives 12 bytes past its fourcc for
    // stsc/stco (version+count) and for stsz (version+uniform+count)
    for ((tbl, countOff) <- Seq(("stsz", 12), ("stsc", 8),
                                ("stco", 8))) {
      val forged = clean.clone()
      val at = find(tbl) + 4 + countOff
      forged(at) = 0x7f.toByte; forged(at + 1) = 0xff.toByte
      forged(at + 2) = 0xff.toByte; forged(at + 3) = 0xff.toByte
      val tr = Multimodal.mp4Samples(forged)
      assert(tr.head.samples.isEmpty,
        s"a forged $tbl count (2^31-1) must abort the track, " +
          "not allocate a multi-GB array or read past the box")
    }
    // uniform stsz: count capped by what n*uniform bytes the FILE can
    // hold, since the box itself carries no per-entry data
    def be32(x: Long): Array[Byte] = Array(
      ((x >> 24) & 0xff).toByte, ((x >> 16) & 0xff).toByte,
      ((x >> 8) & 0xff).toByte, (x & 0xff).toByte)
    def box(typ: String, body: Array[Byte]*): Array[Byte] = {
      val p = Array.concat(body: _*)
      Array.concat(be32(p.length + 8L), typ.getBytes("US-ASCII"), p)
    }
    val entryBody = new Array[Byte](78); entryBody(7) = 1
    val hdlr = box("hdlr", be32(0L), be32(0L),
      "vide".getBytes("US-ASCII"), new Array[Byte](12),
      "vide".getBytes("US-ASCII"), Array[Byte](0))
    val uniformForged = box("moov", box("trak", box("mdia", hdlr,
      box("minf", box("stbl",
        box("stsd", be32(0L), be32(1L), box("raw ", entryBody)),
        box("stsz", be32(0L), be32(3L), be32(0x40000000L)),
        box("stsc", be32(0L), be32(1L), be32(1L), be32(1L), be32(1L)),
        box("stco", be32(0L), be32(1L), be32(0L)))))))
    assert(Multimodal.mp4Samples(uniformForged).head.samples.isEmpty,
      "a uniform stsz whose count*size exceeds the file must abort")
  }

  test("MP4 PCM decode: sowt and twos byte orders yield identical " +
       "stats, equal to the WAV path on the same samples; a container " +
       "with only compressed audio degrades to the sentinel") {
    val channels = 2
    val samples = Array.tabulate[Short](120 * channels)(i =>
      ((i.toLong * 7919) % 65536 - 32768).toShort)
    def mp4For(codec: String): Array[Byte] = {
      val le = codec == "sowt"
      val pcm = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        val v = samples(i)
        if (le) {
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        } else {
          pcm(2 * i) = ((v >> 8) & 0xff).toByte
          pcm(2 * i + 1) = (v & 0xff).toByte
        }
      }
      // three frame-aligned sample runs so the demux walks real table
      // entries; (w, h) slots carry (channels, bits) for soun tracks
      val third = samples.length / channels / 3 * channels * 2
      Multimodal.mp4Bytes(1000L, 120L, Seq(
        ("soun", codec, 8000L, 1L,
          Seq(third, third, pcm.length - 2 * third), channels, 16)),
        payload = Some(pcm))
    }
    val media = Seq(
      (1L, mp4For("sowt")), (2L, mp4For("twos")),
      (3L, Multimodal.mp4Bytes(1000L, 120L, Seq(
        ("soun", "mp4a", 8000L, 1024L, Seq(40, 40), 2, 16))))
    ).toDF("media_id", "content")
    val got = Multimodal.decodeMp4PcmAudio(media).collect()
      .map(a => a.mediaId -> a).toMap
    val wav = Multimodal.decodeAudio(
        Seq((9L, Multimodal.wavBytes(8000, channels, samples)))
          .toDF("media_id", "content"))
      .collect().head
    for (id <- Seq(1L, 2L)) {
      val a = got(id)
      assert((a.sampleRate, a.channels, a.bitsPerSample, a.nFrames,
        a.peak, a.rms) ==
        (wav.sampleRate, wav.channels, wav.bitsPerSample, wav.nFrames,
          wav.peak, wav.rms),
        s"MP4 PCM ($id) must decode byte-order-correct and equal the " +
          s"WAV path: $a vs $wav")
    }
    assert(got(3L).sampleRate == -1,
      "compressed-only audio stays the declared stub (sentinel row)")
  }

  test("MP4 demux: multi-entry stsc (chunk runs with different " +
       "samples-per-chunk) resolves every sample span") {
    // Hand-assembled box tree — the generator only writes the
    // single-chunk shape, so the stsc run algebra needs its own
    // fixture: 3 chunks, entries [(first=1, perChunk=2), (first=3,
    // perChunk=1)] -> chunks 1,2 carry 2 samples each, chunk 3 one;
    // 5 samples with distinct per-sample sizes, chunks deliberately
    // laid out OUT OF ORDER in the payload region.
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, body: Array[Byte]*): Array[Byte] = {
      val p = Array.concat(body: _*)
      Array.concat(be32(p.length + 8L), typ.getBytes("US-ASCII"), p)
    }
    val samples = Seq(
      Array[Byte](1), Array[Byte](2, 2), Array[Byte](3, 3, 3),
      Array[Byte](4, 4, 4, 4), Array[Byte](5, 5, 5, 5, 5))
    // chunk 1 = samples 0,1; chunk 2 = samples 2,3; chunk 3 = sample 4
    val c1 = Array.concat(samples(0), samples(1))
    val c2 = Array.concat(samples(2), samples(3))
    val c3 = samples(4)
    val entryBody = new Array[Byte](78); entryBody(7) = 1
    val stsd = box("stsd", be32(0L), be32(1L), box("raw ", entryBody))
    val stsz = box("stsz", be32(0L), be32(0L), be32(5L),
      Array.concat(samples.map(s => be32(s.length.toLong)): _*))
    val stsc = box("stsc", be32(0L), be32(2L),
      be32(1L), be32(2L), be32(1L),   // chunks 1.. : 2 samples
      be32(3L), be32(1L), be32(1L))   // chunks 3.. : 1 sample
    val hdlr = box("hdlr", be32(0L), be32(0L),
      "vide".getBytes("US-ASCII"), new Array[Byte](12),
      "vide".getBytes("US-ASCII"), Array[Byte](0))
    def assemble(offs: (Long, Long, Long),
                 payload: Array[Byte]): Array[Byte] = {
      val stco = box("stco", be32(0L), be32(3L),
        be32(offs._1), be32(offs._2), be32(offs._3))
      box("moov", box("trak", box("mdia", hdlr,
        box("minf", box("stbl", stsd, stsz, stsc, stco))))) ++ payload
    }
    // measure the moov once (stco values are fixed-width)
    val probe = assemble((0L, 0L, 0L), Array.emptyByteArray)
    val base = probe.length.toLong
    // payload laid out c3 | c1 | c2 — offsets must be honored, not
    // assumed sequential
    val bytes = assemble(
      (base + c3.length, base + c3.length + c1.length, base),
      Array.concat(c3, c1, c2))
    val tracks = Multimodal.mp4Samples(bytes)
    assert(tracks.length == 1)
    assert(tracks.head.codec == "raw ")
    assert(tracks.head.samples.map(_.toSeq) == samples.map(_.toSeq),
      s"stsc run algebra must recover all 5 samples in order: " +
        s"${tracks.head.samples.map(_.toSeq)}")
  }

  test("MP4 rawvideo frames: demuxed samples decode to true RGB24 " +
       "pixel means; mismatched and compressed tracks are skipped") {
    import spark.implicits._
    val w = 3; val h = 2
    def frame(f: Int): Array[Byte] =
      Array.tabulate[Byte](w * h * 3) { i =>
        val p = i / 3
        ((f * 50 + (p % w) * 10 + (p / w) * 5) % 256).toByte
      }
    val frames = (0 until 4).map(frame)
    val good = Multimodal.mp4Bytes(1000L, 400L, Seq(
      ("vide", "raw ", 1000L, 100L, frames.map(_.length), w, h)),
      payload = Some(Array.concat(frames: _*)))
    // an avc1 (compressed) track must NOT be pixel-decoded
    val compressed = Multimodal.mp4Bytes(1000L, 400L, Seq(
      ("vide", "avc1", 1000L, 100L, frames.map(_.length), w, h)),
      payload = Some(Array.concat(frames: _*)))
    val media = Seq((1L, good), (2L, compressed))
      .toDF("media_id", "content")
    val out = Multimodal.sampleMp4RawFrames(media, everyN = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getDouble(4))).toSet
    def mean(f: Int): Double = {
      val s = frame(f).map(_ & 0xff).map(_.toLong).sum
      java.math.BigDecimal.valueOf(s.toDouble / (w * h * 3))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    assert(out == Set((1L, 0, w, h, mean(0)), (1L, 2, w, h, mean(2))),
      s"raw frames must decode to exact means: $out")
  }

  test("WebM unknown-size Segment (streamed form): the all-ones VINT " +
       "resolves to the enclosing region end") {
    val streamed = Multimodal.webmBytes("V_VP8", 640, 360, 4200.0,
      streamedSegment = true)
    val m = Multimodal.webmMeta(streamed)
    assert(m == Multimodal.WebmMeta("webm", 1000000L, 1L, 1L, "V_VP8",
      640, 360, 4200.0))
    // and the parse equals the sized form's parse
    assert(m == Multimodal.webmMeta(
      Multimodal.webmBytes("V_VP8", 640, 360, 4200.0)))
    // an unknown-size LEAF is unparseable: the walk stops without
    // reading past the region (DocType id 0x4282 + all-ones size)
    val badLeaf = Array[Byte](0x42, 0x82.toByte, 0x01.toByte) ++
      Array.fill[Byte](7)(0xff.toByte) ++ "webm".getBytes("US-ASCII")
    assert(Multimodal.webmMeta(badLeaf).docType == "")
  }

  test("WebM EBML walk: declaration round-trip, float64 duration " +
       "bit-exact, multi-byte varints") {
    val b = Multimodal.webmBytes("V_VP9", 1920, 1080, 12345.625)
    val m = Multimodal.webmMeta(b)
    assert(m == Multimodal.WebmMeta("webm", 1000000L, 1L, 1L, "V_VP9",
      1920, 1080, 12345.625))
    // dimensions needing 2-byte uints and a >127-byte master body
    // (2-byte size VINT on Segment) both survive the varint walk
    val big = Multimodal.webmBytes("V_MS/VFW/FOURCC", 4096, 2160, 0.5,
      timecodeScale = 500000L)
    val mb = Multimodal.webmMeta(big)
    assert(mb.codecId == "V_MS/VFW/FOURCC" && mb.width == 4096 &&
      mb.height == 2160 && mb.timecodeScale == 500000L &&
      mb.durationMs == 0.5)
    // truncated EBML terminates cleanly
    Multimodal.webmMeta(java.util.Arrays.copyOfRange(b, 0, 20)): Unit
  }

  test("randomized container round-trips: MP4 and WebM declarations " +
       "survive arbitrary geometries") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 50) {
      val nTracks = 1 + rnd.nextInt(3)
      val tracks = (0 until nTracks).map { _ =>
        val n = 1 + rnd.nextInt(9)
        val sizes = Seq.fill(n)(1 + rnd.nextInt(5000))
        val vid = rnd.nextBoolean()
        (if (vid) "vide" else "soun",
          Seq("avc1", "vp09", "hvc1", "mp4a")(rnd.nextInt(4)),
          1L + rnd.nextInt(100000), 1L + rnd.nextInt(4096),
          sizes, if (vid) 1 + rnd.nextInt(8192) else 0,
          if (vid) 1 + rnd.nextInt(8192) else 0)
      }
      val mts = 1L + rnd.nextInt(1000000)
      val mdur = rnd.nextInt(Int.MaxValue).toLong
      val (brand, ts, dur, parsed) =
        Multimodal.mp4Meta(Multimodal.mp4Bytes(mts, mdur, tracks))
      assert(brand == "isom" && ts == mts && dur == mdur)
      assert(parsed.size == nTracks)
      tracks.zip(parsed).foreach {
        case ((h, c, tts, delta, sizes, w, hh), p) =>
          assert(p.handler == h && p.codec == c && p.timescale == tts)
          assert(p.durationTicks == sizes.length.toLong * delta)
          assert(p.nSamples == sizes.length.toLong)
          assert(p.sampleBytes == sizes.map(_.toLong).sum)
          if (h == "vide") assert(p.width == w && p.height == hh)
      }
      val codec = Seq("V_VP8", "V_VP9", "V_AV1",
        "V_MPEG4/ISO/AVC")(rnd.nextInt(4))
      val (ww, wh) = (1 + rnd.nextInt(65000), 1 + rnd.nextInt(65000))
      val wdur = rnd.nextDouble() * 1e7
      val wtcs = 1L + rnd.nextInt(100000000)
      val m = Multimodal.webmMeta(
        Multimodal.webmBytes(codec, ww, wh, wdur, wtcs))
      assert(m == Multimodal.WebmMeta("webm", wtcs, 1L, 1L, codec,
        ww, wh, wdur))
    }
  }
}
