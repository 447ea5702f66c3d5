package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (pipeline brief; SURVEY.md §1 maps cover
  * images to `BinaryType`, `content_cafe.py:196-203`): media payloads
  * are opaque `binary` columns with a typed metadata struct, processed
  * by batch kernels inside `mapPartitions` — the Scala equivalent of
  * the `mapInPandas` batch-UDF pattern (iterate a partition in batches,
  * amortize per-batch setup, never a per-row Python/JNI crossing).
  *
  * IMAGE decode/resize are REAL: `javax.imageio` ships in the JDK
  * (headless-safe), so PNG/JPEG/BMP/GIF bytes decode to true
  * dimensions and resize re-encodes a genuinely scaled bitmap. A
  * deterministic fake header format (`GIMG|<w>|<h>|payload`) is kept
  * as a fallback so tests can synthesize payloads without codec bytes.
  * AUDIO decode/window-sampling are REAL too: `javax.sound.sampled`
  * (also JDK built-in) parses WAV/PCM containers, so `decodeAudio`
  * reports true format/frame counts plus peak/RMS computed from the
  * decoded samples, and `sampleAudioWindows` cuts genuine fixed-length
  * PCM frame windows. VIDEO frame sampling is REAL for the one
  * multi-frame containers the JDK can decode: animated GIF —
  * [[sampleGifFrames]] iterates true frames through ImageIO's
  * sequence reader (`getNumImages`/`read(i)`) — and AVI/MJPEG —
  * [[sampleAviFrames]] walks the RIFF container and decodes each
  * frame through the real (lossy) JPEG codec — both reporting
  * per-frame dimensions + pixel statistics, the same honest-codec
  * move WAV made for audio. For MP4 and WebM the CONTAINER layer is
  * REAL: [[mp4Meta]] walks the ISO-BMFF box tree (ftyp/moov/trak/
  * stbl — codecs, sample tables, durations) and [[webmMeta]] walks
  * the EBML tree (DocType, TimecodeScale, TrackEntry, CodecID,
  * dimensions) as pure-JDK byte parsing — the triage-without-decode
  * probe an intake pipeline runs to route video. The MP4 DEMUX layer
  * is real too: [[mp4Samples]] locates every sample's bytes through
  * the stco/stsc/stsz algebra, and for the `raw ` rawvideo codec
  * [[sampleMp4RawFrames]] turns those samples into true RGB24 pixels
  * — so MP4 produces real pixels end to end for uncompressed video.
  * Only the COMPRESSED-codec decode (VP8/VP9/H.264 — no JDK codec)
  * stays STUBBED: [[sampleFrames]] chunks the payload
  * deterministically; its Spark-side contract — schema, batching,
  * partitioning, generator shape — is real and tested, and a codec
  * implementation replaces only the body marked "STUB".
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache — one temp file per
  // decode/encode. Keep it in memory: this runs once per executor JVM
  // when a kernel closure first touches this object.
  javax.imageio.ImageIO.setUseCache(false)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),      // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", MapType(StringType, StringType))))

  /** Encode a fake image payload (STUB stand-in for real codec bytes):
    * `GIMG|w|h|` header followed by the payload bytes. */
  def fakeImageBytes(w: Int, h: Int, payload: Array[Byte]): Array[Byte] =
    (s"GIMG|$w|$h|".getBytes("UTF-8")) ++ payload

  /** Decoded image descriptor. */
  final case class DecodedImage(mediaId: Long, width: Int, height: Int,
                                nBytes: Int)

  private val FakePrefix = "GIMG|".getBytes("UTF-8")

  /** Sniff the reader SPI for an open ImageInputStream — the lock-free
    * body of `ImageIO.getImageReaders`: each cached SPI probes under
    * mark/reset (see the video section for why SPIs are cached). */
  private def findReaderSpi(iis: javax.imageio.stream.ImageInputStream)
      : Option[javax.imageio.spi.ImageReaderSpi] =
    imageReaderSpis.find { s =>
      try { iis.mark(); val ok = s.canDecodeInput(iis); iis.reset(); ok }
      catch { case _: Exception => iis.reset(); false }
    }

  /** Lock-free equivalent of `ImageIO.read(InputStream)` for byte
    * payloads: sniff with the cached reader SPIs instead of consulting
    * the IIORegistry per call; null when undecodable. Same codec
    * classes, no registry lock on the hot path. The stream closes on
    * EVERY path (including reader-instantiation failure). */
  private def readImage(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try {
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        findReaderSpi(iis) match {
          case None => null
          case Some(s) =>
            val reader = s.createReaderInstance()
            try { reader.setInput(iis); reader.read(0) }
            finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => null }

  private def isFakeHeader(bytes: Array[Byte]): Boolean =
    bytes.length >= FakePrefix.length &&
      java.util.Arrays.equals(bytes, 0, FakePrefix.length,
                              FakePrefix, 0, FakePrefix.length)

  /** REAL decode via javax.imageio (JDK built-in, headless): PNG/JPEG/
    * BMP/GIF bytes yield their true dimensions. The `GIMG` fake header
    * is recognized first (test payloads without codec bytes);
    * undecodable content degrades to (-1, -1) rather than failing the
    * task. Runs per partition so decoder setup amortizes across a
    * batch, never per row.
    */
  def decodeImages(media: DataFrame): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          if (bytes == null) DecodedImage(id, -1, -1, 0)
          else if (isFakeHeader(bytes)) {
            val parts = new String(bytes, "UTF-8").split("\\|", 4)
            if (parts.length == 4)
              DecodedImage(id, parts(1).toInt, parts(2).toInt, bytes.length)
            else DecodedImage(id, -1, -1, bytes.length)
          } else {
            val img = readImage(bytes)
            if (img == null) DecodedImage(id, -1, -1, bytes.length)
            else DecodedImage(id, img.getWidth, img.getHeight, bytes.length)
          }
        }
      }
  }

  /** Byte-histogram feature vector (16 buckets, L1-normalized floats) —
    * a REAL batch feature kernel: the shape an embedding model would
    * fill, with the same schema (`Array[Float]`) as the embeddings
    * table, so downstream ANN (VectorSearch) applies unchanged.
    */
  def byteHistogramFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes0) =>
          // null content → zero histogram (defined row, not an executor NPE)
          val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
          val hist = new Array[Float](dim)
          var i = 0
          while (i < bytes.length) {
            hist(((bytes(i) & 0xff) * dim) / 256) += 1f
            i += 1
          }
          val n = math.max(bytes.length, 1).toFloat
          var b = 0
          while (b < dim) { hist(b) /= n; b += 1 }
          (id, hist)
        }
      }
      .toDF("media_id", "features")
  }

  /** Cover-image suitability (ref `content_cafe.py:308-313`
    * is_suitable_image): a cover is a stand-in placeholder when its
    * bytes start with the known stand-in prefix. Pure binary-prefix
    * Column expression — codegen'd, no kernel needed. */
  def isStandInImage(content: org.apache.spark.sql.Column,
                     prefix: Array[Byte]): org.apache.spark.sql.Column =
    content.isNotNull &&
      org.apache.spark.sql.functions.substring(content, 1, prefix.length) ===
        org.apache.spark.sql.functions.lit(prefix)

  /** Keep only real covers: not null, not the stand-in placeholder,
    * and at least `minBytes` (tiny payloads aren't usable covers). */
  def suitableCovers(media: DataFrame, prefix: Array[Byte],
                     minBytes: Int = 0): DataFrame =
    media.filter(col("content").isNotNull &&
      !isStandInImage(col("content"), prefix) &&
      org.apache.spark.sql.functions.length(col("content")) >= minBytes)

  /** REAL resize for codec images (decode → bilinear scale → PNG
    * re-encode, all JDK); fake-header payloads rewrite the header and
    * truncate proportionally. Undecodable content passes through
    * unchanged. Narrow map, binary→binary — the distributed shape is
    * the contract. */
  def resizeImage(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (content == null) return null
    if (isFakeHeader(content)) {
      val parts = new String(content, "UTF-8").split("\\|", 4)
      if (parts.length == 4)
        return fakeImageBytes(w, h, parts(3).getBytes("UTF-8").take(w * h))
      return content
    }
    val img = readImage(content)
    if (img == null) content
    else {
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      pngBytes(out)
    }
  }

  /** PNG-encode through the cached writer SPI (lossless for RGB —
    * constructive image payloads round-trip exactly, unlike the
    * palette-quantized GIF path). */
  def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val writer = pngWriterSpi.createWriterInstance()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(buf)
    try {
      writer.setOutput(ios)
      writer.write(img)
    } finally { writer.dispose(); ios.close() }
    buf.toByteArray
  }

  val resizeUdf = udf((c: Array[Byte], w: Int, h: Int) => resizeImage(c, w, h))

  // ---- perceptual image dedup (average hash over real decodes) ----

  /** 63-bit average hash of a decoded image: area-average the
    * grayscale image onto an 8×8 grid, then bit i (row-major, bit 63
    * forced 0 — keeps the hash a non-negative long on every engine) is
    * 1 iff tile i's mean gray STRICTLY exceeds the global tile mean.
    * Exactness contract: both the tile average and the threshold run
    * in scaled integers (sum·64 comparisons, no FP), so images whose
    * tiles are exact constants (the constructive corpora; any image
    * whose dimensions are multiples of 8) hash deterministically.
    * Returns -1 for undecodable content.
    */
  def aHash64(bytes: Array[Byte]): Long = {
    val img = if (bytes == null) null else readImage(bytes)
    if (img == null) return -1L
    val w = img.getWidth; val h = img.getHeight
    if (w < 8 || h < 8) return -1L
    val sums = new Array[Long](64)   // Σ gray·3 per tile (avoid /3)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val ty = y * 8 / h
      var x = 0
      while (x < w) {
        val tx = x * 8 / w
        val rgb = img.getRGB(x, y)
        val g3 = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        val t = ty * 8 + tx
        sums(t) += g3; cnts(t) += 1
        x += 1
      }
      y += 1
    }
    // tile mean (scaled): m_t = sums(t)/cnts(t); global mean = Σm_t/64.
    // Integer-exact when cnts divide sums (constant tiles); compare
    // m_t·64 > Σm_t via longs. Non-constant tiles use the floor mean —
    // deterministic either way.
    val means = Array.tabulate(64)(t => sums(t) / math.max(cnts(t), 1L))
    val total = means.sum
    var hash = 0L
    var t = 0
    while (t < 63) { // bit 63 stays 0
      if (means(t) * 64L > total) hash |= 1L << t
      t += 1
    }
    hash
  }

  /** Near-duplicate image pairs by average-hash hamming distance —
    * image-side analogue of [[TextDedup]]'s SimHash pass. Candidates
    * come from a BAND equi-join (4 bands of ≤ 16 bits; pigeonhole: any
    * pair at hamming ≤ 3 < 4 agrees on some band), never an all-pairs
    * scan; the exact hamming filter runs on candidates only. Hashing
    * is one narrow kernel map over the media table (real decode per
    * row, SPI-cached); the band explode is ×4.
    *
    * @return (media_a, media_b, hamming ≤ maxHamming), media_a <
    *         media_b, one row per pair.
    */
  def aHashDedupPairs(media: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "pigeonhole guarantee holds for hamming < bands=4")
    val spark = media.sparkSession
    import spark.implicits._
    val hashes = media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, c) => (id, aHash64(c)) })
      .toDF("media_id", "ahash")
      .filter(col("ahash") >= 0)
      // feeds BOTH sides of the band self-join below — without the
      // checkpoint the real PNG decode + aHash kernel runs twice
      // (the TextDedup band/shingle-kernel convention)
      .localCheckpoint(eager = false)
    val banded = hashes.select(col("media_id"), col("ahash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("ahash"), b * 16).bitwiseAND(lit(0xffffL))
            .as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("ahash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"),
              col("b.media_id").as("media_b"),
              bit_count(col("a.ahash").bitwiseXOR(col("b.ahash")))
                .cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming) // hamming is pair-determined:
      .distinct() // filter first, so the dedup shuffle carries only
                  // qualifying pairs (multi-band collisions)
  }

  // ---- audio (REAL: javax.sound.sampled, JDK built-in) ----

  // javax.sound's AudioSystem entry points funnel EVERY call through a
  // synchronized provider-registry scan — measured ~20k rows/s TOTAL
  // throughput regardless of thread count (negative scaling: 32 threads
  // ran slower than one). Resolving the SPI providers once per executor
  // JVM and calling them directly is the same codec code path minus the
  // global lock: measured 840k rows/s at 32 threads, 40× the registry
  // route. Provider instances are stateless (AudioSystem itself shares
  // one instance across all threads); the lists materialize eagerly
  // inside the lazy init because ServiceLoader's iterator is not
  // thread-safe.
  private lazy val audioWriters: List[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator.asScala.toList
  }
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    // WAVE readers first: each provider accepts only its own container,
    // so order never changes WHICH reader succeeds — but the JDK's
    // default order puts SoftMidiAudioFileReader before the Wave ones,
    // and its per-call rejection (~70µs + the synchronized MidiSystem
    // registry) would tax and serialize every WAV decode.
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator.asScala.toList
      .sortBy(r => if (r.getClass.getSimpleName.startsWith("Wave")) 0 else 1)
  }

  /** Canonical WAV bytes (16-bit signed little-endian PCM) from raw
    * samples, written through the real `AudioSystem` WAVE writer —
    * constructive test/query payloads round-trip the honest codec
    * path, never a hand-rolled header. `samples` is frame-major
    * (interleaved channels); its length must be a multiple of
    * `channels`. */
  def wavBytes(sampleRate: Int, channels: Int,
               samples: Array[Short]): Array[Byte] = {
    require(samples.length % channels == 0,
      s"wavBytes: ${samples.length} samples not a multiple of $channels channels")
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt,
      (samples.length / channels).toLong)
    val out = new java.io.ByteArrayOutputStream()
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    audioWriters.find(_.isFileTypeSupported(wave)) match {
      case Some(w) => w.write(ais, wave, out) // lock-free provider path
      case None => javax.sound.sampled.AudioSystem.write(ais, wave, out)
    }
    out.toByteArray
  }

  /** Decoded audio descriptor: container format fields plus peak
    * (max |sample|) and 6-dp RMS amplitude computed from the decoded
    * 16-bit PCM stream. Undecodable content degrades to sampleRate -1
    * (same posture as decodeImages). */
  final case class DecodedAudio(mediaId: Long, sampleRate: Int,
                                channels: Int, bitsPerSample: Int,
                                nFrames: Long, peak: Int, rms: Double)

  /** Lock-free equivalent of `AudioSystem.getAudioInputStream`: try
    * each cached provider; a reader rejects foreign formats with
    * `UnsupportedAudioFileException`, exactly as the registry loop
    * does internally — minus its global lock. */
  private def openAudio(bytes: Array[Byte])
      : javax.sound.sampled.AudioInputStream = {
    val it = audioReaders.iterator
    while (it.hasNext) {
      try return it.next()
        .getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => ()
      }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException(
      "no provider recognized the stream")
  }

  /** Parse one WAV payload to (format, interleaved 16-bit samples);
    * None when the bytes aren't a decodable 16-bit PCM container. */
  private def readWav(bytes: Array[Byte])
      : Option[(javax.sound.sampled.AudioFormat, Long, Array[Short])] =
    try {
      val ais = openAudio(bytes)
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16) None
        else {
          val data = ais.readAllBytes()
          val n = data.length / 2
          val samples = new Array[Short](n)
          val le = !fmt.isBigEndian
          var i = 0
          while (i < n) {
            samples(i) =
              if (le) (((data(2 * i + 1) << 8) | (data(2 * i) & 0xff))).toShort
              else (((data(2 * i) << 8) | (data(2 * i + 1) & 0xff))).toShort
            i += 1
          }
          Some((fmt, ais.getFrameLength, samples))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** REAL audio decode: WAV/PCM bytes → format fields + amplitude
    * stats from the decoded samples. Per-partition kernel (batch
    * shape), sequential double accumulation + Spark-round RMS so the
    * output is SQL-oracle-reproducible. */
  def decodeAudio(media: DataFrame): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          (if (bytes == null) None else readWav(bytes)) match {
            case None => DecodedAudio(id, -1, -1, -1, -1L, -1, -1.0)
            case Some((fmt, frames, samples)) =>
              var peak = 0
              var sumSq = 0L // exact: 16-bit squares, < 2^53 for any clip
              var i = 0
              while (i < samples.length) {
                val v = samples(i).toInt
                val a = math.abs(v)
                if (a > peak) peak = a
                sumSq += v.toLong * v
                i += 1
              }
              val rms =
                if (samples.isEmpty) 0.0
                else java.math.BigDecimal
                  .valueOf(math.sqrt(sumSq.toDouble / samples.length))
                  .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
              DecodedAudio(id, fmt.getSampleRate.toInt, fmt.getChannels,
                fmt.getSampleSizeInBits, frames, peak, rms)
          }
        }
      }
  }

  /** REAL audio frame sampling: decode the WAV, cut the PCM stream
    * into windows of `windowFrames` frames (a frame = one sample per
    * channel; the tail window may be partial), keep every `everyN`-th
    * window. One clip row → N window rows with ordinals — the
    * training-data shape (fixed-length audio examples), distributed as
    * a narrow per-partition generator. Undecodable clips yield no
    * windows. */
  def sampleAudioWindows(media: DataFrame, windowFrames: Int = 1024,
                         everyN: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (if (bytes == null) None else readWav(bytes)) match {
          case None => Iterator.empty
          case Some((fmt, _, samples)) =>
            val span = windowFrames * fmt.getChannels
            samples.grouped(span).zipWithIndex
              .filter(_._2 % everyN == 0)
              .map { case (win, ordinal) =>
                var peak = 0
                var i = 0
                while (i < win.length) {
                  val a = math.abs(win(i).toInt)
                  if (a > peak) peak = a
                  i += 1
                }
                (id, ordinal.toLong, win.length.toLong, peak)
              }
        }
      }
      .toDF("media_id", "window_ordinal", "n_samples", "peak")
  }

  // ---- video (REAL for animated GIF via ImageIO; MP4/WebM stubbed) ----

  // Same lock-avoidance as the audio SPI caching above: ImageIO's
  // static helpers (getImageReaders / getImageWritersByFormatName /
  // createImageInputStream) consult the IIORegistry on every call.
  // Capture the SPI lists once per executor JVM; SPIs are stateless
  // factories (reader/writer INSTANCES are not thread-safe and are
  // created per call, which is cheap).
  private lazy val imageReaderSpis: List[javax.imageio.spi.ImageReaderSpi] = {
    import scala.jdk.CollectionConverters._
    javax.imageio.spi.IIORegistry.getDefaultInstance
      .getServiceProviders(classOf[javax.imageio.spi.ImageReaderSpi], true)
      .asScala.toList
  }
  private def writerSpiFor(format: String): javax.imageio.spi.ImageWriterSpi = {
    import scala.jdk.CollectionConverters._
    javax.imageio.spi.IIORegistry.getDefaultInstance
      .getServiceProviders(classOf[javax.imageio.spi.ImageWriterSpi], true)
      .asScala
      .find(_.getFormatNames.exists(_.equalsIgnoreCase(format)))
      .getOrElse(throw new IllegalStateException(s"no $format ImageWriterSpi"))
  }
  private lazy val gifWriterSpi = writerSpiFor("gif")
  private lazy val pngWriterSpi = writerSpiFor("png")

  /** Animated-GIF bytes from 8-bit-INDEXED frames sharing one palette.
    * Conformant GIF89a written directly — literal LZW codes with a
    * CLEAR every 250 symbols (the classic "uncompressed GIF" stream:
    * all codes stay 9 bits, any conformant decoder accepts it) — NOT
    * through ImageIO's sequence writer, whose LZW table churn was the
    * single slowest thing in the whole bench (mm_video_frames 6.7 s at
    * sf0.1, "GIF LZW encode dominates" in SCALING.md). The encoder is
    * fixture plumbing; the DECODE side under test stays the real JDK
    * reader, and MultimodalSpec cross-validates this writer against
    * the JDK writer pixel-for-pixel ([[gifBytesJdk]]).
    *
    * All frames must share dimensions (GIF sub-rect frames are out of
    * scope). JDK codec quirk (measured, JDK 17): the GIF READER
    * returns the last row zeroed for images under 5 rows tall —
    * constructive payloads must use height ≥ 5 to round-trip
    * losslessly. */
  def gifBytes(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty, "gifBytes: at least one frame")
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    require(frames.forall(f => f.getWidth == w && f.getHeight == h),
      "gifBytes: all frames must share dimensions")
    val cm = frames.head.getColorModel match {
      case icm: java.awt.image.IndexColorModel => icm
      case other => throw new IllegalArgumentException(
        s"gifBytes: frames must be indexed (got ${other.getClass.getSimpleName})")
    }
    val palette = new Array[Int](256) // mapSize ≤ 256 entries; tail stays 0
    cm.getRGBs(palette)
    // no GCE/transparency support: a translucent entry would encode
    // opaque and silently break decode(gifBytes) == decode(gifBytesJdk)
    require((0 until cm.getMapSize).forall(i => (palette(i) >>> 24) == 0xff),
      "gifBytes: transparent palette entries unsupported")
    val out = new java.io.ByteArrayOutputStream(64 + frames.length * (w * h * 9 / 8 + 32))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    u16(w); u16(h)
    out.write(0xF7) // global color table, 8 bits/entry, 256 entries
    out.write(0); out.write(0) // background index, aspect ratio
    palette.foreach { rgb =>
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff)
      out.write(rgb & 0xff)
    }
    val px = new Array[Int](w * h)
    frames.foreach { f =>
      val fcm = f.getColorModel match {
        case icm: java.awt.image.IndexColorModel => icm
        case other => throw new IllegalArgumentException(
          s"gifBytes: frames must be indexed (got ${other.getClass.getSimpleName})")
      }
      if (!(fcm eq cm)) { // same palette VALUES → same decoded colors
        val fp = new Array[Int](256)
        fcm.getRGBs(fp)
        require(java.util.Arrays.equals(fp, palette),
          "gifBytes: all frames must share one palette")
      }
      out.write(0x2C) // image descriptor
      u16(0); u16(0); u16(w); u16(h)
      out.write(0) // no local color table, not interlaced
      out.write(8) // LZW minimum code size
      f.getRaster.getSamples(0, 0, w, h, 0, px)
      // literal 9-bit codes, LSB-first; CLEAR (256) resets the
      // decoder's table before it could outgrow 9 bits (clear at 250 ≤
      // the 253-code bound), EOI (257) ends the stream
      val data = new java.io.ByteArrayOutputStream(w * h * 9 / 8 + 8)
      var bitBuf = 0; var nBits = 0
      def putCode(c: Int): Unit = {
        bitBuf |= c << nBits; nBits += 9
        while (nBits >= 8) { data.write(bitBuf & 0xff); bitBuf >>>= 8; nBits -= 8 }
      }
      putCode(256)
      var i = 0; var sinceClear = 0
      while (i < px.length) {
        putCode(px(i))
        sinceClear += 1
        if (sinceClear == 250) { putCode(256); sinceClear = 0 }
        i += 1
      }
      putCode(257)
      if (nBits > 0) data.write(bitBuf & 0xff)
      // chunk into ≤255-byte sub-blocks, zero-length terminator
      val bytes = data.toByteArray
      var off = 0
      while (off < bytes.length) {
        val n = math.min(255, bytes.length - off)
        out.write(n)
        out.write(bytes, off, n)
        off += n
      }
      out.write(0)
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** The ImageIO sequence-writer form of [[gifBytes]] — kept as the
    * independent reference implementation the spec cross-validates the
    * direct encoder against (decode(gifBytes) == decode(gifBytesJdk)
    * pixel-for-pixel). Not used on any query path. */
  private[graft] def gifBytesJdk(
      frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty, "gifBytesJdk: at least one frame")
    val writer = gifWriterSpi.createWriterInstance()
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Solid 8-bit-gray frame — constructive payloads whose pixel stats
    * are predictable in SQL. INDEXED with an explicit 256-gray palette:
    * the GIF writer embeds an indexed image's own color table verbatim
    * (lossless round-trip), where a gray/RGB raster would be quantized
    * and dithered against the writer's default palette. */
  def grayFrame(w: Int, h: Int, level: Int): java.awt.image.BufferedImage = {
    require(level >= 0 && level <= 255, s"grayFrame: level $level")
    val grays = Array.tabulate[Byte](256)(i => i.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, level); x += 1 }
      y += 1
    }
    img
  }

  /** Mean channel value (avg of r,g,b over all pixels), 6dp HALF_UP —
    * the Spark-round contract shared by the GIF and AVI frame
    * samplers so both stay SQL-oracle-reproducible; the rounding is
    * oracle-critical, ONE copy only. */
  private def meanRgb(img: java.awt.image.BufferedImage): Double = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    val nPix = img.getWidth.toLong * img.getHeight
    java.math.BigDecimal.valueOf(sum.toDouble / (3.0 * nPix))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** REAL frame sampling for ImageIO containers (animated GIF is the
    * multi-frame case): iterate true frames, keep every `everyN`-th,
    * and report the frame's decoded dimensions and mean channel value
    * (avg of r,g,b over all pixels, 6dp HALF_UP — Spark-round like the
    * audio RMS so it is SQL-oracle-reproducible). One clip row → N
    * frame rows, a narrow per-partition generator; undecodable or null
    * content yields no rows (same posture as [[sampleAudioWindows]]).
    */
  def sampleGifFrames(media: DataFrame, everyN: Int = 2): DataFrame = {
    // fail loudly here: inside the kernel, Range.by(0) would throw into
    // the undecodable-payload catch and read as "no frames anywhere"
    require(everyN > 0, s"sampleGifFrames: everyN must be positive ($everyN)")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Nil
        else try {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            findReaderSpi(iis) match {
              case None => Nil
              case Some(spi) =>
                val reader = spi.createReaderInstance()
                try {
                  reader.setInput(iis)
                  val n = reader.getNumImages(true)
                  // materialize eagerly — the reader closes on exit
                  (0 until n by everyN).map { f =>
                    val img = reader.read(f)
                    (id, f, img.getWidth, img.getHeight, meanRgb(img))
                  }
                } finally reader.dispose()
            }
          } finally iis.close()
        } catch { case _: Exception => Nil }
      }
      .toDF("media_id", "frame_ordinal", "width", "height", "mean_rgb")
  }

  // ---- AVI/MJPEG (REAL: RIFF container walk + JDK JPEG codec) ----

  private lazy val jpegWriterSpi = writerSpiFor("jpeg")

  /** REAL JPEG bytes through the JDK encoder (default quality). JPEG
    * is lossy — callers must treat decoded pixel stats as
    * approximate (see [[sampleAviFrames]]'s tolerance contract),
    * unlike the lossless PNG/GIF paths. */
  def jpegBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = jpegWriterSpi.createWriterInstance()
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(img)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Solid TYPE_INT_RGB frame — the JPEG-writer-compatible sibling of
    * the indexed [[grayFrame]] (which exists for the GIF palette
    * path). Measured (JDK 17, all 256 levels × dims 6..11 × 6..9):
    * the JDK JPEG codec round-trips SOLID gray exactly — a uniform
    * block is pure DC, which the default quantization preserves — so
    * constructive mean-gray stats stay bit-predictable even through
    * the lossy codec. */
  def rgbFrame(w: Int, h: Int, level: Int): java.awt.image.BufferedImage = {
    require(level >= 0 && level <= 255, s"rgbFrame: level $level")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (level << 16) | (level << 8) | level
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    img
  }

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Minimal-but-well-formed RIFF-AVI container holding an MJPEG video
    * stream (one '00dc' chunk per JPEG-encoded frame): RIFF('AVI '
    * LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi' 00dc…)).
    * MJPEG-in-AVI is the one video container the JDK can honestly
    * round-trip (ImageIO ships a real JPEG codec); MP4/WebM stay
    * stubbed. All frames must share dimensions.
    */
  def aviMjpegBytes(frames: Seq[java.awt.image.BufferedImage],
                    fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty, "aviMjpegBytes: at least one frame")
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    val jpegs = frames.map(jpegBytes)
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
      fourcc(id) ++ le32(body.length) ++ body ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(kind) ++ body)
    val avih = chunk("avih",
      le32(1000000 / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(jpegs.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh",
      fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(1) ++ le32(fps) ++ le32(0) ++ le32(jpegs.length) ++
      le32(jpegs.map(_.length).max) ++ le32(-1) ++ le32(0) ++
      le32(0) ++ le32((h << 16) | w))
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++
      Array(1.toByte, 0.toByte, 24.toByte, 0.toByte) ++
      fourcc("MJPG") ++ le32(w * h * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    // Array.concat, NOT Seq#flatMap over the byte arrays — flatMap
    // would assemble the movi body as a boxed Seq[Byte] (one
    // java.lang.Byte per byte; measured as a GC storm at corpus scale)
    val movi = list("movi",
      Array.concat(jpegs.map(j => chunk("00dc", j)): _*))
    chunk("RIFF", fourcc("AVI ") ++ hdrl ++ movi)
  }

  /** Walk a RIFF-AVI byte stream and return the MJPEG frame payloads
    * ('00dc'/'00db' chunks inside LIST 'movi'), in stream order.
    * Bounds-checked; malformed input yields the frames parsed so far
    * (empty for non-AVI bytes) rather than throwing.
    */
  def aviMjpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
      ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def cc(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    val out = Seq.newBuilder[Array[Byte]]
    if (bytes.length >= 12 && cc(0) == "RIFF" && cc(8) == "AVI ") {
      // top-level chunks start at 12; find LIST 'movi'. Size fields are
      // UNTRUSTED u32s: clamp via Long arithmetic and force forward
      // progress — a hostile size ≥ 2³¹ (negative as Int) or 0 must
      // never stall or reverse the walk.
      var p = 12
      var ok = true
      while (ok && p + 8 <= bytes.length) {
        val id = cc(p)
        val sz = u32(p + 4) // 0 ≤ sz < 2³²
        val bodyEnd = math.min(p + 8L + sz, bytes.length.toLong).toInt
        if (id == "LIST" && p + 12 <= bytes.length && cc(p + 8) == "movi") {
          var q = p + 12
          while (ok && q + 8 <= bodyEnd) {
            val fid = cc(q)
            val fsz = u32(q + 4)
            val fEnd = q + 8L + fsz
            if ((fid == "00dc" || fid == "00db") && fEnd <= bodyEnd && fsz > 0)
              out += java.util.Arrays.copyOfRange(bytes, q + 8, fEnd.toInt)
            val next = fEnd + (fsz % 2) // chunks are word-aligned
            if (next <= q || next > Int.MaxValue) ok = false // malformed
            else q = next.toInt
          }
        }
        val next = bodyEnd + (sz % 2)
        if (next <= p || next > Int.MaxValue) ok = false // malformed
        else p = next.toInt
      }
    }
    out.result()
  }

  /** REAL AVI/MJPEG frame sampling: RIFF walk → every `everyN`-th
    * '00dc' payload → JDK JPEG decode (SPI-cached) → decoded dims +
    * mean channel value (6dp HALF_UP, as [[sampleGifFrames]]). JPEG is
    * lossy, so unlike the GIF path the mean is NOT bit-predictable
    * from the generator — callers verify it against a tolerance
    * contract. Undecodable/null content yields no rows.
    */
  def sampleAviFrames(media: DataFrame, everyN: Int = 2): DataFrame = {
    require(everyN > 0, s"sampleAviFrames: everyN must be positive ($everyN)")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Nil
        else try {
          val frames = aviMjpegFrames(bytes)
          (0 until frames.length by everyN).flatMap { f =>
            try {
              val img = readImage(frames(f))
              Some((id, f, img.getWidth, img.getHeight, meanRgb(img)))
            } catch { case _: Exception => None }
          }
        } catch { case _: Exception => Nil }
      }
      .toDF("media_id", "frame_ordinal", "width", "height", "mean_rgb")
  }

  // ---- MP4 / WebM CONTAINER parsing (REAL, pure-JDK byte walking;
  //      only the frame/pixel DECODE stays stubbed — no JDK codec) ----

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] =
    Array.concat(be32(v >>> 32), be32(v & 0xffffffffL))

  /** One ISO-BMFF box: u32 big-endian size (incl. 8-byte header) +
    * fourcc + payload. */
  private def mp4Box(typ: String, body: Array[Byte]*): Array[Byte] = {
    val payload = Array.concat(body: _*)
    Array.concat(be32(payload.length + 8L), fourcc(typ), payload)
  }

  /** Minimal-but-well-formed MP4 (ISO base media) container: ftyp +
    * moov(mvhd + one trak per stream, each with tkhd/mdia(mdhd, hdlr,
    * minf(stbl(stsd, stts, stsz, stsc, stco)))) + mdat. Sample DATA
    * is opaque payload (no codec frames — the honest stub boundary);
    * the sample TABLES are real: per-sample sizes (stsz), a uniform
    * tick delta (stts), and the codec sample-entry fourcc (stsd), so
    * [[mp4Meta]] recovers counts/durations/codecs from a genuine box
    * walk, exactly what a corpus-intake probe runs before deciding
    * whether to decode at all.
    *
    * The chunk-offset table (stco) is REAL: each track's samples land
    * consecutively in mdat as one chunk (the stsc shape declared
    * below), and stco carries the chunk's true file offset — computed
    * by a two-pass build (stco values are fixed-width, so the moov
    * length is offset-independent). `payload` supplies the actual
    * mdat body (must match the declared total sample bytes) — the
    * rawvideo path stores real pixels there and [[mp4Samples]] gets
    * them back by the same offsets a real demuxer would use; None
    * keeps the deterministic opaque filler.
    * Tracks: (handlerType "vide"|"soun", codecFourcc, timescale,
    * sampleDelta, sampleSizes, width, height). */
  def mp4Bytes(movieTimescale: Long, movieDuration: Long,
               tracks: Seq[(String, String, Long, Long, Seq[Int], Int, Int)],
               version1: Boolean = false,
               payload: Option[Array[Byte]] = None)
      : Array[Byte] = {
    // v1 full boxes carry 64-bit creation/modification/duration — the
    // layout real long-duration files use; mp4Meta must parse both
    val mvhd = mp4Box("mvhd",
      if (version1) Array.concat(
        be32(0x01000000L),           // version 1 + flags
        be64(0L), be64(0L),          // creation, modification (64-bit)
        be32(movieTimescale), be64(movieDuration))
      else Array.concat(
        be32(0L),                    // version 0 + flags
        be32(0L), be32(0L),          // creation, modification
        be32(movieTimescale), be32(movieDuration)),
      be32(0x00010000L), be16(0x0100), be16(0),  // rate, volume, reserved
      be32(0L), be32(0L),            // reserved
      // identity matrix
      be32(0x00010000L), be32(0L), be32(0L),
      be32(0L), be32(0x00010000L), be32(0L),
      be32(0L), be32(0L), be32(0x40000000L),
      Array.fill[Byte](24)(0),       // pre_defined
      be32(tracks.length + 1L))      // next_track_ID
    def buildTraks(chunkOffs: Seq[Long]) = tracks.zipWithIndex.map {
      case ((handler, codec, timescale, delta, sizes, w, h), i) =>
        val durTicks = sizes.length.toLong * delta
        val tkhd = mp4Box("tkhd",
          be32(7L),                  // version 0, flags: enabled|movie
          be32(0L), be32(0L), be32(i + 1L), be32(0L), be32(durTicks),
          be32(0L), be32(0L), be16(0), be16(0), be16(0), be16(0),
          be32(0x00010000L), be32(0L), be32(0L),
          be32(0L), be32(0x00010000L), be32(0L),
          be32(0L), be32(0L), be32(0x40000000L),
          be32(w.toLong << 16), be32(h.toLong << 16)) // 16.16 fixed
        val mdhd = mp4Box("mdhd",
          if (version1) Array.concat(
            be32(0x01000000L), be64(0L), be64(0L),
            be32(timescale), be64(durTicks))
          else Array.concat(
            be32(0L), be32(0L), be32(0L), be32(timescale), be32(durTicks)),
          be16(0x55c4), be16(0))     // language "und"
        val hdlr = mp4Box("hdlr",
          be32(0L), be32(0L), fourcc(handler),
          Array.fill[Byte](12)(0), fourcc(handler), Array[Byte](0))
        // sample entry: 6 reserved + u16 data_ref_index, then the
        // handler's fields — visual entries carry width/height at body
        // offsets 24/26; audio entries carry channelcount/samplesize
        // at 16/18 and the 16.16 sample rate at 24 (ISO 14496-12
        // AudioSampleEntry — for a soun track the (w, h) tuple slots
        // carry channels and bits-per-sample)
        val entryBody = new Array[Byte](78)
        entryBody(7) = 1             // data_reference_index = 1
        if (handler == "soun") {
          System.arraycopy(be16(w), 0, entryBody, 16, 2)
          System.arraycopy(be16(h), 0, entryBody, 18, 2)
          System.arraycopy(be32(timescale << 16), 0, entryBody, 24, 4)
        } else {
          System.arraycopy(be16(w), 0, entryBody, 24, 2)
          System.arraycopy(be16(h), 0, entryBody, 26, 2)
        }
        val stsd = mp4Box("stsd", be32(0L), be32(1L),
          mp4Box(codec, entryBody))
        val stts = mp4Box("stts", be32(0L), be32(1L),
          be32(sizes.length.toLong), be32(delta))
        val stsz = mp4Box("stsz", be32(0L), be32(0L),
          be32(sizes.length.toLong),
          Array.concat(sizes.map(s => be32(s.toLong)): _*))
        val stsc = mp4Box("stsc", be32(0L), be32(1L),
          be32(1L), be32(sizes.length.toLong), be32(1L))
        val stco = mp4Box("stco", be32(0L), be32(1L),
          be32(chunkOffs(i)))
        val stbl = mp4Box("stbl", stsd, stts, stsz, stsc, stco)
        val minf = mp4Box("minf", stbl)
        val mdia = mp4Box("mdia", mdhd, hdlr, minf)
        mp4Box("trak", tkhd, mdia)
    }
    val ftyp = mp4Box("ftyp", fourcc("isom"), be32(512L),
      fourcc("isom"), fourcc("mp41"))
    // pass 1 sizes the moov (stco values are fixed-width, so the
    // length is offset-independent); pass 2 writes the true offsets:
    // track i's single chunk starts where the prior tracks' payloads
    // end inside the mdat body
    val moov0 = mp4Box("moov",
      (mvhd +: buildTraks(Seq.fill(tracks.length)(0L))): _*)
    val mdatBody = ftyp.length.toLong + moov0.length + 8L
    val cum = tracks.map(_._5.map(_.toLong).sum).scanLeft(0L)(_ + _)
    val moov = mp4Box("moov",
      (mvhd +: buildTraks(tracks.indices.map(i => mdatBody + cum(i)))): _*)
    require(moov.length == moov0.length,
      "mp4Bytes: offset pass changed the moov length")
    val mdatLen = cum.last
    val body = payload.getOrElse(
      Array.tabulate[Byte](mdatLen.toInt)(i => (i % 251).toByte))
    require(body.length.toLong == mdatLen,
      s"mp4Bytes: payload is ${body.length} bytes, the sample tables " +
        s"declare $mdatLen")
    Array.concat(ftyp, moov, mp4Box("mdat", body))
  }

  /** One parsed MP4 track: handler ("vide"/"soun"), codec fourcc from
    * the first stsd entry, media timescale, duration in media ticks
    * (Σ stts count·delta), sample count (stsz), total declared sample
    * bytes, and the sample-entry width/height (0 for sound). */
  final case class Mp4Track(handler: String, codec: String,
                            timescale: Long, durationTicks: Long,
                            nSamples: Long, sampleBytes: Long,
                            width: Int, height: Int)

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)
  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def cc4(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Walk the children of the box region [from, to): calls `f(type,
    * bodyFrom, bodyTo)` per box. Handles the 64-bit largesize form;
    * a malformed size aborts the walk (never reads past `to`). */
  private def mp4Walk(b: Array[Byte], from: Int, to: Int)
                     (f: (String, Int, Int) => Unit): Unit = {
    var off = from
    while (off + 8 <= to) {
      val size0 = u32(b, off)
      val typ = cc4(b, off + 4)
      val (body, end) =
        if (size0 == 1L && off + 16 <= to) {
          val hi = u32(b, off + 8); val lo = u32(b, off + 12)
          (off + 16, off + ((hi << 32) | lo))
        } else (off + 8, off + size0)
      if (size0 == 0L || end > to || end <= off) return // malformed
      f(typ, body, end.toInt)
      off = end.toInt
    }
  }

  /** Parse MP4 container metadata from a real box walk — the probe a
    * 100 TB intake runs to route/triage video WITHOUT decoding: major
    * brand, movie timescale/duration (mvhd), and per-track codec +
    * sample-table stats. The frame DECODE stays stubbed (no JDK
    * codec); everything here is what the container declares. */
  def mp4Meta(bytes: Array[Byte])
      : (String, Long, Long, Seq[Mp4Track]) = {
    var brand = ""
    var mts = 0L
    var mdur = 0L
    val tracks = Seq.newBuilder[Mp4Track]
    mp4Walk(bytes, 0, bytes.length) {
      case ("ftyp", from, _) => brand = cc4(bytes, from)
      case ("moov", mfrom, mto) =>
        mp4Walk(bytes, mfrom, mto) {
          case ("mvhd", from, _) =>
            // full-box version byte decides the field layout: v1 has
            // 64-bit creation/modification/duration (common in real
            // long-duration files), so timescale moves +12 → +20
            if ((bytes(from) & 0xff) == 1) {
              mts = u32(bytes, from + 20); mdur = u64(bytes, from + 24)
            } else {
              mts = u32(bytes, from + 12); mdur = u32(bytes, from + 16)
            }
          case ("trak", tfrom, tto) =>
            var handler = ""; var codec = ""
            var ts = 0L; var dur = 0L; var n = 0L; var sb = 0L
            var w = 0; var h = 0
            mp4Walk(bytes, tfrom, tto) {
              case ("mdia", dfrom, dto) =>
                mp4Walk(bytes, dfrom, dto) {
                  case ("mdhd", from, _) =>
                    // same v0/v1 layout split as mvhd
                    ts = if ((bytes(from) & 0xff) == 1) u32(bytes, from + 20)
                         else u32(bytes, from + 12)
                  case ("hdlr", from, _) => handler = cc4(bytes, from + 8)
                  case ("minf", ifrom, ito) =>
                    mp4Walk(bytes, ifrom, ito) {
                      case ("stbl", sfrom, sto) =>
                        mp4Walk(bytes, sfrom, sto) {
                          case ("stsd", from, _) =>
                            if (u32(bytes, from + 4) >= 1L) {
                              codec = cc4(bytes, from + 12)
                              // visual fields live at entry body 24/26
                              w = u16(bytes, from + 16 + 24)
                              h = u16(bytes, from + 16 + 26)
                            }
                          case ("stts", from, _) =>
                            val entries = u32(bytes, from + 4).toInt
                            var i = 0
                            while (i < entries) {
                              dur += u32(bytes, from + 8 + i * 8) *
                                u32(bytes, from + 12 + i * 8)
                              i += 1
                            }
                          case ("stsz", from, _) =>
                            val uniform = u32(bytes, from + 4)
                            n = u32(bytes, from + 8)
                            sb =
                              if (uniform != 0L) uniform * n
                              else {
                                var s = 0L; var i = 0
                                while (i < n) {
                                  s += u32(bytes, from + 12 + i * 4)
                                  i += 1
                                }
                                s
                              }
                          case _ => ()
                        }
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
            if (handler == "soun") { w = 0; h = 0 }
            tracks += Mp4Track(handler, codec, ts, dur, n, sb, w, h)
          case _ => ()
        }
      case _ => ()
    }
    (brand, mts, mdur, tracks.result())
  }

  /** One track's EXTRACTED sample payloads: handler/codec/dims from
    * stsd, and each sample's bytes located through the real demuxer
    * algebra — stco chunk offsets, stsc sample→chunk mapping, stsz
    * sizes, consecutive within a chunk. */
  final case class Mp4TrackSamples(handler: String, codec: String,
                                   width: Int, height: Int,
                                   samples: Seq[Array[Byte]],
                                   timescale: Long = 0L,
                                   channels: Int = 0,
                                   sampleBits: Int = 0)

  /** Extract every track's sample payloads from an MP4 container —
    * the demuxer step between [[mp4Meta]]'s triage probe and a codec:
    * resolve each sample's file position from the sample tables
    * (chunk offsets are ABSOLUTE file offsets per ISO 14496-12, so no
    * mdat bookkeeping is needed) and slice the bytes out. Handles
    * multi-entry stsc (runs of chunks sharing a samples-per-chunk)
    * and both uniform and per-sample stsz. A sample whose resolved
    * span leaves the buffer aborts that track's extraction (returns
    * the samples located so far), and a table whose DECLARED entry
    * count exceeds what physically fits in its box (or, for uniform
    * stsz, in the whole file) aborts the track before any allocation
    * — hostile tables never read out of bounds and never drive a
    * forged-count allocation. For the `raw ` rawvideo codec the
    * samples ARE the
    * pixels, which is what makes [[sampleMp4RawFrames]] a real
    * pixel-true MP4 path; compressed codecs still need the (stubbed)
    * decoder downstream. */
  def mp4Samples(bytes: Array[Byte]): Seq[Mp4TrackSamples] = {
    val out = Seq.newBuilder[Mp4TrackSamples]
    mp4Walk(bytes, 0, bytes.length) {
      case ("moov", mfrom, mto) =>
        mp4Walk(bytes, mfrom, mto) {
          case ("trak", tfrom, tto) =>
            var handler = ""; var codec = ""
            var w = 0; var h = 0
            var timescale = 0L; var ach = 0; var abits = 0
            var sizes: Array[Long] = Array.empty
            var stscEntries: Array[(Long, Long)] = Array.empty
            var chunkOffs: Array[Long] = Array.empty
            // a table whose declared entry count can't physically fit
            // in its box (or, for uniform stsz, in the whole file) is
            // hostile: abort the track BEFORE allocating — a forged
            // sample_count of 2^31-1 must not drive Array.fill
            var hostileTables = false
            mp4Walk(bytes, tfrom, tto) {
              case ("mdia", dfrom, dto) =>
                mp4Walk(bytes, dfrom, dto) {
                  case ("hdlr", from, _) => handler = cc4(bytes, from + 8)
                  case ("mdhd", from, _) =>
                    // media timescale — for uncompressed PCM this IS
                    // the sample rate; v1 boxes carry 64-bit times so
                    // the field moves +12 → +20 (mp4Meta's rule)
                    timescale =
                      if ((bytes(from) & 0xff) == 1) u32(bytes, from + 20)
                      else u32(bytes, from + 12)
                  case ("minf", ifrom, ito) =>
                    mp4Walk(bytes, ifrom, ito) {
                      case ("stbl", sfrom, sto) =>
                        mp4Walk(bytes, sfrom, sto) {
                          case ("stsd", from, to) =>
                            if (u32(bytes, from + 4) >= 1L &&
                                to - from >= 16) {
                              codec = cc4(bytes, from + 12)
                              if (to - from >= 16 + 28) {
                                w = u16(bytes, from + 16 + 24)
                                h = u16(bytes, from + 16 + 26)
                                // AudioSampleEntry layout of the same
                                // region: channelcount/samplesize at
                                // body offsets 16/18 (used only when
                                // the hdlr says soun)
                                ach = u16(bytes, from + 16 + 16)
                                abits = u16(bytes, from + 16 + 18)
                              }
                            }
                          case ("stsz", from, to) =>
                            val uniform = u32(bytes, from + 4)
                            val n = u32(bytes, from + 8)
                            // uniform: n samples of `uniform` bytes
                            // each can't exceed the file; per-sample:
                            // n u32 entries must fit in the box
                            val cap =
                              if (uniform != 0L) bytes.length / uniform
                              else math.max(to - (from + 12), 0).toLong / 4
                            if (n > cap) hostileTables = true
                            else sizes =
                              if (uniform != 0L)
                                Array.fill(n.toInt)(uniform)
                              else Array.tabulate(n.toInt)(i =>
                                u32(bytes, from + 12 + i * 4))
                          case ("stsc", from, to) =>
                            val n = u32(bytes, from + 4)
                            val cap = math.max(to - (from + 8), 0).toLong / 12
                            if (n > cap) hostileTables = true
                            else stscEntries =
                              Array.tabulate(n.toInt)(i => (
                                u32(bytes, from + 8 + i * 12),
                                u32(bytes, from + 12 + i * 12)))
                          case ("stco", from, to) =>
                            val n = u32(bytes, from + 4)
                            val cap = math.max(to - (from + 8), 0).toLong / 4
                            if (n > cap) hostileTables = true
                            else chunkOffs = Array.tabulate(n.toInt)(i =>
                              u32(bytes, from + 8 + i * 4))
                          case _ => ()
                        }
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
            // resolve samples chunk by chunk: chunk c (1-based) takes
            // its samples-per-chunk from the last stsc entry whose
            // first_chunk <= c; samples are consecutive from the
            // chunk's stco offset
            val samples = Seq.newBuilder[Array[Byte]]
            var si = 0
            var c = 0
            var aborted = hostileTables
            while (c < chunkOffs.length && si < sizes.length && !aborted) {
              val perChunk = stscEntries
                .filter(_._1 <= c + 1)
                .lastOption.map(_._2.toInt).getOrElse(0)
              var off = chunkOffs(c)
              var j = 0
              while (j < perChunk && si < sizes.length && !aborted) {
                val len = sizes(si)
                if (off < 0 || len < 0 || off + len > bytes.length)
                  aborted = true // hostile table: never read past the buffer
                else {
                  samples += java.util.Arrays.copyOfRange(bytes,
                    off.toInt, (off + len).toInt)
                  off += len
                  si += 1
                  j += 1
                }
              }
              c += 1
            }
            if (handler == "soun") { w = 0; h = 0 }
            else { ach = 0; abits = 0 }
            out += Mp4TrackSamples(handler, codec, w, h,
              samples.result(), timescale, ach, abits)
          case _ => ()
        }
      case _ => ()
    }
    out.result()
  }

  /** REAL pixel decode from an MP4 container — the rawvideo path that
    * shrinks the video stub to compressed codecs only: demux the
    * `raw ` video track's samples ([[mp4Samples]]), interpret each as
    * an RGB24 frame (w·h·3 bytes, row-major — the uncompressed
    * sample-entry layout; size-mismatched samples are skipped, the
    * honest malformed-input posture), keep every `everyN`-th, and
    * report decoded dims + mean channel value (6dp HALF_UP, as
    * [[sampleGifFrames]]). Lossless by construction, so the oracle
    * pins the per-pixel means bit-exactly — unlike the MJPEG path's
    * measured-through-a-lossy-codec contract. */
  def sampleMp4RawFrames(media: DataFrame, everyN: Int = 2): DataFrame = {
    require(everyN > 0,
      s"sampleMp4RawFrames: everyN must be positive ($everyN)")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Nil
        else try {
          mp4Samples(bytes)
            .filter(t => t.handler == "vide" && t.codec == "raw " &&
              t.width > 0 && t.height > 0)
            .flatMap { t =>
              val frameLen = t.width.toLong * t.height * 3
              (0 until t.samples.length by everyN).flatMap { f =>
                val s = t.samples(f)
                if (s.length.toLong != frameLen) None
                else {
                  var sum = 0L
                  var i = 0
                  while (i < s.length) { sum += s(i) & 0xff; i += 1 }
                  val mean = java.math.BigDecimal
                    .valueOf(sum.toDouble / frameLen)
                    .setScale(6, java.math.RoundingMode.HALF_UP)
                    .doubleValue()
                  Some((id, f, t.width, t.height, mean))
                }
              }
            }
        } catch { case _: Exception => Nil }
      }
      .toDF("media_id", "frame_ordinal", "width", "height", "mean_rgb")
  }

  /** REAL PCM out of an MP4 container — the audio twin of
    * [[sampleMp4RawFrames]], shrinking the declared stub to
    * COMPRESSED codecs on both media types: demux the `soun` track
    * whose stsd declares uncompressed 16-bit PCM (`sowt`
    * little-endian / `twos` big-endian — the QuickTime raw-PCM
    * fourcc pair) through the same stco/stsc/stsz algebra, honor the
    * AudioSampleEntry's channel count / sample size and the stsd
    * byte order, take the sample rate from the mdhd timescale (the
    * PCM convention), and fold the interleaved stream through the
    * WAV path's exact peak/RMS kernel ([[decodeAudio]] — sequential
    * sum of 16-bit squares, 6-dp HALF_UP RMS, so the output is
    * SQL-oracle-reproducible). Containers with no decodable PCM
    * track degrade to the -1 sentinel row, the [[decodeAudio]]
    * posture; compressed audio (mp4a/opus) stays the declared stub
    * exactly like compressed video. */
  def decodeMp4PcmAudio(media: DataFrame): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val pcm =
            if (bytes == null) None
            else try mp4Samples(bytes).find(t =>
              t.handler == "soun" &&
                (t.codec == "sowt" || t.codec == "twos") &&
                t.channels > 0 && t.sampleBits == 16 && t.timescale > 0)
            catch { case _: Exception => None }
          pcm match {
            case None => DecodedAudio(id, -1, -1, -1, -1L, -1, -1.0)
            case Some(tr) =>
              val le = tr.codec == "sowt"
              var peak = 0
              var sumSq = 0L // exact: 16-bit squares, < 2^53 per clip
              var n = 0L
              tr.samples.foreach { s =>
                var i = 0
                while (i + 1 < s.length) {
                  val v =
                    (if (le) (s(i + 1) << 8) | (s(i) & 0xff)
                     else (s(i) << 8) | (s(i + 1) & 0xff)).toShort.toInt
                  val a = math.abs(v)
                  if (a > peak) peak = a
                  sumSq += v.toLong * v
                  n += 1
                  i += 2
                }
              }
              val rms =
                if (n == 0) 0.0
                else java.math.BigDecimal
                  .valueOf(math.sqrt(sumSq.toDouble / n))
                  .setScale(6, java.math.RoundingMode.HALF_UP)
                  .doubleValue()
              DecodedAudio(id, tr.timescale.toInt, tr.channels,
                tr.sampleBits, n / tr.channels, peak, rms)
          }
        }
      }
  }

  // ---- WebM (EBML) ----

  private def ebmlIdBytes(id: Long): Array[Byte] = {
    // element IDs are stored verbatim (marker included); width from
    // the leading byte
    val n = if (id <= 0xff) 1 else if (id <= 0xffff) 2
            else if (id <= 0xffffff) 3 else 4
    Array.tabulate[Byte](n)(i => ((id >> (8 * (n - 1 - i))) & 0xff).toByte)
  }
  private def ebmlVint(v: Long): Array[Byte] = {
    // data-size VINT: n length-marker bits, 7n-bit payload
    var n = 1
    while (n < 8 && v >= (1L << (7 * n)) - 1) n += 1
    val marked = v | (1L << (7 * n))
    Array.tabulate[Byte](n)(i =>
      ((marked >> (8 * (n - 1 - i))) & 0xff).toByte)
  }
  private def ebmlEl(id: Long, body: Array[Byte]): Array[Byte] =
    Array.concat(ebmlIdBytes(id), ebmlVint(body.length.toLong), body)
  private def ebmlUint(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && v >= (1L << (8 * n))) n += 1
    Array.tabulate[Byte](n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  /** Minimal-but-well-formed WebM container: EBML header (DocType
    * "webm") + Segment(Info(TimecodeScale, Duration), Tracks(
    * TrackEntry(TrackNumber, TrackType, CodecID, Video(PixelWidth,
    * PixelHeight)))). No Clusters — frame data is exactly the part
    * that stays stubbed (no JDK VP8/VP9 codec); the declared
    * metadata is real EBML, which [[webmMeta]] re-reads by varint
    * walking. */
  def webmBytes(codecId: String, width: Int, height: Int,
                durationMs: Double, timecodeScale: Long = 1000000L,
                streamedSegment: Boolean = false)
      : Array[Byte] = {
    val header = ebmlEl(0x1A45DFA3L, Array.concat(
      ebmlEl(0x4286L, ebmlUint(1)),        // EBMLVersion
      ebmlEl(0x42F7L, ebmlUint(1)),        // EBMLReadVersion
      ebmlEl(0x42F2L, ebmlUint(4)),        // EBMLMaxIDLength
      ebmlEl(0x42F3L, ebmlUint(8)),        // EBMLMaxSizeLength
      ebmlEl(0x4282L, "webm".getBytes("US-ASCII")), // DocType
      ebmlEl(0x4287L, ebmlUint(2)),        // DocTypeVersion
      ebmlEl(0x4285L, ebmlUint(2))))       // DocTypeReadVersion
    val durBits = java.lang.Double.doubleToLongBits(durationMs)
    val info = ebmlEl(0x1549A966L, Array.concat(
      ebmlEl(0x2AD7B1L, ebmlUint(timecodeScale)),
      ebmlEl(0x4489L, Array.tabulate[Byte](8)(i =>
        ((durBits >> (8 * (7 - i))) & 0xff).toByte))))
    val video = ebmlEl(0xE0L, Array.concat(
      ebmlEl(0xB0L, ebmlUint(width.toLong)),
      ebmlEl(0xBAL, ebmlUint(height.toLong))))
    val trackEntry = ebmlEl(0xAEL, Array.concat(
      ebmlEl(0xD7L, ebmlUint(1)),          // TrackNumber
      ebmlEl(0x73C5L, ebmlUint(1)),        // TrackUID
      ebmlEl(0x83L, ebmlUint(1)),          // TrackType: video
      ebmlEl(0x86L, codecId.getBytes("US-ASCII")),
      video))
    val tracks = ebmlEl(0x1654AE6BL, trackEntry)
    val segBody = Array.concat(info, tracks)
    // streamed/live-remuxed form: the Segment's size is the
    // unknown-size VINT (all length bits set) — the element runs to
    // end-of-stream; webmMeta must resolve it to the region end
    val segment =
      if (streamedSegment) Array.concat(ebmlIdBytes(0x18538067L),
        0x01.toByte +: Array.fill[Byte](7)(0xff.toByte), segBody)
      else ebmlEl(0x18538067L, segBody)
    Array.concat(header, segment)
  }

  /** Parsed WebM/EBML declaration. */
  final case class WebmMeta(docType: String, timecodeScale: Long,
                            trackNumber: Long, trackType: Long,
                            codecId: String, width: Int, height: Int,
                            durationMs: Double)

  /** Read an EBML element ID (marker kept) and its width. */
  private def ebmlReadId(b: Array[Byte], off: Int): (Long, Int) = {
    val first = b(off) & 0xff
    val n = if ((first & 0x80) != 0) 1 else if ((first & 0x40) != 0) 2
            else if ((first & 0x20) != 0) 3 else 4
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    (v, n)
  }
  /** Read a data-size VINT (marker stripped) and its width. */
  private def ebmlReadVint(b: Array[Byte], off: Int): (Long, Int) = {
    val first = b(off) & 0xff
    var n = 1
    var mask = 0x80
    while (n <= 8 && (first & mask) == 0) { n += 1; mask >>= 1 }
    var v = (first & (mask - 1)).toLong
    var i = 1
    while (i < n) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    (v, n)
  }
  private def ebmlUintAt(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L; var i = 0
    while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  /** Parse the WebM declaration by walking the EBML tree — the same
    * triage-without-decode probe as [[mp4Meta]] for the other major
    * web container. Master elements (EBML header, Segment, Info,
    * Tracks, TrackEntry, Video) recurse; leaves fill the card. */
  def webmMeta(bytes: Array[Byte]): WebmMeta = {
    var docType = ""; var tcs = 1000000L; var trackNo = 0L
    var trackType = 0L; var codec = ""; var w = 0; var h = 0
    var dur = 0.0
    val masters = Set(0x1A45DFA3L, 0x18538067L, 0x1549A966L,
      0x1654AE6BL, 0xAEL, 0xE0L)
    def walk(from: Int, to: Int): Unit = {
      var off = from
      while (off < to) {
        val (id, idw) = ebmlReadId(bytes, off)
        val (sz, szw) = ebmlReadVint(bytes, off + idw)
        val body = off + idw + szw
        // all-ones payload is the UNKNOWN-SIZE VINT — standard for the
        // Segment element in streamed/live-remuxed WebM: the element
        // extends to the end of the enclosing region (master only; an
        // unknown-size leaf is unparseable, so the walk stops there)
        val unknown = sz == (1L << (7 * szw)) - 1
        val endL = if (unknown) to.toLong else body.toLong + sz
        if (endL > to) return // malformed: never read past the region
        val end = endL.toInt
        if (masters.contains(id)) walk(body, end)
        else if (unknown) return
        else id match {
          case 0x4282L => docType = new String(bytes, body, sz.toInt,
            "US-ASCII")
          case 0x2AD7B1L => tcs = ebmlUintAt(bytes, body, sz.toInt)
          case 0x4489L =>
            dur =
              if (sz == 4L) java.lang.Float.intBitsToFloat(
                ebmlUintAt(bytes, body, 4).toInt).toDouble
              else java.lang.Double.longBitsToDouble(
                ebmlUintAt(bytes, body, 8))
          case 0xD7L => trackNo = ebmlUintAt(bytes, body, sz.toInt)
          case 0x83L => trackType = ebmlUintAt(bytes, body, sz.toInt)
          case 0x86L => codec = new String(bytes, body, sz.toInt,
            "US-ASCII")
          case 0xB0L => w = ebmlUintAt(bytes, body, sz.toInt).toInt
          case 0xBAL => h = ebmlUintAt(bytes, body, sz.toInt).toInt
          case _ => ()
        }
        off = end
      }
    }
    walk(0, bytes.length)
    WebmMeta(docType, tcs, trackNo, trackType, codec, w, h, dur)
  }

  /** MP4 container probe over a media table — one row per declared
    * track, from a real box walk (no decode). */
  def probeMp4(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Nil
        else try {
          val (brand, mts, mdur, tracks) = mp4Meta(bytes)
          tracks.zipWithIndex.map { case (t, i) =>
            (id, brand, mts, mdur, i, t.handler, t.codec, t.timescale,
              t.durationTicks, t.nSamples, t.sampleBytes, t.width,
              t.height)
          }
        } catch { case _: Exception => Nil }
      }
      .toDF("media_id", "brand", "movie_timescale", "movie_duration",
        "track_ordinal", "handler", "codec", "timescale",
        "duration_ticks", "n_samples", "sample_bytes", "width", "height")
  }

  /** WebM declaration probe over a media table — one row per
    * container. */
  def probeWebm(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Nil
        else try {
          val m = webmMeta(bytes)
          Some((id, m.docType, m.timecodeScale, m.trackNumber,
            m.trackType, m.codecId, m.width, m.height, m.durationMs))
        } catch { case _: Exception => None }
      }
      .toDF("media_id", "doc_type", "timecode_scale", "track_number",
        "track_type", "codec_id", "width", "height", "duration_ms")
  }

  /** STUB frame sampling — splits the payload into fixed-size chunks
    * and keeps every `everyN`-th (a real impl keyframe-samples with a
    * codec). Generator shape: one video row → N frame rows via
    * explode, preserving frame ordinals. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 8,
                   everyN: Int = 2): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes0) =>
        // null content → no frames (mirrors decodeImages' null handling)
        val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
        bytes.grouped(frameBytes).zipWithIndex
          .filter(_._2 % everyN == 0)
          .map { case (frame, ordinal) => (id, ordinal, frame) }
      }
      .toDF("media_id", "frame_ordinal", "frame")
  }
}
