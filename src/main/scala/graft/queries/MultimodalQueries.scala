package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.operators.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal plumbing through the driver contract: binary payloads
  * are synthesized deterministically, decoded, and checked against
  * constructive oracles (the oracle recomputes the expected stats from
  * the same construction — it never parses bytes). Images use the fake
  * GIMG header; audio payloads are REAL WAV containers written and
  * decoded through `javax.sound.sampled`; video payloads are REAL
  * animated GIFs written and frame-iterated through `javax.imageio` —
  * the audio/video queries exercise honest codec round-trips end to
  * end.
  */
object MultimodalQueries {

  /** Deterministic WAV corpus over `part`: per-key sample rate /
    * channel count / frame count, 16-bit samples from a fixed integer
    * recurrence — every decoded stat is predictable in SQL. */
  private[graft] def audioMedia(env: Env): DataFrame = {
    val spark = env.spark
    import spark.implicits._
    // The few-MB key file packs into ONE scan split, which would run
    // the whole per-row codec generator on a single core (measured
    // 46s for 200k rows at sf1); the generator is embarrassingly
    // parallel, so spread the keys first — a real media table arrives
    // in thousands of splits and needs no such step.
    env.part.select(col("p_partkey").cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .map { key =>
      val sampleRate = (8000 + (key % 3) * 4000).toInt
      val channels = (1 + key % 2).toInt
      val nFrames = (50 + key % 100).toInt
      val samples = Array.tabulate[Short](nFrames * channels)(i =>
        ((key * 31 + i.toLong * 17) % 65536 - 32768).toShort)
      (key, graft.operators.Multimodal.wavBytes(sampleRate, channels, samples))
    }.toDF("media_id", "content")
  }

  def mmAudioStats(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.col
    Multimodal.decodeAudio(audioMedia(env)).toDF()
      .select(col("mediaId").as("media_id"),
              col("sampleRate").as("sample_rate"), col("channels"),
              col("bitsPerSample").as("bits_per_sample"),
              col("nFrames").as("n_frames"), col("peak"), col("rms"))
      .orderBy(col("media_id"))
  }

  /** The per-clip audio-stats oracle: recomputes peak/RMS from the
    * planted 16-bit tone recurrence — shared verbatim by the WAV
    * corpus (mm_audio_stats) and the PCM-in-MP4 corpus (mm_audio_mp4),
    * which plant the SAME samples behind different containers. */
  private val audioStatsSql: String =
    """WITH m AS (
      |  SELECT CAST(p_partkey AS BIGINT) AS media_id,
      |    CAST(8000 + (p_partkey % 3) * 4000 AS INT) AS sample_rate,
      |    CAST(1 + p_partkey % 2 AS INT) AS channels,
      |    CAST(50 + p_partkey % 100 AS BIGINT) AS n_frames
      |  FROM part),
      |s AS (SELECT media_id, sample_rate, channels, n_frames,
      |        unnest(range(0, n_frames * channels)) AS i
      |      FROM m),
      |v AS (SELECT media_id, sample_rate, channels, n_frames,
      |        (media_id * 31 + i * 17) % 65536 - 32768 AS sample
      |      FROM s)
      |SELECT media_id, sample_rate, channels,
      |  CAST(16 AS INT) AS bits_per_sample, n_frames,
      |  CAST(max(abs(sample)) AS INT) AS peak,
      |  round(sqrt(CAST(sum(sample * sample) AS DOUBLE) / count(*)), 6)
      |    AS rms
      |FROM v
      |GROUP BY media_id, sample_rate, channels, n_frames
      |ORDER BY media_id""".stripMargin

  /** Deterministic PCM-in-MP4 corpus over `part`: per key a two-track
    * container — an opaque compressed video track (so chunk offsets
    * cross track boundaries for real) plus a `soun` track whose stsd
    * declares uncompressed 16-bit PCM, `sowt` (little-endian) for
    * even keys and `twos` (big-endian) for odd — the SAME planted
    * tone as [[audioMedia]] serialized in both byte orders, sliced
    * into frame-aligned byte runs so the stco/stsc/stsz algebra does
    * real work. */
  private[graft] def mp4PcmMedia(env: Env): DataFrame = {
    val spark = env.spark
    import spark.implicits._
    env.part.select(col("p_partkey").cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism) // see audioMedia
      .map { key =>
        val sampleRate = 8000L + (key % 3) * 4000L
        val channels = (1 + key % 2).toInt
        val nFrames = (50 + key % 100).toInt
        val codec = if (key % 2 == 0) "sowt" else "twos"
        val le = codec == "sowt"
        val pcm = new Array[Byte](nFrames * channels * 2)
        var i = 0
        while (i < nFrames * channels) {
          val v = ((key * 31 + i.toLong * 17) % 65536 - 32768).toShort
          if (le) {
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          } else {
            pcm(2 * i) = ((v >> 8) & 0xff).toByte
            pcm(2 * i + 1) = (v & 0xff).toByte
          }
          i += 1
        }
        val aN = (3 + key % 3).toInt
        val aSizes = Seq.tabulate(aN)(j =>
          (nFrames / aN + (if (j < nFrames % aN) 1 else 0)) * channels * 2)
        val vN = (2 + key % 4).toInt
        val vSizes = Seq.tabulate(vN)(j => (30 + (key + j) % 40).toInt)
        val video = Array.tabulate[Byte](vSizes.sum)(j =>
          ((key + j) % 256).toByte)
        (key, Multimodal.mp4Bytes(1000L, vN * 100L, Seq(
          ("vide", "avc1", 1000L, 100L, vSizes, 16, 16),
          ("soun", codec, sampleRate, 1L, aSizes, channels, 16)),
          payload = Some(Array.concat(video, pcm))))
      }.toDF("media_id", "content")
  }

  /** Real PCM decode out of an MP4 end to end: container write (true
    * stco offsets across a video track) → sample-table demux → byte-
    * order-honoring s16 fold → the WAV path's peak/RMS stats. Shares
    * [[audioStatsSql]] with mm_audio_stats — same tones, different
    * container — so the audio stub now covers compressed codecs only,
    * matching the video side. */
  def mmAudioMp4(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.col
    Multimodal.decodeMp4PcmAudio(mp4PcmMedia(env)).toDF()
      .select(col("mediaId").as("media_id"),
              col("sampleRate").as("sample_rate"), col("channels"),
              col("bitsPerSample").as("bits_per_sample"),
              col("nFrames").as("n_frames"), col("peak"), col("rms"))
      .orderBy(col("media_id"))
  }

  def mmAudioWindows(env: Env): DataFrame =
    Multimodal.sampleAudioWindows(audioMedia(env),
        windowFrames = 32, everyN = 2)
      .orderBy($"media_id", $"window_ordinal")

  /** Deterministic animated-GIF corpus over `part`: per-key frame
    * count / dimensions (height ≥ 5 — see [[Multimodal.gifBytes]] on
    * the JDK reader's short-image quirk), solid-gray frames from a
    * fixed integer recurrence so every decoded frame stat is
    * predictable in SQL. */
  private[graft] def videoMedia(env: Env): DataFrame = {
    val spark = env.spark
    import spark.implicits._
    // single-split key file → parallelize the generator (see audioMedia)
    env.part.select(col("p_partkey").cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .map { key =>
      val n = (2 + key % 4).toInt
      val w = (5 + key % 6).toInt
      val h = (5 + key % 4).toInt
      val frames = (0 until n).map(f =>
        Multimodal.grayFrame(w, h, ((key * 37 + f * 19) % 256).toInt))
      (key, Multimodal.gifBytes(frames))
    }.toDF("media_id", "content")
  }

  /** Real GIF frame sampling end to end: encode → iterate true frames
    * → per-frame dims + exact mean gray level, every 2nd frame. */
  def mmVideoFrames(env: Env): DataFrame =
    Multimodal.sampleGifFrames(videoMedia(env), everyN = 2)
      .orderBy($"media_id", $"frame_ordinal")

  /** Per-key AVI/MJPEG clip: a real RIFF container around real
    * JDK-JPEG frames. Solid-gray RGB frames — measured exact through
    * the lossy codec (see [[graft.operators.Multimodal.rgbFrame]]), so
    * the oracle pins the decoded means like the GIF path. */
  private[graft] def aviMedia(env: Env): DataFrame = {
    val spark = env.spark
    import spark.implicits._
    env.part.select(col("p_partkey").cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism) // see audioMedia
      .map { key =>
        val n = (2 + key % 4).toInt
        val w = (6 + key % 6).toInt
        val h = (6 + key % 4).toInt
        val frames = (0 until n).map(f =>
          Multimodal.rgbFrame(w, h, ((key * 41 + f * 23) % 256).toInt))
        (key, Multimodal.aviMjpegBytes(frames))
      }.toDF("media_id", "content")
  }

  /** Real AVI/MJPEG frame sampling end to end: RIFF walk → JPEG decode
    * → per-frame dims + mean, every 2nd frame. */
  def mmVideoAvi(env: Env): DataFrame =
    Multimodal.sampleAviFrames(aviMedia(env), everyN = 2)
      .orderBy($"media_id", $"frame_ordinal")

  /** REAL image decode end to end: per-key solid-gray PNG written
    * through the real encoder (lossless RGB — no palette quirks),
    * decoded by the SPI-cached ImageIO path; emits the true decoded
    * dimensions. nBytes is intentionally NOT projected — PNG byte size
    * is compressor-dependent and not constructively predictable. */
  def mmImageDecode(env: Env): DataFrame = {
    val spark = env.spark
    import spark.implicits._
    val media = env.part.select(col("p_partkey").cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism) // see audioMedia
      .map { key =>
        val w = (3 + key % 7).toInt
        val h = (2 + key % 5).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val v = ((key * 29) % 256).toInt
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1 }
          y += 1
        }
        (key, Multimodal.pngBytes(img))
      }.toDF("media_id", "content")
    Multimodal.decodeImages(media).toDF()
      .select(col("mediaId").as("media_id"), col("width"), col("height"))
      .orderBy(col("media_id"))
  }

  def mmMediaDecode(env: Env): DataFrame = {
    val w = ($"p_partkey" % 640 + 1).cast("int")
    val h = ($"p_partkey" % 480 + 1).cast("int")
    val content = concat(lit("GIMG|"), w, lit("|"), h, lit("|"), $"p_name")
      .cast("binary")
    val media = env.part.select($"p_partkey".as("media_id"), content.as("content"))
    Multimodal.decodeImages(media).toDF()
      .select($"mediaId".as("media_id"), $"width", $"height",
              $"nBytes".as("n_bytes"))
      .join(media.select($"media_id", md5($"content").as("content_md5")),
            "media_id")
      .orderBy($"media_id")
  }

  /** Constructive NEAR-DUP image corpus over `part`: keys group into
    * triples by base = key/3; each key renders a 16×16 RGB PNG whose
    * 2×2 tiles encode a 63-bit pattern (bits from md5(base) hex — so
    * distinct bases sit at hamming ~31, unreachable by the dedup
    * threshold). Keys 3b and 3b+1 are pixel-identical; key 3b+2 flips
    * tiles 5 and 20 (hamming exactly 2). Real encode → decode → aHash
    * recovers the planted pattern bit-for-bit (constant 2×2 tiles,
    * lossless PNG), which is what makes the pair set SQL-predictable.
    */
  private[graft] def phashMedia(env: Env): DataFrame = {
    val spark = env.spark
    import spark.implicits._
    env.part.select(col("p_partkey").cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism) // see audioMedia
      .map { key =>
        val base = key / 3
        val hex = graft.functions.TextNorm.md5Hex(base.toString)
        def bit(i: Int): Boolean = {
          val planted =
            ((Character.digit(hex.charAt(i / 4), 16) >> (i % 4)) & 1) == 1
          planted ^ (key % 3 == 2 && (i == 5 || i == 20))
        }
        val img = new java.awt.image.BufferedImage(
          16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var t = 0
        while (t < 64) {
          val v = if (t < 63 && bit(t)) 0xffffff else 0
          val tx = (t % 8) * 2; val ty = (t / 8) * 2
          img.setRGB(tx, ty, v);     img.setRGB(tx + 1, ty, v)
          img.setRGB(tx, ty + 1, v); img.setRGB(tx + 1, ty + 1, v)
          t += 1
        }
        (key, Multimodal.pngBytes(img))
      }.toDF("media_id", "content")
  }

  /** Perceptual-hash image dedup end to end: real PNG decode →
    * area-average aHash → banded candidate join → exact hamming ≤ 3.
    */
  def mmImagePhashDedup(env: Env): DataFrame =
    Multimodal.aHashDedupPairs(phashMedia(env), maxHamming = 3)
      .orderBy($"media_a", $"media_b")

  /** Deterministic MP4 corpus over `part`: per key a two-track
    * container (video + audio) whose codec fourccs, timescales,
    * per-sample size tables and tick deltas follow fixed integer
    * recurrences — every declared quantity the box walk recovers is
    * predictable in SQL. Frame payload stays opaque (the honest stub
    * boundary: no JDK H.264/VP9 codec); the BOX TREE is real. */
  private[graft] def mp4Media(env: Env): DataFrame = {
    val spark = env.spark
    import spark.implicits._
    env.part.select(col("p_partkey").cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism) // see audioMedia
      .map { key =>
        val vN = (2 + key % 4).toInt
        val vDelta = 100 + key % 7
        val vTs = 1000L * (1 + key % 3)
        val vSizes = Seq.tabulate(vN)(i =>
          (50 + (key * 13 + i * 7) % 100).toInt)
        val aN = (4 + key % 3).toInt
        val aTs = 8000L + (key % 3) * 4000L
        val aSizes = Seq.tabulate(aN)(i =>
          (20 + (key * 11 + i * 5) % 50).toInt)
        val w = (16 * (1 + key % 5)).toInt
        val h = (16 * (1 + key % 3)).toInt
        val codec = if (key % 2 == 0) "avc1" else "vp09"
        (key, Multimodal.mp4Bytes(1000L, vN * vDelta, Seq(
          ("vide", codec, vTs, vDelta, vSizes, w, h),
          ("soun", "mp4a", aTs, 1024L, aSizes, 0, 0))))
      }.toDF("media_id", "content")
  }

  /** MP4 container probe end to end: synthesize the box tree, walk it
    * back ([[Multimodal.mp4Meta]]), report per-track codec, sample
    * count, tick duration and declared byte volume — the
    * decode-nothing triage card a video intake runs first. */
  def mmVideoMp4Meta(env: Env): DataFrame =
    Multimodal.probeMp4(mp4Media(env))
      .select($"media_id", $"track_ordinal", $"handler", $"codec",
        $"movie_duration", $"timescale", $"duration_ticks",
        $"n_samples", $"sample_bytes", $"width", $"height")
      .orderBy($"media_id", $"track_ordinal")

  /** Deterministic RAWVIDEO MP4 corpus over `part`: per key a
    * two-track container (a `raw ` RGB24 video track whose mdat
    * payload IS the pixels, plus an opaque audio track so the chunk
    * offsets cross track boundaries for real) with REAL stco file
    * offsets. Pixel (x, y) of frame f carries
    * (key·41 + f·23 + x·7 + y·3) mod 256 in all three channels — a
    * per-pixel gradient, so the oracle's mean pins true pixel-level
    * decode, not just frame slicing. */
  private[graft] def mp4RawMedia(env: Env): DataFrame = {
    val spark = env.spark
    import spark.implicits._
    env.part.select(col("p_partkey").cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism) // see audioMedia
      .map { key =>
        val n = (2 + key % 4).toInt
        val w = (4 + key % 5).toInt
        val h = (3 + key % 4).toInt
        val frames = (0 until n).map { f =>
          Array.tabulate[Byte](w * h * 3) { i =>
            val p = i / 3
            ((key * 41 + f * 23 + (p % w) * 7 + (p / w) * 3) % 256).toByte
          }
        }
        val aN = (3 + key % 2).toInt
        val aSizes = Seq.tabulate(aN)(i => (10 + (key + i) % 20).toInt)
        val audio = Array.tabulate[Byte](aSizes.sum)(i =>
          ((key + i) % 256).toByte)
        (key, Multimodal.mp4Bytes(1000L, n * 100L, Seq(
          ("vide", "raw ", 1000L, 100L, frames.map(_.length), w, h),
          ("soun", "mp4a", 8000L, 1024L, aSizes, 0, 0)),
          payload = Some(Array.concat(frames :+ audio: _*))))
      }.toDF("media_id", "content")
  }

  /** REAL pixels out of an MP4 end to end: container write (true stco
    * offsets) → sample-table demux ([[Multimodal.mp4Samples]]) →
    * RGB24 interpretation → per-frame dims + gradient mean, every 2nd
    * frame. Lossless, so the oracle recomputes the means bit-exactly
    * from the planted per-pixel pattern — the video stub now covers
    * compressed codecs only. */
  def mmVideoRawFrames(env: Env): DataFrame =
    Multimodal.sampleMp4RawFrames(mp4RawMedia(env), everyN = 2)
      .orderBy($"media_id", $"frame_ordinal")

  /** Deterministic WebM corpus over `part`: per key one video
    * TrackEntry whose codec, dimensions and float64 duration follow
    * fixed recurrences; real EBML varint encoding throughout. */
  private[graft] def webmMedia(env: Env): DataFrame = {
    val spark = env.spark
    import spark.implicits._
    env.part.select(col("p_partkey").cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism) // see audioMedia
      .map { key =>
        val codec = if (key % 2 == 0) "V_VP9" else "V_VP8"
        val w = (64 + 16 * (key % 8)).toInt
        val h = (48 + 16 * (key % 6)).toInt
        val durMs = 500.0 + (key % 20) * 40.0
        (key, Multimodal.webmBytes(codec, w, h, durMs))
      }.toDF("media_id", "content")
  }

  /** WebM declaration probe end to end: EBML write → varint walk →
    * DocType/TimecodeScale/codec/dimensions/duration. The float64
    * Duration survives bit-exactly (written and re-read as IEEE
    * bits; the oracle's arithmetic is exact in binary). */
  def mmVideoWebmMeta(env: Env): DataFrame =
    Multimodal.probeWebm(webmMedia(env))
      .orderBy($"media_id")

  val entries: Seq[Q] = Seq(
    // the oracle replants the md5-bit pattern per key and pairs by
    // exact hamming — the quadratic join is oracle-side only (the
    // Spark side pairs via the 4-band pigeonhole equi-join)
    Q.sql("mm_image_phash_dedup", mmImagePhashDedup,
      """WITH k AS (SELECT CAST(p_partkey AS BIGINT) AS key FROM part),
        |v AS (
        |  SELECT key, CAST(list_sum(list_transform(range(0, 63), i ->
        |    CASE WHEN (
        |      ((strpos('0123456789abcdef',
        |                substr(md5(CAST(key // 3 AS VARCHAR)),
        |                       CAST(1 + i // 4 AS INT), 1)) - 1)
        |        >> CAST(i % 4 AS INT)) % 2 = 1)
        |      <> (key % 3 = 2 AND (i = 5 OR i = 20))
        |    THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END))
        |    AS BIGINT) AS h
        |  FROM k)
        |SELECT a.key AS media_a, b.key AS media_b,
        |       CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
        |FROM v a JOIN v b ON a.key < b.key
        |WHERE bit_count(xor(a.h, b.h)) <= 3
        |ORDER BY media_a, media_b""".stripMargin),

    Q.sql("mm_image_decode", mmImageDecode,
      """SELECT CAST(p_partkey AS BIGINT) AS media_id,
        |  CAST(3 + p_partkey % 7 AS INT) AS width,
        |  CAST(2 + p_partkey % 5 AS INT) AS height
        |FROM part
        |ORDER BY media_id""".stripMargin),

    Q.sql("mm_video_frames", mmVideoFrames,
      """WITH m AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS media_id,
        |    2 + p_partkey % 4 AS n_frames,
        |    CAST(5 + p_partkey % 6 AS INT) AS width,
        |    CAST(5 + p_partkey % 4 AS INT) AS height
        |  FROM part),
        |f AS (
        |  SELECT media_id, width, height,
        |    CAST(unnest(range(0, n_frames)) AS INT) AS frame_ordinal
        |  FROM m)
        |SELECT media_id, frame_ordinal, width, height,
        |  CAST((media_id * 37 + frame_ordinal * 19) % 256 AS DOUBLE)
        |    AS mean_rgb
        |FROM f
        |WHERE frame_ordinal % 2 = 0
        |ORDER BY media_id, frame_ordinal""".stripMargin),

    Q.sql("mm_video_avi", mmVideoAvi,
      """WITH m AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS media_id,
        |    2 + p_partkey % 4 AS n_frames,
        |    CAST(6 + p_partkey % 6 AS INT) AS width,
        |    CAST(6 + p_partkey % 4 AS INT) AS height
        |  FROM part),
        |f AS (
        |  SELECT media_id, width, height,
        |    CAST(unnest(range(0, n_frames)) AS INT) AS frame_ordinal
        |  FROM m)
        |SELECT media_id, frame_ordinal, width, height,
        |  CAST((media_id * 41 + frame_ordinal * 23) % 256 AS DOUBLE)
        |    AS mean_rgb
        |FROM f
        |WHERE frame_ordinal % 2 = 0
        |ORDER BY media_id, frame_ordinal""".stripMargin),

    Q.sql("mm_media_decode", mmMediaDecode,
      """WITH m AS (
        |  SELECT p_partkey AS media_id,
        |    CAST(p_partkey % 640 + 1 AS INT) AS width,
        |    CAST(p_partkey % 480 + 1 AS INT) AS height,
        |    'GIMG|' || (p_partkey % 640 + 1) || '|' || (p_partkey % 480 + 1)
        |      || '|' || p_name AS s
        |  FROM part)
        |SELECT media_id, width, height,
        |  CAST(length(s) AS INT) AS n_bytes,
        |  md5(s) AS content_md5
        |FROM m
        |ORDER BY media_id""".stripMargin),

    // container metadata from a REAL box walk; frame decode stays the
    // declared stub — the oracle replants every declared quantity
    Q.sql("mm_video_mp4_meta", mmVideoMp4Meta,
      """WITH k AS (SELECT CAST(p_partkey AS BIGINT) AS key FROM part),
        |v AS (
        |  SELECT key AS media_id, CAST(0 AS INT) AS track_ordinal,
        |    'vide' AS handler,
        |    CASE WHEN key % 2 = 0 THEN 'avc1' ELSE 'vp09' END AS codec,
        |    CAST((2 + key % 4) * (100 + key % 7) AS BIGINT)
        |      AS movie_duration,
        |    CAST(1000 * (1 + key % 3) AS BIGINT) AS timescale,
        |    CAST((2 + key % 4) * (100 + key % 7) AS BIGINT)
        |      AS duration_ticks,
        |    CAST(2 + key % 4 AS BIGINT) AS n_samples,
        |    CAST(list_sum(list_transform(range(0, 2 + key % 4),
        |      i -> 50 + (key * 13 + i * 7) % 100)) AS BIGINT)
        |      AS sample_bytes,
        |    CAST(16 * (1 + key % 5) AS INT) AS width,
        |    CAST(16 * (1 + key % 3) AS INT) AS height
        |  FROM k),
        |a AS (
        |  SELECT key AS media_id, CAST(1 AS INT) AS track_ordinal,
        |    'soun' AS handler, 'mp4a' AS codec,
        |    CAST((2 + key % 4) * (100 + key % 7) AS BIGINT)
        |      AS movie_duration,
        |    CAST(8000 + (key % 3) * 4000 AS BIGINT) AS timescale,
        |    CAST((4 + key % 3) * 1024 AS BIGINT) AS duration_ticks,
        |    CAST(4 + key % 3 AS BIGINT) AS n_samples,
        |    CAST(list_sum(list_transform(range(0, 4 + key % 3),
        |      i -> 20 + (key * 11 + i * 5) % 50)) AS BIGINT)
        |      AS sample_bytes,
        |    CAST(0 AS INT) AS width, CAST(0 AS INT) AS height
        |  FROM k)
        |SELECT * FROM (SELECT * FROM v UNION ALL SELECT * FROM a)
        |ORDER BY media_id, track_ordinal""".stripMargin),

    // real pixels through the MP4 demux algebra: the oracle replants
    // the per-pixel gradient and recomputes every kept frame's mean
    Q.sql("mm_video_raw_frames", mmVideoRawFrames,
      """WITH k AS (SELECT CAST(p_partkey AS BIGINT) AS key FROM part),
        |m AS (SELECT key, CAST(2 + key % 4 AS INT) AS n,
        |        CAST(4 + key % 5 AS INT) AS w,
        |        CAST(3 + key % 4 AS INT) AS h
        |      FROM k),
        |f AS (SELECT key, w, h,
        |        CAST(unnest(range(0, n)) AS INT) AS frame_ordinal
        |      FROM m)
        |SELECT key AS media_id, frame_ordinal, w AS width, h AS height,
        |  round(CAST(list_sum(list_transform(range(0, w * h), i ->
        |      (key * 41 + frame_ordinal * 23 + (i % w) * 7
        |       + (i // w) * 3) % 256)) AS DOUBLE) / (w * h), 6)
        |    AS mean_rgb
        |FROM f
        |WHERE frame_ordinal % 2 = 0
        |ORDER BY media_id, frame_ordinal""".stripMargin),

    Q.sql("mm_video_webm_meta", mmVideoWebmMeta,
      """SELECT CAST(p_partkey AS BIGINT) AS media_id,
        |  'webm' AS doc_type,
        |  CAST(1000000 AS BIGINT) AS timecode_scale,
        |  CAST(1 AS BIGINT) AS track_number,
        |  CAST(1 AS BIGINT) AS track_type,
        |  CASE WHEN p_partkey % 2 = 0 THEN 'V_VP9' ELSE 'V_VP8' END
        |    AS codec_id,
        |  CAST(64 + 16 * (p_partkey % 8) AS INT) AS width,
        |  CAST(48 + 16 * (p_partkey % 6) AS INT) AS height,
        |  500.0 + (p_partkey % 20) * 40.0 AS duration_ms
        |FROM part
        |ORDER BY media_id""".stripMargin),

    Q.sql("mm_audio_stats", mmAudioStats, audioStatsSql),

    // the audio twin of mm_video_raw_frames: real 16-bit PCM demuxed
    // out of the MP4 sample tables (sowt AND twos byte orders), stats
    // matched against the SAME planted tones as the WAV corpus — one
    // oracle, two containers
    Q.sql("mm_audio_mp4", mmAudioMp4, audioStatsSql),

    Q.sql("mm_audio_windows", mmAudioWindows,
      """WITH m AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS media_id,
        |    CAST(1 + p_partkey % 2 AS INT) AS channels,
        |    CAST(50 + p_partkey % 100 AS BIGINT) AS n_frames
        |  FROM part),
        |s AS (SELECT media_id, channels,
        |        unnest(range(0, n_frames * channels)) AS i
        |      FROM m),
        |v AS (SELECT media_id,
        |        (media_id * 31 + i * 17) % 65536 - 32768 AS sample,
        |        CAST(i // (32 * channels) AS BIGINT) AS window_ordinal
        |      FROM s)
        |SELECT media_id, window_ordinal,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(max(abs(sample)) AS INT) AS peak
        |FROM v
        |WHERE window_ordinal % 2 = 0
        |GROUP BY media_id, window_ordinal
        |ORDER BY media_id, window_ordinal""".stripMargin),
  )
}
