package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * BATCHED `mapPartitions` (the Scala analog of a Pandas-UDF
  * `mapInPandas` stage — same batch shape, same schema contract).
  *
  * All three modalities decode REAL payloads with JDK-built-in codecs
  * (no external jars): images are actual PNGs ([[pngMediaTable]] /
  * [[decodePng]] — pixel-exact, PNG is lossless), audio is actual
  * RIFF/WAVE ([[wavMediaTable]] / [[decodeWav]] via javax.sound), and
  * video is a length-prefixed container of real PNG frames
  * ([[vidMediaTable]] / [[decodeVideoFrames]] — no video codec ships in
  * the JDK, so the container IS the format; every frame is genuinely
  * ImageIO-decoded). Only [[frameSample]] remains as a metadata-only
  * fast path that never touches pixels.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media_ref: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, media_ref: String,
      width: Int, height: Int, n_bytes: Int,
      features: Array[Float])

  /** Synthesize an opaque media table from the documents table: payload =
    * md5 bytes of the text (deterministic, binary-typed). Used by the
    * frame sampler, which never decodes.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(lit("img://"), col("doc_id")).as("media_ref"),
      unhex(md5(col("text"))).as("payload"))

  /** A real PNG whose dimensions derive from the seed bytes exactly like
    * the opaque rule (w = 16 + seed(0)&0x3f, h = 16 + seed(1)&0x3f — so a
    * SQL oracle can predict the decoded dimensions from md5(text)) and
    * whose pixels are a deterministic function of (x, y, seed).
    */
  def pngBytes(seed: Array[Byte]): Array[Byte] = {
    val w = 16 + (seed(0) & 0x3f)
    val h = 16 + (seed(1) & 0x3f)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (seed(x % 16) & 0xff) ^ ((y * 31) & 0xff)
        val g = (seed(y % 16) & 0xff) ^ ((x * 17) & 0xff)
        val b = (x * x + y) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Media table with REAL PNG payloads: one image per document, seeded
    * by md5(text). Typed mapPartitions (the encode is a per-row pure
    * function — no shuffle, no fan-out).
    */
  def pngMediaTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // NOT fanned out: ImageIO/AudioSystem provider registries serialize
    // concurrent encodes behind global locks — measured SLOWER at 32
    // tasks than single-task (q95 0.6 s → 1.4 s); the codec, not the
    // partitioning, is the bottleneck
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          md.reset()
          val seed = md.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          (id, s"img://$id", pngBytes(seed))
        }
      }
      .toDF("doc_id", "media_ref", "payload")
  }

  /** Real image decode via the JDK's ImageIO: dimensions + a 4-dim
    * feature vector (mean R, G, B and Rec.601 luma over all pixels —
    * integer sums, so bit-deterministic across JVMs).
    */
  def decodePng(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h) * 255.0f
    (w, h, Array(sr / n, sg / n, sb / n,
      (0.299f * sr + 0.587f * sg + 0.114f * sb) / n))
  }

  /** Batched decode stage: one mapPartitions, grouped micro-batches (the
    * mapInPandas batch shape). The stub codec itself decodes per row —
    * the grouping exists as the amortization point a real vectorized
    * codec (GPU image decode, batched resampler) plugs into without
    * reshaping the stage; it does not pretend to amortize anything
    * today.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
                     batchSize: Int = 64,
                     decode: Array[Byte] => (Int, Int, Array[Float]) = decodePng)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_ref", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val (w, h, f) = decode(r.payload)
            MediaFeatures(r.doc_id, r.media_ref, w, h, r.payload.length, f)
          }
        }
      }
  }

  // ---- audio: REAL WAV encode/decode via javax.sound.sampled (in the
  //      JDK — no external jars), mirroring the PNG path: payloads are
  //      actual RIFF/WAVE files whose parameters derive from md5(text)
  //      bytes by the same seed rule an SQL oracle can replay, and whose
  //      PCM samples follow a closed-form pattern so peak/sum are
  //      SQL-predictable while the decoder genuinely reads every sample.
  //      With this, the declared opaque-payload boundary narrows to
  //      video only (frameSample below).

  /** Sample rates indexed by seed(0)&3 (the audio twin of the PNG w/h
    * rule: predictable from md5(text) in SQL).
    */
  val wavRates: Array[Int] = Array(8000, 16000, 22050, 44100)

  /** A real 16-bit mono PCM WAV: rate = wavRates(seed0&3), n_samples =
    * 256 + seed1*8, samples(i) = ((i % 201) - 100) * amp with amp =
    * 1 + (seed2&0x1f) — a sawtooth whose peak (100*amp, since n ≥ 201
    * guarantees a full cycle) and signed sum (full cycles cancel; the
    * tail is an arithmetic series) have closed forms the DuckDB oracle
    * computes from md5(text) alone. Encoded through AudioSystem.write
    * (real RIFF container, not a hand-rolled header).
    */
  def wavBytes(seed: Array[Byte]): Array[Byte] = {
    val rate = wavRates(seed(0) & 3)
    val n = 256 + (seed(1) & 0xff) * 8
    val amp = 1 + (seed(2) & 0x1f)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = ((i % 201) - 100) * amp
      pcm(2 * i) = (v & 0xff).toByte // little-endian 16-bit signed
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Media table with REAL WAV payloads, one clip per document, seeded
    * by md5(text) — the audio twin of [[pngMediaTable]].
    */
  def wavMediaTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          md.reset()
          val seed = md.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          (id, s"aud://$id", wavBytes(seed))
        }
      }
      .toDF("doc_id", "media_ref", "payload")
  }

  /** Real WAV decode via AudioSystem: parse the RIFF container, read
    * every PCM frame, return (sample_rate, n_samples, peak_abs,
    * signed_sum) — integer stats, bit-deterministic across JVMs.
    */
  /** Shared 16-bit/mono/little-endian PCM reader: the RIFF container
    * parse, the format gate (an 8-bit/stereo/big-endian WAV would
    * silently pair wrong bytes into samples and emit garbage instead of
    * failing loudly) and the raw sample bytes. [[decodeWav]] and
    * [[audioEnergy]] both ride this one parser so container handling
    * and the sign-extending byte pairing can never diverge.
    */
  private def readPcm16(payload: Array[Byte]): (javax.sound.sampled.AudioFormat, Array[Byte]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian, s"unsupported wav format: $fmt")
    val bytes = ais.readAllBytes()
    ais.close()
    (fmt, bytes)
  }

  /** Sample i of a 16-bit little-endian PCM byte array (sign-extends). */
  private def sample16(bytes: Array[Byte], i: Int): Int =
    (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)

  def decodeWav(payload: Array[Byte]): (Int, Long, Long, Long) = {
    val (fmt, bytes) = readPcm16(payload)
    val n = bytes.length / 2
    var peak = 0L; var sum = 0L
    var i = 0
    while (i < n) {
      val v = sample16(bytes, i)
      val a = if (v < 0) -v.toLong else v.toLong
      if (a > peak) peak = a
      sum += v
      i += 1
    }
    (fmt.getSampleRate.toInt, n.toLong, peak, sum)
  }

  case class AudioStats(
      doc_id: Long, media_ref: String, sample_rate: Long, n_samples: Long,
      duration_ms: Long, peak: Long, sum_samples: Long)

  /** Batched audio-stats stage — same mapPartitions batch shape as
    * [[decodeFeatures]]; duration is integer milliseconds (truncating
    * division, so the SQL oracle agrees without float hazards).
    */
  def audioStats(spark: SparkSession, media: DataFrame,
                 batchSize: Int = 64): Dataset[AudioStats] = {
    import spark.implicits._
    media.select("doc_id", "media_ref", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val (rate, n, peak, sum) = decodeWav(r.payload)
            AudioStats(r.doc_id, r.media_ref, rate.toLong, n,
              n * 1000L / rate, peak, sum)
          }
        }
      }
  }

  case class AudioWindow(
      doc_id: Long, media_ref: String, window_idx: Long,
      n_in_window: Long, energy: Long)

  /** Windowed energy over decoded PCM — the frame-level feature
    * extraction shape of a real audio pipeline (fixed windows, one
    * integer energy per window, explode-style fan-out bounded by
    * clip length / window). The decoder genuinely squares and sums
    * every sample; the DuckDB oracle replays the closed form of the
    * sawtooth's prefix-sum-of-squares from md5(text) alone.
    */
  def audioEnergy(spark: SparkSession, media: DataFrame,
                  window: Int = 256, batchSize: Int = 64): Dataset[AudioWindow] = {
    import spark.implicits._
    media.select("doc_id", "media_ref", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { r =>
            val (_, bytes) = readPcm16(r.payload)
            val n = bytes.length / 2
            val nWin = (n + window - 1) / window
            (0 until nWin).map { w =>
              val start = w * window
              val end = math.min(n, start + window)
              var e = 0L
              var i = start
              while (i < end) {
                val v = sample16(bytes, i)
                e += v.toLong * v
                i += 1
              }
              AudioWindow(r.doc_id, r.media_ref, w.toLong,
                (end - start).toLong, e)
            }
          }
        }
      }
  }

  /** Resize plan: fit each decoded image into a target box preserving
    * aspect ratio — the METADATA math is real (and oracle-checked); the
    * pixel resample itself is the stubbed codec step. Pure column
    * expressions over the decode output; floor() so both engines agree
    * without .5-rounding hazards.
    */
  def resizePlan(features: DataFrame, box: Int = 64): DataFrame = {
    val s = least(lit(box.toDouble) / col("width"),
      lit(box.toDouble) / col("height"))
    features.select(col("doc_id"), col("media_ref"),
      col("width").cast("long").as("width"),
      col("height").cast("long").as("height"),
      floor(col("width") * s).cast("long").as("out_w"),
      floor(col("height") * s).cast("long").as("out_h"),
      round(s, 6).as("scale"))
  }

  // ---- video: REAL frame decode. The payload is a length-prefixed
  //      container ("GFV1" magic, int32 frame count, then per frame an
  //      int32 length + a genuine PNG) — the same move that graduated
  //      audio from opaque bytes to RIFF/WAVE (decodeWav above): no video
  //      codec ships in the JDK, but a frame CONTAINER of JDK-decodable
  //      PNGs exercises the whole real pipeline shape — container parse,
  //      per-frame image decode, per-frame feature extraction, bounded
  //      fan-out. Frame pixels follow a closed form (r = x + 7f,
  //      g = y + 11f, b = x + y + 3f — all < 256 so no byte wrap) whose
  //      per-frame channel SUMS the DuckDB oracle computes from md5(text)
  //      alone, while the decoder genuinely ImageIO-reads every pixel of
  //      every frame. This closes the last opaque-payload boundary.

  /** A real multi-frame video container seeded by md5(text):
    * n_frames = 2 + (seed(3) & 7), every frame a PNG of the SAME
    * dimensions as the image rule (w = 16 + seed(0)&0x3f,
    * h = 16 + seed(1)&0x3f) with frame-dependent pixels.
    */
  def vidBytes(seed: Array[Byte]): Array[Byte] = {
    val w = 16 + (seed(0) & 0x3f)
    val h = 16 + (seed(1) & 0x3f)
    val nFrames = 2 + (seed(3) & 0x07)
    val baos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(baos)
    out.writeBytes("GFV1")
    out.writeInt(nFrames)
    var f = 0
    while (f < nFrames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          // max values 141/177/183 — strictly < 256, so the closed-form
          // sums below never hit a byte wrap and PNG round-trips exactly
          val r = x + 7 * f
          val g = y + 11 * f
          val b = x + y + 3 * f
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      val fb = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", fb)
      val png = fb.toByteArray
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    baos.toByteArray
  }

  /** Media table with REAL video payloads (PNG-frame containers), one
    * clip per document — the video twin of [[pngMediaTable]].
    */
  def vidMediaTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          md.reset()
          val seed = md.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          (id, s"vid://$id", vidBytes(seed))
        }
      }
      .toDF("doc_id", "media_ref", "payload")
  }

  /** Parse a GFV1 container and REALLY decode every frame through
    * ImageIO, returning per-frame (frame_idx, width, height, sum_r,
    * sum_g, sum_b) — integer channel sums over all pixels,
    * bit-deterministic across JVMs. Fails loudly on a bad magic or a
    * torn frame (a truncated payload must not silently yield fewer
    * frames).
    */
  def decodeVideoFrames(payload: Array[Byte]): IndexedSeq[(Int, Int, Int, Long, Long, Long)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(payload))
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(new String(magic, java.nio.charset.StandardCharsets.US_ASCII) == "GFV1",
      "payload is not a GFV1 video container")
    val nFrames = in.readInt()
    (0 until nFrames).map { f =>
      val len = in.readInt()
      val png = new Array[Byte](len)
      in.readFully(png)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      require(img != null, s"frame $f is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      (f, w, h, sr, sg, sb)
    }
  }

  case class VideoFrame(
      doc_id: Long, media_ref: String, frame_idx: Long, ts_ms: Long,
      width: Long, height: Long, n_pixels: Long,
      sum_r: Long, sum_g: Long, sum_b: Long,
      mean_r_ppm: Long, mean_g_ppm: Long, mean_b_ppm: Long)

  /** Decode-verified frame sampling: parse the container, ImageIO-decode
    * every frame, emit every `step`-th frame with its fps timestamp and
    * per-frame mean RGB (integer parts-per-million — truncating division
    * of non-negative sums, so floor == truncate and the SQL `//` oracle
    * agrees exactly). Same batched mapPartitions shape as
    * [[decodeFeatures]]; fan-out bounded by frames/step, no shuffle.
    */
  def videoFrameFeatures(spark: SparkSession, media: DataFrame,
                         step: Int = 2, fps: Int = 25,
                         batchSize: Int = 64): Dataset[VideoFrame] = {
    import spark.implicits._
    media.select("doc_id", "media_ref", "payload").as[MediaRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { r =>
            decodeVideoFrames(r.payload).collect {
              case (f, w, h, sr, sg, sb) if f % step == 0 =>
                val np = w.toLong * h
                VideoFrame(r.doc_id, r.media_ref, f.toLong,
                  f.toLong * 1000 / fps, w.toLong, h.toLong, np,
                  sr, sg, sb,
                  sr * 1000000L / np, sg * 1000000L / np, sb * 1000000L / np)
            }
          }
        }
      }
  }

  /** Frame sampling for video-typed payloads: the payload is treated as
    * frames of 4 bytes (stub codec), every `step`-th frame is emitted
    * with its 25fps timestamp — the row fan-out shape of a real
    * frame-sampler (explode of a bounded sequence; no shuffle). Kept as
    * the metadata-only fast path (no decode); the decode-verified path
    * is [[videoFrameFeatures]].
    */
  def frameSample(media: DataFrame, step: Int = 2, fps: Int = 25): DataFrame = {
    val frames = (length(col("payload")) / 4).cast("int")
    // payloads shorter than one frame yield frames = 0, and
    // sequence(0, -1, step) throws at runtime — guard, don't crash
    media.where(frames > 0)
      .select(col("doc_id"), col("media_ref"),
        explode(sequence(lit(0), frames - 1, lit(step))).as("frame_idx"))
      .select(col("doc_id"), col("media_ref"),
        col("frame_idx").cast("long").as("frame_idx"),
        // (idx * 1000) / fps, NOT idx * (1000/fps): integer-dividing the
        // per-frame increment first drifts for any fps not dividing 1000
        // (at 30 fps frame 3000 would be a full second off). The idx is
        // widened to long BEFORE the multiply — int*1000 overflows past
        // ~2.1M frames (an ~8.6 MB stub payload)
        (col("frame_idx").cast("long") * 1000 / fps).cast("long").as("ts_ms"))
  }
}
