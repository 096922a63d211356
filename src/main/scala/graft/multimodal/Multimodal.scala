package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct alongside.
  *
  * Decode is REAL for images (javax.imageio: PNG/JPEG decode, resize,
  * re-encode) and audio (javax.sound: WAV decode/encode) — both ship in
  * the JDK. Video remains a deterministic STUB behind
  * `MediaDecoder.fake` (no video codec in this container); it keeps the
  * signature a javacv-style decoder would have — swap that one function
  * to go live. The Spark-side plumbing (schema, partition-wise batched
  * decode, column shapes, explicit repartition ahead of CPU-bound codec
  * work) is the production shape throughout.
  */
object Multimodal {

  /** Metadata carried next to every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image|audio|video
    StructField("format", StringType),       // png|jpeg|wav|mp4|...
    StructField("byte_len", LongType),
    StructField("sha256", StringType)))

  /** Wrap a source column into (payload binary, meta struct). Pure column
    * expressions — at scale this is computed in the scan projection.
    */
  def withMediaColumns(df: DataFrame, srcCol: String,
      mediaType: String, format: String): DataFrame = {
    val payload = col(srcCol).cast("binary")
    df.withColumn("payload", payload)
      .withColumn("meta", struct(
        lit(mediaType).as("media_type"),
        lit(format).as("format"),
        length(payload).cast("long").as("byte_len"),
        sha2(payload, 256).as("sha256")))
  }

  /** Decoded per-item features a real decoder would emit. */
  case class DecodedMedia(id: Long, width: Int, height: Int,
      n_frames: Int, feature: Array[Float])

  /** Media decoder: REAL decode for images (javax.imageio ships in the
    * JDK — PNG/JPEG payloads are sniffed by magic bytes and decoded to
    * true dimensions + a pixel-derived feature vector); audio/video
    * remain a deterministic STUB (no codec libraries in this container) —
    * same signature a javacv-style decoder would have, swap `fake` to go
    * live.
    */
  object MediaDecoder {

    /** PNG (\x89PNG) or JPEG (\xFF\xD8) magic. */
    def looksLikeImage(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length >= 4 &&
        ((bytes(0) == 0x89.toByte && bytes(1) == 'P'.toByte &&
          bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte) ||
         (bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte))

    def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (!looksLikeImage(bytes)) None
      else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch {
        // valid magic, corrupt body: one bad file must not kill the job
        case scala.util.control.NonFatal(_) => None
      }

    def decode(id: Long, bytes: Array[Byte]): DecodedMedia =
      readImage(bytes) match {
        case Some(img) =>
          val w = img.getWidth; val h = img.getHeight
          // feature: mean RGB of a 2×2 pixel probe grid + normalized dims
          val probes = for (py <- Seq(0, h - 1); px <- Seq(0, w - 1)) yield img.getRGB(px, py)
          def mean(shift: Int) =
            probes.map(p => ((p >> shift) & 0xFF).toFloat / 255f).sum / probes.length
          val feat = Array(mean(16), mean(8), mean(0),
            w.toFloat / 4096f, h.toFloat / 4096f,
            (probes.head & 0xFF).toFloat / 255f,
            (probes.last & 0xFF).toFloat / 255f, 1f)
          DecodedMedia(id, w, h, 1, feat)
        case None => fake(id, bytes)
      }

    /** Deterministic stand-in for payloads with no in-container codec
      * (audio/video, or bytes that are not an image at all).
      */
    private[multimodal] def fake(id: Long, bytes: Array[Byte]): DecodedMedia = {
      // Long arithmetic: n * 31 overflows Int beyond ~69 MB payloads and
      // would produce negative dimensions (the SQL oracle computes these
      // in 64-bit, so Long is also the semantics the oracle checks)
      val n: Long = if (bytes == null) 0L else bytes.length.toLong
      val w = (64 + n % 577).toInt
      val h = (64 + (n * 31) % 331).toInt
      val feat = Array.tabulate(8)(i => ((n * (i + 3)) % 997).toFloat / 997f)
      DecodedMedia(id, w, h, (1 + n % 30).toInt, feat)
    }

    /** Encode a deterministic synthetic PNG: id-seeded gradient fill —
      * a REAL ImageIO encode, so downstream decode/resize exercise the
      * actual codec while an oracle can predict dimensions from the id.
      */
    def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, ((id * 2654435761L + x * 31L + y * 131L) & 0xFFFFFF).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Encode a synthetic PNG whose CONTENT depends only on `patternId`
      * and whose resolution is free: a low-frequency field of two
      * sinusoids sampled in normalized coordinates, so two renders of the
      * same pattern at different sizes depict the same image. Low spatial
      * frequency (≤ ~2.5 cycles) survives downscale-to-32×32, which is
      * what makes the perceptual hash of same-pattern renders collide
      * and different-pattern renders diverge.
      */
    def patternPng(patternId: Long, w: Int, h: Int): Array[Byte] = {
      // drive ALL 63 AC components of the 8×8 DCT basis with a
      // per-pattern random sign: the continuous field is
      //   f(u,v) = 127.5 + A·Σ s_ab·cos(πa·u)·cos(πb·v)
      // in normalized coords, so every perceptual-hash bit is a solid
      // ±A decision (a sparse field leaves near-zero coefficients whose
      // bits flip on resize — and lets distinct patterns collide)
      // full splitmix64 finalizer — a bare linear form mod small-N has
      // only log2(N) bits of entropy in the pattern id and near ids
      // produce identical sign sequences
      def mix(k: Long): Double = {
        var z = patternId * 0x9E3779B97F4A7C15L + k * 0xBF58476D1CE4E5B9L
        z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
        z ^= (z >>> 27); z *= 0x94D049BB133111EBL
        z ^= (z >>> 31)
        (z >>> 40).toDouble / (1L << 24).toDouble
      }
      val amp = 9.0
      val s = Array.tabulate(8, 8)((a, b) =>
        if (a == 0 && b == 0) 0.0 else (if (mix(a * 8 + b) < 0.5) -amp else amp))
      val ca = Array.tabulate(w, 8)((x, a) => math.cos(math.Pi * a * (x + 0.5) / w))
      val cb = Array.tabulate(h, 8)((y, b) => math.cos(math.Pi * b * (y + 0.5) / h))
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val t = new Array[Double](8)
      var y = 0
      while (y < h) {
        var a = 0
        while (a < 8) {
          var acc = 0.0; var b = 0
          while (b < 8) { acc += s(a)(b) * cb(y)(b); b += 1 }
          t(a) = acc; a += 1
        }
        var x = 0
        while (x < w) {
          var v = 127.5; a = 0
          while (a < 8) { v += ca(x)(a) * t(a); a += 1 }
          val g = math.max(0, math.min(255, v.toInt))
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** cos(π(2x+1)u/64) for the 32-point DCT's first 8 frequencies —
      * shared by every [[perceptualHash64]] call. (Factoring reorders the
      * floating-point summation, so coefficients can move by ulps versus
      * the naive form — harmless here because every hash bit is a solid
      * ±coefficient decision by construction of the corpus margins.)
      */
    private lazy val dctCos: Array[Array[Double]] =
      Array.tabulate(32, 8)((x, u) => math.cos(math.Pi * (2 * x + 1) * u / 64.0))

    /** 64-bit perceptual hash (pHash): decode, bilinear-downscale to
      * 32×32, luminance, 2D DCT-II, take the 8×8 low-frequency block,
      * bit i = coefficient i > mean of the 63 AC coefficients (DC
      * excluded — it only encodes global brightness). Deterministic pure
      * JVM; None for non-image payloads.
      */
    def perceptualHash64(bytes: Array[Byte]): Option[Long] =
      readImage(bytes).map { src =>
        val n = 32
        val small = new java.awt.image.BufferedImage(n, n,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = small.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, n, n, null)
        g.dispose()
        val lum = new Array[Double](n * n)
        var y = 0
        while (y < n) {
          var x = 0
          while (x < n) {
            val p = small.getRGB(x, y)
            lum(y * n + x) = 0.299 * ((p >> 16) & 0xFF) +
              0.587 * ((p >> 8) & 0xFF) + 0.114 * (p & 0xFF)
            x += 1
          }
          y += 1
        }
        // separable DCT-II via the precomputed cosine table — only the
        // 8×8 low-frequency corner is needed: rows first (32×32 → 32×8),
        // then columns (→ 8×8); ~10k multiplies, zero cos calls per image
        val rowT = new Array[Double](n * 8)
        var yy = 0
        while (yy < n) {
          var u = 0
          while (u < 8) {
            var acc = 0.0; var xx = 0
            while (xx < n) { acc += lum(yy * n + xx) * dctCos(xx)(u); xx += 1 }
            rowT(yy * 8 + u) = acc; u += 1
          }
          yy += 1
        }
        val coef = new Array[Double](64)
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            var acc = 0.0; var y2 = 0
            while (y2 < n) { acc += rowT(y2 * 8 + u) * dctCos(y2)(v); y2 += 1 }
            coef(v * 8 + u) = acc
            v += 1
          }
          u += 1
        }
        var sum = 0.0
        var i = 1
        while (i < 64) { sum += coef(i); i += 1 }
        val mean = sum / 63.0
        var bits = 0L
        i = 1
        while (i < 64) { if (coef(i) > mean) bits |= (1L << i); i += 1 }
        bits
      }

    /** RIFF/WAVE magic. */
    def looksLikeWav(bytes: Array[Byte]): Boolean =
      bytes != null && bytes.length >= 12 &&
        bytes(0) == 'R'.toByte && bytes(1) == 'I'.toByte &&
        bytes(2) == 'F'.toByte && bytes(3) == 'F'.toByte &&
        bytes(8) == 'W'.toByte && bytes(9) == 'A'.toByte &&
        bytes(10) == 'V'.toByte && bytes(11) == 'E'.toByte

    /** Real WAV decode (javax.sound ships in the JDK): sample rate,
      * channels, frame count. None for non-WAV payloads.
      */
    def decodeWav(bytes: Array[Byte]): Option[(Float, Int, Long)] =
      if (!looksLikeWav(bytes)) None
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          Some((fmt.getSampleRate, fmt.getChannels, in.getFrameLength))
        } finally in.close()
      } catch {
        // valid RIFF magic, corrupt body: skip, don't kill the job
        case scala.util.control.NonFatal(_) => None
      }

    /** Deterministic synthetic WAV: mono 16-bit PCM sine at an id-derived
      * frequency — a REAL javax.sound encode with oracle-predictable
      * frame count.
      */
    def syntheticWav(id: Long, sampleRate: Int, nFrames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
      val pcm = new Array[Byte](nFrames * 2)
      val freq = 110.0 + (id % 32) * 55.0
      var i = 0
      while (i < nFrames) {
        val s = (math.sin(2 * math.Pi * freq * i / sampleRate) * 16384).toInt
        pcm(2 * i) = (s & 0xFF).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Real PCM decode (16-bit mono WAV via javax.sound): signed samples
      * + sample rate. None for non-WAV or non-16-bit-mono payloads.
      */
    def decodePcm16(bytes: Array[Byte]): Option[(Array[Short], Float)] =
      if (!looksLikeWav(bytes)) None
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
          else {
            val raw = in.readAllBytes()
            val out = new Array[Short](raw.length / 2)
            var i = 0
            while (i < out.length) {
              val b0 = raw(2 * i) & 0xFF
              val b1 = raw(2 * i + 1) & 0xFF
              out(i) = (if (fmt.isBigEndian) (b0 << 8) | b1
                        else (b1 << 8) | b0).toShort
              i += 1
            }
            Some((out, fmt.getSampleRate))
          }
        } finally in.close()
      } catch {
        case scala.util.control.NonFatal(_) => None
      }

    /** Real image resize (area-averaging scale + PNG re-encode) for image
      * payloads; None for anything else (callers fall back to the stub).
      */
    def resizePng(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      readImage(bytes).map { src =>
        val dst = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        // direct bilinear drawImage — getScaledInstance(SCALE_AREA_AVERAGING)
        // is an order of magnitude slower (lazy filtered producer per call)
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        bos.toByteArray
      }
  }

  /** Distributed batched decode: `mapPartitions` over (id, payload) so a
    * real decoder amortizes per-batch init (library contexts, GPU
    * handles) across a whole partition — the Scala analog of
    * `mapInPandas`. Output is a typed Dataset with a stable schema.
    */
  def decodeFeatures(spark: SparkSession, df: DataFrame,
      idCol: String, payloadCol: String): Dataset[DecodedMedia] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init for a real decoder happens here, once
        it.map { case (id, bytes) => MediaDecoder.decode(id, bytes) }
      }
  }

  /** One resized image per input. */
  case class ResizedMedia(id: Long, out_w: Int, out_h: Int, out_bytes: Array[Byte])

  /** Batched resize: payloads flow through in fixed-size batches so a
    * real resizer (SIMD library, GPU) processes many images per call —
    * the batch shape `mapInPandas` gives Python for free, made explicit
    * here with `grouped()`. Image payloads get a REAL
    * scale-and-re-encode ([[MediaDecoder.resizePng]]); non-image bytes
    * keep the deterministic stub output so the plumbing stays testable
    * without codec libraries.
    */
  def resizeImages(spark: SparkSession, df: DataFrame, idCol: String,
      payloadCol: String, w: Int, h: Int, batchSize: Int = 64): Dataset[ResizedMedia] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real impl calls resizeBatch(batch) on the native library here
          batch.iterator.map { case (id, bytes) =>
            val out = MediaDecoder.resizePng(bytes, w, h).getOrElse {
              // stub for non-image payloads: w*h header bytes
              val n = if (bytes == null) 0 else bytes.length
              Array.tabulate(math.min(16, w * h))(i => ((n + i) % 256).toByte)
            }
            ResizedMedia(id, w, h, out)
          }
        }
      }
  }

  /** One decoded audio payload's header features. */
  case class AudioMeta(id: Long, sample_rate: Int, channels: Int, n_frames: Long)

  /** Distributed REAL audio decode (WAV via the JDK's javax.sound):
    * header features per payload; non-WAV payloads are skipped. Same
    * batched-partition shape as [[decodeFeatures]].
    */
  def audioFeatures(spark: SparkSession, df: DataFrame,
      idCol: String, payloadCol: String): Dataset[AudioMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          MediaDecoder.decodeWav(bytes).map { case (rate, ch, frames) =>
            AudioMeta(id, rate.toInt, ch, frames)
          }
        }
      }
  }

  /** One dominant-frequency estimate per audio payload. */
  case class AudioFreq(id: Long, freq_hz: Double)

  /** Audio content fingerprinting: dominant-frequency estimate from the
    * REAL decoded PCM via zero-crossing rate — the cheap classical
    * monophonic pitch estimator (a production fingerprint would swap in
    * an FFT/chroma hash here; the decode → per-partition DSP → narrow
    * feature shape is identical). Two payloads with the same tone at
    * different durations fingerprint identically — content dedup where
    * byte/sha dedup finds nothing. Non-WAV payloads are skipped.
    */
  def audioFingerprints(spark: SparkSession, df: DataFrame,
      idCol: String, payloadCol: String): Dataset[AudioFreq] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          MediaDecoder.decodePcm16(bytes).map { case (samples, rate) =>
            var crossings = 0
            var i = 1
            while (i < samples.length) {
              // zero counts as positive: a quantized sine hits 0.0 exactly
              if ((samples(i) >= 0) != (samples(i - 1) >= 0)) crossings += 1
              i += 1
            }
            val freq =
              if (samples.length < 2) 0.0
              else crossings.toDouble * rate / (2.0 * (samples.length - 1))
            AudioFreq(id, freq)
          }
        }
      }
  }

  /** Deterministic synthetic WAV corpus keyed by id — real javax.sound
    * encodes, frame count oracle-predictable (4000 + id % 100 · 16 at
    * 16 kHz mono, so durations are whole milliseconds).
    */
  def syntheticAudio(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { id =>
          (id, MediaDecoder.syntheticWav(id, sampleRate = 16000,
            nFrames = 4000 + (id % 100).toInt * 16))
        }
      }
      .toDF("id", "payload")
  }

  /** Deterministic synthetic PNG corpus keyed by id — real ImageIO
    * encodes with oracle-predictable dimensions
    * (w = 16 + id % 32, h = 16 + id·7 % 32).
    */
  def syntheticImages(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    // a small parquet scan is one partition; per-row codec work needs the
    // cores, so spread the 8-byte ids BEFORE generating payloads (the
    // same shape a production media pipeline uses ahead of CPU-bound
    // decode over a few dense input files)
    df.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { id =>
          // floorMod: a negative id with signed % would yield w/h <= 0
          // and BufferedImage throws, killing the task
          val w = 16 + Math.floorMod(id, 32L).toInt
          val h = 16 + Math.floorMod(id * 7, 32L).toInt
          (id, MediaDecoder.syntheticPng(id, w, h))
        }
      }
      .toDF("id", "payload")
  }

  /** Synthetic pattern-PNG corpus: content class = id / idsPerPattern,
    * resolution varies with the id — consecutive ids in one class depict
    * the SAME image at different sizes (the near-dup-by-content shape a
    * perceptual hash must catch, where byte/sha dedup finds nothing).
    */
  def syntheticPatternImages(spark: SparkSession, df: DataFrame, idCol: String,
      idsPerPattern: Int): DataFrame = {
    import spark.implicits._
    require(idsPerPattern > 0, "idsPerPattern must be positive")
    df.select(col(idCol).cast("long")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { id =>
          val w = 48 + Math.floorMod(id, 32L).toInt
          val h = 48 + Math.floorMod(id * 7, 32L).toInt
          (id, MediaDecoder.patternPng(Math.floorDiv(id, idsPerPattern.toLong), w, h))
        }
      }
      .toDF("id", "payload")
  }

  /** One perceptual hash per image payload. */
  case class PHash(id: Long, phash: Long)

  /** Distributed perceptual hashing: (id, 64-bit pHash) per image
    * payload, non-images skipped. Same batched-partition shape as
    * [[decodeFeatures]]; downstream near-dup blocking is
    * [[graft.operators.Dedup.hammingPairs]] on the `phash` column — the
    * whole image-dedup pipeline then shuffles 8-byte signatures, never
    * pixels.
    */
  def perceptualHashes(spark: SparkSession, df: DataFrame,
      idCol: String, payloadCol: String): Dataset[PHash] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          MediaDecoder.perceptualHash64(bytes).map(PHash(id, _))
        }
      }
  }

  /** One sampled frame of a video payload. */
  case class Frame(id: Long, frame_idx: Int)

  /** Frame sampling: every `everyN`-th frame of each payload — the 1→N
    * exploding shape of video pipelines. Frame count comes from the
    * (stubbed) decoder's metadata; a real impl would also emit the frame
    * bytes.
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String,
      payloadCol: String, everyN: Int): Dataset[Frame] = {
    import spark.implicits._
    require(everyN > 0, "everyN must be positive")
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val meta = MediaDecoder.decode(id, bytes)
          (0 until meta.n_frames by everyN).iterator.map(Frame(id, _))
        }
      }
  }
}
