package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    import spark.implicits._
    val df = Seq((1L, "tiny"), (2L, "a somewhat longer payload body here"))
      .toDF("doc_id", "text")
    Multimodal.withMediaColumns(df, "text", "image", "png")
  }

  test("withMediaColumns attaches typed metadata with correct byte length") {
    val rowsOut = media.select("doc_id", "meta.media_type", "meta.format", "meta.byte_len")
      .collect().map(_.toSeq)
    rowsOut should contain(Seq(1L, "image", "png", 4L))
    // sha256 is hex of the payload
    val sha = media.filter(col("doc_id") === 1).select("meta.sha256").head().getString(0)
    sha should have length 64
  }

  test("decodeFeatures runs distributed with a stable schema") {
    val out = Multimodal.decodeFeatures(spark, media, "doc_id", "payload").collect()
    out.map(_.id).sorted shouldBe Array(1L, 2L)
    all(out.map(_.width)) should be >= 64
    all(out.map(_.feature.length)) shouldBe 8
  }

  test("sampleFrames explodes every Nth frame per payload") {
    val frames = Multimodal.sampleFrames(spark, media, "doc_id", "payload", everyN = 2)
      .collect().groupBy(_.id)
    // n_frames for doc 1: 1 + 4 % 30 = 5 -> frames 0,2,4
    frames(1L).map(_.frame_idx).sorted shouldBe Array(0, 2, 4)
    // every payload yields at least frame 0
    frames.values.foreach(f => f.map(_.frame_idx) should contain(0))
  }

  test("resizeImages emits requested dims in batches") {
    val out = Multimodal.resizeImages(spark, media, "doc_id", "payload",
      w = 32, h = 32, batchSize = 1).collect()
    out.length shouldBe 2
    all(out.map(_.out_w)) shouldBe 32
    all(out.map(_.out_bytes.length)) shouldBe 16
  }

  test("real ImageIO decode: known PNG round-trips to true dimensions") {
    val bytes = Multimodal.MediaDecoder.syntheticPng(42L, 20, 10)
    Multimodal.MediaDecoder.looksLikeImage(bytes) shouldBe true
    val d = Multimodal.MediaDecoder.decode(42L, bytes)
    (d.width, d.height, d.n_frames) shouldBe ((20, 10, 1))
    d.feature.length shouldBe 8
  }

  test("real resize: output PNG decodes to the requested dimensions") {
    val bytes = Multimodal.MediaDecoder.syntheticPng(7L, 33, 21)
    val out = Multimodal.MediaDecoder.resizePng(bytes, 5, 6)
    out should not be empty
    val d = Multimodal.MediaDecoder.decode(7L, out.get)
    (d.width, d.height) shouldBe ((5, 6))
  }

  test("real WAV round trip: javax.sound encode decodes to true header") {
    val wav = Multimodal.MediaDecoder.syntheticWav(5L, sampleRate = 8000, nFrames = 1234)
    Multimodal.MediaDecoder.looksLikeWav(wav) shouldBe true
    val Some((rate, ch, frames)) = Multimodal.MediaDecoder.decodeWav(wav)
    (rate, ch, frames) shouldBe ((8000f, 1, 1234L))
    Multimodal.MediaDecoder.decodeWav("not audio".getBytes) shouldBe None
  }

  test("distributed real audio path: syntheticAudio -> audioFeatures") {
    import spark.implicits._
    val ids = Seq(0L, 7L).toDF("doc_id")
    val wavs = Multimodal.syntheticAudio(spark, ids, "doc_id")
    val out = Multimodal.audioFeatures(spark, wavs, "id", "payload")
      .collect().map(a => a.id -> a.n_frames).toMap
    out(0L) shouldBe 4000L
    out(7L) shouldBe (4000L + 7 * 16)
  }

  test("audio fingerprint: zero-crossing freq estimate recovers the tone class") {
    import spark.implicits._
    // ids 0/32/64 share freq 110 Hz at different durations; 1/33 share 165
    val ids = Seq(0L, 1L, 32L, 33L, 64L).toDF("doc_id")
    val wavs = Multimodal.syntheticAudio(spark, ids, "doc_id")
    val cls = Multimodal.audioFingerprints(spark, wavs, "id", "payload")
      .collect().map(a => a.id ->
        math.round((a.freq_hz - 110.0) / 55.0)).toMap
    cls shouldBe Map(0L -> 0L, 1L -> 1L, 32L -> 0L, 33L -> 1L, 64L -> 0L)
  }

  test("perceptual hash: same pattern at any size collides, different patterns diverge") {
    import spark.implicits._
    val imgs = Multimodal.syntheticPatternImages(spark,
      (0L until 200L).toDF("id"), "id", idsPerPattern = 2)
    val hashes = Multimodal.perceptualHashes(spark, imgs, "id", "payload")
      .collect().map(p => p.id -> p.phash).toMap
    hashes.size shouldBe 200
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // same pattern rendered at two different resolutions
    val same = (0L until 200L by 2).map(k => ham(hashes(k), hashes(k + 1)))
    withClue(s"same-pattern hamming max=${same.max}: ") { same.max should be <= 3 }
    // different patterns must clear the match threshold with margin
    val cross = for (p <- 0L until 100L; q <- (p + 1) until 100L)
      yield ham(hashes(p * 2), hashes(q * 2))
    withClue(s"cross-pattern hamming min=${cross.min}: ") { cross.min should be > 10 }
  }

  test("phash near-dup: hammingPairs over perceptual hashes = same-pattern pairs") {
    import spark.implicits._
    val imgs = Multimodal.syntheticPatternImages(spark,
      (0L until 40L).toDF("id"), "id", idsPerPattern = 2)
    val hashes = Multimodal.perceptualHashes(spark, imgs, "id", "payload").toDF()
    val pairs = graft.operators.Dedup.hammingPairs(hashes, "id", "phash", maxHamming = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe (0L until 40L by 2).map(k => (k, k + 1)).toSet
  }

  test("distributed real path: syntheticImages -> decodeFeatures true dims") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 33L).toDF("doc_id")
    val pngs = Multimodal.syntheticImages(spark, ids, "doc_id")
    val out = Multimodal.decodeFeatures(spark, pngs, "id", "payload")
      .collect().map(d => d.id -> ((d.width, d.height))).toMap
    out(0L) shouldBe ((16, 16))
    out(1L) shouldBe ((17, 23))
    out(33L) shouldBe ((17, 16 + (33 * 7) % 32))
  }
}
