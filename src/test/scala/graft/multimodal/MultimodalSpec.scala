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
}
