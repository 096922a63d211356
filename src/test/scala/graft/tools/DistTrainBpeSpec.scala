package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class DistTrainBpeSpec extends SparkSpec {

  private def segFreqs(docs: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
    docs.select(explode(regexp_extract_all(col("text"),
        lit(TextFunctions.subwordPattern), lit(0))).as("g"))
      .groupBy("g").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("distTrain equals the sequential trainer (ties, multi-byte, repeats)") {
    import spark.implicits._
    val docs = Seq(
      "aaaa aaaa aa banana banana bandana",
      "héllo héllo wörld wörld wörld",
      "the the the them theme thematic",
      "xy xy yx yx yx zz zz zz zz").toDF("text")
    val expected = TrainBpe.train(segFreqs(docs), 25)
    val got = TrainBpe.distTrain(docs, "text", 25, checkpointEvery = 4)
    got shouldBe expected
  }

  test("distTrain stops early once every segment is fully merged") {
    import spark.implicits._
    val docs = Seq("ab ab ab ab").toDF("text")
    val expected = TrainBpe.train(segFreqs(docs), 50)
    val got = TrainBpe.distTrain(docs, "text", 50, checkpointEvery = 2)
    got shouldBe expected
    assert(got.size < 50, "tiny corpus must exhaust its pairs")
  }

  test("distTrain matches the sequential trainer on the documents corpus") {
    val docs = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
    val expected = TrainBpe.train(segFreqs(docs), 12)
    val got = TrainBpe.distTrain(docs, "text", 12)
    got shouldBe expected
  }
}
