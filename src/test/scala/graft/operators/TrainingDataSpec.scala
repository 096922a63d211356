package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TrainingDataSpec extends SparkSpec {

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "alpha beta gamma delta something entirely different here"),
      (12L, "no overlap with anything else at all whatsoever now"),
      (13L, "unique words only in this particular document body text")
    ).toDF("doc_id", "text")
  }

  private lazy val bench = {
    import spark.implicits._
    // shares the 4-gram "alpha beta gamma delta" with docs 10 and 11
    Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
  }

  test("decontaminate counts distinct shared word-n-grams per doc") {
    val r = TrainingData.decontaminate(corpus, "doc_id", "text", bench, "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bench has 2 distinct 4-grams: "alpha beta gamma delta",
    // "beta gamma delta epsilon" — doc 10 shares both, doc 11 one
    r shouldBe Map(10L -> 2L, 11L -> 1L)
  }

  test("decontaminate broadcasts the benchmark gram set") {
    val plan = TrainingData.decontaminate(corpus, "doc_id", "text", bench, "text", n = 4)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }
}
