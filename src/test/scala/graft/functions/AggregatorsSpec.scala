package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AggregatorsSpec extends SparkSpec {

  test("vectorCentroid: per-group mean vector with map-side combine") {
    import spark.implicits._
    val df = Seq(
      ("a", Seq(1.0, 2.0)),
      ("a", Seq(3.0, 4.0)),
      ("b", Seq(10.0, 0.0))
    ).toDF("g", "v").repartition(3) // force merge() across partitions
    val out = df.groupBy("g")
      .agg(Aggregators.vectorCentroid(col("v"), 2).as("c"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    out("a") shouldBe Seq(2.0, 3.0)
    out("b") shouldBe Seq(10.0, 0.0)
  }

  test("topKByScore: bounded, ordered (score desc, id asc), merges across partitions") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 0.5), ("a", 2L, 0.9), ("a", 3L, 0.9), ("a", 4L, 0.1),
      ("b", 7L, 0.3)
    ).toDF("g", "id", "s").repartition(4) // force merge()
    val out = df.groupBy("g")
      .agg(Aggregators.topKByScore(col("id"), col("s"), 3).as("top"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (p.getLong(0), p.getDouble(1))))
      .toMap
    out("a") shouldBe Seq((2L, 0.9), (3L, 0.9), (1L, 0.5)) // tie → lower id first
    out("b") shouldBe Seq((7L, 0.3))
  }

  test("bottomKByKey: k smallest (key, id), null keys skipped, merges across partitions") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, "mm"), ("a", 2L, "aa"), ("a", 3L, "zz"), ("a", 4L, "aa"),
      ("a", 5L, null), // null key must not claim a slot
      ("b", 7L, "qq")
    ).toDF("g", "id", "k").repartition(4) // force merge()
    val out = df.groupBy("g")
      .agg(Aggregators.bottomKByKey(col("k"), col("id"), 3).as("sel"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1))
      .toMap
    out("a") shouldBe Seq(2L, 4L, 1L) // ("aa",2) < ("aa",4) < ("mm",1)
    out("b") shouldBe Seq(7L)
  }
}
