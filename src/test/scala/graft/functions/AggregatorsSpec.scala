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
}
