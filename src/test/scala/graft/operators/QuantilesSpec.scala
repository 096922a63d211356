package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {

  test("exactQuantiles matches the exact percentile aggregate") {
    import spark.implicits._
    val df = (1 to 1001).map(i => (i.toLong, (i * 37 % 1000).toDouble))
      .toDF("id", "v")
    val probs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    val viaAgg = df
      .agg(expr(s"percentile(v, array(${probs.mkString(",")}))").as("ps"))
      .select(posexplode(col("ps"))).collect().map(_.getDouble(1))
    val viaSort = Quantiles.exactQuantiles(df, "v", probs)
      .orderBy("q").collect().map(_.getDouble(1))
    viaSort.zip(viaAgg).foreach { case (a, b) => a shouldBe b +- 1e-9 }
  }

  test("interpolates between flanking rows and ignores nulls") {
    import spark.implicits._
    val df = Seq(Some(10.0), None, Some(20.0), Some(30.0), None)
      .toDF("v")
    val r = Quantiles.exactQuantiles(df, "v", Seq(0.25, 0.5))
      .orderBy("q").collect().map(_.getDouble(1))
    r(0) shouldBe 15.0 +- 1e-9 // pos 0.5 between 10 and 20
    r(1) shouldBe 20.0 +- 1e-9
  }

  test("empty input yields empty output") {
    import spark.implicits._
    val df = Seq.empty[Double].toDF("v")
    Quantiles.exactQuantiles(df, "v", Seq(0.5)).count() shouldBe 0L
  }

  test("groupedExactQuantile matches the percentile aggregate per group") {
    import spark.implicits._
    val df = (1 to 500).map(i => (s"g${i % 3}", (i * 37 % 200).toDouble))
      .toDF("g", "v").repartition(7)
    val got = Quantiles.groupedExactQuantile(df, Seq("g"), "v", 0.25)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expect = df.groupBy("g")
      .agg(expr("percentile(v, 0.25)").as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    got.keySet shouldBe expect.keySet
    got.foreach { case (g, v) => v shouldBe expect(g) +- 1e-9 }
  }

  test("groupedExactQuantile keeps null group keys and all-null-value groups") {
    import spark.implicits._
    val df = Seq(
      (Option("a"), Option(1.0)), (Option("a"), Option(3.0)),
      (Option.empty[String], Option(10.0)), (Option.empty[String], Option(20.0)),
      (Option("z"), Option.empty[Double])) // all-null values → NULL quantile
      .toDF("g", "v")
    val r = Quantiles.groupedExactQuantile(df, Seq("g"), "v", 0.5)
      .collect().map(x => Option(x.getString(0)) -> Option(x.get(1))).toMap
    r(Some("a")) shouldBe Some(2.0)
    r(None) shouldBe Some(15.0)       // null key is a real group
    r(Some("z")) shouldBe None        // group survives with NULL quantile
  }

  test("groupedExactQuantile groups binary keys by value, not reference") {
    import spark.implicits._
    // binary group keys (e.g. content digests): every row carries a fresh
    // Array[Byte] instance, so reference equality would split each group
    val df = (1 to 100).map(i => (Array((i % 2).toByte, 7.toByte), i.toDouble))
      .toDF("g", "v").repartition(5)
    val r = Quantiles.groupedExactQuantile(df, Seq("g"), "v", 0.5)
      .collect().map(x => x.getAs[Array[Byte]](0).toSeq -> x.getDouble(1)).toMap
    r.size shouldBe 2 // two groups, not one per row
    r(Seq[Byte](0, 7)) shouldBe 51.0 // evens 2..100: median
    r(Seq[Byte](1, 7)) shouldBe 50.0 // odds 1..99
  }

  test("groupedExactQuantile: singleton group and exact-position quantile") {
    import spark.implicits._
    val df = Seq(("a", 5.0), ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val r = Quantiles.groupedExactQuantile(df, Seq("g"), "v", 0.5)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    r("a") shouldBe 5.0
    r("b") shouldBe 2.0 // exact middle element, no interpolation
  }
}
