package graft.operators

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {

  test("profile: one row per column — counts, nulls, exact ndv, numeric min/max") {
    import spark.implicits._
    val df = Seq(
      (1L, Option(2.0), "a"),
      (2L, Option.empty[Double], "b"),
      (3L, Option(4.0), "a")
    ).toDF("id", "x", "s")
    val r = Profiling.profile(df, Seq("x", "s")).collect()
      .map(row => row.getString(0) -> row).toMap
    val x = r("x")
    (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4), x.getDouble(5)) shouldBe
      ((3L, 1L, 2L, 2.0, 4.0))
    val s = r("s")
    (s.getLong(1), s.getLong(2), s.getLong(3)) shouldBe ((3L, 0L, 2L))
    s.isNullAt(4) shouldBe true
    s.isNullAt(5) shouldBe true
  }

  test("profile exact=false: approx ndv, same shape, no Expand in the plan") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"v${i % 37}")).toDF("id", "s")
    val r = Profiling.profile(df, Seq("id", "s"), exact = false)
    val m = r.collect().map(row => row.getString(0) -> row).toMap
    // HLL++ at default rsd (5%): counts are approximate at any size
    m("id").getLong(3).toDouble shouldBe 1000.0 +- 100.0
    m("s").getLong(3).toDouble shouldBe 37.0 +- 4.0
    // the whole point of approx mode: no Expand (scan rows not replicated)
    r.queryExecution.executedPlan.toString should not include "Expand"
    Profiling.profile(df, Seq("id", "s"), exact = true)
      .queryExecution.executedPlan.toString should include("Expand")
  }

  test("profile survives column names needing quoting") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("the id", "dot.ted")
    val r = Profiling.profile(df, Seq("the id", "dot.ted")).collect()
      .map(row => row.getString(0) -> row).toMap
    r("the id").getLong(3) shouldBe 2L
    r("dot.ted").getLong(2) shouldBe 0L
  }

  test("profile rejects an empty column list") {
    import spark.implicits._
    an[IllegalArgumentException] should be thrownBy
      Profiling.profile(Seq(1).toDF("a"), Seq.empty)
  }

  test("histogram: equi-width bins, hi-inclusive last bin, empty bins kept") {
    import spark.implicits._
    // values: 0 (bin 0), 5 (bin 1), 9.99 (bin 1... wait width 2.5)
    val df = Seq(0.0, 1.0, 2.5, 5.0, 9.9, 10.0, -1.0, 11.0)
      .toDF("v") // lo=0 hi=10, 4 bins of width 2.5; -1 and 11 excluded
    val r = Profiling.histogram(df, "v", nBins = 4, lo = 0.0, hi = 10.0)
      .collect().map(x => x.getLong(0) ->
        ((x.getDouble(1), x.getDouble(2), x.getLong(3)))).toMap
    r.keySet shouldBe Set(0L, 1L, 2L, 3L)
    r(0L) shouldBe ((0.0, 2.5, 2L))   // 0.0, 1.0
    r(1L) shouldBe ((2.5, 5.0, 1L))   // 2.5
    r(2L) shouldBe ((5.0, 7.5, 1L))   // 5.0
    r(3L) shouldBe ((7.5, 10.0, 2L))  // 9.9 + hi-inclusive 10.0
  }

  test("histogram: null values excluded, all-empty axis still emitted") {
    import spark.implicits._
    val df = Seq[Option[Double]](None, Some(99.0)).toDF("v")
    val r = Profiling.histogram(df, "v", nBins = 3, lo = 0.0, hi = 30.0)
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    r shouldBe Map(0L -> 0L, 1L -> 0L, 2L -> 0L)
  }

  test("equiDepthHistogram: equal-count buckets, skew lands where width bins fail") {
    import spark.implicits._
    // heavy skew: 900 copies of 1.0, 100 spread values
    val df = ((1 to 900).map(i => (i.toLong, 1.0)) ++
      (1 to 100).map(i => (i + 900L, i * 10.0))).toDF("id", "x")
    val got = Profiling.equiDepthHistogram(df, "x", Seq("id"), k = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    got.keySet shouldBe (0L until 10L).toSet
    // every bucket holds exactly N/k = 100 rows regardless of skew
    got.values.map(_._1).toSet shouldBe Set(100L)
    // the hot value fills the low buckets; the spread tail its own
    got(0L)._2 shouldBe 1.0
    got(9L)._3 shouldBe 1000.0
    // buckets are ordered and non-overlapping
    (0L until 9L).foreach { b => got(b)._3 should be <= got(b + 1)._2 }
  }

  test("keySkew surfaces the hot key, exact shares, and max/mean ratio") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // key "hot" holds 60 of 100 rows; 40 singleton keys
    val df = ((1 to 60).map(_ => "hot") ++ (1 to 40).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val r = Profiling.keySkew(df, Seq("k"), topN = 3).collect()
    r.length shouldBe 3
    val top = r.head
    top.getAs[String]("key") shouldBe "hot"
    top.getAs[Long]("n") shouldBe 60L
    top.getAs[Double]("share_pct") shouldBe 60.0
    top.getAs[Long]("n_keys") shouldBe 41L
    top.getAs[Long]("total_rows") shouldBe 100L
    top.getAs[Long]("max_n") shouldBe 60L
    top.getAs[Double]("skew_ratio") shouldBe 24.6 // 60 / (100/41)
    // remaining top-3 rows are singleton keys in string order
    r.drop(1).map(_.getAs[String]("key")).toSeq shouldBe Seq("k1", "k10")
    // top-N plans as TakeOrderedAndProject, not a global sort
    Profiling.keySkew(df, Seq("k"), topN = 3)
      .queryExecution.executedPlan.toString should include("TakeOrderedAndProject")
    // multi-column keys diagnose through the joined string form
    val two = Profiling.keySkew(df.withColumn("k2", col("v") % 2), Seq("k", "k2"),
      topN = 1).head()
    two.getAs[Long]("n") shouldBe 30L // hot splits across k2 parity
  }

  test("equiDepthHistogram matches the window formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 997).map(i => (i.toLong, (i * 37 % 100).toDouble))
      .toDF("id", "x")
    val got = Profiling.equiDepthHistogram(df, "x", Seq("id"), k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val viaWindow = df
      .withColumn("r", row_number().over(Window.orderBy(col("x"), col("id"))))
      .withColumn("bucket",
        (((col("r") - 1) * 7) / lit(997)).cast("long"))
      .groupBy("bucket").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    got shouldBe viaWindow
  }
}
