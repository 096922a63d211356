package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuantileSketchSpec extends SparkSpec {
  import QuantileSketch._

  private def sketchOf(df: org.apache.spark.sql.DataFrame, bins: Int = 256) =
    df.agg(sketchAgg(col("v"), bins).as("sk"))

  test("canonical form: merged halves equal the whole-column sketch exactly") {
    import spark.implicits._
    val vals = (0 until 2000).map(i => (i.toLong, (i * 37 % 1000) + i / 100.0))
    val df = vals.toDF("id", "v")
    val whole = sketchOf(df).select("sk").head()
    val halves = df.groupBy((col("id") % 2).as("h")).agg(sketchAgg(col("v")).as("sk"))
    val merged = halves.agg(sketchMerge(col("sk")).as("sk")).select("sk").head()
    merged shouldBe whole
    // and a three-way split merges to the same canonical struct
    val thirds = df.groupBy((col("id") % 3).as("h")).agg(sketchAgg(col("v")).as("sk"))
    thirds.agg(sketchMerge(col("sk")).as("sk")).select("sk").head() shouldBe whole
  }

  test("canonical form is layout-independent") {
    import spark.implicits._
    val df = (0 until 5000).map(i => math.sin(i) * 1e4).toDF("v")
    sketchOf(df.repartition(13)).select("sk").head() shouldBe
      sketchOf(df.coalesce(1)).select("sk").head()
  }

  test("quantile estimates are within one bucket width of exact") {
    import spark.implicits._
    val vals = (1 to 10000).map(_.toDouble)
    val df = vals.toDF("v")
    val r = sketchOf(df)
      .select(col("sk.k").as("k"), col("sk.n").as("n"),
        sketchQuantile(col("sk"), 0.5).as("p50"),
        sketchQuantile(col("sk"), 0.9).as("p90"),
        sketchQuantile(col("sk"), 0.0).as("p0"),
        sketchQuantile(col("sk"), 1.0).as("p100"))
      .head()
    val w = math.pow(2.0, r.getAs[Int]("k"))
    r.getAs[Long]("n") shouldBe 10000L
    math.abs(r.getAs[Double]("p50") - 5000.0) should be <= w
    math.abs(r.getAs[Double]("p90") - 9000.0) should be <= w
    math.abs(r.getAs[Double]("p0") - 1.0) should be <= w
    math.abs(r.getAs[Double]("p100") - 10000.0) should be <= w
  }

  test("bins budget holds and k adapts to range") {
    import spark.implicits._
    // wide range at few bins: occupied buckets stay within budget
    val df = (0 until 4096).map(i => i * 1000.0).toDF("v")
    val r = sketchOf(df, bins = 16).select("sk").head()
      .getAs[org.apache.spark.sql.Row](0)
    val idxs = r.getSeq[Long](1)
    idxs.length should be <= 16
    // clustered data keeps FINE granularity — only OCCUPIED buckets
    // count against the budget (the advantage over a span-based
    // histogram): two tight clusters a million apart still resolve at
    // sub-unit width
    val clustered = ((0 until 500).map(_ * 0.001) ++
      (0 until 500).map(i => 1e6 + i * 0.001)).toDF("v")
    val rc = sketchOf(clustered, bins = 256).select(col("sk.k")).head().getInt(0)
    math.pow(2.0, rc) should be <= 16.0
  }

  test("nulls and non-finite values are skipped; empty sketch yields NULL") {
    import spark.implicits._
    val df = Seq[java.lang.Double](1.0, null, Double.NaN,
      Double.PositiveInfinity, 3.0).toDF("v")
    val r = sketchOf(df)
      .select(col("sk.n"), sketchQuantile(col("sk"), 0.5)).head()
    r.getLong(0) shouldBe 2L
    val empty = Seq.empty[java.lang.Double].toDF("v")
    val e = sketchOf(empty)
      .select(col("sk.n"), sketchQuantile(col("sk"), 0.5)).head()
    e.getLong(0) shouldBe 0L
    e.isNullAt(1) shouldBe true
  }

  test("negative values and mixed-granularity merge") {
    import spark.implicits._
    // side A forces a coarse k, side B is fine-grained: merge must
    // align exactly (fold the finer side) and still answer correctly
    val a = (0 until 1000).map(i => i * 1e5).toDF("v")
    val b = (0 until 1000).map(i => -i * 0.01).toDF("v")
    val skA = sketchOf(a).select(col("sk").as("s"))
    val skB = sketchOf(b).select(col("sk").as("s"))
    val m = skA.union(skB).agg(sketchMerge(col("s")).as("sk"))
      .select(col("sk.n"), col("sk.k"),
        sketchQuantile(col("sk"), 0.5).as("p50")).head()
    m.getLong(0) shouldBe 2000L
    // direct sketch of the union is the same canonical struct
    val whole = a.union(b).agg(sketchAgg(col("v")).as("sk"))
      .select(col("sk.n"), col("sk.k"),
        sketchQuantile(col("sk"), 0.5).as("p50")).head()
    m shouldBe whole
    // exact median of the union is -0.005 (halves interleave at 0);
    // estimate within one (coarse) bucket width
    math.abs(m.getAs[Double]("p50") - 0.0) should be <=
      math.pow(2.0, m.getInt(1))
  }

  test("sketch aggregation uses partial aggregation (map-side combine)") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 7, i.toDouble)).toDF("g", "v")
    val plan = df.groupBy("g").agg(sketchAgg(col("v")).as("sk"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate runs twice (partial + final) around the
    // exchange — raw values never cross the shuffle
    "ObjectHashAggregate".r.findAllIn(plan).size should be >= 2
  }

  test("merging a sketch built with a LARGER bins budget pre-folds safely") {
    import spark.implicits._
    // 1000 integer values stay in 1000 distinct fine buckets under a
    // 1024-bin budget; feeding that sketch to sketchMerge(bins = 256)
    // used to blow the 2×256 buffer capacity (ArrayIndexOutOfBounds).
    // The pre-fold must land on the SAME canonical struct a direct
    // 256-bin sketch of the raw values produces.
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val wide = sketchOf(df, bins = 1024).select(col("sk").as("s"))
    val folded = wide.agg(sketchMerge(col("s"), bins = 256).as("sk"))
      .select("sk").head()
    folded shouldBe sketchOf(df, bins = 256).select("sk").head()
    // and two wide sketches merged under the narrow budget still equal
    // the direct narrow sketch of the union
    val a = (1 to 1000).map(_.toDouble).toDF("v")
    val b = (2000 to 2750).map(_.toDouble).toDF("v")
    val both = sketchOf(a, 1024).select(col("sk").as("s"))
      .union(sketchOf(b, 1024).select(col("sk").as("s")))
    both.agg(sketchMerge(col("s"), bins = 256).as("sk")).select("sk").head() shouldBe
      sketchOf(a.union(b), 256).select("sk").head()
  }

  test("graft_sketch_quantile SQL surface extracts from a sketch struct") {
    import spark.implicits._
    graft.GraftFunctions.register(spark)
    (1 to 100).map(_.toDouble).toDF("v").createOrReplaceTempView("qs_vals")
    spark.sql("""SELECT count(*) FROM qs_vals""").head() // view sanity
    val sk = sketchOf((1 to 100).map(_.toDouble).toDF("v"))
    sk.createOrReplaceTempView("qs_sk")
    val est = spark.sql(
      "SELECT graft_sketch_quantile(sk, 0.5) AS p50 FROM qs_sk")
      .head().getDouble(0)
    math.abs(est - 50.0) should be <= 1.0
  }
}
