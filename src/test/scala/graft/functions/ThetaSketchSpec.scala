package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ThetaSketchSpec extends SparkSpec {
  import ThetaSketch._

  private def hash60(s: String): Long =
    ArrayOps.Md5Kernel.hash60(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** The hash array of a one-row sketch frame (column 0 = struct(k, vs)). */
  private def vsOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.head().getStruct(0).getSeq[Long](1)

  test("sketch below k is the exact sorted distinct hash set, and carries k") {
    import spark.implicits._
    val vals = Seq("a", "b", "c", "b", "a", null)
    val skRow = vals.toDF("v").agg(thetaSketch(col("v"), 16).as("sk")).head()
    skRow.getStruct(0).getInt(0) shouldBe 16 // the struct carries its k
    val sk = skRow.getStruct(0).getSeq[Long](1)
    sk shouldBe Seq("a", "b", "c").map(hash60).sorted
    // duplicates and nulls are invisible: multiplicity never changes a
    // distinct sketch
    vsOf((vals ++ vals ++ vals).toDF("v")
      .agg(thetaSketch(col("v"), 16).as("sk"))) shouldBe sk
  }

  test("canonical form: merged parts equal the whole-set sketch exactly, any layout") {
    import spark.implicits._
    val df = (0 until 5000).map(i => (i % 3, s"val-$i")).toDF("p", "v")
    val whole = vsOf(df.agg(thetaSketch(col("v"), 64).as("sk")))
    whole.length shouldBe 64
    whole shouldBe whole.sorted
    // per-part sketches union-merge to the identical array
    vsOf(df.groupBy("p").agg(thetaSketch(col("v"), 64).as("sk"))
      .agg(thetaUnion(col("sk"), 64).as("sk"))) shouldBe whole
    // and partition layout is invisible
    vsOf(df.repartition(13)
      .agg(thetaSketch(col("v"), 64).as("sk"))) shouldBe whole
  }

  test("estimate: exact below k, within ~3/sqrt(k) relative error above") {
    import spark.implicits._
    val small = (1 to 40).map(i => s"s$i").toDF("v")
      .agg(thetaEstimate(thetaSketch(col("v"), 64))).head().getDouble(0)
    small shouldBe 40.0
    val n = 20000
    val est = (1 to n).map(i => s"item-$i").toDF("v")
      .agg(thetaEstimate(thetaSketch(col("v"), 256))).head().getDouble(0)
    math.abs(est - n) / n should be <= 3.0 / math.sqrt(256.0)
  }

  test("set algebra: exact in the small regime, accurate in the estimated one") {
    import spark.implicits._
    // A = 1..30, B = 21..50: all three sets below k=64 ⇒ everything exact
    val a = (1 to 30).map(i => s"x$i").toDF("v")
      .agg(thetaSketch(col("v"), 64).as("s")).select(col("s").as("sa"))
    val b = (21 to 50).map(i => s"x$i").toDF("v")
      .agg(thetaSketch(col("v"), 64).as("s")).select(col("s").as("sb"))
    val r = a.crossJoin(b).select(
      thetaEstimate(thetaUnion2(col("sa"), col("sb"))).as("u"),
      thetaIntersect(col("sa"), col("sb")).as("i"),
      thetaJaccard(col("sa"), col("sb")).as("j"),
      thetaANotB(col("sa"), col("sb")).as("d")).head()
    r.getDouble(0) shouldBe 50.0
    r.getDouble(1) shouldBe 10.0
    r.getDouble(2) shouldBe (10.0 / 50.0) +- 1e-12
    r.getDouble(3) shouldBe 20.0
    // estimated regime: |A| = |B| = 8000 with 4000 shared (J = 1/3)
    val bigA = (1 to 8000).map(i => s"m$i").toDF("v")
      .agg(thetaSketch(col("v"), 256).as("s")).select(col("s").as("sa"))
    val bigB = (4001 to 12000).map(i => s"m$i").toDF("v")
      .agg(thetaSketch(col("v"), 256).as("s")).select(col("s").as("sb"))
    val e = bigA.crossJoin(bigB).select(
      thetaEstimate(thetaUnion2(col("sa"), col("sb"))).as("u"),
      thetaIntersect(col("sa"), col("sb")).as("i"),
      thetaJaccard(col("sa"), col("sb")).as("j")).head()
    math.abs(e.getDouble(0) - 12000.0) / 12000.0 should be <= 0.2
    math.abs(e.getDouble(1) - 4000.0) / 4000.0 should be <= 0.3
    math.abs(e.getDouble(2) - 1.0 / 3.0) should be <= 0.1
  }

  test("edge cases: empty sketches, disjoint sets, null propagation") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("v")
      .agg(thetaSketch(col("v"), 16).as("s"))
    val e = empty.select(
      org.apache.spark.sql.functions.size(col("s.vs")).as("n"),
      thetaEstimate(col("s")).as("est")).head()
    e.getInt(0) shouldBe 0
    e.getDouble(1) shouldBe 0.0
    // empty vs empty: intersect 0, jaccard NULL (undefined)
    val two = empty.select(col("s").as("sa"), col("s").as("sb"))
    val r = two.select(thetaIntersect(col("sa"), col("sb")).as("i"),
      thetaJaccard(col("sa"), col("sb")).as("j")).head()
    r.getDouble(0) shouldBe 0.0
    r.isNullAt(1) shouldBe true
    // disjoint non-empty sets: intersect and jaccard exactly 0
    val a = Seq("p1", "p2").toDF("v").agg(thetaSketch(col("v"), 16).as("s"))
      .select(col("s").as("sa"))
    val b = Seq("q1", "q2").toDF("v").agg(thetaSketch(col("v"), 16).as("s"))
      .select(col("s").as("sb"))
    val d = a.crossJoin(b).select(
      thetaIntersect(col("sa"), col("sb")).as("i"),
      thetaJaccard(col("sa"), col("sb")).as("j"),
      thetaANotB(col("sa"), col("sb")).as("d")).head()
    d.getDouble(0) shouldBe 0.0
    d.getDouble(1) shouldBe 0.0
    d.getDouble(2) shouldBe 2.0
  }

  test("NULL sketches estimate to NULL, not legacy size(NULL)=-1 artifacts") {
    import spark.implicits._
    // outer joins over sketch tables produce null sketches; under
    // spark.sql.legacy.sizeOfNull an unguarded estimator would return
    // -1.0, jaccard(null, x) would be 1.0 (-1/-1), and aNotB would
    // surface 0.0 (greatest skips nulls) — all actively wrong
    val b = Seq("q1", "q2").toDF("v").agg(thetaSketch(col("v"), 16).as("sb"))
      .select(lit(null).cast("struct<k:int,vs:array<bigint>>").as("sa"),
        col("sb"))
    val r = b.select(
      thetaEstimate(col("sa")).as("e"),
      thetaJaccard(col("sa"), col("sb")).as("j"),
      thetaJaccard(col("sb"), col("sa")).as("j2"),
      thetaIntersect(col("sa"), col("sb")).as("i"),
      thetaANotB(col("sa"), col("sb")).as("d"),
      thetaANotB(col("sb"), col("sa")).as("d2")).head()
    (0 until 6).foreach(i => r.isNullAt(i) shouldBe true)
  }

  test("k mismatch fails loudly: union aggregate and pair estimators") {
    import spark.implicits._
    val df = (1 to 1000).map(i => s"w$i").toDF("v")
    // the bare-array era silently capped a k=512 sketch folded at k=64
    // (a union at the wrong k reported 64.0 for any set) — now loud
    val wide = df.agg(thetaSketch(col("v"), 512).as("s"))
    val eUnion = intercept[Exception] {
      wide.agg(thetaUnion(col("s"), 64).as("s")).collect()
    }
    eUnion.getMessage should include("theta k mismatch")
    val pair = wide.select(col("s").as("sa"))
      .crossJoin(df.agg(thetaSketch(col("v"), 64).as("sb")))
    val ePair = intercept[Exception] {
      pair.select(thetaJaccard(col("sa"), col("sb"))).collect()
    }
    ePair.getMessage should include("theta k mismatch")
    val eEst = intercept[Exception] {
      pair.select(thetaEstimate(thetaUnion2(col("sa"), col("sb")))).collect()
    }
    eEst.getMessage should include("theta k mismatch")
  }

  test("sketch aggregation uses partial aggregation (map-side combine)") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 7, s"v$i")).toDF("g", "v")
    val plan = df.groupBy("g").agg(thetaSketch(col("v"), 64).as("sk"))
      .queryExecution.executedPlan.toString
    "ObjectHashAggregate".r.findAllIn(plan).size should be >= 2
  }

  test("graft_theta_* SQL surface matches the Column API") {
    import spark.implicits._
    graft.GraftFunctions.register(spark)
    val a = (1 to 30).map(i => s"x$i").toDF("v")
      .agg(thetaSketch(col("v"), 64).as("s")).select(col("s").as("sa"))
    val b = (21 to 50).map(i => s"x$i").toDF("v")
      .agg(thetaSketch(col("v"), 64).as("s")).select(col("s").as("sb"))
    a.crossJoin(b).createOrReplaceTempView("theta_two")
    val r = spark.sql(
      """SELECT graft_theta_estimate(sa) AS ea,
           graft_theta_intersect(sa, sb) AS i,
           graft_theta_jaccard(sa, sb) AS j,
           graft_theta_anotb(sa, sb) AS d
         FROM theta_two""").head()
    r.getDouble(0) shouldBe 30.0
    r.getDouble(1) shouldBe 10.0
    r.getDouble(2) shouldBe (10.0 / 50.0) +- 1e-12
    r.getDouble(3) shouldBe 20.0
  }
}
