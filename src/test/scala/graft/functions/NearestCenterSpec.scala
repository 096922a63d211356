package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class NearestCenterSpec extends SparkSpec {

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Round-EVERY-candidate reference — the semantics the lazy-rounding
    * granule optimization must reproduce exactly (the PqEncodeSpec
    * discipline, whole-vector).
    */
  private def ref(v: Seq[Double], ids: Seq[Long],
      cs: Seq[Seq[Double]]): (Double, Long) = {
    val (d, i) = cs
      .map(c => r6(v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum))
      .zipWithIndex.minBy { case (d, i) => (d, i) }
    (d, ids(i))
  }

  test("NearestCenter equals the round-every-candidate sequential reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val n = 9
    val ids = (0 until n).map(i => 500L + i)
    val cs = Seq.fill(n)(Seq.fill(4)(rnd.nextDouble()))
    val vecs = (0L until 50L).map(i => i -> Seq.fill(4)(rnd.nextDouble()))
    val got = vecs.toDF("id", "v")
      .select(col("id"),
        NearestCenterFn.nearestCenter(col("v").cast("array<double>"), ids, cs)
          .as("b"))
      .select(col("id"), col("b.d"), col("b.cid"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    vecs.foreach { case (id, v) => got(id) shouldBe ref(v, ids, cs) }
  }

  test("round-6 ties resolve to the EARLIEST center even when raw distance disagrees") {
    import spark.implicits._
    // d0 = 0.0011² = 1.21e-6, d1 = 0.0010² = 1.0e-6: both round to
    // 0.000001 — the raw argmin is center 1, round-6 semantics tie and
    // the earliest (index 0) wins, exactly like the fold
    val got = Seq((0L, Seq(0.0))).toDF("id", "v")
      .select(NearestCenterFn.nearestCenter(
        col("v").cast("array<double>"), Seq(7L, 8L), Seq(Seq(0.0011), Seq(0.0010)))
        .as("b"))
      .select(col("b.d"), col("b.cid")).head()
    got.getDouble(0) shouldBe 1e-6
    got.getLong(1) shouldBe 7L
  }

  test("all-NaN distances return the fold's zero element instead of crashing") {
    import spark.implicits._
    val got = Seq((0L, Seq(Double.NaN, 1.0))).toDF("id", "v")
      .select(NearestCenterFn.nearestCenter(
        col("v").cast("array<double>"), Seq(7L, 8L),
        Seq(Seq(0.0, 0.0), Seq(1.0, 1.0))).as("b"))
      .select(col("b.d"), col("b.cid")).head()
    got.getDouble(0) shouldBe Double.MaxValue
    got.getLong(1) shouldBe -1L
  }

  test("dimension mismatch fails loudly") {
    import spark.implicits._
    an[Exception] should be thrownBy {
      Seq((0L, Seq(0.5))).toDF("id", "v")
        .select(NearestCenterFn.nearestCenter(
          col("v").cast("array<double>"), Seq(7L), Seq(Seq(0.5, 0.5))))
        .collect()
    }
  }
}
