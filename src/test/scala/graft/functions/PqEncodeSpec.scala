package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PqEncodeSpec extends SparkSpec {

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Round-EVERY-candidate reference — the semantics the lazy-rounding
    * granule optimization must reproduce exactly.
    */
  private def ref(v: Seq[Double], cbs: Seq[Seq[Seq[Double]]]): Seq[Int] = {
    val sub = cbs.head.head.length
    cbs.indices.map { s =>
      val sl = v.slice(s * sub, (s + 1) * sub)
      cbs(s).map(c => r6(sl.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum))
        .zipWithIndex.minBy { case (d, i) => (d, i) }._2
    }
  }

  test("PqEncode equals the round-every-candidate sequential reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val m = 4; val sub = 3; val k = 7
    val cbs = Seq.fill(m)(Seq.fill(k)(Seq.fill(sub)(rnd.nextDouble())))
    val vecs = (0L until 60L).map(i => i -> Seq.fill(m * sub)(rnd.nextDouble()))
    val got = vecs.toDF("id", "v")
      .select(col("id"), PqEncodeFn.pqEncode(
        col("v").cast("array<double>"), cbs).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    vecs.foreach { case (id, v) => got(id) shouldBe ref(v, cbs) }
  }

  test("round-6 ties resolve to the LOWEST cluster even when the raw distance disagrees") {
    import spark.implicits._
    // d0 = 0.0011² = 1.21e-6, d1 = 0.0010² = 1.0e-6: both round to
    // 0.000001 — the raw argmin is index 1, but round-6 semantics tie
    // and the fold keeps index 0
    val cbs = Seq(Seq(Seq(0.0011), Seq(0.0010)))
    val got = Seq((0L, Seq(0.0))).toDF("id", "v")
      .select(PqEncodeFn.pqEncode(col("v").cast("array<double>"), cbs))
      .head.getSeq[Int](0)
    got shouldBe Seq(0)
    // sanity: the reference agrees
    ref(Seq(0.0), cbs) shouldBe Seq(0)
  }

  test("identical codewords tie to the lowest index; short vectors fail loudly") {
    import spark.implicits._
    val dup = Seq(Seq(Seq(0.5, 0.5), Seq(0.9, 0.1), Seq(0.5, 0.5)))
    Seq((0L, Seq(0.5, 0.5))).toDF("id", "v")
      .select(PqEncodeFn.pqEncode(col("v").cast("array<double>"), dup))
      .head.getSeq[Int](0) shouldBe Seq(0)
    an[Exception] should be thrownBy {
      Seq((0L, Seq(0.5))).toDF("id", "v")
        .select(PqEncodeFn.pqEncode(col("v").cast("array<double>"), dup))
        .collect()
    }
  }
}
