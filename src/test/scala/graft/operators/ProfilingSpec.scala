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

  test("profile rejects an empty column list") {
    import spark.implicits._
    an[IllegalArgumentException] should be thrownBy
      Profiling.profile(Seq(1).toDF("a"), Seq.empty)
  }
}
