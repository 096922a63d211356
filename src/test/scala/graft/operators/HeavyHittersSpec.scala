package graft.operators

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {

  test("MG candidates + exact recount = exact heavy set under decrement pressure") {
    import spark.implicits._
    // 3 heavy terms (100 occurrences each) interleaved with 600 distinct
    // singletons; sketchSize 16 << vocab 603 forces constant MG
    // decrements, but count 100 > 900/17 is guaranteed to survive
    val tokens = (0 until 600).flatMap { i =>
      val h = if (i < 300) Seq(Seq("alpha", "beta", "gamma")(i % 3)) else Seq.empty
      Seq(s"tok$i") ++ h
    }
    val docs = tokens.grouped(25).map(_.mkString(" ")).toSeq.toDF("text")
    val r = HeavyHitters.topTokens(docs, "text",
        minFraction = 0.1, sketchSize = 16)
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    r shouldBe Map("alpha" -> 100L, "beta" -> 100L, "gamma" -> 100L)
  }

  test("threshold is exact, not sketch-estimated: borderline term excluded") {
    import spark.implicits._
    // 10 a's, 9 b's over 100 tokens: minFraction 0.1 keeps a, drops b
    val tokens = Seq.fill(10)("a") ++ Seq.fill(9)("b") ++
      (0 until 81).map(i => s"t$i")
    val docs = tokens.grouped(20).map(_.mkString(" ")).toSeq.toDF("text")
    val r = HeavyHitters.topTokens(docs, "text", minFraction = 0.1, sketchSize = 64)
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    r shouldBe Map("a" -> 10L)
  }

  test("sketchSize too small for the fraction is rejected loudly") {
    import spark.implicits._
    val docs = Seq("a b c").toDF("text")
    an[IllegalArgumentException] should be thrownBy
      HeavyHitters.topTokens(docs, "text", minFraction = 0.01, sketchSize = 50)
  }
}
