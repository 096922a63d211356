package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EmbeddingsSpec extends SparkSpec {

  test("quantizeInt8: max-abs maps to ±127, zero vector to zeros, round-half-up") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(2.0, -4.0, 1.0)),   // scale 4 → q = (64, -127, 32)
      (2L, Seq(0.0, 0.0, 0.0))     // zero vector
    ).toDF("id", "v")
    val out = Embeddings.quantizeInt8(df, "id", "v")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Int](2))).toMap
    out(1L)._1 shouldBe 4.0
    // floor(2/4*127 + 0.5) = floor(64.0) = 64; floor(-127 + 0.5) = -127;
    // floor(1/4*127 + 0.5) = floor(32.25) = 32
    out(1L)._2 shouldBe Seq(64, -127, 32)
    out(2L)._1 shouldBe 0.0
    out(2L)._2 shouldBe Seq(0, 0, 0)
  }

  test("quantize → dequantize round-trips within 1/254 of scale") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.83, -0.21, 0.55, -0.97))).toDF("id", "v")
    val q = Embeddings.quantizeInt8(df, "id", "v")
    val back = Embeddings.dequantizeInt8(q, "q", "scale")
      .select(col("v_approx")).head().getSeq[Double](0)
    val orig = Seq(0.83, -0.21, 0.55, -0.97)
    back.zip(orig).foreach { case (a, o) =>
      math.abs(a - o) should be <= (0.97 / 254 + 1e-12)
    }
  }

  test("quantizeInt8 stays codegen-friendly — single narrow stage, no shuffle") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
    val plan = Embeddings.quantizeInt8(df, "id", "v")
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
