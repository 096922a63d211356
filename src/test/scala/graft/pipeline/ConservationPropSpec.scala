package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** SURVEY §5 test plan item 3: for random pipelines à la the reference's
  * update_pipelines.js fuzzer (1-3 random steps, random DLQ slots),
  * received = completed + dlq + dropped + error — the invariant the
  * reference's operators verify from Prometheus counters.
  */
class ConservationPropSpec extends SparkSpec {

  private val stepGen: Gen[Step] = for {
    name <- Gen.oneOf("add10", "appendString", "capitalize", "reverseString",
      "isEven", "parseNum")
    dlq <- Gen.option(Gen.oneOf("dlq_a", "dlq_b"))
  } yield Step(Processors(name), dlq)

  private val pipelineGen: Gen[Pipeline] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, stepGen)).map(Pipeline(_))

  test("conservation holds for random step chains (reference update_pipelines fuzz)") {
    val n = 200
    val in = spark.range(n).select(
      col("id").cast("string").as("key"),
      // mix of numeric and non-numeric values so parseNum sometimes errors
      when(col("id") % 3 === 0, concat(lit("x"), col("id")))
        .otherwise(col("id").cast("string")).as("value"),
      col("id").cast("int").as("num")).cache()
    in.count()

    (0 until 15).foreach { i =>
      val pipe = pipelineGen(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail(s"generator produced no pipeline for seed $i"))
      withClue(s"pipeline ${pipe.steps.map(s => s.processor.name -> s.dlq)}: ") {
        val r = pipe(in)
        val total = r.toTarget.count() + r.toDlq.count() +
          r.dropped.count() + r.errors.count()
        total shouldBe n.toLong
      }
    }
  }
}
