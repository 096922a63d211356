package graft

import org.apache.spark.sql.functions._

/** The self-evidencing half of the correctness gate: `Verify` must
  * persist a per-query summary (`verify_summary.json`) beside the
  * oracle dump, so a round whose DRIVER-side correctness artifact
  * lands empty is distinguishable at a glance from a Verify run that
  * produced nothing — the round-16 driver file was `{}` while the
  * sweep itself was green, and only a judge re-run could tell. An
  * intentionally broken query must surface in the summary as a
  * non-fatal per-query error, never abort the sweep.
  */
class VerifySummarySpec extends SparkSpec {

  test("runQueries records wrote/err per query and a broken query " +
      "does not stop the sweep") {
    val out = java.nio.file.Files.createTempDirectory("verify-sum").toString
    val outcomes = Verify.runQueries(spark, sfDir = "unused", out, Seq(
      "ok_one" -> ((s, _) => s.range(3).toDF("id")),
      "boom" -> ((_, _) => throw new IllegalStateException(
        "intentional \"failure\"\nwith control chars\t")),
      "ok_two" -> ((s, _) => s.range(2).select(col("id").as("x")))))
    outcomes.map(_._1) shouldBe Seq("ok_one", "boom", "ok_two")
    outcomes(0)._2 shouldBe None
    outcomes(2)._2 shouldBe None // the sweep survived the middle failure
    outcomes(1)._2.get should include("intentional")
    // the parquet dumps exist exactly for the written queries
    spark.read.parquet(s"$out/ok_one").count() shouldBe 3L
    spark.read.parquet(s"$out/ok_two").count() shouldBe 2L
    assert(!new java.io.File(s"$out/boom").exists())
  }

  test("summaryJson is machine-readable JSON with trailing counts, " +
      "escaped against control characters") {
    val json = Verify.summaryJson(Seq(
      "ok_one" -> None,
      "boom" -> Some("IllegalStateException: intentional " +
        "\"failure\"\nwith control chars\t")))
    // must parse as strict JSON — the exact property the driver's
    // json.load needs (jackson ships on the Spark classpath)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json)
    m.get("n_ok").asInt() shouldBe 1
    m.get("n_failed").asInt() shouldBe 1
    m.get("n_total").asInt() shouldBe 2
    m.get("queries").get("ok_one").get("wrote").asBoolean() shouldBe true
    m.get("queries").get("ok_one").get("err").isNull shouldBe true
    m.get("queries").get("boom").get("wrote").asBoolean() shouldBe false
    m.get("queries").get("boom").get("err").asText() should
      include("intentional")
  }
}
