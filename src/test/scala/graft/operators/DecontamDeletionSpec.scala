package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The takedown discipline on the versionless probe-and-append indexes —
  * decontamination grams ([[TrainingData.decontamIndexDelete]]),
  * containment shingles ([[TrainingData.containmentIndexDelete]]), and
  * the exact prefix-join index ([[Dedup.jaccardPrefixIndexDelete]]):
  * bounded victim-list delete, probes answer as if built over
  * corpus-minus-victims, appends of pending victims fail loudly,
  * compaction removes the bytes under the `_MAINT` lock, a rebuild
  * supersedes everything.
  */
class DecontamDeletionSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (5L, "alpha beta gamma delta epsilon zeta eta theta"),
      (6L, "alpha beta gamma delta something entirely different here"),
      (7L, "unrelated words with no overlap whatsoever at all none"),
      (8L, "alpha beta gamma delta epsilon zeta eta theta") // dup of 5
    ).toDF("doc_id", "text")
  }

  private def bench = {
    import spark.implicits._
    Seq((0L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
  }

  private def ids(xs: Long*) = {
    import spark.implicits._
    xs.toDF("doc_id")
  }

  test("gram index: delete hides, compact removes bytes, append guard, rebuild clears") {
    val idx = java.nio.file.Files.createTempDirectory("dc-del").toString
    TrainingData.decontamIndexWrite(corpus, "doc_id", "text", idx,
      n = 4, nBuckets = 8)
    def probe() = TrainingData
      .decontaminateFromIndex(bench, "text", idx, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = probe()
    full.keySet shouldBe Set(5L, 6L, 8L)
    // expected post-delete answer = an index built WITHOUT the victim
    TrainingData.decontamIndexDelete(ids(5L), "doc_id", idx)
    probe() shouldBe full - 5L
    // append of the pending victim fails loudly; unrelated ids pass
    import spark.implicits._
    intercept[IllegalArgumentException] {
      TrainingData.decontamIndexAppend(
        Seq((5L, "alpha beta gamma delta")).toDF("doc_id", "text"),
        "doc_id", "text", idx)
    }.getMessage should include ("Compact")
    TrainingData.decontamIndexAppend(
      Seq((9L, "alpha beta gamma delta fresh tail")).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    probe().keySet shouldBe Set(6L, 8L, 9L)
    // compaction: bytes gone, probe unchanged, victims retired
    TrainingData.decontamIndexCompact(spark, idx)
    spark.read.parquet(s"$idx/grams").filter(col("doc_id") === 5L)
      .count() shouldBe 0L
    new java.io.File(s"$idx/victims").exists() shouldBe false
    probe().keySet shouldBe Set(6L, 8L, 9L)
    // post-compaction the id may be re-appended (resurrection)
    TrainingData.decontamIndexAppend(
      Seq((5L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"), "doc_id", "text", idx)
    probe().keySet shouldBe Set(5L, 6L, 8L, 9L)
    // a crashed compaction blocks every face until takeover or rebuild
    intercept[RuntimeException] {
      AtomicBatches.withMaintenanceLock(spark, idx, takeover = false) {
        throw new RuntimeException("simulated crash")
      }
    }
    intercept[IllegalArgumentException] { probe() }
      .getMessage should include ("_MAINT")
    TrainingData.decontamIndexWrite(corpus, "doc_id", "text", idx,
      n = 4, nBuckets = 8)
    probe() shouldBe full
  }

  test("containment index: delete hides and compact removes bytes") {
    val idx = java.nio.file.Files.createTempDirectory("ct-del").toString
    TrainingData.containmentIndexWrite(corpus, "doc_id", "text", idx,
      shingleN = 12, nBuckets = 8)
    def probe() = TrainingData.decontaminateContainmentFromIndex(
        bench.select(col("doc_id").as("eval_id"), col("text")),
        "eval_id", "text", idx, "doc_id", threshold = 0.8)
      .collect().map(_.getLong(0)).toSet
    probe() shouldBe Set(5L, 8L)
    TrainingData.containmentIndexDelete(ids(5L), "doc_id", idx)
    probe() shouldBe Set(8L)
    TrainingData.containmentIndexCompact(spark, idx)
    spark.read.parquet(s"$idx/shingles").filter(col("doc_id") === 5L)
      .count() shouldBe 0L
    probe() shouldBe Set(8L)
  }

  test("prefix index: delete drops victim pairs, compact rewrites docs+prefix") {
    val idx = java.nio.file.Files.createTempDirectory("jp-del").toString
    Dedup.jaccardPrefixIndexWrite(corpus, "doc_id", "text", idx,
      shingleN = 5, threshold = 0.7)
    import spark.implicits._
    val newBatch = Seq(
      (250L, "alpha beta gamma delta epsilon zeta eta theta")) // dup of 5, 8
      .toDF("doc_id", "text")
    def probe() = Dedup.jaccardJoinPrefixIncremental(newBatch, "doc_id",
        "text", idx, threshold = 0.7)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    probe() shouldBe Set((5L, 250L), (8L, 250L))
    Dedup.jaccardPrefixIndexDelete(ids(5L), "doc_id", idx)
    probe() shouldBe Set((8L, 250L))
    // append of the pending victim fails; compaction removes the bytes
    intercept[IllegalArgumentException] {
      Dedup.jaccardPrefixIndexAppend(
        Seq((5L, "alpha beta")).toDF("doc_id", "text"), "doc_id", "text", idx)
    }.getMessage should include ("Compact")
    Dedup.jaccardPrefixIndexCompact(spark, idx)
    spark.read.parquet(s"$idx/docs").filter(col("__id") === 5L)
      .count() shouldBe 0L
    spark.read.parquet(s"$idx/prefix").filter(col("__pid") === 5L)
      .count() shouldBe 0L
    new java.io.File(s"$idx/victims").exists() shouldBe false
    probe() shouldBe Set((8L, 250L))
    // post-compaction re-append resurrects the id
    Dedup.jaccardPrefixIndexAppend(
      Seq((5L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"), "doc_id", "text", idx)
    probe() shouldBe Set((5L, 250L), (8L, 250L))
  }
}
