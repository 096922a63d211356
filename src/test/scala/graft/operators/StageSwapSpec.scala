package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[AtomicBatches.swapCommittedStage]] — the rename-based stage→live
  * swap every staged compaction rides (CountStore, the graph triangle
  * index). The protocol it must keep: a table PRESENT under the stage
  * replaces the live one; a table ABSENT from the stage was already
  * swapped by a crashed prior attempt and is left alone; the stage
  * directory (with its `_COMMIT`) goes last — so any crash point
  * re-runs verbatim under the caller's `_MAINT` + `_COMMIT` guards.
  */
class StageSwapSpec extends SparkSpec {

  private def fsOf(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeVals(path: String, vals: Seq[Long]): Unit = {
    import spark.implicits._
    vals.toDF("v").repartition(1).write.mode("overwrite").parquet(path)
  }

  private def readVals(path: String): Seq[Long] =
    spark.read.parquet(path).collect().map(_.getLong(0)).toSeq.sorted

  test("swap replaces staged tables and drops the stage last") {
    val dir = java.nio.file.Files.createTempDirectory("swap-full").toString
    writeVals(s"$dir/t1", Seq(1L)); writeVals(s"$dir/t2", Seq(2L))
    writeVals(s"$dir/base_next/t1", Seq(10L))
    writeVals(s"$dir/base_next/t2", Seq(20L))
    AtomicBatches.commit(spark, s"$dir/base_next")
    AtomicBatches.swapCommittedStage(spark, dir, s"$dir/base_next",
      Seq("t1", "t2"))
    readVals(s"$dir/t1") shouldBe Seq(10L)
    readVals(s"$dir/t2") shouldBe Seq(20L)
    fsOf(dir).exists(
      new org.apache.hadoop.fs.Path(s"$dir/base_next")) shouldBe false
  }

  test("re-run after a mid-swap crash completes without undoing work") {
    val dir = java.nio.file.Files.createTempDirectory("swap-crash").toString
    writeVals(s"$dir/t1", Seq(1L)); writeVals(s"$dir/t2", Seq(2L))
    writeVals(s"$dir/base_next/t1", Seq(10L))
    writeVals(s"$dir/base_next/t2", Seq(20L))
    AtomicBatches.commit(spark, s"$dir/base_next")
    val fs = fsOf(dir)
    // crash simulation: a prior attempt already swapped t1 (live holds
    // the staged content, the stage no longer lists it) and died before
    // touching t2
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/t1"), true)
    fs.rename(new org.apache.hadoop.fs.Path(s"$dir/base_next/t1"),
      new org.apache.hadoop.fs.Path(s"$dir/t1"))
    AtomicBatches.swapCommittedStage(spark, dir, s"$dir/base_next",
      Seq("t1", "t2"))
    // t1 (absent from the stage) kept its already-swapped content; t2
    // completed; the stage is gone
    readVals(s"$dir/t1") shouldBe Seq(10L)
    readVals(s"$dir/t2") shouldBe Seq(20L)
    fs.exists(new org.apache.hadoop.fs.Path(s"$dir/base_next")) shouldBe false
  }
}
