package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The kmeans_model persisted store: train+persist with a training
  * manifest, fence-on-delete (serving a victim-trained model after a
  * takedown is the violation the fence makes impossible), audit via
  * manifest-minus-tombstones, and compact = retrain-over-survivors —
  * the registered-kind promotion of the former
  * [[Takedown.userPersisted]] doc contract for kmeansTrain.
  */
class KmeansModelSpec extends SparkSpec {

  private def vecs: DataFrame = {
    import spark.implicits._
    (0L to 11L).map(i =>
      (i, Seq(math.cos(i * 0.5), math.sin(i * 0.5), 0.1 * i, 1.0)))
      .toDF("vec_id", "embedding")
  }
  private def survivorVecs: DataFrame =
    vecs.filter(col("vec_id") % 3 =!= 1)
  private def victims: DataFrame =
    vecs.filter(col("vec_id") % 3 === 1).select(col("vec_id").as("id"))

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"km-$tag").toString + "/km"

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString(""))

  test("write persists the trained model + manifest; reads and assigns " +
      "match the in-memory train faces") {
    val path = tmp("write")
    Embeddings.kmeansModelWrite(vecs, "vec_id", "embedding",
      dim = 4, k = 2, iters = 2, path)
    val direct = Embeddings.kmeansTrain(vecs, "vec_id", "embedding",
      dim = 4, k = 2, iters = 2)
    sorted(Embeddings.kmeansModelCentroids(spark, path)) shouldBe
      sorted(direct)
    sorted(Embeddings.kmeansModelAssign(vecs, "vec_id", "embedding",
      path)) shouldBe
      sorted(Embeddings.kmeansAssign(vecs, "vec_id", "embedding", direct))
    // the manifest records exactly the training rows
    sorted(Embeddings.kmeansModelPresentIds(spark, path)) shouldBe
      (0L to 11L).map(Seq[Any](_)).sortBy(_.mkString(""))
  }

  test("delete fences the stale model and tombstones victims; compact " +
      "retrains over survivors and lifts the fence") {
    val path = tmp("delete")
    Embeddings.kmeansModelWrite(vecs, "vec_id", "embedding",
      dim = 4, k = 2, iters = 2, path)
    Embeddings.kmeansModelDelete(victims, "id", path)
    // fenced: serving the victim-trained centroids refuses loudly
    Embeddings.kmeansModelStale(spark, path) shouldBe true
    intercept[IllegalArgumentException] {
      Embeddings.kmeansModelCentroids(spark, path)
    }.getMessage should include("VICTIM-STALE")
    // the audit probe follows read visibility: tombstoned ids are gone
    sorted(Embeddings.kmeansModelPresentIds(spark, path)) shouldBe
      (0L to 11L).filter(_ % 3 != 1).map(Seq[Any](_))
        .sortBy(_.mkString(""))
    // compact = retrain-over-survivors: equals a fresh train on them
    Embeddings.kmeansModelCompact(spark, path)
    Embeddings.kmeansModelStale(spark, path) shouldBe false
    sorted(Embeddings.kmeansModelCentroids(spark, path)) shouldBe
      sorted(Embeddings.kmeansTrain(survivorVecs, "vec_id", "embedding",
        dim = 4, k = 2, iters = 2))
    sorted(Embeddings.kmeansModelPresentIds(spark, path)) shouldBe
      (0L to 11L).filter(_ % 3 != 1).map(Seq[Any](_))
        .sortBy(_.mkString(""))
    // physical removal: tombstones retired, manifest survivor-only
    spark.read.parquet(s"$path/manifest")
      .filter(col("id") % 3 === 1).count() shouldBe 0L
    Similarity.readParquetIfAny(spark, s"$path/victims")
      .map(_.count()).getOrElse(0L) shouldBe 0L
    // re-delivery after compact is a no-op (ids left the manifest)
    Embeddings.kmeansModelDelete(victims, "id", path)
    Embeddings.kmeansModelStale(spark, path) shouldBe false
  }

  test("victims outside the manifest never fence; compact without " +
      "tombstones is a no-op") {
    import spark.implicits._
    val path = tmp("noop")
    Embeddings.kmeansModelWrite(vecs, "vec_id", "embedding",
      dim = 4, k = 2, iters = 2, path)
    val before = sorted(Embeddings.kmeansModelCentroids(spark, path))
    Embeddings.kmeansModelDelete(
      Seq(100L, 200L).toDF("id"), "id", path)
    Embeddings.kmeansModelStale(spark, path) shouldBe false
    Embeddings.kmeansModelCompact(spark, path) // no-op, no _MAINT churn
    sorted(Embeddings.kmeansModelCentroids(spark, path)) shouldBe before
  }

  test("the orchestrator drives the kind end-to-end: held before, " +
      "clean after forget, retrained after compactAll") {
    import graft.operators.Takedown.Store
    val path = tmp("orch")
    Embeddings.kmeansModelWrite(vecs, "vec_id", "embedding",
      dim = 4, k = 2, iters = 2, path)
    val stores = Seq(Store("kmeans_model", path))
    Takedown.audit(victims, stores).head().getString(2) shouldBe "held"
    Takedown.forget(victims, stores, idCol = "id")
      .head().getString(2) shouldBe "deleted"
    // post-forget: fenced (no read face serves victim influence), so
    // the audit is already clean; physical/model removal is compact's
    Takedown.assertForgotten(victims, stores, idCol = "id")
    Takedown.compactAll(spark, stores)
      .head().getString(2) shouldBe "compacted"
    Takedown.assertForgotten(victims, stores, idCol = "id")
    sorted(Embeddings.kmeansModelCentroids(spark, path)) shouldBe
      sorted(Embeddings.kmeansTrain(survivorVecs, "vec_id", "embedding",
        dim = 4, k = 2, iters = 2))
  }

  test("a _MAINT marker stranded after the last cleanup step still " +
      "clears under takeover compaction") {
    val path = tmp("marker")
    Embeddings.kmeansModelWrite(vecs, "vec_id", "embedding",
      dim = 4, k = 2, iters = 2, path)
    // simulate a compact that crashed AFTER deleting victims + _STALE
    // but BEFORE the lock release: only the marker remains
    intercept[RuntimeException] {
      AtomicBatches.withMaintenanceLock(spark, path, takeover = false) {
        throw new RuntimeException("simulated crash after cleanup")
      }
    }
    intercept[IllegalArgumentException] {
      Embeddings.kmeansModelCentroids(spark, path)
    }.getMessage should include("maintenance")
    // the no-op fast path must NOT return around the marker (that
    // would fence the store forever); without takeover the stale-
    // marker protocol refuses, with it the lock clears on completion
    intercept[IllegalArgumentException] {
      Embeddings.kmeansModelCompact(spark, path)
    }.getMessage should include("takeover")
    Embeddings.kmeansModelCompact(spark, path, takeover = true)
    Embeddings.kmeansModelCentroids(spark, path).count() shouldBe 2L
  }

  test("a delete crashed between fence and tombstones cannot be " +
      "compacted over: stale-with-no-tombstones refuses, re-running " +
      "the forget recovers") {
    val path = tmp("fencecrash")
    Embeddings.kmeansModelWrite(vecs, "vec_id", "embedding",
      dim = 4, k = 2, iters = 2, path)
    // simulate the delete's crash window: fence up, no tombstones yet
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$path/_STALE"), true).close()
    // the victim set is UNKNOWN here — compacting would retrain over
    // the full manifest and lift the fence with every victim still in
    intercept[IllegalArgumentException] {
      Embeddings.kmeansModelCompact(spark, path)
    }.getMessage should include("re-run the forget")
    // the documented recovery: re-deliver the forget, then compact
    Embeddings.kmeansModelDelete(victims, "id", path)
    Embeddings.kmeansModelCompact(spark, path)
    sorted(Embeddings.kmeansModelCentroids(spark, path)) shouldBe
      sorted(Embeddings.kmeansTrain(survivorVecs, "vec_id", "embedding",
        dim = 4, k = 2, iters = 2))
  }

  test("train faces release their internal checkpoints; the delete's " +
      "victim join count-gates its broadcast like the table kind") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Embeddings.kmeansTrain(vecs, "vec_id", "embedding",
      dim = 4, k = 2, iters = 2).collect()
    Embeddings.pqTrain(vecs, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, iters = 2).collect()
    spark.sparkContext.getPersistentRDDs.keySet shouldBe before
    // shrunken threshold → the delete's semi join runs in the
    // non-broadcast regime end-to-end and stays row-exact
    val path = tmp("gate")
    Embeddings.kmeansModelWrite(vecs, "vec_id", "embedding",
      dim = 4, k = 2, iters = 2, path)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "16") // max 2 hinted ids < the 4 victims
      Embeddings.kmeansModelDelete(victims, "id", path)
    } finally spark.conf.set(key, saved)
    Embeddings.kmeansModelStale(spark, path) shouldBe true
    sorted(Embeddings.kmeansModelPresentIds(spark, path)) shouldBe
      (0L to 11L).filter(_ % 3 != 1).map(Seq[Any](_))
        .sortBy(_.mkString(""))
  }

  test("pq_model rides the same protocol: persisted codebooks equal " +
      "pqTrain, fence on delete, retrain-over-survivors at compact") {
    import graft.operators.Takedown.Store
    val path = tmp("pq")
    Embeddings.pqModelWrite(vecs, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, iters = 2, path)
    val direct = Embeddings.pqTrain(vecs, "vec_id", "embedding",
      dim = 4, m = 2, k = 2, iters = 2)
    sorted(Embeddings.pqModelCodebooks(spark, path)) shouldBe sorted(direct)
    sorted(Embeddings.pqModelEncode(vecs, "vec_id", "embedding",
      path)) shouldBe
      sorted(Embeddings.pqEncode(vecs, "vec_id", "embedding", direct))
    val stores = Seq(Store("pq_model", path))
    Takedown.audit(victims, stores).head().getString(2) shouldBe "held"
    Takedown.forget(victims, stores, idCol = "id")
      .head().getString(2) shouldBe "deleted"
    intercept[IllegalArgumentException] {
      Embeddings.pqModelCodebooks(spark, path)
    }.getMessage should include("VICTIM-STALE")
    Takedown.assertForgotten(victims, stores, idCol = "id")
    Takedown.compactAll(spark, stores)
      .head().getString(2) shouldBe "compacted"
    sorted(Embeddings.pqModelCodebooks(spark, path)) shouldBe
      sorted(Embeddings.pqTrain(survivorVecs, "vec_id", "embedding",
        dim = 4, m = 2, k = 2, iters = 2))
    Takedown.assertForgotten(victims, stores, idCol = "id")
  }

  test("a crashed manifest swap recovers under takeover; an " +
      "all-victims manifest compacts to an empty model") {
    import spark.implicits._
    val path = tmp("crash")
    Embeddings.kmeansModelWrite(vecs, "vec_id", "embedding",
      dim = 4, k = 2, iters = 2, path)
    Embeddings.kmeansModelDelete(victims, "id", path)
    // simulate the crash window between manifest delete and rename:
    // manifest_next holds the survivors, manifest is gone, _MAINT stays
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(s"$path/manifest")
      .join(victims.select(col("id")), Seq("id"), "left_anti")
      .write.parquet(s"$path/manifest_next")
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/manifest"), true)
    intercept[RuntimeException] {
      AtomicBatches.withMaintenanceLock(spark, path, takeover = false) {
        throw new RuntimeException("simulated mid-compact crash")
      }
    }
    // faces refuse while the crashed pass owns the store
    intercept[IllegalArgumentException] {
      Embeddings.kmeansModelCentroids(spark, path)
    }.getMessage should include("maintenance")
    // takeover re-runs to completion from the recovered swap
    Embeddings.kmeansModelCompact(spark, path, takeover = true)
    sorted(Embeddings.kmeansModelCentroids(spark, path)) shouldBe
      sorted(Embeddings.kmeansTrain(survivorVecs, "vec_id", "embedding",
        dim = 4, k = 2, iters = 2))
    // all-victims: the retrain has nothing to stand on — empty model
    val path2 = tmp("empty")
    Embeddings.kmeansModelWrite(vecs, "vec_id", "embedding",
      dim = 4, k = 2, iters = 2, path2)
    Embeddings.kmeansModelDelete(
      vecs.select(col("vec_id").as("id")), "id", path2)
    Embeddings.kmeansModelCompact(spark, path2)
    Embeddings.kmeansModelCentroids(spark, path2).count() shouldBe 0L
    Embeddings.kmeansModelPresentIds(spark, path2).count() shouldBe 0L
  }
}
