package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.StreamingOps

/** The deletion (takedown) discipline on the persisted ANN indexes:
  * [[Similarity.ivfDelete]] writes (id, up_to) tombstones into the
  * dedicated tombstones/ channel, every probe/join/stream face honors
  * them BEFORE its rowFilter, and tombstone-aware compaction physically
  * removes the rows.
  */
class TombstoneSpec extends SparkSpec {

  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.99, 0.14, 0.0, 0.0)),
      (2L, Seq(0.7, 0.7, 0.0, 0.0)),
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),
      (4L, Seq(-1.0, 0.0, 0.0, 0.0)),
      (5L, Seq(0.9, -0.43, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
  }

  private def ids(xs: Long*) = {
    import spark.implicits._
    xs.toDF("vec_id")
  }

  private val q = Seq(1.0, 0.05, 0.0, 0.0)

  test("ivfDelete: SQ8 point probe equals an explicit exclusion filter") {
    val dir = java.nio.file.Files.createTempDirectory("tomb-sq8").toString
    Similarity.ivfWriteIndexSQ8(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    // ground truth from the SAME index (same centroids, same cells):
    // what the probe should answer once 1 and 3 are gone
    val expected = Similarity.ivfTopKFromIndexSQ8(spark, dir, "vec_id", q,
      k = 3, nProbe = 4,
      rowFilter = _.filter(!col("vec_id").isin(1L, 3L)))
      .collect().map(_.toSeq).toSeq
    Similarity.ivfDelete(ids(1L, 3L), "vec_id", dir)
    val got = Similarity.ivfTopKFromIndexSQ8(spark, dir, "vec_id", q,
      k = 3, nProbe = 4).collect().map(_.toSeq).toSeq
    got shouldBe expected
    got.map(_.head.asInstanceOf[Long]) should contain noneOf (1L, 3L)
    // a filtered probe whose predicate matches ONLY deleted rows cannot
    // resurrect them: tombstones are honored before rowFilter
    Similarity.ivfTopKFromIndexSQ8(spark, dir, "vec_id", q,
      k = 3, nProbe = 4,
      rowFilter = _.filter(col("vec_id").isin(1L, 3L))).count() shouldBe 0L
  }

  test("ivfDelete: flat probe, join face, and the no-op delete") {
    val dir = java.nio.file.Files.createTempDirectory("tomb-flat").toString
    Similarity.ivfWriteIndex(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    // deleting an id the index never held is a no-op
    Similarity.ivfDelete(ids(99L), "vec_id", dir)
    Similarity.ivfTopKFromIndex(spark, dir, "vec_id", q, k = 6, nProbe = 4)
      .count() shouldBe 6L
    Similarity.ivfDelete(ids(0L), "vec_id", dir)
    val point = Similarity.ivfTopKFromIndex(spark, dir, "vec_id", q,
      k = 6, nProbe = 4).collect().map(_.getLong(0))
    point should not contain 0L
    point.length shouldBe 5
    // batched join face: no query's neighbor list contains a deleted id
    val joined = Similarity.ivfTopKJoin(vecs, "vec_id", "embedding", dir,
      "vec_id", k = 3, nProbe = 4)
    joined.filter(col("id") === 0L).count() shouldBe 0L
    // every query still answers with k rows from the survivors
    joined.groupBy("q_id").count().select(min("count")).head.getLong(0) shouldBe 3L
  }

  test("ivfDelete: PQ refine face honors tombstones in both tiers") {
    val dir = java.nio.file.Files.createTempDirectory("tomb-pqr").toString
    Similarity.ivfWriteIndexPQ(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 0, m = 2, codebookK = 4,
      pqIters = 1, kernel = "md5", withRefine = true)
    val expected = Similarity.ivfTopKFromIndexPQRefine(spark, dir, "vec_id",
      q, k = 3, nProbe = 4, refineFactor = 2,
      rowFilter = _.filter(col("vec_id") =!= 1L))
      .collect().map(_.toSeq).toSeq
    Similarity.ivfDelete(ids(1L), "vec_id", dir)
    Similarity.ivfTopKFromIndexPQRefine(spark, dir, "vec_id", q,
      k = 3, nProbe = 4, refineFactor = 2)
      .collect().map(_.toSeq).toSeq shouldBe expected
    // the plain PQ probe and the PQ join face agree
    Similarity.ivfTopKFromIndexPQ(spark, dir, "vec_id", q, k = 6, nProbe = 4)
      .collect().map(_.getLong(0)) should not contain 1L
    Similarity.ivfPqTopKJoin(vecs, "vec_id", "embedding", dir, "vec_id",
      k = 2, nProbe = 4).filter(col("id") === 1L).count() shouldBe 0L
  }

  test("compaction physically removes tombstoned rows; re-append resurrects") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tomb-comp").toString
    Similarity.ivfWriteIndexSQ8(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    Similarity.ivfDelete(ids(1L, 4L), "vec_id", dir)
    val expected = Similarity.ivfTopKFromIndexSQ8(spark, dir, "vec_id", q,
      k = 4, nProbe = 4).collect().map(_.toSeq).toSeq
    StreamingOps.compactIvfDeltas(spark, dir, includeLatest = true)
    // bytes gone: the cells table no longer holds the victims, and the
    // fully-applied tombstones are garbage-collected
    spark.read.parquet(s"$dir/cells")
      .filter(col("vec_id").isin(1L, 4L)).count() shouldBe 0L
    new java.io.File(s"$dir/tombstones").exists() shouldBe false
    // probe identical before and after the physical removal
    Similarity.ivfTopKFromIndexSQ8(spark, dir, "vec_id", q,
      k = 4, nProbe = 4).collect().map(_.toSeq).toSeq shouldBe expected
    // post-compaction, a batch re-append RESURRECTS the id (no stale
    // tombstone outranks it once the delta channel is folded away)
    Similarity.ivfAppendSQ8(Seq((1L, Seq(0.99, 0.14, 0.0, 0.0)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding", dir)
    Similarity.ivfTopKFromIndexSQ8(spark, dir, "vec_id", q,
      k = 6, nProbe = 4).collect().map(_.getLong(0)) should contain (1L)
  }

  test("batch append of a pending-tombstoned id fails loudly; compact unblocks") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tomb-guard").toString
    Similarity.ivfWriteIndexSQ8(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    Similarity.ivfDelete(ids(2L), "vec_id", dir)
    val reinsert = Seq((2L, Seq(0.7, 0.7, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    // base rows rank below every tombstone: without the guard this
    // append would land on disk yet stay invisible to every probe
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfAppendSQ8(reinsert, "vec_id", "embedding", dir)
    }
    e.getMessage should include ("compactIvfDeltas")
    // appends of UNRELATED ids stay allowed while tombstones pend
    Similarity.ivfAppendSQ8(Seq((8L, Seq(0.5, -0.8, 0.0, 0.0)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding", dir)
    // compaction applies + GCs the tombstone; the re-insert now works
    StreamingOps.compactIvfDeltas(spark, dir)
    Similarity.ivfAppendSQ8(reinsert, "vec_id", "embedding", dir)
    Similarity.ivfTopKFromIndexSQ8(spark, dir, "vec_id", q, k = 8,
      nProbe = 4).collect().map(_.getLong(0)) should contain (2L)
  }

  test("batch-only index: default compaction still applies tombstones") {
    // regression: with no deltas channel, maxBatch = −1 used to make the
    // fold horizon −1, so `up_to < horizon` never held and the default
    // includeLatest = false compaction silently left victim bytes on
    // disk and tombstones pending forever — a non-removal the takedown
    // caller would never notice. A batch-only index has no latest batch
    // to guard, so EVERY tombstone must resolve.
    val dir = java.nio.file.Files.createTempDirectory("tomb-batchonly").toString
    Similarity.ivfWriteIndexSQ8(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    Similarity.ivfDelete(ids(1L, 4L), "vec_id", dir)
    val expected = Similarity.ivfTopKFromIndexSQ8(spark, dir, "vec_id", q,
      k = 4, nProbe = 4).collect().map(_.toSeq).toSeq
    StreamingOps.compactIvfDeltas(spark, dir) // default includeLatest=false
    spark.read.parquet(s"$dir/cells")
      .filter(col("vec_id").isin(1L, 4L)).count() shouldBe 0L
    // the applied tombstones are gone (GC'd or rewritten empty)
    Similarity.readParquetIfAny(spark, s"$dir/tombstones")
      .map(_.count()).getOrElse(0L) shouldBe 0L
    Similarity.ivfTopKFromIndexSQ8(spark, dir, "vec_id", q,
      k = 4, nProbe = 4).collect().map(_.toSeq).toSeq shouldBe expected
  }

  test("a full rebuild at the same path supersedes stale tombstones") {
    val dir = java.nio.file.Files.createTempDirectory("tomb-rb").toString
    Similarity.ivfWriteIndexSQ8(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    Similarity.ivfDelete(ids(1L), "vec_id", dir)
    Similarity.ivfTopKFromIndexSQ8(spark, dir, "vec_id", q, k = 6,
      nProbe = 4).collect().map(_.getLong(0)) should not contain 1L
    // rebuild over the full corpus: the stale delta channel (the
    // tombstone) must not keep folding into the fresh index
    Similarity.ivfWriteIndexSQ8(vecs, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    Similarity.ivfTopKFromIndexSQ8(spark, dir, "vec_id", q, k = 6,
      nProbe = 4).collect().map(_.getLong(0)) should contain (1L)
  }

  test("stream faces: tombstones delete base AND delta rows, rowFilter cannot resurrect") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("tomb-str").toString
    val base = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)),
      (3L, Seq(-1.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    Similarity.ivfWriteIndex(base, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    val in = MemoryStream[(Long, Seq[Double])]
    val sq = StreamingOps.continuousIvfAppend(
      in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      dir, s"$dir-ckpt").start()
    try {
      in.addData((6L, Seq(1.0, 0.01, 0.0, 0.0)))
      sq.processAllAvailable()
      in.addData((7L, Seq(0.98, 0.2, 0.0, 0.0)))
      sq.processAllAvailable()
    } finally sq.stop()
    // delete one base id and one id that lives only in the deltas
    Similarity.ivfDelete(ids(0L, 6L), "vec_id", dir)
    val got = StreamingOps.ivfTopKFromStreamIndex(spark, dir, "vec_id",
      q, k = 5, nProbe = 4).collect().map(_.getLong(0)).toSet
    got shouldBe Set(2L, 3L, 7L)
    // a predicate matching only the tombstoned ids resurrects nothing
    StreamingOps.ivfTopKFromStreamIndex(spark, dir, "vec_id", q,
      k = 5, nProbe = 4,
      rowFilter = _.filter(col("vec_id").isin(0L, 6L))).count() shouldBe 0L
    // compaction folds the delete through; probe unchanged
    StreamingOps.compactIvfDeltas(spark, dir, includeLatest = true)
    spark.read.parquet(s"$dir/cells")
      .filter(col("vec_id").isin(0L, 6L)).count() shouldBe 0L
    StreamingOps.ivfTopKFromStreamIndex(spark, dir, "vec_id",
      q, k = 5, nProbe = 4).collect().map(_.getLong(0)).toSet shouldBe
      Set(2L, 3L, 7L)
  }

  test("a resumed stream neither erases a tombstone nor stays blocked by it") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("tomb-resume").toString
    val base = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    Similarity.ivfWriteIndex(base, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    val in = MemoryStream[(Long, Seq[Double])]
    val mk = () => StreamingOps.continuousIvfAppend(
      in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      dir, s"$dir-ckpt")
    val s1 = mk().start()
    try {
      in.addData((6L, Seq(1.0, 0.01, 0.0, 0.0)))
      s1.processAllAvailable()
    } finally s1.stop()
    // quiesced delete of a base id and a streamed id
    Similarity.ivfDelete(ids(0L, 6L), "vec_id", dir)
    // the stream RESUMES from its checkpoint: its next micro-batch id is
    // exactly the one a deltas-channel tombstone would have claimed —
    // the dedicated tombstone channel must survive this overwrite
    val s2 = mk().start()
    try {
      in.addData((7L, Seq(0.98, 0.2, 0.0, 0.0)))
      s2.processAllAvailable()
      // and a LATER stream append legitimately re-inserts a deleted id
      in.addData((6L, Seq(0.99, 0.1, 0.0, 0.0)))
      s2.processAllAvailable()
    } finally s2.stop()
    val got = StreamingOps.ivfTopKFromStreamIndex(spark, dir, "vec_id",
      q, k = 6, nProbe = 4).collect().map(_.getLong(0)).toSet
    got shouldBe Set(2L, 6L, 7L) // 0 stays deleted; 6 re-inserted
  }

  test("probe of a stale cell does not resurface a moved id's old version") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("tomb-moved").toString
    val vOld = Seq(-1.0, 0.0, 0.0, 0.0)
    val vNew = Seq(0.999, 0.05, 0.0, 0.0)
    val base = Seq((0L, Seq(1.0, 0.0, 0.0, 0.0)), (3L, vOld))
      .toDF("vec_id", "embedding")
    Similarity.ivfWriteIndex(base, "vec_id", "embedding", dim = 4,
      path = dir, nBits = 2, lloydIters = 1)
    val cents = Similarity.readCentroids(spark, dir)
    def cellOf(v: Seq[Double]): Long =
      Similarity.assignToCells(Seq((99L, v)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", cents)
        .select(col("cell").cast("long")).head().getLong(0)
    // the update MOVES cells — precondition of the stale-cell claim
    cellOf(vOld) should not be cellOf(vNew)
    val in = MemoryStream[(Long, Seq[Double])]
    val sq = StreamingOps.continuousIvfAppend(
      in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      dir, s"$dir-ckpt").start()
    try {
      in.addData((3L, vNew))
      sq.processAllAvailable()
    } finally sq.stop()
    // a query pointing along -e1 probes ONLY the old cell: the stale
    // base version of id 3 must not resurface there — its current
    // version lives in another cell, so the probe sees id 3 not at all
    val towardOld = StreamingOps.ivfTopKFromStreamIndex(spark, dir,
      "vec_id", vOld, k = 3, nProbe = 1).collect()
    towardOld.map(_.getLong(0)) should not contain 3L
  }
}
