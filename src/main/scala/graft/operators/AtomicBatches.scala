package graft.operators

import org.apache.spark.sql.SparkSession

/** The `_COMMIT` batch protocol shared by the append-only index
  * channels (the triangle index's `batches/`, the BM25 index's
  * `deletes/`): each logical append stages its tables under one
  * numbered directory and becomes visible ATOMICALLY via a zero-byte
  * `_COMMIT` marker — a crash mid-stage leaves an uncommitted
  * directory that every reader ignores and the next writer sweeps, so
  * multi-table updates can neither half-apply nor double-apply on
  * retry. One implementation, so a hardening fix cannot silently miss
  * one of the channels.
  *
  * Writers are sequential per channel (the ingestion contract every
  * maintenance face here documents); numbering is max-existing + 1.
  */
private[operators] object AtomicBatches {

  private def fsOf(spark: SparkSession, root: String)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(root)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Delete crashed (uncommitted) batch directories under `root` —
    * invisible garbage from a failed staging attempt.
    */
  def sweepUncommitted(spark: SparkSession, root: String): Unit = {
    val (fs, r) = fsOf(spark, root)
    if (fs.exists(r)) fs.listStatus(r).foreach { st =>
      if (st.isDirectory &&
          !fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_COMMIT")))
        fs.delete(st.getPath, true)
    }
  }

  /** The committed batch directories under `root` (marker exists). */
  def committedDirs(spark: SparkSession, root: String): Seq[String] = {
    val (fs, r) = fsOf(spark, root)
    if (!fs.exists(r)) Seq.empty
    else fs.listStatus(r).toSeq
      .filter(st => st.isDirectory &&
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_COMMIT")))
      .map(_.getPath.toString)
  }

  /** 1 + the highest numeric batch directory name under `root` (0 when
    * none exist).
    */
  def nextBatchN(spark: SparkSession, root: String): Long = {
    val (fs, r) = fsOf(spark, root)
    (Seq(-1L) ++ (if (fs.exists(r))
      fs.listStatus(r).toSeq.flatMap(st =>
        scala.util.Try(st.getPath.getName.toLong).toOption)
      else Seq.empty)).max + 1
  }

  /** The atomic commit point: one zero-byte marker create. */
  def commit(spark: SparkSession, batchDir: String): Unit = {
    val (fs, _) = fsOf(spark, batchDir)
    fs.create(new org.apache.hadoop.fs.Path(s"$batchDir/_COMMIT"), true)
      .close()
  }
}
