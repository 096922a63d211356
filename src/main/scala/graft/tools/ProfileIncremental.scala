package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.tables.Tables

/** Dev profiler: per-phase wall times of the incremental-dedup takedown
  * composition (the dedup_incremental_deleted bench query) — which of
  * pair-gen / closure / index / probe / incremental-CC / label-delete
  * actually carries the 8-12 s. Not part of the driver contract.
  */
object ProfileIncremental {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // one untimed warmup of the flagship query, like Bench
    try force(graft.SparkEntry.queries("q1_pricing")(spark, dir))
    catch { case _: Throwable => }

    val docs = Tables.documents(spark, dir)
    val oldDocs = docs.filter(col("doc_id") < 250)

    val oldPairs = t("minhashLsh(old) + ckpt") {
      Dedup.minhashLsh(oldDocs, "doc_id", "text", numHashes = 16,
        bands = 8, shingleN = 5, threshold = 0.4, estimateSlack = 0.05)
        .localCheckpoint(true)
    }
    val oldLabels = t("connectedComponents(old)") {
      val l = Dedup.connectedComponents(oldPairs, "id_a", "id_b")
      force(l); l
    }
    val index = t("minhashIndex(old)") {
      val i = Dedup.minhashIndex(oldDocs, "doc_id", "text",
        numHashes = 16, bands = 8, shingleN = 5)
      i // lazy — consumed by the incremental probe below
    }
    val newPairs = t("minhashLshIncremental + ckpt") {
      Dedup.minhashLshIncremental(docs.filter(col("doc_id") >= 250),
        "doc_id", "text", index, numHashes = 16, bands = 8, shingleN = 5,
        threshold = 0.4, estimateSlack = 0.05).localCheckpoint(true)
    }
    val labels = t("incrementalCC + ckpt") {
      Dedup.incrementalConnectedComponents(oldLabels, newPairs)
        .localCheckpoint(true)
    }
    val pairs = oldPairs.select("id_a", "id_b")
      .unionByName(newPairs.select("id_a", "id_b"))
    t("deleteFromLabels + force") {
      force(Dedup.deleteFromLabels(labels, pairs,
        docs.filter(col("doc_id") % 11 === 4), "doc_id")
        .select(col("id").as("doc_id"), col("cluster_id")))
    }
    spark.stop()
  }
}
