package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T, VectorFunctions => V}
import graft.tables.Tables

/** Dev profiler: times each stage of the MinHash-LSH dedup pipeline to
  * find the scaling bottleneck. Not part of the driver contract.
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    val numHashes = 16; val bands = 8

    val shingled = docs.select(col("doc_id"),
      array_distinct(transform(T.charShingles(col("text"), 5), s => xxhash64(s))).as("sh"))
      .persist()
    t("shingle")(shingled.count())

    val sig = shingled.select(col("doc_id"), col("sh"),
      V.minhashSignatureOfHashes(col("sh"), numHashes).as("sig")).persist()
    t("signature")(sig.count())

    val bucketed = sig.select(col("doc_id"),
        explode(V.minhashBands(col("sig"), numHashes, bands)).as("b"))
      .select(col("doc_id"), concat_ws(":", col("b.band"), col("b.bucket")).as("bucket"))
      .persist()
    t("bucket")(bucketed.count())

    val sized = bucketed.groupBy("bucket").agg(count(lit(1)).as("n"))
    t("bucket histogram") {
      sized.select(max("n").as("max"), avg("n").as("avg"),
        sum(col("n") * col("n")).as("sum_sq")).show()
    }

    val a = bucketed.select(col("doc_id").as("id_a"), col("bucket"))
    val b = bucketed.select(col("doc_id").as("id_b"), col("bucket"))
    val pairs = a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().persist()
    t("candidate pairs")(println("pairs=" + pairs.count()))

    val bySig = sig.select(col("doc_id").as("__id"), col("sig"))
    val est = pairs
      .join(bySig.select(col("__id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(bySig.select(col("__id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est", aggregate(
        zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).cast("double") / numHashes)
      .filter(col("est") >= 0.15)
      .select("id_a", "id_b").persist()
    t("estimate filter")(println("est survivors=" + est.count()))

    val bySh = shingled.select(col("doc_id").as("__id"), col("sh"))
    val verified = est
      .join(bySh.select(col("__id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(bySh.select(col("__id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), V.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.4)
    t("exact verify")(println("final=" + verified.count()))

    // the shipped operator end-to-end (sorted-long merge-walk verify)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
    t("Dedup.minhashLsh e2e") {
      println("final=" + graft.operators.Dedup.minhashLsh(
        docs, "doc_id", "text", numHashes = 16, bands = 8,
        shingleN = 5, threshold = 0.4).count())
    }

    spark.stop()
  }
}
