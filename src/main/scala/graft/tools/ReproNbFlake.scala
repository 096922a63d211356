package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev repro harness for the intermittent NbUnlearnSpec prior-shift
  * flake: loops the write→append→fold flow against the spec's corpus
  * and dumps every store table the moment the folded stats disagree
  * with the ground truth — pinning WHICH table carries the corruption
  * and for WHICH doc. Not part of the driver contract.
  */
object ReproNbFlake {
  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def long(seed: Int, extra: String = ""): String =
      ((0 until 60).map(i => s"w${(i * 7 + seed) % 23}ab") ++
        (if (extra.nonEmpty) Seq(extra) else Nil)).mkString(" ")
    def corpus: DataFrame = Seq(
      (0L, long(1)), (1L, long(2)), (2L, "tiny doc few words"),
      (3L, long(3, extra = "zzzq")), (4L, "short and junky text right here"),
      (5L, long(5)), (6L, ""), (7L, long(7))
    ).toDF("doc_id", "text")

    (1 to iters).foreach { i =>
      val dir = java.nio.file.Files.createTempDirectory(s"nbrepro-$i").toString
      graft.operators.Classifier.nbModelWrite(
        corpus.filter(col("doc_id") < 5), "doc_id", "text", dir)
      graft.operators.Classifier.nbModelAppend(
        corpus.filter(col("doc_id") === 7L).unionByName(
          corpus.filter(col("doc_id") === 7L)
            .select(col("doc_id"), lit(null).cast("string").as("text"))),
        "doc_id", "text", dir)
      val d = graft.operators.CountStore.fold(spark, dir, "stats")
        .agg(coalesce(sum("d_pos"), lit(0L)), coalesce(sum("d_neg"), lit(0L)))
        .head()
      val (dp, dn) = (d.getLong(0), d.getLong(1))
      if (dp != 4L || dn != 2L) {
        println(s"[repro] CORRUPT at iter $i: d_pos=$dp d_neg=$dn (want 4/2)")
        println("[repro] stats rows (base + deltas):")
        graft.operators.CountStore.fold(spark, dir, "stats")
          .collect().foreach(r => println(s"[repro]   $r"))
        println("[repro] members rows:")
        graft.operators.CountStore.fold(spark, dir, "members")
          .orderBy("id").collect().foreach(r => println(s"[repro]   $r"))
        println("[repro] counts per-class totals:")
        graft.operators.CountStore.fold(spark, dir, "counts")
          .agg(sum("c_pos"), sum("c_neg"))
          .collect().foreach(r => println(s"[repro]   $r"))
        println(s"[repro] store dir kept: $dir")
        spark.stop(); sys.exit(1)
      }
      // clean green iterations to keep /tmp bounded
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      if (i % 25 == 0) println(s"[repro] $i green")
    }
    println(s"[repro] all $iters green")
    spark.stop()
  }
}
