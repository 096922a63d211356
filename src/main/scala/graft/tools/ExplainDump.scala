package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for named declared queries to
  * files — the plan evidence the optimization rounds commit under
  * `plans/r{N}/<query>_{before,after}.txt`. Not part of the driver
  * contract.
  *
  * Usage: ExplainDump <sfDir> <outDir> <suffix> <query>[,<query>...]
  * writes `<outDir>/<query>_<suffix>.txt` per query.
  *
  * The session mirrors Bench's configuration (shuffle partitions =
  * cores, 64m broadcast threshold) so the dumped plan is the plan the
  * bench actually runs.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: ExplainDump <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, qcsv) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchQueries
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // capture the EXECUTED plan of the noop write (the AQE-final shape:
    // runtime join rewrites, coalesced reads) — the pre-execution plan
    // alone hides what actually ran
    val lastPlan = new java.util.concurrent.atomic.AtomicReference[String]("")
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          lastPlan.set(qe.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    qcsv.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = all(name)(spark, sfDir)
      val before = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      lastPlan.set("")
      df.write.format("noop").mode("overwrite").save()
      // the listener fires asynchronously; give it a moment
      var waited = 0
      while (lastPlan.get.isEmpty && waited < 100) {
        Thread.sleep(100); waited += 1
      }
      val txt = s"== PRE-EXECUTION PLAN ==\n$before\n" +
        s"== EXECUTED PLAN (AQE-final, one noop-sink run) ==\n${lastPlan.get}\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[explain] wrote $outDir/${name}_$suffix.txt")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
