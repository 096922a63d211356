package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Beside those it writes `verify_summary.json` — the SELF-EVIDENCING
  * artifact: per query whether the parquet dump was written (and the
  * failure message when not), plus trailing counts. The round driver's
  * correctness file is assembled OUTSIDE this process, so a harness
  * hiccup there can land as an empty `{}` that is indistinguishable
  * from "Verify produced nothing" — the summary makes the difference
  * visible at a glance: a green summary next to an empty driver file
  * is a harness artifact; a summary full of errors is a real
  * regression. First thing to read when a driver artifact looks wrong.
  */
object Verify {

  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL (or in an exception
    * message landing in the summary) would otherwise make the driver's
    * json.load fail and silently zero the round's correctness.
    */
  private[graft] def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Run every query, dump each result to `outDir/<name>`, and return
    * the per-query outcome IN INPUT ORDER: name → None (wrote) or
    * Some(error message). Failures never stop the sweep — one broken
    * query must cost one row, not the round.
    */
  private[graft] def runQueries(spark: SparkSession, sfDir: String,
      outDir: String,
      queries: Seq[(String, (SparkSession, String) => DataFrame)])
      : Seq[(String, Option[String])] =
    queries.map { case (name, fn) =>
      name -> (
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          None
        } catch { case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          System.err.println(s"[verify] $name failed: $msg")
          Some(s"${e.getClass.getSimpleName}: $msg".take(500))
        })
    }

  /** The `verify_summary.json` body: `{"queries": {name: {"wrote":
    * bool, "err": string|null}}, "n_ok": N, "n_failed": M,
    * "n_total": T}`. Counts trail so a human tailing the file sees the
    * verdict without parsing.
    */
  private[graft] def summaryJson(
      outcomes: Seq[(String, Option[String])]): String = {
    val rows = outcomes.map { case (name, err) =>
      s"${jsonStr(name)}: {\"wrote\": ${err.isEmpty}, " +
        s"\"err\": ${err.map(jsonStr).getOrElse("null")}}"
    }.mkString("{", ",", "}")
    val nOk = outcomes.count(_._2.isEmpty)
    s"""{"queries": $rows, "n_ok": $nOk, """ +
      s""""n_failed": ${outcomes.size - nOk}, "n_total": ${outcomes.size}}"""
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=a,b,c limits the dump for local iteration; the
    // driver never sets it, so the gate always runs everything
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val outcomes = runQueries(spark, sfDir, outDir,
      SparkEntry.queries.toSeq
        .filter { case (name, _) => only.isEmpty || only(name) })
    Files.writeString(Paths.get(s"$outDir/verify_summary.json"),
      summaryJson(outcomes))
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
