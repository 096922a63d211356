package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on hot keys.
  *
  * AQE's skew-join handling splits oversized sort-merge partitions at
  * runtime, but it cannot help when a handful of join-key values dominate
  * so heavily that ONE key exceeds an executor (the classic "5 event
  * types across 100 TB of events" shape). Salting fixes the partitioning
  * itself: the skewed side's key is extended with a deterministic salt in
  * [0, n), the compact side is replicated n× (one copy per salt), and the
  * join runs on (key, salt) — every hot key now spreads over n tasks.
  * Result set is identical to the unsalted join.
  */
object Skew {

  /** Inner-join `skewed` with `compact` on `keyCol`, salted `nSalts`
    * ways. `saltFrom` must vary within a key group (any unique-ish
    * column, e.g. an id) so rows spread across salts deterministically.
    * `compact` is replicated n× — keep it the small side.
    */
  def saltedJoin(skewed: DataFrame, compact: DataFrame, keyCol: String,
      saltFrom: Column, nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    val l = skewed.withColumn("__salt", pmod(xxhash64(saltFrom), lit(nSalts)).cast("int"))
    val r = compact.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(r, Seq(keyCol, "__salt")).drop("__salt")
  }

  /** [[saltedJoin]] behind its own diagnostic — the diagnose-then-act
    * loop of [[Profiling.keySkew]] closed in one call: measure the fact
    * side's max/mean group-size ratio (one map-side-combined
    * aggregation + a 3-long driver read), salt only when it exceeds
    * `skewRatioThreshold`, else plan the plain join. The measurement
    * costs one scan of the fact side's KEY COLUMN (pruned scan) —
    * negligible next to a join it might save, and the decision is a
    * driver-side plan choice, not a runtime branch.
    *
    * Returns the chosen frame plus the measured ratio so callers can log
    * the decision.
    */
  def adaptiveSaltedJoin(skewed: DataFrame, compact: DataFrame,
      keyCol: String, saltFrom: Column, nSalts: Int,
      skewRatioThreshold: Double = 4.0): (DataFrame, Double) = {
    val stats = skewed.groupBy(keyCol).agg(count(lit(1)).as("__n"))
      .agg(count(lit(1)).as("k"), sum("__n").as("t"), max("__n").as("m"))
      .head()
    val ratio =
      if (stats.isNullAt(1) || stats.getLong(1) == 0L) 0.0
      else stats.getLong(2).toDouble * stats.getLong(0) / stats.getLong(1)
    val joined =
      if (ratio > skewRatioThreshold)
        saltedJoin(skewed, compact, keyCol, saltFrom, nSalts)
      else skewed.join(compact, Seq(keyCol))
    (joined, ratio)
  }
}
