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
}
