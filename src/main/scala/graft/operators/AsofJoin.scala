package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark lacks as single operators (SURVEY §2.3 joins
  * row): as-of and range joins, built scale-first.
  *
  * The naive as-of formulation — inequality join then "keep latest" — is
  * O(|L|·|R|) per key and explodes on skewed keys. This implementation is
  * the union-sort trick instead: tag both sides, union, and run ONE
  * window ordered by (key, time); the latest right-row state reaches each
  * left row via `last(ignoreNulls)` over the preceding frame. Cost is a
  * single shuffle-sort of |L|+|R| rows — the same shape a sort-merge join
  * would take, with no pair blowup, so it survives 100 TB and skew.
  */
object AsofJoin {

  /** For each left row, attach the most recent right row with
    * `rightTs <= leftTs` on the same key (backward as-of join, the
    * market-data "last quote before trade" semantics).
    *
    * @param valueCols right-side columns to carry (renamed as given)
    * @return left rows + carried columns (null when no prior right row)
    */
  def asof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side marker sorts right (0) before left (1) at equal timestamps so
    // a right row AT the left timestamp is visible to it (<= semantics).
    // The carried values travel as ONE struct: `last(ignoreNulls)` over
    // the struct picks a whole right ROW (the struct is non-null whenever
    // a right row exists, even if some of its fields are null), so a
    // recent right row with a null field is not spliced with an older
    // row's field. The struct also serves as the deterministic tiebreaker
    // for right rows tied on (key, ts): the greatest value-tuple wins.
    val l = left.withColumn("__side", lit(1))
    val r = right.select(col(keyCol), col(tsCol), lit(0).as("__side"),
      struct(valueCols.map(col): _*).as("__r"))
    val u = l.unionByName(r, allowMissingColumns = true)

    // the struct tiebreaker only when every value type is orderable
    // (maps etc. cannot appear in ORDER BY — such calls keep working,
    // just without deterministic tie resolution)
    val orderable = valueCols.forall(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        right.schema(c).dataType))
    val ordering =
      if (orderable) Seq(col(tsCol), col("__side"), col("__r"))
      else Seq(col(tsCol), col("__side"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.select((leftCols.map(col) :+ col("__side")) :+
        last(col("__r"), ignoreNulls = true).over(w).as("__carried"): _*)
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"__carried.$c").as(c)): _*)
  }

  /** Range join: pairs (l, r) on the same key with
    * `r.ts in [l.ts - before, l.ts + after]`. Banded by time bucket so
    * the join key is (key, bucket) — equi-join shuffle, never a full
    * per-key cross product. Each right row lands in the buckets it can
    * match (its own and its neighbors within the window), so every
    * qualifying pair appears exactly once after the final range filter.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, before: Long, after: Long, bucketSec: Long): DataFrame = {
    require(bucketSec > 0, "bucketSec must be positive")
    def bucketOf(ts: Column): Column = floor(ts / lit(bucketSec.toDouble)).cast("long")
    val lb = left
      .withColumn("__lts", unix_timestamp(col(tsCol)))
      .withColumn("__bucket", bucketOf(col("__lts")))
    // right row replicated into every bucket whose left rows could reach it
    val rb = right
      .withColumn("__rts", unix_timestamp(col(tsCol)))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col("__rts") - after), bucketOf(col("__rts") + before))))
    val lSel = lb.select(Seq(col(keyCol).as("__k"), col("__bucket"), col("__lts")) ++
      left.columns.map(c => col(c).as(s"l_$c")): _*)
    val rSel = rb.select(Seq(col(keyCol).as("__k"), col("__bucket"), col("__rts")) ++
      right.columns.map(c => col(c).as(s"r_$c")): _*)
    lSel.join(rSel, Seq("__k", "__bucket"))
      .filter(col("__rts") >= col("__lts") - before &&
        col("__rts") <= col("__lts") + after)
      .drop("__k", "__bucket", "__lts", "__rts")
  }
}
