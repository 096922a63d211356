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
      valueCols: Seq[String]): DataFrame =
    asofImpl(left, right, keyCol, tsCol, valueCols, forward = false)

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `rightTs >= leftTs` on the same key — "next event after" semantics
    * (time-to-next-purchase, next maintenance window). Same union-sort
    * shape, mirrored frame.
    */
  def asofForward(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String]): DataFrame =
    asofImpl(left, right, keyCol, tsCol, valueCols, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String], forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // side marker makes a right row AT the left timestamp visible to it
    // (<= / >= inclusive semantics): backward sorts right (0) before left
    // (1); forward sorts left (0) before right (1).
    // The carried values travel as ONE struct: last/first(ignoreNulls)
    // over the struct picks a whole right ROW (the struct is non-null
    // whenever a right row exists, even if some of its fields are null),
    // so a qualifying right row with a null field is not spliced with
    // another row's field. The struct also serves as the deterministic
    // tiebreaker for right rows tied on (key, ts): backward carries the
    // greatest value-tuple, forward the smallest.
    val (leftMark, rightMark) = if (forward) (0, 1) else (1, 0)
    val l = left.withColumn("__side", lit(leftMark))
    // SQL ASOF semantics: a right row with a NULL timestamp or key can
    // never satisfy `l.ts >= r.ts AND l.key = r.key` — drop them here or
    // they would sort into the frame (nulls first) and be carried
    val r = right
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol), col(tsCol), lit(rightMark).as("__side"),
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
    val base = Window.partitionBy(col(keyCol)).orderBy(ordering: _*)
    val (w, pick) =
      if (forward)
        (base.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__r"), ignoreNulls = true))
      else
        (base.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__r"), ignoreNulls = true))
    // a left row with a NULL timestamp matches nothing either (the
    // inequality is never true) — null its carried struct rather than
    // letting the nulls-first sort position pick up frame contents
    val carried = when(col(tsCol).isNull, lit(null))
      .otherwise(pick.over(w))
    u.select((leftCols.map(col) :+ col("__side")) :+ carried.as("__carried"): _*)
      .filter(col("__side") === leftMark)
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
    // microsecond arithmetic end-to-end: unix_timestamp would TRUNCATE to
    // whole seconds, silently admitting sub-second pairs up to 1 s outside
    // the promised window. Buckets via integral `div` — a double division
    // can land exactly-on-boundary timestamps in the wrong bucket
    val M = 1000000L
    val bMicros = bucketSec * M
    // the cast covers TIMESTAMP_NTZ inputs (unix_micros requires
    // TIMESTAMP); the session is pinned UTC and only ts DIFFERENCES
    // matter to the window, so the epoch convention cancels out
    val lb = left
      .withColumn("__lts", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__bucket", expr(s"__lts div ${bMicros}L"))
    // right row replicated into every bucket whose left rows could reach it
    val rb = right
      .withColumn("__rts", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("__bucket", explode(sequence(
        expr(s"(__rts - ${after * M}L) div ${bMicros}L"),
        expr(s"(__rts + ${before * M}L) div ${bMicros}L"))))
    val lSel = lb.select(Seq(col(keyCol).as("__k"), col("__bucket"), col("__lts")) ++
      left.columns.map(c => col(c).as(s"l_$c")): _*)
    val rSel = rb.select(Seq(col(keyCol).as("__k"), col("__bucket"), col("__rts")) ++
      right.columns.map(c => col(c).as(s"r_$c")): _*)
    lSel.join(rSel, Seq("__k", "__bucket"))
      .filter(col("__rts") >= col("__lts") - before * M &&
        col("__rts") <= col("__lts") + after * M)
      .drop("__k", "__bucket", "__lts", "__rts")
  }
}
