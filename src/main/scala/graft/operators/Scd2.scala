package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history from a change stream — the
  * warehouse-standard dimension-versioning shape (Kimball SCD2): given
  * per-key timestamped attribute observations, produce one row per
  * VERSION with `[effective_from, effective_to)` validity and an
  * `is_current` flag, where a version starts only when an attribute
  * actually CHANGED (consecutive identical observations compress away).
  *
  * Scale shape: both passes are windows over the SAME
  * (key, order) partitioning — Catalyst plans ONE shuffle and the
  * change-compression filter + lead() run in the same window stage.
  * Per-key windows are the right tool here (unlike per-GROUP top-k):
  * dimension keys are numerous and each key's history is short, so no
  * single task ever receives more than one key's rows beyond the hash
  * distribution.
  *
  * The reference pipeline has no dimension handling (stateless
  * transforms, `src/processor.js`); this is warehouse surface.
  */
object Scd2 {

  /** Build the version history. `tieCol` must make (tsCol, tieCol) a
    * total order per key — same contract as the funnel/sequence
    * operators; attribute comparison is null-safe (`<=>`), so
    * NULL → value and value → NULL both count as changes.
    */
  def history(updates: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, attrCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty,
      "scd2 needs key and attribute columns")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val changed: Column = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || lag(col(tsCol), 1).over(w).isNull
    val versions = updates
      .select((keyCols ++ Seq(tsCol, tieCol) ++ attrCols).map(col): _*)
      .withColumn("__chg", changed)
      .filter(col("__chg"))
      .drop("__chg")
    // second window over the SAME partitioning+order — no extra shuffle
    versions
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
      .drop(tsCol)
  }

  /** The current snapshot of a [[history]] frame (the type-1 view). */
  def current(history: DataFrame): DataFrame =
    history.filter(col("is_current"))

  /** Point-in-time dimension lookup — the reason SCD2 history exists:
    * join each fact row to the version VALID AT its timestamp
    * (`effective_from <= fact.ts < effective_to`, open-ended current
    * version included; facts before the key's first version, or with no
    * key match, keep NULL dimension columns via the left join).
    *
    * History columns arrive prefixed with `dimPrefix` so fact columns
    * never collide. Each fact matches at most one version (validity
    * ranges tile the timeline), so the join cannot fan out. Scale shape:
    * an equi-join on the key carries the range predicates as join-level
    * filters — per-key histories are short, so the matched candidates
    * per fact are few; broadcast the history when it is
    * dimension-sized.
    */
  def pointInTime(facts: DataFrame, history: DataFrame, keyCols: Seq[String],
      factTsCol: String, dimPrefix: String = "dim_"): DataFrame = {
    val dim = history.columns.foldLeft(history)((d, c) =>
      d.withColumnRenamed(c, s"$dimPrefix$c"))
    val cond = keyCols.map(c => facts(c) === dim(s"$dimPrefix$c")).reduce(_ && _) &&
      facts(factTsCol) >= dim(s"${dimPrefix}effective_from") &&
      (dim(s"${dimPrefix}effective_to").isNull ||
        facts(factTsCol) < dim(s"${dimPrefix}effective_to"))
    facts.join(dim, cond, "left")
      .drop(keyCols.map(c => s"$dimPrefix$c"): _*)
  }
}
