package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-step ordered funnel over an event stream — the product-analytics
  * primitive behind `q_funnel` / `q_funnel_windowed`, lifted from those
  * queries' hand-unrolled 3-step form so callers aren't limited to three
  * literal steps.
  *
  * Semantics (strict ordering): a user reaches step i+1 if some event of
  * that step's type occurs STRICTLY AFTER the user's first qualifying
  * occurrence of step i (and, with `conversionWindow`, within that
  * interval of it). "First qualifying occurrence" chains: step i's
  * timestamp is the min event time that itself followed step i−1.
  *
  * Scale shape — the no-window discipline: each step is ONE user-keyed
  * min-aggregation (map-side combined) joined user-to-user with the
  * previous step's frame; no window functions, no per-user event sorting,
  * no self-join blowup — N steps cost N filtered-scan + join + agg
  * rounds over user-keyed shuffles, and AQE collapses the tiny per-step
  * frames to broadcasts as they shrink down the funnel. The final count
  * row composes via 1-row broadcast crossJoins.
  *
  * The reference pipeline has no event analytics (stateless transforms,
  * `src/processor.js`); this is warehouse-analytics surface.
  */
object Funnel {

  /** Per-user step-reach frame: (user, t_1 .. t_N) with t_i = the user's
    * chained first-occurrence time of step i; users appear iff they
    * reached step 1, with NULL t_i once they fall out. Feed this to
    * cohort splits; [[counts]] is the aggregate headline.
    */
  def reach(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      conversionWindow: Option[String] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var cur = events.filter(col(typeCol) === steps.head)
      .groupBy(userCol).agg(min(tsCol).as("t_1"))
    var acc = cur
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val prevT = s"t_$i"; val curT = s"t_${i + 1}"
      val within = conversionWindow.fold(lit(true))(w =>
        col(tsCol) <= col(prevT) + expr(w))
      cur = events.filter(col(typeCol) === st)
        .join(cur.select(col(userCol), col(prevT)), Seq(userCol))
        .filter(col(tsCol) > col(prevT) && within)
        .groupBy(userCol).agg(min(tsCol).as(curT))
      acc = acc.join(cur, Seq(userCol), "left")
    }
    acc
  }

  /** One-row funnel headline: n_step_1 .. n_step_N = users reaching each
    * step under [[reach]]'s chained-strict-order rule.
    */
  def counts(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String],
      conversionWindow: Option[String] = None): DataFrame = {
    val r = reach(events, userCol, typeCol, tsCol, steps, conversionWindow)
    r.agg(
      count(col("t_1")).as("n_step_1"),
      steps.indices.drop(1).map(i =>
        count(col(s"t_${i + 1}")).as(s"n_step_${i + 1}")): _*)
  }
}
