package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

/** Exact interpolated quantiles (SQL `percentile_cont` semantics) at
  * scale.
  *
  * Spark's exact `percentile` aggregate buffers EVERY value in a single
  * aggregation state and sorts it in one task — at 100 TB that is an
  * executor OOM, not a query plan. This operator instead runs a
  * distributed RANGE sort (each partition holds a bounded slice), indexes
  * the sorted rows, and reads back only the two rows flanking each
  * quantile position; the shuffle files are written once and every
  * follow-up job reuses them as skipped stages. Peak memory per task is
  * one partition slice, independent of total rows.
  */
object Quantiles {

  /** Quantiles of `valueCol` at `probs` (0 <= p <= 1), linearly
    * interpolated at position p·(n-1) like `percentile`/`quantile_cont`.
    * Output: (q int — index into probs, price-style value double).
    */
  def exactQuantiles(df: DataFrame, valueCol: String, probs: Seq[Double],
      outCols: (String, String) = ("q", "value")): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      "probs must be within [0, 1]")
    val spark = df.sparkSession
    val sorted = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double")).sort(col(valueCol))
      .rdd.map(_.getDouble(0))
      .zipWithIndex() // one count pass; sort shuffle reused afterwards
    val n = sorted.count()
    val rows: Seq[Row] =
      if (n == 0) Seq.empty
      else {
        // the at-most-2·|probs| flanking positions
        val positions = probs.map(p => p * (n - 1))
        val needed = positions.flatMap(pos =>
          Seq(math.floor(pos).toLong, math.ceil(pos).toLong)).toSet
        val byIdx = sorted.filter { case (_, i) => needed.contains(i) }
          .map(_.swap).collectAsMap()
        probs.zip(positions).zipWithIndex.map { case ((_, pos), qi) =>
          val lo = byIdx(math.floor(pos).toLong)
          val hi = byIdx(math.ceil(pos).toLong)
          Row(qi, lo + (pos - math.floor(pos)) * (hi - lo))
        }
      }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField(outCols._1, IntegerType, nullable = false),
        StructField(outCols._2, DoubleType, nullable = false))))
  }

  /** Per-GROUP exact interpolated quantile without buffering a group's
    * values in one aggregation state: ONE shuffle-sort on (group, value)
    * carries both the within-group rank and the group count (two window
    * functions over the same partitioning — no count join, and null
    * group keys are ordinary window partitions), then only the two rows
    * flanking position p·(n-1) survive into a tiny per-group aggregate
    * that the window's partitioning already satisfies. Peak memory is a
    * partition slice, as in [[exactQuantiles]], but per group.
    */
  def groupedExactQuantile(df: DataFrame, groupCols: Seq[String],
      valueCol: String, p: Double, outCol: String = "quantile"): DataFrame = {
    require(p >= 0.0 && p <= 1.0, "p must be within [0, 1]")
    val g = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__v"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    val pos = lit(p) * (col("__n") - 1).cast("double")
    val flanks = df.filter(col(valueCol).isNotNull)
      .select(g :+ col(valueCol).cast("double").as("__v"): _*)
      .withColumn("__rn", row_number().over(w).cast("long") - 1L)
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__pos", pos)
      .filter(col("__rn") === floor(col("__pos")) ||
        col("__rn") === ceil(col("__pos")))
      .groupBy(g: _*)
      .agg(
        min(when(col("__rn") === floor(col("__pos")), col("__v"))).as("__lo"),
        min(when(col("__rn") === ceil(col("__pos")), col("__v"))).as("__hi"),
        first(col("__pos")).as("__p"))
      .select(g :+
        (col("__lo") + (col("__p") - floor(col("__p"))) *
          (col("__hi") - col("__lo"))).as(outCol): _*)
    // quantile_cont GROUP BY semantics: a group whose values are ALL null
    // yields a NULL quantile, not a missing row. Renamed join columns
    // sidestep self-join ambiguity (flanks shares df's lineage).
    val f = flanks.select(
      groupCols.map(c => col(c).as(s"__f_$c")) :+ col(outCol): _*)
    df.select(groupCols.map(c => col(c).as(s"__d_$c")): _*).distinct()
      .join(f, groupCols.map(c => col(s"__d_$c") <=> col(s"__f_$c"))
        .reduce(_ && _), "left")
      .select(groupCols.map(c => col(s"__d_$c").as(c)) :+ col(outCol): _*)
  }
}
