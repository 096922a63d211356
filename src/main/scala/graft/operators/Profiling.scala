package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** One-pass table profiling — the data-quality primitive every pipeline
  * runs before trusting a new drop: per-column row/null/distinct counts
  * and numeric min/max, computed in a SINGLE aggregation over one scan
  * (profiling a 100 TB table with one pass per column would be N scans).
  *
  * `exact = true` keeps exact distinct counts (the driver oracle checks
  * them) at the cost of a Catalyst Expand: k exact `countDistinct`s in
  * one agg replicate every scan row k+1 times into the shuffle. At
  * 100 TB run `exact = false` — `approx_count_distinct` (HLL++) keeps
  * the aggregation a true single pass with constant state per column,
  * no Expand.
  */
object Profiling {

  /** Column reference that survives any column name (dots, spaces,
    * backticks) — `col` parses dots as field access, so quote.
    */
  private def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val ndv: Column => Column =
      if (exact) c => countDistinct(c) else c => approx_count_distinct(c)
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(qcol(c)).as(s"__cnt_$c"),
        ndv(qcol(c)).as(s"__ndv_$c"),
        (if (isNum) min(qcol(c)).cast("double")
         else lit(null).cast("double")).as(s"__min_$c"),
        (if (isNum) max(qcol(c)).cast("double")
         else lit(null).cast("double")).as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row into one row per column — Column API
    // (explode over per-column structs), not a stack() SQL string, so
    // arbitrary column names never hit the parser
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        (qcol("__n") - qcol(s"__cnt_$c")).as("n_nulls"),
        qcol(s"__ndv_$c").as("n_distinct"),
        qcol(s"__min_$c").as("min_num"),
        qcol(s"__max_$c").as("max_num"))
    }
    one.select(qcol("__n"), explode(array(entries: _*)).as("e"))
      .select(col("e.col_name").as("col_name"), qcol("__n").as("n_rows"),
        col("e.n_nulls").as("n_nulls"), col("e.n_distinct").as("n_distinct"),
        col("e.min_num").as("min_num"), col("e.max_num").as("max_num"))
  }

  /** Fixed-range equi-width histogram of a numeric column: `nBins`
    * buckets over [lo, hi], hi-inclusive into the last bin, nulls and
    * out-of-range values excluded, EMPTY bins present in the output
    * (a plotting/profiling consumer wants the full axis). The value
    * distribution primitive next to [[profile]]'s min/max — run
    * `profile` first to pick the range.
    *
    * Scale shape: one map-side-combined aggregation on the bin key
    * (≤ nBins groups), then a broadcast join against the
    * `spark.range(nBins)` axis — nothing bigger than nBins anywhere
    * after the scan; the bin expression folds into the scan projection.
    */
  def histogram(df: DataFrame, valueCol: String, nBins: Int,
      lo: Double, hi: Double): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    require(lo < hi, "need lo < hi")
    val w = (hi - lo) / nBins
    val counts = df
      .select(qcol(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull && col("__v") >= lo && col("__v") <= hi)
      .select(least(floor((col("__v") - lo) / w), lit(nBins - 1))
        .cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    df.sparkSession.range(nBins).toDF("bin")
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        round(lit(lo) + col("bin") * w, 6).as("bin_lo"),
        round(lit(lo) + (col("bin") + 1) * w, 6).as("bin_hi"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Equi-DEPTH histogram — k buckets of (near-)equal ROW count, the
    * value-distribution view [[histogram]]'s fixed-width bins miss on
    * skewed columns (one hot bin, many empties). Bucket of a row =
    * `((rank − 1) · k) div N` under the total order
    * (value, tieCols...) — exact, deterministic, and engine-replicable
    * (a SQL engine replays it with row_number; ties never straddle
    * nondeterministically because the tie columns make the order total).
    * NULL values are excluded (they have no rank in a value order).
    *
    * Scale shape: the global rank is the two-pass range-sort recipe
    * (range-partition + in-partition sort, O(partitions) row counts to
    * the driver, rank assigned over the reused shuffle — no single-task
    * window), then ONE k-group aggregation. Returns
    * (bucket, n_rows, lo, hi) sorted by construction.
    */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
      tieCols: Seq[String], k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val spark = df.sparkSession
    val keys = col("__x") +: tieCols.map(qcol)
    val base = df
      .select(qcol(valueCol).cast("double").as("__x") +: tieCols.map(qcol): _*)
      .filter(col("__x").isNotNull)
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sorted = base.repartitionByRange(parts, keys: _*)
      .sortWithinPartitions(keys: _*).rdd

    val counts: Array[(Int, Long)] = sorted.mapPartitionsWithIndex { (pid, it) =>
      var c = 0L; it.foreach(_ => c += 1); Iterator.single((pid, c))
    }.collect()
    val offsets = new Array[Long](sorted.getNumPartitions)
    var acc = 0L
    counts.sortBy(_._1).foreach { case (pid, c) => offsets(pid) = acc; acc += c }
    val n = math.max(1L, acc)
    val bOff = spark.sparkContext.broadcast(offsets)

    val rows = sorted.mapPartitionsWithIndex { (pid, it) =>
      var r = bOff.value(pid)
      it.map { row =>
        val out = Row(row.getDouble(0), r * k / n) // (rank−1)·k div N
        r += 1
        out
      }
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("__x", DoubleType, nullable = false),
      StructField("bucket", LongType, nullable = false))))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("__x").as("lo"), max("__x").as("hi"))
  }

  /** Join/aggregation-key SKEW diagnostics — the number to read before
    * deciding whether a key needs salting ([[Skew.saltedJoin]]) or AQE
    * skew handling: the `topN` heaviest keys with their share of the
    * table, plus the global distribution summary (key count, max group
    * size, and `skew_ratio` = max/mean group size — 1.0 means perfectly
    * even, 100 means the hottest key is 100× a typical one).
    *
    * Shape: per-key counts are ONE map-side-combined aggregation (a hot
    * key contributes one partial row per partition — counting the skew
    * does not itself skew); the summary is a second 1-row agg over the
    * key-count frame; top-N lands as TakeOrderedAndProject (per-partition
    * heap + driver merge of N rows, never a global sort). Keys join into
    * one U+0001-separated string so any arity diagnoses uniformly.
    */
  def keySkew(df: DataFrame, keyCols: Seq[String], topN: Int): DataFrame = {
    require(keyCols.nonEmpty && topN > 0, "keySkew needs keys and topN > 0")
    val counts = df.groupBy(keyCols.map(qcol): _*).agg(count(lit(1)).as("n"))
      // NULL key components map to a sentinel, not concat_ws's silent
      // empty-string elision: '' and NULL would otherwise collide into
      // one diagnosed key (and diverge from a SQL replay, where a NULL
      // component nulls the whole cast). U+0000-prefixed so no real
      // string value collides with it.
      .select(concat_ws("\u0001",
        keyCols.map(c =>
          coalesce(qcol(c).cast("string"), lit("\u0000NULL"))): _*)
          .as("key"), col("n"))
    val stats = counts.agg(count(lit(1)).as("n_keys"),
      sum("n").as("total_rows"), max("n").as("max_n"))
    counts
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
      .crossJoin(broadcast(stats))
      .select(col("key"), col("n"),
        round(col("n").cast("double") / col("total_rows") * 100.0, 6)
          .as("share_pct"),
        col("n_keys"), col("total_rows"), col("max_n"),
        round(col("max_n").cast("double") * col("n_keys") / col("total_rows"), 6)
          .as("skew_ratio"))
  }
}
