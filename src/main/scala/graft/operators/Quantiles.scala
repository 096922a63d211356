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
    * values in one aggregation state AND without a per-group window: a
    * `Window.partitionBy(group)` sends each ENTIRE group through one task
    * (3 groups ⇒ parallelism 3 no matter the data size), so instead this
    * runs ONE range sort on (group, value) — a group's rows span as many
    * partitions as its size demands — then:
    *
    *  1. per-partition run-length counts of each group (groups arrive
    *     contiguously within a sorted range partition, so a partition
    *     holds a contiguous slice of groups: the metadata is
    *     O(partitions + groups) entries, not partitions × groups);
    *  2. a tiny driver fold turns those runs into per-(partition, group)
    *     global rank offsets and per-group totals — the only driver-side
    *     state, O(partitions + groups) longs, broadcast back;
    *  3. a second pass over the SAME sorted RDD (shuffle files reused as
    *     skipped stages) keeps only the two rows flanking position
    *     p·(n−1) per group and reduces them to the interpolated value —
    *     fully distributed, no window, no group-sized task.
    *
    * Peak memory per task is one range-partition slice, independent of
    * group cardinality and skew. The driver/broadcast metadata grows with
    * DISTINCT group count AND with group-key width — the maps are keyed
    * on the group values themselves (so "O(partitions + groups) entries",
    * not longs; wide string/binary keys multiply driver and broadcast
    * memory accordingly). For very high-cardinality or very wide group
    * keys (where every group is small) Spark's own `percentile` aggregate
    * is the right tool and this operator is unnecessary.
    */
  /** Binary group values need value equality for the driver/broadcast
    * key maps — a bare Array[Byte] compares by reference and would
    * silently split a group per occurrence.
    */
  private case class BKey(bytes: Seq[Byte])
  private def keyOf(v: Any): Any = v match {
    case b: Array[Byte] => BKey(scala.collection.immutable.ArraySeq.unsafeWrapArray(b))
    case x => x
  }
  private def unkey(v: Any): Any = v match {
    case BKey(bytes) => bytes.toArray
    case x => x
  }

  def groupedExactQuantile(df: DataFrame, groupCols: Seq[String],
      valueCol: String, p: Double, outCol: String = "quantile"): DataFrame = {
    require(p >= 0.0 && p <= 1.0, "p must be within [0, 1]")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val spark = df.sparkSession
    val gWidth = groupCols.length
    val cleaned = df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ col(valueCol).cast("double").as("__v"): _*)
    val sortCols = groupCols.map(col) :+ col("__v")
    val parts = math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sorted = cleaned.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .rdd.map(r => (List.tabulate(gWidth)(i => keyOf(r.get(i))), r.getDouble(gWidth)))

    // pass 1: run-length group counts per sorted partition
    val runs: Array[(Int, Seq[(List[Any], Long)])] =
      sorted.mapPartitionsWithIndex { (pid, it) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[(List[Any], Long)]
        var cur: List[Any] = null
        var cnt = 0L
        var has = false
        it.foreach { case (k, _) =>
          if (has && k == cur) cnt += 1
          else { if (has) buf += ((cur, cnt)); cur = k; cnt = 1L; has = true }
        }
        if (has) buf += ((cur, cnt))
        Iterator.single((pid, buf.toSeq))
      }.collect()

    // driver fold: rank offset of each group's first row in each partition
    val offsets = scala.collection.mutable.HashMap.empty[(Int, List[Any]), Long]
    val totals = scala.collection.mutable.HashMap.empty[List[Any], Long]
    runs.sortBy(_._1).foreach { case (pid, rs) =>
      rs.foreach { case (k, c) =>
        val sofar = totals.getOrElse(k, 0L)
        offsets((pid, k)) = sofar
        totals(k) = sofar + c
      }
    }
    // flanking ranks per group at position p·(n−1)
    val needed: Map[List[Any], (Long, Long, Double)] = totals.map {
      case (k, n) =>
        val pos = p * (n - 1)
        k -> ((math.floor(pos).toLong, math.ceil(pos).toLong, pos))
    }.toMap
    val bOff = spark.sparkContext.broadcast(offsets.toMap)
    val bNeed = spark.sparkContext.broadcast(needed)

    // pass 2: keep flanking rows, reduce to (lo, hi), interpolate
    val quantiles = sorted.mapPartitionsWithIndex { (pid, it) =>
      val off = bOff.value
      val need = bNeed.value
      var cur: List[Any] = null
      var first = true
      var rank = 0L
      it.flatMap { case (k, v) =>
        if (first || k != cur) { cur = k; rank = off((pid, k)); first = false }
        else rank += 1
        val (lo, hi, _) = need(k)
        if (rank == lo || rank == hi)
          Iterator.single((k, (if (rank == lo) Some(v) else None,
            if (rank == hi) Some(v) else None)))
        else Iterator.empty
      }
    }.reduceByKey((a, b) => (a._1.orElse(b._1), a._2.orElse(b._2)))
      .map { case (k, (loOpt, hiOpt)) =>
      val (_, _, pos) = bNeed.value(k)
      val lo = loOpt.get
      val hi = hiOpt.get
      Row.fromSeq(k.map(unkey) :+ (lo + (pos - math.floor(pos)) * (hi - lo)))
    }

    val flanks = spark.createDataFrame(quantiles, StructType(
      cleaned.schema.fields.take(gWidth).toSeq :+
        StructField(outCol, DoubleType, nullable = true)))
    // quantile_cont GROUP BY semantics: a group whose values are ALL null
    // yields a NULL quantile, not a missing row — null-safe left join from
    // the distinct groups of the input.
    val f = flanks.select(
      groupCols.map(c => col(c).as(s"__f_$c")) :+ col(outCol): _*)
    df.select(groupCols.map(c => col(c).as(s"__d_$c")): _*).distinct()
      .join(f, groupCols.map(c => col(s"__d_$c") <=> col(s"__f_$c"))
        .reduce(_ && _), "left")
      .select(groupCols.map(c => col(s"__d_$c").as(c)) :+ col(outCol): _*)
  }
}
