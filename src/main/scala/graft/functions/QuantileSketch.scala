package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch — the quantile sibling of the HLL
  * distinct-count sketches (`q_hll_merge`): per-partition / per-day
  * sketches compose by MERGE, so global or rolling quantiles never
  * re-scan the raw data.
  *
  * Design: a self-scaling power-of-two histogram. Values are counted in
  * buckets of width 2^k anchored at 0 (`idx = floor(x / 2^k)`); when the
  * number of OCCUPIED buckets would exceed `bins`, k increments and
  * adjacent buckets fold pairwise (`floorDiv(idx, 2)` — exact, buckets
  * nest). The randomized sketches in this family (KLL, Karnin et al.
  * 2016; q-digest, Shrivastava et al. 2004) carry distribution-free
  * rank guarantees but are compaction-order-dependent: two runs (or two
  * merge orders) yield different summaries. This engine's correctness
  * gate hash-compares results against an independent engine, so the
  * sketch is DERANDOMIZED into a canonical form instead:
  *
  *   - the final k is the smallest k ≥ KMIN whose occupied-bucket count
  *     fits `bins` (and whose indexes fit a long) — a function of the
  *     value MULTISET only, because both constraints are monotone in k
  *     and growth stops exactly when they hold;
  *   - bucket counts at that k are plain sums — commutative/associative.
  *
  * Hence merge order, partitioning, and partial-aggregation layout are
  * all invisible: `merge(sketch(A), sketch(B)) == sketch(A ∪ B)`
  * EXACTLY, and any engine (the DuckDB oracle included) can replay the
  * result bit-for-bit from the raw values. The cost of determinism is
  * the error model: value error ≤ the final bucket width 2^k (≈ 2 ×
  * spread / bins for uniform data, far finer for clustered data since
  * only OCCUPIED buckets count against the budget), rather than KLL's
  * rank-ε. For training-data telemetry (token-count / length / score
  * distributions over shards) that is the right trade.
  *
  * Scale shape: an `Aggregator`, so partial aggregation applies — the
  * shuffle carries one ≤`bins`-entry buffer per group per partition,
  * never raw values (Spark's exact `percentile` buffers every value in
  * one state; `graft.operators.Quantiles` range-sorts the corpus; this
  * sketch is the third regime: bounded state AND persistable/mergeable).
  */
object QuantileSketch {

  /** Finest bucket granularity: 2^KMIN ≈ 1e-6 — bucket resolution below
    * which no corpus statistic in this engine is meaningful. A canonical
    * floor is REQUIRED: "smallest fitting k" must be bounded below or a
    * single-value sketch would have no defined k.
    */
  val KMIN: Int = -20

  /** Persisted/serialized face: bucket width 2^k, occupied bucket
    * indexes (sorted) with counts, total value count.
    */
  final case class QSketch(k: Int, idxs: Seq[Long], cnts: Seq[Long], n: Long)

  /** Mutable aggregation buffer: valid prefix `m` of fixed arrays (2 ×
    * bins capacity — a merge-walk peaks at the sum of both sides'
    * occupancy before folding back down).
    */
  final case class QSBuf(var k: Int, var m: Int, idxs: Array[Long],
      cnts: Array[Long], var n: Long)

  /** One fold step: k += 1, adjacent buckets pair up. Exact because
    * width-2^k buckets nest in width-2^(k+1): floorDiv(idx, 2) preserves
    * sort order and collapses at most neighbor runs.
    */
  private def grow(b: QSBuf): Unit = {
    b.k += 1
    var r = 0; var w = -1
    while (r < b.m) {
      val ni = Math.floorDiv(b.idxs(r), 2L)
      if (w >= 0 && b.idxs(w) == ni) b.cnts(w) += b.cnts(r)
      else { w += 1; b.idxs(w) = ni; b.cnts(w) = b.cnts(r) }
      r += 1
    }
    b.m = w + 1
  }

  /** Long-safety bound on bucket indexes (|idx| < 2^62): k also grows
    * until the value's index fits — monotone in k, so still canonical.
    */
  private val IdxBound = 4.6e18

  /** Pure sorted insert — NO growth: callers fold afterwards. The 2×bins
    * array capacity bounds the worst case (a merge of two full sides).
    */
  private def addBucket(b: QSBuf, idx: Long, c: Long): Unit = {
    // binary search the sorted occupied prefix
    var lo = 0; var hi = b.m
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b.idxs(mid) < idx) lo = mid + 1 else hi = mid
    }
    if (lo < b.m && b.idxs(lo) == idx) b.cnts(lo) += c
    else {
      var i = b.m
      while (i > lo) { b.idxs(i) = b.idxs(i - 1); b.cnts(i) = b.cnts(i - 1); i -= 1 }
      b.idxs(lo) = idx; b.cnts(lo) = c
      b.m += 1
    }
  }

  private def insertValue(b: QSBuf, x: Double, bins: Int): Unit = {
    var d = math.floor(x / math.scalb(1.0, b.k))
    while (d >= IdxBound || d <= -IdxBound) {
      grow(b); d = math.floor(x / math.scalb(1.0, b.k))
    }
    addBucket(b, d.toLong, 1L)
    while (b.m > bins) grow(b)
    b.n += 1
  }

  /** Fold `src` into `dst`: align granularities first (fold the finer
    * side — exact), insert, then re-fit the bins budget. The budget
    * check must come after the full insert pass: growing dst mid-merge
    * would leave the remaining src entries at a stale (finer)
    * granularity and corrupt their indexes.
    *
    * Capacity: dst holds ≤ bins entries on entry (every reduce/merge
    * re-fits before returning) in a 2×bins array, so the insert pass is
    * safe only if the source contributes ≤ bins entries. A source can
    * be larger — a persisted sketch built with a bigger bins budget, or
    * `sketchMerge` called with smaller bins than `sketchAgg` — so the
    * source is PRE-folded until it fits `bins`. Canonical-preserving:
    * > bins occupied buckets at k in the source means the union has
    * > bins at k too, so the canonical k of the union is past k anyway.
    */
  private def mergeInto(dst: QSBuf, srcK: Int, srcIdxs: IndexedSeq[Long],
      srcCnts: IndexedSeq[Long], srcN: Long, bins: Int): Unit = {
    var k = srcK
    var idxs = srcIdxs
    var cnts = srcCnts
    def foldSrc(): Unit = {
      // single linear pass (sorted input: folded neighbors are adjacent)
      val bi = IndexedSeq.newBuilder[Long]
      val bc = IndexedSeq.newBuilder[Long]
      var last = 0L; var acc = 0L; var has = false
      var r = 0
      while (r < idxs.length) {
        val ni = Math.floorDiv(idxs(r), 2L)
        if (has && ni == last) acc += cnts(r)
        else { if (has) { bi += last; bc += acc }; last = ni; acc = cnts(r); has = true }
        r += 1
      }
      if (has) { bi += last; bc += acc }
      idxs = bi.result(); cnts = bc.result(); k += 1
    }
    while (dst.k > k) foldSrc()
    while (idxs.length > bins) foldSrc()
    while (k > dst.k) grow(dst)
    var i = 0
    while (i < idxs.length) { addBucket(dst, idxs(i), cnts(i)); i += 1 }
    while (dst.m > bins) grow(dst)
    dst.n += srcN
  }

  /** Sketch a double column. Nulls and non-finite values are skipped
    * (NaN/±Inf have no bucket).
    */
  final class SketchAgg(bins: Int)
      extends Aggregator[java.lang.Double, QSBuf, QSketch] {
    require(bins >= 2, "bins must be >= 2")
    override def zero: QSBuf =
      QSBuf(KMIN, 0, new Array[Long](2 * bins), new Array[Long](2 * bins), 0L)
    override def reduce(b: QSBuf, x: java.lang.Double): QSBuf = {
      if (x != null && !x.isNaN && !x.isInfinite) insertValue(b, x, bins)
      b
    }
    override def merge(a: QSBuf, b: QSBuf): QSBuf = {
      mergeInto(a, b.k, b.idxs.take(b.m).toIndexedSeq,
        b.cnts.take(b.m).toIndexedSeq, b.n, bins)
      a
    }
    override def finish(b: QSBuf): QSketch =
      QSketch(b.k, b.idxs.take(b.m).toSeq, b.cnts.take(b.m).toSeq, b.n)
    override def bufferEncoder: Encoder[QSBuf] = ExpressionEncoder[QSBuf]()
    override def outputEncoder: Encoder[QSketch] = ExpressionEncoder[QSketch]()
  }

  /** Merge a column of sketches (the rollup face: per-day sketches →
    * monthly quantiles with no re-scan). Null sketches are skipped.
    */
  final class MergeAgg(bins: Int)
      extends Aggregator[QSketch, QSBuf, QSketch] {
    require(bins >= 2, "bins must be >= 2")
    override def zero: QSBuf =
      QSBuf(KMIN, 0, new Array[Long](2 * bins), new Array[Long](2 * bins), 0L)
    override def reduce(b: QSBuf, s: QSketch): QSBuf = {
      // a null sketch arrives as null FIELDS under field-wise binding —
      // check the arrays, not just the object
      if (s != null && s.idxs != null && s.cnts != null)
        mergeInto(b, s.k, s.idxs.toIndexedSeq, s.cnts.toIndexedSeq, s.n, bins)
      b
    }
    override def merge(a: QSBuf, b: QSBuf): QSBuf = {
      mergeInto(a, b.k, b.idxs.take(b.m).toIndexedSeq,
        b.cnts.take(b.m).toIndexedSeq, b.n, bins)
      a
    }
    override def finish(b: QSBuf): QSketch =
      QSketch(b.k, b.idxs.take(b.m).toSeq, b.cnts.take(b.m).toSeq, b.n)
    override def bufferEncoder: Encoder[QSBuf] = ExpressionEncoder[QSBuf]()
    override def outputEncoder: Encoder[QSketch] = ExpressionEncoder[QSketch]()
  }

  /** Column API: sketch of a numeric column (cast to double upstream for
    * non-double inputs).
    */
  def sketchAgg(value: Column, bins: Int = 256): Column =
    udaf(new SketchAgg(bins)).apply(value)

  /** Column API: merge a column of sketches into one. A product-typed
    * Aggregator input binds FIELD-WISE (the topKByScore convention), so
    * the struct column is spread into its four fields here.
    */
  def sketchMerge(sketch: Column, bins: Int = 256): Column =
    udaf(new MergeAgg(bins)).apply(sketch("k"), sketch("idxs"),
      sketch("cnts"), sketch("n"))

  /** Quantile estimate from a sketch struct — pure Column HOFs (no UDF,
    * stays in codegen): the midpoint of the first bucket whose cumulative
    * count reaches q·n. Deterministic tie rule; NULL for an empty sketch.
    * |estimate − exact quantile| ≤ 2^k (the final bucket width).
    */
  def sketchQuantile(sketch: Column, q: Double): Column = {
    require(q >= 0.0 && q <= 1.0, "q must be within [0, 1]")
    // bind the sketch expression ONCE as a lambda variable: a HOF body
    // referencing an outer non-attribute expression re-evaluates it per
    // element (the codebase's documented trap) — with an arbitrary
    // `sketch` argument (the SQL surface hands raw expressions) the fold
    // below would otherwise recompute it per bucket
    element_at(transform(array(sketch), sk => quantileOf(sk, q)), 1)
  }

  private def quantileOf(sk: Column, q: Double): Column = {
    val target = lit(q) * sk("n").cast("double")
    val z = zip_with(sk("idxs"), sk("cnts"),
      (i, c) => struct(i.as("i"), c.as("c")))
    val folded = aggregate(z,
      struct(lit(0.0).as("cum"), lit(null).cast("bigint").as("pick")),
      (acc, x) => struct(
        (acc("cum") + x("c")).as("cum"),
        when(acc("pick").isNull && (acc("cum") + x("c")) >= target, x("i"))
          .otherwise(acc("pick")).as("pick")))
    when(sk("n") > 0,
      (folded("pick").cast("double") + 0.5) * pow(lit(2.0), sk("k")))
  }
}
