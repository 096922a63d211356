package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV ("k minimum values") theta sketch — mergeable distinct counting
  * WITH SET ALGEBRA. The HLL sketches this engine already carries
  * (`q_approx_distinct`, `q_hll_merge`) union losslessly but cannot
  * intersect: HLL registers are maxima, and max(A) ∧ max(B) says nothing
  * about |A ∩ B|. The KMV sketch (Bar-Yossef et al. 2002; Beyer et al.
  * 2007, "On synopses for distinct-value estimation under multiset
  * operations") keeps the k smallest distinct hash values of the set —
  * an order statistic that supports union, intersection, Jaccard, and
  * difference ESTIMATES from the sketches alone. The use-case this
  * engine cares about: audience / source overlap at 100 TB ("how many
  * documents do crawls A and B share?", "what fraction of this month's
  * users were active last month?") from megabyte sketches, no re-scan.
  *
  * Derandomized, like every sketch in this library: the hash is the
  * 60-bit md5 kernel ([[ArrayOps.Md5Kernel]] — `substr(md5(x), 1, 15)`
  * parsed as hex), so an independent engine replays the sketch
  * bit-for-bit from the raw values, which is what turns the oracle
  * check into a full hash match. The sketch itself is CANONICAL — the
  * k smallest distinct hashes of the value set, sorted ascending — so
  * `merge(sketch(A), sketch(B)) == sketch(A ∪ B)` EXACTLY (the k
  * smallest of two k-smallest prefixes are the k smallest of the
  * union), and merge order / partition layout / duplicate multiplicity
  * are all invisible.
  *
  * Estimators (h normalized to [0, 1) by 2^60; `m` = retained count):
  *  - |A|: exact `m` when `m < k` (the sketch IS the distinct hash
  *    set); else `(k-1) / h_(k)` — the classic unbiased KMV estimate,
  *    relative error ≈ 1/√(k−2).
  *  - |A ∪ B|: the merged sketch's estimate.
  *  - Jaccard: K = k smallest of (S_A ∪ S_B); every element of K is
  *    below BOTH sketches' k-th minima (k-th smallest of a superset ≤
  *    k-th smallest of a subset), so sketch membership of K's elements
  *    is TRUE set membership; ρ = |K ∩ S_A ∩ S_B| / |K| estimates
  *    J(A, B) (Beyer et al. 2007 §5).
  *  - |A ∩ B| = ρ · |A ∪ B|-estimate; |A \ B| = max(0, |A| − |A ∩ B|).
  *
  * Scale shape: `Aggregator`s, so partial aggregation applies — the
  * shuffle carries one ≤k-long sorted array per group per partition,
  * never raw values; the scalar estimators are pure column HOFs over
  * ≤k-element arrays (no UDFs, no driver state). Persist the per-day /
  * per-source sketch rows and every overlap question thereafter is
  * arithmetic over kilobytes.
  */
object ThetaSketch {

  /** 2^60 as an exact double — the normalizing constant of the 60-bit
    * hash space. Both engines compute `h / 2^60` in IEEE doubles, so
    * the estimates replay bit-for-bit.
    */
  val Two60: Double = 1152921504606846976.0

  /** Mutable buffer: sorted ascending distinct prefix `m` of a
    * k-capacity array.
    */
  final case class TBuf(var m: Int, vs: Array[Long])

  /** Insert a hash, keeping the sorted-distinct k-smallest invariant.
    * O(log k) search + O(k) shift — k is small (≤ a few thousand).
    */
  private def insert(b: TBuf, h: Long, k: Int): Unit = {
    var lo = 0; var hi = b.m
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b.vs(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < b.m && b.vs(lo) == h) return // already retained
    if (b.m == k && lo == k) return       // not among the k smallest
    var i = if (b.m == k) k - 1 else b.m  // full: the largest falls off
    while (i > lo) { b.vs(i) = b.vs(i - 1); i -= 1 }
    b.vs(lo) = h
    if (b.m < k) b.m += 1
  }

  /** Sketch a column (any type — values hash through their string form,
    * `substr(md5(x::VARCHAR), 1, 15)` in oracle terms). Nulls skipped.
    */
  final class SketchAgg(k: Int) extends Aggregator[String, TBuf, Seq[Long]] {
    require(k >= 2, "k must be >= 2")
    override def zero: TBuf = TBuf(0, new Array[Long](k))
    override def reduce(b: TBuf, x: String): TBuf = {
      if (x != null)
        insert(b, ArrayOps.Md5Kernel.hash60(
          x.getBytes(java.nio.charset.StandardCharsets.UTF_8)), k)
      b
    }
    override def merge(a: TBuf, b: TBuf): TBuf = {
      var i = 0
      while (i < b.m) { insert(a, b.vs(i), k); i += 1 }
      a
    }
    override def finish(b: TBuf): Seq[Long] = b.vs.take(b.m).toSeq
    override def bufferEncoder: Encoder[TBuf] = ExpressionEncoder[TBuf]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Merge a column of sketches (the rollup face: per-day sketches →
    * monthly overlap, no re-scan). A source built with a LARGER k folds
    * correctly (its extra entries just compete on value); a source
    * built with a smaller k caps the merged sketch's information — the
    * canonical result is then the union at the SMALLEST k involved, so
    * keep one k per sketch family. Null sketches are skipped.
    */
  final class UnionAgg(k: Int) extends Aggregator[Seq[Long], TBuf, Seq[Long]] {
    require(k >= 2, "k must be >= 2")
    override def zero: TBuf = TBuf(0, new Array[Long](k))
    override def reduce(b: TBuf, s: Seq[Long]): TBuf = {
      if (s != null) s.foreach(insert(b, _, k))
      b
    }
    override def merge(a: TBuf, b: TBuf): TBuf = {
      var i = 0
      while (i < b.m) { insert(a, b.vs(i), k); i += 1 }
      a
    }
    override def finish(b: TBuf): Seq[Long] = b.vs.take(b.m).toSeq
    override def bufferEncoder: Encoder[TBuf] = ExpressionEncoder[TBuf]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Column API: KMV sketch of a column (sorted ascending array<long>
    * of the k smallest distinct 60-bit hashes).
    */
  def thetaSketch(value: Column, k: Int = 256): Column =
    udaf(new SketchAgg(k)).apply(value.cast("string"))

  /** Column API: union-merge a column of sketches into one. */
  def thetaUnion(sketch: Column, k: Int = 256): Column =
    udaf(new UnionAgg(k)).apply(sketch)

  /** Distinct-count estimate of a sketch: exact below k, else
    * `(k-1) / (h_(k) / 2^60)`. NULL in → NULL out (guarded explicitly:
    * under `spark.sql.legacy.sizeOfNull`, `size(NULL)` is -1, which
    * would take the "< k exact" branch and report -1.0).
    *
    * HAZARD — `k` must equal the k the sketch was BUILT with: the
    * arrays don't carry k, so probing a sketch capped at k'=64 with the
    * default k=256 silently takes the size<k "exact" branch and reports
    * 64.0 for an arbitrarily large set. Keep one k per sketch family
    * (the [[UnionAgg]] rule); the same contract applies to every
    * estimator below.
    */
  def thetaEstimate(sketch: Column, k: Int = 256): Column = {
    require(k >= 2, "k must be >= 2")
    when(sketch.isNull, lit(null).cast("double"))
      .when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (element_at(sketch, k).cast("double") / lit(Two60)))
  }

  /** The k smallest of two sketches' union — itself the canonical
    * sketch of A ∪ B. Scalar form of [[thetaUnion]] for the two-sketch
    * case (one projection, no aggregate).
    */
  def thetaUnion2(a: Column, b: Column, k: Int = 256): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Jaccard estimate ρ = |K ∩ S_A ∩ S_B| / |K| (K = the union
    * sketch). Exact when both sets retained whole. NULL when either
    * sketch is NULL (outer joins over sketch tables produce null
    * sketches; without the guard, legacy `size(NULL) = -1` would make
    * this evaluate to -1/-1 = 1.0) and NULL when both sets are empty
    * (Jaccard of two empty sets is undefined).
    */
  def thetaJaccard(a: Column, b: Column, k: Int = 256): Column =
    when(a.isNull || b.isNull, lit(null).cast("double"))
      .otherwise(jaccardOf(thetaUnion2(a, b, k), a, b))

  private def jaccardOf(u: Column, a: Column, b: Column): Column =
    when(size(u) === 0, lit(null).cast("double"))
      .otherwise(
        size(filter(u, x => array_contains(a, x) && array_contains(b, x)))
          .cast("double") / size(u).cast("double"))

  /** |A ∩ B| estimate = ρ × |A ∪ B|-estimate; 0 for two empty sets;
    * NULL when either sketch is NULL (same legacy-sizeOfNull guard as
    * [[thetaJaccard]]).
    */
  def thetaIntersect(a: Column, b: Column, k: Int = 256): Column = {
    val u = thetaUnion2(a, b, k)
    when(a.isNull || b.isNull, lit(null).cast("double"))
      .when(size(u) === 0, lit(0.0))
      .otherwise(jaccardOf(u, a, b) * thetaEstimate(u, k))
  }

  /** |A \ B| estimate = max(0, |A|-est − |A ∩ B|-est) — clamped, the
    * two estimates are correlated but not jointly consistent. NULL when
    * either sketch is NULL (guarded: `greatest` skips nulls, so an
    * unguarded null input would surface as 0.0, not NULL).
    */
  def thetaANotB(a: Column, b: Column, k: Int = 256): Column =
    when(a.isNull || b.isNull, lit(null).cast("double"))
      .otherwise(
        greatest(lit(0.0), thetaEstimate(a, k) - thetaIntersect(a, b, k)))
}
