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
  * A sketch is a STRUCT `(k: int, vs: array<long>)` — it CARRIES its
  * build-time k. Until round 13 the sketch was the bare array and every
  * estimator took k as a caller argument; probing a sketch built at
  * k'=64 with the default 256 silently took the size<k "exact" branch
  * and reported 64.0 for an arbitrarily large set. Now the estimators
  * read k from the sketch itself (the mismatch cannot be expressed) and
  * the two-sketch estimators RAISE on differing k rather than
  * estimating from incomparable order statistics.
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

  /** The sketch value: its build-time k and the sorted ascending
    * k-smallest distinct hashes.
    */
  final case class Theta(k: Int, vs: Seq[Long])

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
  final class SketchAgg(k: Int) extends Aggregator[String, TBuf, Theta] {
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
    override def finish(b: TBuf): Theta = Theta(k, b.vs.take(b.m).toSeq)
    override def bufferEncoder: Encoder[TBuf] = ExpressionEncoder[TBuf]()
    override def outputEncoder: Encoder[Theta] = ExpressionEncoder[Theta]()
  }

  /** Merge a column of sketches (the rollup face: per-day sketches →
    * monthly overlap, no re-scan). Every input sketch's k MUST equal
    * the union's k — mixing k values silently degraded the merged
    * sketch to the smallest k involved, so it now fails loudly (keep
    * one k per sketch family). Null sketches are skipped.
    */
  final class UnionAgg(k: Int) extends Aggregator[Theta, TBuf, Theta] {
    require(k >= 2, "k must be >= 2")
    override def zero: TBuf = TBuf(0, new Array[Long](k))
    override def reduce(b: TBuf, s: Theta): TBuf = {
      // a NULL sketch row decodes as a Theta with null vs (k is a
      // primitive slot) — skip it, like the bare-array era did
      if (s != null && s.vs != null) {
        require(s.k == k,
          s"theta k mismatch: union at k=$k over a sketch built at k=${s.k}")
        s.vs.foreach(insert(b, _, k))
      }
      b
    }
    override def merge(a: TBuf, b: TBuf): TBuf = {
      var i = 0
      while (i < b.m) { insert(a, b.vs(i), k); i += 1 }
      a
    }
    override def finish(b: TBuf): Theta = Theta(k, b.vs.take(b.m).toSeq)
    override def bufferEncoder: Encoder[TBuf] = ExpressionEncoder[TBuf]()
    override def outputEncoder: Encoder[Theta] = ExpressionEncoder[Theta]()
  }

  /** Column API: KMV sketch of a column — struct(k, vs) with vs the
    * sorted ascending array<long> of the k smallest distinct 60-bit
    * hashes.
    */
  def thetaSketch(value: Column, k: Int = 256): Column =
    udaf(new SketchAgg(k)).apply(value.cast("string"))

  /** Column API: union-merge a column of sketches into one; every input
    * must have been built at this k (loud otherwise).
    */
  def thetaUnion(sketch: Column, k: Int = 256): Column =
    // udaf() flattens a case-class input into one column per field
    udaf(new UnionAgg(k)).apply(sketch.getField("k"), sketch.getField("vs"))

  /** Raise unless the two sketches carry the same k; evaluates to that
    * k. Each estimate below threads through this, so an incomparable
    * pair fails the job instead of producing a plausible number.
    */
  private def sameK(a: Column, b: Column): Column =
    when(a.getField("k") =!= b.getField("k"),
      raise_error(concat(lit("theta k mismatch: "),
        a.getField("k"), lit(" vs "), b.getField("k"))).cast("int"))
      .otherwise(a.getField("k"))

  /** Distinct-count estimate of a sketch: exact below its own k, else
    * `(k-1) / (h_(k) / 2^60)`. NULL in → NULL out (guarded explicitly:
    * under `spark.sql.legacy.sizeOfNull`, `size(NULL)` is -1, which
    * would take the "< k exact" branch and report -1.0). k is read
    * from the sketch itself — the build/probe mismatch hazard the bare
    * array carried is unrepresentable.
    */
  def thetaEstimate(sketch: Column): Column = {
    val k = sketch.getField("k")
    val vs = sketch.getField("vs")
    when(sketch.isNull, lit(null).cast("double"))
      .when(size(vs) < k, size(vs).cast("double"))
      .otherwise((k - 1).cast("double") /
        (element_at(vs, k).cast("double") / lit(Two60)))
  }

  /** The k smallest of two sketches' union — itself the canonical
    * sketch of A ∪ B. Scalar form of [[thetaUnion]] for the two-sketch
    * case (one projection, no aggregate). Raises on differing k.
    */
  def thetaUnion2(a: Column, b: Column): Column = {
    val k = sameK(a, b)
    struct(k.as("k"),
      slice(array_sort(array_union(a.getField("vs"), b.getField("vs"))),
        lit(1), k).as("vs"))
  }

  /** Jaccard estimate ρ = |K ∩ S_A ∩ S_B| / |K| (K = the union
    * sketch). Exact when both sets retained whole. NULL when either
    * sketch is NULL (outer joins over sketch tables produce null
    * sketches; without the guard, legacy `size(NULL) = -1` would make
    * this evaluate to -1/-1 = 1.0) and NULL when both sets are empty
    * (Jaccard of two empty sets is undefined). Raises on differing k.
    */
  def thetaJaccard(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null).cast("double"))
      .otherwise(jaccardOf(thetaUnion2(a, b).getField("vs"),
        a.getField("vs"), b.getField("vs")))

  private def jaccardOf(u: Column, a: Column, b: Column): Column =
    when(size(u) === 0, lit(null).cast("double"))
      .otherwise(
        size(filter(u, x => array_contains(a, x) && array_contains(b, x)))
          .cast("double") / size(u).cast("double"))

  /** |A ∩ B| estimate = ρ × |A ∪ B|-estimate; 0 for two empty sets;
    * NULL when either sketch is NULL (same legacy-sizeOfNull guard as
    * [[thetaJaccard]]). Raises on differing k.
    */
  def thetaIntersect(a: Column, b: Column): Column = {
    val u = thetaUnion2(a, b)
    when(a.isNull || b.isNull, lit(null).cast("double"))
      .when(size(u.getField("vs")) === 0, lit(0.0))
      .otherwise(jaccardOf(u.getField("vs"),
        a.getField("vs"), b.getField("vs")) * thetaEstimate(u))
  }

  /** |A \ B| estimate = max(0, |A|-est − |A ∩ B|-est) — clamped, the
    * two estimates are correlated but not jointly consistent. NULL when
    * either sketch is NULL (guarded: `greatest` skips nulls, so an
    * unguarded null input would surface as 0.0, not NULL). Raises on
    * differing k.
    */
  def thetaANotB(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null).cast("double"))
      .otherwise(
        greatest(lit(0.0), thetaEstimate(a) - thetaIntersect(a, b)))
}
