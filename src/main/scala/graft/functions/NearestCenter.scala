package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Native nearest-center assignment: ONE expression computes the
  * round-6 squared-distance argmin of a vector against an ordered
  * center list, ties to the EARLIEST center — the k-center frozen-
  * coreset assignment rule ([[graft.operators.Sampling.kCenterAssign]]).
  *
  * This is the [[PqEncodeFn.PqEncode]] precedent applied to whole-vector
  * assignment: the higher-order-function fold formulation builds t
  * `struct(round(aggregate(zip_with(...))), cid)` subtrees in ONE
  * projection, whose plan-analysis + codegen cost grows linearly in t
  * (the exact m×k literal blowup PqEncode was written to kill) —
  * invisible at coreset t≤10, a multi-second constant at t in the
  * hundreds. The loop below is a single expression node regardless
  * of t.
  *
  * Bit-exact with the fold (and the DuckDB replay, which rounds EVERY
  * candidate): raw squared distances accumulate in [[VectorFunctions
  * .sqDist]]'s left-to-right order; the exact SQL-round(…, 6)
  * (BigDecimal HALF_UP) is applied lazily, only to candidates within
  * one rounding granule (1e-6) of the raw minimum — round-6 is
  * monotone and two doubles more than 1e-6 apart cannot round to the
  * same 6-decimal grid point, so every possible tie lies inside the
  * granule. Scanning granule candidates in ascending center order with
  * strict `<` keeps the earliest center on ties, exactly like the fold.
  */
object NearestCenterFn {

  case class NearestCenter(child: Expression,
      centerIds: Seq[Long], centroids: Seq[Seq[Double]])
      extends UnaryExpression with CodegenFallback {
    require(centerIds.nonEmpty && centerIds.length == centroids.length,
      "NearestCenter: ids and centroids must be same-length and non-empty")
    private val dim = centroids.head.length
    require(centroids.forall(_.length == dim),
      "NearestCenter: ragged centroids")
    @transient private lazy val cids: Array[Long] = centerIds.toArray
    @transient private lazy val cvs: Array[Array[Double]] =
      centroids.map(_.toArray).toArray

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"NearestCenter expects array<double>, got ${other.catalogString}")
      }
    override def dataType: DataType = StructType(Seq(
      StructField("d", DoubleType, nullable = false),
      StructField("cid", LongType, nullable = false)))

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() != dim)
        throw new IllegalArgumentException(
          s"NearestCenter: vector has ${v.numElements()} components, " +
            s"centroids have $dim")
      // a NULL vector component nulls every HOF sqDist, so the fold
      // returns its zero element — mirror that before touching getDouble
      // (which would read a silent 0.0 from a null slot)
      var j0 = 0
      while (j0 < dim) {
        if (v.isNullAt(j0)) return InternalRow(Double.MaxValue, -1L)
        j0 += 1
      }
      val n = cvs.length
      val ds = new Array[Double](n)
      var minD = Double.MaxValue
      var i = 0
      while (i < n) {
        val c = cvs(i)
        var d = 0.0
        var j = 0
        while (j < dim) {
          // same fold order as sqDist: 0.0 + t0² + t1² + …
          val t = v.getDouble(j) - c(j)
          d += t * t
          j += 1
        }
        ds(i) = d
        if (d < minD) minD = d
        i += 1
      }
      // exact round-6 only inside the rounding granule (see scaladoc).
      // The margin is ulp-aware: at squared-distance magnitudes ≥ ~1e7
      // ulp(minD) exceeds a fixed 1e-6 slack, so a genuine granule
      // candidate could fall outside a purely-additive threshold;
      // widening by ulp(minD) is always safe — an extra candidate with
      // real distance > min + 1e-6 cannot out-round the minimum
      // (round-6 is monotone), it just pays one more exact rounding
      val cutoff = minD + 1.000001e-6 + Math.ulp(minD)
      var best = Double.MaxValue
      var bi = -1
      i = 0
      while (i < n) {
        if (ds(i) <= cutoff) {
          val r = BigDecimal(ds(i))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (r < best) { best = r; bi = i }
        }
        i += 1
      }
      // all-NaN distances (a NaN vector component) fail every `<`
      // comparison on BOTH paths — return the fold's zero element
      // (MaxValue, -1) so the native node stays behavior-equivalent
      // instead of indexing cids(-1)
      if (bi < 0) InternalRow(Double.MaxValue, -1L)
      else InternalRow(best, cids(bi))
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Column API: struct(d: round-6 squared distance, cid: id of the
    * nearest center, earliest on ties) of `vec` against centers in
    * CHOSEN order.
    */
  def nearestCenter(vec: Column, centerIds: Seq[Long],
      centroids: Seq[Seq[Double]]): Column =
    Bridge.column(NearestCenter(Bridge.expression(vec), centerIds, centroids))
}
