package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native product-quantization encoder: ONE expression computes all m
  * per-subspace codebook argmins over the full vector
  * ([[graft.operators.Embeddings.pqTrain]]'s L2 rule — round-6 squared
  * distance, ties to the lowest cluster) in a tight loop.
  *
  * This replaces a per-centroid higher-order-function formulation
  * (m × k `aggregate(zip_with(...))` subtrees in one projection —
  * 512 HOF nodes at m=16/k=32) whose plan-analysis + codegen cost
  * dominated the IVF-PQ queries as a CONSTANT ~7-10 s per run, and
  * whose per-row cost paid an array allocation per candidate. The loop
  * below is allocation-free per candidate and the expression tree is a
  * single node.
  *
  * Bit-exact equivalence with the HOF formulation (and the DuckDB
  * replay, which rounds EVERY candidate): squared distances accumulate
  * in the same left-to-right order as [[VectorFunctions.sqDist]]'s
  * fold, and the exact SQL-round(…, 6) (BigDecimal HALF_UP — costly)
  * is applied lazily, only to candidates within one rounding granule
  * (1e-6) of the raw minimum: round-6 is monotone, so the minimal
  * rounded value is round6(minD), and two doubles more than 1e-6 apart
  * cannot round to the same 6-decimal grid point — every candidate that
  * could tie the winner lies inside the granule. Scanning those in
  * ascending index with strict `<` keeps the lowest cluster on ties,
  * exactly like the fold.
  */
object PqEncodeFn {

  case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
      extends UnaryExpression with CodegenFallback {
    require(codebooks.nonEmpty && codebooks.head.nonEmpty,
      "PqEncode: empty codebooks")
    private val m = codebooks.length
    private val subDim = codebooks.head.head.length
    require(codebooks.forall(_.forall(_.length == subDim)),
      "PqEncode: ragged codebook centroids")
    @transient private lazy val cb: Array[Array[Array[Double]]] =
      codebooks.map(_.map(_.toArray).toArray).toArray

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"PqEncode expects array<double>, got ${other.catalogString}")
      }
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() < m * subDim)
        throw new IllegalArgumentException(
          s"PqEncode: vector has ${v.numElements()} components, " +
            s"codebooks need ${m * subDim}")
      val out = new Array[Int](m)
      var s = 0
      while (s < m) {
        val off = s * subDim
        val cbs = cb(s)
        val ds = new Array[Double](cbs.length)
        var minD = Double.MaxValue
        var i = 0
        while (i < cbs.length) {
          val c = cbs(i)
          var d = 0.0
          var j = 0
          while (j < subDim) {
            // same fold order as sqDist: 0.0 + t0² + t1² + …
            val t = v.getDouble(off + j) - c(j)
            d += t * t
            j += 1
          }
          ds(i) = d
          if (d < minD) minD = d
          i += 1
        }
        // exact round-6 only inside the rounding granule (see scaladoc)
        var best = Double.MaxValue
        var bi = -1
        i = 0
        while (i < cbs.length) {
          if (ds(i) <= minD + 1.000001e-6) {
            val r = BigDecimal(ds(i))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (r < best) { best = r; bi = i }
          }
          i += 1
        }
        out(s) = bi
        s += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Column API: all m codes of `vec` against ordered per-subspace
    * codebooks (cluster order — the collected model shape
    * [[graft.operators.Embeddings.pqEncode]] passes through).
    */
  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    Bridge.column(PqEncode(Bridge.expression(vec), codebooks))
}
