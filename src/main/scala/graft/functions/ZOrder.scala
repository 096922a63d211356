package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Morton (Z-order) key expression.
  *
  * The pure-Column formulation (16 shiftright/bitwiseAND/multiply terms
  * per column, each re-instantiating the whole clamp-bucket
  * subexpression) relies on whole-stage codegen's subexpression
  * elimination to stay O(bits); wrapping it in the NULL-contract
  * `when(isNull…)` pushed the tree past what codegen handles and the
  * fallback interpreter re-evaluated the bucket per BIT — measured
  * q_zorder 0.53 → 4.5 s at sf0.1. One native expression computes each
  * bucket once and interleaves with integer ops: bit-identical output
  * (same left-to-right IEEE arithmetic as the Column form and the
  * DuckDB oracle replay), O(n·bits) per row, no giant tree.
  *
  * Children are the key columns cast to double upstream
  * ([[graft.tables.Tables.zValueN]]). NULL in ANY child → NULL.
  */
case class ZValueN(children: Seq[Expression], bitsPerCol: Int,
    los: Seq[Double], his: Seq[Double])
    extends Expression with CodegenFallback {
  require(children.size == los.size && los.size == his.size)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.forall(_.dataType == DoubleType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("ZValueN expects double key columns")
  }

  private val n = children.size
  private val maxBucket = (1L << bitsPerCol) - 1

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var j = 0
    while (j < n) {
      val v = children(j).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Double]
      // same arithmetic order as the Column form / oracle:
      // floor((x - lo) / (hi - lo) * 2^bits), clamped to [0, 2^bits - 1]
      val raw = math.floor((x - los(j)) / (his(j) - los(j))
        * (maxBucket + 1).toDouble).toLong
      val bk = math.min(maxBucket, math.max(0L, raw))
      var k = 0
      while (k < bitsPerCol) {
        z |= ((bk >> k) & 1L) << (k * n + (n - 1 - j))
        k += 1
      }
      j += 1
    }
    z
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
