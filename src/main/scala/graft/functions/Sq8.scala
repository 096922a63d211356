package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Byte-packing for int8-scalar-quantized vectors (the storage half of
  * the IVF-SQ8 index shape, FAISS `ScalarQuantizer` QT_8bit): quantized
  * codes live as ONE contiguous `binary` value per row — exactly
  * dim bytes, PLAIN-encodable — instead of a parquet list of INT32s
  * (4 logical bytes per component before encoding, plus repetition
  * levels). This is what makes the 4× size claim hold at the file
  * level, not just in the arithmetic.
  */
object Sq8 {

  /** `array<int>` of values in [-128, 127] → `binary` (one signed byte
    * per element, in order). Out-of-range input is a caller bug — fail
    * loudly rather than wrap silently.
    */
  case class PackSQ8(child: Expression)
      extends UnaryExpression with CodegenFallback {
    // declared input check: via the SQL surface (`graft_pack_sq8`) an
    // array<bigint>/array<smallint> argument would otherwise reach
    // ArrayData.getInt at the wrong element width (ClassCastException
    // or garbage bytes) — reject at analysis time instead. The SQL
    // registration casts its argument to array<int> first, so ordinary
    // integral inputs coerce rather than fail.
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"graft_pack_sq8 expects array<int>, got ${other.catalogString}")
      }
    override def dataType: DataType = BinaryType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        // reachable via the SQL surface: ArrayData.getInt on a null slot
        // would silently read 0 — fail loudly instead
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"PackSQ8: null code at index $i")
        val v = arr.getInt(i)
        if (v < Byte.MinValue || v > Byte.MaxValue)
          throw new IllegalArgumentException(
            s"PackSQ8: code $v at index $i outside signed-byte range")
        out(i) = v.toByte
        i += 1
      }
      out
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** `binary` codes + per-row `double` scale → the dequantized
    * `array<double>` (code·scale/127) — the inline-probe projection of
    * [[graft.operators.Similarity.ivfTopKFromIndexSQ8]]; feeds the same
    * [[ArrayOps.CosineDouble]] as the unquantized path.
    */
  case class UnpackSQ8(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"graft_unpack_sq8 expects (binary, double), got " +
            s"(${l.catalogString}, ${r.catalogString})")
      }
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(codes: Any, scale: Any): Any = {
      val bytes = codes.asInstanceOf[Array[Byte]]
      val s = scale.asInstanceOf[Double] / 127.0
      val out = new Array[Double](bytes.length)
      var i = 0
      while (i < bytes.length) { out(i) = bytes(i) * s; i += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
  }

  def packSq8(codes: Column): Column =
    Bridge.column(PackSQ8(Bridge.expression(codes)))

  def unpackSq8(codes: Column, scale: Column): Column =
    Bridge.column(UnpackSQ8(Bridge.expression(codes), Bridge.expression(scale)))
}
