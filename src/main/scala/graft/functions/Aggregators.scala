package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregations (`Aggregator[IN, BUF, OUT]`) — the engine's
  * UDAF surface (SURVEY §2.3 "UDF/UDAF/UDTF" row). An Aggregator gets
  * partial aggregation (map-side combine) for free: at 100 TB the shuffle
  * carries one buffer per group per partition, never raw rows.
  */
object Aggregators {

  /** Mutable running sum of `dim` vector components + count. */
  final case class CentroidBuffer(sums: Array[Double], var n: Long)

  /** Per-group mean vector (centroid) of an `array<double>` column —
    * the building block for embedding clustering / IVF coarse quantizers.
    */
  final class VectorCentroid(dim: Int)
      extends Aggregator[Seq[Double], CentroidBuffer, Seq[Double]] {
    override def zero: CentroidBuffer = CentroidBuffer(Array.fill(dim)(0.0), 0L)
    override def reduce(b: CentroidBuffer, v: Seq[Double]): CentroidBuffer = {
      if (v != null) {
        var i = 0
        while (i < dim) { b.sums(i) += v(i); i += 1 }
        b.n += 1
      }
      b
    }
    override def merge(a: CentroidBuffer, b: CentroidBuffer): CentroidBuffer = {
      var i = 0
      while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
      a.n += b.n
      a
    }
    override def finish(b: CentroidBuffer): Seq[Double] =
      if (b.n == 0) null else b.sums.map(_ / b.n).toSeq
    override def bufferEncoder: Encoder[CentroidBuffer] = ExpressionEncoder[CentroidBuffer]()
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
  }

  /** Column API: centroid of a vector column. `vec` must be
    * `array<double>` (cast upstream — float accumulation drifts).
    */
  def vectorCentroid(vec: Column, dim: Int): Column =
    udaf(new VectorCentroid(dim)).apply(vec)
}
