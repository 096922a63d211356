package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column utilities beyond similarity search: storage-size
  * reduction for the 100 TB case, where float32 embeddings often dominate
  * the table footprint.
  */
object Embeddings {

  /** Symmetric int8 quantization per vector: scale = max |x_i|,
    * q_i = floor(x_i / scale * 127 + 0.5) (round-half-up — `floor`
    * behaves identically in every SQL engine, unlike banker's rounding),
    * zero vectors quantize to all zeros. 4× smaller than float32 with
    * the scale kept per row for dequantization.
    *
    * Two projections on purpose: `scale` must be a plain attribute by
    * the time the packing lambda references it — a lambda body that
    * references an outer EXPRESSION re-evaluates it per element (the
    * max-abs pass would run 64× per row).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol), v.as("__v"),
        array_max(transform(v, x => abs(x))).as("scale"))
      .select(col(idCol), col("scale"),
        transform(col("__v"), x =>
          when(col("scale") === 0.0, lit(0))
            .otherwise(floor(x / col("scale") * 127.0 + 0.5).cast("int"))).as("q"))
  }

  /** Dequantize back to doubles: x_i ≈ q_i * scale / 127. */
  def dequantizeInt8(df: DataFrame, qCol: String, scaleCol: String): DataFrame =
    df.withColumn("v_approx",
      transform(col(qCol), q => q.cast("double") * col(scaleCol) / 127.0))
}
