package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct alongside.
  *
  * The Spark-side plumbing (schema, partition-wise batched decode,
  * column shapes) is real and tested; the actual media decode is STUBBED
  * (no image/audio libraries in this container) behind
  * `MediaDecoder.decode` — a deterministic fake with the signature a real
  * decoder (e.g. javacv / TwelveMonkeys ImageIO) would have. Swap that
  * one function to go live.
  */
object Multimodal {

  /** Metadata carried next to every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image|audio|video
    StructField("format", StringType),       // png|jpeg|wav|mp4|...
    StructField("byte_len", LongType),
    StructField("sha256", StringType)))

  /** Wrap a source column into (payload binary, meta struct). Pure column
    * expressions — at scale this is computed in the scan projection.
    */
  def withMediaColumns(df: DataFrame, srcCol: String,
      mediaType: String, format: String): DataFrame = {
    val payload = col(srcCol).cast("binary")
    df.withColumn("payload", payload)
      .withColumn("meta", struct(
        lit(mediaType).as("media_type"),
        lit(format).as("format"),
        length(payload).cast("long").as("byte_len"),
        sha2(payload, 256).as("sha256")))
  }

  /** Decoded per-item features a real decoder would emit. */
  case class DecodedMedia(id: Long, width: Int, height: Int,
      n_frames: Int, feature: Array[Float])

  /** STUB decoder — deterministic fake deriving "dimensions" and a
    * small feature vector from the payload bytes. A real implementation
    * decodes `bytes` with a media library; everything around it
    * (batch-per-partition iteration, output schema, distribution) is the
    * production shape.
    */
  object MediaDecoder {
    def decode(id: Long, bytes: Array[Byte]): DecodedMedia = {
      // ??? <- real decode goes here; deterministic fake below
      val n = if (bytes == null) 0 else bytes.length
      val w = 64 + (n % 577)
      val h = 64 + ((n * 31) % 331)
      val feat = Array.tabulate(8)(i => ((n * (i + 3)) % 997).toFloat / 997f)
      DecodedMedia(id, w, h, 1 + n % 30, feat)
    }
  }

  /** Distributed batched decode: `mapPartitions` over (id, payload) so a
    * real decoder amortizes per-batch init (library contexts, GPU
    * handles) across a whole partition — the Scala analog of
    * `mapInPandas`. Output is a typed Dataset with a stable schema.
    */
  def decodeFeatures(spark: SparkSession, df: DataFrame,
      idCol: String, payloadCol: String): Dataset[DecodedMedia] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init for a real decoder happens here, once
        it.map { case (id, bytes) => MediaDecoder.decode(id, bytes) }
      }
  }
}
