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

  /** One resized image per input. */
  case class ResizedMedia(id: Long, out_w: Int, out_h: Int, out_bytes: Array[Byte])

  /** Batched resize: payloads flow through in fixed-size batches so a
    * real resizer (SIMD library, GPU) processes many images per call —
    * the batch shape `mapInPandas` gives Python for free, made explicit
    * here with `grouped()`. The pixel work is STUBBED (deterministic
    * output bytes derived from input length); everything around it is the
    * production shape.
    */
  def resizeImages(spark: SparkSession, df: DataFrame, idCol: String,
      payloadCol: String, w: Int, h: Int, batchSize: Int = 64): Dataset[ResizedMedia] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real impl calls resizeBatch(batch) on the native library here
          batch.iterator.map { case (id, bytes) =>
            val n = if (bytes == null) 0 else bytes.length
            // ??? <- real resize; deterministic fake: w*h header bytes
            val out = Array.tabulate(math.min(16, w * h))(i => ((n + i) % 256).toByte)
            ResizedMedia(id, w, h, out)
          }
        }
      }
  }

  /** One sampled frame of a video payload. */
  case class Frame(id: Long, frame_idx: Int)

  /** Frame sampling: every `everyN`-th frame of each payload — the 1→N
    * exploding shape of video pipelines. Frame count comes from the
    * (stubbed) decoder's metadata; a real impl would also emit the frame
    * bytes.
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String,
      payloadCol: String, everyN: Int): Dataset[Frame] = {
    import spark.implicits._
    require(everyN > 0, "everyN must be positive")
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val meta = MediaDecoder.decode(id, bytes)
          (0 until meta.n_frames by everyN).iterator.map(Frame(id, _))
        }
      }
  }
}
