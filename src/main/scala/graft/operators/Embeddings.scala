package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Spherical k-means corpus clustering (Lloyd 1982, cosine kernel) —
    * the topic-sharding step of cluster-based pipelines (SemDeDup's
    * cluster stage, cluster-balanced sampling): `iters` update rounds
    * from deterministic seeds (the vectors of the `k` smallest ids),
    * then the assignment against the final centroids.
    *
    * Engine-replicable by construction, so the driver oracle checks the
    * assignment EXACTLY: assignments argmax a cosine ROUNDED to 6
    * decimals (ties → lowest cluster index) and recomputed centroids are
    * rounded per-component to 9 decimals — both absorb the last-ulp
    * differences of distributed vs sequential summation, in this engine
    * and in any re-implementation. An empty cluster keeps its previous
    * centroid.
    *
    * Scale shape: centroids live on the driver (k×dim doubles — the
    * coarse-quantizer discipline of [[Similarity.ivfTopK]]); each round
    * is ONE distributed projection (k cosines per row against centroid
    * literals, whole-stage codegen'd — the k ≤ a-few-hundred regime this
    * targets) plus ONE map-side-combined centroid aggregation. The
    * corpus is never collected; the seed read collects exactly k rows.
    */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, iters: Int): DataFrame =
    kmeansAssign(df, idCol, vecCol,
      kmeansTrain(df, idCol, vecCol, dim, k, iters))

  /** The greedy-first argmax over round-6 cosines: ties break to the
    * lowest cluster index (a left fold keeps the FIRST max).
    */
  private[operators] def nearest(v: Column, cents: Seq[(Int, Seq[Double])]): Column = {
    import graft.functions.{VectorFunctions => V}
    val scored = cents.map { case (i, c) =>
      struct(round(V.cosine(v, typedLit(c)), 6).as("c"), lit(i).as("i"))
    }
    scored.reduceLeft((a, b) => when(b("c") > a("c"), b).otherwise(a))
      .getField("i").as("cluster")
  }

  /** Training half of [[kmeans]]: the final (cluster, centroid) MODEL as
    * a k-row DataFrame — persist it with `model.write.parquet(...)` and
    * assign arbitrary future batches against it
    * ([[kmeansAssign]]), the same train-offline / score-online split as
    * the NB classifier and DSIR.
    */
  def kmeansTrain(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 0, "k >= 1, iters >= 0")
    val base = df.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .localCheckpoint(true) // read once per round + once for seeds

    // deterministic seeds: the k lowest-id vectors (bounded collect)
    var cents: Seq[(Int, Seq[Double])] = base.orderBy(col(idCol)).limit(k)
      .collect().map(_.getSeq[Double](1)).toSeq.zipWithIndex.map(_.swap)
    (1 to iters).foreach { _ =>
      val updated = base.select(nearest(col("__v"), cents), col("__v"))
        .groupBy("cluster")
        .agg(graft.functions.Aggregators.vectorCentroid(col("__v"), dim).as("c"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).map(x =>
          // SQL round() semantics (half away from zero), 9 decimals —
          // engine-stable centroid components
          BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
            .toDouble))
        .toMap
      cents = cents.map { case (i, prev) =>
        i -> updated.getOrElse(i, prev) // empty cluster keeps its centroid
      }
    }
    val spark = df.sparkSession
    import spark.implicits._
    cents.toDF("cluster", "centroid")
  }

  /** Assignment half: nearest model centroid per vector (argmax of
    * round-6 cosine, ties → lowest cluster) — one codegen'd projection
    * against the collected k-row model, no shuffle. When the model was
    * trained on a corpus containing these vectors this reproduces
    * [[kmeans]] restricted to them exactly.
    */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
      model: DataFrame): DataFrame = {
    // bounded collect: k rows
    val cents = model.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1))
      .sortBy(_._1).toSeq
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .select(col(idCol), nearest(col("__v"), cents))
  }
}
