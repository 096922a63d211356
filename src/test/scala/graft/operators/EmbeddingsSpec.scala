package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EmbeddingsSpec extends SparkSpec {

  test("quantizeInt8: max-abs maps to ±127, zero vector to zeros, round-half-up") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(2.0, -4.0, 1.0)),   // scale 4 → q = (64, -127, 32)
      (2L, Seq(0.0, 0.0, 0.0))     // zero vector
    ).toDF("id", "v")
    val out = Embeddings.quantizeInt8(df, "id", "v")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Int](2))).toMap
    out(1L)._1 shouldBe 4.0
    // floor(2/4*127 + 0.5) = floor(64.0) = 64; floor(-127 + 0.5) = -127;
    // floor(1/4*127 + 0.5) = floor(32.25) = 32
    out(1L)._2 shouldBe Seq(64, -127, 32)
    out(2L)._1 shouldBe 0.0
    out(2L)._2 shouldBe Seq(0, 0, 0)
  }

  test("quantize → dequantize round-trips within 1/254 of scale") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.83, -0.21, 0.55, -0.97))).toDF("id", "v")
    val q = Embeddings.quantizeInt8(df, "id", "v")
    val back = Embeddings.dequantizeInt8(q, "q", "scale")
      .select(col("v_approx")).head().getSeq[Double](0)
    val orig = Seq(0.83, -0.21, 0.55, -0.97)
    back.zip(orig).foreach { case (a, o) =>
      math.abs(a - o) should be <= (0.97 / 254 + 1e-12)
    }
  }

  test("quantizeInt8 stays codegen-friendly — single narrow stage, no shuffle") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("id", "v")
    val plan = Embeddings.quantizeInt8(df, "id", "v")
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("kmeans separates well-separated direction groups") {
    import spark.implicits._
    // three tight cones in 4-d; ids 0/10/20 are the natural seeds of
    // their own groups (k=3 seeds = ids 0, 1, 2 — two from group A —
    // so convergence has to MOVE a centroid onto group B or C)
    def jig(i: Long) = 0.01 * (i % 5)
    val a = (0L until 10L).map(i => (i, Seq(1.0, jig(i), 0.0, 0.0)))
    val b = (10L until 20L).map(i => (i, Seq(0.0, 1.0, jig(i), 0.0)))
    val c = (20L until 30L).map(i => (i, Seq(0.0, 0.0, 1.0, jig(i))))
    val df = (a ++ b ++ c).toDF("vec_id", "v")
    val got = Embeddings.kmeans(df, "vec_id", "v", dim = 4, k = 3, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // each group lands in ONE cluster, and the three clusters differ
    def clusterOf(ids: Seq[Long]) = { val cs = ids.map(got).distinct; cs.size shouldBe 1; cs.head }
    val ca = clusterOf((0L until 10L))
    val cb = clusterOf((10L until 20L))
    val cc = clusterOf((20L until 30L))
    Set(ca, cb, cc).size shouldBe 3
  }

  test("kmeans is deterministic and total over non-null vectors") {
    import spark.implicits._
    val df = (0L until 50L)
      .map(i => (i, Seq(math.sin(i * 0.7), math.cos(i * 1.3), 0.5, -0.25)))
      .toDF("vec_id", "v")
    val run1 = Embeddings.kmeans(df, "vec_id", "v", dim = 4, k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).sortBy(_._1)
    val run2 = Embeddings.kmeans(df, "vec_id", "v", dim = 4, k = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).sortBy(_._1)
    run1 shouldBe run2
    run1.length shouldBe 50
  }

  test("kmeansAssign against a persisted model equals the one-shot run") {
    import spark.implicits._
    val df = (0L until 60L)
      .map(i => (i, Seq(math.sin(i * 0.9), math.cos(i * 0.4), 0.3, -0.6)))
      .toDF("vec_id", "v")
    val full = Embeddings.kmeans(df, "vec_id", "v", dim = 4, k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("km_model").toString
    Embeddings.kmeansTrain(df, "vec_id", "v", dim = 4, k = 3, iters = 2)
      .write.mode("overwrite").parquet(dir)
    val model = spark.read.parquet(dir)
    model.count() shouldBe 3
    val got = Embeddings.kmeansAssign(
      df.filter(col("vec_id") >= 40), "vec_id", "v", model)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.keySet shouldBe (40L until 60L).toSet
    got.foreach { case (id, c) => c shouldBe full(id) }
  }

  test("pq: codes bounded, decode reconstructs cluster structure, model persists") {
    import spark.implicits._
    // two tight direction clusters per subspace half: ids 0-19 point
    // +x in both halves, 20-39 point +y — PQ must give each group one
    // dominant code word per subspace and reconstruct directions that
    // cosine-match group members far better than cross-group
    val rnd = new scala.util.Random(3)
    def jig(base: Seq[Double]) = base.map(_ + rnd.nextDouble() * 0.05)
    val df = ((0L until 20L).map(i => i -> jig(Seq(1.0, 0.0, 1.0, 0.0))) ++
      (20L until 40L).map(i => i -> jig(Seq(0.0, 1.0, 0.0, 1.0))))
      .toDF("vec_id", "v")
    val dir = java.nio.file.Files.createTempDirectory("pq_model").toString
    Embeddings.pqTrain(df, "vec_id", "v", dim = 4, m = 2, k = 2, iters = 2)
      .write.mode("overwrite").parquet(dir)
    val model = spark.read.parquet(dir)
    model.count() shouldBe 4 // m × k codebook rows
    val enc = Embeddings.pqEncode(df, "vec_id", "v", model)
    val codes = enc.collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    codes.size shouldBe 40
    codes.values.foreach { cs =>
      cs.length shouldBe 2
      cs.foreach(c => c should (be >= 0 and be < 2))
    }
    // one code word per group (the clusters are separable): all of
    // group A share a codes vector, all of B share a different one
    codes.filterKeys(_ < 20).values.toSet.size shouldBe 1
    codes.filterKeys(_ >= 20).values.toSet.size shouldBe 1
    codes(0L) should not be codes(20L)
    // reconstruction: decoded vectors cosine-match own-group members
    // (> 0.99) and mismatch the other group (< 0.1)
    import graft.functions.{VectorFunctions => V}
    val dec = enc.select(col("vec_id"),
      Embeddings.pqDecode(col("codes"), model).as("dv"))
      .join(df, Seq("vec_id"))
      .select(col("vec_id"), round(V.cosine(col("dv"), col("v")), 6).as("self"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    dec.values.foreach(_ should be > 0.99)
    // compressed-domain top-k: a group-A query ranks only group-A ids
    val top = Embeddings.pqTopK(enc, "vec_id",
      df.filter(col("vec_id") === 0L), "vec_id", "v", model,
      k = 5, excludeSelf = true).collect()
    top.length shouldBe 5
    top.foreach { r =>
      r.getLong(0) shouldBe 0L
      r.getLong(1) should be < 20L
    }
    // ranks are 1..5 by (score desc, id)
    top.map(_.getAs[Int]("rank")).sorted shouldBe Seq(1, 2, 3, 4, 5)
  }

  test("kmeans with iters=0 assigns against the raw seeds") {
    import spark.implicits._
    val df = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(0.9, 0.1)), (3L, Seq(0.1, 0.9))).toDF("vec_id", "v")
    val got = Embeddings.kmeans(df, "vec_id", "v", dim = 2, k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got(0L) shouldBe 0
    got(2L) shouldBe 0
    got(1L) shouldBe 1
    got(3L) shouldBe 1
  }
}
