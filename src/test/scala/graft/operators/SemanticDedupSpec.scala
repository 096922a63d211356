package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{VectorFunctions => V}

class SemanticDedupSpec extends SparkSpec {

  // three near-parallel groups plus two singletons, dim 4
  private val vecs: Seq[(Long, Seq[Double])] = Seq(
    1L -> Seq(1.0, 0.0, 0.0, 0.0),
    2L -> Seq(0.99, 0.01, 0.0, 0.02),
    3L -> Seq(0.98, 0.02, 0.01, 0.0),
    4L -> Seq(0.0, 1.0, 0.0, 0.0),
    5L -> Seq(0.01, 0.99, 0.02, 0.0),
    6L -> Seq(0.0, 0.0, 1.0, 0.0),
    7L -> Seq(0.5, 0.5, 0.5, 0.5),
    8L -> Seq(-1.0, 0.02, 0.0, 0.01),
    9L -> Seq(-0.99, 0.0, 0.01, 0.0))

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  test("semanticDedup: one diversity-edge survivor per semantic cluster") {
    import spark.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val threshold = 0.95

    // reference: buckets from the (already spec-covered) LSH function,
    // then sequential pairs → union-find → centroid → keep-farthest
    val buckets = df.select(col("vec_id"),
      V.hyperplaneLshBucket(col("embedding"), 3, 4, "md5").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byId = vecs.toMap
    val pairs = for {
      (a, va) <- vecs; (b, vb) <- vecs
      if a < b && buckets(a) == buckets(b) && cos(va, vb) >= threshold
    } yield (a, b)
    val parent = collection.mutable.Map(vecs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val clusterOf = inPairs.map(id => id ->
      inPairs.filter(o => find(o) == find(id)).min).toMap
    val centroids = vecs.groupBy(v => buckets(v._1)).map { case (b, vs) =>
      b -> (0 until 4).map(j => vs.map(_._2(j)).sum / vs.size)
    }
    val expected = inPairs.map { id =>
      val cc = cos(byId(id), centroids(buckets(id)))
      id -> (clusterOf(id), cc)
    }.toMap
    val keepOf = expected.groupBy(_._2._1).map { case (c, ms) =>
      c -> ms.toSeq.map { case (id, (_, cc)) => (cc, id) }.min._2
    }

    val out = Dedup.semanticDedup(df, "vec_id", "embedding", dim = 4,
      nBits = 3, threshold = threshold, kernel = "md5")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap

    out.keySet shouldBe expected.keySet
    expected.foreach { case (id, (cid, cc)) =>
      val (ocid, occ, okeep) = out(id)
      ocid shouldBe cid
      occ shouldBe cc +- 1e-9
      okeep shouldBe (keepOf(cid) == id)
    }
    // exactly one survivor per cluster, and the survivor rule bites:
    // every cluster with >1 member drops someone
    val clusters = out.values.groupBy(_._1)
    clusters.foreach { case (_, ms) =>
      ms.count(_._3) shouldBe 1
    }
    assert(clusters.exists(_._2.size > 1), "fixture must form a real cluster")
  }

  test("semanticDedup: corpus with no near pairs emits nothing") {
    import spark.implicits._
    val df = Seq(
      1L -> Seq(1.0, 0.0, 0.0, 0.0),
      2L -> Seq(0.0, 1.0, 0.0, 0.0),
      3L -> Seq(0.0, 0.0, 1.0, 0.0)).toDF("vec_id", "embedding")
    Dedup.semanticDedup(df, "vec_id", "embedding", dim = 4,
      nBits = 3, threshold = 0.999, kernel = "md5")
      .count() shouldBe 0L
  }

  test("semanticDedupKmeans: keep-farthest survivor per component in trained cells") {
    import spark.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val threshold = 0.95
    val k = 3; val iters = 2
    // sequential reference from the (already spec-covered) kmeans pieces:
    // model-centroid assignment, within-cell pairs, union-find, keep rule
    val model = Embeddings.kmeansTrain(df, "vec_id", "embedding", dim = 4,
      k = k, iters = iters).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val assign = vecs.map { case (id, v) =>
      id -> model.map { case (c, cv) =>
        (BigDecimal(cos(v, cv)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, c)
      }.maxBy { case (cc, c) => (cc, -c) }._2
    }.toMap
    val byId = vecs.toMap
    val pairs = for {
      (a, va) <- vecs; (b, vb) <- vecs
      if a < b && assign(a) == assign(b) && cos(va, vb) >= threshold
    } yield (a, b)
    val parent = collection.mutable.Map(vecs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val clusterOf = inPairs.map(id => id ->
      inPairs.filter(o => find(o) == find(id)).min).toMap
    val centById = model.toMap
    val expected = inPairs.map { id =>
      id -> ((clusterOf(id), cos(byId(id), centById(assign(id)))))
    }.toMap
    val keepOf = expected.groupBy(_._2._1).map { case (c, ms) =>
      c -> ms.toSeq.map { case (id, (_, cc)) => (cc, id) }.min._2
    }

    val out = Dedup.semanticDedupKmeans(df, "vec_id", "embedding", dim = 4,
      k = k, iters = iters, threshold = threshold)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    out.keySet shouldBe expected.keySet
    expected.foreach { case (id, (cid, cc)) =>
      val (ocid, occ, okeep) = out(id)
      ocid shouldBe cid
      occ shouldBe cc +- 1e-9
      okeep shouldBe (keepOf(cid) == id)
    }
    val clusters = out.values.groupBy(_._1)
    clusters.foreach { case (_, ms) => ms.count(_._3) shouldBe 1 }
    assert(clusters.exists(_._2.size > 1), "fixture must form a real cluster")
  }

  test("semanticDedupKmeansIncremental: whole-component re-decision from the frozen model") {
    import spark.implicits._
    // corpus: a +x chain (1–3–4 mutually near) and a +y pair (2, 5);
    // ids 1 and 2 lead so the k=2 seeds straddle both groups
    val corpus = Seq(
      1L -> Seq(1.0, 0.0, 0.0, 0.0),
      2L -> Seq(0.0, 1.0, 0.0, 0.0),
      3L -> Seq(0.99, 0.141, 0.0, 0.0),
      4L -> Seq(0.96, 0.28, 0.0, 0.0),
      5L -> Seq(0.0, 0.99, 0.1, 0.0)).toDF("vec_id", "embedding")
    // the new doc pairs with 3 and 4 but NOT with 1 (cos(100, 1) = 0.9
    // < 0.95): doc 1 joins the re-decided component only through its
    // OLD-OLD edges — the path a new-pairs-only incremental would lose
    val batch = Seq(100L -> Seq(0.9, 0.436, 0.0, 0.0))
      .toDF("vec_id", "embedding")
    val t = 0.95
    val model = Embeddings.kmeansTrain(corpus, "vec_id", "embedding",
      dim = 4, k = 2, iters = 2)
    val index = Dedup.semanticKmeansIndex(corpus, "vec_id", "embedding", model)
    val inc = Dedup.semanticDedupKmeansIncremental(batch, "vec_id",
        "embedding", model, index, threshold = t)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    // the touched component is re-decided WHOLE: old members included
    inc.keySet shouldBe Set(1L, 3L, 4L, 100L)
    inc.values.map(_._1).toSet shouldBe Set(1L) // cluster_id = min id
    // the untouched +y component (2, 5) keeps its prior decisions —
    // absent here even though it is a real duplicate pair in the corpus
    Dedup.semanticDedupKmeans(corpus, "vec_id", "embedding", dim = 4,
      k = 2, iters = 2, threshold = t)
      .filter(col("id").isin(2L, 5L)).count() shouldBe 2L
    // the new doc sits farthest from the trained centroid: it DISPLACES
    // the previous survivor (the SemDeDup diversity-edge keep rule)
    inc(100L)._3 shouldBe true
    Seq(1L, 3L, 4L).foreach(id => inc(id)._3 shouldBe false)
    inc(100L)._2 shouldBe Seq(1L, 3L, 4L, 100L).map(inc(_)._2).min
    // contract: equals the frozen-model rebuild over the union (same
    // model, empty index = everything is "new") restricted to
    // components containing a new id
    val rebuild = Dedup.semanticDedupKmeansIncremental(
        corpus.union(batch), "vec_id", "embedding", model,
        Dedup.semanticKmeansIndex(corpus.limit(0), "vec_id", "embedding",
          model), threshold = t)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    val newComps = rebuild.collect { case (id, (cid, _, _)) if id >= 100L => cid }.toSet
    rebuild.filter { case (_, (cid, _, _)) => newComps(cid) } shouldBe inc
    // and the all-new rebuild itself matches the one-shot operator run
    // with the same frozen model parameters on the union's +y component
    rebuild.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L, 100L)
  }

  test("semanticDedupKmeans: trained cells reunite a group raw LSH splits") {
    import spark.implicits._
    // two tight duplicate groups straddling random hyperplanes: k-means
    // with k=2 must put each group in one cell, so the pair search finds
    // EVERY over-threshold pair (recall-complete on this fixture)
    val g1 = (0L until 10L).map(i => (i, Seq(1.0, 0.001 * i, 0.0005 * i, 0.0)))
    val g2 = (10L until 20L).map(i =>
      (i, Seq(0.001 * (i - 10), 1.0, 0.0, 0.0005 * (i - 10))))
    val df = (g1 ++ g2).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupKmeans(df, "vec_id", "embedding", dim = 4,
      k = 2, iters = 2, threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every vector is in some >=0.999 pair within its own group; the two
    // components are exactly the groups
    out.keySet shouldBe (0L until 20L).toSet
    (0L until 10L).map(out) shouldBe Seq.fill(10)(0L)
    (10L until 20L).map(out) shouldBe Seq.fill(10)(10L)
  }
}
