package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private lazy val vecs = {
    import spark.implicits._
    // unit-ish vectors at varying angles from e1
    Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.99, 0.14, 0.0, 0.0)),
      (2L, Seq(0.7, 0.7, 0.0, 0.0)),
      (3L, Seq(0.0, 1.0, 0.0, 0.0)),
      (4L, Seq(-1.0, 0.0, 0.0, 0.0)),
      (5L, Seq(0.9, -0.43, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
  }

  test("bruteForceTopK ranks by cosine desc and limits to k") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val r = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 3)
      .collect().map(_.getLong(0))
    r.head shouldBe 0L      // the query vector itself
    r.length shouldBe 3
    r(1) shouldBe 1L        // closest neighbor
  }

  test("annTopK with wide probe matches brute force top result") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val ann = Similarity.annTopK(vecs, "vec_id", "embedding", q, k = 3,
      dim = 4, nBits = 8, probeHamming = 8) // probe all buckets = exact
    ann.collect().map(_.getLong(0)).toSeq shouldBe
      Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 3)
        .collect().map(_.getLong(0)).toSeq
  }

  test("ivfTopK with all cells probed equals brute force") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val ivf = Similarity.ivfTopK(vecs, "vec_id", "embedding", q, k = 3,
      dim = 4, nBits = 2, nProbe = 4) // 2^2 cells, probe all
    ivf.collect().map(_.getLong(0)).toSeq shouldBe
      Similarity.bruteForceTopK(vecs, "vec_id", "embedding", q, 3)
        .collect().map(_.getLong(0)).toSeq
  }

  test("ivfTopK with narrow probe still finds the query's own cell") {
    val q = Seq(1.0, 0.0, 0.0, 0.0)
    val r = Similarity.ivfTopK(vecs, "vec_id", "embedding", q, k = 1,
      dim = 4, nBits = 2, nProbe = 1).collect()
    r.head.getLong(0) shouldBe 0L
  }

  test("neighborsWithinBuckets returns at most k per id, ranked") {
    val r = Similarity.neighborsWithinBuckets(vecs, "vec_id", "embedding",
      dim = 4, k = 2, nBits = 2)
    val byA = r.collect().groupBy(_.getAs[Long]("id_a"))
    byA.values.foreach { rowsOfA =>
      rowsOfA.length should be <= 2
      rowsOfA.map(_.getAs[Int]("rank")).sorted shouldBe (1 to rowsOfA.length)
    }
  }
}
