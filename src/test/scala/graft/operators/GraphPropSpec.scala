package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property checks of the distributed algorithms against simple
  * sequential references (explicit-seed Gen sampling, same style as
  * ConservationPropSpec) — the cheap way to catch propagation and
  * merge-order bugs that fixed examples miss.
  */
class GraphPropSpec extends SparkSpec {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.groupBy(find).flatMap { case (_, ns) => ns.map(_ -> ns.min) }
  }

  test("connectedComponents equals union-find on random graphs") {
    import spark.implicits._
    val edgeGen = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 20L), Gen.choose(0L, 20L)))
    (1 to 8).foreach { i =>
      val edges = edgeGen(Gen.Parameters.default, Seed(1000L + i)).get
        .filter(p => p._1 != p._2)
      val df = edges.toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(df, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"seed ${1000 + i}: ") { got shouldBe unionFind(edges) }
    }
  }

  test("incrementalConnectedComponents: untouched labels pass through, affected merge") {
    import spark.implicits._
    // {5,6} carries a SENTINEL non-min label 99: a recompute would
    // relabel it to 5, so 99 surviving proves untouched components are
    // passed through rather than rewritten
    val oldLabels = Seq((1L, 1L), (2L, 1L), (5L, 99L), (6L, 99L),
      (10L, 10L), (11L, 10L)).toDF("id", "cluster_id")
    // new docs 20,21: 20 touches component 1 (via 2), 21 bridges it with
    // component 10 — two old components merge through the new batch
    val newPairs = Seq((2L, 20L), (20L, 21L), (10L, 21L)).toDF("id_a", "id_b")
    val got = Dedup.incrementalConnectedComponents(oldLabels, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got(5L) shouldBe 99L
    got(6L) shouldBe 99L
    Seq(1L, 2L, 10L, 11L, 20L, 21L).foreach(id => got(id) shouldBe 1L)
    got.size shouldBe 8
  }

  test("incrementalConnectedComponents equals full rebuild on random graphs") {
    import spark.implicits._
    val gen = Gen.zip(
      Gen.listOfN(20, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L))),
      Gen.listOfN(8, Gen.zip(Gen.choose(0L, 25L), Gen.choose(16L, 25L))))
    (1 to 8).foreach { i =>
      val (oldE, newE) = gen(Gen.Parameters.default, Seed(5000L + i)).get
      val oldEdges = oldE.filter(p => p._1 != p._2)
      val newEdges = newE.filter(p => p._1 != p._2)
      val oldLabels = unionFind(oldEdges).toSeq.toDF("id", "cluster_id")
      val got = Dedup.incrementalConnectedComponents(
          oldLabels, newEdges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      withClue(s"seed ${5000 + i}: ") {
        got shouldBe unionFind(oldEdges ++ newEdges)
      }
    }
  }

  test("topKByScore equals sort-take on random inputs across partitions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rowGen = Gen.listOfN(60,
      Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 30L), Gen.choose(0, 5)))
    (1 to 8).foreach { i =>
      // coarse scores force ties → exercises the (score desc, id asc) tiebreak
      val rows = rowGen(Gen.Parameters.default, Seed(2000L + i)).get
        .map { case (g, id, s) => (g, id, s / 5.0) }
      val got = rows.toDF("g", "id", "s").repartition(5)
        .groupBy("g")
        .agg(graft.functions.Aggregators.topKByScore(col("id"), col("s"), 4).as("t"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => (p.getLong(0), p.getDouble(1))))
        .toMap
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val ref = grp.map(t => (t._2, t._3)).sortBy { case (id, s) => (-s, id) }.take(4)
        withClue(s"seed ${2000 + i}, group $g: ") { got(g) shouldBe ref }
      }
    }
  }

  test("hammingPairs equals all-pairs hamming on random 64-bit signatures") {
    import spark.implicits._
    val sigGen = Gen.listOfN(40, Gen.choose(Long.MinValue, Long.MaxValue))
    (1 to 6).foreach { i =>
      // half the sigs get a near-duplicate (≤ maxHamming bit flips) so the
      // positive set is non-trivial
      val base = sigGen(Gen.Parameters.default, Seed(3000L + i)).get
      val sigs = base.zipWithIndex.map { case (s, j) =>
        (j.toLong, if (j % 2 == 1) base(j - 1) ^ (1L << (j % 64)) else s)
      }
      val got = Dedup.hammingPairs(sigs.toDF("id", "sig"), "id", "sig",
          maxHamming = 3)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val ref = (for {
        a <- sigs; b <- sigs if a._1 < b._1
        if java.lang.Long.bitCount(a._2 ^ b._2) <= 3
      } yield (a._1, b._1)).toSet
      withClue(s"seed ${3000 + i}: ") { got shouldBe ref }
    }
  }

  test("chunkTokens reassembles to the original token stream") {
    import spark.implicits._
    val docGen = Gen.listOfN(12, Gen.choose(0, 40).map(n =>
      (1 to n).map(k => s"t$k").mkString(" ")))
    (1 to 5).foreach { i =>
      val texts = docGen(Gen.Parameters.default, Seed(4000L + i)).get
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val size = 7 + i; val overlap = i // varies per round, overlap < size
      val chunks = TrainingData.chunkTokens(docs, "doc_id", "text", size, overlap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .groupBy(_._1)
      texts.zipWithIndex.foreach { case (t, j) =>
        val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
        val got = chunks.get(j.toLong).map { rows =>
          val ordered = rows.sortBy(_._2).map(_._3.split(" ").toSeq)
          // chunk 0 whole, then each chunk minus its `overlap`-token echo
          (ordered.head ++ ordered.tail.flatMap(_.drop(overlap))).toSeq
        }.getOrElse(Seq.empty)
        withClue(s"seed ${4000 + i}, doc $j (n=${toks.size}): ") {
          got shouldBe toks
        }
      }
    }
  }
}
