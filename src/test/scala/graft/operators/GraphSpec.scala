package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphSpec extends SparkSpec {

  /** Sequential reference: same unnormalized fixed-iteration recurrence. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    var r = nodes.map(_ -> 1.0).toMap
    (1 to iters).foreach { _ =>
      val contrib = edges.groupBy(_._2).map { case (v, in) =>
        v -> in.map { case (u, _) => r(u) / outdeg(u) }.sum
      }
      r = nodes.map(v => v -> ((1 - d) + d * contrib.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("pageRank matches the sequential recurrence on a small cyclic graph") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L))
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(edges, iters = 4)
    got.keySet shouldBe want.keySet
    want.foreach { case (id, r) => got(id) shouldBe (r +- 1e-9) }
    // the hub (3: two in-edges incl. the full weight of 2) outranks the
    // no-in-edge dangling-ish node 4
    got(3L) should be > got(4L)
    // a node with no in-edges settles at 1 − d
    got(4L) shouldBe (0.15 +- 1e-9)
  }

  test("pageRank treats duplicate rows as parallel edges") {
    import spark.implicits._
    // 1 has out-degree 3: twice to 2, once to 3 → 2 receives 2/3 of 1's rank
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L))
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got(2L) shouldBe (0.15 + 0.85 * (2.0 / 3.0) +- 1e-9)
    got(3L) shouldBe (0.15 + 0.85 * (1.0 / 3.0) +- 1e-9)
  }

  test("triangles: exact per-vertex counts, canonicalization, zeros included") {
    import spark.implicits._
    // K4 on 1..4 (every vertex in C(3,2)=3 triangles), a pendant 5, an
    // isolated edge 6-7; edges arrive messy: reversed, duplicated,
    // self-looped
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (3L, 4L),
      (2L, 4L), (4L, 2L), (4L, 5L), (6L, 7L), (3L, 3L))
    val got = Graph.triangles(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 0L, 6L -> 0L, 7L -> 0L)
  }

  test("triangles matches a brute-force count on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = (0 until 300).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    // brute force: all id-ordered vertex triples with all three edges
    val und = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for (a <- 0L until n; b <- a + 1 until n; c <- b + 1 until n)
      if (und((a, b)) && und((a, c)) && und((b, c))) {
        brute(a) += 1; brute(b) += 1; brute(c) += 1
      }
    val got = Graph.triangles(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val verts = und.flatMap(e => Seq(e._1, e._2))
    got shouldBe verts.map(v => v -> brute(v)).toMap
  }

  test("incremental triangle index equals a full rebuild over the union") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val n = 40
    val all = (0 until 400).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    // overlapping halves: the append must anti-join re-sent edges away
    val (base, extra) = (all.take(260), all.drop(220))
    val dir = java.nio.file.Files.createTempDirectory("graft-tri").toString
    Graph.trianglesIndexWrite(base.toDF("src", "dst"), "src", "dst", dir)
    // before the append, the index replays the base-only counts
    Graph.trianglesFromIndex(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Graph.triangles(base.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Graph.trianglesIndexAppend(extra.toDF("src", "dst"), "src", "dst", dir)
    val got = Graph.trianglesFromIndex(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Graph.triangles(all.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe want
    // a second append of ONLY already-known edges is a no-op
    Graph.trianglesIndexAppend(extra.take(50).toDF("src", "dst"),
      "src", "dst", dir)
    Graph.trianglesFromIndex(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe want
    // the coefficient face folds from the same index: equals the direct
    // batch operator over the union
    Graph.clusteringCoefFromIndex(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet shouldBe
      Graph.clusteringCoefficients(all.toDF("src", "dst"), "src", "dst")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
    // REBUILD at the same path: the stale batch channel from the
    // appends above must not fold into the fresh base (the reused-path
    // accumulation bug the sf0.01 gate caught in round 13)
    Graph.trianglesIndexWrite(base.toDF("src", "dst"), "src", "dst", dir)
    Graph.trianglesFromIndex(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Graph.triangles(base.toDF("src", "dst"), "src", "dst")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("triangle index deletion equals rebuild over survivors; compact folds history") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val n = 40
    val all = (0 until 400).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val victims = all.filter { case (a, b) => (a + b) % 5 == 1 }
    val survivors = all.filterNot { case (a, b) =>
      math.min(a, b) != math.max(a, b) && (a + b) % 5 == 1 }
      .filter { case (a, b) => a != b }
    val dir = java.nio.file.Files.createTempDirectory("graft-tridel").toString
    Graph.trianglesIndexWrite(all.take(200).toDF("src", "dst"),
      "src", "dst", dir)
    Graph.trianglesIndexAppend(all.drop(200).toDF("src", "dst"),
      "src", "dst", dir)
    // the deletion sweep covers triangles with 1, 2, and 3 deleted
    // edges (random graph + arithmetic victim predicate); deleting an
    // absent edge is a no-op
    Graph.trianglesIndexDelete(
      (victims :+ (998L, 999L)).toDF("src", "dst"), "src", "dst", dir)
    val want = Graph.triangles(survivors.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def got() = Graph.trianglesFromIndex(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got() shouldBe want
    // a RE-ADD after the deletion restores exactly the union counts
    // (edge membership folds by batch order)
    Graph.trianglesIndexAppend(victims.toDF("src", "dst"), "src", "dst", dir)
    val wantAll = Graph.triangles(all.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got() shouldBe wantAll
    // delete again, compact: history physically folded, probe unchanged
    Graph.trianglesIndexDelete(victims.toDF("src", "dst"), "src", "dst", dir)
    Graph.trianglesIndexCompact(spark, dir)
    new java.io.File(s"$dir/batches").exists() shouldBe false
    new java.io.File(s"$dir/base_next").exists() shouldBe false
    got() shouldBe want
    spark.read.parquet(s"$dir/counts")
      .filter(col("d_triangles") <= 0L).count() shouldBe 0L
    // a delete of ONLY absent edges stages nothing — committing an
    // empty removals batch would demote every later read from the
    // plain-union fast path to the per-edge fold
    Graph.trianglesIndexDelete(Seq((998L, 999L)).toDF("src", "dst"),
      "src", "dst", dir)
    new java.io.File(s"$dir/batches").exists() shouldBe false
    got() shouldBe want
    // crashed compaction: faces fail loudly; takeover re-run recovers
    Graph.trianglesIndexDelete(all.take(3).toDF("src", "dst"),
      "src", "dst", dir)
    intercept[RuntimeException] {
      AtomicBatches.withMaintenanceLock(spark, dir, takeover = false) {
        throw new RuntimeException("simulated crash")
      }
    }
    intercept[IllegalArgumentException] {
      Graph.trianglesFromIndex(spark, dir).collect()
    }.getMessage should include ("_MAINT")
    intercept[IllegalArgumentException] {
      Graph.trianglesIndexAppend(all.take(3).toDF("src", "dst"),
        "src", "dst", dir)
    }.getMessage should include ("_MAINT")
    Graph.trianglesIndexCompact(spark, dir, takeover = true)
    got() shouldBe Graph.triangles(
        survivors.filterNot(e => all.take(3)
          .map(x => (math.min(x._1, x._2), math.max(x._1, x._2)))
          .contains((math.min(e._1, e._2), math.max(e._1, e._2))))
          .toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("incremental triangle index equals rebuild across random split ratios") {
    import spark.implicits._
    // the once-per-triangle attribution must hold whatever mix of
    // 1/2/3-new-edge triangles a split produces — sweep three seeds and
    // three base/batch ratios, including a batch LARGER than the base
    for ((seed, cut) <- Seq((3, 40), (23, 150), (47, 260))) {
      val rnd = new scala.util.Random(seed)
      val n = 30
      val all = (0 until 300).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-tri-$seed").toString
      Graph.trianglesIndexWrite(
        all.take(cut).toDF("src", "dst"), "src", "dst", dir)
      Graph.trianglesIndexAppend(
        all.drop(cut).toDF("src", "dst"), "src", "dst", dir)
      withClue(s"seed=$seed cut=$cut: ") {
        Graph.trianglesFromIndex(spark, dir)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
          Graph.triangles(all.toDF("src", "dst"), "src", "dst")
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
    }
  }

  /** Sequential PPR reference: same seeded recurrence. */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Set[Long], iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    var r = nodes.map(v => v -> (if (seeds(v)) 1.0 else 0.0)).toMap
    (1 to iters).foreach { _ =>
      val contrib = edges.groupBy(_._2).map { case (v, in) =>
        v -> in.map { case (u, _) => r(u) / outdeg(u) }.sum
      }
      r = nodes.map(v => v ->
        ((if (seeds(v)) 1 - d else 0.0) + d * contrib.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("personalizedPageRank: mass stays near seeds, unreachable nodes score 0") {
    import spark.implicits._
    // seed component (cycle 1→2→3→1 with an offshoot 3→4) plus a
    // disconnected cycle 10↔11 the walk can never reach
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (10L, 11L), (11L, 10L))
    val got = Graph.personalizedPageRank(edges.toDF("src", "dst"),
      "src", "dst", seeds = Seq(1L), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPpr(edges, Set(1L), iters = 4)
    got.keySet shouldBe want.keySet
    want.foreach { case (id, r) => got(id) shouldBe (r +- 1e-9) }
    // unreachable component: exactly zero, not merely small
    got(10L) shouldBe 0.0
    got(11L) shouldBe 0.0
    // every node the walk can reach carries positive mass (note the
    // seed itself need NOT outrank its successors: with outdeg(1)=1 the
    // whole rank flows to node 2 each round and only the 0.15 restart
    // stays home — mass measures walk proximity, not the seed label)
    Seq(1L, 2L, 3L, 4L).foreach(id => got(id) should be > 0.0)
  }

  test("clusteringCoefficients: clique interiors score 1, bridges score low") {
    import spark.implicits._
    // 4-clique {1,2,3,4} + path 4-5-6 + pendant 1-7 (the kCore fixture)
    val clique = for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)
    val df = (clique ++ Seq((4L, 5L), (5L, 6L), (1L, 7L))).toDF("src", "dst")
    val got = Graph.clusteringCoefficients(df, "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // pure clique interiors: all 3 neighbor pairs linked
    got(2L) shouldBe ((3L, 3L, 1.0))
    got(3L) shouldBe ((3L, 3L, 1.0))
    // clique members carrying an extra bridge: 3 of C(4,2)=6 pairs
    got(1L) shouldBe ((3L, 4L, 0.5))
    got(4L) shouldBe ((3L, 4L, 0.5))
    // path interior: two unlinked neighbors
    got(5L) shouldBe ((0L, 2L, 0.0))
    // leaves: degree < 2 defines coefficient 0
    got(6L) shouldBe ((0L, 1L, 0.0))
    got(7L) shouldBe ((0L, 1L, 0.0))
  }

  test("kCore peels pendants and chains, keeps the dense core") {
    import spark.implicits._
    // 4-clique {1,2,3,4} + path 4-5-6 + pendant 1-7; reversed and
    // duplicate rows must collapse to one undirected edge
    val clique = for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)
    val edges = clique ++ Seq((4L, 5L), (5L, 6L), (1L, 7L),
      (2L, 1L), (3L, 1L)) // reversed duplicates of clique edges
    val df = edges.toDF("src", "dst")
    // 2-core: the path/pendant peel away (6 and 7 have degree 1, then
    // 5 drops to 1) — only the clique survives, each with core_deg 3
    val core2 = Graph.kCore(df, "src", "dst", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    core2 shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
    // 3-core: same (clique degrees are exactly 3)
    Graph.kCore(df, "src", "dst", k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe core2
    // 4-core: empty (max degree in the canonical graph is 5 for nodes
    // 1 and 4, but removing the others cascades everything away)
    Graph.kCore(df, "src", "dst", k = 4).count() shouldBe 0L
  }

  test("kCore cascade: a long chain needs one round per link and maxRounds is loud") {
    import spark.implicits._
    // triangle {0,1,2} with a 6-link tail off node 2: k=2 peels the
    // tail one link per synchronous round (the worst-case cascade)
    val tail = (2L until 8L).map(i => (i, i + 1))
    val df = (Seq((0L, 1L), (1L, 2L), (0L, 2L)) ++ tail).toDF("src", "dst")
    val got = Graph.kCore(df, "src", "dst", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(0L -> 2L, 1L -> 2L, 2L -> 2L)
    // the same peel under an insufficient bound fails LOUDLY rather
    // than returning a half-peeled graph
    an[Exception] should be thrownBy
      Graph.kCore(df, "src", "dst", k = 2, maxRounds = 2).count()
  }

  test("kCore matches a sequential peel on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val n = 60
    val edges = (0 until 240).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val df = edges.toDF("src", "dst")
    // sequential reference peel
    var und = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val k = 3
    var changed = true
    while (changed) {
      val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (v, xs) => v -> xs.size }
      val next = und.filter(e => deg(e._1) >= k && deg(e._2) >= k)
      changed = next != und
      und = next
    }
    val wantDeg = und.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    val got = Graph.kCore(df, "src", "dst", k = k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe wantDeg
  }

  test("pageRank is deterministic across runs") {
    import spark.implicits._
    val edges = (0L until 200L).map(i => (i, (i * 7 + 3) % 200)) ++
      (0L until 200L).map(i => (i, (i * 13 + 1) % 200))
    val df = edges.toDF("src", "dst")
    // compare at the oracle's rounding: partial-sum merge order may
    // differ run to run in the last ulps
    def run() = Graph.pageRank(df, "src", "dst", iters = 5)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e6)))
      .sortBy(_._1)
    run() shouldBe run()
  }
}
