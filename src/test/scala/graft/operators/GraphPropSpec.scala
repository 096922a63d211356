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
}
