package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Property checks of the round-4 scale-path rewrites (grouped quantile,
  * shard packing, stratified bottom-k) against simple sequential
  * references — the rewrites replaced window formulations with
  * partition-offset / bounded-aggregation machinery, which is exactly the
  * kind of code where merge-order and off-by-one bugs hide.
  */
class ScalePathPropSpec extends SparkSpec {

  test("groupedExactQuantile equals the percentile aggregate on random data") {
    import spark.implicits._
    val rowGen = Gen.listOfN(120, Gen.zip(
      Gen.oneOf("a", "b", "c", "d"),
      Gen.option(Gen.choose(-100.0, 100.0))))
    (1 to 6).foreach { i =>
      val rows = rowGen(Gen.Parameters.default, Seed(7000L + i)).get
      val p = Seq(0.0, 0.25, 0.5, 0.9, 1.0)(i % 5)
      val df = rows.toDF("g", "v").repartition(7)
      val got = Quantiles.groupedExactQuantile(df, Seq("g"), "v", p)
        .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
      val expect = rows.groupBy(_._1).map { case (g, rs) =>
        val vs = rs.flatMap(_._2).sorted
        g -> (if (vs.isEmpty) None else {
          val pos = p * (vs.length - 1)
          val lo = vs(math.floor(pos).toInt)
          val hi = vs(math.ceil(pos).toInt)
          Some(lo + (pos - math.floor(pos)) * (hi - lo))
        })
      }
      withClue(s"seed ${7000 + i} p=$p: ") {
        got.keySet shouldBe expect.keySet
        expect.foreach { case (g, e) =>
          (got(g), e) match {
            case (Some(a), Some(b)) =>
              a.asInstanceOf[Double] shouldBe b +- 1e-9
            case (a, b) => a.isEmpty shouldBe b.isEmpty
          }
        }
      }
    }
  }

  test("packShards equals the sequential running-sum reference") {
    import spark.implicits._
    val rowGen = Gen.listOfN(80, Gen.zip(
      Gen.choose(0L, 1000000L), Gen.choose(0, 40)))
    (1 to 6).foreach { i =>
      val raw = rowGen(Gen.Parameters.default, Seed(8000L + i)).get
        .distinctBy(_._1) // unique ids: the layout contract
      val budget = Seq(5L, 17L, 64L, 200L)(i % 4)
      val rows = raw.map { case (id, n) => (id, List.fill(n)("w").mkString(" ")) }
      val df = rows.toDF("id", "text").repartition(9)
      val got = TrainingData.packShards(df, "id", "text", budget)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      var before = 0L
      val expect = raw.sortBy(_._1).map { case (id, n) =>
        val shard = before / budget
        before += n
        id -> shard
      }.toMap
      withClue(s"seed ${8000 + i} budget=$budget: ") { got shouldBe expect }
    }
  }

  test("shufflePositions equals the sequential md5-rank reference") {
    import spark.implicits._
    val idGen = Gen.listOfN(70, Gen.choose(-1000000L, 1000000L))
    (1 to 6).foreach { i =>
      val ids = idGen(Gen.Parameters.default, Seed(9500L + i)).get.distinct
      val seed = s"prop$i"
      val df = ids.toDF("id").repartition(9)
      val got = TrainingData.shufflePositions(df, "id", seed)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val md = java.security.MessageDigest.getInstance("MD5")
      def key(id: Long) =
        md.digest(s"$seed $id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val expect = ids.sortBy(id => (key(id), id)).zipWithIndex
        .map { case (id, p) => id -> p.toLong }.toMap
      withClue(s"seed ${9500 + i}: ") { got shouldBe expect }
    }
  }

  test("stratifiedSample equals sequential bottom-n per stratum") {
    import spark.implicits._
    val rowGen = Gen.listOfN(90, Gen.zip(
      Gen.choose(0L, 500L), Gen.oneOf("en", "de", "fr")))
    (1 to 6).foreach { i =>
      val raw = rowGen(Gen.Parameters.default, Seed(9000L + i)).get
        .distinctBy(_._1)
      val n = 1 + i
      val df = raw.toDF("id", "lang").repartition(8)
      val got = Sampling.stratifiedSample(df, Seq("lang"), "id", n)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      def md5hex(s: String): String = {
        val d = java.security.MessageDigest.getInstance("MD5")
        d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
      val expect = raw.groupBy(_._2).flatMap { case (lang, rs) =>
        rs.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(n)
          .map(id => (id, lang))
      }.toSet
      withClue(s"seed ${9000 + i} n=$n: ") { got shouldBe expect }
    }
  }
}
