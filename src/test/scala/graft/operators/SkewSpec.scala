package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain join and spreads hot keys over salts") {
    import spark.implicits._
    val facts = (1 to 1000).map(i => (i.toLong, if (i % 10 == 0) "cold" else "hot"))
      .toDF("id", "k")
    val dim = Seq(("hot", 1.0), ("cold", 2.0), ("unused", 3.0)).toDF("k", "v")

    val salted = Skew.saltedJoin(facts, dim, "k", col("id"), nSalts = 8)
      .select("id", "k", "v")
    val plain = facts.join(dim, Seq("k")).select("id", "k", "v")
    salted.count() shouldBe 1000
    salted.except(plain).count() shouldBe 0
    plain.except(salted).count() shouldBe 0

    // the hot key's rows actually occupy multiple salt buckets
    val saltSpread = facts.filter(col("k") === "hot")
      .select(pmod(xxhash64(col("id")), lit(8)).as("s"))
      .distinct().count()
    saltSpread should be > 4L
  }
}
