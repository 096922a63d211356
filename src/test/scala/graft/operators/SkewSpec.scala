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

  test("adaptiveSaltedJoin salts above the ratio threshold, plain below — same rows either way") {
    import spark.implicits._
    val facts = (1 to 1000).map(i => (i.toLong, if (i % 10 == 0) "cold" else "hot"))
      .toDF("id", "k")
    val dim = Seq(("hot", 1.0), ("cold", 2.0)).toDF("k", "v")
    // 2 keys, 1000 rows, max 900 → ratio 1.8; threshold 1.5 salts,
    // threshold 4 does not
    val (salted, r1) = Skew.adaptiveSaltedJoin(facts, dim, "k", col("id"),
      nSalts = 8, skewRatioThreshold = 1.5)
    r1 shouldBe 1.8 +- 1e-9
    salted.queryExecution.executedPlan.toString should include("__salt")
    val (plain, r2) = Skew.adaptiveSaltedJoin(facts, dim, "k", col("id"),
      nSalts = 8, skewRatioThreshold = 4.0)
    r2 shouldBe 1.8 +- 1e-9
    plain.queryExecution.executedPlan.toString should not include "__salt"
    val expect = facts.join(dim, Seq("k")).select("id", "k", "v")
    salted.select("id", "k", "v").except(expect).count() shouldBe 0
    expect.except(salted.select("id", "k", "v")).count() shouldBe 0
    plain.select("id", "k", "v").collect().length shouldBe 1000
    // empty fact side: ratio 0, plain join, no rows
    val (emptyJ, r0) = Skew.adaptiveSaltedJoin(facts.limit(0), dim, "k",
      col("id"), nSalts = 8)
    r0 shouldBe 0.0
    emptyJ.count() shouldBe 0L
  }
}
