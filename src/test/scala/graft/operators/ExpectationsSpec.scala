package graft.operators

import org.apache.spark.sql.functions.col
import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import Expectations._

  // 2 null ids, one out-of-range v, one bad flag, one duplicated key
  // pair, one dangling FK
  private lazy val df = Seq(
    (Some(1L), 10.0, "A"), (Some(1L), 10.0, "A"), // duplicate key 1
    (None: Option[Long], 5.0, "A"), (None: Option[Long], 5.0, "N"),
    (Some(2L), 99.0, "A"),   // out of range
    (Some(3L), 7.0, "X"),    // bad flag
    (Some(9L), 1.0, "N")     // id 9 not in dim
  ).toDF("id", "v", "flag")
  private lazy val dim = Seq(1L, 2L, 3L).toDF("dim_id")

  test("check reports exact violation counts per rule kind") {
    val r = check(df, Seq(
      NotNull("id"),
      InRange("v", 0.0, 50.0),
      Accepted("flag", Seq("A", "N")),
      Predicate("v_positive", col("v") <= 0.0),
      Unique(Seq("id")),
      RefIntegrity("id", dim, "dim_id")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    r("id_not_null") shouldBe ((2L, false))
    r("v_in_range") shouldBe ((1L, false))
    r("flag_accepted") shouldBe ((1L, false))
    r("v_positive") shouldBe ((0L, true))
    // duplicate groups: id=1 twice (1 surplus) and id=NULL twice
    // (1 surplus — groupBy treats NULL as a real key, matching SQL
    // GROUP BY; document by asserting it)
    r("id_unique") shouldBe ((2L, false))
    r("id_ref_integrity") shouldBe ((1L, false))
  }

  test("a clean table passes every rule") {
    val clean = Seq((1L, 1.0, "A"), (2L, 2.0, "N")).toDF("id", "v", "flag")
    val r = check(clean, Seq(NotNull("id"), InRange("v", 0.0, 5.0),
      Unique(Seq("id")), RefIntegrity("id", dim, "dim_id")))
    r.collect().foreach(_.getBoolean(2) shouldBe true)
  }

  test("all row-level rules fuse into one aggregation over one scan") {
    val plan = check(df, Seq(NotNull("id"), InRange("v", 0.0, 50.0),
      Accepted("flag", Seq("A")), Predicate("p", col("v") < 0)))
      .queryExecution.executedPlan.toString
    // a single scan feeding a single partial/final aggregate pair —
    // no per-rule passes
    "LocalTableScan".r.findAllIn(plan).size should be <= 1
  }
}
