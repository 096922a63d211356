package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")

  // k1: gold → gold (compresses) → silver → gold; k2: one observation;
  // k3: null → "x" → null (null-safe change detection)
  private lazy val updates = Seq(
    (1L, 1L, Some("gold"), ts(1)), (1L, 2L, Some("gold"), ts(2)),
    (1L, 3L, Some("silver"), ts(3)), (1L, 4L, Some("gold"), ts(4)),
    (2L, 5L, Some("bronze"), ts(1)),
    (3L, 6L, None: Option[String], ts(1)), (3L, 7L, Some("x"), ts(2)),
    (3L, 8L, None: Option[String], ts(3))
  ).toDF("k", "id", "tier", "ts")

  test("history compresses unchanged observations into versions with validity ranges") {
    val h = Scd2.history(updates, Seq("k"), "ts", "id", Seq("tier"))
      .orderBy("k", "effective_from").collect()
      .map(r => (r.getLong(0), r.getAs[String]("tier"),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5)))
    h.toSeq shouldBe Seq(
      (1L, "gold", ts(1), Some(ts(3)), false), // ts(2) repeat compressed
      (1L, "silver", ts(3), Some(ts(4)), false),
      (1L, "gold", ts(4), None, true),
      (2L, "bronze", ts(1), None, true),
      (3L, null, ts(1), Some(ts(2)), false), // null -> x is a change
      (3L, "x", ts(2), Some(ts(3)), false),
      (3L, null, ts(3), None, true)          // x -> null is a change
    )
  }

  test("validity ranges tile each key's timeline without gaps") {
    val h = Scd2.history(updates, Seq("k"), "ts", "id", Seq("tier"))
      .orderBy("k", "effective_from").collect()
    h.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      rows.sliding(2).foreach {
        case Array(a, b) => a.getTimestamp(4) shouldBe b.getTimestamp(3)
        case _ =>
      }
      rows.last.getBoolean(5) shouldBe true
      rows.init.foreach(_.getBoolean(5) shouldBe false)
    }
  }

  test("current() is the type-1 snapshot: exactly one row per key") {
    val cur = Scd2.current(
      Scd2.history(updates, Seq("k"), "ts", "id", Seq("tier")))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("tier")).toMap
    cur shouldBe Map(1L -> "gold", 2L -> "bronze", 3L -> null)
  }

  test("property: history equals a sequential reference on random change streams") {
    val rnd = new scala.util.Random(11)
    val tiers = Vector("g", "s", "b", null)
    (1 to 5).foreach { trial =>
      val obs = (1 to 200).map { i =>
        (rnd.nextInt(15).toLong, i.toLong, tiers(rnd.nextInt(tiers.size)),
          ts(1 + rnd.nextInt(18)))
      }
      // sequential reference: per key, order by (ts, id), keep rows where
      // the attr differs (null-safe) from the previous KEPT-OR-NOT row's
      // attr (lag over ALL observations, as the operator filters before
      // versioning), then lead() over the kept rows
      val expect = obs.groupBy(_._1).toSeq.flatMap { case (k, us) =>
        val sorted = us.sortBy(e => (e._4.getTime, e._2))
        val changed = sorted.zipWithIndex.filter { case (e, i) =>
          i == 0 || sorted(i - 1)._3 != e._3
        }.map(_._1)
        changed.zipWithIndex.map { case (e, i) =>
          val to = if (i + 1 < changed.size) Some(changed(i + 1)._4) else None
          (k, e._2, e._3, e._4, to, to.isEmpty)
        }
      }.toSet
      val got = Scd2.history(
        obs.toDF("k", "id", "tier", "ts"), Seq("k"), "ts", "id", Seq("tier"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getAs[String]("tier"), r.getTimestamp(3),
          Option(r.getTimestamp(4)), r.getBoolean(5))).toSet
      withClue(s"trial $trial: ") { got shouldBe expect }
    }
  }

  test("pointInTime joins each fact to the version valid at its timestamp") {
    import org.apache.spark.sql.functions.col
    val hist = Scd2.history(updates, Seq("k"), "ts", "id", Seq("tier"))
    // facts straddling k1's versions: before any version, inside each,
    // exactly on a boundary (belongs to the STARTING version), and a
    // key with no history
    val facts = Seq(
      (1L, 100L, ts(0)), // before k1's first version -> null dim
      (1L, 101L, ts(2)), // inside gold [1,3)
      (1L, 102L, ts(3)), // boundary: silver starts at 3
      (1L, 103L, ts(9)), // open-ended current gold
      (9L, 104L, ts(5))  // no history for k=9
    ).toDF("k", "fact_id", "ts")
    val r = Scd2.pointInTime(facts, hist, Seq("k"), "ts")
      .select(col("fact_id"), col("dim_tier"), col("dim_is_current"))
      .collect().map(x => x.getLong(0) ->
        (x.getAs[String]("dim_tier"), Option(x.get(2)))).toMap
    r(100L) shouldBe ((null, None))
    r(101L) shouldBe (("gold", Some(false)))
    r(102L) shouldBe (("silver", Some(false)))
    r(103L) shouldBe (("gold", Some(true)))
    r(104L) shouldBe ((null, None))
    // tiling ⇒ no fan-out: one output row per fact
    Scd2.pointInTime(facts, hist, Seq("k"), "ts").count() shouldBe 5L
  }

  test("both windows share one partitioning: a single Exchange in the plan") {
    val plan = Scd2.history(updates, Seq("k"), "ts", "id", Seq("tier"))
      .queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(plan).size shouldBe 1
  }
}
