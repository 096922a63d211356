package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof carries the latest right row at-or-before each left ts, per key") {
    import spark.implicits._
    val trades = Seq(
      ("A", ts("2026-01-01 10:00:00"), 1L),
      ("A", ts("2026-01-01 10:05:00"), 2L),
      ("A", ts("2026-01-01 09:00:00"), 3L), // before any quote
      ("B", ts("2026-01-01 10:00:00"), 4L)
    ).toDF("sym", "ts", "trade_id")
    val quotes = Seq(
      ("A", ts("2026-01-01 09:59:00"), 100.0),
      ("A", ts("2026-01-01 10:05:00"), 101.0), // equal-ts: visible to trade 2
      ("B", ts("2026-01-01 09:00:00"), 200.0)
    ).toDF("sym", "ts", "px")

    val out = AsofJoin.asof(trades, quotes, "sym", "ts", Seq("px"))
      .collect().map(r => r.getAs[Long]("trade_id") -> Option(r.getAs[Any]("px"))).toMap
    out(1L) shouldBe Some(100.0)
    out(2L) shouldBe Some(101.0) // <= includes the equal timestamp
    out(3L) shouldBe None        // nothing before 09:00
    out(4L) shouldBe Some(200.0) // keys don't leak across
  }

  test("asof carries the most recent right ROW even when its value is null") {
    import spark.implicits._
    // the latest quote has a null px: the left row must see that null,
    // NOT an older row's non-null px spliced in
    val left = Seq(("k", ts("2026-01-01 00:10:00"), 1)).toDF("k", "ts", "i")
    val right = Seq(
      ("k", ts("2026-01-01 00:01:00"), Some(9.0)),
      ("k", ts("2026-01-01 00:05:00"), Option.empty[Double]))
      .toDF("k", "ts", "v")
    val out = AsofJoin.asof(left, right, "k", "ts", Seq("v")).head()
    Option(out.getAs[Any]("v")) shouldBe None
  }

  test("asof ties on (key, ts) resolve deterministically to the greatest values") {
    import spark.implicits._
    val left = Seq(("k", ts("2026-01-01 00:10:00"), 1)).toDF("k", "ts", "i")
    val right = Seq(
      ("k", ts("2026-01-01 00:05:00"), 1.0),
      ("k", ts("2026-01-01 00:05:00"), 7.0),
      ("k", ts("2026-01-01 00:05:00"), 3.0)).toDF("k", "ts", "v")
    (1 to 3).foreach { _ =>
      AsofJoin.asof(left, right, "k", "ts", Seq("v"))
        .head().getAs[Double]("v") shouldBe 7.0
    }
  }

  test("asofForward carries the earliest right row at-or-after each left ts") {
    import spark.implicits._
    val events = Seq(
      ("A", ts("2026-01-01 10:00:00"), 1L),
      ("A", ts("2026-01-01 10:06:00"), 2L), // after the last quote → null
      ("B", ts("2026-01-01 08:00:00"), 3L)
    ).toDF("sym", "ts", "event_id")
    val quotes = Seq(
      ("A", ts("2026-01-01 10:00:00"), 100.0), // equal-ts: visible to event 1
      ("A", ts("2026-01-01 10:05:00"), 101.0),
      ("B", ts("2026-01-01 09:00:00"), 200.0)
    ).toDF("sym", "ts", "px")
    val out = AsofJoin.asofForward(events, quotes, "sym", "ts", Seq("px"))
      .collect().map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Any]("px"))).toMap
    out(1L) shouldBe Some(100.0) // >= includes the equal timestamp
    out(2L) shouldBe None        // nothing after
    out(3L) shouldBe Some(200.0)
  }

  test("asofForward ties on (key, ts) resolve deterministically to the smallest values") {
    import spark.implicits._
    val left = Seq(("k", ts("2026-01-01 00:01:00"), 1)).toDF("k", "ts", "i")
    val right = Seq(
      ("k", ts("2026-01-01 00:05:00"), 7.0),
      ("k", ts("2026-01-01 00:05:00"), 1.0),
      ("k", ts("2026-01-01 00:05:00"), 3.0)).toDF("k", "ts", "v")
    (1 to 3).foreach { _ =>
      AsofJoin.asofForward(left, right, "k", "ts", Seq("v"))
        .head().getAs[Double]("v") shouldBe 1.0
    }
  }

  test("null timestamps never match: right nulls dropped, left nulls carry null") {
    import spark.implicits._
    val left = Seq(
      ("k", Some(ts("2026-01-01 00:10:00")), 1),
      ("k", Option.empty[Timestamp], 2) // null left ts → no match
    ).toDF("k", "ts", "i")
    val right = Seq(
      ("k", Option.empty[Timestamp], 99.0), // null right ts → never carried
      ("k", Some(ts("2026-01-01 00:05:00")), 5.0)
    ).toDF("k", "ts", "v")
    for (dir <- Seq("backward", "forward")) {
      val out = (if (dir == "backward") AsofJoin.asof(left, right, "k", "ts", Seq("v"))
        else AsofJoin.asofForward(left, right, "k", "ts", Seq("v")))
        .collect().map(r => r.getAs[Int]("i") -> Option(r.getAs[Any]("v"))).toMap
      withClue(s"$dir: ") {
        out(2) shouldBe None
        out(1) shouldBe (if (dir == "backward") Some(5.0) else None)
      }
    }
  }

  test("asof result row count equals left row count (left join semantics)") {
    import spark.implicits._
    val left = Seq(("k", ts("2026-01-01 00:00:01"), 1), ("k", ts("2026-01-01 00:00:02"), 2))
      .toDF("k", "ts", "i")
    val right = Seq(("k", ts("2026-01-01 00:00:00"), 9.0), ("k", ts("2026-01-01 00:00:00"), 8.0))
      .toDF("k", "ts", "v")
    AsofJoin.asof(left, right, "k", "ts", Seq("v")).count() shouldBe 2
  }

  test("rangeJoin yields exactly the pairs within the window, once each") {
    import spark.implicits._
    val l = Seq(("k", ts("2026-01-01 00:00:00"), "l1"),
      ("k", ts("2026-01-01 02:00:00"), "l2")).toDF("k", "ts", "lid")
    val r = Seq(("k", ts("2026-01-01 00:30:00"), "r1"),   // within 1h of l1
      ("k", ts("2026-01-01 01:30:00"), "r2"),             // within 1h of l2 (and not l1)
      ("k", ts("2026-01-01 05:00:00"), "r3"),             // matches nothing
      ("x", ts("2026-01-01 00:00:00"), "r4")              // different key
    ).toDF("k", "ts", "rid")
    val pairs = AsofJoin.rangeJoin(l, r, "k", "ts",
        before = 3600, after = 3600, bucketSec = 1800)
      .select("l_lid", "r_rid").collect().map(x => (x.getString(0), x.getString(1))).toSet
    pairs shouldBe Set(("l1", "r1"), ("l2", "r2"))
  }

  test("rangeJoin honors sub-second windows (no whole-second truncation)") {
    import spark.implicits._
    val l = Seq(("k", java.sql.Timestamp.valueOf("2026-01-01 00:00:00.1"), "l1"))
      .toDF("k", "ts", "lid")
    val r = Seq(
      ("k", java.sql.Timestamp.valueOf("2026-01-01 00:00:00.9"), "far"),  // 800 ms out
      ("k", java.sql.Timestamp.valueOf("2026-01-01 00:00:00.25"), "near") // 150 ms in
    ).toDF("k", "ts", "rid")
    val pairs = AsofJoin.rangeJoin(l, r, "k", "ts",
        before = 0, after = 0, bucketSec = 1)
      .select("l_lid", "r_rid").collect().map(x => (x.getString(0), x.getString(1))).toSet
    // before = after = 0 means "same instant"; nothing matches
    pairs shouldBe Set.empty
    val loose = AsofJoin.rangeJoin(l, r, "k", "ts",
        before = 1, after = 1, bucketSec = 1)
      .select("r_rid").collect().map(_.getString(0)).toSet
    loose shouldBe Set("far", "near")
  }
}
