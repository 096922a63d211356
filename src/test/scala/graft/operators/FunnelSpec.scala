package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 $h%02d:00:00")

  // u1 completes all 4 steps in order; u2 stalls after B (its C precedes
  // B); u3 does A only; u4 completes but out of order at step D (D before
  // C's chained first occurrence)
  private lazy val ev = Seq(
    (1L, "A", ts(1)), (1L, "B", ts(2)), (1L, "C", ts(3)), (1L, "D", ts(4)),
    (2L, "A", ts(1)), (2L, "C", ts(2)), (2L, "B", ts(3)),
    (3L, "A", ts(5)),
    (4L, "A", ts(1)), (4L, "B", ts(2)), (4L, "D", ts(3)), (4L, "C", ts(4))
  ).toDF("user_id", "event_type", "ts")

  test("counts: 4-step strict-order funnel") {
    val r = Funnel.counts(ev, "user_id", "event_type", "ts",
      Seq("A", "B", "C", "D")).head()
    // A: u1..u4; B-after-A: u1, u2, u4; C-after-that-B: u1, u4;
    // D-after-that-C: u1 only (u4's D precedes its chained C)
    r.getLong(0) shouldBe 4L
    r.getLong(1) shouldBe 3L
    r.getLong(2) shouldBe 2L
    r.getLong(3) shouldBe 1L
  }

  test("reach: per-user chained first-occurrence times, NULL after fallout") {
    val r = Funnel.reach(ev, "user_id", "event_type", "ts", Seq("A", "B", "C"))
      .orderBy("user_id").collect()
    r.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L, 3L, 4L)
    r(0).getTimestamp(3) shouldBe ts(3) // u1 reaches C at 03:00
    r(1).isNullAt(3) shouldBe true      // u2's C precedes its B
    r(2).isNullAt(2) shouldBe true      // u3 never leaves A
    r(3).getTimestamp(3) shouldBe ts(4) // u4's C at 04:00 follows B
  }

  test("conversionWindow bounds each step's gap") {
    // u1's D is 1h after C — a 30-minute window drops it, 2h keeps it
    val tight = Funnel.counts(ev, "user_id", "event_type", "ts",
      Seq("A", "B", "C", "D"), Some("INTERVAL 30 MINUTES")).head()
    tight.getLong(3) shouldBe 0L
    val loose = Funnel.counts(ev, "user_id", "event_type", "ts",
      Seq("A", "B", "C", "D"), Some("INTERVAL 2 HOURS")).head()
    loose.getLong(3) shouldBe 1L
  }

  test("property: counts equal a sequential reference on random event streams") {
    val rnd = new scala.util.Random(42)
    val types = Vector("A", "B", "C", "D")
    (1 to 5).foreach { trial =>
      val events = (1 to 300).map { i =>
        (rnd.nextInt(20).toLong, types(rnd.nextInt(types.size)),
          ts(1 + rnd.nextInt(20)), i.toLong)
      }
      val steps = Seq("A", "B", "C", "D").take(2 + rnd.nextInt(3))
      // sequential reference: chained first-qualifying occurrence per
      // user under the (ts, id) total order
      def reachOf(evs: Seq[(Long, String, Timestamp, Long)]): Seq[Int] = {
        val byUser = evs.groupBy(_._1)
        val perUser = byUser.values.map { us =>
          var reached = 0
          var lastT = Long.MinValue
          var stalled = false
          steps.foreach { st =>
            if (!stalled) {
              // first qualifying: min ts among events of this type with
              // ts strictly after the previous step's chained time (no
              // constraint for step 1)
              val cand = us.filter(e => e._2 == st &&
                (reached == 0 || e._3.getTime > lastT))
              if (cand.nonEmpty) {
                lastT = cand.map(_._3.getTime).min
                reached += 1
              } else stalled = true
            }
          }
          reached
        }
        steps.indices.map(i => perUser.count(_ > i)).toSeq
      }
      val expect = reachOf(events)
      val df = events.toDF("user_id", "event_type", "ts", "event_id")
      val got = Funnel.counts(df, "user_id", "event_type", "ts", steps).head()
      steps.indices.foreach { i =>
        withClue(s"trial $trial steps $steps step ${i + 1}: ") {
          got.getLong(i) shouldBe expect(i).toLong
        }
      }
    }
  }

  test("3-step counts equal the hand-unrolled q_funnel composition") {
    val ops = Funnel.counts(ev, "user_id", "event_type", "ts",
      Seq("A", "B", "C")).head()
    // replicate q_funnel's unrolled shape on the same fixture
    val v = ev.filter(col("event_type") === "A")
      .groupBy("user_id").agg(min("ts").as("tv"))
    val c = ev.filter(col("event_type") === "B").join(v, Seq("user_id"))
      .filter(col("ts") > col("tv")).groupBy("user_id").agg(min("ts").as("tc"))
    val p = ev.filter(col("event_type") === "C").join(c, Seq("user_id"))
      .filter(col("ts") > col("tc")).groupBy("user_id").agg(min("ts").as("tp"))
    Seq(ops.getLong(0), ops.getLong(1), ops.getLong(2)) shouldBe
      Seq(v.count(), c.count(), p.count())
  }
}
