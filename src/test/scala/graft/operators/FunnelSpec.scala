package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (user, type, ts) fixture covering every recurrence branch
  private lazy val evts = Seq(
    // u1: clean A → B → C inside the window
    (1L, "A", "2024-01-01 00:00:00"),
    (1L, "B", "2024-01-01 05:00:00"),
    (1L, "C", "2024-01-02 00:00:00"),
    // u2: B BEFORE its A — B must not count; no C
    (2L, "B", "2024-01-01 00:00:00"),
    (2L, "A", "2024-01-01 01:00:00"),
    // u3: B inside, C outside the 72 h entry-anchored window
    (3L, "A", "2024-01-01 00:00:00"),
    (3L, "B", "2024-01-01 00:30:00"),
    (3L, "C", "2024-01-04 00:00:01"),
    // u4: tie — one timestamp satisfies A and B (>= semantics)
    (4L, "A", "2024-01-01 00:00:00"),
    (4L, "B", "2024-01-01 00:00:00"),
    // u5: never enters (no A)
    (5L, "B", "2024-01-01 00:00:00"),
    (5L, "C", "2024-01-01 01:00:00"),
    // u1 noise: later duplicate As/Bs must not move the earliest chain
    (1L, "A", "2024-01-03 00:00:00"),
    (1L, "B", "2024-01-03 01:00:00")
  ).toDF("user_id", "event_type", "s")
    .select(col("user_id"), col("event_type"),
      to_timestamp(col("s")).as("ts"))

  private lazy val per = Funnel.userSteps(evts, "user_id", "event_type",
    "ts", Seq("A", "B", "C"), horizonHours = Some(72))

  test("per-user recurrence: order, horizon, ties, non-entry") {
    val m = per.collect().map(r =>
      r.getLong(0) -> (Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3)))).toMap
    assert(m(1L) == ((Some(ts("2024-01-01 00:00:00")),
      Some(ts("2024-01-01 05:00:00")), Some(ts("2024-01-02 00:00:00")))))
    // u2's B precedes its A: ts_2 null; ts_3 null cascades
    assert(m(2L) == ((Some(ts("2024-01-01 01:00:00")), None, None)))
    // u3's C is 1 s past entry + 72 h
    assert(m(3L) == ((Some(ts("2024-01-01 00:00:00")),
      Some(ts("2024-01-01 00:30:00")), None)))
    // u4: the tied timestamp satisfies both steps
    assert(m(4L) == ((Some(ts("2024-01-01 00:00:00")),
      Some(ts("2024-01-01 00:00:00")), None)))
    assert(!m.contains(5L), "a user with no step-1 event must be absent")
  }

  test("report counts and conversions") {
    val rows = Funnel.report(evts, "user_id", "event_type", "ts",
      Seq("A", "B", "C"), horizonHours = Some(72)).collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("A", "B", "C"))
    assert(rows.map(_.getLong(2)).toSeq == Seq(4L, 3L, 1L))
    assert(rows.map(_.getDouble(3)).toSeq == Seq(1.0, 0.75, 0.25))
    assert(rows.map(_.getDouble(4)).toSeq == Seq(1.0, 0.75, 0.3333))
  }

  test("no horizon: only the ordering constraint applies") {
    val open = Funnel.userSteps(evts, "user_id", "event_type", "ts",
      Seq("A", "B", "C"), horizonHours = None)
    val u3 = open.filter(col("user") === 3L).collect().head
    assert(u3.getTimestamp(3) == ts("2024-01-04 00:00:01"),
      "without a horizon u3's late C completes the funnel")
  }

  test("single exchange for a 3-step funnel") {
    per.collect()
    // count only the AQE final plan (toString appends the initial plan too)
    val plan = per.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "ShuffleQueryStage".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("an empty cohort reports 0 users, not null (oracle parity)") {
    val none = evts.filter(col("event_type") === "never")
    val rows = Funnel.report(none, "user_id", "event_type", "ts",
      Seq("A", "B"), horizonHours = Some(1)).collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 0L))
    assert(rows.forall(r => r.isNullAt(3) && r.isNullAt(4)),
      "conversion ratios over a 0 denominator are null both sides")
  }

  test("randomized: array recurrence ≡ the sequential-join formulation") {
    // the oracle proves shape equivalence on ONE fixture; this pins it
    // on 3 random event streams (ties, bursts, partial funnels)
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.tabulate(400) { i =>
        (rnd.nextInt(25).toLong, Seq("A", "B", "C", "X")(rnd.nextInt(4)),
          // coarse timestamps force plenty of exact ties
          1700000000000000L + rnd.nextInt(50).toLong * 3600L * 1000000L)
      }
      val evs = rows.toDF("user_id", "event_type", "us")
        .select(col("user_id"), col("event_type"),
          timestamp_micros(col("us")).as("ts"))
      val fast = Funnel.userSteps(evs, "user_id", "event_type", "ts",
        Seq("A", "B", "C"), horizonHours = Some(24)).collect()
        .map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)),
          Option(r.getTimestamp(2)), Option(r.getTimestamp(3))))).toMap
      // sequential-join reference: min A; min B in [t1, t1+24h] after t1;
      // min C in [t2, t1+24h]
      val horizonUs = 24L * 3600L * 1000000L
      val byUser = rows.groupBy(_._1)
      val slow = byUser.flatMap { case (u, es) =>
        val of = (t: String) => es.filter(_._2 == t).map(_._3).sorted
        of("A").headOption.map { t1 =>
          val dl = t1 + horizonUs
          val t2 = of("B").find(x => x >= t1 && x <= dl)
          val t3 = t2.flatMap(b => of("C").find(x => x >= b && x <= dl))
          u -> ((Some(t1), t2, t3))
        }
      }.toMap.map { case (u, (a, b, c)) =>
        def ts(o: Option[Long]) = o.map(x => new java.sql.Timestamp(x / 1000))
        u -> ((ts(a), ts(b), ts(c)))
      }
      assert(fast == slow, s"seed $seed: ${fast.toSet -- slow.toSet}")
    }
  }

  test("invalid inputs fail loudly") {
    intercept[IllegalArgumentException] {
      Funnel.userSteps(evts, "user_id", "event_type", "ts", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Funnel.userSteps(evts, "user_id", "event_type", "ts", Seq("A", "A"))
    }
    intercept[IllegalArgumentException] {
      Funnel.userSteps(evts, "user_id", "event_type", "ts", Seq("A", "B"),
        horizonHours = Some(0))
    }
  }
}
