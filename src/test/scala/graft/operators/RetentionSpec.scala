package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Date

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val evts = Seq(
    // cohort 2024-01-01: u1 active weeks 0,1,2; u2 active week 0 only
    (1L, "2024-01-01 10:00:00"), (1L, "2024-01-08 09:00:00"),
    (1L, "2024-01-16 09:00:00"),
    (2L, "2024-01-01 23:00:00"),
    // u2 same-day second event: per-day distinct must not double count
    (2L, "2024-01-01 23:30:00"),
    // cohort 2024-01-03: u3 active weeks 0 and 1 (day 7 = week 1)
    (3L, "2024-01-03 00:00:00"), (3L, "2024-01-10 00:00:00"),
    // null user/ts rows are dropped
    (0L, null)
  ).toDF("user_id", "s")
    .select(when(col("user_id") === 0L, lit(null)).otherwise(col("user_id"))
      .as("user_id"), to_timestamp(col("s")).as("ts"))

  private lazy val out =
    Retention.cohortWeekly(evts, "user_id", "ts").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

  test("cohort sizes, offsets and ratios") {
    assert(out(("2024-01-01", 0L)) == ((2L, 2L, 1.0)))
    assert(out(("2024-01-01", 1L)) == ((1L, 2L, 0.5)))
    assert(out(("2024-01-01", 2L)) == ((1L, 2L, 0.5)))
    // u3's day-7 return is week 1 (floor(7/7)), not week 0
    assert(out(("2024-01-03", 0L)) == ((1L, 1L, 1.0)))
    assert(out(("2024-01-03", 1L)) == ((1L, 1L, 1.0)))
    assert(out.size == 5, s"unexpected grid: $out")
  }

  test("offset-0 retention is always 1.0's numerator = cohort size") {
    out.collect { case ((_, 0L), (active, size, r)) =>
      assert(active == size && r == 1.0)
    }
  }

  test("randomized: grid ≡ brute-force per-user cohort arithmetic") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.tabulate(300)(_ =>
        (rnd.nextInt(20).toLong,
          java.time.LocalDate.of(2024, 1, 1 + rnd.nextInt(28))
            .atTime(rnd.nextInt(24), 0).toString.replace('T', ' ') + ":00"))
      val evs = rows.toDF("user_id", "s")
        .select(col("user_id"), to_timestamp(col("s")).as("ts"))
      val got = Retention.cohortWeekly(evs, "user_id", "ts").collect()
        .map(r => (r.getDate(0).toString, r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      // brute force in plain Scala
      val byUser = rows.groupBy(_._1).view.mapValues(_.map(_._2.take(10)))
      val first = byUser.mapValues(_.min).toMap
      val sizes = first.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val brute = byUser.toSeq.flatMap { case (u, days) =>
        val c = first(u)
        days.distinct.map { d =>
          val off = java.time.temporal.ChronoUnit.DAYS.between(
            java.time.LocalDate.parse(c), java.time.LocalDate.parse(d)) / 7
          (c, off) -> u
        }
      }.distinct.groupBy(_._1).view
        .mapValues(v => (v.size.toLong, 0L)).toMap
        .map { case ((c, o), (n, _)) => (c, o) -> ((n, sizes(c))) }
      assert(got == brute, s"seed $seed: ${got.toSet.diff(brute.toSet)} / ${brute.toSet.diff(got.toSet)}")
    }
  }

  test("same-week multi-day activity counts once") {
    // u1 has one activity day per week only, but add a user with two
    // distinct days inside week 0
    val dense = Seq((9L, "2024-02-01 01:00:00"), (9L, "2024-02-03 01:00:00"))
      .toDF("user_id", "s")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"))
    val r = Retention.cohortWeekly(dense, "user_id", "ts").collect()
    assert(r.length == 1)
    assert(r.head.getDate(0) == Date.valueOf("2024-02-01"))
    assert(r.head.getLong(2) == 1L)
  }
}
