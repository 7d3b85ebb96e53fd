package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MonitoringSpec extends SparkSpec {
  import spark.implicits._

  // (day, exec_sec, records, violations) — day 5 is degraded on all axes
  private def runs = Seq(
    (1, 10.0, 1000L, 10L),
    (2, 11.0, 1010L, 12L),
    (3, 10.5, 990L, 8L),
    (4, 10.2, 1005L, 11L),
    (5, 20.0, 400L, 90L), // slow, half the rows, 22% violations
    (6, 10.4, 1000L, 9L)
  ).toDF("day", "exec_sec", "records", "violations")

  private def out = Monitoring.alerts(runs, "day", "exec_sec", "records", "violations")
    .select("day", "exec_time_alert", "record_count_alert", "integrity_alert")
    .as[(Int, Boolean, Boolean, Boolean)].collect().sortBy(_._1).toSeq

  test("degraded run trips all three reference-threshold alerts") {
    assert(out(4) == ((5, true, true, true)))
  }

  test("healthy runs trip nothing, including the first (no-history) run") {
    assert(out.filter(_._1 != 5).forall { case (_, a, b, c) => !a && !b && !c })
  }

  test("the degraded run does not poison its own baseline (trailing excludes current)") {
    // day 6 compares against days 1-5's average; day 5's outlier raises the
    // exec baseline and lowers the record baseline — day 6 must stay green
    assert(out(5) == ((6, false, false, false)))
  }

  test("runKeys partition the panes") {
    val two = runs.withColumn("pipe", lit("a"))
      .unionByName(runs.withColumn("pipe", lit("b")))
    val res = Monitoring.alerts(two, "day", "exec_sec", "records", "violations",
      runKeys = Seq("pipe"))
      .filter(col("exec_time_alert")).select("pipe", "day")
      .as[(String, Int)].collect().toSet
    assert(res == Set(("a", 5), ("b", 5)))
  }
}
