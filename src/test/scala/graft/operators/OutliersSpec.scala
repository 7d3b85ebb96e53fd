package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OutliersSpec extends SparkSpec {
  import spark.implicits._

  test("outliers are judged against their OWN group's distribution") {
    val df = (Seq.fill(20)(("web", 100.0)) ++ Seq(("web", 101.0)) ++
      Seq.fill(20)(("tweet", 10.0)) ++ Seq(("tweet", 100.0)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val out = Outliers.beyond(df, "g", "v", 1.5)
      .select("g", "v").as[(String, Double)].collect().toSet
    // 100 is normal for web, a far outlier for tweets
    assert(out.contains(("tweet", 100.0)))
    assert(!out.exists { case (g, v) => g == "web" && v == 100.0 })
  }

  test("zero-dispersion and singleton groups produce no outliers (null z)") {
    val df = Seq((1L, "const", 5.0), (2L, "const", 5.0), (3L, "single", 9.0))
      .toDF("id", "g", "v")
    assert(Outliers.beyond(df, "g", "v", 0.1).count() == 0)
    val z = Outliers.zScores(df, "g", "v").select("_z")
      .as[Option[Double]].collect()
    assert(z.forall(_.isEmpty))
  }

  test("null-group facts survive the attach with null z (left join contract)") {
    val df = Seq((1L, Option("g"), 1.0), (2L, Option("g"), 2.0),
      (3L, Option.empty[String], 9.0)).toDF("id", "g", "v")
    val z = Outliers.zScores(df, "g", "v")
    assert(z.count() == 3L, "no fact row may be dropped by the stats attach")
    assert(z.filter($"id" === 3L).select("_z").as[Option[Double]].head().isEmpty)
  }

  test("stats side joins without shuffling the facts on a new key (broadcast attach)") {
    val df = (1L to 1000L).map(i => (i, s"g${i % 3}", i.toDouble)).toDF("id", "g", "v")
    val plan = Outliers.zScores(df, "g", "v").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"stats attach should broadcast:\n$plan")
  }
}
