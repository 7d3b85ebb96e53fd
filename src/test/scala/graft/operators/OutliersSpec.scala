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

  test("z from maintained STATE equals z from rows (and from Welford stddev)") {
    val df = (1L to 500L).map(i => (i, s"g${i % 4}", (i * 37 % 211).toDouble))
      .toDF("id", "g", "v")
    // maintained-state path: fold two disjoint halves, as a stream would
    val state = IncrementalAgg.mergeStates(Seq("g"),
      IncrementalAgg.partialState(df.filter($"id" % 2 === 0), Seq("g"), "v"),
      IncrementalAgg.partialState(df.filter($"id" % 2 =!= 0), Seq("g"), "v"))
    val fromState = Outliers.zScoresFromState(df, state, "g", "v")
      .orderBy("id").select("_z").as[Double].collect().toSeq
    val fromRows = Outliers.zScores(df, "g", "v")
      .orderBy("id").select("_z").as[Double].collect().toSeq
    assert(fromState == fromRows, "state path must equal ad-hoc path exactly")
    // and both agree with Spark's own Welford-based stddev to double noise
    val welford = df.join(
        df.groupBy("g").agg(avg($"v").as("m"), stddev($"v").as("sd")), Seq("g"))
      .orderBy("id").select(($"v" - $"m") / $"sd").as[Double].collect().toSeq
    fromState.zip(welford).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"sumsq-derived z $a vs welford $b")
    }
  }

  test("momentsFromState: singleton and cancellation edge cases") {
    val state = IncrementalAgg.partialState(
      Seq(("one", 7.0), ("flat", 3.0), ("flat", 3.0)).toDF("g", "v"),
      Seq("g"), "v")
    val got = IncrementalAgg.momentsFromState(state, Seq("g"))
      .orderBy("g").as[(String, Option[Double], Option[Double])].collect().toSeq
    // flat group: variance cancels to ~0 (clamped, never NaN); singleton: null sd
    assert(got == Seq(("flat", Some(3.0), Some(0.0)), ("one", Some(7.0), None)))
  }
}
