package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 100× scale smoke for the round-8 event-analytics / ER / drift
  * operators (the NOTES_r8 protocol: replicate the sf0.1 fixture with
  * disjoint entity ids so per-entity structure is preserved while
  * entity count scales 100×; single runs, timings recorded in NOTES).
  *
  * Run: sbt 'Test/runMain graft.tools.ScaleSmoke [repl]'
  * Writes replicas under /tmp/graft_smoke_r8/ and prints [smoke] lines. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val repl = if (args.nonEmpty) args(0).toInt else 100
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val base = "/tmp/graft_smoke_r8"

    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime
      val r = f
      println(f"[smoke] $name: ${(System.nanoTime - s) / 1e9}%.1f s")
      r
    }

    // ---- replicated events: user ids offset per replica
    val evP = s"$base/events_x$repl.parquet"
    if (!new java.io.File(evP).exists()) {
      val ev = graft.Tables.events(spark, d)
      val reps = spark.range(repl).select(col("id").as("_rep"))
      ev.crossJoin(reps)
        .select((col("user_id") + col("_rep") * 10000000L).as("user_id"),
          col("ts"), col("event_type"), col("value"),
          (col("event_id") + col("_rep") * 1000000000L).as("event_id"))
        .write.mode("overwrite").parquet(evP)
    }
    val events = spark.read.parquet(evP)
    println(s"[smoke] events rows: ${events.count()} (${repl}x)")

    t(s"q108 funnel x$repl") {
      graft.operators.Funnel.report(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), horizonHours = Some(72))
        .collect().foreach(r => println(s"[smoke]   $r"))
    }
    t(s"q109 retention x$repl") {
      val n = graft.operators.Retention.cohortWeekly(events, "user_id", "ts")
        .count()
      println(s"[smoke]   grid rows: $n")
    }
    t(s"q118 decay x$repl") {
      graft.operators.Decay.scores(events, "event_type", "ts", "value",
        1706745600000000L, 168.0).collect()
        .foreach(r => println(s"[smoke]   $r"))
    }
    t(s"q119 transitions x$repl") {
      val m = graft.operators.Transitions.matrix(events, "user_id",
        "event_type", "ts", "event_id")
      println(s"[smoke]   matrix rows: ${m.count()}")
    }

    // ---- replicated customers: ids + nations offset per replica so
    // blocks stay fixture-sized while block COUNT scales (the correct
    // scale story: more blocks, not bigger blocks — a coarser-key
    // 100×-bigger block would be the quadratic trap)
    val cuP = s"$base/customer_x$repl.parquet"
    if (!new java.io.File(cuP).exists()) {
      val cu = graft.Tables.customer(spark, d)
      val reps = spark.range(repl).select(col("id").as("_rep"))
      cu.crossJoin(reps)
        .select((col("c_custkey") + col("_rep") * 10000000L).as("c_custkey"),
          col("c_name"),
          (col("c_nationkey") + (col("_rep") * 100L).cast("int")).as("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))
        .write.mode("overwrite").parquet(cuP)
    }
    val cust = spark.read.parquet(cuP)
    println(s"[smoke] customer rows: ${cust.count()}")

    t(s"q113 entity resolution x$repl") {
      val cl = graft.operators.EntityResolution.clusters(cust,
        "c_custkey", "c_name", Seq("c_nationkey"),
        maxEditDist = 1, maxBlock = 100000)
      println(s"[smoke]   clusters: ${cl.count()}")
    }
    t(s"q121 jaro-winkler x$repl") {
      val p = graft.operators.EntityResolution.matchPairsJw(cust,
        "c_custkey", "c_name", Seq("c_nationkey"), minSim = 0.98,
        maxBlock = 100000)
      println(s"[smoke]   jw pairs: ${p.count()}")
    }

    // ---- drift over replicated orders
    val orP = s"$base/orders_x$repl.parquet"
    if (!new java.io.File(orP).exists()) {
      val or = graft.Tables.orders(spark, d)
      val reps = spark.range(repl).select(col("id").as("_rep"))
      or.crossJoin(reps).drop("_rep")
        .write.mode("overwrite").parquet(orP)
    }
    val orders = spark.read.parquet(orP)
    println(s"[smoke] orders rows: ${orders.count()}")
    t(s"q110 drift x$repl") {
      graft.operators.Drift.psiReport(orders,
        orders.filter(col("o_totalprice") >= 250000),
        Seq("o_totalprice", "o_custkey")).collect()
        .foreach(r => println(s"[smoke]   $r"))
    }

    spark.stop()
  }
}
