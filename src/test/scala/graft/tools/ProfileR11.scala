package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

/** Round-11 perf triage: re-measure the driver-vs-builder anomaly set
  * (q145 guard regression; q83/q97/q107/q113 environment suspects; q102
  * builder drift) at BOTH configs from one JVM shape — the driver's
  * local[32]/32 shuffle partitions and the builder's local[4]/4 — with
  * per-query Spark job and task counts, so "which config amplifies what"
  * is a measurement instead of a guess.
  *
  * Run: sbt 'Test/runMain graft.tools.ProfileR11 [cpus] [passes] [q,...]' */
object ProfileR11 {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 32
    val passes = if (args.length > 1) args(1).toInt else 3
    val queries =
      if (args.length > 2) args(2).split(",").toSeq
      else Seq("q138_ann_ivf_append", "q145_ann_ivfsq_append",
        "q146_ann_ivfpq_append", "q83_dup_span_removal", "q97_hybrid_rrf",
        "q107_pagerank", "q113_entity_resolution", "q102_containment")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
    })

    def run(name: String): Unit = {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, d).count() // warmup
      val times = (1 to passes).map { _ =>
        jobs.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        fn(spark, d).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener events drain async
        (sec, jobs.get(), tasks.get())
      }
      val med = times.map(_._1).sorted.apply(passes / 2)
      println(f"[prof cpus=$cpus] $name%-28s median=$med%7.2f s  " +
        f"jobs=${times.last._2}%4d tasks=${times.last._3}%6d  " +
        s"all=${times.map(t => f"${t._1}%.2f").mkString(",")}")
    }
    queries.foreach(run)
    spark.stop()
  }
}
