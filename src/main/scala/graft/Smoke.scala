package graft

/** Ad-hoc scale smoke: time a comma-separated subset of
  * [[SparkEntry.queries]] against an arbitrary table dir (e.g. a
  * synthetic 10× corpus under /tmp). One timed run per query, no
  * warmup — for order-of-magnitude scaling checks, not benchmarking
  * (use [[Bench]] for medians). Usage:
  * `SPARK_DRIVER_MEM=24g sbt "runMain graft.Smoke <dir> q20,q41"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { q =>
      val fn = SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query '$q'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      println(f"[smoke] $q rows=$rows t=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
