package graft.tools

/** Focused re-measure for the driver-tail drift queries (VERDICT r12
  * item 4): the r12 driver bench read q75_dup_ngram_spans at 1.82× of
  * r11 while the same tree's builder number moved 1.07× — BASELINE.md's
  * decision rule adjudicated environment, and this tool closes the
  * reading with a quiet-box 3-pass median per query at a chosen CPU
  * shape (the warmup pass runs the full suite member first, so JIT and
  * codegen caches are steady-state, same protocol as graft.Bench).
  *
  * Run: sbt 'Test/runMain graft.tools.TailBench q75_dup_ngram_spans q96_ann_ivfpq ...'
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4),
  *      SPARK_GRAFT_BENCH_PASSES (default 3). */
object TailBench {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q75_dup_ngram_spans", "q96_ann_ivfpq", "q94_bm25",
      "q57_lm_quality", "q87_quantiles_maintained")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = names.map(n => n -> graft.SparkEntry.queries(n))
    // untimed warmup
    qs.foreach { case (_, fn) => fn(spark, sfDir).count() }
    val sweeps = (1 to passes).map { _ =>
      qs.map { case (n, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        n -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    names.foreach { n =>
      val t = sweeps.map(_(n))
      println(f"[tail] $n cpus=$cpus median=${median(t)}%.2f s " +
        s"passes=${t.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
