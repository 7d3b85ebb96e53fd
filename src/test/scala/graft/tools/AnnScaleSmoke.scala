package graft.tools

import org.apache.spark.sql.functions._

/** 100× scale smoke for the ANN/retrieval family (VERDICT r8 item 3:
  * q88 stored-IVF, q92 PQ, q94 BM25, q96 IVF-PQ had only sf0.1
  * evidence) plus the ε-convergence PageRank round count on the 100×
  * graph (r8 item 2). Protocol as the r8 smokes: replicate the sf0.1
  * fixture with disjoint ids so per-entity structure is preserved
  * while entity count scales; single runs, timings recorded in
  * NOTES_r9. Vectors are byte-identical across replicas — cells keep
  * the fixture's RELATIVE occupancy at 100× size, which is exactly the
  * stress the probe's pruning claim is about (a probe must stay
  * ~nProbe/nCells of a 100× corpus, never rescan it).
  *
  * Run: sbt 'Test/runMain graft.tools.AnnScaleSmoke [repl]'
  * Writes replicas under /tmp/graft_smoke_r9/ and prints [smoke] lines. */
object AnnScaleSmoke {
  def main(args: Array[String]): Unit = {
    val repl = if (args.nonEmpty) args(0).toInt else 100
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val base = "/tmp/graft_smoke_r9"

    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime
      val r = f
      println(f"[smoke] $name: ${(System.nanoTime - s) / 1e9}%.1f s")
      r
    }
    def dirSizeMb(p: String): Double = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(p)) / 1e6
    }

    // ---- replicated embeddings: vec_id offset per replica
    val emP = s"$base/embeddings_x$repl.parquet"
    if (!new java.io.File(emP).exists()) {
      val em = graft.Tables.embeddings(spark, d)
      val reps = spark.range(repl).select(col("id").as("_rep"))
      em.crossJoin(reps)
        .select((col("vec_id") + col("_rep") * 10000000L).as("vec_id"),
          col("embedding"))
        .write.mode("overwrite").parquet(emP)
    }
    val emb = spark.read.parquet(emP)
    println(s"[smoke] embeddings rows: ${emb.count()} (${repl}x)")

    // q88 stored IVF: build vs probe, index size, pruning plan-asserted
    val wh88 = java.nio.file.Files.createTempDirectory("smoke_ivf").toString
    val st88 = new graft.operators.ParquetTableStore(spark, wh88)
    t(s"q88 IVF build x$repl (16 cells, 5 Lloyd iters)") {
      graft.operators.IvfIndex.build(st88, "ix", emb, "vec_id", "embedding")
    }
    println(f"[smoke]   index size: ${dirSizeMb(wh88)}%.1f MB")
    t(s"q88 IVF verifyFresh x$repl (id-only corpus scan)") {
      graft.operators.IvfIndex.verifyFresh(st88, "ix", emb, "vec_id")
    }
    val planted = emb.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      .select((col("vec_id") + 900000000L).as("vec_id"), col("embedding"))
    val probe88 = graft.operators.IvfIndex.probe(st88, "ix", planted,
      "vec_id", "embedding", 1)
    t(s"q88 IVF probe x$repl (8 queries, nProbe=4)") {
      probe88.collect().take(2).foreach(r => println(s"[smoke]   $r"))
    }
    val probePlan = probe88.queryExecution.executedPlan.toString
    val pruned = probePlan.contains("PartitionFilters: [cell")
    println(s"[smoke]   probe plan partition-pruned on cell: $pruned")
    assert(pruned, "probe plan lost its cell partition filter:\n" + probePlan)

    // q92 PQ: train / encode / ADC search
    val codebook = t(s"q92 PQ train x$repl (64 subq, 3 iters)") {
      graft.operators.ProductQuantizer.train(emb, "vec_id", "embedding", 64,
        iterations = 3)
    }
    val codes = t(s"q92 PQ encode x$repl") {
      val c = graft.operators.ProductQuantizer.encode(emb, "vec_id",
        "embedding", 64, codebook)
      println(s"[smoke]   codes rows: ${c.count()}")
      c
    }
    t(s"q92 PQ searchAdc x$repl (8 queries)") {
      val q = emb.filter(col("vec_id") >= 16 && col("vec_id") < 24)
        .select((col("vec_id") + 900000000L).as("vec_id"), col("embedding"))
      val n = graft.operators.ProductQuantizer.searchAdc(q, codes, emb,
        "vec_id", "embedding", codebook, 64, topK = 1).count()
      println(s"[smoke]   results: $n")
    }

    // q96 IVF-PQ: composite build + probe from the store
    val wh96 = java.nio.file.Files.createTempDirectory("smoke_ivfpq").toString
    val st96 = new graft.operators.ParquetTableStore(spark, wh96)
    t(s"q96 IVF-PQ build x$repl") {
      graft.operators.IvfPq.build(st96, "ix", emb, "vec_id", "embedding", 64,
        iterations = 3)
    }
    println(f"[smoke]   index size: ${dirSizeMb(wh96)}%.1f MB")
    t(s"q96 IVF-PQ probe x$repl (8 queries)") {
      val q = emb.filter(col("vec_id") >= 24 && col("vec_id") < 32)
        .select((col("vec_id") + 900000000L).as("vec_id"), col("embedding"))
      val n = graft.operators.IvfPq.probe(st96, "ix", q, "vec_id",
        "embedding", 64, topK = 1).count()
      println(s"[smoke]   results: $n")
    }

    // ---- replicated documents for BM25
    val doP = s"$base/documents_x$repl.parquet"
    if (!new java.io.File(doP).exists()) {
      val docs = graft.Tables.documents(spark, d)
      val reps = spark.range(repl).select(col("id").as("_rep"))
      docs.crossJoin(reps)
        .select((col("doc_id") + col("_rep") * 10000000L).as("doc_id"),
          col("text"))
        .write.mode("overwrite").parquet(doP)
    }
    val docs = spark.read.parquet(doP)
    println(s"[smoke] documents rows: ${docs.count()}")
    t(s"q94 BM25 x$repl (5 terms, top-10)") {
      import spark.implicits._
      val queries = Seq((1L, "spark"), (1L, "join"), (2L, "window"),
        (2L, "sort"), (3L, "customer")).toDF("query_id", "term")
      val n = graft.operators.Bm25.search(docs, "doc_id", "text", queries, 10)
        .count()
      println(s"[smoke]   results: $n")
    }

    // ---- ε-convergence PageRank on the 100× order/supplier graph
    // (q107's edge construction over replicated orders+lineitem ids).
    // 78M edges: staged to PARQUET, not localCheckpoint — block-manager-
    // pinning the edge set starves the aggregates (first run OOM'd) —
    // and the graph phase runs at 64 shuffle partitions, not the sf0.1
    // default 8 (a 78M-row distinct over 8 partitions is a ~10M-row
    // hash set per task: exactly the partition-sizing rule the repo's
    // own scale notes prescribe).
    spark.conf.set("spark.sql.shuffle.partitions", 64)
    val egP = s"$base/edges_x$repl.parquet"
    if (!new java.io.File(egP).exists()) {
      val o = graft.Tables.orders(spark, d)
        .select(col("o_orderkey"), col("o_custkey"))
      val l = graft.Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      val reps = spark.range(repl).select(col("id").as("_rep"))
      val oR = o.crossJoin(reps)
        .select((col("o_orderkey") + col("_rep") * 100000000L).as("o_orderkey"),
          (col("o_custkey") + col("_rep") * 10000000L).as("o_custkey"))
      val lR = l.crossJoin(reps)
        .select((col("l_orderkey") + col("_rep") * 100000000L).as("l_orderkey"),
          (col("l_suppkey") + col("_rep") * 10000000L).as("l_suppkey"),
          col("l_returnflag"))
      val j = oR.join(lR, col("o_orderkey") === col("l_orderkey"))
      val e1 = j.select(col("o_custkey").as("src"),
        (col("l_suppkey") + 1000000000L).as("dst")).distinct()
      val e2 = j.filter(col("l_returnflag") === "R")
        .select((col("l_suppkey") + 1000000000L).as("src"),
          col("o_custkey").as("dst")).distinct()
      e1.unionByName(e2).distinct().write.mode("overwrite").parquet(egP)
    }
    val edges = spark.read.parquet(egP)
    println(s"[smoke] graph edges: ${edges.count()}")
    t(s"q107 PageRank ε-convergence x$repl (eps=1e-6)") {
      val (ranks, rounds) = graft.operators.PageRank.runToConvergenceStats(
        edges, "src", "dst", damping = 0.85, eps = 1e-6, maxIters = 120)
      println(s"[smoke]   rounds to eps=1e-6: $rounds; nodes: ${ranks.count()}")
    }

    spark.stop()
  }
}
