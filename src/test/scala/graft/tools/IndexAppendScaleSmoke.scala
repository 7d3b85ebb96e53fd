package graft.tools

import org.apache.spark.sql.functions._

/** 100× scale smoke for the APPEND path of the incremental indexes
  * (r9 third wave: `IvfIndex.append`, `Bm25Index.append`): the claim
  * under test is that appending one ingest batch to a 100×-sized index
  * costs O(batch + id-column attest), NOT O(index rebuild) — i.e. the
  * ratio append/build should approach the batch's share of the corpus
  * plus fixed id-scan overhead, and stay flat as the corpus grows.
  * Protocol as [[AnnScaleSmoke]]: the sf0.1 fixtures replicated 100×
  * with disjoint ids (same parquet replicas, reused if present);
  * build over 99 replicas, append the 100th (a 1% "ingest hour"),
  * probe afterwards and attest freshness of the FULL union.
  *
  * Run: sbt 'Test/runMain graft.tools.IndexAppendScaleSmoke [repl]' */
object IndexAppendScaleSmoke {
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

    // ---- replicated fixtures (shared with AnnScaleSmoke)
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
    val embOld = emb.filter(col("vec_id") < (repl - 1) * 10000000L)
    val embNew = emb.filter(col("vec_id") >= (repl - 1) * 10000000L)
    println(s"[smoke] embeddings: ${emb.count()} total, ${embNew.count()} in the append batch")

    // ---- IVF: build over 99 replicas, append the 100th
    val whIvf = java.nio.file.Files.createTempDirectory("smoke_ivf_app").toString
    val stIvf = new graft.operators.ParquetTableStore(spark, whIvf)
    t(s"IVF build x${repl - 1} (16 cells, 5 Lloyd iters)") {
      graft.operators.IvfIndex.build(stIvf, "ix", embOld, "vec_id", "embedding")
    }
    t(s"IVF append x1 (1% batch: assign vs frozen centroids + moved-cell guard + touched-cell merge)") {
      graft.operators.IvfIndex.append(stIvf, "ix", embNew, "vec_id", "embedding")
    }
    t("IVF verifyFresh over the full union") {
      graft.operators.IvfIndex.verifyFresh(stIvf, "ix", emb, "vec_id")
    }
    val planted = emb.filter(col("vec_id") >= (repl - 1) * 10000000L + 8 &&
        col("vec_id") < (repl - 1) * 10000000L + 16)
      .select((col("vec_id") + 900000000L).as("vec_id"), col("embedding"))
    val probe = graft.operators.IvfIndex.probe(stIvf, "ix", planted,
      "vec_id", "embedding", 1)
    t("IVF probe (8 twins of APPENDED vectors)") {
      val hits = probe.collect()
      // replicas are byte-identical vectors, so the rank-1 neighbor is
      // SOME copy of the twin (the lowest-id one under the tie-break) —
      // same vec_id modulo the replica stride
      val ok = hits.count(r =>
        (r.getLong(0) - 900000000L - r.getLong(2)) % 10000000L == 0)
      println(s"[smoke]   twin-copy rank-1 hits: $ok/8")
      assert(ok == 8, hits.mkString("; "))
    }
    val pruned = probe.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [cell")
    println(s"[smoke]   probe plan partition-pruned on cell: $pruned")
    assert(pruned, "probe plan lost its cell partition filter after append")

    // ---- BM25: build over 99 replicas, append the 100th
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
    val docsOld = docs.filter(col("doc_id") < (repl - 1) * 10000000L)
    val docsNew = docs.filter(col("doc_id") >= (repl - 1) * 10000000L)
    println(s"[smoke] documents: ${docs.count()} total, ${docsNew.count()} in the append batch")
    val whBm = java.nio.file.Files.createTempDirectory("smoke_bm25_app").toString
    val stBm = new graft.operators.ParquetTableStore(spark, whBm)
    t(s"BM25 build x${repl - 1}") {
      graft.operators.Bm25Index.build(stBm, "bx", docsOld, "doc_id", "text")
    }
    t("BM25 append x1 (1% batch: tokenize batch + own-segment write + doc-table upsert)") {
      graft.operators.Bm25Index.append(stBm, "bx", docsNew, "doc_id", "text", 1L)
    }
    t("BM25 verifyFresh over the full union") {
      graft.operators.Bm25Index.verifyFresh(stBm, "bx", docs, "doc_id")
    }
    t("BM25 search from the appended index (5 terms, top-10)") {
      import spark.implicits._
      val queries = Seq((1L, "spark"), (1L, "join"), (2L, "window"),
        (2L, "sort"), (3L, "customer")).toDF("query_id", "term")
      val n = graft.operators.Bm25Index.search(stBm, "bx", queries, 10).count()
      println(s"[smoke]   results: $n")
    }

    spark.stop()
  }
}
