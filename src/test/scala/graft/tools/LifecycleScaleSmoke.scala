package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 100× scale smoke for the r10 index-lifecycle additions: delete cost
  * on the stored indexes (must be O(touched partitions), never a
  * rebuild), checkHealth cost (partition-column-only scans), and
  * recall@10 of the compressed probes at 100× (VERDICT r9 item 3's
  * "record it at 100× in the smoke table"). Protocol as AnnScaleSmoke:
  * replicate the sf0.1 fixture with disjoint ids (vectors byte-identical
  * across replicas — relative cell occupancy preserved), single runs,
  * numbers recorded in NOTES_r10.
  *
  * Run: sbt 'Test/runMain graft.tools.LifecycleScaleSmoke [repl]' */
object LifecycleScaleSmoke {
  def main(args: Array[String]): Unit = {
    val repl = if (args.nonEmpty) args(0).toInt else 100
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val base = "/tmp/graft_smoke_r10"

    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime
      val r = f
      println(f"[smoke] $name: ${(System.nanoTime - s) / 1e9}%.1f s")
      r
    }

    // ---- replicated embeddings (2000 * repl vectors)
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

    // ---- IVF-SQ: build, delete 1% of ids, re-attest — delete must cost
    // a fraction of the build (touched partitions only)
    val wh = java.nio.file.Files.createTempDirectory("smoke_lc_sq").toString
    val st = new graft.operators.ParquetTableStore(spark, wh)
    t(s"IVF-SQ build x$repl") {
      graft.operators.IvfSq.build(st, "ix", emb, "vec_id", "embedding",
        iterations = 3)
    }
    val doomed = emb.filter(col("vec_id") % 100 === 7).select(col("vec_id"))
    val nDoomed = doomed.count()
    t(s"IVF-SQ delete x$repl ($nDoomed ids, 1%)") {
      val r = graft.operators.IvfSq.delete(st, "ix", doomed, "vec_id")
      assert(r == nDoomed, s"removed $r of $nDoomed")
    }
    val remaining = emb.filter(col("vec_id") % 100 =!= 7)
    t(s"IVF-SQ verifyFresh+parity x$repl (post-delete)") {
      graft.operators.IvfSq.verifyFresh(st, "ix", remaining, "vec_id")
    }
    t(s"IVF checkHealth x$repl (occupancy PSI)") {
      val h = graft.operators.IvfIndex.checkHealth(st, "ix").head()
      println(s"[smoke]   psi=${h.getDouble(0)} n_build=${h.getLong(1)} " +
        s"n_current=${h.getLong(2)} retrain=${h.getBoolean(3)}")
    }

    // ---- recall@10 at 100×: probes vs exact brute force over the same
    // corpus (queries are twins of survivors; bounded collects)
    val queries = remaining.filter(col("vec_id") < 2000 && col("vec_id") % 97 === 0)
      .select((col("vec_id") + 900000000L).as("vec_id"), col("embedding"))
    println(s"[smoke] recall queries: ${queries.count()}")
    def sets(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
        .collect().groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val exact = t(s"exact brute-force top-10 x$repl") {
      sets(graft.operators.Similarity.annBruteForce(queries, remaining,
        "vec_id", "embedding", 10))
    }
    def recall(got: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, tr) =>
        got.getOrElse(q, Set.empty[Long]).intersect(tr).size.toDouble / tr.size }
      per.sum / per.size
    }
    val rSq = t(s"IVF-SQ probe top-10 x$repl (nProbe=8)") {
      recall(sets(graft.operators.IvfSq.probe(st, "ix", queries,
        "vec_id", "embedding", topK = 10, nProbe = 8, shortlist = 32)))
    }
    println(f"[smoke] recall@10 ivf-sq x$repl (nProbe=8): $rSq%.3f")

    // ---- BM25 delete at 100× docs
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
    println(s"[smoke] documents rows: ${docs.count()} (${repl}x)")
    val whB = java.nio.file.Files.createTempDirectory("smoke_lc_bm").toString
    val stB = new graft.operators.ParquetTableStore(spark, whB)
    t(s"BM25 build x$repl") {
      graft.operators.Bm25Index.build(stB, "bx", docs, "doc_id", "text")
    }
    val doomedB = docs.filter(col("doc_id") % 100 === 7).select(col("doc_id"))
    val nB = doomedB.count()
    t(s"BM25 delete x$repl ($nB docs, 1%)") {
      val r = graft.operators.Bm25Index.delete(stB, "bx", doomedB, "doc_id")
      assert(r == nB, s"removed $r of $nB")
    }
    t(s"BM25 verifyFresh x$repl (post-delete)") {
      graft.operators.Bm25Index.verifyFresh(stB, "bx",
        docs.filter(col("doc_id") % 100 =!= 7), "doc_id")
    }
    spark.stop()
  }
}
