package graft.tools

import org.apache.spark.sql.functions._

/** Segment-accumulation smoke for the append-files side tables (VERDICT
  * r12 item 8): the r12 rework trades write amplification for segment
  * count — every [[graft.operators.Bm25Index.append]] /
  * [[graft.operators.MinHashIndex.append]] adds one `seg=<batch>`
  * directory — so the question this smoke answers with numbers is
  * whether PROBE latency stays flat across ~50 ingest batches when the
  * scheduled maintenance rule ([[graft.operators.IndexMaintenance]],
  * compact past `maxSegments`) fires on its documented cadence. Probe
  * latency is sampled at fixed batch marks with segment counts printed
  * next to each, so a drift would be attributable (more segments → more
  * scan tasks) rather than anecdotal.
  *
  * Run: sbt 'Test/runMain graft.tools.SegmentAccumulationSmoke [nBatches]' */
object SegmentAccumulationSmoke {
  def main(args: Array[String]): Unit = {
    val nBatches = if (args.nonEmpty) args(0).toInt else 50
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, d).select("doc_id", "text").cache()
    println(s"[seg] corpus docs: ${docs.count()}")
    val marks = Set(1, 10, 25, nBatches)

    def timed[A](f: => A): (A, Double) = {
      val s = System.nanoTime
      val r = f
      (r, (System.nanoTime - s) / 1e9)
    }

    // one ~100-doc batch of globally fresh ids per ingest tick
    def batch(b: Int) = docs.filter(col("doc_id") % 50 === (b % 50).toLong)
      .select((col("doc_id") + b * 10000000L).as("doc_id"), col("text"))

    // ---- BM25: build, 50 appends with the scheduled tick, probe at marks
    {
      val wh = java.nio.file.Files.createTempDirectory("seg_bm").toString
      val st = new graft.operators.ParquetTableStore(spark, wh)
      graft.operators.Bm25Index.build(st, "bx", docs, "doc_id", "text")
      val queries = Seq((1L, "data"), (2L, "with"), (3L, "analysis"))
        .toDF("query_id", "term")
      var compactions = 0
      (1 to nBatches).foreach { b =>
        graft.operators.Bm25Index.append(st, "bx", batch(b),
          "doc_id", "text", batchId = b.toLong)
        val rep = graft.operators.IndexMaintenance.maintain(st, "bx", "bm25")
        if (rep.segments.exists(_.compacted)) compactions += 1
        if (marks(b)) {
          val segs = st.read("bx_postings").get
            .select(col("seg")).distinct().count()
          val (n, sec) = timed(
            graft.operators.Bm25Index.search(st, "bx", queries, 10).count())
          println(f"[seg] bm25 batch=$b%2d segs=$segs%2d compactions=$compactions " +
            f"probe=${sec}%.2f s ($n rows)")
        }
      }
      assert(compactions >= 2, s"compaction rule never fired: $compactions")
    }

    // ---- MinHash: same protocol over the sigs/buckets side tables
    {
      val wh = java.nio.file.Files.createTempDirectory("seg_mh").toString
      val st = new graft.operators.ParquetTableStore(spark, wh)
      graft.operators.MinHashIndex.build(st, "mx", docs, "doc_id", "text")
      val probeBatch = docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 900000000L).as("doc_id"), col("text"))
      var compactions = 0
      (1 to nBatches).foreach { b =>
        graft.operators.MinHashIndex.append(st, "mx", batch(b),
          "doc_id", "text", batchId = b.toLong)
        val rep = graft.operators.IndexMaintenance.maintain(st, "mx", "minhash")
        if (rep.segments.exists(_.compacted)) compactions += 1
        if (marks(b)) {
          val segs = st.read("mx_sigs").get
            .select(col("seg")).distinct().count()
          val (n, sec) = timed(
            graft.operators.MinHashIndex.probe(st, "mx", probeBatch,
              "doc_id", "text", 0.5).count())
          println(f"[seg] minhash batch=$b%2d segs=$segs%2d compactions=$compactions " +
            f"probe=${sec}%.2f s ($n rows)")
        }
      }
      assert(compactions >= 2, s"compaction rule never fired: $compactions")
    }
    spark.stop()
  }
}
