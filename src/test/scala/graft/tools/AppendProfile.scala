package graft.tools

import org.apache.spark.sql.functions._

/** Decompose the IVF-SQ guarded append's cost at two corpus scales: which
  * step still scales with corpus size after the r11 append-mode change?
  * Run: sbt 'Test/runMain graft.tools.AppendProfile' */
object AppendProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime
      val r = f
      println(f"[ap] $name: ${(System.nanoTime - s) / 1e9}%.2f s")
      r
    }

    Seq(10, 100).foreach { repl =>
      val p = s"/tmp/graft_smoke_r11/embeddings_j_x$repl.parquet"
      val emb = spark.read.parquet(p)
      val wh = java.nio.file.Files.createTempDirectory(s"ap_$repl").toString
      val st = new graft.operators.ParquetTableStore(spark, wh)
      t(s"x$repl build") {
        graft.operators.IvfSq.build(st, "ix", emb, "vec_id", "embedding",
          iterations = 3)
      }
      val batch = emb.filter(col("vec_id") < 2000)
        .select((col("vec_id") + 2000000000L).as("vec_id"), col("embedding"))
      (1 to 3).foreach { b =>
        val bb = batch.select((col("vec_id") + b * 10000L).as("vec_id"),
          col("embedding"))
        t(s"x$repl guarded append #$b (2000 new monotone ids)") {
          graft.operators.IvfSq.append(st, "ix", bb, "vec_id", "embedding",
            batchId = b.toLong)
        }
      }
      // fingerprint-only cost (the documented O(corpus-ids) recompute)
      val cells = st.read("ix_cells").get
      t(s"x$repl fingerprint scan (id-only, ~${repl * 2000 + 6000} rows)") {
        cells.agg(count(lit(1)), bit_xor(xxhash64(col("id")))).head()
      }
      t(s"x$repl cells footer-listing (count files)") {
        println(s"[ap]   files=${cells.inputFiles.length}")
      }
    }
    spark.stop()
  }
}
