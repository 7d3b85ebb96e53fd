package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off measurement for the 64-bit residual-PQ quality operating point
  * (m=16, ksub=16) at a given SF dir — the numbers that set q163's gated
  * floors (VERDICT r12 item 6: the quality point had spec coverage on the
  * sf0.001 fixture but no DuckDB-oracle-gated floor at the driver's
  * sf0.01). Same query protocol as q152: corpus twins at vec_id % 31.
  * Run: sbt 'Test/runMain graft.tools.PqQualityPoint [sfDir]' */
object PqQualityPoint {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, d)
    println(s"[pqq] $d embeddings rows: ${emb.count()}")
    val queries = emb.filter(col("vec_id") % 31 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    def sets(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
        .collect().groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    val exact = sets(graft.operators.Similarity.annBruteForce(
      queries, emb, "vec_id", "embedding", 10))
    def recall(got: Map[Long, Set[Long]]): Double = {
      val per = exact.map { case (q, tr) =>
        got.getOrElse(q, Set.empty[Long]).intersect(tr).size.toDouble / tr.size }
      per.sum / per.size
    }
    val wh = java.nio.file.Files.createTempDirectory("pqq").toString
    val store = new graft.operators.ParquetTableStore(spark, wh)
    graft.operators.IvfPq.build(store, "pq16", emb, "vec_id", "embedding",
      dim = 64, nCells = 16, m = 16, ksub = 16, iterations = 5)
    Seq(32, 64).foreach { sl =>
      val r = recall(sets(graft.operators.IvfPq.probe(store, "pq16", queries,
        "vec_id", "embedding", dim = 64, topK = 10, m = 16, ksub = 16,
        nProbe = 8, shortlist = sl)))
      println(f"[pqq] m=16 ksub=16 nProbe=8 shortlist=$sl: recall@10 = $r%.3f")
    }
    spark.stop()
  }
}
