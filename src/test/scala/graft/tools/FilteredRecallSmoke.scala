package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured recall for FILTERED ANN vs filter selectivity — the number
  * behind the operating guidance documented at
  * [[graft.operators.IvfIndex.probeFiltered]] ("raise nProbe roughly in
  * proportion to the filter's selectivity") and the filter-then-shortlist
  * argument in [[graft.operators.IvfSq.probeFiltered]]:
  *
  *   - recall@10 of `probeFiltered` vs the FILTERED brute force, over a
  *     selectivity grid (1/3, 1/10, 1/30 of the corpus allowed) × an
  *     nProbe sweep — how much nProbe a selective filter actually costs;
  *   - the POST-HOC CONTRAST at each selectivity: probe unfiltered at
  *     the same nProbe/topK, then drop disallowed — the wrong operator
  *     the engine refuses to be, measured so the refusal is a number;
  *   - the same contrast on IVF-SQ at shortlist 32 — on the compressed
  *     family the shortlist is the second place a post-hoc filter loses.
  *
  * Corpus: the LifecycleScaleSmoke jittered-replica fixture (2000 × repl
  * distinct vectors); queries are midpoints of unrelated pairs (a twin's
  * neighbors all share its cell — midpoints straddle cells, so recall
  * measures what nProbe truncates).
  *
  * Run: sbt 'Test/runMain graft.tools.FilteredRecallSmoke [repl]' */
object FilteredRecallSmoke {
  def main(args: Array[String]): Unit = {
    val repl = if (args.nonEmpty) args(0).toInt else 25
    val d = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = "/tmp/graft_filtered_recall"
    new java.io.File(base).mkdirs()
    val p = s"$base/embeddings_j_x$repl.parquet"
    if (!new java.io.File(p).exists()) {
      val em = graft.Tables.embeddings(spark, d)
      val reps = spark.range(repl).select(col("id").as("_rep"))
      em.crossJoin(reps)
        .select((col("vec_id") + col("_rep") * 10000000L).as("vec_id"),
          when(col("_rep") === 0, col("embedding")).otherwise(
            transform(col("embedding"), (x, i) =>
              (x + (pmod(xxhash64(col("vec_id"), col("_rep"), i), lit(6001))
                .cast("double") - 3000.0) / 100000.0).cast("float")))
            .as("embedding"))
        .write.mode("overwrite").parquet(p)
    }
    val emb = spark.read.parquet(p)
    val nCells = 32
    println(s"[smoke] corpus: ${emb.count()} vectors, nCells=$nCells")

    val wh = java.nio.file.Files.createTempDirectory("smoke_fr").toString
    val st = new graft.operators.ParquetTableStore(spark, wh)
    graft.operators.IvfIndex.build(st, "fx", emb, "vec_id", "embedding",
      nCells = nCells, iterations = 3)
    graft.operators.IvfSq.build(st, "fsq", emb, "vec_id", "embedding",
      nCells = nCells, iterations = 3)

    val r0 = emb.filter(col("vec_id") < 2000)
    val queries = r0.alias("x")
      .join(r0.alias("y"), col("x.vec_id") + 37 === col("y.vec_id"))
      .filter(col("x.vec_id") % 23 === 0)
      .select((col("x.vec_id") + 900000000L).as("vec_id"),
        zip_with(col("x.embedding"), col("y.embedding"),
          (a, b) => ((a + b) / 2.0d).cast("float")).as("embedding"))
    println(s"[smoke] queries: ${queries.count()} (midpoints)")

    def sets(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("query_id"), col("neighbor_id")).as[(Long, Long)]
        .collect().groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
    def recall(truth: Map[Long, Set[Long]], got: Map[Long, Set[Long]]): Double = {
      val per = truth.map { case (q, tr) =>
        got.getOrElse(q, Set.empty[Long]).intersect(tr).size.toDouble / tr.size }
      per.sum / per.size
    }

    Seq(3L, 10L, 30L).foreach { m =>
      val allowed = emb.filter(col("vec_id") % m === 0).select(col("vec_id"))
      val truth = sets(graft.operators.Similarity.annBruteForce(queries,
        emb.filter(col("vec_id") % m === 0), "vec_id", "embedding", 10))
      Seq(2, 4, 8, nCells).foreach { nProbe =>
        val r = recall(truth, sets(graft.operators.IvfIndex.probeFiltered(
          st, "fx", queries, "vec_id", "embedding", allowed, topK = 10,
          nProbe = nProbe)))
        println(f"[smoke] ivf filtered recall@10  sel=1/$m%-3d nProbe=$nProbe%-3d: $r%.3f")
      }
      // the post-hoc contrast: unfiltered probe at the matched budget,
      // disallowed dropped AFTER — the operator probeFiltered refuses to be
      val postHoc = sets(graft.operators.IvfIndex.probe(st, "fx", queries,
          "vec_id", "embedding", topK = 10, nProbe = 8)
        .join(allowed.select(col("vec_id").as("neighbor_id")),
          Seq("neighbor_id"), "left_semi"))
      println(f"[smoke] ivf POST-HOC recall@10    sel=1/$m%-3d nProbe=8  : " +
        f"${recall(truth, postHoc)}%.3f  <- the wrong operator, for contrast")
      // compressed family: filter-then-shortlist vs post-hoc at sl=32
      val sqF = recall(truth, sets(graft.operators.IvfSq.probeFiltered(
        st, "fsq", queries, "vec_id", "embedding", allowed, topK = 10,
        nProbe = 8, shortlist = 32)))
      val sqP = recall(truth, sets(graft.operators.IvfSq.probe(st, "fsq",
          queries, "vec_id", "embedding", topK = 10, nProbe = 8,
          shortlist = 32)
        .join(allowed.select(col("vec_id").as("neighbor_id")),
          Seq("neighbor_id"), "left_semi")))
      println(f"[smoke] sq  filtered recall@10  sel=1/$m%-3d nProbe=8 sl=32: $sqF%.3f " +
        f"(post-hoc: $sqP%.3f)")
    }
    spark.stop()
  }
}
