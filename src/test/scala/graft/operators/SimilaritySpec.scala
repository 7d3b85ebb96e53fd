package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and runs far away home", "a"),
    (2L, "the quick brown fox jumps over the lazy dog and runs far away house", "a"), // near-dup of 1
    (3L, "completely different content about spark query engines and shuffles now", "a"),
    (4L, "the quick brown fox jumps over the lazy dog and runs far away home", "a")  // exact dup of 1
  ).toDF("doc_id", "text", "source")

  test("minhashNearDup finds exact and near duplicates, not unrelated docs") {
    val pairs = Similarity.minhashNearDup(docs, "doc_id", "text", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), "exact dup must be found")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)), "near dup should be found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("minhash signature of identical text is identical; est_jaccard = 1 for exact dups") {
    val out = Similarity.minhashNearDup(docs, "doc_id", "text", 0.5)
      .filter($"id_a" === 1L && $"id_b" === 4L)
      .select("est_jaccard").as[Double].collect()
    assert(out.toSeq == Seq(1.0))
  }

  test("simhashNearDup: identical docs at hamming 0; unrelated doc excluded") {
    val pairs = Similarity.simhashNearDup(docs, "doc_id", "text", 3)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Long)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m.get((1L, 4L)).contains(0L))
    assert(!m.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("jaccardPairs: exact dup pair scores 1.0") {
    val out = Similarity.jaccardPairs(docs, "doc_id", "text", "source", 2, 0.05)
      .filter($"id_a" === 1L && $"id_b" === 4L)
      .select("jaccard").as[Double].collect()
    assert(out.toSeq == Seq(1.0))
  }

  test("annBruteForce returns exact top-k; annLsh recall on real embeddings") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 4)
    val brute = Similarity.annBruteForce(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(brute.size == 20, "4 queries x top-5")
    val lsh = Similarity.annLsh(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // LSH trades recall for pruning; with 8 bits on 500 vecs expect decent overlap
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"LSH recall $recall too low")
  }

  test("winnowNearDup: exact dups share all fingerprints; near dups pair; unrelated don't") {
    val pairs = Similarity.winnowNearDup(docs, "doc_id", "text", k = 8, w = 4, minShared = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), "exact dup must share fingerprints")
    assert(pairs.contains((1L, 2L)), "near dup (one word changed) shares most fingerprints")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("winnow_fingerprint guarantee: shared substring >= k+w-1 yields a shared fingerprint") {
    val df = Seq(
      (1L, "zzzzzz THE COMMON SUBSTRING IS HERE xxxxxx"),
      (2L, "qqqq THE COMMON SUBSTRING IS HERE ppppppppp")
    ).toDF("doc_id", "text")
    // common substring length 31 >= k+w-1 = 8+4-1 = 11
    val pairs = Similarity.winnowNearDup(df, "doc_id", "text", k = 8, w = 4, minShared = 1)
    assert(pairs.count() == 1)
  }

  test("annIvf probes nProbe cells and achieves nonzero recall vs brute force") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 4)
    val brute = Similarity.annBruteForce(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvf(queries, emb, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.2, s"IVF recall $recall too low")
    // every query returns at most topK rows
    val counts = Similarity.annIvf(queries, emb, "vec_id", "embedding", 5)
      .groupBy("query_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ <= 5))
  }

  test("IVF cell assignment is a hash aggregate, not a window over the n×nCells expansion") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" < 4)
    // both the nProbe=1 argmax (max_by) and nProbe>1 (TopKAggregator) paths,
    // and the k-means trainer, must keep WindowExec out of the plan: a
    // window partitioned by vector id sort-shuffles nCells rows per vector,
    // while the aggregates combine map-side (Dedup.firstWinsAgg pattern)
    val ivfPlan = Similarity.annIvf(queries, emb, "vec_id", "embedding", 5,
      nCells = 16, nProbe = 4).queryExecution.executedPlan.toString
    assert(!ivfPlan.contains("Window"), ivfPlan)
    val trained = Similarity.trainIvfCentroids(emb.filter($"vec_id" < 64),
      "vec_id", "embedding", nCells = 4, iterations = 1)
    assert(trained.count() == 4) // plan is checkpoint-cut; count proves it ran
  }

  test("k-means-refined IVF centroids improve recall over seed centroids (planted clusters)") {
    // 8 well-separated clusters in 16-d; ids ordered so the first vectors
    // (the deterministic seeds) ALL come from cluster 0 — the worst case
    // for the seed quantizer, which Lloyd iterations must fix.
    val dim = 16
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val rows = for {
      c <- 0 until 8
      m <- 0 until 12
    } yield {
      // strong per-member deterministic noise in EVERY dim: members of the
      // same cluster disagree on which of the near-identical cluster-0
      // seeds is nearest, so the seed quantizer splits true clusters
      val v = Array.tabulate(dim)(j => 0.45f * (((c * 131 + m * 37 + j * 17) % 7) / 6.0f))
      v(c * 2) += 2.2f // cluster direction dominates true similarity
      // id layout: cluster-0 members get ids 0..11 (seeds), rest follow
      (c * 100L + m, unit(v))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 100 === 0) // one probe per cluster

    val brute = Similarity.annBruteForce(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(trained: Option[org.apache.spark.sql.DataFrame]): Double = {
      val got = Similarity.annIvf(queries, emb, "vec_id", "embedding", 5,
        nCells = 8, nProbe = 1, trainedCentroids = trained)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (brute intersect got).size.toDouble / brute.size
    }
    val seedRecall = recallOf(None)
    val trained = Similarity.trainIvfCentroids(emb, "vec_id", "embedding",
      nCells = 8, iterations = 5)
    assert(trained.count() == 8)
    val trainedRecall = recallOf(Some(trained))
    assert(trainedRecall > seedRecall,
      s"k-means must beat degenerate seeds: seed=$seedRecall trained=$trainedRecall")
    assert(trainedRecall >= 0.8, s"trained recall $trainedRecall too low")
  }

  test("lshPlan: the engine's 16x4 default is the planner's answer at t=0.5, and the curve shifts the right way") {
    // (1/16)^(1/4) = 0.5 exactly — the S-curve midpoint sits on the
    // threshold, so 16 bands x 4 rows must win for 64 perms at 0.5
    assert(Similarity.lshPlan(64, 0.5) == (16, 4))
    val (bLo, rLo) = Similarity.lshPlan(64, 0.2)
    val (bHi, rHi) = Similarity.lshPlan(64, 0.9)
    assert(bLo > 16 && rLo < 4, s"low threshold needs more bands: ($bLo,$rLo)")
    assert(bHi < 16 && rHi > 4, s"high threshold needs more rows: ($bHi,$rHi)")
    // recall bias: weighting false negatives up never DECREASES bands
    val (bRec, _) = Similarity.lshPlan(64, 0.9, fnWeight = 10.0)
    assert(bRec >= bHi, s"fnWeight must bias toward capture: $bRec < $bHi")
    // all plans factor the signature exactly
    Seq((64, 0.3), (128, 0.7), (96, 0.55)).foreach { case (n, t) =>
      val (b, r) = Similarity.lshPlan(n, t)
      assert(b * r == n)
    }
    intercept[IllegalArgumentException] { Similarity.lshPlan(64, 0.0) }
  }

  test("Lloyd ε-loop fixed point matches the fixed-K result on a converged run") {
    val emb = graft.Tables.embeddings(spark, sfDir).filter($"vec_id" < 200)
    // eps floor is the float32 unit-norm noise (~1e-7) — see scaladoc
    val conv = Similarity.trainIvfCentroidsToConvergence(
      emb, "vec_id", "embedding", nCells = 4, eps = 1e-6, maxIters = 40)
      .withColumnRenamed("centroid", "c_eps")
    // same seed, same deterministic iteration body: a fixed-K run long
    // enough to have converged must sit at the same fixed point
    val fixedK = Similarity.trainIvfCentroids(
      emb, "vec_id", "embedding", nCells = 4, iterations = 40)
      .withColumnRenamed("centroid", "c_k")
    val agreement = conv.join(fixedK, "cell")
      .select(graft.functions.Vectors.dotNative($"c_eps", $"c_k").as("d"))
      .as[Double].collect()
    assert(agreement.length == 4)
    agreement.foreach(d => assert(d > 1.0 - 1e-6,
      s"ε fixed point diverged from fixed-K: dot=$d"))
  }

  test("Lloyd ε-loop throws loudly when maxIters can't reach eps") {
    val emb = graft.Tables.embeddings(spark, sfDir).filter($"vec_id" < 200)
    val e = intercept[IllegalStateException] {
      Similarity.trainIvfCentroidsToConvergence(
        emb, "vec_id", "embedding", nCells = 4, eps = 1e-15, maxIters = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("annBruteForce top-1 of a query against itself-excluded set is its nearest cluster member") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val out = Similarity.annBruteForce(emb.filter($"vec_id" === 0L), emb, "vec_id", "embedding", 1)
    assert(out.count() == 1)
    assert(out.select("score").as[Double].head() <= 1.0001)
  }

  test("cosineNearDupLsh matches the brute-force form on real vectors, without a cross product") {
    val emb = graft.Tables.embeddings(spark, sfDir).filter($"vec_id" % 2 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    val brute = pairs(Similarity.cosineNearDup(emb, "vec_id", "embedding", 0.4))
    // q30's gate parameters (low threshold ⇒ low-selectivity tables, no
    // cap on the bounded sample); the 8-bit defaults target the cosine-0.9
    // near-duplicate regime and would trade this recall for selectivity
    val lsh = Similarity.cosineNearDupLsh(emb, "vec_id", "embedding", 0.4,
      nBits = 2, nTables = 32, maxBucket = 0)
    assert(pairs(lsh) == brute, "LSH candidates must reach every qualifying pair with exact scores")
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("dedupClusters: transitive chains collapse to one min-id representative") {
    val nodes = (1L to 10L).toDF("doc_id")
    // chain 1-2-3-4 (diameter 3), pair 6-7, singletons 5,8,9,10
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)).toDF("id_a", "id_b")
    val labels = Similarity.dedupClusters(pairs, nodes, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L), s"chain must share rep 1: $labels")
    assert(labels(6L) == 6L && labels(7L) == 6L)
    assert(Seq(5L, 8L, 9L, 10L).forall(id => labels(id) == id), "singletons keep themselves")
  }

  test("dedupClusters: exceeding maxRounds throws instead of silently splitting clusters") {
    val nodes = (1L to 4L).toDF("doc_id")
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b") // diameter 3 → 4 rounds
    val e = intercept[IllegalStateException] {
      Similarity.dedupClusters(chain, nodes, "doc_id", maxRounds = 3)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("dedupClusters: representative is cluster-min regardless of edge direction") {
    val nodes = Seq(3L, 9L, 5L).toDF("doc_id")
    val pairs = Seq((9L, 5L), (5L, 3L)).toDF("id_a", "id_b")
    val labels = Similarity.dedupClusters(pairs, nodes, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(3L -> 3L, 9L -> 3L, 5L -> 3L))
  }

  test("dedupClustersLogRounds ≡ label propagation on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 12) {
      val n = 4 + rnd.nextInt(30)
      val ids = (0 until n).map(_.toLong)
      val nEdges = rnd.nextInt(2 * n)
      val edges = Seq.fill(nEdges) {
        val a = ids(rnd.nextInt(n)); val b = ids(rnd.nextInt(n))
        (a, b)
      }.filter(p => p._1 != p._2)
      val nodes = ids.toDF("doc_id")
      val pairs = edges.toDF("id_a", "id_b")
      val lp = Similarity.dedupClusters(pairs, nodes, "doc_id", maxRounds = 64)
        .as[(Long, Long)].collect().toMap
      val ls = Similarity.dedupClustersLogRounds(pairs, nodes, "doc_id")
        .as[(Long, Long)].collect().toMap
      assert(ls == lp, s"trial $trial (n=$n, edges=$edges): $ls vs $lp")
    }
  }

  test("log-rounds contraction collapses a chain label propagation's bound rejects") {
    // 64-node chain: diameter 63 — label propagation at maxRounds=20 throws
    // (existing spec), star contraction needs ~log2(64) double-rounds
    val n = 64
    val nodes = (0L until n.toLong).toDF("doc_id")
    val chain = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val labels = Similarity.dedupClustersLogRounds(chain, nodes, "doc_id", maxRounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == n && labels.values.forall(_ == 0L),
      s"chain must collapse to representative 0: $labels")
  }

  test("capBuckets prunes only over-occupied buckets") {
    val df = (Seq.fill(100)("hot") ++ Seq.fill(3)("cold")).zipWithIndex
      .map { case (b, i) => (i.toLong, b) }.toDF("id", "bucket")
    val capped = Similarity.capBuckets(df, Seq("bucket"), cap = 10)
    assert(capped.filter($"bucket" === "hot").count() == 0, "hot bucket must be dropped")
    assert(capped.filter($"bucket" === "cold").count() == 3, "small bucket untouched")
    assert(Similarity.capBuckets(df, Seq("bucket"), cap = 0).count() == 103, "cap<=0 is a no-op")
  }

  test("maxBucket bounds the quadratic candidate join under an adversarial hot bucket") {
    // 60 byte-identical docs: every band/chunk bucket they occupy has size 60,
    // so an uncapped join would emit 60*59/2 = 1770 candidate pairs from pure
    // boilerplate. Two distinct near-dup docs must still pair through their
    // own (small) buckets.
    val boiler = (0 until 60).map(i => (i.toLong, "lorem ipsum dolor sit amet " * 4))
    val pair = Seq(
      (100L, "a genuinely unique document about spark shuffles and parquet files"),
      (101L, "a genuinely unique document about spark shuffles and parquet pages"))
    val docs = (boiler ++ pair).toDF("doc_id", "text")

    val uncapped = Similarity.minhashNearDup(docs, "doc_id", "text", 0.5, maxBucket = 0)
    val capped = Similarity.minhashNearDup(docs, "doc_id", "text", 0.5, maxBucket = 10)
    assert(uncapped.count() >= 1770, "uncapped join is quadratic in the hot bucket")
    val cappedPairs = capped.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!cappedPairs.exists(p => p._1 < 100L && p._2 < 100L),
      "boilerplate pairs must be pruned by the bucket cap")
    assert(cappedPairs.contains((100L, 101L)), "small-bucket near-dups still pair")

    val simUncapped = Similarity.simhashNearDup(docs, "doc_id", "text", maxBucket = 0)
    val simCapped = Similarity.simhashNearDup(docs, "doc_id", "text", maxBucket = 10)
    assert(simUncapped.count() >= 1770)
    val simPairs = simCapped.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!simPairs.exists(p => p._1 < 100L && p._2 < 100L))
  }

  test("default maxBucket leaves normal-corpus output unchanged") {
    val docs = graft.Tables.documents(spark, sfDir)
    val base = Similarity.minhashNearDup(docs, "doc_id", "text", 0.7, maxBucket = 0)
      .collect().map(_.toSeq).toSet
    val guarded = Similarity.minhashNearDup(docs, "doc_id", "text", 0.7)
      .collect().map(_.toSeq).toSet
    assert(base == guarded)
  }

  test("clusterSurvivorsBest keeps the highest score, ties to the smallest id") {
    // component {1,2,3}: scores 5, 9, 9 -> survivor 2 (max score, min id);
    // component {7,8}: scores 4, 1 -> survivor 7; singleton 9 survives
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val nodes = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (7L, 4.0), (8L, 1.0),
      (9L, 2.0)).toDF("id", "score")
    val out = Similarity.clusterSurvivorsBest(pairs, nodes, "id", "score")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 3L), (7L, 7L, 2L), (9L, 9L, 1L)))
    val kept = Similarity.dedupKeepBest(nodes, pairs, "id", "score")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 7L, 9L))
  }

  test("clusterSurvivorsBest tie-break works for STRING ids (no numeric negation)") {
    // tied scores in one cluster of string ids: the survivor must be the
    // lexicographically smallest, deterministically
    val pairs = Seq(("doc-b", "doc-a"), ("doc-a", "doc-c"))
      .toDF("id_a", "id_b")
    val nodes = Seq(("doc-c", 1.0), ("doc-b", 1.0), ("doc-a", 1.0),
      ("doc-z", 0.5)).toDF("id", "score")
    val out = Similarity.clusterSurvivorsBest(pairs, nodes, "id", "score")
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("doc-a", "doc-a", 3L), ("doc-z", "doc-z", 1L)))
    // and an all-null-score cluster keeps its min-id member, not nothing
    val nullScores = Seq(("doc-a", Option.empty[Double]),
      ("doc-b", Option.empty[Double])).toDF("id", "score")
    val np = Seq(("doc-a", "doc-b")).toDF("id_a", "id_b")
    val out2 = Similarity.clusterSurvivorsBest(np, nullScores, "id", "score")
      .as[(String, String, Long)].collect().toSeq
    assert(out2 == Seq(("doc-a", "doc-a", 2L)))
  }

  test("clusterSurvivorsBest with the min-id score reproduces dedupClusters' convention") {
    // score = -id makes "best" = smallest id, i.e. the label itself
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val nodes = (Seq(10L, 11L, 12L, 20L, 21L, 30L)).map(i => (i, -i.toDouble))
      .toDF("id", "score")
    val out = Similarity.clusterSurvivorsBest(pairs, nodes, "id", "score")
      .as[(Long, Long, Long)].collect().toSet
    assert(out.forall { case (label, survivor, _) => label == survivor })
  }
}
