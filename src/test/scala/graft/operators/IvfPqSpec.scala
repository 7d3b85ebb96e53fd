package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  // unit vectors on a ring, stacked into 8 dims (both halves rotate)
  private def ring(n: Int) = (0 until n).map { i =>
    val th = 2 * math.Pi * i / n
    val c = (math.cos(th) / math.sqrt(2)).toFloat
    val s = (math.sin(th) / math.sqrt(2)).toFloat
    (i.toLong, Seq(c, s, 0.0f, 0.0f, c, s, 0.0f, 0.0f))
  }.toDF("id", "v")

  test("planted twins survive coarse probe + ADC + refine at rank 1 with exact scores") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(64)
    IvfPq.build(store, "ix", corpus, "id", "v", dim = 8, nCells = 8,
      m = 2, ksub = 8, iterations = 3)
    val queries = corpus.filter($"id" >= 5 && $"id" < 12)
      .select(($"id" + 1000L).as("id"), $"v")
    val got = IvfPq.probe(store, "ix", queries, "id", "v", dim = 8, topK = 1,
        m = 2, ksub = 8)
      .select("query_id", "neighbor_id", "score")
      .as[(Long, Long, Double)].collect()
    assert(got.length == 7)
    got.foreach { case (q, n, s) =>
      assert(n == q - 1000L, s"twin of ${q - 1000} lost in the pipeline (got $n)")
      assert(math.abs(s - 1.0) < 1e-6, s"refined score must be the exact dot: $s")
    }
  }

  test("build writes the full five-table family and verifyFresh covers it") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfpq_t").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(32)
    IvfPq.build(store, "ix", corpus, "id", "v", dim = 8, nCells = 4,
      m = 2, ksub = 8, iterations = 2)
    Seq("ix_centroids", "ix_cells", "ix_meta", "ix_pq_codebook", "ix_pq_codes")
      .foreach(t => assert(store.read(t).nonEmpty, s"missing table $t"))
    IvfIndex.verifyFresh(store, "ix", corpus, "id")
    val e = intercept[RuntimeException] {
      IvfIndex.verifyFresh(store, "ix", corpus.filter($"id" =!= 0L), "id")
    }
    assert(e.getMessage.contains("STALE"))
  }

  test("probe agrees with the uncompressed IvfIndex probe on the same index (refine exactness)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfpq_eq").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(48)
    IvfPq.build(store, "ix", corpus, "id", "v", dim = 8, nCells = 6,
      m = 2, ksub = 8, iterations = 2)
    val queries = corpus.filter($"id" < 5).select(($"id" + 500L).as("id"), $"v")
    val compressed = IvfPq.probe(store, "ix", queries, "id", "v", dim = 8,
        topK = 3, m = 2, ksub = 8, shortlist = 48)
      .orderBy("query_id", "rank").as[(Long, Long, Long, Double)].collect().toSeq
    val float = IvfIndex.probe(store, "ix", queries, "id", "v", topK = 3)
      .orderBy("query_id", "rank").as[(Long, Long, Long, Double)].collect().toSeq
    assert(compressed == float,
      s"with an uncapping shortlist, ADC+refine must equal the float probe:\n$compressed\nvs\n$float")
  }

  test("append: frozen codebook + frozen centroids; replay no-ops; appended twins retrievable") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfpq_app").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(64)
    IvfPq.build(store, "ix", corpus.filter($"id" < 40), "id", "v", dim = 8,
      nCells = 8, m = 2, ksub = 8, iterations = 3)
    val cbBefore = store.read("ix_pq_codebook").get.collect().toSet
    IvfPq.append(store, "ix", corpus.filter($"id" >= 40 && $"id" < 52),
      "id", "v", dim = 8, batchId = 1L, m = 2)
    val metaAfter1 = store.read("ix_meta").get.head()
    IvfPq.append(store, "ix", corpus.filter($"id" >= 40 && $"id" < 52),
      "id", "v", dim = 8, batchId = 1L, m = 2) // replay
    assert(store.read("ix_meta").get.head() == metaAfter1, "replay moved the fingerprint")
    IvfPq.append(store, "ix", corpus.filter($"id" >= 52), "id", "v", dim = 8,
      batchId = 2L, m = 2)
    assert(store.read("ix_pq_codebook").get.collect().toSet == cbBefore,
      "append retrained the codebook")
    IvfIndex.verifyFresh(store, "ix", corpus, "id")
    // exactly one code row per corpus vector (no duplicates across segments)
    val codes = store.read("ix_pq_codes").get
    assert(codes.count() == 64 && codes.select("id").distinct().count() == 64)
    val queries = corpus.filter($"id" >= 44 && $"id" < 50)
      .select(($"id" + 1000L).as("id"), $"v")
    val got = IvfPq.probe(store, "ix", queries, "id", "v", dim = 8, topK = 1,
        m = 2, ksub = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (44L until 50L).foreach { i =>
      assert(got(i + 1000L) == i, s"appended twin of $i: ${got.get(i + 1000L)}")
    }
  }
}
