package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScalarQuantizerSpec extends SparkSpec {
  import spark.implicits._

  test("encode: hand-computed scale and round-half-away codes") {
    val df = Seq((1L, Array(0.5f, -1.0f, 0.25f, 0.0f))).toDF("id", "v")
    val r = ScalarQuantizer.encode(df, "id", "v").head()
    assert(r.getDouble(1) == 1.0)
    // 0.5·127 = 63.5 → 64 (half away from zero); -1·127 → -127;
    // 0.25·127 = 31.75 → 32; 0 → 0
    assert(r.getSeq[Int](2) == Seq(64, -127, 32, 0), r.getSeq[Int](2).toString)
  }

  test("zero vectors quantize to zero codes with scale 0, not a division error") {
    val df = Seq((1L, Array(0.0f, 0.0f))).toDF("id", "v")
    val r = ScalarQuantizer.encode(df, "id", "v").head()
    assert(r.getDouble(1) == 0.0 && r.getSeq[Int](2) == Seq(0, 0))
  }

  test("planted twins self-retrieve at rank 1 through the quantized scan") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val codes = ScalarQuantizer.encode(emb, "vec_id", "embedding")
    val planted = emb.filter($"vec_id" < 8)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val got = ScalarQuantizer.search(planted, codes, "vec_id", "embedding", 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 8L).foreach(i => assert(got(i + 1000000L) == i,
      s"twin of $i not rank-1: $got"))
  }

  test("IvfSq: stored build + pruned probe self-retrieves twins; staleness is loud") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfsq").toString
    val store = new ParquetTableStore(spark, wh)
    val emb = graft.Tables.embeddings(spark, sfDir)
    IvfSq.build(store, "ix", emb, "vec_id", "embedding", iterations = 1)
    IvfIndex.verifyFresh(store, "ix", emb, "vec_id")
    val planted = emb.filter($"vec_id" < 8)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val got = IvfSq.probe(store, "ix", planted, "vec_id", "embedding", 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 8L).foreach(i => assert(got(i + 1000000L) == i,
      s"twin of $i not rank-1 through the pruned SQ scan: $got"))
    // a changed corpus must fail freshness, not probe silently
    val e = intercept[RuntimeException] {
      IvfIndex.verifyFresh(store, "ix", emb.filter($"vec_id" =!= 0L), "vec_id")
    }
    assert(e.getMessage.contains("STALE"))
  }

  test("IvfSq append: replay no-ops, no duplicate code rows, appended twins retrievable") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfsq_app").toString
    val store = new ParquetTableStore(spark, wh)
    val emb = graft.Tables.embeddings(spark, sfDir)
    IvfSq.build(store, "ix", emb.filter($"vec_id" < 300), "vec_id", "embedding",
      iterations = 1)
    IvfSq.append(store, "ix", emb.filter($"vec_id" >= 300 && $"vec_id" < 400),
      "vec_id", "embedding", batchId = 1L)
    val metaAfter1 = store.read("ix_meta").get.head()
    IvfSq.append(store, "ix", emb.filter($"vec_id" >= 300 && $"vec_id" < 400),
      "vec_id", "embedding", batchId = 1L) // replay
    assert(store.read("ix_meta").get.head() == metaAfter1, "replay moved the fingerprint")
    IvfSq.append(store, "ix", emb.filter($"vec_id" >= 400), "vec_id",
      "embedding", batchId = 2L)
    IvfIndex.verifyFresh(store, "ix", emb, "vec_id")
    val codes = store.read("ix_sq_codes").get
    val n = emb.count()
    assert(codes.count() == n && codes.select("id").distinct().count() == n,
      "duplicate or missing code rows after appends")
    val planted = emb.filter($"vec_id" >= 320 && $"vec_id" < 326)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val got = IvfSq.probe(store, "ix", planted, "vec_id", "embedding", 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (320L until 326L).foreach(i => assert(got(i + 1000000L) == i,
      s"appended twin of $i not rank-1: $got"))
  }

  test("SQ8 search plan: broadcast queries, TopK aggregate, no window") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val codes = ScalarQuantizer.encode(emb, "vec_id", "embedding")
    val q = emb.filter($"vec_id" < 4)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val plan = ScalarQuantizer.search(q, codes, "vec_id", "embedding", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan) // top-k is the O(k) aggregator
    assert(plan.contains("Broadcast"), plan) // queries ride to the scan side
  }

  test("SQ8 top-1 agrees with float brute force on nearly all real queries") {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val queries = emb.filter($"vec_id" >= 100 && $"vec_id" < 140)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val exact = Similarity.annBruteForce(queries, emb, "vec_id", "embedding", 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val codes = ScalarQuantizer.encode(emb, "vec_id", "embedding")
    val sq8 = ScalarQuantizer.search(queries, codes, "vec_id", "embedding", 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val agree = exact.count { case (q, n) => sq8.get(q).contains(n) }
    assert(agree >= 36, s"SQ8 top-1 agreement too low: $agree/40")
  }
}
