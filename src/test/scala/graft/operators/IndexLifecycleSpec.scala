package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Delete + compaction lifecycle across the stored-index family (VERDICT
  * r9 items 1-2): every index supports `delete(ids)` with the
  * fingerprint-last crash ordering, delete + re-append converges to the
  * one-shot build over the final corpus, and the IVF code tables compact
  * like BM25's postings segments. */
class IndexLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana cherry"),
    (2L, "apple apple banana"),
    (3L, "durian elderberry fig grape honeydew"),
    (4L, "apple durian"),
    (5L, "banana banana banana banana"),
    (6L, "cherry fig apple"),
    (7L, "grape grape banana durian"),
    (8L, "elderberry apple apple cherry")
  ).toDF("doc_id", "text")

  private def q(rows: (Long, String)*) = rows.toDF("query_id", "term")

  private def ring(n: Int, dim: Int = 8) = (0 until n).map { i =>
    val th = 2 * math.Pi * i / n
    (i.toLong, (Array(math.cos(th).toFloat, math.sin(th).toFloat) ++
      Array.fill(dim - 2)(0.0f)).toSeq)
  }.toDF("id", "v")

  // ------------------------------------------------------------- BM25

  test("bm25 delete removes docs and search matches one-shot over the remaining corpus") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bmdel").toString
    val store = new ParquetTableStore(spark, wh)
    Bm25Index.build(store, "bx", docs.filter($"doc_id" <= 4), "doc_id", "text")
    Bm25Index.append(store, "bx", docs.filter($"doc_id" > 4), "doc_id", "text", 1L)
    val removed = Bm25Index.delete(store, "bx", Seq(3L, 5L).toDF("doc_id"), "doc_id")
    assert(removed == 2L)
    val remaining = docs.filter(!$"doc_id".isin(3L, 5L))
    Bm25Index.verifyFresh(store, "bx", remaining, "doc_id")
    val queries = q(1L -> "apple", 1L -> "banana", 2L -> "durian")
    val fromIndex = Bm25Index.search(store, "bx", queries, 10)
      .orderBy("query_id", "rank").as[(Long, Long, Long, Double)].collect().toSeq
    val oneShot = Bm25.search(remaining, "doc_id", "text", queries, 10)
      .orderBy("query_id", "rank").as[(Long, Long, Long, Double)].collect().toSeq
    assert(fromIndex == oneShot,
      s"post-delete index diverges from one-shot over remaining corpus:\n$fromIndex\nvs\n$oneShot")
    // absent ids: converging no-op
    assert(Bm25Index.delete(store, "bx", Seq(3L).toDF("doc_id"), "doc_id") == 0L)
  }

  test("bm25 upsertDocs (delete + append) equals one-shot build over the edited corpus; replays no-op") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bmup").toString
    val store = new ParquetTableStore(spark, wh)
    Bm25Index.build(store, "bx", docs.filter($"doc_id" <= 5), "doc_id", "text")
    Bm25Index.append(store, "bx", docs.filter($"doc_id" > 5), "doc_id", "text", 1L)
    // batch 2: doc 2 edited, doc 9 brand new, doc 6 unchanged re-send
    val batch = Seq((2L, "apple pie recipe"), (9L, "honeydew fig"),
      (6L, "cherry fig apple")).toDF("doc_id", "text")
    Bm25Index.upsertDocs(store, "bx", batch, "doc_id", "text", 2L)
    val metaAfter = store.read("bx_meta").get.head()
    Bm25Index.upsertDocs(store, "bx", batch, "doc_id", "text", 2L) // replay
    assert(store.read("bx_meta").get.head() == metaAfter, "upsertDocs replay moved the fingerprint")
    val finalCorpus = docs.filter($"doc_id" =!= 2L)
      .unionByName(Seq((2L, "apple pie recipe"), (9L, "honeydew fig")).toDF("doc_id", "text"))
    Bm25Index.verifyFresh(store, "bx", finalCorpus, "doc_id")
    val queries = q(1L -> "apple", 1L -> "recipe", 2L -> "fig")
    val fromIndex = Bm25Index.search(store, "bx", queries, 10)
      .orderBy("query_id", "rank").as[(Long, Long, Long, Double)].collect().toSeq
    val oneShot = Bm25.search(finalCorpus, "doc_id", "text", queries, 10)
      .orderBy("query_id", "rank").as[(Long, Long, Long, Double)].collect().toSeq
    assert(fromIndex == oneShot,
      s"upsertDocs index diverges from one-shot over edited corpus:\n$fromIndex\nvs\n$oneShot")
  }

  test("bm25 delete crash ordering: a partial delete is loud at attest and converges on re-run") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bmcr").toString
    val store = new ParquetTableStore(spark, wh)
    Bm25Index.build(store, "bx", docs, "doc_id", "text")
    // simulate a crash AFTER the postings delete, BEFORE docs/meta: the
    // meta fingerprint is written last, so it still counts doc 4
    store.deletePartitioned("bx_postings", Seq(4L).toDF("id"), Seq("id"), "seg")
    val remaining = docs.filter($"doc_id" =!= 4L)
    val e = intercept[RuntimeException] {
      Bm25Index.verifyFresh(store, "bx", remaining, "doc_id")
    }
    assert(e.getMessage.contains("STALE"), e.getMessage)
    // re-running the interrupted delete converges
    Bm25Index.delete(store, "bx", Seq(4L).toDF("doc_id"), "doc_id")
    Bm25Index.verifyFresh(store, "bx", remaining, "doc_id")
  }

  // -------------------------------------------------------- IVF float

  test("ivf delete: deleted ids stop answering probes; twins of survivors still rank 1") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfdel").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(64)
    IvfIndex.build(store, "ix", corpus, "id", "v", nCells = 8, iterations = 3)
    val removed = IvfIndex.delete(store, "ix",
      (10L to 20L).toDF("id"), "id")
    assert(removed == 11L)
    val remaining = corpus.filter(!$"id".between(10L, 20L))
    IvfIndex.verifyFresh(store, "ix", remaining, "id")
    // twin of surviving id 5 -> rank 1; twin of DELETED id 15 -> its
    // nearest SURVIVING neighbor (14 or 16... deleted; ring distance says 9 or 21)
    val queries = corpus.filter($"id".isin(5L, 15L))
      .select(($"id" + 1000L).as("id"), $"v")
    val got = IvfIndex.probe(store, "ix", queries, "id", "v", topK = 1, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(got(1005L) == 5L)
    assert(got(1015L) == 9L || got(1015L) == 21L,
      s"twin of deleted 15 must retrieve the nearest survivor, got ${got(1015L)}")
    // absent ids: no-op
    assert(IvfIndex.delete(store, "ix", Seq(15L).toDF("id"), "id") == 0L)
  }

  // ------------------------------------------------------- IVF-SQ / PQ

  test("ivf-sq delete keeps codes≡cells parity; a half-done delete is loud at attest") {
    val wh = java.nio.file.Files.createTempDirectory("graft_sqdel").toString
    val store = new ParquetTableStore(spark, wh)
    val full = ring(80)
    IvfSq.build(store, "ix", full.filter($"id" < 64), "id", "v",
      nCells = 8, iterations = 3)
    IvfSq.append(store, "ix", full.filter($"id" >= 64), "id", "v", 1L)
    IvfSq.verifyFresh(store, "ix", full, "id")
    IvfSq.delete(store, "ix", (70L to 75L).toDF("id"), "id")
    val remaining = full.filter(!$"id".between(70L, 75L))
    IvfSq.verifyFresh(store, "ix", remaining, "id")
    val got = IvfSq.probe(store, "ix",
        full.filter($"id" === 8L).select(($"id" + 1000L).as("id"), $"v"),
        "id", "v", topK = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(got(1008L) == 8L)
    // deleted ids never appear in probes of their own twins
    val delTwin = IvfSq.probe(store, "ix",
        full.filter($"id" === 72L).select(($"id" + 1000L).as("id"), $"v"),
        "id", "v", topK = 5, nProbe = 8)
      .select("neighbor_id").as[Long].collect().toSet
    assert(delTwin.intersect((70L to 75L).toSet).isEmpty,
      s"deleted ids still answering probes: $delTwin")
    // half-done delete (cells removed, codes not): INCONSISTENT, loudly
    IvfIndex.delete(store, "ix", Seq(60L).toDF("id"), "id")
    val e = intercept[RuntimeException] {
      IvfSq.verifyFresh(store, "ix", remaining.filter($"id" =!= 60L), "id")
    }
    assert(e.getMessage.contains("INCONSISTENT"), e.getMessage)
    // re-running the family delete converges
    IvfSq.delete(store, "ix", Seq(60L).toDF("id"), "id")
    IvfSq.verifyFresh(store, "ix", remaining.filter($"id" =!= 60L), "id")
  }

  test("ivf-pq delete: parity attest + twins of survivors still rank 1") {
    val wh = java.nio.file.Files.createTempDirectory("graft_pqdel").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(64)
    IvfPq.build(store, "ix", corpus, "id", "v", dim = 8, nCells = 8,
      m = 4, iterations = 3)
    IvfPq.delete(store, "ix", (30L to 40L).toDF("id"), "id")
    val remaining = corpus.filter(!$"id".between(30L, 40L))
    IvfPq.verifyFresh(store, "ix", remaining, "id")
    val got = IvfPq.probe(store, "ix",
        corpus.filter($"id" === 3L).select(($"id" + 1000L).as("id"), $"v"),
        "id", "v", dim = 8, topK = 1, m = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(got(1003L) == 3L)
  }

  test("minhash delete: removed docs stop surfacing as dup candidates; attest stays honest") {
    val wh = java.nio.file.Files.createTempDirectory("graft_mhdel").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "an entirely different document about spark"),
      (3L, "rows and columns and shuffles and joins")).toDF("doc_id", "text")
    MinHashIndex.build(store, "ix", corpus, "doc_id", "text")
    // a batch near-identical to doc 1 probes as its dup...
    val batch = Seq((10L, "the quick brown fox jumps over the lazy dog today"))
      .toDF("doc_id", "text")
    val pre = MinHashIndex.probe(store, "ix", batch, "doc_id", "text", 0.3)
      .select("corpus_id").as[Long].collect().toSet
    assert(pre.contains(1L), s"fixture broken: expected doc 1 as candidate, got $pre")
    // ...until doc 1 is deleted (takedown): no candidate, attest honest
    assert(MinHashIndex.delete(store, "ix", Seq(1L).toDF("doc_id"), "doc_id") == 1L)
    MinHashIndex.verifyFresh(store, "ix", corpus.filter($"doc_id" =!= 1L), "doc_id")
    val post = MinHashIndex.probe(store, "ix", batch, "doc_id", "text", 0.3)
      .select("corpus_id").as[Long].collect().toSet
    assert(!post.contains(1L), s"deleted doc still surfaces as dup candidate: $post")
  }

  test("minhash checkHealth surfaces over-cap buckets (the rows the probe cap would silence)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_mhh").toString
    val store = new ParquetTableStore(spark, wh)
    // 3 distinct docs + 6 near-identical boilerplate docs: the
    // boilerplate's shingles pile into shared buckets
    val docs = (Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa"),
      (3L, "lambda mu nu xi omicron")) ++
      (10L to 15L).map(i => (i, "same boilerplate text everywhere forever")))
      .toDF("doc_id", "text")
    MinHashIndex.build(store, "ix", docs, "doc_id", "text")
    val h = MinHashIndex.checkHealth(store, "ix", maxBucket = 4)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(h._2 == 6L, s"hottest bucket must hold the 6 boilerplate docs: $h")
    assert(h._4 > 0L, s"over-cap buckets must be counted: $h")
    assert(h._5 > 0.0 && h._5 < 1.0, s"over-cap row share must be a fraction: $h")
    // a clean index reads zero over-cap
    val wh2 = java.nio.file.Files.createTempDirectory("graft_mhh2").toString
    val store2 = new ParquetTableStore(spark, wh2)
    MinHashIndex.build(store2, "ix", docs.filter($"doc_id" <= 3), "doc_id", "text")
    val h2 = MinHashIndex.checkHealth(store2, "ix", maxBucket = 4)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(h2._4 == 0L && h2._5 == 0.0, s"clean index must read zero over-cap: $h2")
  }

  // ------------------------------------------- in-place vector updates

  test("ivf upsertVectors: a cross-cell vector change is rejected by append, applied by upsert") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfup").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(32)
    IvfIndex.build(store, "ix", corpus, "id", "v", nCells = 8, iterations = 3)
    // id 3 flips to the opposite side of the ring: different cell
    val flipped = corpus.filter($"id" === 3L)
      .select($"id", transform($"v", x => -x).as("v"))
    val e = intercept[RuntimeException] {
      IvfIndex.append(store, "ix", flipped, "id", "v")
    }
    assert(e.getMessage.contains("CHANGED vector"), e.getMessage)
    IvfIndex.upsertVectors(store, "ix", flipped, "id", "v")
    IvfIndex.upsertVectors(store, "ix", flipped, "id", "v") // replay: no-op
    // ids unchanged -> attest passes; the stored vector must be the NEW one
    IvfIndex.verifyFresh(store, "ix", corpus, "id")
    val q = flipped.select(($"id" + 1000L).as("id"), $"v")
    val got = IvfIndex.probe(store, "ix", q, "id", "v", topK = 1, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(got(1003L) == 3L, s"updated vector not retrievable at its new location: $got")
  }

  test("ivf-sq: a SAME-cell vector change trips the changed-code guard; upsertVectors re-encodes") {
    val wh = java.nio.file.Files.createTempDirectory("graft_squp").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(32)
    IvfSq.build(store, "ix", corpus, "id", "v", nCells = 8, iterations = 3)
    // id 5 shrinks to half length: SAME direction (same cell), different
    // SQ scale -> the moved-cell guard is blind to it, the code guard is not
    val shrunk = corpus.filter($"id" === 5L)
      .select($"id", transform($"v", x => x * 0.5f).as("v"))
    val e = intercept[RuntimeException] {
      IvfSq.append(store, "ix", shrunk, "id", "v", batchId = 1L)
    }
    assert(e.getMessage.contains("different codes"), e.getMessage)
    IvfSq.upsertVectors(store, "ix", shrunk, "id", "v", batchId = 1L)
    val metaAfter = store.read("ix_meta").get.head()
    IvfSq.upsertVectors(store, "ix", shrunk, "id", "v", batchId = 1L) // replay
    assert(store.read("ix_meta").get.head() == metaAfter, "upsert replay moved the fingerprint")
    IvfSq.verifyFresh(store, "ix", corpus, "id") // ids unchanged + parity
    // the stored codes must now be the NEW vector's encoding
    val storedScale = store.read("ix_sq_codes").get.filter($"id" === 5L)
      .select("scale").as[Double].head()
    val freshScale = ScalarQuantizer.encode(shrunk, "id", "v")
      .select("scale").as[Double].head()
    assert(math.abs(storedScale - freshScale) < 1e-12,
      s"stale scale survived the upsert: $storedScale vs $freshScale")
  }

  test("ivf-pq upsertVectors: changed codes re-encoded under the frozen codebook") {
    val wh = java.nio.file.Files.createTempDirectory("graft_pqup").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(32)
    IvfPq.build(store, "ix", corpus, "id", "v", dim = 8, nCells = 8,
      m = 4, iterations = 3)
    // id 9 flips: different cell AND different codes
    val flipped = corpus.filter($"id" === 9L)
      .select($"id", transform($"v", x => -x).as("v"))
    val cbBefore = store.read("ix_pq_codebook").get.orderBy("sub", "code")
      .collect().toSeq
    IvfPq.upsertVectors(store, "ix", flipped, "id", "v", dim = 8, batchId = 1L, m = 4)
    IvfPq.verifyFresh(store, "ix", corpus, "id")
    // codebook frozen byte-for-byte; the flipped twin retrieves at rank 1
    assert(store.read("ix_pq_codebook").get.orderBy("sub", "code")
      .collect().toSeq == cbBefore, "upsert retrained the codebook")
    val q = flipped.select(($"id" + 1000L).as("id"), $"v")
    val got = IvfPq.probe(store, "ix", q, "id", "v", dim = 8, topK = 1,
        m = 4, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(got(1009L) == 9L, s"updated vector not retrievable: $got")
  }

  // ------------------------------------------------------- compaction

  test("ivf-sq code-segment compaction: one segment after, probes identical, appends continue") {
    val wh = java.nio.file.Files.createTempDirectory("graft_sqcmp").toString
    val store = new ParquetTableStore(spark, wh)
    IvfSq.build(store, "ix", ring(80).filter($"id" < 40), "id", "v",
      nCells = 8, iterations = 3)
    IvfSq.append(store, "ix", ring(80).filter($"id" >= 40 && $"id" < 60), "id", "v", 1L)
    IvfSq.append(store, "ix", ring(80).filter($"id" >= 60), "id", "v", 2L)
    val queries = ring(80).filter($"id".isin(7L, 33L))
      .select(($"id" + 1000L).as("id"), $"v")
    def probeNow() = IvfSq.probe(store, "ix", queries, "id", "v", topK = 3)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val before = probeNow()
    val (segs, rows) = IvfSq.compactCodeSegments(store, "ix")
    assert(segs == 3, s"expected 3 code segments before compaction, saw $segs")
    assert(rows == 80L)
    assert(store.read("ix_sq_codes").get.select("seg").distinct().count() == 1)
    assert(probeNow() == before, "compaction changed probe results")
    IvfSq.append(store, "ix", ring(90).filter($"id" >= 80), "id", "v", 3L)
    IvfSq.verifyFresh(store, "ix", ring(90), "id")
  }

  test("ivf-pq code-segment compaction: one segment after, probes identical, appends continue") {
    val wh = java.nio.file.Files.createTempDirectory("graft_pqcmp").toString
    val store = new ParquetTableStore(spark, wh)
    IvfPq.build(store, "ix", ring(80).filter($"id" < 50), "id", "v",
      dim = 8, nCells = 8, m = 4, iterations = 3)
    IvfPq.append(store, "ix", ring(80).filter($"id" >= 50), "id", "v",
      dim = 8, batchId = 1L, m = 4)
    val queries = ring(80).filter($"id".isin(11L, 62L))
      .select(($"id" + 1000L).as("id"), $"v")
    def probeNow() = IvfPq.probe(store, "ix", queries, "id", "v",
        dim = 8, topK = 3, m = 4)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val before = probeNow()
    val (segs, rows) = IvfPq.compactCodeSegments(store, "ix")
    assert(segs == 2, s"expected 2 code segments before compaction, saw $segs")
    assert(rows == 80L)
    assert(store.read("ix_pq_codes").get.select("seg").distinct().count() == 1)
    assert(probeNow() == before, "compaction changed probe results")
    IvfPq.append(store, "ix", ring(90).filter($"id" >= 80), "id", "v",
      dim = 8, batchId = 2L, m = 4)
    IvfPq.verifyFresh(store, "ix", ring(90), "id")
  }
}
