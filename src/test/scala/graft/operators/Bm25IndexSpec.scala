package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25IndexSpec extends SparkSpec {
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

  test("stored-index search is bit-equal to one-shot Bm25.search; appends maintain N/avgdl/df") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bm25_ix").toString
    val store = new ParquetTableStore(spark, wh)
    Bm25Index.build(store, "bx", docs.filter($"doc_id" <= 3), "doc_id", "text")
    Bm25Index.append(store, "bx", docs.filter($"doc_id" > 3 && $"doc_id" <= 6), "doc_id", "text", 1L)
    val metaAfter1 = store.read("bx_meta").get.head()
    Bm25Index.append(store, "bx", docs.filter($"doc_id" > 3 && $"doc_id" <= 6), "doc_id", "text", 1L)
    assert(store.read("bx_meta").get.head() == metaAfter1, "replay moved the fingerprint")
    // re-send of already-indexed identical docs under a NEW batch id:
    // must also no-op (the anti-join skip), not duplicate postings
    Bm25Index.append(store, "bx", docs.filter($"doc_id" === 5), "doc_id", "text", 7L)
    assert(store.read("bx_meta").get.head() == metaAfter1, "re-send duplicated a doc")
    Bm25Index.append(store, "bx", docs.filter($"doc_id" > 6), "doc_id", "text", 2L)
    Bm25Index.verifyFresh(store, "bx", docs, "doc_id")
    val queries = q(1L -> "apple", 1L -> "durian", 2L -> "banana")
    val fromIndex = Bm25Index.search(store, "bx", queries, 10)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val oneShot = Bm25.search(docs, "doc_id", "text", queries, 10)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(fromIndex == oneShot,
      s"stored-index search diverges from one-shot:\n$fromIndex\nvs\n$oneShot")
  }

  test("staleness: an unappended batch fails verifyFresh loudly") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bm25_stale").toString
    val store = new ParquetTableStore(spark, wh)
    Bm25Index.build(store, "bx", docs.filter($"doc_id" <= 5), "doc_id", "text")
    val e = intercept[RuntimeException] {
      Bm25Index.verifyFresh(store, "bx", docs, "doc_id")
    }
    assert(e.getMessage.contains("STALE"), e.getMessage)
  }

  test("changed-text re-delivery fails loudly before any merge") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bm25_chg").toString
    val store = new ParquetTableStore(spark, wh)
    Bm25Index.build(store, "bx", docs, "doc_id", "text")
    val edited = Seq((2L, "apple pie recipe")).toDF("doc_id", "text")
    val e = intercept[RuntimeException] {
      Bm25Index.append(store, "bx", edited, "doc_id", "text", 1L)
    }
    assert(e.getMessage.contains("CHANGED text"), e.getMessage)
    // guard ran pre-merge: the index still answers for the ORIGINAL corpus
    Bm25Index.verifyFresh(store, "bx", docs, "doc_id")
  }

  test("search pushes the query-term filter into the postings scan") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bm25_prune").toString
    val store = new ParquetTableStore(spark, wh)
    Bm25Index.build(store, "bx", docs, "doc_id", "text")
    val plan = Bm25Index.search(store, "bx", q(1L -> "apple", 1L -> "durian"), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("In(term, [apple,durian])") ||
      plan.contains("In(term, [durian,apple])"),
      s"no pushed term-membership filter on the postings scan:\n$plan")
  }

  test("compactSegments: one segment after, search results identical, appends continue") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bm25_cmp").toString
    val store = new ParquetTableStore(spark, wh)
    Bm25Index.build(store, "bx", docs.filter($"doc_id" <= 3), "doc_id", "text")
    Bm25Index.append(store, "bx", docs.filter($"doc_id" > 3 && $"doc_id" <= 6), "doc_id", "text", 1L)
    Bm25Index.append(store, "bx", docs.filter($"doc_id" === 7), "doc_id", "text", 2L)
    val queries = q(1L -> "apple", 2L -> "banana")
    val before = Bm25Index.search(store, "bx", queries, 10)
      .orderBy("query_id", "rank").as[(Long, Long, Long, Double)].collect().toSeq
    val (segs, _) = Bm25Index.compactSegments(store, "bx")
    assert(segs == 3, s"expected 3 segments before compaction, saw $segs")
    assert(store.read("bx_postings").get.select("seg").distinct().count() == 1)
    val after = Bm25Index.search(store, "bx", queries, 10)
      .orderBy("query_id", "rank").as[(Long, Long, Long, Double)].collect().toSeq
    assert(after == before, "compaction changed search results")
    // the merged index keeps accepting appends
    Bm25Index.append(store, "bx", docs.filter($"doc_id" === 8), "doc_id", "text", 3L)
    Bm25Index.verifyFresh(store, "bx", docs, "doc_id")
  }

  test("appends are segment-partitioned: a batch writes only its own segment dir") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bm25_seg").toString
    val store = new ParquetTableStore(spark, wh)
    Bm25Index.build(store, "bx", docs.filter($"doc_id" <= 4), "doc_id", "text")
    val seg0 = new java.io.File(store.path("bx_postings"), "seg=0")
    val before = seg0.listFiles().map(f => f.getName -> f.lastModified()).toMap
    Bm25Index.append(store, "bx", docs.filter($"doc_id" > 4), "doc_id", "text", 1L)
    val after = seg0.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(after == before, "append rewrote the build segment's files")
    assert(new java.io.File(store.path("bx_postings"), "seg=1").exists(),
      "append did not create its own segment")
  }

  test("docs side table: append leaves pre-existing files byte-identical, new ids land as appended files") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bm25_docseg").toString
    val store = new ParquetTableStore(spark, wh)
    Bm25Index.build(store, "bx", docs.filter($"doc_id" <= 4), "doc_id", "text")
    def docFiles() = {
      def walk(d: java.io.File): Seq[java.io.File] =
        if (d.isDirectory) d.listFiles().toSeq.flatMap(walk)
        else if (d.getName.endsWith(".parquet")) Seq(d) else Nil
      walk(new java.io.File(store.path("bx_docs")))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val before = docFiles()
    Bm25Index.append(store, "bx", docs.filter($"doc_id" > 4), "doc_id", "text", 1L)
    val after = docFiles()
    // the r11 keyed merge rewrote this whole doc-sized table per batch;
    // the append-files path must leave every pre-existing file untouched
    // (path, size, mtime all unchanged) and add files only under the
    // batch's own segment dir
    before.foreach { case (p, meta) =>
      assert(after.get(p).contains(meta), s"append touched pre-existing file $p")
    }
    val added = after.keySet -- before.keySet
    assert(added.nonEmpty && added.forall(_.contains("seg=1")),
      s"new doc rows must land only in seg=1: $added")
    // and a replay adds nothing anywhere
    Bm25Index.append(store, "bx", docs.filter($"doc_id" > 4), "doc_id", "text", 1L)
    assert(docFiles() == after, "replayed append changed the docs table")
  }

  test("filtered search: true top-k of the allowed subset, scores UNCHANGED by the filter (Lucene filter-query semantics)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bm25_filt").toString
    val store = new ParquetTableStore(spark, wh)
    Bm25Index.build(store, "bx", docs, "doc_id", "text")
    val allowed = docs.filter($"doc_id" % 2 === 0).select($"doc_id")
    val queries = q(1L -> "apple", 2L -> "banana", 2L -> "durian")
    val filtered = Bm25Index.searchFiltered(store, "bx", queries, allowed,
        "doc_id", 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // only allowed docs surface
    assert(filtered.forall(_._3 % 2 == 0), s"disallowed doc returned: $filtered")
    // the filter narrows WHO can be returned, never what a score MEANS:
    // every returned (query, doc) score equals the unfiltered search's
    // score for that same doc (df/N/avgdl stay corpus-global)
    val unfiltered = Bm25Index.search(store, "bx", queries, 10)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    filtered.foreach { case (qid, _, doc, score) =>
      assert(unfiltered.get((qid, doc)).contains(score),
        s"score for ($qid, $doc) moved under the filter: $score vs " +
          s"${unfiltered.get((qid, doc))}")
    }
    // exactly the allowed members of the unfiltered ranking, re-ranked —
    // for the query where apple's top docs are ODD (doc 1), the filtered
    // ranking must surface the next allowed docs, not drop to < k
    val apple = filtered.filter(_._1 == 1L).map(_._3).toSet
    val appleAllowedAll = Bm25.searchFiltered(docs, "doc_id", "text",
        q(1L -> "apple"), allowed, 10)
      .as[(Long, Long, Long, Double)].collect().map(_._3).toSet
    assert(apple == appleAllowedAll,
      "stored filtered search diverges from one-shot filtered search")
    assert(apple == Set(2L, 4L, 6L, 8L),
      s"expected every allowed apple doc, got $apple")
    // ranks are contiguous from 1 per query (a post-hoc filter would
    // leave holes where disallowed docs were dropped)
    filtered.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.size).toSeq,
        s"query $qid ranks not contiguous: $rows")
    }
  }
}
