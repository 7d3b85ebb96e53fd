package graft

import graft.functions.Pii
import graft.operators.{Decontaminate, Similarity}
import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // the real test corpus, with PII planted so the scrub stage has work
  private lazy val docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), concat(col("text"),
      when(pmod(col("doc_id"), lit(10)) === 0,
        concat(lit(" mail u"), col("doc_id").cast("string"), lit("@ex.com")))
        .otherwise(lit(""))).as("text"), col("source"))

  // eval fixture: substrings of selected docs (guaranteed 8-gram overlap)
  private lazy val evalDocs = Tables.documents(spark, sfDir)
    .filter(pmod(col("doc_id"), lit(40)) === 0)
    .select((col("doc_id") + 500000L).as("doc_id"),
      array_join(slice(split(col("text"), " "), 3, 12), " ").as("text"))

  private lazy val (curated, rep) =
    CorpusPipeline.curate(docs, evalDocs, "doc_id", "text")

  test("survivorship is monotone and lands non-empty") {
    assert(rep.input > 0)
    assert(rep.afterLang <= rep.input)
    assert(rep.afterQuality <= rep.afterLang)
    assert(rep.afterDecontamination <= rep.afterQuality)
    assert(rep.afterDedup <= rep.afterDecontamination)
    assert(rep.afterDedup > 0, s"curation emptied the corpus: $rep")
    assert(curated.count() == rep.afterDedup)
  }

  test("each stage actually cut something on this corpus") {
    // the planted fixture guarantees decontamination hits; the corpus's
    // own near-dups guarantee dedup hits
    assert(rep.afterDecontamination < rep.afterQuality, s"$rep")
    assert(rep.afterDedup < rep.afterDecontamination, s"$rep")
  }

  test("no PII survives curation") {
    assert(curated.filter(Pii.hasPii(col("text"))).count() == 0L)
  }

  test("no eval contamination survives curation") {
    assert(Decontaminate.contaminated(curated, evalDocs, "doc_id", "text").count() == 0L)
  }

  test("no near-dup pair at the dedup threshold survives curation") {
    val residual = Similarity.scoreCandidatesJaccard(
        Similarity.minhashNearDup(curated, "doc_id", "text", 0.5, maxBucket = 0),
        curated, "doc_id",
        sub => sub.select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), Similarity.shingleHashesOf(col("w"), 3).as("g")))
      .filter(col("jaccard") >= 0.6)
    assert(residual.count() == 0L, "curated corpus still contains near-dups")
  }

  test("carry-through columns survive and text is redacted in place") {
    assert(curated.columns.toSeq == Seq("doc_id", "text", "source"))
    assert(curated.filter(col("text").contains("<EMAIL>")).count() > 0L,
      "planted PII should have been redacted, not dropped")
  }

  test("report=false skips the per-stage actions") {
    val (_, lazyRep) = CorpusPipeline.curate(docs, evalDocs, "doc_id", "text",
      report = false)
    assert(lazyRep == CorpusPipeline.CurationReport(-1, -1, -1, -1, -1))
  }

  test("curateIncrement: batches dedup against the stored index, survivors join it for the next batch") {
    val wh = java.nio.file.Files.createTempDirectory("graft_cpinc").toString
    val store = new graft.operators.ParquetTableStore(spark, wh)
    val corpusDoc = "the migration committee published detailed seasonal " +
      "routing charts covering upland corridors and lowland crossings with " +
      "annotated elevation profiles compiled from volunteer observation logs"
    val freshDoc = "quarterly reservoir maintenance schedules list spillway " +
      "inspection intervals alongside sediment clearance milestones agreed " +
      "with the downstream irrigation cooperatives during winter planning"
    val secondDoc = "harbor pilotage guidance describes approach bearings " +
      "anchorage depth allowances and seasonal fog procedures issued to " +
      "masters of vessels exceeding the published tonnage threshold"
    // the standing corpus (already curated) is indexed once
    graft.operators.MinHashIndex.build(store, "cx",
      Seq((1L, corpusDoc, "a")).toDF("doc_id", "text", "source"),
      "doc_id", "text")
    val emptyEval = Seq.empty[(Long, String)].toDF("doc_id", "text")

    // batch 1: a near-dup of the CORPUS doc (drop via index probe), an
    // internal dup pair (collapse to min id), and junk the early stages cut
    val batch1 = Seq(
      (10L, corpusDoc.replace("winter", "summer").replace("logs", "notes"), "c"),
      (11L, freshDoc, "c"),
      (12L, freshDoc.replace("winter", "autumn"), "c"),
      (13L, "zzz qqq xxx", "c") // fails quality
    ).toDF("doc_id", "text", "source")
    val (out1, rep1) = CorpusPipeline.curateIncrement(store, "cx", batch1,
      emptyEval, "doc_id", "text")
    val ids1 = out1.select("doc_id").as[Long].collect().toSet
    assert(ids1 == Set(11L), s"batch 1 survivors wrong: $ids1 ($rep1)")
    assert(rep1.afterCorpusDedup < rep1.afterDecontamination,
      s"the corpus near-dup must be cut by the index probe: $rep1")
    assert(rep1.afterBatchDedup < rep1.afterCorpusDedup,
      s"the internal dup pair must collapse: $rep1")

    // batch 2: a near-dup of batch 1's SURVIVOR must now be dropped too —
    // the survivor joined the index
    val batch2 = Seq(
      (20L, freshDoc.replace("milestones", "targets"), "c"),
      (21L, secondDoc, "c")
    ).toDF("doc_id", "text", "source")
    val (out2, _) = CorpusPipeline.curateIncrement(store, "cx", batch2,
      emptyEval, "doc_id", "text")
    val ids2 = out2.select("doc_id").as[Long].collect().toSet
    assert(ids2 == Set(21L), s"batch 2 survivors wrong: $ids2")
    // the index now answers for all three generations
    graft.operators.MinHashIndex.verifyFresh(store, "cx",
      Seq((1L, ""), (11L, ""), (21L, "")).toDF("doc_id", "text"), "doc_id")
  }

  test("cap-ENGAGED curation: mega-bucket pruned, selective near-dups still collapse") {
    // Both texts pass every pre-dedup stage (en, quality >= 0.3,
    // repetition 0, no PII, no eval gram). The 60 identical boilerplate
    // copies fill every band bucket they occupy past the cap, so the cap
    // MUST prune them (all survive dedup); the near-dup pair meets in its
    // own small buckets and must still collapse to the min id.
    val boiler = "this standard disclosure notice accompanies every bulk " +
      "export bundle and describes retention policy review obligations for " +
      "downstream archival partners including quarterly audit summaries " +
      "prepared under the coastal registry framework with additional " +
      "provenance checkpoints documented separately"
    val near = "the migration committee published detailed seasonal routing " +
      "charts covering upland corridors and lowland crossings with annotated " +
      "elevation profiles compiled from volunteer observation logs gathered " +
      "across successive autumn surveys throughout the northern flyway"
    val planted = ((0 until 60).map(i => (800000L + i, boiler, "b")) ++ Seq(
      (1L, near, "s"),
      (2L, near.replace("autumn", "spring"), "s"))).toDF("doc_id", "text", "source")
    val emptyEval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val (out, _) = CorpusPipeline.curate(planted, emptyEval, "doc_id", "text",
      CorpusPipeline.Config(dedupMaxBucket = 10), report = false)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert((0 until 60).forall(i => ids.contains(800000L + i)),
      "cap-pruned boilerplate must survive uncollapsed")
    assert(ids.contains(1L) && !ids.contains(2L),
      "the selective near-dup pair must still dedupe to its min id")
  }
}
