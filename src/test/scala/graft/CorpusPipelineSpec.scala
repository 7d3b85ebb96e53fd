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
