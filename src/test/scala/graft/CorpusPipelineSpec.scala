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

  test("fuzzyDecontaminateJaccard drops the paraphrase leak the default keeps") {
    // planted victim + its every-8th-word rewrite (DecontaminateSpec's
    // fixture pair, banding-verified there): shares no 8-gram with the
    // eval doc (exact pass blind) but sits above 3-shingle J = 0.5
    val victim = "the quick brown fox jumps over the lazy dog while " +
      "birds sing in the morning light and rivers flow gently to the " +
      "sea under a warm golden sun that rises slowly"
    val tweaked = victim.split(" ").zipWithIndex
      .map { case (w, i) => if (i % 8 == 7) w.toUpperCase else w }
      .mkString(" ")
    val planted = docs.unionByName(
      Seq((900003L, victim, "web")).toDF("doc_id", "text", "source"))
    val fuzzyEval = evalDocs.unionByName(
      Seq((600000L, tweaked)).toDF("doc_id", "text"))
    val (defaultOut, _) = CorpusPipeline.curate(planted, fuzzyEval,
      "doc_id", "text", report = false)
    val (fuzzyOut, _) = CorpusPipeline.curate(planted, fuzzyEval,
      "doc_id", "text",
      CorpusPipeline.Config(fuzzyDecontaminateJaccard = 0.4), report = false)
    val dIds = defaultOut.select("doc_id").as[Long].collect().toSet
    val fIds = fuzzyOut.select("doc_id").as[Long].collect().toSet
    assert(dIds.contains(900003L), "exact recipe alone must keep the paraphrase")
    assert(!fIds.contains(900003L), "fuzzy stage must drop the paraphrase")
    assert(fIds.subsetOf(dIds), "fuzzy stage only removes docs")
  }

  test("keepBestInCluster keeps the highest-quality member instead of the min id") {
    // planted near-dup pair — its OWN component (text disjoint from the
    // corpus) — where the LOWER id is the WORSE copy: the min-id
    // convention keeps 900001, the ranked rule must keep 900002
    val base = "the archival committee reviews provenance records for " +
      "every deposited manuscript while curators annotate the holdings " +
      "with keywords and cross references before publication in the " +
      "quarterly register of acquisitions and the public catalogue"
    val variant = base + " and the with that from they have this were been"
    // near-dup twins whose quality scores differ; the WORSE copy gets
    // the LOWER id, so the min-id convention provably picks the worse
    val q = graft.functions.Text.qualityScore(col("text"))
    val Seq(qBase, qVariant) = Seq(base, variant).map(t =>
      Seq(t).toDF("text").select(q).as[Double].head())
    assert(qBase != qVariant, "fixture: twin scores must differ")
    val (worse, better) =
      if (qBase < qVariant) (base, variant) else (variant, base)
    val planted = docs.unionByName(Seq(
      (900001L, worse, "web"), (900002L, better, "web"))
      .toDF("doc_id", "text", "source"))
    val (defaultOut, _) = CorpusPipeline.curate(planted, evalDocs,
      "doc_id", "text", report = false)
    val (bestOut, _) = CorpusPipeline.curate(planted, evalDocs,
      "doc_id", "text",
      CorpusPipeline.Config(keepBestInCluster = true), report = false)
    assert(defaultOut.count() == bestOut.count(),
      "survivorship rule changes WHICH copy survives, never how many")
    val dIds = defaultOut.select("doc_id").as[Long].collect().toSet
    val bIds = bestOut.select("doc_id").as[Long].collect().toSet
    // the planted pair must have clustered (one survivor each run)...
    assert((dIds & Set(900001L, 900002L)).size == 1)
    assert((bIds & Set(900001L, 900002L)).size == 1)
    // ...and each rule picks its own copy
    assert(dIds.contains(900001L), "min-id convention keeps the lower id")
    assert(bIds.contains(900002L), "ranked rule keeps the better copy")
  }
}
