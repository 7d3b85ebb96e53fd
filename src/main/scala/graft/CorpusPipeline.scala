package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Pii, Text}
import graft.operators.{Decontaminate, LangId, Similarity}

/** End-to-end training-corpus curation — the composition a user of this
  * engine actually runs over raw documents, chaining the individually
  * oracle-gated operators into one flow:
  *
  *   1. language filter      (LangId trigram profile, zero-shuffle scoring)
  *   2. quality floor        (heuristic score + phrase-repetition ceiling)
  *   3. PII scrub            (redact in place — never drop, never leak)
  *   4. decontamination      (no eval n-gram reaches a training shard)
  *   5. near-dup dedup       (minhash candidates → exact Jaccard verify →
  *                            connected components → keep min-id rep)
  *
  * Stage order is the cost ladder: cheap per-row filters first shrink the
  * corpus before the stages that shuffle (dedup) or broadcast (decontam),
  * so the expensive passes see the smallest possible input. Every stage
  * is a narrow projection or an already-scale-shaped operator; nothing
  * here adds a collect or an all-pairs join.
  *
  * `curate` returns the curated frame plus a per-stage row-count report —
  * corpus prep without survivorship accounting is undebuggable. Counting
  * costs one action per stage; pass `report = false` to skip the counts.
  * Note curate() is EAGER either way: the decontaminated frame is
  * materialized inside (its three dedup-stage consumers would otherwise
  * re-run the whole upstream chain), and with `report = true` the
  * quality-filtered frame is materialized too so the per-stage counts do
  * not replay the language-ID prefix once per count.
  */
object CorpusPipeline {

  /** Per-stage survivorship: how many docs entered and survived each cut. */
  case class CurationReport(input: Long, afterLang: Long, afterQuality: Long,
                            afterDecontamination: Long, afterDedup: Long)

  case class Config(
      keepLangs: Set[String] = Set("en", "es", "de", "fr", "zh"),
      minQuality: Double = 0.3,
      maxBigramRepetition: Double = 0.2,
      dedupJaccard: Double = 0.6,
      decontaminateN: Int = 8,
      /** Occupancy cap on dedup candidate buckets (see
        * [[operators.Similarity.capBuckets]]) — the production guard
        * against a boilerplate mega-bucket emitting m² candidate rows.
        * Gates that replay exact all-pairs recall (q65) pass 0, the same
        * explicit divergence q30/q62 document. */
      dedupMaxBucket: Int = 1000,
      /** > 0 adds the PARAPHRASE decontamination stage
        * ([[operators.Decontaminate.fuzzyClean]], gate q159) after the
        * exact n-gram pass: drop docs whose 3-shingle Jaccard vs any
        * eval doc reaches this threshold. 0 (default) = off — the gated
        * q65/q66 behavior. Batch [[curate]] only; the incremental path
        * keeps the exact recipe + index-probed dedup. */
      fuzzyDecontaminateJaccard: Double = 0.0,
      /** Occupancy cap on the FUZZY-decontamination candidate buckets —
        * deliberately its OWN knob, not [[dedupMaxBucket]] (ADVICE r11):
        * capBuckets drops ALL rows of an over-cap band bucket, which for
        * dedup trades recall for cost, but for DECONTAMINATION is a
        * safety hole — a boilerplate-heavy contaminated doc whose band
        * collisions all land in mega-buckets would bypass the leak check
        * entirely. Default 0 = UNCAPPED (every candidate pair verified —
        * the safe posture; the corpus side never self-joins here, so the
        * candidate join is bounded by the benchmark-sized eval bands,
        * not by corpus bucket occupancy squared). Set > 0 only when an
        * adversarial corpus makes even the cross-side join hot, and
        * treat the dropped buckets as an accepted recall hole. */
      fuzzyDecontaminateMaxBucket: Int = 0,
      /** true keeps the HIGHEST-quality member of each near-dup cluster
        * ([[operators.Similarity.clusterSurvivorsBest]] ranked by
        * [[functions.Text.qualityScore]], gate q160's rule) instead of
        * the min-id member. false (default) = the gated q65 convention. */
      keepBestInCluster: Boolean = false)

  /** Curate `docs` (idCol, textCol + any carry-through columns) against a
    * held-out `evalDocs` set. Returns (curated docs with `textCol`
    * redacted, survivorship report — all -1 when `report = false`). */
  def curate(docs: DataFrame, evalDocs: DataFrame, idCol: String,
             textCol: String, config: Config = Config(),
             report: Boolean = true): (DataFrame, CurationReport) = {
    def n(df: DataFrame): Long = if (report) df.count() else -1L

    val input = n(docs)

    // 1. language: keep docs whose predicted language is in the allow set
    val langKept = LangId.predict(docs, idCol, textCol)
      .filter(col("pred_lang").isin(config.keepLangs.toSeq: _*))
      .select(col(idCol))
    val afterLang = docs.join(langKept, Seq(idCol), "left_semi")
    val nLang = n(afterLang)

    // 2. quality floor + phrase-repetition ceiling, one aliased token array
    val qualityFiltered = afterLang
      .withColumn("__cp_w", Text.tokens(col(textCol)))
      .filter(Text.qualityScore(col(textCol)) >= config.minQuality &&
        Text.bigramRepetitionRatioOf(col("__cp_w")) <= config.maxBigramRepetition)
      .drop("__cp_w")
    // under report=true the remaining stages and counts read this frame
    // repeatedly - cut the lineage once instead of replaying the
    // language-ID prefix per consumer
    val afterQuality =
      if (report) graft.operators.Checkpoints.materialize(qualityFiltered)
      else qualityFiltered
    val nQuality = n(afterQuality)

    // 3. PII scrub in place (redaction is idempotent — PiiSpec property)
    val scrubbed = afterQuality.withColumn(textCol, Pii.redact(col(textCol)))

    // 4. decontamination against the eval set. MATERIALIZED: the dedup
    // stage references this frame three times (candidate sketch, exact
    // scoring features, final keep join) — without cutting lineage here,
    // every reference would re-run the whole language/quality/scrub/
    // decontamination chain (measured 10.9 s → 4-5 s at sf0.1).
    val exactDecon = graft.operators.Checkpoints.materialize(
      Decontaminate.clean(scrubbed, evalDocs, idCol, textCol, config.decontaminateN))
    // the quality checkpoint's consumers are done (its lineage ends in
    // the now-materialized decontaminated frame) — release its blocks
    // rather than holding them until ContextCleaner GC (ADVICE r10)
    if (report) graft.operators.Checkpoints.release(afterQuality)

    // 4b (opt-in). paraphrase decontamination — the leak channel the
    // exact n-gram pass cannot see (gate q159). Materialized for the
    // same three-consumer reason as stage 4; once it is, the exact-pass
    // checkpoint is dead and released.
    val decontaminated =
      if (config.fuzzyDecontaminateJaccard <= 0) exactDecon
      else {
        val f = graft.operators.Checkpoints.materialize(
          Decontaminate.fuzzyClean(exactDecon, evalDocs, idCol, textCol,
            config.fuzzyDecontaminateJaccard,
            maxBucket = config.fuzzyDecontaminateMaxBucket))
        graft.operators.Checkpoints.release(exactDecon)
        f
      }
    val nDecon = n(decontaminated)

    // 5. near-dup dedup: candidates → exact verify → components → keep
    // the representative (min-id by default; quality-ranked opt-in)
    val pairs = Similarity.scoreCandidatesJaccard(
        Similarity.minhashNearDup(decontaminated, idCol, textCol,
          threshold = math.max(0.1, config.dedupJaccard - 0.1),
          maxBucket = config.dedupMaxBucket),
        decontaminated, idCol,
        sub => sub.select(col(idCol), Text.tokens(col(textCol)).as("__cp_w"))
          .select(col(idCol), Similarity.shingleHashesOf(col("__cp_w"), 3).as("g")))
      .filter(col("jaccard") >= config.dedupJaccard)
      .select("id_a", "id_b")
    val reps =
      if (config.keepBestInCluster)
        Similarity.clusterSurvivorsBest(pairs,
            decontaminated.select(col(idCol),
              Text.qualityScore(col(textCol)).as("__cp_q")),
            idCol, "__cp_q")
          .select(col("survivor_id").as(idCol))
      else
        Similarity.dedupClusters(pairs, decontaminated.select(col(idCol)), idCol)
          .filter(col("id") === col("label")) // each cluster keeps its min-id doc
          .select(col("id").as(idCol))
    val curated = decontaminated.join(reps, Seq(idCol), "left_semi")
    val nFinal = n(curated)

    (curated, CurationReport(input, nLang, nQuality, nDecon, nFinal))
  }

  /** Per-stage survivorship for one incremental batch. */
  case class IncrementReport(input: Long, afterLang: Long, afterQuality: Long,
                             afterDecontamination: Long, afterCorpusDedup: Long,
                             afterBatchDedup: Long)

  /** The INCREMENTAL composition — what each crawl batch runs once the
    * corpus is big enough that re-curating everything per batch is
    * absurd (at 100 TB: always). Stages 1-4 of [[curate]] touch only
    * the BATCH (narrow per-row ops); the cross-corpus near-dup check
    * probes the STORED MinHash index ([[operators.MinHashIndex
    * .dedupBatch]] — only the batch is sketched, the corpus side is
    * parquet), batch-internal dups then dedup through the batch-local
    * pass (tiny input), and the survivors are APPENDED to the same
    * index so the next batch dedups against them too. One store, one
    * protocol: replays of a batch re-send identical docs, which the
    * append's keyed upsert absorbs idempotently.
    *
    * Returns (curated survivors of this batch, report). The caller owns
    * appending survivors to its corpus TABLE (the index append here
    * maintains only the dedup index); a takedown later is
    * [[operators.MinHashIndex.delete]] + the table's own delete. */
  def curateIncrement(store: graft.operators.ParquetTableStore,
                      indexName: String, batch: DataFrame,
                      evalDocs: DataFrame, idCol: String, textCol: String,
                      config: Config = Config(),
                      report: Boolean = true,
                      batchId: Long = 1L): (DataFrame, IncrementReport) = {
    def n(df: DataFrame): Long = if (report) df.count() else -1L
    val input = n(batch)

    val langKept = LangId.predict(batch, idCol, textCol)
      .filter(col("pred_lang").isin(config.keepLangs.toSeq: _*))
      .select(col(idCol))
    val afterLang = batch.join(langKept, Seq(idCol), "left_semi")
    val nLang = n(afterLang)

    val qualityRaw = afterLang
      .withColumn("__cp_w", Text.tokens(col(textCol)))
      .filter(Text.qualityScore(col(textCol)) >= config.minQuality &&
        Text.bigramRepetitionRatioOf(col("__cp_w")) <= config.maxBigramRepetition)
      .drop("__cp_w")
    // same report-mode lineage cut as curate(): the counts downstream
    // would otherwise replay the language-ID prefix per action
    val qualityFiltered =
      if (report) graft.operators.Checkpoints.materialize(qualityRaw)
      else qualityRaw
    val nQuality = n(qualityFiltered)

    val scrubbed = qualityFiltered.withColumn(textCol, Pii.redact(col(textCol)))

    // materialized for the same reason as curate(): the dedup stages
    // consume this frame several times (index probe, batch-local sketch,
    // exact scoring, final joins)
    val decontaminated = graft.operators.Checkpoints.materialize(
      Decontaminate.clean(scrubbed, evalDocs, idCol, textCol,
        config.decontaminateN))
    val nDecon = n(decontaminated)

    // 5a. cross-corpus dedup: batch rows with a near-dup ALREADY IN the
    // stored index are dropped — only the batch is sketched.
    // MATERIALIZED: the survivors feed the count, the batch-local sketch,
    // the exact-scoring features, the reps join and the final semi-join —
    // without cutting lineage each consumer would re-run the stored-index
    // probe (bucket semi-join + cap + candidate join) from scratch.
    val vsCorpus = graft.operators.Checkpoints.materialize(
      graft.operators.MinHashIndex.dedupBatch(store, indexName,
        decontaminated, idCol, textCol, config.dedupJaccard,
        maxBucket = config.dedupMaxBucket))
    val nVsCorpus = n(vsCorpus)

    // 5b. batch-internal dedup: the batch-local pass over the survivors
    // (|batch| input — the full pipeline's dedup machinery at batch size)
    val pairs = Similarity.scoreCandidatesJaccard(
        Similarity.minhashNearDup(vsCorpus, idCol, textCol,
          threshold = math.max(0.1, config.dedupJaccard - 0.1),
          maxBucket = config.dedupMaxBucket),
        vsCorpus, idCol,
        sub => sub.select(col(idCol), Text.tokens(col(textCol)).as("__cp_w"))
          .select(col(idCol), Similarity.shingleHashesOf(col("__cp_w"), 3).as("g")))
      .filter(col("jaccard") >= config.dedupJaccard)
      .select("id_a", "id_b")
    val reps = Similarity.dedupClusters(pairs, vsCorpus.select(col(idCol)), idCol)
      .filter(col("id") === col("label"))
      .select(col("id").as(idCol))
    val curated = graft.operators.Checkpoints.materialize(
      vsCorpus.join(reps, Seq(idCol), "left_semi"))
    val nFinal = n(curated)

    // survivors join the index so the NEXT batch dedups against them —
    // appended as files in this batch's own segment (pass a distinct
    // batchId per crawl batch for per-batch delete/compaction pruning;
    // replays must re-use it)
    graft.operators.MinHashIndex.append(store, indexName, curated, idCol,
      textCol, batchId = batchId)
    graft.operators.Checkpoints.release(decontaminated)
    graft.operators.Checkpoints.release(vsCorpus)
    // report-mode quality checkpoint too (ADVICE r10): repeated per-batch
    // calls would otherwise accumulate executor block storage until the
    // ContextCleaner eventually GCs the orphaned localCheckpoint RDDs
    if (report) graft.operators.Checkpoints.release(qualityFiltered)

    (curated,
      IncrementReport(input, nLang, nQuality, nDecon, nVsCorpus, nFinal))
  }
}
