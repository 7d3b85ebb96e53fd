package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Benchmark decontamination — remove (or flag) training documents that
  * share any word n-gram with a held-out evaluation set, so eval answers
  * cannot leak into the training corpus. The standard published recipe is
  * 8-13-gram overlap against each benchmark's text.
  *
  * Scale shape: the two sides are wildly asymmetric — benchmarks are
  * megabytes, the corpus is the 100 TB side. So the eval set's distinct
  * gram hashes are built first (tiny) and BROADCAST; the corpus side then
  * explodes its grams in the scan projection and LEFT SEMI joins against
  * the broadcast set — one pass over the corpus, zero corpus shuffles
  * before the per-doc distinct. Grams travel as xxhash64 of their k
  * tokens ([[Similarity.shingleHashesOf]]): no n-gram string is ever
  * materialized or shuffled, and a hash collision can only over-flag
  * (never leak) a document.
  */
object Decontaminate {

  private def gramHashes(docs: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame =
    docs.select(col(idCol), Text.tokens(col(textCol)).as("_w"))
      .select(col(idCol), explode(Similarity.shingleHashesOf(col("_w"), n)).as("gram"))

  /** Distinct ids of training docs sharing ≥1 n-gram with the eval set —
    * the broadcast-semi-join pass both public methods hang off. */
  private def hitIds(docs: DataFrame, evalDocs: DataFrame,
                     idCol: String, textCol: String, n: Int): DataFrame = {
    val evalGrams = gramHashes(evalDocs, idCol, textCol, n)
      .select(col("gram")).distinct()
    gramHashes(docs, idCol, textCol, n)
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** Training docs sharing ≥1 n-gram with the eval set. `docs` may carry
    * extra columns; they are preserved on the result via the final
    * semi-join back (so callers can aggregate by any of them). */
  def contaminated(docs: DataFrame, evalDocs: DataFrame,
                   idCol: String, textCol: String, n: Int = 8): DataFrame =
    docs.join(hitIds(docs, evalDocs, idCol, textCol, n), Seq(idCol), "left_semi")

  /** The keep side: training docs with NO n-gram overlap with the eval
    * set — the actual decontaminated corpus a pipeline writes out. */
  def clean(docs: DataFrame, evalDocs: DataFrame,
            idCol: String, textCol: String, n: Int = 8): DataFrame =
    docs.join(hitIds(docs, evalDocs, idCol, textCol, n), Seq(idCol), "left_anti")

  /** [[clean]] for a STREAM: contamination depends only on a row's own
    * grams and the static eval set, so it is a stateless per-row filter —
    * no join, no state, no watermark; valid in any output mode. For a
    * corpus with unique, non-null ids (the table-store invariant) the
    * kept ROWS equal batch [[clean]]'s; the per-row form is strictly
    * row-local, so rows sharing a duplicated id are judged independently
    * where the batch anti-join condemns them together.
    *
    * The eval set materializes ONCE driver-side (benchmark suites are MBs
    * by construction — this is a bounded collect) into two literals built
    * from the SAME collected array, no second Spark job: a bloom filter
    * (`spark.util.sketch.BloomFilter` — the class Spark's own runtime
    * filters wrap, byte-compatible with the registered
    * graft_might_contain probe) consulted per gram inside the scan
    * projection, and the exact hash array consulted ONLY when the bloom
    * fires — false positives cost a rare exact check, never a dropped
    * clean document. */
  def cleanStream(docs: DataFrame, evalDocs: DataFrame,
                  idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val hashes: Array[Long] = gramHashes(evalDocs, idCol, textCol, n)
      .select(col("gram")).distinct()
      .collect().map(_.getLong(0)) // bounded: eval set
    if (hashes.isEmpty) return docs
    val sketch = org.apache.spark.util.sketch.BloomFilter.create(hashes.length.toLong)
    hashes.foreach(sketch.putLong)
    val out = new java.io.ByteArrayOutputStream()
    sketch.writeTo(out)
    val bloom = out.toByteArray
    val bloomHit = exists(col("__dc_g"),
      g => call_function("graft_might_contain", lit(bloom), g))
    val exactHit = arrays_overlap(col("__dc_g"), lit(hashes))
    docs
      .withColumn("__dc_w", Text.tokens(col(textCol)))
      .withColumn("__dc_g", Similarity.shingleHashesOf(col("__dc_w"), n))
      .filter(!when(bloomHit, exactHit).otherwise(lit(false)))
      .drop("__dc_w", "__dc_g")
  }

  /** FUZZY decontamination — the paraphrase-leak half the exact n-gram
    * recipe cannot see: an eval answer lightly reworded shares few long
    * n-grams with its source but keeps a high small-shingle Jaccard.
    * Candidates come from MinHash band buckets CROSS-side only (the
    * corpus never self-joins here: corpus bands equi-join the BROADCAST
    * eval bands — the eval side is benchmark-sized, so the join is one
    * corpus pass like [[contaminated]]'s), then every candidate pair is
    * verified by EXACT k-shingle Jaccard with gram sets built only for
    * candidate corpus docs. LSH banding bounds recall (the q20 caveat);
    * at paraphrase-grade similarity (J ≥ ~0.8) the 16×4 banding's
    * per-pair miss probability is < 1e-6, and the verify stage makes
    * every EMITTED pair exact. Returns (idCol, eval_id, jaccard) for
    * pairs at or above `threshold`.
    *
    * `maxBucket` defaults to 0 = UNCAPPED (ADVICE r11): capBuckets drops
    * ALL rows of an over-cap band bucket, which for dedup is a recall/
    * cost trade but for decontamination is a safety hole — a
    * boilerplate-heavy contaminated doc whose band collisions land in
    * mega-buckets would bypass the leak check silently. Uncapped is
    * affordable here because the corpus never self-joins: candidates are
    * bounded by the benchmark-sized eval bands, so a hot corpus bucket
    * costs a wider (still cross-side) join, never an m² blowup. Set a
    * cap only for an adversarial corpus, and treat every dropped bucket
    * as an accepted recall hole. */
  def fuzzyHits(docs: DataFrame, evalDocs: DataFrame, idCol: String,
                textCol: String, threshold: Double, k: Int = 3,
                maxBucket: Int = 0): DataFrame = {
    def bands(sigs: DataFrame): DataFrame = sigs
      .select(col(idCol), explode(Similarity.bandHashes(col("sig"))).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.bh").as("bh"))
    val corpusBands = Similarity.capBuckets(
      bands(Similarity.minhashSignatures(docs, idCol, textCol, k)),
      Seq("band", "bh"), maxBucket)
    val evalBands = bands(
        Similarity.minhashSignatures(evalDocs, idCol, textCol, k))
      .select(col(idCol).as("_eval_id"), col("band"), col("bh"))
    val cand = corpusBands.join(broadcast(evalBands), Seq("band", "bh"))
      .select(col(idCol), col("_eval_id")).distinct()
    def gramSets(df: DataFrame, id: String): DataFrame =
      df.select(col(id),
        Similarity.shingleHashesOf(Text.tokens(col(textCol)), k).as("_g"))
    // exact verify: gram sets only for candidate corpus docs (broadcast
    // semi-restriction — the candidate id set is eval-bounded, and
    // without the hint Spark's unknown-cardinality estimate plans a
    // corpus-wide sort-merge semi join); the eval side's sets are
    // benchmark-sized and broadcast
    val cg = gramSets(docs, idCol)
      .join(broadcast(cand.select(col(idCol)).distinct()),
        Seq(idCol), "left_semi")
    val eg = gramSets(evalDocs, idCol)
      .select(col(idCol).as("_eval_id"), col("_g").as("_ge"))
    cand.join(cg, Seq(idCol)).join(broadcast(eg), Seq("_eval_id"))
      .select(col(idCol), col("_eval_id").as("eval_id"),
        round(size(array_intersect(col("_g"), col("_ge"))).cast("double") /
          size(array_union(col("_g"), col("_ge"))).cast("double"), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The keep side of [[fuzzyHits]]: corpus docs with no eval near-dup at
    * or above `threshold`. Compose AFTER [[clean]] — exact n-gram overlap
    * and paraphrase similarity are different leak channels. `maxBucket`
    * defaults to uncapped; see [[fuzzyHits]] for why capping is a safety
    * hole here, not a recall trade. */
  def fuzzyClean(docs: DataFrame, evalDocs: DataFrame, idCol: String,
                 textCol: String, threshold: Double, k: Int = 3,
                 maxBucket: Int = 0): DataFrame =
    docs.join(
      fuzzyHits(docs, evalDocs, idCol, textCol, threshold, k, maxBucket)
        .select(col(idCol)).distinct(),
      Seq(idCol), "left_anti")
}
