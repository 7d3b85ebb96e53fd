package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH dedup index — build once over the corpus, probe
  * each ingest batch: the incremental half of fuzzy dedup. A batch
  * pipeline built on [[Similarity.minhashNearDup]] re-sketches the WHOLE
  * corpus on every run, which at 100 TB turns "dedup today's crawl
  * against the corpus" into a full-corpus job. This operator pays the
  * signature pass once at build time, stores the index through
  * [[ParquetTableStore]], and each probe then sketches only the batch
  * (|batch| ≪ |corpus|) and joins its band hashes against the stored
  * bucket table — the same banded equi-join contraction as the batch
  * path, with the corpus side read from parquet instead of recomputed.
  * (Reference-scope anchor: the reference dedups each incremental pull
  * against already-loaded rows inside the warehouse —
  * shopify_etl.py:478-516 — this is that capability with fuzzy, not
  * exact, matching.)
  *
  * Layout (three tables under one index name):
  *   - `<name>_sigs` (id, sig): 64-permutation MinHash signatures —
  *     kept for estimate scoring of probe candidates.
  *   - `<name>_buckets` (id, band, bh): the banded LSH bucket keys —
  *     the join side of candidate generation.
  *   - `<name>_meta` (n_docs, id_fingerprint): corpus identity for
  *     staleness detection, same commutative (count, bit_xor of
  *     xxhash64(id)) fingerprint as [[IvfIndex]].
  *
  * [[append]] extends the index with an ingested batch by KEYED upsert
  * (ids already present are overwritten, not duplicated), so the
  * probe→filter→append→checkpoint loop of a streaming ingest is
  * replay-idempotent: a re-delivered batch rewrites identical rows and
  * the meta fingerprint — recomputed from the stored sig table's id
  * column, never folded incrementally — comes out unchanged.
  *
  * Probing returns CANDIDATE pairs with estimated Jaccard (signature
  * agreement fraction); callers needing exact scores rescore with
  * [[Similarity.scoreCandidatesJaccard]] on candidates only, exactly as
  * the batch path does. Batch-internal duplicates are out of scope by
  * design — run [[Similarity.minhashNearDup]] within the batch (tiny),
  * or append first and probe the next batch.
  */
object MinHashIndex {

  /** Commutative corpus fingerprint — see [[IvfIndex]] for why
    * (count, bit_xor): order-independent, overflow-free, and the count
    * catches xor's self-cancelling duplicate-pair blind spot. */
  private def fingerprint(docs: DataFrame, idCol: String): (Long, Long) = {
    val r = docs.agg(count(lit(1)), bit_xor(xxhash64(col(idCol)))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def sigsOf(docs: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame =
    Similarity.minhashSignatures(docs, idCol, textCol, k)
      .select(col(idCol).as("id"), col("sig"))

  private def bucketsOf(sigs: DataFrame): DataFrame =
    sigs.select(col("id"), explode(Similarity.bandHashes(col("sig"))).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.bh").as("bh"))

  private def writeMeta(store: ParquetTableStore, name: String): Unit = {
    val sigs = store.read(s"${name}_sigs").getOrElse(
      sys.error(s"MinHash index '$name' has no sig table"))
    val (n, h) = fingerprint(sigs, "id")
    store.replace(s"${name}_meta",
      sigs.sparkSession.range(1).select(
        lit(n).as("n_docs"), lit(h).as("id_fingerprint")))
  }

  /** Sketch the corpus once and materialize signatures + band buckets. */
  def build(store: ParquetTableStore, name: String, docs: DataFrame,
            idCol: String, textCol: String, k: Int = 3): Unit = {
    val sigs = Checkpoints.materialize(sigsOf(docs, idCol, textCol, k))
    store.replace(s"${name}_sigs", sigs)
    store.replace(s"${name}_buckets", bucketsOf(sigs))
    writeMeta(store, name)
    Checkpoints.release(sigs)
  }

  /** Extend the index with an ingested batch. Keyed upsert on id makes
    * replayed batches no-ops (same rows rewritten); the meta fingerprint
    * is recomputed from the stored sig ids, so it cannot drift from the
    * actual index contents the way an incrementally-folded count could
    * under replay. Cost is O(|batch| sketching) + the store's keyed
    * merge — never a corpus re-sketch. */
  def append(store: ParquetTableStore, name: String, batch: DataFrame,
             idCol: String, textCol: String, k: Int = 3): Unit = {
    val sigs = Checkpoints.materialize(sigsOf(batch, idCol, textCol, k))
    store.upsert(s"${name}_sigs", sigs, Seq("id"))
    store.upsert(s"${name}_buckets", bucketsOf(sigs), Seq("id", "band"))
    writeMeta(store, name)
    Checkpoints.release(sigs)
  }

  /** Remove `ids` from the index: buckets first (the candidate-join side
    * — a stale bucket row would keep surfacing the removed doc as a dup
    * candidate), signatures second, the meta fingerprint LAST — a crash
    * anywhere leaves the OLD fingerprint ≠ the post-delete corpus, so
    * [[verifyFresh]] fails loudly; re-running converges (absent ids
    * no-op). Both deletes take [[ParquetTableStore.delete]]'s pruned
    * paths (buckets row-level MERGE-DELETE; sigs carry an array column
    * so fall back to the anti-join publish). Unlike an in-place edit on
    * [[Bm25Index]], a MinHash re-delivery with changed text never
    * REQUIRED delete ([[append]]'s keyed upsert overwrites whole rows) —
    * delete exists for genuine removals: takedowns, retention expiry,
    * license revocation. Returns docs removed. */
  def delete(store: ParquetTableStore, name: String, ids: DataFrame,
             idCol: String): Long = {
    // materialized ONCE before the first rewrite (ADVICE r10): an ids
    // frame whose plan reads this index's own tables would otherwise
    // lazily re-list files the buckets delete already replaced when the
    // sigs delete re-evaluates it
    val key = Checkpoints.materialize(
      ids.select(col(idCol).as("id")).distinct())
    try {
      store.delete(s"${name}_buckets", key, Seq("id"))
      val removed = store.delete(s"${name}_sigs", key, Seq("id"))
      writeMeta(store, name)
      removed
    } finally Checkpoints.release(key)
  }

  /** Fail loudly if `corpus` no longer matches what the index was built
    * from (id-column-only scan; see [[IvfIndex.verifyFresh]] for the
    * policy-not-mechanism rationale of keeping this a separate call). */
  def verifyFresh(store: ParquetTableStore, name: String,
                  corpus: DataFrame, idCol: String): Unit = {
    val meta = store.read(s"${name}_meta").getOrElse(
      sys.error(s"MinHash index '$name' has no meta table — not built?"))
      .head()
    val (n, h) = fingerprint(corpus, idCol)
    if (meta.getLong(0) != n || meta.getLong(1) != h) sys.error(
      s"MinHash index '$name' is STALE: built over ${meta.getLong(0)} docs " +
        s"(fingerprint ${meta.getLong(1)}) but the corpus now has $n " +
        s"(fingerprint $h). Rebuild or append before probing — a stale " +
        "index silently misses duplicates of the unindexed docs.")
  }

  /** Index-health report for the bucket table: LSH candidate generation
    * degrades when buckets grow hot (boilerplate floods, near-constant
    * shingles), because [[probe]]'s `maxBucket` cap DROPS over-cap
    * buckets whole — structurally missed duplicates, silent unless
    * measured. One aggregate over the (id, band, bh) table returns a
    * 1-row frame: (n_buckets, max_occupancy, p99_occupancy,
    * over_cap_buckets, over_cap_row_share) where over_cap_row_share is
    * the fraction of bucket MEMBERSHIPS sitting in over-cap buckets —
    * the upper-bound share of the corpus whose candidate generation the
    * cap can silence. Alarm policy is the caller's (a crawl pipeline
    * re-shingles or raises the cap past a stated share); the number is
    * the mechanism. */
  def checkHealth(store: ParquetTableStore, name: String,
                  maxBucket: Int = 1000): DataFrame = {
    val buckets = store.read(s"${name}_buckets").getOrElse(
      sys.error(s"MinHash index '$name' has no bucket table — not built?"))
    buckets.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("occ"))
      .agg(
        count(lit(1)).as("n_buckets"),
        max(col("occ")).as("max_occupancy"),
        percentile_approx(col("occ"), lit(0.99), lit(10000))
          .as("p99_occupancy"),
        sum(when(col("occ") > maxBucket, 1L).otherwise(0L))
          .as("over_cap_buckets"),
        round(sum(when(col("occ") > maxBucket, col("occ")).otherwise(0L))
          / sum(col("occ")), 4).as("over_cap_row_share"))
  }

  /** Near-dup CANDIDATES of `batch` against the indexed corpus:
    * (corpus_id, batch_id, est_jaccard >= threshold). Only the batch is
    * sketched; the stored bucket table is first semi-joined down to the
    * batch's own (band, bh) keys — at real scale the batch touches a
    * vanishing fraction of corpus buckets, and the occupancy cap then
    * only has to window the surviving sliver, not the whole bucket
    * table. `maxBucket` caps COMBINED (corpus + batch) bucket occupancy,
    * same semantics and rationale as [[Similarity.capBuckets]]; <= 0
    * disables (the oracle-gated variant, per the q20 policy). */
  def probe(store: ParquetTableStore, name: String, batch: DataFrame,
            idCol: String, textCol: String, threshold: Double,
            k: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sigs = store.read(s"${name}_sigs").getOrElse(
      sys.error(s"MinHash index '$name' has no sig table — not built?"))
    val buckets = store.read(s"${name}_buckets").getOrElse(
      sys.error(s"MinHash index '$name' has no bucket table — not built?"))
    val bSigs = Checkpoints.materialize(sigsOf(batch, idCol, textCol, k))
    val bBuckets = bucketsOf(bSigs)
      .select(col("id").as("batch_id"), col("band"), col("bh"))
    // Batch bucket keys are small (|batch| × 16 bands): broadcast the
    // semi-join that prunes the stored table to touched buckets.
    val touched = buckets.join(
        broadcast(bBuckets.select("band", "bh").distinct()), Seq("band", "bh"))
      .select(col("id").as("corpus_id"), col("band"), col("bh"))
    // Cap on COMBINED occupancy: a bucket is hot because of its total
    // membership, whichever side contributed it — so tag sides, cap the
    // union, and re-split on the tag.
    val capped = Similarity.capBuckets(
      touched.select(col("corpus_id").as("id"), col("band"), col("bh"),
          lit(0).as("__side"))
        .unionByName(bBuckets.select(col("batch_id").as("id"), col("band"),
          col("bh"), lit(1).as("__side"))),
      Seq("band", "bh"), maxBucket)
    val cand = capped.filter(col("__side") === 0)
      .select(col("id").as("corpus_id"), col("band"), col("bh"))
      .join(capped.filter(col("__side") === 1)
          .select(col("id").as("batch_id"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("corpus_id") =!= col("batch_id"))
      .select("corpus_id", "batch_id").distinct()
    cand
      .join(sigs.select(col("id").as("corpus_id"), col("sig").as("sig_a")), "corpus_id")
      .join(bSigs.select(col("id").as("batch_id"), col("sig").as("sig_b")), "batch_id")
      .select(col("corpus_id"), col("batch_id"),
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x: Column, y: Column) => x === y),
          (eq: Column) => eq)).cast("double") / lit(Similarity.MinhashPerms.toDouble), 4)
          .as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** The ingest decision itself: batch rows with NO near-dup in the
    * indexed corpus (est ≥ threshold candidates removed via anti-join).
    * The probe/filter pair composed the way a streaming foreachBatch
    * would call it. */
  def dedupBatch(store: ParquetTableStore, name: String, batch: DataFrame,
                 idCol: String, textCol: String, threshold: Double,
                 k: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val dups = probe(store, name, batch, idCol, textCol, threshold, k, maxBucket)
      .select(col("batch_id").as(idCol)).distinct()
    batch.join(dups, Seq(idCol), "left_anti")
  }
}
