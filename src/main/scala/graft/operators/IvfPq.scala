package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** IVF-ADC: the FAISS `IndexIVFPQ + refine` pipeline composed from this
  * repo's two halves — [[IvfIndex]] supplies the coarse quantizer,
  * cell-partitioned inverted lists, persistence and staleness protocol;
  * [[ProductQuantizer]] supplies the 32×-compressed codes and the
  * asymmetric-distance scan. A probe touches, in order: the broadcast
  * centroid frame (KBs), ONLY the probed cells' partition directories
  * (~nProbe/nCells of the corpus), the PQ codes of those cells'
  * members (bytes per vector, scored by LUT lookups inside codegen),
  * and finally the full vectors of just the ADC shortlist (the bounded
  * exact refine). Nothing ever scans the whole corpus, and the heavy
  * per-candidate work happens on compressed codes — the two
  * contractions multiply.
  *
  * Build stores two additional tables next to the IVF trio:
  * `<name>_pq_codebook` (sub, code, centroid) and `<name>_pq_codes`
  * (id, codes). [[IvfIndex.verifyFresh]] covers staleness for the whole
  * family (all five tables are built from the same corpus in the same
  * call).
  */
object IvfPq {

  def build(store: ParquetTableStore, name: String, corpus: DataFrame,
            idCol: String, vecCol: String, dim: Int, nCells: Int = 16,
            m: Int = 8, ksub: Int = 16, iterations: Int = 5): Unit = {
    // PQ tables FIRST, IvfIndex.build LAST: the freshness fingerprint is
    // written at the END of IvfIndex.build, so a crash anywhere in this
    // sequence leaves the PREVIOUS fingerprint in place and verifyFresh
    // fails loudly against the new corpus. The reverse order would bless
    // a fresh IVF trio sitting next to STALE pq tables — probe would
    // silently drop ids that have no code row.
    val codebook = ProductQuantizer.train(corpus, idCol, vecCol, dim, m, ksub,
      iterations)
    store.replace(s"${name}_pq_codebook", codebook)
    // codes are segment-partitioned (seg 0 = the build) so appends can
    // write only their own segment — see [[append]]; id-sorted within
    // write tasks so the append guard's id-span predicate prunes at the
    // row-group level (see [[IvfSq.build]] / [[KeyPrune]])
    store.replacePartitioned(s"${name}_pq_codes",
      ProductQuantizer.encode(corpus, idCol, vecCol, dim, codebook, m)
        .withColumn("seg", lit(0L)).sortWithinPartitions(col("id")),
      Seq("seg"))
    IvfIndex.build(store, name, corpus, idCol, vecCol, nCells, iterations)
  }

  /** Extend the stored IVF-PQ index with an ingest batch under the
    * FROZEN codebook — FAISS's `add` vs `train` split applied to BOTH
    * quantizers: the batch encodes against the stored PQ codebook (no
    * retrain) and assigns against the stored coarse centroids
    * ([[IvfIndex.append]]). Codes land in the batch's OWN segment
    * partition (`seg` = `batchId`; replays re-use it; already-indexed
    * ids are skipped by an id-column anti-join, so re-sends cannot
    * duplicate code rows), and the cells append runs LAST — its final
    * step rewrites the freshness fingerprint, preserving the build's
    * crash-order argument: a crash anywhere leaves the OLD fingerprint
    * and verifyFresh fails loudly. */
  def append(store: ParquetTableStore, name: String, batch: DataFrame,
             idCol: String, vecCol: String, dim: Int, batchId: Long,
             m: Int = 8): Unit = {
    require(batchId > 0, "batchId 0 is the build segment — use ids > 0")
    val codebook = store.read(s"${name}_pq_codebook").getOrElse(
      sys.error(s"IVF-PQ index '$name' has no codebook — not built?"))
    val stored = store.read(s"${name}_pq_codes").getOrElse(
      sys.error(s"IVF-PQ index '$name' has no codes table — not built?"))
    val freshAll = ProductQuantizer.encode(batch, idCol, vecCol, dim, codebook, m)
    // Changed-CODE guard — see IvfSq.append: a same-cell vector edit
    // slips past the moved-cell guard and the new-id filter would keep
    // its stale PQ codes steering the ADC shortlist. Code-invisible
    // changes are harmless (same codes = same ADC scores; refine reads
    // the updated stored vectors). Cost shape mirrors IvfSq.append's:
    // id-span-pruned stored side, one materialized batch-sized left
    // join feeding both the guard and the new-id filter — O(batch), not
    // O(corpus-codes).
    val storedSpan = KeyPrune.toKeySpan(stored, "id", batch, idCol)
      .select(col("id"), col("codes").as("_oc"))
    val annotated = Checkpoints.materialize(
      freshAll.join(storedSpan, Seq("id"), "left"))
    val changed = annotated
      .filter(col("_oc").isNotNull && col("_oc") =!= col("codes"))
      .limit(5).collect()
    if (changed.nonEmpty) {
      Checkpoints.release(annotated)
      sys.error(
        s"IVF-PQ index '$name': batch re-delivers id(s) " +
          changed.map(_.get(0)).mkString(", ") +
          " with a CHANGED vector that encodes to different codes — an " +
          "id-keyed append cannot update them (stale codes would keep " +
          "steering the ADC shortlist). Use upsertVectors (delete + " +
          "append), delete the ids first, or rebuild.")
    }
    val fresh = annotated.filter(col("_oc").isNull).drop("_oc")
    if (!fresh.isEmpty)
      store.upsertPartitioned(s"${name}_pq_codes",
        fresh.withColumn("seg", lit(batchId)).sortWithinPartitions(col("id")),
        Seq("id"), "seg", countAfter = false)
    IvfIndex.append(store, name, batch, idCol, vecCol)
    Checkpoints.release(annotated)
  }

  /** In-place vector update recipe for the PQ variant — delete the ids
    * whose re-delivered vector encodes differently OR moves cells, then
    * append; see [[IvfSq.upsertVectors]] for why the union. Replays
    * no-op. */
  def upsertVectors(store: ParquetTableStore, name: String, batch: DataFrame,
                    idCol: String, vecCol: String, dim: Int, batchId: Long,
                    m: Int = 8): Unit = {
    val codebook = store.read(s"${name}_pq_codebook").getOrElse(
      sys.error(s"IVF-PQ index '$name' has no codebook — not built?"))
    val stored = store.read(s"${name}_pq_codes").getOrElse(
      sys.error(s"IVF-PQ index '$name' has no codes table — not built?"))
    val freshAll = ProductQuantizer.encode(batch, idCol, vecCol, dim, codebook, m)
    // id-span-pruned like [[append]]'s guard — see IvfSq.upsertVectors
    val changedCodes = KeyPrune.toKeySpan(stored, "id", batch, idCol)
      .select(col("id"), col("codes").as("_oc"))
      .join(broadcast(freshAll), Seq("id"))
      .filter(col("_oc") =!= col("codes"))
      .select(col("id"))
    // materialized — the doomed plan reads the codes table delete()
    // rewrites; see IvfSq.upsertVectors
    val doomed = Checkpoints.materialize(changedCodes
      .unionByName(IvfIndex.movedIds(store, name, batch, idCol, vecCol))
      .distinct())
    if (!doomed.isEmpty) delete(store, name, doomed, "id")
    append(store, name, batch, idCol, vecCol, dim, batchId, m)
    Checkpoints.release(doomed)
  }

  /** Remove `ids` from the IVF-PQ index: codes first (partition-pruned
    * to the holding segments), cells + fingerprint LAST ([[IvfIndex
    * .delete]]) — the same fingerprint-last crash ordering as
    * [[IvfSq.delete]]; the codebook is untouched (it quantizes REGIONS,
    * not members, exactly like the coarse centroids). Returns vectors
    * removed. */
  def delete(store: ParquetTableStore, name: String, ids: DataFrame,
             idCol: String): Long =
    IvfSq.deleteWithCodes(store, name, "_pq_codes", ids, idCol)

  /** [[IvfIndex.verifyFresh]] plus the codes≡cells id-population parity
    * attest — see [[IvfSq.verifyFresh]] for the failure modes this
    * catches (orphaned codes after a crashed delete, missing codes after
    * a crashed append). */
  def verifyFresh(store: ParquetTableStore, name: String,
                  corpus: DataFrame, idCol: String): Unit = {
    IvfIndex.verifyFresh(store, name, corpus, idCol)
    IvfSq.codesCellsParity(store, name, "_pq_codes", "IVF-PQ")
  }

  /** Rewrite all PQ code segments as ONE segment (seg 0) — the same
    * staged-swap compaction as [[IvfSq.compactCodeSegments]]; probe
    * results unchanged, appends continue after. Returns (segments
    * before, code rows). */
  def compactCodeSegments(store: ParquetTableStore, name: String): (Long, Long) =
    IvfSq.compactCodes(store, name, "_pq_codes", "IVF-PQ")

  /** Top-k via coarse probe → compressed ADC scan → bounded exact
    * refine. Output: (query_id, rank, neighbor_id, score·4dp), scores
    * exact (dot products of the refined shortlist). */
  def probe(store: ParquetTableStore, name: String, queries: DataFrame,
            idCol: String, vecCol: String, dim: Int, topK: Int,
            m: Int = 8, ksub: Int = 16, nProbe: Int = 4,
            shortlist: Int = 32): DataFrame = {
    val codebook = store.read(s"${name}_pq_codebook").getOrElse(
      sys.error(s"IVF-PQ index '$name' has no codebook — not built?"))
    val codes = store.read(s"${name}_pq_codes").getOrElse(
      sys.error(s"IVF-PQ index '$name' has no codes table — not built?"))
    // members of the probed cells only: (query_id, qv, id, v) — the
    // cells read is partition-pruned exactly as IvfIndex.probe's;
    // probeMembers returns a materialized frame, consumed here by both
    // the candidate list and the refine join
    val members = IvfIndex.probeMembers(store, name, queries, idCol, vecCol, nProbe)
    // ADC over the members' codes: candidates restricted BEFORE scoring
    val candCodes = members.select(col("query_id"), col("id"))
      .join(codes, Seq("id"))
      .select(col("query_id"), col("id"), col("codes"))
    val adcShort = ProductQuantizer.adcShortlist(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
      candCodes, codebook, dim, m, ksub, shortlist)
    // exact refine against the probed cells' stored vectors — never the
    // raw corpus
    val rescored = adcShort
      .join(members.select(col("query_id"), col("id").as("neighbor_id"),
        col("v"), col("qv")), Seq("query_id", "neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vectors.dotNative(col("qv"), col("v")).as("score"))
    Similarity.takeTopK(rescored, topK)
  }
}
