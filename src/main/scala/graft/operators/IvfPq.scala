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
  * Codes are RESIDUAL-encoded (FAISS `IndexIVFPQ`'s `by_residual`,
  * Jégou et al. TPAMI 2011 §IV): each vector stores PQ codes of
  * `v − anchor(cell(v))`, not of `v` itself. Residuals concentrate
  * near the origin of a much smaller region than the raw space — the
  * anchor has already absorbed the between-cell variance — so the
  * same m × ksub code budget spends its resolution on the within-cell
  * detail that actually ranks neighbors, which is why FAISS's PQ
  * recall holds up at high compression (and why this repo's
  * raw-encoded first cut measured recall@10 0.576 vs SQ's 0.853:
  * VERDICT r11 item 2). The anchor is the cell's UNNORMALIZED member
  * mean at build time, NOT the spherical centroid: this engine's
  * coarse quantizer keeps its centroids on the unit sphere (dot-
  * product assignment), and subtracting a unit-norm direction from a
  * loosely-correlated member OVERSHOOTS — measured on the fixture,
  * centroid-anchored residuals quantize WORSE than raw vectors
  * (distortion 0.70 vs 0.55) while mean-anchored residuals quantize
  * better (0.49), which is exactly FAISS's choice of reconstruction
  * point (its L2-k-means centroids ARE cell means). Correctness never
  * depends on the anchor: ‖q − x‖² = ‖(q − a) − (x − a)‖² for ANY a,
  * so anchors are frozen at build like the codebook and stay valid
  * through appends and deletes. The probe builds one ADC LUT per
  * (query, probed cell) from the query's residual against that cell's
  * anchor, so distances stay comparable across cells and the
  * per-query shortlist is taken on one scale.
  *
  * Build stores three additional tables next to the IVF trio:
  * `<name>_pq_codebook` (sub, code, centroid — RESIDUAL-space
  * centroids), `<name>_pq_anchors` (cell, anchor — the frozen
  * per-cell reconstruction points) and `<name>_pq_codes` (id, codes —
  * residual codes relative to the id's cell, which the cells table,
  * not the codes table, records). [[IvfIndex.verifyFresh]] covers
  * staleness for the whole family (all six tables are built from the
  * same corpus in the same call).
  *
  * SIZING `shortlist` (measured, r13 100× smoke): the ADC estimate has
  * a quantization noise floor, and the shortlist stage can only order
  * candidates whose true distance gaps exceed it. On corpora where
  * near-duplicate clusters are DENSER than that floor — e.g. 200k
  * vectors holding ~200-member jitter clusters — shortlist 32 reads
  * recall@10 0.16–0.24 even though parent-level recall (any member of
  * the right cluster) is 0.65–0.78; raising the shortlist past the
  * cluster size restores exact recall monotonically (m=16: 0.24 → 0.99
  * from shortlist 32 → 256) at FLAT probe cost, because the bounded
  * exact refine, not the shortlist heap, dominates. Rule of thumb:
  * shortlist ≥ max(4×topK, expected duplicate-cluster size); on deduped
  * or well-separated corpora the default 32 suffices (0.635/0.829
  * measured at the 32/64-bit operating points, NOTES_r13).
  */
object IvfPq {

  /** (cell, anchor): the frozen per-cell reconstruction points — each
    * cell's member MEAN at build time (see the object doc for why the
    * mean and not the spherical centroid), with empty cells falling
    * back to their centroid so vectors a later append assigns there
    * still find an anchor row. nCells rows, broadcast wherever used. */
  private def anchorsOf(assigned: DataFrame, centroids: DataFrame): DataFrame = {
    val means = assigned.select(col("cell"), posexplode(col("v")).as(Seq("p", "x")))
      .groupBy(col("cell"), col("p")).agg(avg(col("x")).as("m"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("p"), col("m")))),
        s => s.getField("m")).as("mean"))
    centroids.join(means, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("mean"),
        transform(col("centroid"), x => x.cast("double"))).as("anchor"))
  }

  /** (id, cell, rv): residuals of an assigned frame against its cells'
    * anchors — the space both the codebook and every code row live
    * in. Double-typed (float vector − double anchor): the PQ trainer
    * computes in doubles anyway, and the subtraction must be
    * bit-reproducible between build and append for the changed-code
    * guard's code comparison to mean "vector changed", not "arithmetic
    * drifted". */
  private def residuals(assigned: DataFrame, anchors: DataFrame): DataFrame =
    assigned.join(broadcast(anchors), Seq("cell"))
      .select(col("id"), col("cell"),
        zip_with(col("v"), col("anchor"),
          (x, a) => x.cast("double") - a).as("rv"))

  /** Residual-encode a batch against the STORED quantizers — the
    * append-side twin of [[build]]'s encode: assign to cells under the
    * frozen coarse centroids, subtract the cell centroid, PQ-encode
    * under the frozen codebook. Returns (id, codes). */
  private def encodeResiduals(store: ParquetTableStore, name: String,
                              batch: DataFrame, idCol: String, vecCol: String,
                              dim: Int, codebook: DataFrame, m: Int): DataFrame = {
    val centroids = store.read(s"${name}_centroids").getOrElse(
      sys.error(s"IVF-PQ index '$name' has no centroids table — not built?"))
    val anchors = store.read(s"${name}_pq_anchors").getOrElse(
      sys.error(s"IVF-PQ index '$name' has no anchors table — not built?"))
    val assigned = IvfIndex.assignToCells(
      batch.select(col(idCol).as("id"), col(vecCol).as("v")), centroids)
    ProductQuantizer.encode(residuals(assigned, anchors), "id", "rv", dim,
      codebook, m)
  }

  def build(store: ParquetTableStore, name: String, corpus: DataFrame,
            idCol: String, vecCol: String, dim: Int, nCells: Int = 16,
            m: Int = 8, ksub: Int = 16, iterations: Int = 5): Unit = {
    // The coarse quantizer trains FIRST — residual encoding needs the
    // final centroids before any PQ work — but the IVF trio is still
    // WRITTEN last ([[IvfIndex.buildAssigned]]): the freshness
    // fingerprint lands at the END of the trio write, so a crash
    // anywhere in this sequence leaves the PREVIOUS fingerprint in
    // place and verifyFresh fails loudly against the new corpus. The
    // reverse order would bless a fresh IVF trio sitting next to STALE
    // pq tables — probe would silently drop ids that have no code row.
    // The assignment is computed once and shared by the residual encode
    // and the cells write (materialized: three consumers).
    val centroids = Similarity.trainIvfCentroids(
      corpus, idCol, vecCol, nCells, iterations)
    val assigned = Checkpoints.materialize(IvfIndex.assignToCells(
      corpus.select(col(idCol).as("id"), col(vecCol).as("v")), centroids))
    val anchors = anchorsOf(assigned, centroids)
    store.replace(s"${name}_pq_anchors", anchors)
    val res = residuals(assigned, store.read(s"${name}_pq_anchors").get)
    val codebook = ProductQuantizer.train(res, "id", "rv", dim, m, ksub,
      iterations)
    store.replace(s"${name}_pq_codebook", codebook)
    // codes are segment-partitioned (seg 0 = the build) so appends can
    // write only their own segment — see [[append]]; id-sorted within
    // write tasks so the append guard's id-span predicate prunes at the
    // row-group level (see [[IvfSq.build]] / [[KeyPrune]])
    store.replacePartitioned(s"${name}_pq_codes",
      ProductQuantizer.encode(res, "id", "rv", dim, codebook, m)
        .withColumn("seg", lit(0L)).sortWithinPartitions(col("id")),
      Seq("seg"))
    IvfIndex.buildAssigned(store, name, centroids, assigned, nCells)
    Checkpoints.release(assigned)
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
    val freshAll = encodeResiduals(store, name, batch, idCol, vecCol, dim,
      codebook, m)
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
    val freshAll = encodeResiduals(store, name, batch, idCol, vecCol, dim,
      codebook, m)
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

  /** Top-k via coarse probe → compressed residual-ADC scan → bounded
    * exact refine. Output: (query_id, rank, neighbor_id, score·4dp),
    * scores exact (dot products of the refined shortlist). */
  def probe(store: ParquetTableStore, name: String, queries: DataFrame,
            idCol: String, vecCol: String, dim: Int, topK: Int,
            m: Int = 8, ksub: Int = 16, nProbe: Int = 4,
            shortlist: Int = 32): DataFrame =
    probeRestricted(store, name, queries, idCol, vecCol, None, dim, topK,
      m, ksub, nProbe, shortlist)

  /** FILTERED top-k over the ADC index — true top-k OF THE ALLOWED
    * SUBSET, with the allowed semi-join applied to the candidate pool
    * BEFORE the ADC shortlist cut. Same load-bearing ordering as
    * [[IvfSq.probeFiltered]] (see there for the recall-collapse argument
    * a post-shortlist filter loses to); here the stakes are higher
    * because the shortlist is the ONLY stage that sees compressed
    * scores — once a disallowed twin takes a shortlist slot, no refine
    * budget recovers the allowed neighbor it displaced. At
    * nProbe = nCells and shortlist ≥ the allowed candidate count the
    * probe is exhaustive-exact over the allowed subset (gate q168).
    * `allowed`: any frame carrying `idCol`. */
  def probeFiltered(store: ParquetTableStore, name: String,
                    queries: DataFrame, idCol: String, vecCol: String,
                    allowed: DataFrame, dim: Int, topK: Int,
                    m: Int = 8, ksub: Int = 16, nProbe: Int = 4,
                    shortlist: Int = 32): DataFrame =
    probeRestricted(store, name, queries, idCol, vecCol, Some(allowed),
      dim, topK, m, ksub, nProbe, shortlist)

  private def probeRestricted(store: ParquetTableStore, name: String,
                              queries: DataFrame, idCol: String,
                              vecCol: String, allowed: Option[DataFrame],
                              dim: Int, topK: Int, m: Int, ksub: Int,
                              nProbe: Int, shortlist: Int): DataFrame = {
    val codebook = store.read(s"${name}_pq_codebook").getOrElse(
      sys.error(s"IVF-PQ index '$name' has no codebook — not built?"))
    val codes = store.read(s"${name}_pq_codes").getOrElse(
      sys.error(s"IVF-PQ index '$name' has no codes table — not built?"))
    val anchors = store.read(s"${name}_pq_anchors").getOrElse(
      sys.error(s"IVF-PQ index '$name' has no anchors table — not built?"))
    // members of the probed cells only: (query_id, qv, id, v, cell) —
    // the cells read is partition-pruned exactly as IvfIndex.probe's;
    // probeMembers returns a materialized frame, consumed here by the
    // candidate list, the LUT keying and the refine join. The allowed
    // restriction lands HERE, upstream of the ADC scan (filter-then-
    // shortlist); a (query, cell) pair left with no allowed members
    // drops out of the LUT frame too — candCodes derives from the same
    // restricted pool, so the two stay consistent.
    val membersAll =
      IvfIndex.probeMembers(store, name, queries, idCol, vecCol, nProbe)
    val members = allowed match {
      case Some(a) => membersAll.join(
        a.select(col(idCol).as("id")).distinct(), Seq("id"), "left_semi")
      case None => membersAll
    }
    // ADC over the members' codes: candidates restricted BEFORE scoring.
    // The member's CELL rides along — residual codes only mean anything
    // relative to their cell's centroid, so the LUT key is (query, cell).
    val candCodes = members.select(col("query_id"), col("cell"), col("id"))
      .join(codes, Seq("id"))
      .select(col("query_id"), col("cell"), col("id"), col("codes"))
    // one residual query vector per (query, probed cell): q − anchor,
    // the same subtraction the build encoded with — queries × nProbe
    // rows, broadcast-sized like the LUT frame built from it
    val qResiduals = members.select(col("query_id"), col("cell"), col("qv"))
      .distinct()
      .join(broadcast(anchors), Seq("cell"))
      .select(col("query_id"), col("cell"),
        zip_with(col("qv"), col("anchor"),
          (x, a) => x.cast("double") - a).as("qv"))
    val adcShort = ProductQuantizer.adcShortlist(
      qResiduals, candCodes, codebook, dim, m, ksub, shortlist,
      lutKeys = Seq("query_id", "cell"))
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
