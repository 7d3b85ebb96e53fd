package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** IVF + SQ8: the partition-pruned probe of [[IvfIndex]] over the
  * 4×-compressed integer codes of [[ScalarQuantizer]] — FAISS's
  * `IndexIVFScalarQuantizer` shape. Sits between stored-IVF (full
  * floats per member, q88) and IVF-PQ (32× codes + trained codebook,
  * q96) on the memory/recall curve: a probe touches the broadcast
  * centroids, ONLY the probed cells' partition dirs, the int8 codes of
  * those cells' members (integer dots, one rescale), and full vectors
  * for just the shortlist (bounded exact refine). No training beyond
  * the coarse quantizer — the SQ codes are deterministic, so staleness
  * and crash-ordering concerns reduce to [[IvfIndex]]'s own.
  *
  * Build order matters for crash atomicity, same argument as
  * [[IvfPq.build]]: codes first, the IVF trio (whose LAST step writes
  * the freshness fingerprint) second — a crash anywhere leaves the OLD
  * fingerprint, and [[IvfIndex.verifyFresh]] fails loudly rather than
  * probing codes that do not match the cells. */
object IvfSq {

  def build(store: ParquetTableStore, name: String, corpus: DataFrame,
            idCol: String, vecCol: String, nCells: Int = 16,
            iterations: Int = 5): Unit = {
    store.replace(s"${name}_sq_codes",
      ScalarQuantizer.encode(corpus, idCol, vecCol))
    IvfIndex.build(store, name, corpus, idCol, vecCol, nCells, iterations)
  }

  /** Top-k via coarse probe → integer-dot SQ8 scan of the probed
    * cells' codes → bounded exact refine. Output (query_id, rank,
    * neighbor_id, score·4dp), scores exact (refined dot products). */
  def probe(store: ParquetTableStore, name: String, queries: DataFrame,
            idCol: String, vecCol: String, topK: Int, nProbe: Int = 4,
            shortlist: Int = 32): DataFrame = {
    val codes = store.read(s"${name}_sq_codes").getOrElse(
      sys.error(s"IVF-SQ index '$name' has no codes table — not built?"))
    val members = IvfIndex.probeMembers(store, name, queries, idCol, vecCol,
      nProbe)
    val q = ScalarQuantizer.encode(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("scale").as("_qs"),
        col("codes").as("_qc"))
    // integer dots over the probed members' codes only — candidates are
    // restricted BEFORE any scoring, so the compressed scan is
    // ~nProbe/nCells of the corpus, never all of it
    val intDot = aggregate(
      zip_with(col("_qc"), col("codes"), (a, b) => a.cast("long") * b),
      lit(0L), (acc, x) => acc + x)
    val approx = members.select(col("query_id"), col("id"))
      .join(codes, Seq("id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        (intDot.cast("double") *
          (col("_qs") * col("scale") / lit(16129.0))).as("score"))
    val short = Similarity.takeTopK(approx, math.max(shortlist, topK))
      .select(col("query_id"), col("neighbor_id"))
    // exact refine against the probed cells' stored vectors — never the
    // raw corpus (the IvfPq.probe pattern)
    val rescored = short
      .join(members.select(col("query_id"), col("id").as("neighbor_id"),
        col("v"), col("qv")), Seq("query_id", "neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vectors.dotNative(col("qv"), col("v")).as("score"))
    Similarity.takeTopK(rescored, topK)
  }
}
