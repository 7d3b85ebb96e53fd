package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted BM25 inverted index — build once, append each ingest
  * batch, probe many: the incremental half of lexical retrieval, and
  * the third index on the shared build/append/probe/staleness protocol
  * ([[MinHashIndex]] fuzzy dedup, [[IvfIndex]] ANN). [[Bm25.search]]
  * re-tokenizes and re-aggregates the WHOLE corpus per call; at 100 TB
  * the index must be paid once and then maintained from each batch
  * alone — a new crawl hour appends its own postings and never touches
  * the corpus text again.
  *
  * Layout (three tables under one index name):
  *   - `<name>_postings` (id, term, tf, dl): the inverted lists —
  *     [[Bm25.docTermStats]] rows, PARTITIONED on disk by
  *     `pb = pmod(xxhash64(term), nBuckets)` so a probe's term-bucket
  *     filter prunes partition directories before reading a row (the
  *     lexical analog of [[IvfIndex]]'s cell pruning; a handful of
  *     query terms touches a handful of the index's bucket dirs).
  *   - `<name>_docs` (id, dl, text_hash): one row per indexed doc —
  *     the corpus constants N and avgdl come from this doc-sized table
  *     (never from a postings scan), the fingerprint comes from its id
  *     column, and `text_hash` (xxhash64 of the raw text) is the
  *     changed-content guard.
  *   - `<name>_meta` (n_docs, id_fingerprint): staleness identity,
  *     same commutative (count, bit_xor(xxhash64(id))) fingerprint as
  *     the other two indexes.
  *
  * BM25 statistics are corpus-global (N, avgdl, df), so unlike the
  * other indexes the probe's SCORES shift as the corpus grows — that
  * is correct behavior (df/N must reflect the indexed population), and
  * it is why the stats live in doc-sized side tables that each append
  * maintains exactly: probing the appended index is bit-equal to
  * [[Bm25.search]] over the full indexed corpus (the q140 gate), not
  * an approximation of it.
  *
  * Append contract: new docs, or byte-identical replays (keyed upsert
  * on (id, term) rewrites identical rows; the meta fingerprint is
  * recomputed from stored ids, so replay provably cannot drift it). A
  * re-delivered id whose TEXT changed would strand postings rows of
  * its removed terms — (id, term) keys that the new batch no longer
  * carries cannot be deleted by an upsert — so that case FAILS LOUDLY
  * via the stored `text_hash` (an in-place document edit is a rebuild
  * or a delete + append, not an append). Docs whose text tokenizes to
  * nothing have no postings and are not indexed — the same population
  * [[Bm25.search]] scores.
  */
object Bm25Index {

  /** See [[IvfIndex]] for the (count, bit_xor) rationale. */
  private def fingerprint(docs: DataFrame, idCol: String): (Long, Long) = {
    val r = docs.agg(count(lit(1)), bit_xor(xxhash64(col(idCol)))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  // cast to int: parquet partition-column inference reads "pb=17" back
  // as IntegerType, and the merge path unions stored vs batch by name
  private def bucket(nBuckets: Int) =
    pmod(xxhash64(col("term")), lit(nBuckets.toLong)).cast("int")

  /** (id, term, tf, dl, pb) + (id, dl, text_hash) for one batch. */
  private def statsOf(docs: DataFrame, idCol: String, textCol: String,
                      nBuckets: Int): (DataFrame, DataFrame) = {
    val stats = Checkpoints.materialize(
      Bm25.docTermStats(docs, idCol, textCol)
        .withColumn("pb", bucket(nBuckets)))
    val docRows = stats.select(col("id"), col("dl")).distinct()
      .join(docs.select(col(idCol).as("id"),
        xxhash64(col(textCol)).as("text_hash")), Seq("id"))
    (stats, docRows)
  }

  private def writeMeta(store: ParquetTableStore, name: String): Unit = {
    val docs = store.read(s"${name}_docs").getOrElse(
      sys.error(s"BM25 index '$name' has no docs table"))
    val (n, h) = fingerprint(docs, "id")
    store.replace(s"${name}_meta",
      docs.sparkSession.range(1).select(
        lit(n).as("n_docs"), lit(h).as("id_fingerprint"),
        lit(DefaultBuckets).as("n_buckets")))
  }

  val DefaultBuckets = 32

  /** Tokenize and aggregate the corpus once; materialize the
    * bucket-partitioned postings and the doc-stats side table. */
  def build(store: ParquetTableStore, name: String, docs: DataFrame,
            idCol: String, textCol: String): Unit = {
    val (stats, docRows) = statsOf(docs, idCol, textCol, DefaultBuckets)
    store.replacePartitioned(s"${name}_postings", stats, Seq("pb"))
    store.replace(s"${name}_docs", docRows)
    writeMeta(store, name)
    Checkpoints.release(stats)
  }

  /** Extend the index with an ingested batch: tokenize ONLY the batch,
    * merge its postings into the touched term-bucket partitions
    * ([[ParquetTableStore.upsertPartitioned]] — `pb` is a pure function
    * of `term`, so keys never move partitions), upsert the doc stats,
    * and recompute the meta fingerprint from stored ids. Changed-text
    * re-delivery fails loudly BEFORE any merge (see class doc). */
  def append(store: ParquetTableStore, name: String, batch: DataFrame,
             idCol: String, textCol: String): Unit = {
    val stored = store.read(s"${name}_docs").getOrElse(
      sys.error(s"BM25 index '$name' has no docs table — not built?"))
    val (stats, docRows) = statsOf(batch, idCol, textCol, DefaultBuckets)
    val changed = stored.select(col("id"), col("text_hash").as("old_hash"))
      .join(broadcast(docRows.select(col("id"), col("text_hash"))), Seq("id"))
      .filter(col("old_hash") =!= col("text_hash"))
      .limit(5).collect()
    if (changed.nonEmpty) sys.error(
      s"BM25 index '$name': batch re-delivers doc id(s) " +
        changed.map(_.get(0)).mkString(", ") +
        " with CHANGED text — an upsert cannot delete the postings of " +
        "removed terms, so stale rows would keep scoring. Rebuild the " +
        "index, or delete the ids first.")
    store.upsertPartitioned(s"${name}_postings", stats, Seq("id", "term"), "pb")
    store.upsert(s"${name}_docs", docRows, Seq("id"), countAfter = false)
    writeMeta(store, name)
    Checkpoints.release(stats)
  }

  /** Fail loudly if `corpus` no longer matches the indexed population
    * (id-column-only scan; see [[IvfIndex.verifyFresh]]). */
  def verifyFresh(store: ParquetTableStore, name: String,
                  corpus: DataFrame, idCol: String): Unit = {
    val meta = store.read(s"${name}_meta").getOrElse(
      sys.error(s"BM25 index '$name' has no meta table — not built?"))
      .select("n_docs", "id_fingerprint").head()
    val (n, h) = fingerprint(corpus, idCol)
    if (meta.getLong(0) != n || meta.getLong(1) != h) sys.error(
      s"BM25 index '$name' is STALE: built over ${meta.getLong(0)} docs " +
        s"(fingerprint ${meta.getLong(1)}) but the corpus now has $n " +
        s"(fingerprint $h). Append the missing batches or rebuild — a " +
        "stale index scores with wrong df/N and misses unindexed docs.")
  }

  /** Top-k docs per query from the STORED index — bit-equal to
    * [[Bm25.search]] over the indexed corpus. The postings read is
    * term-bucket partition-pruned (the query's terms hash to a handful
    * of `pb` values, collected driver-side — bounded by query terms,
    * never index size); N/avgdl come from the doc-sized side table. */
  def search(store: ParquetTableStore, name: String, queries: DataFrame,
             topK: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val postings = store.read(s"${name}_postings").getOrElse(
      sys.error(s"BM25 index '$name' has no postings table — not built?"))
    val docs = store.read(s"${name}_docs").getOrElse(
      sys.error(s"BM25 index '$name' has no docs table — not built?"))
    val nBuckets = store.read(s"${name}_meta").getOrElse(
      sys.error(s"BM25 index '$name' has no meta table — not built?"))
      .select("n_buckets").head().getInt(0)
    val n = docs.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val buckets = queries.select(col("term")).distinct()
      .select(bucket(nBuckets).as("pb"))
      .distinct().collect().map(_.getInt(0))
    val pruned = postings.filter(col("pb").isin(buckets.toSeq: _*))
    Bm25.scoreStats(pruned, n, queries, topK, k1, b)
  }
}
