package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval (Robertson & Zaragoza 2009, "The Probabilistic
  * Relevance Framework"; idf in the Lucene non-negative form
  * ln(1 + (N − df + 0.5)/(df + 0.5))) — the term-statistics counterpart
  * of the embedding ANN family: given a query's terms, rank documents by
  * Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
  *
  * Spark shapes, scale first: the inverted index IS the (doc, term, tf)
  * hash aggregate — one exchange on the token stream; doc length joins
  * back on the SAME doc key (co-partitioned, no second exchange
  * pattern); everything query-dependent — the term→query map, the df
  * row per query term — is a few rows and BROADCAST, so scoring a query
  * batch against a 100 TB index is one scan of the (already small)
  * tf rows for the query's terms plus a TopK hash aggregate per query.
  * No window, no cross product, and the corpus-wide statistics (N,
  * avgdl) ride along as a broadcast single-row frame.
  *
  * Determinism contract for the oracle: per-(query, doc) scores sum at
  * most the query's term contributions; gates keep queries ≤ 2 terms so
  * the double sum is order-independent (two-operand IEEE addition is
  * commutative), and ranking tie-breaks (score desc, doc asc) match the
  * oracle's row_number ordering exactly.
  */
object Bm25 {

  /** The inverted-index statistics: (id, term, tf, dl) — term frequency
    * per (doc, term) and the doc's total token count. */
  def docTermStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"), explode(graft.functions.Text.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    tf.join(dl, Seq("id"))
  }

  /** Top-k documents per query. `queries`: (query_id, term) rows — a
    * multi-term query is several rows. Returns
    * (query_id, rank, doc_id, score·4dp).
    *
    * EAGER, and the result is a materialized localCheckpoint (ADVICE
    * r15 note): the returned frame's logical plan is an RDD scan, not
    * the scoring composition — plan-composing callers that need the
    * lazy plan (to push further filters into the scoring join, or to
    * inspect plan shape) should compose [[docTermStats]] +
    * [[scoreStats]] directly; long-lived callers should
    * `Checkpoints.release` the returned frame when done with it (it is
    * bounded at queries × topK rows, so leaving it to ContextCleaner GC
    * is harmless in batch jobs but accretes in a loop). */
  def search(docs: DataFrame, idCol: String, textCol: String,
             queries: DataFrame, topK: Int,
             k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val stats = Checkpoints.materialize(docTermStats(docs, idCol, textCol))
    try {
      // corpus constants: one-row frame, broadcast
      val n = stats.select(col("id"), col("dl")).distinct()
        .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      // materialize the RESULT (queries × topK rows — bounded and small)
      // so the big stats blocks can be released before returning, instead
      // of lingering until ContextCleaner GC (ADVICE r14); the returned
      // frame no longer references them
      Checkpoints.materialize(scoreStats(stats, n, queries, topK, k1, b))
    } finally Checkpoints.release(stats)
  }

  /** FILTERED top-k — the metadata-predicate text search (Lucene's
    * filter-query semantics, the BM25 sibling of
    * [[IvfIndex.probeFiltered]]): candidates are restricted to ids in
    * `allowed` BEFORE the top-k, so the result is the true top-k OF THE
    * ALLOWED SUBSET, while every corpus-level statistic — N, avgdl, and
    * each term's df — stays GLOBAL. The statistics choice is semantics,
    * not convenience: a filter narrows which documents can be RETURNED,
    * never what a score MEANS — a doc's BM25 score must not change as
    * the filter changes (two callers filtering differently must agree
    * on every shared doc's score, and scores must stay comparable for
    * downstream fusion like [[HybridRank]]), which is exactly how
    * Lucene scores a filtered query (the filter is non-scoring).
    * `allowed`: any frame carrying `idCol`. Same eager-result /
    * release-when-done contract as [[search]]. */
  def searchFiltered(docs: DataFrame, idCol: String, textCol: String,
                     queries: DataFrame, allowed: DataFrame, topK: Int,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val stats = Checkpoints.materialize(docTermStats(docs, idCol, textCol))
    try {
      val n = stats.select(col("id"), col("dl")).distinct()
        .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
      // result materialized, stats released — same rationale as [[search]]
      Checkpoints.materialize(scoreStats(stats, n, queries, topK, k1, b,
        Some(allowed.select(col(idCol).as("id")).distinct())))
    } finally Checkpoints.release(stats)
  }

  /** The scoring tail shared by the one-shot path ([[search]] — stats
    * recomputed from the corpus) and the stored-index path
    * ([[Bm25Index.search]] — stats read bucket-pruned from parquet, N
    * and avgdl from the doc side table): identical frames in, identical
    * IEEE op sequence, bit-equal scores out. `stats` needs only the
    * query terms' rows present (df is counted per term from them);
    * `n` is the one-row (n_docs, avgdl) corpus-constants frame. */
  private[operators] def scoreStats(stats: DataFrame, n: DataFrame,
                                    queries: DataFrame, topK: Int,
                                    k1: Double, b: Double,
                                    allowed: Option[DataFrame] = None): DataFrame = {
    // df per query term only (semi-filtered before the aggregate) —
    // from the UNFILTERED stats: df is a corpus-level statistic and
    // must not move with a candidate filter (see searchFiltered)
    val qTerms = queries.select(col("term")).distinct()
    val dfStats = stats.join(broadcast(qTerms), Seq("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    // the candidate restriction applies HERE — to which docs can score,
    // never to the statistics above (a plain semi-join; AQE broadcasts
    // a small allowed side on its own)
    val candStats = allowed match {
      case Some(a) => stats.join(a, Seq("id"), "left_semi")
      case None    => stats
    }
    // distinct: BM25 saturates per UNIQUE query term — a tokenized query
    // like "apple apple pie" must not double-count apple's contribution
    val contributions = candStats
      .join(broadcast(queries.select(col("query_id"), col("term")).distinct()), Seq("term"))
      .join(broadcast(dfStats), Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("query_id"), col("id"), {
        // association mirrors the oracle SQL token-for-token so both
        // engines run the identical IEEE op sequence
        val idf = log(lit(1.0) +
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
        val num = col("tf") * lit(k1 + 1)
        val den = col("tf") +
          lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))
        (idf * num / den).as("contrib")
      })
    val scored = contributions
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("contrib")).as("score"))
      .select(col("query_id"), col("id").as("neighbor_id"), col("score"))
    Similarity.takeTopK(scored, topK)
      .withColumnRenamed("neighbor_id", "doc_id")
  }
}
