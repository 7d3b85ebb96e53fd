package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact phrase search over a positional inverted index — the
  * capability that separates a search engine from a bag-of-words
  * ranker ([[Bm25]] scores "slow merge" and "merge slow" identically;
  * phrase search does not): find every document position where a
  * multi-token phrase occurs VERBATIM.
  *
  * The classic formulation joins per-term posting lists k−1 times for
  * a k-term phrase. This implementation needs ONE corpus-sized join
  * and ONE aggregate for ANY number of queries and phrase lengths,
  * via the alignment trick: a phrase term at query offset q matching
  * a document position p belongs to the candidate occurrence starting
  * at p − q, so
  *
  *   postings ⋈ query-terms ON term,
  *   GROUP BY (query, doc, p − q),
  *   full match ⟺ count = phrase length
  *
  * (each query offset can contribute at most one row to its group —
  * positions are unique within a doc — so count = length implies every
  * offset matched, even with repeated terms in the phrase.) Postings
  * are filtered to the queries' term vocabulary by a broadcast
  * semi-join BEFORE the exchange: only matching-term postings ever
  * shuffle, the index's long tail is never touched. Queries are
  * data (a DataFrame), not literals — a query batch runs in one pass. */
object PhraseSearch {

  /** Positional postings (term, id, pos) — whitespace tokenization,
    * 0-based positions. Persist through a table store for a standing
    * index; build per-batch otherwise. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .select(col("term"), col("id"), col("pos").cast("bigint").as("pos"))

  /** Per-query phrase terms (query_id, q, term) with phrase lengths
    * (query_id, len). */
  private def queryTerms(queries: DataFrame, queryIdCol: String,
                         phraseCol: String): (DataFrame, DataFrame) = {
    val qt = queries.select(col(queryIdCol).as("query_id"),
        posexplode(split(col(phraseCol), " ")).as(Seq("q", "term")))
      .filter(col("term") =!= "")
      .select(col("query_id"), col("q").cast("bigint").as("q"), col("term"))
    val qlen = qt.groupBy(col("query_id")).agg(count(lit(1)).as("len"))
    (qt, qlen)
  }

  /** Every verbatim occurrence: (query_id, id, start). */
  def occurrences(docs: DataFrame, idCol: String, textCol: String,
                  queries: DataFrame, queryIdCol: String,
                  phraseCol: String): DataFrame = {
    val (qt, qlen) = queryTerms(queries, queryIdCol, phraseCol)
    postings(docs, idCol, textCol)
      .join(broadcast(qt), Seq("term"))
      .groupBy(col("query_id"), col("id"), (col("pos") - col("q")).as("start"))
      .agg(count(lit(1)).as("_hits"))
      .filter(col("start") >= 0)
      .join(broadcast(qlen), Seq("query_id"))
      .filter(col("_hits") === col("len"))
      .select(col("query_id"), col("id"), col("start"))
  }

  /** Per-query result summary: (query_id, n_docs, n_occurrences,
    * first_doc). Queries with no occurrences are absent (left-join
    * against the query frame to keep them). */
  def search(docs: DataFrame, idCol: String, textCol: String,
             queries: DataFrame, queryIdCol: String,
             phraseCol: String): DataFrame =
    occurrences(docs, idCol, textCol, queries, queryIdCol, phraseCol)
      .groupBy(col("query_id"))
      .agg(countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("id")).as("first_doc"))
}
