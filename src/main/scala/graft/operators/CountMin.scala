package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a RELATIONAL
  * state table: d hash rows × 16^wChars cells, each cell a plain count —
  * (j, cell, cnt) rows instead of an opaque binary blob. Answers "how
  * often does term t occur" for EVERY term in bounded memory
  * (d · 16^wChars counters, independent of vocabulary size), with the
  * classic one-sided guarantee: est(t) ≥ true(t) always (counters only
  * ever add), and over-estimation is bounded by colliding mass (w.h.p.
  * ≤ e·n/16^wChars per row, and the MIN over d rows is what's
  * answered).
  *
  * Why relational state instead of a sketch blob: the table merges by
  * (j, cell) SUM — so it composes with everything the engine already
  * has. Per-partition partial aggregation builds it in one exchange of
  * d·16^wChars rows; two sketches union+re-aggregate; and the
  * generalized replay-idempotent fold ([[IncrementalAgg.foldStateIntoStore]])
  * stream-maintains it exactly like the histogram and HLL states —
  * counters are additive, so the marker protocol is what makes
  * at-least-once delivery safe.
  *
  * Cells are hex-string keyed (first `wChars` chars of
  * md5("<j>/<term>")): lowercase hex compares and groups identically in
  * any engine, which is what lets an oracle replay the whole sketch —
  * build, merge, and estimate — in ANSI SQL. Complement of
  * [[HeavyHitters]]: MG answers "which terms are frequent" exactly in
  * O(capacity); this answers "how frequent is ANY given term"
  * approximately in O(d·16^wChars).
  */
object CountMin {

  private def cellOf(term: Column, j: Int, wChars: Int): Column =
    substring(md5(concat(lit(s"$j/"), term)), 1, wChars)

  /** Build the (j, cell, cnt) state from a term stream. Null terms are
    * ignored (absence of a term, consistent with [[HeavyHitters]]). */
  def state(df: DataFrame, termCol: String, d: Int = 4,
            wChars: Int = 3): DataFrame = {
    require(d >= 1 && wChars >= 1 && wChars <= 8, s"bad geometry d=$d wChars=$wChars")
    val terms = df.select(col(termCol).as("term")).filter(col("term").isNotNull)
    (0 until d).map { j =>
      terms.select(lit(j).as("j"), cellOf(col("term"), j, wChars).as("cell"))
    }.reduce(_.unionByName(_))
      .groupBy(col("j"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketch states built with the SAME geometry: union + re-sum. */
  def merge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    states.reduce(_.unionByName(_))
      .groupBy(col("j"), col("cell"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Point estimates for `queries` (a one-column frame of terms):
    * (term, est) where est = min over the d rows of the term's cell
    * counter — the count-min answer. Terms whose cells were never
    * touched estimate 0 (true count is 0 by the one-sided guarantee).
    * `queries` is expected to be bounded (it is broadcast). */
  def estimate(state: DataFrame, queries: DataFrame, termCol: String,
               d: Int = 4, wChars: Int = 3): DataFrame = {
    val q = queries.select(col(termCol).as("term")).distinct()
    val probes = (0 until d).map { j =>
      q.select(col("term"), lit(j).as("j"), cellOf(col("term"), j, wChars).as("cell"))
    }.reduce(_.unionByName(_))
    state.join(broadcast(probes), Seq("j", "cell"), "right_outer")
      .groupBy(col("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Stream-maintain a sketch state table through the shared
    * replay-idempotent fold protocol — counters are additive, so a
    * replayed micro-batch would double every estimate without the
    * marker skip. Same contract as
    * [[BinnedQuantiles.foldIntoStore]] / [[SketchRollup.foldIntoStore]]. */
  def foldIntoStore(store: ParquetTableStore, name: String, batch: DataFrame,
                    termCol: String, batchId: Long, epoch: String,
                    d: Int = 4, wChars: Int = 3): Unit =
    IncrementalAgg.foldStateIntoStore(store, name,
      state(batch, termCol, d, wChars),
      (prev, delta) => merge(prev, delta), batchId, epoch)
}
