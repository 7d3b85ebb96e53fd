package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.MisraGries

/** Exact heavy-hitter extraction at sketch cost: a Misra–Gries candidate
  * pass (O(capacity) state per partition — see
  * [[graft.functions.MisraGriesAggregator]]) followed by an exact count
  * of the ≤ capacity candidate terms only. The MG guarantee makes the
  * composition EXACT, not approximate: every term with true share
  * > 1/(capacity+1) is necessarily a candidate, so filtering the
  * exact-counted candidates by that share returns precisely the true
  * heavy-hitter set — deterministically, whatever partitioning or merge
  * order the cluster used.
  *
  * Two scans by design, and the second is candidate-pruned: scan 1 keeps
  * O(capacity) state (vs a vocabulary-sized `groupBy(term)` shuffle —
  * 10^8+ groups on a web corpus); scan 2 counts only rows matching the
  * ≤ capacity candidates (broadcast hash semi-join inside the scan
  * stage, predicate-pushable). This is the aggregate-pruned two-scan
  * shape the repo accepts elsewhere (q63 policy): the alternative
  * single-scan exact answer is the full-vocabulary shuffle the sketch
  * exists to avoid.
  */
object HeavyHitters {

  /** One-row frame (n_total, candidates: array<struct term, est>) — the
    * raw mergeable summary, for callers composing their own policy. */
  def sketch(df: DataFrame, termCol: String, capacity: Int): DataFrame =
    df.agg(MisraGries.misraGries(capacity)(col(termCol)).as("s"))
      .select(col("s._1").as("n_total"),
        transform(col("s._2"),
          e => struct(e("_1").as("term"), e("_2").as("est"))).as("candidates"))

  /** The exact set of terms with share > 1/(capacity+1), as
    * (term, cnt) — see object doc for why sketch + candidate-restricted
    * exact count is exact. The driver-side collect is bounded by
    * capacity (the whole point of the sketch). */
  def exact(df: DataFrame, termCol: String, capacity: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val row = sketch(df, termCol, capacity).head()
    val n = row.getLong(0)
    val cands = row.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
    val candDf = cands.toDF("term")
    df.select(col(termCol).as("term"))
      .join(broadcast(candDf), Seq("term"), "left_semi")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (capacity + 1) > n)
  }

  /** Per-group summaries: (group, n_total, candidates). The per-key
    * variant for "top domains per language"-shaped questions; state is
    * O(capacity) per group on the map side. */
  def sketchPerGroup(df: DataFrame, groupCol: String, termCol: String,
                     capacity: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(MisraGries.misraGries(capacity)(col(termCol)).as("s"))
      .select(col(groupCol), col("s._1").as("n_total"),
        transform(col("s._2"),
          e => struct(e("_1").as("term"), e("_2").as("est"))).as("candidates"))
}
