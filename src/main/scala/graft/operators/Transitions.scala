package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order event-transition matrix — the Markov view of user
  * journeys ("after a view, 40% click, 10% bounce") that powers
  * funnel discovery (which funnels exist, where [[Funnel]] measures a
  * GIVEN one), journey anomaly detection, and next-event models.
  * [[BigramLm]] is the same mathematics over token streams; this
  * operator is its event-stream sibling with per-user sequence
  * isolation.
  *
  * Sequencing needs a TOTAL per-user order: ordering is (ts,
  * tieBreakCol) — event time alone is not total under same-timestamp
  * bursts, and a nondeterministic tie order would make transition
  * counts run-dependent. The lag window partitions by user and sorts
  * only within each user's events (one exchange + per-partition sort —
  * the sessionization shape; no global sort anywhere). Everything
  * after the lag is vocabulary-sized. */
object Transitions {

  /** (from_type, to_type, n, prob): counts of consecutive-event pairs
    * per user and row-normalized probabilities (Σ prob over to_type =
    * 1 per from_type), prob rounded to 6. Each user's last event emits
    * no transition.
    *
    * Contract: (tsCol, tieBreakCol) must be UNIQUE per user — the
    * tie-break exists to make the order total, and a duplicate pair
    * would silently reintroduce run-dependent counts (rows with a null
    * tie-break are dropped for the same reason: engines disagree on
    * null sort position). A null TYPE, however, stays in the sequence
    * as a break: its neighbors were never consecutive, so A,∅,B must
    * not count as A→B — null-typed rows emit no transition themselves
    * but stop adjacency from splicing across them. */
  def matrix(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieBreakCol))
    val pairs = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(tieBreakCol).isNotNull)
      .select(col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull && col("to_type").isNotNull)
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("_tot"))
    counts.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n") / col("_tot"), 6).as("prob"))
  }
}
