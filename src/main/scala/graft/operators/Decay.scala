package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially time-decayed aggregates — the "trending now" signal:
  * every observation contributes weight 2^(−age/halfLife), so a
  * count/sum becomes a recency-weighted score that an hourly batch can
  * recompute or an incremental pipeline can maintain (decayed sums are
  * mergeable: decaying a partial sum from t₁ to t₂ is multiplication
  * by a constant, which distributes over addition — the same
  * mergeable-state property the engine's sketch family relies on).
  *
  * `asOf` is an explicit parameter, never wall-clock: the score is a
  * pure function of (data, asOf), so runs replay and backfills are
  * exact. Ages are computed in microseconds (`unix_micros`) — integer
  * event-time arithmetic, with the only floating point in the final
  * pow/sum. One scan, one hash aggregate, key-partitioned. */
object Decay {

  /** NTZ-tolerant event-time micros: unix_micros takes TIMESTAMP only;
    * an NTZ column casts through the session zone (UTC in
    * [[graft.GraftSession]]), matching DuckDB's naive-as-UTC epoch_us. */
  private def micros(tsCol: Column): Column =
    unix_micros(tsCol.cast("timestamp"))

  /** Weight column: 2^(−(asOfMicros − ts)/halfLife). Rows AFTER `asOf`
    * weigh > 1 by this formula, so [[scores]] excludes them (a backfill
    * run scoring "as of" a past instant must not see the future). */
  private def weight(tsCol: Column, asOfMicros: Long,
                     halfLifeHours: Double): Column = {
    val ageHours = (lit(asOfMicros) - micros(tsCol)).cast("double") /
      lit(3600.0 * 1e6)
    pow(lit(0.5), ageHours / lit(halfLifeHours))
  }

  /** Per-key decayed count and decayed value sum as of `asOfMicros`
    * (microseconds since epoch): (key, decayed_count, decayed_sum),
    * rounded to 4. Events at ts > asOf are excluded. */
  def scores(events: DataFrame, keyCol: String, tsCol: String,
             valueCol: String, asOfMicros: Long,
             halfLifeHours: Double): DataFrame = {
    require(halfLifeHours > 0, s"halfLifeHours must be > 0: $halfLifeHours")
    val w = weight(col(tsCol), asOfMicros, halfLifeHours)
    events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        micros(col(tsCol)) <= asOfMicros)
      .groupBy(col(keyCol).as("key"))
      .agg(round(sum(w), 4).as("decayed_count"),
        round(sum(w * col(valueCol)), 4).as("decayed_sum"),
        count(lit(1)).as("n_events"))
  }
}
