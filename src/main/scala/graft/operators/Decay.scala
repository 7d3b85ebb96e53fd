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

  // ------------------------------------------------- mergeable state

  /** Mergeable decayed state: (key, _ref, _dcnt, _dsum, _n) with sums
    * decayed AS OF `_ref` = the key's own max observed event time. The
    * FLOATING per-key reference is what makes the state storable:
    * decaying to a fixed epoch would need weights 2^(ts/halfLife) —
    * astronomically large for any realistic timeline — while weights
    * relative to the key's own maximum are always ≤ 1. Re-anchoring a
    * sum between references is multiplication by one constant, which
    * distributes over addition, so states MERGE exactly like the
    * sketch family's. Two exchanges per batch (per-key ref, then the
    * relative sums — the second reuses the first's partitioning). */
  def state(events: DataFrame, keyCol: String, tsCol: String,
            valueCol: String, halfLifeHours: Double): DataFrame = {
    require(halfLifeHours > 0, s"halfLifeHours must be > 0: $halfLifeHours")
    val ev = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"), micros(col(tsCol)).as("_us"),
        col(valueCol).cast("double").as("_v"))
    val refs = ev.groupBy(col("key")).agg(max(col("_us")).as("_ref"))
    val w = pow(lit(0.5), (col("_ref") - col("_us")).cast("double") /
      lit(3600.0 * 1e6) / lit(halfLifeHours))
    ev.join(refs, Seq("key"))
      .groupBy(col("key"), col("_ref"))
      .agg(sum(w).as("_dcnt"), sum(w * col("_v")).as("_dsum"),
        count(lit(1)).as("_n"))
  }

  /** Exact state merge: re-anchor both sides to the later reference,
    * add. Absent keys pass through unchanged (their reference already
    * holds — decay to "now" happens at read time, not merge time). */
  def merge(a: DataFrame, b: DataFrame, halfLifeHours: Double): DataFrame = {
    require(halfLifeHours > 0, s"halfLifeHours must be > 0: $halfLifeHours")
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col("key"), col("_ref").as(s"_ref$tag"),
        col("_dcnt").as(s"_dcnt$tag"), col("_dsum").as(s"_dsum$tag"),
        col("_n").as(s"_n$tag"))
    val j = side(a, "A").join(side(b, "B"), Seq("key"), "full_outer")
    val ref = greatest(col("_refA"), col("_refB"))
    def anchored(tag: String, c: String) = {
      val scale = pow(lit(0.5), (ref - col(s"_ref$tag")).cast("double") /
        lit(3600.0 * 1e6) / lit(halfLifeHours))
      coalesce(col(s"$c$tag") * scale, lit(0.0))
    }
    j.select(col("key"), ref.as("_ref"),
      (anchored("A", "_dcnt") + anchored("B", "_dcnt")).as("_dcnt"),
      (anchored("A", "_dsum") + anchored("B", "_dsum")).as("_dsum"),
      (coalesce(col("_nA"), lit(0L)) + coalesce(col("_nB"), lit(0L))).as("_n"))
  }

  /** Read-time scores from a state frame: ≡ [[scores]] over the full
    * history (up to floating-point re-association; the spec pins
    * rounded equality), without rescanning it. Keys whose reference
    * lies beyond `asOfMicros` are EXCLUDED FROM THE OUTPUT — the state
    * has folded in events the backfill instant must not see, and a
    * mergeable state cannot un-add them (use the batch path for
    * historical asOf). A current-time read can hit this too (clock
    * skew between the read instant and ingested event times makes a
    * key vanish rather than error), so a production read should pair
    * this with [[outrunKeys]] and alarm when it is non-empty. */
  def scoresFromState(state: DataFrame, asOfMicros: Long,
                      halfLifeHours: Double): DataFrame = {
    require(halfLifeHours > 0, s"halfLifeHours must be > 0: $halfLifeHours")
    val scale = pow(lit(0.5), (lit(asOfMicros) - col("_ref")).cast("double") /
      lit(3600.0 * 1e6) / lit(halfLifeHours))
    state.filter(col("_ref") <= asOfMicros)
      .select(col("key"),
        round(col("_dcnt") * scale, 4).as("decayed_count"),
        round(col("_dsum") * scale, 4).as("decayed_sum"),
        col("_n").as("n_events"))
  }

  /** The keys [[scoresFromState]] would exclude at `asOfMicros`, with
    * how far each reference has outrun the read instant — the alarm
    * surface for the exclusion above: a scheduled read that expects
    * asOf ≈ now should fail (or page) when this is non-empty instead
    * of letting clock skew read as "key has no activity". */
  def outrunKeys(state: DataFrame, asOfMicros: Long): DataFrame =
    state.filter(col("_ref") > asOfMicros)
      .select(col("key"), col("_ref"),
        (col("_ref") - lit(asOfMicros)).as("outrun_micros"))

  /** Replay-idempotent streaming maintenance — the generalized fold
    * ([[IncrementalAgg.foldStateIntoStore]]): trending scores stay
    * current per micro-batch without ever rescanning history. */
  def foldIntoStore(store: ParquetTableStore, name: String,
                    batch: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, halfLifeHours: Double,
                    batchId: Long, epoch: String): Unit =
    IncrementalAgg.foldStateIntoStore(store, name,
      state(batch, keyCol, tsCol, valueCol, halfLifeHours),
      (p, d) => merge(p, d, halfLifeHours), batchId, epoch)
}
