package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-touch conversion attribution — "which click gets credit for
  * this purchase?": each conversion joins to the LATEST touch of the
  * same user at or before the conversion, attributed only when the
  * touch falls inside the attribution window. This is exactly the
  * as-of-join shape, so it rides the engine's custom sort-merge
  * [[AsOfJoin]] exec (|touches| + |conversions| merge per user — no
  * range-join fan-out, no window over the union) with the window
  * constraint applied as a post-filter on the matched lag: the as-of
  * match is the latest touch OVERALL, and if THAT is outside the
  * window no earlier touch can be inside it, so post-filtering ≡
  * constraining the join.
  *
  * Touches deduplicate to distinct (user, ts) first — the attributed
  * value is a TIMESTAMP (which instant gets credit), so same-instant
  * duplicate touches are one touch, and the dedup makes ts itself the
  * unique as-of tiebreak. Lag arithmetic is integer event-time
  * microseconds ([[Decay]]'s convention). */
object Attribution {

  /** `conversions` + (touch_ts, lag_minutes, attributed): touch_ts =
    * the crediting touch instant (null when none in window),
    * lag_minutes rounded to 4, attributed = the boolean verdict.
    *
    * EVERY conversion row comes back, exactly once: a conversion with a
    * null user or timestamp cannot be attributed (it has no as-of key),
    * so it returns with attributed = false and null touch columns
    * rather than vanishing — totals computed from the result equal
    * totals of the input, never a silent undercount. Only the non-null
    * rows enter the as-of join; the null-keyed remainder unions back
    * around it. */
  def lastTouch(conversions: DataFrame, touches: DataFrame,
                userCol: String, convTsCol: String, touchTsCol: String,
                windowHours: Int): DataFrame = {
    require(windowHours > 0, s"windowHours must be > 0: $windowHours")
    val t = touches
      .select(col(userCol).as("_tu"), col(touchTsCol).as("_tts"))
      .filter(col("_tu").isNotNull && col("_tts").isNotNull)
      .distinct()
    val joined = AsOfJoin.asOf(
      conversions.filter(col(userCol).isNotNull && col(convTsCol).isNotNull),
      t,
      leftKey = userCol, rightKey = "_tu",
      leftTs = convTsCol, rightTs = "_tts",
      rightCols = Seq("_tts"), rightTiebreak = Seq.empty)
    val lagUs = unix_micros(col(convTsCol).cast("timestamp")) -
      unix_micros(col("_tts").cast("timestamp"))
    val inWindow = col("_tts").isNotNull &&
      lagUs <= windowHours.toLong * 3600L * 1000000L
    val matched = joined
      .withColumn("attributed", coalesce(inWindow, lit(false)))
      .withColumn("touch_ts", when(col("attributed"), col("_tts")))
      .withColumn("lag_minutes",
        when(col("attributed"), round(lagUs / lit(6e7), 4)))
      .drop("_tts", "_tu")
    val unattributable = conversions
      .filter(col(userCol).isNull || col(convTsCol).isNull)
      .withColumn("attributed", lit(false))
      .withColumn("touch_ts",
        lit(null).cast(touches.schema(touchTsCol).dataType))
      .withColumn("lag_minutes", lit(null).cast("double"))
    matched.unionByName(unattributable)
  }
}
