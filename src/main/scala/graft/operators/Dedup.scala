package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family — semantics of the reference's client-side dedup
  * (ref: shopify-etl/shopify_etl.py:286,339-347 first-wins scan dedup;
  * :496-516 single-key dedup; :517-542 composite-key dedup with null-key
  * bypass; :571-576 SELECT DISTINCT *), re-expressed as Spark plans.
  *
  * Scale notes: all variants are a single hash shuffle on the dedup key
  * (partial aggregation map-side where possible). `firstWins` uses a window
  * — one shuffle on the key, no driver-side state, unlike the reference's
  * in-memory `set()` which is single-process only.
  */
object Dedup {

  /** Deterministic first-wins dedup: keep, per key, the row with the lowest
    * `orderCol` (the reference keeps the first-arrived row; Spark has no
    * arrival order, so callers pass an explicit ordering column).
    * ref: shopify_etl.py:339-347. */
  def firstWins(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** First-wins dedup as a hash aggregate (min_by) instead of a window:
    * same result as [[firstWins]] when `orderCol` is unique per row, but
    * with map-side partial aggregation and no per-partition sort — the
    * preferred shape at scale when only `payload` columns are needed. */
  def firstWinsAgg(df: DataFrame, keys: Seq[String], orderCol: String,
                   payload: Seq[String]): DataFrame = {
    val aggs = min(col(orderCol)).as(orderCol) +:
      payload.map(p => min_by(col(p), col(orderCol)).as(p))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact full-row dedup (SELECT DISTINCT *). ref: shopify_etl.py:571-576. */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()

  /** Composite-key dedup with null bypass: rows where ANY key part is null
    * are kept unconditionally; remaining rows are first-wins deduped.
    * ref: shopify_etl.py:517-542 (rows with missing key parts skip dedup). */
  def compositeKeyDedup(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val allKeysPresent = keys.map(col(_).isNotNull).reduce(_ && _)
    val valid   = df.filter(allKeysPresent)
    val bypass  = df.filter(!allKeysPresent)
    firstWins(valid, keys, orderCol).unionByName(bypass)
  }
}
