package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed MERGE upsert, composed from built-ins.
  *
  * Reproduces the reference's `MERGE final USING (SELECT DISTINCT * FROM
  * staging) ON keys WHEN MATCHED UPDATE all non-key cols WHEN NOT MATCHED
  * INSERT` (ref: shopify-etl/shopify_etl.py:558-590): matched rows are fully
  * replaced by the update row, unmatched current rows survive, new rows are
  * inserted.
  *
  * Plan shape: one LEFT ANTI join of current against distinct update keys
  * (broadcast when updates are small — typical for incremental batches
  * against a large final table) + a union. No full-table rewrite of matched
  * rows via UPDATE expressions is needed because MERGE here updates every
  * non-key column (shopify_etl.py:578-579), i.e. whole-row replacement.
  *
  * Scale: the anti-join shuffles only on the key (or broadcasts the update
  * key set); at 100 TB this is the standard incremental-upsert pattern used
  * with partition-overwrite sinks.
  */
object Upsert {

  /** current ⟕anti updates.keys ∪ keyDedup(updates).
    *
    * Key-safety: the reference's `SELECT DISTINCT *` (shopify_etl.py:571-576)
    * only removes identical rows — two *different* rows with the same key
    * would both survive into the final table (a real hazard in the
    * reference; parity is not an excuse to keep it). Here updates are always
    * reduced to one row per key before the union: with `orderCol` the lowest
    * value wins (explicit first-wins); without it the per-key minimum over
    * all non-key columns wins — deterministic, and a no-op when the batch is
    * already key-unique (the common case). The reducer is a hash aggregate
    * (map-side partial), not a window, so it adds no per-partition sort. */
  def merge(current: DataFrame, updates: DataFrame, keys: Seq[String],
            orderCol: Option[String] = None): DataFrame = {
    val distinctUpdates = keyDedup(updates, keys, orderCol)
    // Null-safe key equality (<=>): with plain EqualTo a NULL key part never
    // matches, so a NULL-key row would be re-inserted on every run and break
    // merge idempotence (T4). (The reference dodges this only via its
    // str(None)->"None" quirk, shopify_etl.py:371-372, which makes keys
    // total strings — we keep real NULLs and merge null-safely instead.)
    val updateKeys = distinctUpdates.select(keys.map(col): _*).distinct()
      .toDF(keys.map(k => s"__u_$k"): _*)
    val cond = keys.map(k => col(k) <=> col(s"__u_$k")).reduce(_ && _)
    // No forced broadcast hint: incremental batches are usually small and
    // Catalyst/AQE broadcasts them automatically under the threshold, but a
    // backfill-sized update set must be allowed to plan as a shuffled join
    // instead of OOMing the driver.
    current
      .join(updateKeys, cond, "left_anti")
      .unionByName(distinctUpdates)
  }

  /** Reduce `updates` to exactly one row per key. With `orderCol`, first-wins
    * by that column (min_by aggregate). Without, the per-key least row by the
    * natural ordering of the non-key columns — arbitrary but deterministic,
    * so a duplicate-keyed batch can never publish a duplicate-keyed table. */
  def keyDedup(updates: DataFrame, keys: Seq[String],
               orderCol: Option[String] = None): DataFrame = {
    val dis = updates.distinct()
    val nonKey = dis.columns.filterNot(keys.contains).toSeq
    if (nonKey.isEmpty) dis
    else {
      // lexicographic min over (orderCol, rest-of-row) — orderCol first means
      // first-wins; the full-row tail breaks orderCol ties deterministically
      val ordered = orderCol match {
        case Some(oc) => oc +: nonKey.filterNot(_ == oc)
        case None     => nonKey
      }
      val reduced = dis.groupBy(keys.map(col): _*)
        .agg(min(struct(ordered.map(col): _*)).as("__row"))
      // restore original column order and flat schema
      reduced.select(dis.columns.toSeq.map { c =>
        if (keys.contains(c)) col(c) else col("__row").getField(c).as(c)
      }: _*)
    }
  }

}
