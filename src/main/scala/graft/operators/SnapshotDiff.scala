package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture between two snapshots of the same keyed table:
  * classify every key as INSERT (new only), DELETE (old only) or UPDATE
  * (present in both with any compared column differing), and drop
  * unchanged rows. This is the diff half of the reference's sync loop —
  * its MERGE applies a batch of changes (ref shopify-etl/shopify_etl.py:
  * 558-590, implemented as [[Upsert.merge]]); `diff` derives such a batch
  * from two full snapshots, which is how a warehouse reconciles a source
  * that offers no change feed.
  *
  * Scale shape: ONE full-outer shuffle join on the key columns — both
  * sides are corpus-sized so neither is broadcast; Catalyst plans a
  * sort-merge join keyed on the same partitioning a downstream
  * [[Upsert.merge]] of the emitted batch would reuse. The unchanged-row
  * filter runs inside the join's own stage (no second shuffle), so the
  * output is only the change volume — at 100 TB the diff of two
  * snapshots that differ by 0.1% emits 0.1%.
  *
  * Null semantics: keys join null-safely (`<=>` — a null key matches a
  * null key, mirroring [[Upsert.merge]]'s null-safe anti-join), and
  * column comparison is null-safe DISTINCT-FROM (null → non-null is a
  * change; null → null is not). Presence is tracked with literal marker
  * columns, not key nullness, so an all-null key row still classifies
  * correctly.
  *
  * Contract: each snapshot must hold AT MOST ONE ROW PER KEY — the
  * invariant every [[ParquetTableStore]] table already maintains
  * inductively. A duplicated key would fan out in the full-outer join
  * (m×n rows per key, spurious "update" pairs); callers diffing frames
  * that do not come from a keyed store should `Upsert.keyDedup` both
  * sides first. The marker/output names `_present_old`, `_present_new`
  * and `change_type` are reserved and rejected as input column names —
  * silent resolution breakage is not an acceptable failure mode.
  */
object SnapshotDiff {

  private val Reserved = Seq("_present_old", "_present_new", "change_type")

  /** Diff `newSnap` against `oldSnap` on `keys`. Output: the key columns
    * (coalesced across sides), `old_<c>`/`new_<c>` for every shared
    * non-key column, and `change_type` ∈ insert|update|delete.
    * Precondition: unique keys per snapshot (see class doc). */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    val clash = Reserved.filter(r =>
      oldSnap.columns.exists(_.equalsIgnoreCase(r)) ||
        newSnap.columns.exists(_.equalsIgnoreCase(r)))
    require(clash.isEmpty,
      s"snapshot columns collide with reserved diff columns: ${clash.mkString(", ")} — " +
        "rename them before diffing")
    val compareCols = oldSnap.columns.filterNot(keys.contains)
      .intersect(newSnap.columns.filterNot(keys.contains)).toSeq
    require(compareCols.nonEmpty,
      "snapshots share no non-key columns — nothing to compare")
    val o = oldSnap.select((keys ++ compareCols).map(col): _*)
      .withColumn("_present_old", lit(true)).alias("o")
    val n = newSnap.select((keys ++ compareCols).map(col): _*)
      .withColumn("_present_new", lit(true)).alias("n")
    val joinCond = keys.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val changed: Column = compareCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    o.join(n, joinCond, "full_outer")
      .withColumn("change_type",
        when(col("o._present_old").isNull, lit("insert"))
          .when(col("n._present_new").isNull, lit("delete"))
          .otherwise(lit("update")))
      .filter(col("o._present_old").isNull || col("n._present_new").isNull || changed)
      .select(
        keys.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k)) ++
          compareCols.flatMap(c =>
            Seq(col(s"o.$c").as(s"old_$c"), col(s"n.$c").as(s"new_$c"))) :+
          col("change_type"): _*)
  }
}
