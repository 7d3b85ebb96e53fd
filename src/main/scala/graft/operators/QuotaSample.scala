package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic fixed-quota sampling per stratum: exactly `n` documents
  * from every group (all of them when the group is smaller), chosen by
  * smallest md5(seed, id) — a seeded uniform draw that is reproducible
  * across runs, engines and cluster layouts, unlike `TABLESAMPLE` /
  * `df.sample` whose outcome depends on partitioning and RNG state.
  * Where [[graft.SparkEntry.q40_stratified_sample]] keeps a RATE per
  * stratum, this keeps a COUNT — the balanced-eval-set construction
  * (n docs per language/source) rates cannot express.
  *
  * Scale shape: ONE hash aggregate per group using the bounded
  * [[graft.functions.BottomKAggregator]] — O(n) map-side state per
  * group, so a 10^8-row stratum ships n rows through the shuffle, not
  * 10^8. The `row_number() OVER (PARTITION BY g ORDER BY hash)`
  * formulation (which the oracle replays) would sort and ship every
  * group in full. The sort key is `md5(seed/id) + "/" + id`, one string
  * compared lexicographically on both engines — the id suffix breaks
  * md5-collision ties deterministically.
  */
object QuotaSample {

  /** (group, id-as-string) pairs of the sampled rows — join back on the
    * id to recover full rows. `n` per group, deterministic in `seed`.
    * NULL ids are excluded up front (a null cannot be hashed into the
    * draw; excluding them explicitly keeps the result well-defined and
    * matches the oracle, where no null ids exist — a row_number
    * formulation would instead rank nulls engine-dependently, first in
    * Spark and last in DuckDB). */
  def perGroup(df: DataFrame, groupCol: String, idCol: String, n: Int,
               seed: String): DataFrame = {
    require(n > 0, "quota must be positive")
    val sortKey = concat(
      md5(concat(lit(seed + "/"), col(idCol).cast("string"))),
      lit("/"), col(idCol).cast("string"))
    df.filter(col(idCol).isNotNull)
      .select(col(groupCol), sortKey.as("_qk"))
      .groupBy(col(groupCol))
      .agg(graft.functions.TopK.bottomK(n)(col("_qk")).as("_ks"))
      .select(col(groupCol), explode(col("_ks")).as("_qk"))
      // the md5 prefix is exactly 32 hex chars + "/": a fixed-offset
      // substring recovers the id even when the id itself contains "/"
      // (a split would truncate such ids)
      .select(col(groupCol), substring(col("_qk"), 34, Int.MaxValue)
        .as(s"${idCol}_str"))
  }
}
