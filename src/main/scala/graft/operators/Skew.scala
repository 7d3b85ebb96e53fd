package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on hot keys. AQE's skew-join split handles
  * sort-merge cases at runtime; explicit salting remains the tool when a
  * replicated (broadcast-infeasible) dimension join or aggregation funnels
  * one key into one task — at 100 TB a single hot key (e.g. a null-ish
  * default id or one viral order) can otherwise pin a stage on one core.
  */
object Skew {

  /** Salted equi-join: the big side gets a per-row salt in [0, salt), the
    * small side is replicated `salt` times; the join key becomes
    * (key, salt), spreading each hot key over `salt` tasks. Result set is
    * identical to `big.join(small, key)` (inner). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val bigS = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salt)).cast("int"))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (salted partial + final) aggregation for a skewed group key:
    * groupBy(key, salt) partial-aggregates, then groupBy(key) combines.
    * `partials` maps each value column to (partialAgg, finalAgg). For
    * algebraic aggs (sum/count/min/max) result equals direct groupBy. */
  def saltedAgg(df: DataFrame, key: String, salt: Int,
                partials: Seq[(Column, String)], finals: Seq[(Column, String)]): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val salted = df.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salt)).cast("int"))
    val partialAggs = partials.map { case (c, n) => c.as(n) }
    val finalAggs = finals.map { case (c, n) => c.as(n) }
    salted.groupBy(col(key), col("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(key))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
