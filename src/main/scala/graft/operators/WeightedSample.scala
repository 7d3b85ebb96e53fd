package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted random sampling WITHOUT replacement (Efraimidis & Spirakis,
  * IPL 2006, "Weighted random sampling with a reservoir" — algorithm
  * A-Res): every row draws priority u^(1/w) with u ~ U(0,1]; the k
  * largest priorities are an exact weighted sample without replacement.
  * The training-data use case is corpus mixing by importance — sample
  * documents proportional to length/quality/domain weight without an
  * epoch-level shuffle of the full corpus.
  *
  * Determinism: u is not an RNG draw but a seeded hash fraction —
  * u = (hexint(md5(seed/id)[0,13)) + 1) / 2^52 ∈ (0,1] — so the sample
  * is reproducible across runs, engines, partitionings and cluster
  * layouts, and the ENTIRE draw (hash, fraction, priority, ranking) is
  * replayable in ANSI SQL by the oracle. 13 hex digits = 52 bits keeps
  * every intermediate integer exactly representable in a double; the
  * monotone log transform ln(u)/w replaces pow(u, 1/w) (same ordering,
  * one libm call instead of two).
  *
  * Scale shape: NO window, NO sort of the corpus. The k-largest
  * selection is [[graft.functions.TopKAggregator]] — O(k) map-side
  * state per group, so a 10^9-row stratum ships k rows through one
  * exchange (the [[QuotaSample]] argument, which this operator
  * generalizes from uniform to weighted draws; ties broken by id asc
  * in both the aggregator and the oracle's row_number).
  *
  * Rows with null id, null weight, or weight ≤ 0 are excluded up front
  * (a non-positive weight has no defined priority); ids must fit a
  * LONG (the aggregator's key type). */
object WeightedSample {

  private val Denom = 4503599627370496.0 // 2^52 = 16^13, exact in double

  /** ln(u)/w priority column; larger = more likely sampled. */
  private def priority(idCol: String, weightCol: String, seed: String): Column = {
    val u = (conv(substring(md5(concat(lit(seed + "/"),
        col(idCol).cast("string"))), 1, 13), 16, 10).cast("long") + 1)
      .cast("double") / lit(Denom)
    log(u) / col(weightCol).cast("double")
  }

  private def valid(df: DataFrame, idCol: String, weightCol: String): DataFrame =
    df.filter(col(idCol).isNotNull && col(weightCol).isNotNull &&
      col(weightCol) > 0)

  /** Global weighted k-sample: (rank, id, key·6dp), rank 1 = highest
    * priority. Selection compares unrounded priorities; rounding is
    * output-only. */
  def sample(df: DataFrame, idCol: String, weightCol: String, k: Int,
             seed: String): DataFrame = {
    require(k > 0, "sample size must be positive")
    valid(df, idCol, weightCol)
      .select(col(idCol).cast("long").as("_id"),
        priority(idCol, weightCol, seed).as("_key"))
      .agg(graft.functions.TopK.topK(k)(col("_id"), col("_key")).as("_t"))
      .select(posexplode(col("_t")).as(Seq("_pos", "_r")))
      .select((col("_pos") + 1).cast("int").as("rank"),
        col("_r._1").as(idCol), round(col("_r._2"), 6).as("key"))
  }

  // ------------------------------------------------- mergeable state

  /** One-row mergeable reservoir state: (_sample array<struct<id,
    * key>>), the ≤ k highest-priority rows seen so far with UNROUNDED
    * keys, sorted (key desc, id asc). A-Res reservoirs merge exactly —
    * the k best of a union is the k best of each side's k best — and
    * because u is a seeded hash of the id (not an RNG draw), the same
    * row re-encountered in any batch draws the SAME priority, so the
    * maintained sample is INDISTINGUISHABLE from the batch sample over
    * the full history (q137's gate), not merely statistically valid. */
  def state(df: DataFrame, idCol: String, weightCol: String, k: Int,
            seed: String): DataFrame = {
    require(k > 0, "sample size must be positive")
    valid(df, idCol, weightCol)
      .select(col(idCol).cast("long").as("_id"),
        priority(idCol, weightCol, seed).as("_key"))
      .agg(graft.functions.TopK.topK(k)(col("_id"), col("_key")).as("_t"))
      .select(transform(col("_t"),
        e => struct(e("_1").as("id"), e("_2").as("key"))).as("_sample"))
  }

  /** Exact reservoir merge, in-plan: union the samples, dedup by id
    * (the same id carries the same seeded-hash key on every side —
    * max() is defensive, not semantic), keep the k best by (key desc,
    * id asc). All frames here are ≤ states×k rows. */
  def mergeStates(k: Int, states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state frame")
    val ranked = states.reduce(_.unionByName(_))
      .select(explode(col("_sample")).as("e"))
      .select(col("e.id").as("id"), col("e.key").as("key"))
      .groupBy(col("id")).agg(max(col("key")).as("key"))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("key").desc, col("id"))))
      .filter(col("_rk") <= k)
    ranked
      .agg(collect_list(struct(col("id"), col("key"))).as("raw"))
      .select(array_sort(col("raw"), (l, r) =>
        when(l("key") > r("key"), -1).when(l("key") < r("key"), 1)
          .when(l("id") < r("id"), -1).when(l("id") > r("id"), 1)
          .otherwise(0)).as("_sample"))
  }

  /** (rank, id, key·6dp) from a state frame — [[sample]]'s output shape
    * without rescanning history. */
  def sampleFromState(state: DataFrame, idCol: String): DataFrame =
    state.select(posexplode(col("_sample")).as(Seq("_pos", "_r")))
      .select((col("_pos") + 1).cast("int").as("rank"),
        col("_r.id").as(idCol), round(col("_r.key"), 6).as("key"))

  /** Replay-idempotent streaming maintenance — the generalized fold:
    * a corpus-mixing sample stays current per ingest micro-batch at
    * one O(k)-state aggregate per batch plus a k-row merge. */
  def foldIntoStore(store: ParquetTableStore, name: String, batch: DataFrame,
                    idCol: String, weightCol: String, k: Int, seed: String,
                    batchId: Long, epoch: String): Unit =
    IncrementalAgg.foldStateIntoStore(store, name,
      state(batch, idCol, weightCol, k, seed),
      (p, d) => mergeStates(k, p, d), batchId, epoch)

  /** Per-group weighted k-sample — the balanced-mixture construction
    * (k docs per source/language, weighted by quality/length) —
    * one hash aggregate, O(k) state per group. */
  def perGroup(df: DataFrame, groupCol: String, idCol: String,
               weightCol: String, k: Int, seed: String): DataFrame = {
    require(k > 0, "sample size must be positive")
    valid(df, idCol, weightCol)
      .select(col(groupCol), col(idCol).cast("long").as("_id"),
        priority(idCol, weightCol, seed).as("_key"))
      .groupBy(col(groupCol))
      .agg(graft.functions.TopK.topK(k)(col("_id"), col("_key")).as("_t"))
      .select(col(groupCol), posexplode(col("_t")).as(Seq("_pos", "_r")))
      .select(col(groupCol), (col("_pos") + 1).cast("int").as("rank"),
        col("_r._1").as(idCol), round(col("_r._2"), 6).as("key"))
  }

  // ---------------------------------------- per-group mergeable state

  /** [[state]] partitioned by `groupCol`: one `_sample` reservoir row
    * per group value. The merge argument is per-group ([[mergeStates]]'
    * union-dedup-rank window runs PARTITIONED by group over ≤ states×k
    * candidate rows per group, never data), so group cardinality can be
    * warehouse-sized — the same shape as the per-group heavy-hitter
    * state. */
  def statePerGroup(df: DataFrame, groupCol: String, idCol: String,
                    weightCol: String, k: Int, seed: String): DataFrame = {
    require(k > 0, "sample size must be positive")
    valid(df, idCol, weightCol)
      .select(col(groupCol), col(idCol).cast("long").as("_id"),
        priority(idCol, weightCol, seed).as("_key"))
      .groupBy(col(groupCol))
      .agg(graft.functions.TopK.topK(k)(col("_id"), col("_key")).as("_t"))
      .select(col(groupCol), transform(col("_t"),
        e => struct(e("_1").as("id"), e("_2").as("key"))).as("_sample"))
  }

  /** [[mergeStates]] per group value: groups absent from one side pass
    * through (union semantics); within a group the rule is identical to
    * the global merge — dedup by id (same seeded key everywhere), keep
    * the k best by (key desc, id asc). */
  def mergeStatesGrouped(groupCol: String, k: Int,
                         states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeStatesGrouped needs at least one state frame")
    states.reduce(_.unionByName(_))
      .select(col(groupCol), explode(col("_sample")).as("e"))
      .select(col(groupCol), col("e.id").as("id"), col("e.key").as("key"))
      .groupBy(col(groupCol), col("id")).agg(max(col("key")).as("key"))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
          .orderBy(col("key").desc, col("id"))))
      .filter(col("_rk") <= k)
      .groupBy(col(groupCol))
      .agg(collect_list(struct(col("id"), col("key"))).as("raw"))
      .select(col(groupCol), array_sort(col("raw"), (l, r) =>
        when(l("key") > r("key"), -1).when(l("key") < r("key"), 1)
          .when(l("id") < r("id"), -1).when(l("id") > r("id"), 1)
          .otherwise(0)).as("_sample"))
  }

  /** [[perGroup]]'s output shape from a per-group state frame — the
    * balanced mixture read without rescanning history. */
  def perGroupFromState(state: DataFrame, groupCol: String,
                        idCol: String): DataFrame =
    state.select(col(groupCol), posexplode(col("_sample")).as(Seq("_pos", "_r")))
      .select(col(groupCol), (col("_pos") + 1).cast("int").as("rank"),
        col("_r.id").as(idCol), round(col("_r.key"), 6).as("key"))

  /** [[foldIntoStore]] partitioned by group — the per-source balanced
    * mixture staying current per ingest micro-batch. */
  def foldIntoStorePerGroup(store: ParquetTableStore, name: String,
                            batch: DataFrame, groupCol: String, idCol: String,
                            weightCol: String, k: Int, seed: String,
                            batchId: Long, epoch: String): Unit =
    IncrementalAgg.foldStateIntoStore(store, name,
      statePerGroup(batch, groupCol, idCol, weightCol, k, seed),
      (p, d) => mergeStatesGrouped(groupCol, k, p, d), batchId, epoch)
}
