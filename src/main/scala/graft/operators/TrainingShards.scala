package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard builder — the last mile of an LLM data pipeline,
  * composed from the engine's own gated primitives: weighted source
  * MIXING (reproducible hash predicate, q47's arithmetic), token
  * accounting, DETERMINISTIC SHUFFLE placement ([[CorpusShuffle]]'s md5
  * permutation), and SEQUENCE PACKING into token-budget packs within
  * each shard (q46's running-sum binning, ordered by the shuffle key so
  * pack membership is itself reproducible). The composition — not just
  * each stage — is hash-gated as q78.
  *
  * Scale shape: the mix predicate and token count run in the scan
  * projection; the only shuffle is the packing window's hash partition
  * on the shard id. Shard count (16^`shardChars`) IS the packing
  * parallelism: each shard's running sum is sequential by construction
  * (packing is order-dependent), so at corpus scale you raise
  * `shardChars` — 2 hex chars = 256-way, 3 = 4096-way — keeping
  * per-task work at (corpus/shards) tokens. The same trade as q46's
  * key-hash groups, here with the shard id doubling as the shuffle
  * placement, so packing parallelism and output layout coincide.
  */
object TrainingShards {

  /** Per-document shard plan: mix → shuffle key → shard → within-shard
    * pack id. `ratesPct` maps each row to its keep-percentage (0-100).
    * Output: idCol, toks, _hk (shuffle key), shard, pack. */
  def plan(docs: DataFrame, idCol: String, textCol: String,
           ratesPct: Column, seed: String, budgetTokens: Int,
           shardChars: Int = 2): DataFrame = {
    require(shardChars >= 1 && shardChars <= 8, "shardChars in [1,8]")
    require(budgetTokens > 0, "token budget must be positive")
    val mixed = docs
      .filter(graft.functions.Mix.keepPredicate(col(idCol), ratesPct))
      .select(col(idCol),
        CorpusShuffle.shuffleKey(col(idCol), seed).as("_hk"),
        graft.functions.Text.tokenCount(col(textCol)).as("toks"))
      .withColumn("shard",
        CorpusShuffle.shardOf(col(idCol), seed, shardChars))
    val w = Window.partitionBy(col("shard")).orderBy(col("_hk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    mixed
      .withColumn("running", sum(col("toks")).over(w))
      .withColumn("pack",
        floor((col("running") - col("toks")) / budgetTokens.toDouble).cast("long"))
      .drop("running")
  }

  /** Shard/pack manifest: doc and token counts per pack plus the pack's
    * first shuffle key (the audit handle: where a pack starts in the
    * deterministic order). One hash aggregate over the plan. */
  def manifest(planned: DataFrame): DataFrame =
    planned.groupBy(col("shard"), col("pack"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("pack_tokens"),
        min(col("_hk")).as("pack_start"))
}
