package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic global corpus shuffle — the "shuffle the training data"
  * step of an LLM data pipeline, reproducible run-to-run. Order is
  * defined by a cryptographic hash of (seed, key), so it is (a) stable
  * under any execution plan, (b) re-derivable for auditing which shard a
  * document landed in, and (c) changed wholesale by changing the seed.
  *
  * Scale shape: a RANGE repartition on the hash + sortWithinPartitions —
  * Spark's distributed total-order machinery (sampled boundaries, one
  * shuffle, per-partition sorts). Explicitly NOT a `row_number()` over a
  * global window: an unpartitioned window collapses the corpus onto one
  * task, the classic single-node trap this operator exists to avoid
  * (plan-asserted in CorpusShuffleSpec). Concatenating the output
  * partitions in order yields the same total order regardless of sampled
  * boundaries, so the permutation is deterministic even though partition
  * SIZES may vary between runs.
  */
object CorpusShuffle {

  /** Permutation key: md5 of "<seed>/<key>" — hex string, uniform, and
    * computable identically by any engine (md5 is everywhere; a
    * Spark-internal hash would not be re-derivable off-cluster). */
  def shuffleKey(key: Column, seed: String): Column =
    md5(concat(lit(seed + "/"), key.cast("string")))

  /** Shard id: the first `chars` hex chars of the permutation key
    * (16^chars shards; default 256-way). Shards are the write-side unit
    * (one output dir per shard); within a shard the permutation key
    * orders documents. The single definition of "shard of a key" —
    * [[TrainingShards]] packing uses the same slice, so packing
    * parallelism and shuffle placement coincide by construction. */
  def shardOf(key: Column, seed: String, chars: Int = 2): Column =
    substring(shuffleKey(key, seed), 1, chars)

  /** The corpus in deterministic shuffled order: range-partitioned and
    * sorted by (hash, key) — key as tie-break makes the order total even
    * under md5 collisions. Write with `.write.parquet` to materialize
    * shuffled training shards. */
  def shuffled(df: DataFrame, keyCol: String, seed: String,
               partitions: Int): DataFrame =
    df.withColumn("_shuffle_key", shuffleKey(col(keyCol), seed))
      .repartitionByRange(partitions, col("_shuffle_key"), col(keyCol))
      .sortWithinPartitions("_shuffle_key", keyCol)
      // the key is re-derivable from (seed, key) — persisting 32 hex
      // chars per document into every training shard would be dead
      // weight; the drop is a projection, which preserves both the
      // range partitioning and the partition-local sort order
      .drop("_shuffle_key")

  /** Per-shard occupancy/boundary stats — the audit view (did the seed
    * spread the corpus evenly? what key range landed where). One hash
    * aggregation, no sort. */
  def shardStats(df: DataFrame, keyCol: String, seed: String): DataFrame =
    df.select(col(keyCol), shuffleKey(col(keyCol), seed).as("_shuffle_key"))
      .groupBy(substring(col("_shuffle_key"), 1, 2).as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("_shuffle_key")).as("min_key"),
        max(col("_shuffle_key")).as("max_key"))
}
