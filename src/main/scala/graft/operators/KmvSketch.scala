package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV / theta sketch — mergeable distinct-count estimation that, unlike
  * HLL ([[SketchRollup]]), supports SET OPERATIONS between sketches:
  * intersection, union and Jaccard of two key populations estimated from
  * two k-value synopses without rescanning either side (Beyer et al.
  * SIGMOD'07 "On synopses for distinct-value estimation"; the theta-
  * sketch combination rule of the Apache DataSketches lineage). The
  * planner-side questions this answers at 100 TB — "how many of this
  * crawl's url-hashes are already in the corpus?", "what fraction of
  * customers ordered in BOTH quarters?" — need |A ∩ B|, which HLL
  * registers cannot produce (inclusion-exclusion over HLL unions loses
  * all precision when the overlap is small).
  *
  * The sketch of a key column is the k smallest DISTINCT values of a
  * 52-bit seeded hash: u = hexint(md5(seed/key)[0,13)) ∈ [0, 2^52) —
  * [[WeightedSample]]'s deterministic-fraction construction, so the
  * WHOLE sketch (hash, k-minima, estimator, set algebra) is a pure
  * function of the data, bit-replayable in ANSI SQL by the oracle, and
  * identical across runs/partitionings/engines. Estimator: with
  * θ = the k-th minimum and the k−1 values below it retained,
  * n̂ = (k−1) · 2^52 / θ; a sketch holding fewer than k values saw
  * EVERY distinct key (θ = 2^52) and is exact. Combination: at
  * θ = min(θ_A, θ_B), each retained set cut back to < θ is a uniform
  * sample of its population at rate θ/2^52, so |Ŝ∩| = |cutA ∩ cutB| ·
  * 2^52/θ — exact-mode sketches degrade to exact set algebra through
  * the same formula (θ = 2^52 makes the scale factor 1).
  *
  * Scale shape: ONE hash aggregate per sketch with an O(k) bounded
  * buffer ([[graft.functions.BottomKDistinctLongAggregator]]) — ≤ k
  * values ship per map partition, never the distinct key set (the
  * shuffle a sketch exists to avoid). States are one row; merges and
  * set operations are array algebra over ≤ k-element arrays. The state
  * is mergeable (k smallest of a union = k smallest of each side's k
  * smallest), so it folds through [[IncrementalAgg.foldStateIntoStore]]
  * like every other sketch in the engine. */
object KmvSketch {

  private val Denom = 4503599627370496.0 // 2^52 = 16^13, exact in double

  private def hash52(keyCol: Column, seed: String): Column =
    conv(substring(md5(concat(lit(seed + "/"), keyCol.cast("string"))), 1, 13),
      16, 10).cast("long")

  /** One-row sketch state: (_kmv array<long> ascending, ≤ k smallest
    * distinct hashes). Null keys are excluded (no defined hash). */
  def state(df: DataFrame, keyCol: String, k: Int, seed: String): DataFrame = {
    require(k > 1, "sketch size must be at least 2 (the estimator uses k-1)")
    df.filter(col(keyCol).isNotNull)
      .select(hash52(col(keyCol), seed).as("_h"))
      .agg(graft.functions.TopK.bottomKDistinct(k)(col("_h")).as("_kmv"))
  }

  /** Exact sketch merge, in-plan: union the value arrays, dedup, keep
    * the k smallest — frames here are ≤ states×k values. */
  def mergeStates(k: Int, states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state frame")
    states.reduce(_.unionByName(_))
      .select(explode(col("_kmv")).as("_h")).distinct()
      .agg(graft.functions.TopK.bottomKDistinct(k)(col("_h")).as("_kmv"))
  }

  /** θ of a sketch array: the k-th minimum, or 2^52 when the sketch
    * holds fewer than k values (it saw every distinct key — exact
    * mode). */
  private def theta(kmv: Column, k: Int): Column =
    when(size(kmv) < k, lit(Denom))
      .otherwise(element_at(kmv, k).cast("double"))

  /** The retained sample: every value strictly below θ (the k−1 minima,
    * or the whole array in exact mode). */
  private def retained(kmv: Column, th: Column): Column =
    filter(kmv, v => v.cast("double") < th)

  /** (n_est) distinct-count estimate from a state frame — exact when
    * the sketch is unsaturated, (k−1)·2^52/θ otherwise; deterministic
    * either way (the oracle replays it bit-for-bit). */
  def estimateFromState(state: DataFrame, k: Int): DataFrame =
    state.select(
      round(size(retained(col("_kmv"), theta(col("_kmv"), k))).cast("double")
        * lit(Denom) / theta(col("_kmv"), k), 4).as("n_est"))

  /** Theta-sketch set algebra over two one-row states: estimated
    * |A|, |B|, |A ∩ B|, |A ∪ B| and the sample Jaccard, in one
    * array-algebra row. Cut both retained sets back to the COMMON
    * θ = min(θ_A, θ_B) — each is then a uniform rate-θ/2^52 sample of
    * its population, so intersection/union counts scale by 2^52/θ. */
  def setEstimates(stateA: DataFrame, stateB: DataFrame, k: Int): DataFrame = {
    val a = stateA.select(col("_kmv").as("_a"))
    val b = stateB.select(col("_kmv").as("_b"))
    a.crossJoin(b)
      .select(col("_a"), col("_b"),
        least(theta(col("_a"), k), theta(col("_b"), k)).as("_th"))
      .select(
        col("_th"),
        retained(col("_a"), col("_th")).as("_ca"),
        retained(col("_b"), col("_th")).as("_cb"))
      .select(
        round(size(col("_ca")).cast("double") * lit(Denom) / col("_th"), 4)
          .as("est_a"),
        round(size(col("_cb")).cast("double") * lit(Denom) / col("_th"), 4)
          .as("est_b"),
        round(size(array_intersect(col("_ca"), col("_cb"))).cast("double")
          * lit(Denom) / col("_th"), 4).as("est_inter"),
        round(size(array_union(col("_ca"), col("_cb"))).cast("double")
          * lit(Denom) / col("_th"), 4).as("est_union"),
        round(when(size(array_union(col("_ca"), col("_cb"))) === 0, lit(0.0))
          .otherwise(size(array_intersect(col("_ca"), col("_cb"))).cast("double")
            / size(array_union(col("_ca"), col("_cb")))), 4).as("jaccard"))
  }

  /** Replay-idempotent streaming maintenance — the sketch stays current
    * per ingest micro-batch at one O(k)-buffer aggregate per batch plus
    * a ≤ 2k-value array merge. */
  def foldIntoStore(store: ParquetTableStore, name: String, batch: DataFrame,
                    keyCol: String, k: Int, seed: String,
                    batchId: Long, epoch: String): Unit =
    IncrementalAgg.foldStateIntoStore(store, name,
      state(batch, keyCol, k, seed),
      (p, d) => mergeStates(k, p, d), batchId, epoch)

  // --------------------------------------------- per-group state fold

  /** [[state]] per group: (group, _kmv) rows, one O(k)-buffer grouped
    * hash aggregate — the per-stratum variant ("how many of this crawl's
    * URLs are new, PER DOMAIN") completing the fold family's per-group
    * symmetry (HH, reservoir, linear fit, NB all have one). Groups whose
    * keys are all null produce no row (no defined hash), same population
    * rule as the global sketch. */
  def statePerGroup(df: DataFrame, groupCol: String, keyCol: String,
                    k: Int, seed: String): DataFrame = {
    require(k > 1, "sketch size must be at least 2 (the estimator uses k-1)")
    df.filter(col(keyCol).isNotNull)
      .select(col(groupCol), hash52(col(keyCol), seed).as("_h"))
      .groupBy(col(groupCol))
      .agg(graft.functions.TopK.bottomKDistinct(k)(col("_h")).as("_kmv"))
  }

  /** Exact grouped sketch merge: groups present on either side keep the
    * k smallest distinct hashes of the union — frames are ≤ states ×
    * groups × k values. The same "k smallest of a union = k smallest of
    * each side's k smallest" identity as [[mergeStates]], per group. */
  def mergeStatesGrouped(k: Int, groupCol: String,
                         states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeStatesGrouped needs at least one state frame")
    states.reduce(_.unionByName(_))
      .select(col(groupCol), explode(col("_kmv")).as("_h")).distinct()
      .groupBy(col(groupCol))
      .agg(graft.functions.TopK.bottomKDistinct(k)(col("_h")).as("_kmv"))
  }

  /** (group, n_est) from a grouped state frame — [[estimateFromState]]
    * per group: exact for unsaturated groups (the common case for small
    * strata — the sketch degrades to nothing at all), (k−1)·2^52/θ for
    * saturated ones. */
  def estimatePerGroup(state: DataFrame, groupCol: String,
                       k: Int): DataFrame =
    state.select(col(groupCol),
      round(size(retained(col("_kmv"), theta(col("_kmv"), k))).cast("double")
        * lit(Denom) / theta(col("_kmv"), k), 4).as("n_est"))

  /** Theta set algebra BETWEEN GROUPS of one grouped state frame: every
    * unordered group pair's estimated |A∩B|, |A∪B| and Jaccard — "which
    * domains share url populations" from one state table, no rescan.
    * Output (group_a, group_b, est_inter, est_union, jaccard) with
    * group_a < group_b; same common-θ cut rule as [[setEstimates]].
    * Frames are (groups choose 2) × ≤ 2k values — group cardinality is
    * bounded (a sketch per group already assumes that). */
  def setEstimatesAcrossGroups(state: DataFrame, groupCol: String,
                               k: Int): DataFrame = {
    val a = state.select(col(groupCol).as("group_a"), col("_kmv").as("_a"))
    val b = state.select(col(groupCol).as("group_b"), col("_kmv").as("_b"))
    a.join(b, col("group_a") < col("group_b"))
      .select(col("group_a"), col("group_b"), col("_a"), col("_b"),
        least(theta(col("_a"), k), theta(col("_b"), k)).as("_th"))
      .select(col("group_a"), col("group_b"), col("_th"),
        retained(col("_a"), col("_th")).as("_ca"),
        retained(col("_b"), col("_th")).as("_cb"))
      .select(col("group_a"), col("group_b"),
        round(size(array_intersect(col("_ca"), col("_cb"))).cast("double")
          * lit(Denom) / col("_th"), 4).as("est_inter"),
        round(size(array_union(col("_ca"), col("_cb"))).cast("double")
          * lit(Denom) / col("_th"), 4).as("est_union"),
        round(when(size(array_union(col("_ca"), col("_cb"))) === 0, lit(0.0))
          .otherwise(size(array_intersect(col("_ca"), col("_cb"))).cast("double")
            / size(array_union(col("_ca"), col("_cb")))), 4).as("jaccard"))
  }

  /** Per-group replay-idempotent maintenance — the grouped sketch stays
    * current per ingest micro-batch; state table is groups × one row. */
  def foldIntoStorePerGroup(store: ParquetTableStore, name: String,
                            batch: DataFrame, groupCol: String,
                            keyCol: String, k: Int, seed: String,
                            batchId: Long, epoch: String): Unit =
    IncrementalAgg.foldStateIntoStore(store, name,
      statePerGroup(batch, groupCol, keyCol, k, seed),
      (p, d) => mergeStatesGrouped(k, groupCol, p, d), batchId, epoch)
}
