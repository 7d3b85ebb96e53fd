package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.MisraGries

/** Exact heavy-hitter extraction at sketch cost: a Misra–Gries candidate
  * pass (O(capacity) state per partition — see
  * [[graft.functions.MisraGriesAggregator]]) followed by an exact count
  * of the ≤ capacity candidate terms only. The MG guarantee makes the
  * composition EXACT, not approximate: every term with true share
  * > 1/(capacity+1) is necessarily a candidate, so filtering the
  * exact-counted candidates by that share returns precisely the true
  * heavy-hitter set — deterministically, whatever partitioning or merge
  * order the cluster used.
  *
  * Two scans by design, and the second is candidate-pruned: scan 1 keeps
  * O(capacity) state (vs a vocabulary-sized `groupBy(term)` shuffle —
  * 10^8+ groups on a web corpus); scan 2 counts only rows matching the
  * ≤ capacity candidates (broadcast hash semi-join inside the scan
  * stage, predicate-pushable). This is the aggregate-pruned two-scan
  * shape the repo accepts elsewhere (q63 policy): the alternative
  * single-scan exact answer is the full-vocabulary shuffle the sketch
  * exists to avoid.
  */
object HeavyHitters {

  /** One-row frame (n_total, candidates: array<struct term, est>) — the
    * raw mergeable summary, for callers composing their own policy. */
  def sketch(df: DataFrame, termCol: String, capacity: Int): DataFrame =
    df.agg(MisraGries.misraGries(capacity)(col(termCol)).as("s"))
      .select(col("s._1").as("n_total"),
        transform(col("s._2"),
          e => struct(e("_1").as("term"), e("_2").as("est"))).as("candidates"))

  /** The exact set of terms with share > 1/(capacity+1), as
    * (term, cnt) — see object doc for why sketch + candidate-restricted
    * exact count is exact. The driver-side collect is bounded by
    * capacity (the whole point of the sketch). */
  def exact(df: DataFrame, termCol: String, capacity: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val row = sketch(df, termCol, capacity).head()
    val n = row.getLong(0)
    val cands = row.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
    val candDf = cands.toDF("term")
    df.select(col(termCol).as("term"))
      .join(broadcast(candDf), Seq("term"), "left_semi")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (capacity + 1) > n)
  }

  // ------------------------------------------------- mergeable state

  /** [[sketch]] in the engine's storable mergeable-state shape: one row
    * (_n, _cands: array<struct term, est>). The MG summary is itself a
    * mergeable summary (Agarwal et al., PODS'12), so it joins the
    * cnt/sum/histogram/HLL/decay family behind the SAME replay-idempotent
    * fold protocol ([[IncrementalAgg.foldStateIntoStore]]) — the one
    * state the r8 verdict flagged as fold-less. */
  def state(df: DataFrame, termCol: String, capacity: Int): DataFrame =
    sketch(df, termCol, capacity)
      .select(col("n_total").as("_n"), col("candidates").as("_cands"))

  /** Exact PODS'12 merge of [[state]] frames, fully in-plan: sum the
    * counters term-wise, and when more than `capacity` terms survive,
    * subtract the (capacity+1)-th largest combined count from every
    * counter and drop the non-positive — the rule that preserves the
    * n/(capacity+1) undercount bound under ANY merge tree, so
    * fold-maintained candidates still provably contain every true heavy
    * hitter. The keyless window/aggregates below run on ≤ states×capacity
    * rows (the whole point of the sketch), never on data. */
  def mergeStates(capacity: Int, states: DataFrame*): DataFrame =
    mergeStatesGrouped(capacity, Seq.empty, states: _*)

  /** [[mergeStates]] generalized to PER-GROUP states ((groups…, _n,
    * _cands) rows — [[statePerGroup]]'s shape): the PODS'12 rule
    * applies within each group independently (the bound is
    * per-stream), so the trim window partitions by the group columns
    * — per-group candidate rows, never data, never a global sort.
    * With `groups` empty this IS the global merge (keyless window
    * over ≤ states×capacity rows). Groups absent from one side pass
    * through; a group whose candidates all cancelled keeps an empty
    * array (its _n still counts — the share bar needs it). */
  def mergeStatesGrouped(capacity: Int, groups: Seq[String],
                         states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state frame")
    val u = states.reduce(_.unionByName(_))
    val g = groups.map(col)
    val n = u.groupBy(g: _*).agg(coalesce(sum(col("_n")), lit(0L)).as("_n"))
    val combined = u.select(g :+ explode(col("_cands")).as("c"): _*)
      .groupBy(g :+ col("c.term").as("term"): _*)
      .agg(sum(col("c.est")).as("est"))
    val ranked = combined.withColumn("_rk",
      row_number().over(Window.partitionBy(g: _*)
        .orderBy(col("est").desc, col("term"))))
    val cut = ranked.groupBy(g: _*).agg(coalesce(
      max(when(col("_rk") === capacity + 1, col("est"))), lit(0L)).as("_cut"))
    val kept = (if (groups.isEmpty) ranked.crossJoin(broadcast(cut))
                else ranked.join(cut, groups))
      .filter(col("est") > col("_cut"))
      .select(g :+ col("term") :+ (col("est") - col("_cut")).as("est"): _*)
    // deterministic candidate order (est desc, term asc) — the same
    // order finish() pins, so state round-trips are byte-stable
    val cands = kept
      .groupBy(g: _*)
      .agg(collect_list(struct(col("term"), col("est"))).as("raw"))
      .select(g :+ array_sort(col("raw"), (l, r) =>
        when(l("est") > r("est"), -1).when(l("est") < r("est"), 1)
          .when(l("term") < r("term"), -1).when(l("term") > r("term"), 1)
          .otherwise(0)).as("_cands"): _*)
    if (groups.isEmpty) n.crossJoin(cands)
    else n.join(cands, groups, "left")
      .withColumn("_cands", coalesce(col("_cands"),
        array().cast("array<struct<term:string,est:bigint>>")))
  }

  /** The exact heavy-hitter set derived from a MAINTAINED state instead
    * of a fresh sketch pass: candidates and the stream length come from
    * the state (bounded, capacity-sized collect); only the
    * candidate-restricted exact count scans `df` — which must be the
    * same full history the state folded. Exactness carries over because
    * the merged summary keeps the n/(capacity+1) bound (see
    * [[mergeStates]]). */
  def exactFromState(state: DataFrame, df: DataFrame, termCol: String,
                     capacity: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val row = state.select(col("_n"), col("_cands")).head()
    val n = row.getLong(0)
    val cands = row.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
    val candDf = cands.toDF("term")
    df.select(col(termCol).as("term"))
      .join(broadcast(candDf), Seq("term"), "left_semi")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (capacity + 1) > n)
  }

  /** Replay-idempotent streaming maintenance of the MG summary — the
    * generalized fold ([[IncrementalAgg.foldStateIntoStore]]): heavy-
    * hitter candidates stay current per micro-batch without rescanning
    * history; [[exactFromState]] turns the stored state into the exact
    * set on demand. */
  def foldIntoStore(store: ParquetTableStore, name: String, batch: DataFrame,
                    termCol: String, capacity: Int,
                    batchId: Long, epoch: String): Unit =
    IncrementalAgg.foldStateIntoStore(store, name,
      state(batch, termCol, capacity),
      (p, d) => mergeStates(capacity, p, d), batchId, epoch)

  // --------------------------------------------- per-group state fold

  /** [[sketchPerGroup]] in the storable state shape:
    * (group, _n, _cands) rows. */
  def statePerGroup(df: DataFrame, groupCol: String, termCol: String,
                    capacity: Int): DataFrame =
    sketchPerGroup(df, groupCol, termCol, capacity)
      .select(col(groupCol), col("n_total").as("_n"),
        col("candidates").as("_cands"))

  /** [[exactFromState]] per group, with NO driver collect (the
    * [[exactPerGroup]] plan over a MAINTAINED state instead of a fresh
    * sketch pass): candidates explode to a (group, term) frame, the
    * restriction is a (group, term) semi-join, the share bar joins the
    * state's per-group _n. `df` must be the same full history the
    * state folded. */
  def exactFromStatePerGroup(state: DataFrame, df: DataFrame,
                             groupCol: String, termCol: String,
                             capacity: Int): DataFrame = {
    val cands = state.select(col(groupCol), explode(col("_cands")).as("c"))
      .select(col(groupCol), col("c.term").as("term"))
    df.select(col(groupCol), col(termCol).as("term"))
      .join(cands, Seq(groupCol, "term"), "left_semi")
      .groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .join(state.select(col(groupCol), col("_n")), Seq(groupCol))
      .filter(col("cnt") * (capacity + 1) > col("_n"))
      .select(col(groupCol), col("term"), col("cnt"))
  }

  /** Per-group replay-idempotent maintenance: "top terms per language"
    * stays current per micro-batch. Same marker protocol; the state
    * table is group-cardinality-sized (≤ capacity candidates each). */
  def foldIntoStorePerGroup(store: ParquetTableStore, name: String,
                            batch: DataFrame, groupCol: String,
                            termCol: String, capacity: Int,
                            batchId: Long, epoch: String): Unit =
    IncrementalAgg.foldStateIntoStore(store, name,
      statePerGroup(batch, groupCol, termCol, capacity),
      (p, d) => mergeStatesGrouped(capacity, Seq(groupCol), p, d),
      batchId, epoch)

  /** Per-group summaries: (group, n_total, candidates). The per-key
    * variant for "top domains per language"-shaped questions; state is
    * O(capacity) per group on the map side. */
  def sketchPerGroup(df: DataFrame, groupCol: String, termCol: String,
                     capacity: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(MisraGries.misraGries(capacity)(col(termCol)).as("s"))
      .select(col(groupCol), col("s._1").as("n_total"),
        transform(col("s._2"),
          e => struct(e("_1").as("term"), e("_2").as("est"))).as("candidates"))

  /** The exact per-group heavy-hitter sets — (group, term, cnt) for
    * every term whose within-group share exceeds 1/(capacity+1) — at
    * per-group sketch cost. Unlike [[exact]], NOTHING collects to the
    * driver: the candidate list is a frame ((group, term) pairs, ≤
    * capacity per group), the restriction is a (group, term) semi-join
    * (vocabulary-pruned before the counting shuffle), and the share
    * bar joins each group's exact candidate counts against the
    * sketch's exact per-group n — so group cardinality can be
    * warehouse-sized. Exactness argument per group is [[exact]]'s
    * verbatim: the MG bound holds within each group independently. */
  def exactPerGroup(df: DataFrame, groupCol: String, termCol: String,
                    capacity: Int): DataFrame = {
    val sk = sketchPerGroup(df, groupCol, termCol, capacity)
    val cands = sk.select(col(groupCol), explode(col("candidates")).as("c"))
      .select(col(groupCol), col("c.term").as("term"))
    df.select(col(groupCol), col(termCol).as("term"))
      .join(cands, Seq(groupCol, "term"), "left_semi")
      .groupBy(col(groupCol), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .join(sk.select(col(groupCol), col("n_total")), Seq(groupCol))
      .filter(col("cnt") * (capacity + 1) > col("n_total"))
      .select(col(groupCol), col("term"), col("cnt"))
  }
}
