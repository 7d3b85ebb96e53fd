package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage — the blocking → pairwise-score →
  * transitive-closure composite (Fellegi & Sunter 1969 lineage; the
  * MapReduce formulation every dedup-at-scale system uses): find records
  * that denote the same real-world entity despite textual variation,
  * group them, and elect a canonical survivor per group.
  *
  * The three stages map onto machinery the engine already proves
  * elsewhere, composed rather than re-implemented:
  *
  *   1. BLOCKING bounds the pair space: candidates are generated only
  *      within equal blocking-key groups (a self-equi-join, never a
  *      cross join). [[Similarity.capBuckets]] guards the quadratic
  *      worst case exactly as the LSH-band joins do — a block over
  *      `maxBlock` is dropped WHOLESALE (its members go unmatched;
  *      an over-cap block means the blocking key is too coarse and
  *      carries no discriminating signal — pick a finer key rather
  *      than raising the cap). Blocking recall loss is the standard
  *      ER trade: pairs split across blocks are not compared.
  *   2. SCORING is exact Levenshtein on the name column, kept only
  *      under `maxEditDist` — computed on block-bounded candidates,
  *      never all pairs (the q39 discipline).
  *   3. CLUSTERING is transitive closure over match edges —
  *      [[Similarity.dedupClustersLogRounds]], the O(log n)
  *      star-contraction component finder, so chain-shaped match
  *      graphs (a~b~c~… with no direct a~c edge — exactly what
  *      near-threshold edit distances produce) close in
  *      logarithmically many rounds.
  *
  * Every record appears in the output with its cluster label (the
  * component-minimum id — simultaneously the elected survivor, the
  * deterministic "keep the oldest id" survivorship rule). */
object EntityResolution {

  /** The shared blocking scaffold: null-filtered projection, capped
    * blocks, within-block self-join — (id_a, id_b, _na, _nb) with
    * id_a < id_b. ONE definition for every scorer (a one-sided edit to
    * null handling or capping would silently fork the variants). */
  private def blockedPairs(records: DataFrame, idCol: String,
                           nameCol: String, blockCols: Seq[String],
                           maxBlock: Int): DataFrame = {
    require(blockCols.nonEmpty,
      "blockCols must be non-empty: blocking is what bounds the pair space")
    val proj = records.select(
      (col(idCol) +: col(nameCol) +: blockCols.map(col)): _*)
      .filter(col(idCol).isNotNull && col(nameCol).isNotNull &&
        blockCols.map(col(_).isNotNull).reduce(_ && _))
    val capped = Similarity.capBuckets(proj, blockCols, maxBlock)
    val a = capped.select(col(idCol).as("id_a") +: col(nameCol).as("_na") +:
      blockCols.map(c => col(c).as(s"_b_$c")): _*)
    val b = capped.select(col(idCol).as("id_b") +: col(nameCol).as("_nb") +:
      blockCols.map(c => col(c).as(s"_b_$c")): _*)
    a.join(b, blockCols.map(c => s"_b_$c"))
      .filter(col("id_a") < col("id_b"))
  }

  /** Match edges: (id_a, id_b, edit_dist), id_a < id_b, same blocking
    * key, Levenshtein ≤ maxEditDist. */
  def matchPairs(records: DataFrame, idCol: String, nameCol: String,
                 blockCols: Seq[String], maxEditDist: Int,
                 maxBlock: Int = 1000): DataFrame = {
    require(maxEditDist >= 0, s"maxEditDist must be >= 0: $maxEditDist")
    // THRESHOLD Levenshtein (banded DP, early-exit; Spark 3.5+): -1 when
    // the distance exceeds maxEditDist, the exact distance otherwise —
    // measured 5× cheaper than the unbounded form on this join (the DP
    // band is O(n·k) instead of O(n²) and most pairs exit early)
    blockedPairs(records, idCol, nameCol, blockCols, maxBlock)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("_na"), col("_nb"), maxEditDist).as("edit_dist"))
      .filter(col("edit_dist") >= 0)
  }

  /** [[matchPairs]] with Jaro-Winkler scoring instead of Levenshtein —
    * the standard name-matching scorer (transposition-tolerant,
    * prefix-boosted; [[graft.plans.JaroWinkler]], a native expression
    * value-identical to DuckDB's, so oracle-replayable). Returns
    * (id_a, id_b, jw_sim) with raw similarity ≥ `minSim` (threshold on
    * the UNROUNDED value, output rounded to 6 — the convention). */
  def matchPairsJw(records: DataFrame, idCol: String, nameCol: String,
                   blockCols: Seq[String], minSim: Double,
                   maxBlock: Int = 1000): DataFrame = {
    require(minSim > 0 && minSim <= 1, s"minSim must be in (0,1]: $minSim")
    blockedPairs(records, idCol, nameCol, blockCols, maxBlock)
      .select(col("id_a"), col("id_b"),
        call_function("jaro_winkler", col("_na"), col("_nb")).as("_jw"))
      .filter(col("_jw") >= minSim)
      .select(col("id_a"), col("id_b"), round(col("_jw"), 6).as("jw_sim"))
  }

  /** Exact edit-distance-≤1 match pairs over the WHOLE corpus with NO
    * blocking key and NO quadratic join — the deletion-neighborhood
    * method (the SymSpell/FastSS family): every string emits itself
    * plus its |s| single-deletion variants, and any two strings within
    * Levenshtein distance 1 provably share a variant —
    *   substitution at i  → both deletion-at-i variants equal;
    *   insertion/deletion → the longer string's deletion-at-i equals
    *                        the shorter string ITSELF.
    * So the variant hash-join's candidate set is COMPLETE: unlike
    * key-blocking ([[matchPairs]]), there is no recall trade at all,
    * and unlike the blocked self-join the cost is O(n·L) emitted
    * variants + bucket-bounded pairs instead of O(Σ block²). The
    * threshold-Levenshtein verify then removes the false candidates
    * (distinct strings CAN share a variant at distance 2, e.g.
    * "ab"→"b"←"cb" is dist 1, but "axc"/"ayc" share "ac" at dist 1 —
    * and "ab"/"ba" share "b" and "a" at distance 2 — so verification
    * is still load-bearing).
    *
    * The default is UNCAPPED — completeness is the whole point, and a
    * silent cap would contradict it. Pass `maxBucket > 0` to trade
    * recall for safety on degenerate corpora (thousands of strings one
    * edit from the same variant = a near-constant column;
    * [[Similarity.capBuckets]] whole-bucket drop, an EXPLICIT opt-in
    * here, never a default). Returns (id_a, id_b, edit_dist),
    * id_a < id_b, edit_dist ∈ {0, 1} (0 = exact duplicate names on
    * distinct ids). */
  def matchPairsDeletion1(records: DataFrame, idCol: String,
                          nameCol: String,
                          maxBucket: Int = 0): DataFrame = {
    val base = records
      .select(col(idCol).as("_id"), col(nameCol).as("_nm"))
      .filter(col("_id").isNotNull && col("_nm").isNotNull)
    val variants = base.select(col("_id"), col("_nm"),
      explode(array_distinct(concat(
        array(col("_nm")),
        transform(sequence(lit(0), length(col("_nm")) - 1), i =>
          concat(col("_nm").substr(lit(1), i),
            col("_nm").substr(i + lit(2), length(col("_nm")))))))).as("_v"))
    val capped = Similarity.capBuckets(variants, Seq("_v"), maxBucket)
    val cand = capped.select(col("_v"), col("_id").as("id_a"))
      .join(capped.select(col("_v"), col("_id").as("id_b")), Seq("_v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(base.select(col("_id").as("id_a"), col("_nm").as("_na")), Seq("id_a"))
      .join(base.select(col("_id").as("id_b"), col("_nm").as("_nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("_na"), col("_nb"), 1).as("edit_dist"))
      .filter(col("edit_dist") >= 0)
  }

  /** (id, label) over ALL records: label = component-minimum id of the
    * match graph, = the record's own id for non-matched records. */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
              blockCols: Seq[String], maxEditDist: Int,
              maxBlock: Int = 1000): DataFrame = {
    val pairs = matchPairs(records, idCol, nameCol, blockCols,
      maxEditDist, maxBlock).select(col("id_a"), col("id_b"))
    Similarity.dedupClustersLogRounds(pairs,
      records.select(col(idCol)), idCol)
  }

  /** Cluster roll-up for resolved entities (size ≥ 2): survivor id,
    * member count, and the name span for review. */
  def clusters(records: DataFrame, idCol: String, nameCol: String,
               blockCols: Seq[String], maxEditDist: Int,
               maxBlock: Int = 1000): DataFrame = {
    val labels = resolve(records, idCol, nameCol, blockCols,
      maxEditDist, maxBlock)
    labels.join(records.select(col(idCol).as("id"), col(nameCol)), Seq("id"))
      .groupBy(col("label").as("entity_rep"))
      .agg(count(lit(1)).as("n_records"),
        min(col(nameCol)).as("first_name"), max(col(nameCol)).as("last_name"))
      .filter(col("n_records") >= 2)
  }
}
