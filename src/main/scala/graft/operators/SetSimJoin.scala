package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** EXACT set-similarity joins via prefix filtering — the no-recall-caveat
  * complement to the LSH family in [[Similarity]].
  *
  * [[Similarity.minhashNearDup]] (q20) finds J ≥ t pairs with a per-pair
  * miss probability (~11% at J = 0.6 under 16×4 banding); the gates tolerate
  * it only because the driver's fixtures were validated to sit clear of the
  * banding threshold. This operator gives the exact alternative: the
  * prefix-filtering candidate scheme of the All-Pairs algorithm (Bayardo,
  * Ma & Srikant, WWW'07 "Scaling Up All Pairs Similarity Search"; the same
  * filter underlies PPJoin, Xiao et al. WWW'08). Every pair with TRUE
  * Jaccard ≥ t is guaranteed to be generated as a candidate; the exact
  * verify then makes the output precisely {pairs : J ≥ t} — so its oracle
  * is the brute-force all-pairs computation with no caveat, and production
  * callers choose per workload: LSH (cheaper, probabilistic recall) or
  * prefix filter (exact, cost grows with gram-frequency skew).
  *
  * Why this scales: under a GLOBAL rarest-first token order (document
  * frequency asc, token asc), doc x only emits its first
  * |x| − ⌈t·|x|⌉ + 1 tokens as join keys. The candidate join's bucket
  * occupancy is the per-token count of *prefix* appearances — frequent
  * tokens sort last and almost never make a prefix, so the quadratic-
  * per-bucket join runs over rare-token buckets only. That is the entire
  * algorithm: no O(n²) pair space, one gram-keyed exchange for document
  * frequencies (same shape as [[Similarity.dupGramStats]]), one window
  * partitioned by doc (per-key rows bounded by doc gram count), one
  * equi-join on prefix tokens, then [[Similarity.candidateFeatures]]'s
  * bounded exact verify.
  *
  * Completeness (why the prefix join loses nothing): if J(x,y) ≥ t then
  * o = |x∩y| ≥ t·(|x|+|y|)/(1+t) ≥ ⌈t·|x|⌉ and ≥ ⌈t·|y|⌉. Suppose the
  * prefixes share no element of x∩y, and wlog last(pref x) ≤ last(pref y)
  * in the global order. Any shared element in pref(x) is ≤ last(pref y),
  * and y's non-prefix elements are all > last(pref y), so it would lie in
  * pref(y) too — contradiction; so no shared element is in pref(x) at all,
  * i.e. all o shared elements sit in x's suffix of ⌈t·|x|⌉ − 1 positions,
  * contradicting o ≥ ⌈t·|x|⌉. (Threshold filters use the UNROUNDED
  * similarity — the theorem covers true J ≥ t, not values that merely
  * round up to t — with the 4-dp rounding applied only to the output.)
  */
object SetSimJoin {

  /** Distinct word-n-gram hashes per doc, as (id, sz, gram) exploded rows.
    * Hashed grams keep the join keys 8 bytes (Jaccard-identical to string
    * shingles w.h.p. — [[Similarity.shingleHashesOf]]'s contract, shared
    * with q20/q22). */
  private def gramRows(docs: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    docs.select(col(idCol).as("id"), Text.tokens(col(textCol)).as("_w"))
      .select(col("id"), Similarity.shingleHashesOf(col("_w"), n).as("grams"))
      .select(col("id"), size(col("grams")).as("sz"),
        explode(col("grams")).as("g"))

  /** Rarest-first prefix rows: each doc's first `sz − ⌈t·sz⌉ + 1` grams in
    * the global (document frequency asc, gram asc) order. `dfGlobal` lets
    * the containment join rank probe prefixes by the CORPUS's frequencies
    * (the index side's skew is what matters for bucket occupancy). */
  private def prefixRows(ex: DataFrame, dfGlobal: DataFrame,
                         threshold: Double): DataFrame = {
    val ranked = ex.join(dfGlobal, Seq("g"), "left")
      // a probe gram absent from the corpus has df 0: rarest of all, and
      // harmless as a join key (it matches nothing)
      .na.fill(0L, Seq("df"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("g"))))
    ranked.filter(col("rn") <=
        col("sz") - ceil(lit(threshold) * col("sz")) + lit(1))
      .select(col("id"), col("sz"), col("g"))
  }

  /** All pairs with exact n-gram Jaccard ≥ threshold, as
    * (id_a < id_b, jaccard·4dp). Exact — see the completeness argument
    * above. `maxBucket > 0` caps prefix-token bucket occupancy
    * ([[Similarity.capBuckets]]) for adversarial corpora at the documented
    * cost of exactness on pairs whose ONLY shared prefix tokens are capped
    * away; the default keeps the guarantee. */
  def allPairsJaccard(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, threshold: Double = 0.6,
                      maxBucket: Int = 0): DataFrame = {
    val ex = gramRows(docs, idCol, textCol, n)
    val dfG = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // the prefix frame feeds BOTH sides of the candidate self-join:
    // materialize once so the gram explode + df aggregate + rank window
    // pipeline behind it is not re-run per side (the minhashNearDup
    // signature-stage pattern)
    val pref = Checkpoints.materialize(Similarity.capBuckets(
      prefixRows(ex, dfG, threshold), Seq("g"), maxBucket))
    val cand = pref.select(col("id").as("id_a"), col("sz").as("sz_a"), col("g"))
      .join(pref.select(col("id").as("id_b"), col("sz").as("sz_b"), col("g")),
        Seq("g"))
      .filter(col("id_a") < col("id_b"))
      // size filter: J ≥ t ⇒ min(|x|,|y|) ≥ t·max(|x|,|y|)
      .filter(least(col("sz_a"), col("sz_b")).cast("double") >=
        lit(threshold) * greatest(col("sz_a"), col("sz_b")).cast("double"))
      .select(col("id_a"), col("id_b")).distinct()
    val grams = (d: DataFrame) =>
      d.select(col(idCol), Text.tokens(col(textCol)).as("_w"))
        .select(col(idCol), Similarity.shingleHashesOf(col("_w"), n).as("grams"))
    Similarity.candidateFeatures(cand, docs, idCol, grams)
      .withColumn("_j",
        size(array_intersect(col("__fa"), col("__fb"))).cast("double") /
          size(array_union(col("__fa"), col("__fb"))).cast("double"))
      .filter(col("_j") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("_j"), 4).as("jaccard"))
  }

  /** Directed containment pairs: (probe id_a, corpus id_b,
    * containment·4dp) with |A∩B| / |A| ≥ threshold, A a probe doc, B a
    * corpus doc. The asymmetric cousin of [[allPairsJaccard]] — detects
    * docs mostly CONTAINED in another (quotes, excerpts, boilerplate
    * wrappers) that Jaccard misses when |B| ≫ |A|.
    *
    * Prefix filter applies to the probe side only (o ≥ ⌈t·|A|⌉, so A's
    * rarest |A| − ⌈t·|A|⌉ + 1 grams must hit B; containment implies no
    * lower bound on o against |B|, so the corpus side indexes ALL its
    * grams — which is why corpus-side bucket occupancy is full gram df and
    * `maxBucket` matters sooner here than in the symmetric join). Probe
    * prefixes are ranked by CORPUS document frequency: it is the index
    * side's skew that sets join bucket occupancy. */
  def containmentJoin(probes: DataFrame, corpus: DataFrame, idCol: String,
                      textCol: String, n: Int = 3, threshold: Double = 0.8,
                      maxBucket: Int = 0): DataFrame = {
    val exP = gramRows(probes, idCol, textCol, n)
    val exC = gramRows(corpus, idCol, textCol, n)
    val dfC = exC.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val pref = prefixRows(exP, dfC, threshold)
    val idx = Similarity.capBuckets(exC, Seq("g"), maxBucket)
    val cand = pref.select(col("id").as("id_a"), col("sz").as("sz_a"), col("g"))
      .join(idx.select(col("id").as("id_b"), col("sz").as("sz_b"), col("g")),
        Seq("g"))
      .filter(col("id_a") =!= col("id_b"))
      // size filter: o ≥ t·|A| and o ≤ |B| ⇒ |B| ≥ t·|A|
      .filter(col("sz_b").cast("double") >= lit(threshold) * col("sz_a").cast("double"))
      .select(col("id_a"), col("id_b")).distinct()
    // two-sided verify ([[Similarity.candidateFeatures]]'s shape, but with
    // per-side feature frames so probes and corpus may be the SAME frame —
    // each side's grams are computed only for its own candidate docs, and
    // each feature frame is joined exactly once (no re-materialization
    // needed beyond the candidate set itself)
    val pairs = Checkpoints.materialize(cand)
    val gramsOf = (d: DataFrame) =>
      d.select(col(idCol), Text.tokens(col(textCol)).as("_w"))
        .select(col(idCol), Similarity.shingleHashesOf(col("_w"), n).as("grams"))
    val fa = gramsOf(probes.join(
      broadcast(pairs.select(col("id_a").as(idCol)).distinct()),
      Seq(idCol), "left_semi"))
    val fb = gramsOf(corpus.join(
      broadcast(pairs.select(col("id_b").as(idCol)).distinct()),
      Seq(idCol), "left_semi"))
    pairs
      .join(fa.select(col(idCol).as("id_a"), col("grams").as("__fa")), "id_a")
      .join(fb.select(col(idCol).as("id_b"), col("grams").as("__fb")), "id_b")
      .withColumn("_c",
        size(array_intersect(col("__fa"), col("__fb"))).cast("double") /
          size(col("__fa")).cast("double"))
      .filter(col("_c") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("_c"), 4).as("containment"))
  }
}
