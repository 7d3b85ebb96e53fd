package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association-rule mining (Agrawal & Srikant VLDB'94 lineage,
  * restricted to the 2-itemset level that dominates practice): from
  * (basket, item) observations, find directed rules A → B with
  *
  *   support(A→B)    = c(AB) / N        (co-occurrence share)
  *   confidence(A→B) = c(AB) / c(A)     (P(B | A))
  *   lift(A→B)       = N·c(AB) / (c(A)·c(B))   (vs independence)
  *
  * The shape is three hash aggregates and two item-keyed joins, all on
  * DISTINCT (basket, item) pairs — multiplicity inside a basket never
  * inflates support:
  *   1. distinct (basket, item)           (one exchange)
  *   2. item counts                       (item-keyed aggregate)
  *   3. pair counts: self-join on basket with item_a < item_b —
  *      bounded by Σ C(|basket|,2), quadratic in BASKET size (small
  *      by domain), never in item or basket count; `maxBasket` drops
  *      oversized baskets wholesale (the capBuckets convention —
  *      a 10⁴-item basket is telemetry noise, not co-purchase signal,
  *      and would alone contribute 5·10⁷ pairs).
  *   4. attach c(A), c(B) (item-keyed joins — item-count frames are
  *      item-sized, not broadcast-hinted: Heaps-law policy), emit both
  *      rule directions from one pair row, filter, round.
  * N rides as a 1-row broadcast frame. */
object MarketBasket {

  /** Distinct (basket, item) support pairs. */
  def baskets(df: DataFrame, basketCol: String, itemCol: String): DataFrame =
    df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .distinct()

  /** Directed rules (item_a, item_b, pair_count, support, confidence,
    * lift) with pair_count ≥ minCount and confidence ≥ minConfidence;
    * both directions of every qualifying pair. */
  def rules(df: DataFrame, basketCol: String, itemCol: String,
            minCount: Long, minConfidence: Double,
            maxBasket: Int = 10000): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1: $minCount")
    require(minConfidence >= 0 && minConfidence <= 1,
      s"minConfidence must be in [0,1]: $minConfidence")
    val bi = Checkpoints.materialize(
      Similarity.capBuckets(baskets(df, basketCol, itemCol),
        Seq("basket"), maxBasket))
    val n = bi.agg(countDistinct(col("basket")).cast("double").as("n"))
    val itemCnt = bi.groupBy(col("item")).agg(count(lit(1)).as("c"))
    val pairCnt = bi.select(col("basket"), col("item").as("ia"))
      .join(bi.select(col("basket"), col("item").as("ib")), Seq("basket"))
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= minCount)
    val attached = pairCnt
      .join(itemCnt.select(col("item").as("ia"), col("c").as("ca")), Seq("ia"))
      .join(itemCnt.select(col("item").as("ib"), col("c").as("cb")), Seq("ib"))
      .crossJoin(broadcast(n))
    // one pair row → both rule directions (confidence differs; support
    // and lift are symmetric)
    val rows = attached.select(explode(array(
      struct(col("ia").as("item_a"), col("ib").as("item_b"),
        col("cab"), col("ca").as("c_a"), col("cb").as("c_b"), col("n")),
      struct(col("ib").as("item_a"), col("ia").as("item_b"),
        col("cab"), col("cb").as("c_a"), col("ca").as("c_b"), col("n"))))
      .as("r")).select(col("r.*"))
    // threshold on the UNROUNDED confidence (the codebase convention —
    // q101/q104 filter raw values and round only the output; filtering
    // the rounded value would admit rules up to 5e-7 below threshold)
    rows.filter(col("cab") / col("c_a") >= minConfidence)
      .select(col("item_a"), col("item_b"), col("cab").as("pair_count"),
        round(col("cab") / col("n"), 6).as("support"),
        round(col("cab") / col("c_a"), 6).as("confidence"),
        round(col("n") * col("cab") / (col("c_a") * col("c_b")), 6).as("lift"))
  }
}
