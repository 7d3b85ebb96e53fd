package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B experiment readout — the two-proportion z-test every
  * experimentation platform runs: did variant A convert differently
  * from variant B, and is the difference larger than chance?
  *
  *   z = (p_a − p_b) / √( p̂(1−p̂)(1/n_a + 1/n_b) ),  p̂ pooled
  *
  * Everything is two hash aggregates (distinct assignment per user →
  * per-variant n/k; conversion flag via one left join on user) plus a
  * 1-row combine via min_by/max_by — no collect, no pivot, nothing
  * driver-side except the contract checks (counts on
  * assignment-sized aggregate frames). Two contracts are ENFORCED,
  * not just documented: exactly two distinct variants, and one
  * variant per user — a user assigned both arms is a corrupt
  * assignment log that would silently inflate BOTH arms' n and k,
  * so it is a loud error, never a quietly wrong z.
  *
  * The statistical decision is |z| > 1.96 (two-sided 5%). p-values are
  * deliberately left out: no closed-form normal CDF exists in either
  * engine's SQL surface, and an approximation polynomial under a hash
  * gate would pin implementation noise, not statistics. */
object Experiment {

  /** One row: variant_a/b (lexicographic), n, conversions and rate per
    * variant, pooled z (round 4, null when a pooled rate of 0 or 1
    * degenerates the variance), and the |z| > 1.96 verdict. Requires
    * EXACTLY two distinct variants (loud error otherwise). */
  def abReadout(assignments: DataFrame, userCol: String, variantCol: String,
                conversions: DataFrame, convUserCol: String): DataFrame = {
    val asg = Checkpoints.materialize(assignments
      .select(col(userCol).as("user"), col(variantCol).as("variant"))
      .filter(col("user").isNotNull && col("variant").isNotNull)
      .distinct())
    val dualAssigned = asg.groupBy(col("user"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") > 1).count()
    require(dualAssigned == 0,
      s"abReadout: $dualAssigned user(s) assigned to more than one " +
        "variant — a corrupt assignment log would double-count both arms")
    val conv = conversions.select(col(convUserCol).as("user"))
      .filter(col("user").isNotNull).distinct()
      .withColumn("_c", lit(1))
    val stats = Checkpoints.materialize(
      asg.join(conv, Seq("user"), "left")
        .groupBy(col("variant"))
        .agg(count(lit(1)).as("n"),
          count(col("_c")).as("k")))
    val nVariants = stats.count()
    require(nVariants == 2,
      s"abReadout requires exactly 2 variants, found $nVariants")
    val one = stats.agg(
      min(col("variant")).as("variant_a"), max(col("variant")).as("variant_b"),
      min_by(col("n"), col("variant")).as("n_a"),
      max_by(col("n"), col("variant")).as("n_b"),
      min_by(col("k"), col("variant")).as("conv_a"),
      max_by(col("k"), col("variant")).as("conv_b"))
    val pa = col("conv_a") / col("n_a")
    val pb = col("conv_b") / col("n_b")
    val pp = (col("conv_a") + col("conv_b")) / (col("n_a") + col("n_b"))
    val se = sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    one.select(col("variant_a"), col("variant_b"),
      col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
      when(pp > 0 && pp < 1, round((pa - pb) / se, 4)).as("z"),
      coalesce(when(pp > 0 && pp < 1, abs((pa - pb) / se) > 1.96),
        lit(false)).as("significant"))
  }
}
