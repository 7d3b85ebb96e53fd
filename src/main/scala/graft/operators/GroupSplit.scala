package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe dataset splitting: the split unit is a GROUP (domain,
  * dedup-cluster id, author…), never the row. Row-level random splits
  * leak — near-duplicates and same-source documents land on both sides
  * of train/test, and the eval set silently overlaps training data (the
  * standard contamination vector a [[Decontaminate]]-style scrub then
  * has to clean up after). Assigning whole groups closes that vector by
  * construction: everything that shares the group key moves together.
  *
  * Assignment is a pure expression — md5("<seed>/<group>"), first 8 hex
  * digits compared against cumulative-fraction thresholds — so it is
  * deterministic across runs, engines, partitionings, and cluster
  * sizes; a group's split NEVER changes when the corpus around it grows
  * (the property that keeps yesterday's test set valid after today's
  * ingest). No shuffle is introduced at all: the split column is
  * computed in the scan projection, and fractions are honored in
  * EXPECTATION over groups (each group falls left of threshold t with
  * probability t), accurate to 2^-32 per boundary.
  *
  * NULL group keys are a real corpus fact (documents with no domain):
  * they hash under a sentinel, forming one ordinary group, and the
  * sentinel is part of the contract so an oracle can replay it.
  */
object GroupSplit {

  private val NullSentinel = " NULL"

  /** THE replay contract both split and fold share: first 8 hex digits
    * of md5("<seed>/<group-or-sentinel>"). One definition — a one-sided
    * change to sentinel, separator or digest width would silently break
    * the documented cross-operator/oracle replay. */
  private def hash8(groupKey: Column, seed: String): Column =
    substring(md5(concat(lit(seed + "/"),
      coalesce(groupKey.cast("string"), lit(NullSentinel)))), 1, 8)

  /** The split column expression: `fractions` are (name, weight) in
    * declaration order, summing to 1 (±1e-9). */
  def splitColumn(groupKey: Column, seed: String,
                  fractions: Seq[(String, Double)]): Column = {
    require(fractions.nonEmpty, "need at least one split")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    require(fractions.forall(_._2 > 0), "every fraction must be positive")
    val h = hash8(groupKey, seed)
    val cum = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
    // 8 lowercase hex digits compare lexicographically as numbers, so a
    // string threshold at floor(cum * 2^32) is an exact numeric cut
    val thresholds = cum.init.map(c => f"${(c * 4294967296.0).toLong}%08x")
    val first = when(h < lit(thresholds.headOption.getOrElse("")), lit(fractions.head._1))
    val mid = thresholds.zip(fractions.map(_._1)).drop(1).foldLeft(first) {
      case (acc, (t, name)) => acc.when(h < lit(t), lit(name))
    }
    if (thresholds.isEmpty) lit(fractions.head._1)
    else mid.otherwise(lit(fractions.last._1))
  }

  /** `df` plus a `split` column assigned per group. */
  def assign(df: DataFrame, groupCol: String, seed: String,
             fractions: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitColumn(col(groupCol), seed, fractions))

  /** Leakage-safe k-FOLD assignment (cross-validation's split shape):
    * fold = (first 8 md5 hex digits of "<seed>/<group>") mod k — the
    * same pure-expression, growth-stable, no-shuffle contract as
    * [[splitColumn]] (a group's fold never changes as the corpus
    * grows; whole groups move together; nulls hash under the
    * sentinel). Uniform to within the 2³² mod-k remainder bias
    * (< 2⁻²⁸ for any practical k). */
  def foldColumn(groupKey: Column, seed: String, k: Int): Column = {
    require(k >= 2, s"k must be >= 2: $k")
    pmod(conv(hash8(groupKey, seed), 16, 10).cast("long"), lit(k.toLong))
      .cast("int")
  }

  /** `df` plus a `fold` column in [0, k). */
  def assignFolds(df: DataFrame, groupCol: String, seed: String,
                  k: Int): DataFrame =
    df.withColumn("fold", foldColumn(col(groupCol), seed, k))
}
