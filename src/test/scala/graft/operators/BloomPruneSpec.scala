package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val probe = Tables.lineitem(spark, sfDir)
  private lazy val build = Tables.part(spark, sfDir)
    .filter(col("p_size") > 45)

  test("semiJoin ≡ the plain semi join, bit for bit") {
    val got = BloomPrune.semiJoin(probe, "l_partkey", build, "p_partkey",
      estimatedItems = 10000)
    val want = probe.join(build, col("l_partkey") === col("p_partkey"),
      "left_semi")
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("innerJoin ≡ the plain inner join") {
    val got = BloomPrune.innerJoin(probe, "l_partkey", build, "p_partkey",
        estimatedItems = 10000)
      .agg(count(lit(1)), sum(col("l_quantity")), sum(col("p_size")))
      .collect().head
    val want = probe.join(build, col("l_partkey") === col("p_partkey"))
      .agg(count(lit(1)), sum(col("l_quantity")), sum(col("p_size")))
      .collect().head
    assert(got == want)
  }

  test("pruned is a superset of true matches and admits string keys") {
    val b = Seq("a", "b").toDF("k")
    val p = Seq("a", "b", "c", "d", "e").toDF("k")
    val kept = BloomPrune.pruned(p, "k", BloomPrune.bloomOf(b, "k", 10))
      .collect().map(_.getString(0)).toSet
    assert(Set("a", "b").subsetOf(kept), s"bloom lost a true match: $kept")
  }

  test("empty build side prunes everything (vacuous semi join)") {
    val none = build.filter(lit(false))
    assert(BloomPrune.semiJoin(probe, "l_partkey", none, "p_partkey",
      estimatedItems = 10).isEmpty)
  }

  test("null probe keys are dropped by the prune") {
    val p = Seq(Some(1L), Some(2L), None).toDF("k")
    val b = Seq(1L).toDF("k")
    val got = BloomPrune.semiJoin(p, "k", b.withColumnRenamed("k", "bk"),
      "bk", estimatedItems = 10).collect().map(_.get(0)).toSeq
    assert(got == Seq(1L))
  }

  test("pruned() itself drops null probe keys in the scan, not just the exact join") {
    // xxhash64(null) evaluates to the seed constant, which the bloom may
    // well admit — the explicit isNotNull conjunct must drop the row
    // before the shuffle regardless
    val p = Seq(Some(1L), Some(2L), None).toDF("k")
    val bloom = BloomPrune.bloomOf(Seq(1L, 2L).toDF("bk"), "bk",
      estimatedItems = 10)
    val got = BloomPrune.pruned(p, "k", bloom).collect().map(_.get(0)).toSet
    assert(got == Set(1L, 2L), s"null row survived the prune: $got")
  }

  test("the bloom probe sits in the plan and builds as an aggregate") {
    val df = BloomPrune.semiJoin(probe, "l_partkey", build, "p_partkey",
      estimatedItems = 10000)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    assert(plan.contains("bloom_filter_agg"),
      s"bloom must build as a distributed aggregate:\n$plan")
  }

  test("probe and build keys sharing a NAME resolve unambiguously") {
    val p = Seq(1L, 2L, 3L).toDF("k")
    val b = Seq(2L, 3L).toDF("k")
    val got = BloomPrune.semiJoin(p, "k", b, "k", estimatedItems = 10)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  test("invalid estimatedItems fails loudly") {
    intercept[IllegalArgumentException] {
      BloomPrune.bloomOf(build, "p_partkey", 0)
    }
  }
}
