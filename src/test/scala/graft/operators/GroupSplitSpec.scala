package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GroupSplitSpec extends SparkSpec {
  import spark.implicits._

  private val fractions = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)

  // 400 groups × 3 rows — enough groups for fraction convergence checks
  private def corpus = (0 until 400).flatMap { g =>
    (0 until 3).map(r => (s"grp_$g", g * 3L + r))
  }.toDF("grp", "row_id")

  test("group atomicity: every group's rows land in exactly one split") {
    val perGroup = GroupSplit.assign(corpus, "grp", "s1", fractions)
      .groupBy("grp").agg(countDistinct(col("split")).as("n"))
      .agg(max(col("n"))).as[Long].head()
    assert(perGroup == 1L, "a group spanned multiple splits — leakage")
  }

  test("fractions are honored over groups (binomial tolerance)") {
    val got = GroupSplit.assign(corpus, "grp", "s1", fractions)
      .select("grp", "split").distinct()
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(got.values.sum == 400L)
    // 3-sigma on 400 Bernoulli(p) draws
    fractions.foreach { case (name, p) =>
      val n = got.getOrElse(name, 0L).toDouble
      val sigma = math.sqrt(400 * p * (1 - p))
      assert(math.abs(n - 400 * p) <= 3 * sigma,
        s"split $name: $n groups vs expected ${400 * p} ± ${3 * sigma}")
    }
  }

  test("assignment is deterministic, seed-sensitive, and corpus-growth-stable") {
    def assignments(df: org.apache.spark.sql.DataFrame, seed: String) =
      GroupSplit.assign(df, "grp", seed, fractions)
        .select("grp", "split").distinct()
        .as[(String, String)].collect().toMap
    val a = assignments(corpus, "s1")
    assert(a == assignments(corpus, "s1"), "same seed must reproduce")
    assert(a != assignments(corpus, "other"), "seed must matter")
    // growth stability: doubling the corpus must not move ANY old group
    val grown = corpus.unionByName(
      (400 until 800).map(g => (s"grp_$g", g.toLong)).toDF("grp", "row_id"))
    val b = assignments(grown, "s1")
    a.foreach { case (g, s) =>
      assert(b(g) == s, s"group $g moved from $s to ${b(g)} when the corpus grew")
    }
  }

  test("null group keys form one ordinary deterministic group") {
    val df = Seq(Some("g1"), None, None, Some("g2")).toDF("grp")
    val splits = GroupSplit.assign(df, "grp", "s1", fractions)
      .filter(col("grp").isNull).select("split").as[String].collect()
    assert(splits.length == 2 && splits.distinct.length == 1,
      s"null rows must share one split: ${splits.toSeq}")
  }

  test("degenerate and invalid fraction lists are rejected or trivial") {
    val df = Seq("a", "b").toDF("grp")
    val one = GroupSplit.assign(df, "grp", "s", Seq("all" -> 1.0))
      .select("split").as[String].collect()
    assert(one.toSet == Set("all"))
    intercept[IllegalArgumentException] {
      GroupSplit.assign(df, "grp", "s", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      GroupSplit.assign(df, "grp", "s", Seq("a" -> 1.5, "b" -> -0.5))
    }
  }

  test("the split expression adds no exchange (computed in the scan projection)") {
    val plan = GroupSplit.assign(corpus, "grp", "s1", fractions)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split assignment must not shuffle:\n$plan")
  }

  test("k-fold: whole groups share a fold, folds span [0,k), roughly balanced") {
    val folded = GroupSplit.assignFolds(corpus, "grp", "cv", k = 5)
    val perGroup = folded.groupBy(col("grp"))
      .agg(countDistinct(col("fold")).as("nf")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L), "a group must sit in ONE fold")
    val folds = folded.select(col("fold")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(folds.subsetOf((0 until 5).toSet) && folds.size >= 3,
      s"5 folds over many groups should mostly populate: $folds")
  }

  test("k-fold is deterministic, seed-sensitive and growth-stable") {
    val a = GroupSplit.assignFolds(corpus, "grp", "cv", 5)
      .select(col("grp"), col("fold")).distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val b = GroupSplit.assignFolds(corpus, "grp", "cv", 5)
      .select(col("grp"), col("fold")).distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(a == b)
    val seeded = GroupSplit.assignFolds(corpus, "grp", "cv2", 5)
      .select(col("grp"), col("fold")).distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(seeded != a, "a different seed must reshuffle folds")
    // growth stability: folds computed on a subset agree with the full corpus
    val sub = GroupSplit.assignFolds(corpus.limit(20), "grp", "cv", 5)
      .select(col("grp"), col("fold")).distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(sub.forall { case (g, f) => a(g) == f })
  }

  test("k-fold: invalid k fails loudly") {
    intercept[IllegalArgumentException] {
      GroupSplit.assignFolds(corpus, "grp", "cv", 1)
    }
  }
}
