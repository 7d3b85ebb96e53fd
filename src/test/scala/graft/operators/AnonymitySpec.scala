package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnonymitySpec extends SparkSpec {
  import spark.implicits._

  // (zip, age) quasi-identifiers: one group of 3, one of 2, one singleton
  private lazy val df = Seq(
    ("10001", 30), ("10001", 30), ("10001", 30),
    ("10002", 40), ("10002", 40),
    ("10003", 50)
  ).toDF("zip", "age")

  test("report at k=3: counts, shares, verdict") {
    val r = Anonymity.report(df, Seq("zip", "age"), k = 3).collect().head
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("min_group_size") == 1L)
    assert(r.getAs[Long]("groups_below_k") == 2L)
    assert(r.getAs[Long]("rows_below_k") == 3L)
    assert(r.getAs[Double]("at_risk_pct") == 0.5)
    assert(!r.getAs[Boolean]("k_anonymous"))
  }

  test("k=2 verdict flips when only the singleton violates") {
    val r = Anonymity.report(df, Seq("zip", "age"), k = 2).collect().head
    assert(r.getAs[Long]("groups_below_k") == 1L)
    assert(r.getAs[Long]("rows_below_k") == 1L)
    assert(!r.getAs[Boolean]("k_anonymous"))
    val ok = Anonymity.report(df.filter(col("zip") =!= "10003"),
      Seq("zip", "age"), k = 2).collect().head
    assert(ok.getAs[Boolean]("k_anonymous"))
  }

  test("risky groups come smallest-first with their sizes") {
    val rows = Anonymity.riskyGroups(df, Seq("zip", "age"), k = 3).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(2))).toSeq ==
      Seq(("10003", 1L), ("10002", 2L)))
  }

  test("null quasi-identifier values form risk groups too") {
    val withNull = df.union(Seq((null.asInstanceOf[String], 60)).toDF("zip", "age"))
    val r = Anonymity.report(withNull, Seq("zip", "age"), k = 2).collect().head
    assert(r.getAs[Long]("n_groups") == 4L)
    assert(r.getAs[Long]("groups_below_k") == 2L,
      "the null-zip singleton must count as a violating group")
  }

  test("generalization (bucketing) repairs anonymity") {
    // age-decade generalization merges nothing here, but zip-prefix does
    val coarse = df.select(substring(col("zip"), 1, 4).as("zip4"))
    val r = Anonymity.report(coarse, Seq("zip4"), k = 5).collect().head
    assert(r.getAs[Boolean]("k_anonymous"), r.toString)
  }

  test("empty input yields a definite FALSE verdict, not a null one") {
    // 'couldn't measure' must never read as releasable: a consumer
    // testing `!= false` on a NULL verdict would pass an unmeasured set
    val empty = Seq.empty[(String, Int)].toDF("zip", "age")
    val r = Anonymity.report(empty, Seq("zip", "age"), k = 3).collect().head
    assert(!r.getAs[Boolean]("k_anonymous"))
    assert(r.getAs[Long]("n_groups") == 0L && r.getAs[Long]("n_rows") == 0L)
    assert(r.getAs[Long]("groups_below_k") == 0L &&
      r.getAs[Long]("rows_below_k") == 0L)
    assert(r.getAs[Double]("at_risk_pct") == 0.0)
    assert(r.isNullAt(r.fieldIndex("min_group_size")),
      "there is no smallest class in an empty set — that one stays null")
  }

  test("invalid k fails loudly") {
    intercept[IllegalArgumentException] {
      Anonymity.report(df, Seq("zip"), k = 1)
    }
    intercept[IllegalArgumentException] {
      Anonymity.groupSizes(df, Seq.empty)
    }
  }

  // (zip, diag) for the attribute-disclosure audits: class A has 3
  // distinct diagnoses over 4 rows, class B is HOMOGENEOUS (the leak)
  private lazy val sens = Seq(
    ("A", "flu"), ("A", "flu"), ("A", "cold"), ("A", "covid"),
    ("B", "flu"), ("B", "flu"), ("B", "flu")
  ).toDF("zip", "diag")

  test("l-diversity: homogeneous class fails, hand-computed entropy") {
    val r = Anonymity.diversityReport(sens, Seq("zip"), "diag", 2)
      .collect().head
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("min_distinct") == 1L) // class B
    assert(r.getAs[Long]("groups_below_l") == 1L)
    assert(!r.getAs[Boolean]("l_diverse"))
    assert(!r.getAs[Boolean]("entropy_l_diverse"))
    // min entropy is B's: all-one-value → 0 exactly
    assert(r.getAs[Double]("min_entropy") == 0.0)
    // class A's entropy via the closed form: ln4 − (2ln2 + 0 + 0)/4
    val entA = math.log(4) - 2 * math.log(2) / 4
    val risky = Anonymity.riskyByDiversity(sens, Seq("zip"), "diag", 2)
      .as[(String, Long)].collect().toSeq
    assert(risky == Seq(("B", 1L)))
    // drop B: class A alone is 3-diverse, entropy ≥ ln 2
    val rA = Anonymity.diversityReport(sens.filter($"zip" === "A"),
      Seq("zip"), "diag", 2).collect().head
    assert(rA.getAs[Boolean]("l_diverse") &&
      rA.getAs[Boolean]("entropy_l_diverse"))
    assert(math.abs(rA.getAs[Double]("min_entropy") -
      math.rint(entA * 1e6) / 1e6) < 1e-9)
  }

  test("t-closeness: hand-computed TVD, skewed class trips the verdict") {
    // global: flu 5/7, cold 1/7, covid 1/7
    // class A (4 rows: 2 flu, 1 cold, 1 covid):
    //   TVD = ½(|.5−5/7| + |.25−1/7| + |.25−1/7|) = ½(3/14 + 3/28 + 3/28)
    // class B (3 flu): TVD = ½(|1−5/7| + 1/7 + 1/7) = ½(2/7 + 2/7) = 2/7
    val expectB = 2.0 / 7
    val tight = Anonymity.closenessReport(sens, Seq("zip"), "diag", 0.25)
      .collect().head
    assert(tight.getAs[Long]("n_groups") == 2L)
    assert(math.abs(tight.getAs[Double]("max_tvd") -
      math.rint(expectB * 1e6) / 1e6) < 1e-9)
    assert(tight.getAs[Long]("groups_beyond_t") == 1L) // only B
    assert(!tight.getAs[Boolean]("t_close"))
    val loose = Anonymity.closenessReport(sens, Seq("zip"), "diag", 0.5)
      .collect().head
    assert(loose.getAs[Boolean]("t_close"))
    assert(loose.getAs[Long]("groups_beyond_t") == 0L)
  }

  test("null sensitive values count as values; empty input verdicts are FALSE") {
    val withNull = Seq(("A", Some("flu")), ("A", None), ("B", Some("flu")))
      .toDF("zip", "diag")
    val r = Anonymity.diversityReport(withNull, Seq("zip"), "diag", 2)
      .collect().head
    // class A = {flu, null} → 2 distinct; class B = {flu} → 1
    assert(r.getAs[Long]("min_distinct") == 1L)
    val riskyA = Anonymity.riskyByDiversity(withNull, Seq("zip"), "diag", 3)
      .as[(String, Long)].collect().toMap
    assert(riskyA == Map("A" -> 2L, "B" -> 1L))
    val empty = sens.filter(lit(false))
    val de = Anonymity.diversityReport(empty, Seq("zip"), "diag", 2)
      .collect().head
    assert(!de.getAs[Boolean]("l_diverse") &&
      !de.getAs[Boolean]("entropy_l_diverse"))
    val ce = Anonymity.closenessReport(empty, Seq("zip"), "diag", 0.3)
      .collect().head
    assert(!ce.getAs[Boolean]("t_close"))
  }

  test("t-closeness counts null sensitive values as values (null-safe grid join)") {
    // global: flu 2/3, null 1/3. class A (1 flu, 1 null):
    //   TVD = ½(|½−2/3| + |½−1/3|) = 1/6; class B (1 flu):
    //   TVD = ½(|1−2/3| + |0−1/3|) = 1/3 — a non-null-safe join would
    //   read A's null cell as 0 and inflate A to ¼
    val withNull = Seq(("A", Some("flu")), ("A", None), ("B", Some("flu")))
      .toDF("zip", "diag")
    val r = Anonymity.closenessReport(withNull, Seq("zip"), "diag", 0.25)
      .collect().head
    assert(math.abs(r.getAs[Double]("max_tvd") -
      math.rint(1.0 / 3 * 1e6) / 1e6) < 1e-9)
    assert(r.getAs[Long]("groups_beyond_t") == 1L, "only B exceeds 0.25")
  }

  test("invalid l and t fail loudly") {
    intercept[IllegalArgumentException] {
      Anonymity.diversityReport(sens, Seq("zip"), "diag", 1)
    }
    intercept[IllegalArgumentException] {
      Anonymity.closenessReport(sens, Seq("zip"), "diag", 0.0)
    }
  }
}
