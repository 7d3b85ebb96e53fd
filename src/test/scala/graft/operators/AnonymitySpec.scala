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
}
