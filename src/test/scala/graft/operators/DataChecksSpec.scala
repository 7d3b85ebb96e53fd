package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import DataChecks._

class DataChecksSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, Some("a@x.com"), 10.0, "A"),
    (2L, Some("b@y.org"), 20.0, "B"),
    (2L, None,            99.0, "A"), // dup id, null email, out-of-range
    (4L, Some("not-an-email"), 30.0, "C"))

  private def df0 = rows.toDF("id", "email", "amount", "grade")

  test("report: every check type, planted violations, exact metrics") {
    val ref = Seq(1L, 2L, 3L).toDF("rid")
    val got = DataChecks.report(df0, Seq(
      Completeness("email", 0.9),               // 3/4 = 0.75 -> fail
      Uniqueness(Seq("id")),                    // 3/4 distinct -> fail
      InRange("amount", 0.0, 50.0),             // 1 violation -> fail
      MatchesPattern("email", "^[a-z]+@[a-z]+\\.[a-z]+$", 0.5), // 2/3 -> pass
      RowCountBetween(2L, 10L),                 // 4 -> pass
      ForeignKey("id", ref, "rid")))            // id 4 orphan -> fail
      .as[(String, String, Double, Boolean)].collect().toSeq
    assert(got === Seq(
      ("completeness", "email", 0.75, false),
      ("foreign_key", "id", 1.0, false),
      ("in_range", "amount", 1.0, false),
      ("pattern", "email", 0.666667, true),
      ("row_count", "*", 4.0, true),
      ("uniqueness", "id", 0.75, false)))
  }

  test("report: nulls are completeness's problem, not in_range's or the FK's") {
    val d = Seq((Some(5.0), Option.empty[Long]), (None, Some(9L)))
      .toDF("v", "k")
    val ref = Seq(1L).toDF("rid")
    val got = DataChecks.report(d, Seq(
        InRange("v", 0.0, 10.0), ForeignKey("k", ref, "rid")))
      .as[(String, String, Double, Boolean)].collect().toSeq
    // null v is not a range violation; null k is not an orphan (but 9 is)
    assert(got === Seq(("foreign_key", "k", 1.0, false),
      ("in_range", "v", 0.0, true)))
  }

  test("report: all scan checks compile to ONE scan of the table") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val rpt = DataChecks.report(li, Seq(
      Completeness("l_returnflag", 0.99),
      Uniqueness(Seq("l_orderkey", "l_linenumber")),
      InRange("l_discount", 0.0, 0.1),
      MatchesPattern("l_returnflag", "^[ARN]$", 1.0),
      RowCountBetween(1L, Long.MaxValue)))
    // count scan nodes in the string form (the AQE wrapper hides child
    // nodes from collect() before execution — same approach as
    // BucketingSpec/QuotaSampleSpec)
    val plan = rpt.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"scan-expressible checks must share one table scan:\n$plan")
    assert(rpt.count() === 5)
  }

  test("reportApprox: estimated uniqueness within rsd; duplicates still fail") {
    val unique = (1L to 2000L).map(i => Tuple1(i)).toDF("id")
    val rptU = DataChecks.reportApprox(unique, Seq(Uniqueness(Seq("id"))), rsd = 0.05)
      .as[(String, String, Double, Boolean)].collect().head
    assert(rptU._4, s"unique ids must pass approx uniqueness, got $rptU")
    assert(math.abs(rptU._3 - 1.0) <= 0.05)
    val dupd = ((1L to 1000L) ++ (1L to 1000L)).map(i => Tuple1(i)).toDF("id")
    val rptD = DataChecks.reportApprox(dupd, Seq(Uniqueness(Seq("id"))), rsd = 0.05)
      .as[(String, String, Double, Boolean)].collect().head
    assert(!rptD._4, s"50% duplicate ids must fail, got $rptD")
  }

  test("report: empty check list is a loud error") {
    intercept[IllegalArgumentException] {
      DataChecks.report(df0, Seq.empty)
    }
  }

  test("unmeasurable ratios FAIL instead of NaN-passing") {
    // all-null pattern column: 0 conforming / 0 non-null was NaN, and
    // NaN >= threshold is TRUE under Spark's NaN-is-largest ordering —
    // the gate must fail, with a null metric, not silently pass
    val allNull = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("id", "email")
    val r = DataChecks.report(allNull,
      Seq(MatchesPattern("email", "^[a-z]+@.*$", 0.9))).collect().head
    assert(r.isNullAt(r.fieldIndex("metric")))
    assert(!r.getAs[Boolean]("passed"))
    // empty table: completeness/uniqueness denominators are 0
    val empty = df0.filter(lit(false))
    val rows = DataChecks.report(empty, Seq(
      Completeness("email", 0.5), Uniqueness(Seq("id")))).collect()
    assert(rows.forall(x => !x.getAs[Boolean]("passed")), rows.toSeq.toString)
    val ra = DataChecks.reportApprox(empty, Seq(Uniqueness(Seq("id"))))
      .collect().head
    assert(!ra.getAs[Boolean]("passed"))
  }
}
