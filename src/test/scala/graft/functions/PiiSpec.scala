package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def redacted(texts: String*): Seq[(String, String)] =
    texts.toDF("t")
      .select(col("t"), Pii.redact(col("t")).as("r"))
      .as[(String, String)].collect().toSeq

  test("detects and redacts emails and phones") {
    val out = redacted(
      "write to jane.doe+spam@mail.example.org today",
      "call 555-0199 or +1-415-555-0100",
      "no pii here at all")
    assert(out(0)._2 == "write to <EMAIL> today")
    assert(out(1)._2 == "call <PHONE> or <PHONE>")
    assert(out(2)._2 == out(2)._1)
  }

  test("counts match the redaction sites") {
    val df = Seq("a@b.co and c@d.org, call 555-0100").toDF("t")
      .select(Pii.emailCount(col("t")).as("ec"), Pii.phoneCount(col("t")).as("pc"),
        Pii.hasPii(col("t")).as("h"))
    assert(df.as[(Long, Long, Boolean)].head() == ((2L, 1L, true)))
  }

  test("redaction is idempotent over generated inputs") {
    // property: redact(redact(x)) == redact(x) — the replacement tags
    // contain no characters the patterns can re-match
    val gen = spark.range(0, 500).select(
      concat_ws(" ",
        lit("doc"), col("id").cast("string"),
        when(col("id") % 3 === 0, concat(lit("u"), col("id").cast("string"), lit("@ex.com"))).otherwise(lit("plain")),
        when(col("id") % 4 === 0, concat(lit("555-"), lpad(col("id").cast("string"), 4, "0"))).otherwise(lit("x")),
        when(col("id") % 5 === 0, lit("+1-202-555-0123")).otherwise(lit("y"))).as("t"))
    val once = gen.select(Pii.redact(col("t")).as("r"))
    val diff = once.select(col("r"), Pii.redact(col("r")).as("r2"))
      .filter(col("r") =!= col("r2")).count()
    assert(diff == 0L)
  }

  test("phone pattern false-positive envelope is pinned (recall-biased scrub)") {
    // The 3-3/4[-4] dash pattern deliberately over-matches numeric runs:
    // ISBN-ish and range-ish tokens DO redact. This is a decision, not an
    // accident — a corpus scrub prefers false positives to leaked numbers.
    val out = redacted("isbn 978-0306 pages 100-200 range 1-2")
    assert(out(0)._2 == "isbn <PHONE> pages <PHONE> range 1-2")
  }

  test("redaction order: emails first, phones never split an address") {
    // digit-run local parts would otherwise be bitten by the phone pass
    val out = redacted("mail 555-0199.bob@ex.com now")
    assert(out(0)._2 == "mail <EMAIL> now")
  }
}
