package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data preparation — the scrub
  * pass a corpus takes before any text reaches a training shard.
  *
  * Pure `Column` expressions (codegen'd regexp ops, zero UDFs): at 100 TB
  * the scrub runs inside the scan projection of every document, so it must
  * stay in whole-stage codegen and never materialize intermediate rows.
  * Patterns are restricted to syntax with identical semantics in Java
  * regex (Spark) and RE2 (the DuckDB oracle): character classes,
  * bounded/unbounded repetition — no backreferences, no lookaround.
  */
object Pii {

  /** Email addresses (conservative, lowercase corpora). */
  val emailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** North-American-style phone numbers: optional +1- prefix then
    * 3-3-4 groups, or bare 3-4 exchange-line pairs (555-0199). */
  val phonePattern = "(\\+?1-)?[0-9]{3}-[0-9]{3,4}(-[0-9]{4})?"

  def emailCount(c: Column): Column = regexp_count(c, lit(emailPattern))
  def phoneCount(c: Column): Column = regexp_count(c, lit(phonePattern))

  /** Redact in two passes, emails first — the email pattern can contain
    * digit runs a phone pass would otherwise split mid-address. Replacement
    * tags are angle-bracketed so a second redaction pass is a no-op
    * (idempotence is property-tested in PiiSpec). */
  def redact(c: Column): Column =
    regexp_replace(regexp_replace(c, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** True when the text carries any detectable PII. */
  def hasPii(c: Column): Column = emailCount(c) + phoneCount(c) > 0
}
