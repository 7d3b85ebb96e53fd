package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the "unit tests for data"
  * layer every production pipeline runs before publishing a batch
  * (pattern: Deequ, Schelter et al. VLDB'18 "Automating Large-Scale Data
  * Quality Verification"). A caller declares WHAT must hold; the engine
  * compiles every scan-expressible constraint into ONE aggregate over ONE
  * pass of the table and returns a small report frame
  * (check, target, metric, passed) — so a 100 TB table pays a single
  * column-pruned scan for its whole constraint battery, not a scan per
  * check. Referential-integrity checks are the documented exception: each
  * adds one left-anti join against its reference table (Catalyst picks
  * broadcast when the ref side is small).
  *
  * Metric semantics (all exact, integer-derived — the report is
  * oracle-replayable bit-for-bit):
  *  - completeness: non-null ratio, passes at ≥ minRatio
  *  - uniqueness:   distinct ratio over the key columns, passes at 1.0
  *  - in_range:     VIOLATION COUNT outside [lo, hi] (nulls don't count —
  *                  completeness owns nulls), passes at 0
  *  - pattern:      match ratio among non-null values, passes at ≥ minRatio
  *  - row_count:    total rows, passes inside [lo, hi]
  *  - foreign_key:  orphan count (rows whose key misses ref), passes at 0
  *
  * Exact uniqueness plans a two-phase distinct aggregate; at extreme key
  * cardinality callers can set `approxDistinct = true` to swap in
  * HLL-based `approx_count_distinct` (±5% default error — the report's
  * uniqueness rows then carry an estimate and are spec-gated, not
  * oracle-gated; see [[SketchRollup]] for the sketch semantics). */
object DataChecks {

  sealed trait Check
  /** Fraction of non-null values in `column` must be ≥ `minRatio`. */
  case class Completeness(column: String, minRatio: Double) extends Check
  /** `columns` must be (jointly) unique across the table. */
  case class Uniqueness(columns: Seq[String]) extends Check
  /** Non-null values of `column` must lie in [lo, hi]. */
  case class InRange(column: String, lo: Double, hi: Double) extends Check
  /** Fraction of non-null values matching `regex` must be ≥ `minRatio`.
    * Keep patterns in the portable subset (character classes, anchors,
    * quantifiers) — they run under Java regex here and whatever engine
    * replays the report elsewhere. */
  case class MatchesPattern(column: String, regex: String, minRatio: Double) extends Check
  /** Table row count must lie in [lo, hi]. */
  case class RowCountBetween(lo: Long, hi: Long) extends Check
  /** Every non-null `column` value must exist in `ref.refColumn`. */
  case class ForeignKey(column: String, ref: DataFrame, refColumn: String) extends Check

  private val ReportCols = Seq("chk", "target", "metric", "passed")

  /** Evaluate `checks` against `df`; returns (chk, target, metric·6dp,
    * passed), one row per check, ordered by (chk, target). */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "DataChecks.report: empty check list")
    val scanChecks = checks.filter(!_.isInstanceOf[ForeignKey])
    val fkChecks = checks.collect { case f: ForeignKey => f }

    val scanReport: Option[DataFrame] = if (scanChecks.isEmpty) None else {
      val total = count(lit(1))
      // one aggregate expression per check, all inside a single agg()
      // ratio denominators are guarded: an empty table (or an all-null
      // pattern column) yields metric NULL — never 0.0/0.0 = NaN, which
      // Spark orders ABOVE every number and would make `metric >= r`
      // silently pass a column with zero conforming values
      val metricExprs: Seq[Column] = scanChecks.zipWithIndex.map {
        case (Completeness(c, _), i) =>
          when(total > 0, count(col(c)).cast("double") / total.cast("double"))
            .as(s"_m$i")
        case (Uniqueness(cols), i) =>
          when(total > 0, count_distinct(struct(cols.map(col): _*))
            .cast("double") / total.cast("double")).as(s"_m$i")
        case (InRange(c, lo, hi), i) =>
          count(when(col(c) < lo || col(c) > hi, 1)).cast("double").as(s"_m$i")
        case (MatchesPattern(c, re, _), i) =>
          when(count(col(c)) > 0,
            count(when(regexp_like(col(c), lit(re)), 1)).cast("double") /
              count(col(c)).cast("double")).as(s"_m$i")
        case (RowCountBetween(_, _), i) =>
          total.cast("double").as(s"_m$i")
        case (f, _) => throw new IllegalArgumentException(s"unexpected $f")
      }
      val aggd = df.agg(metricExprs.head, metricExprs.tail: _*)
      val rows = scanChecks.zipWithIndex.map { case (c, i) =>
        val m = col(s"_m$i")
        val (name, target, passed) = c match {
          case Completeness(c0, r)      => ("completeness", c0, m >= lit(r))
          case Uniqueness(cols)         => ("uniqueness", cols.mkString(","), m === lit(1.0))
          case InRange(c0, _, _)        => ("in_range", c0, m === lit(0.0))
          case MatchesPattern(c0, _, r) => ("pattern", c0, m >= lit(r))
          case RowCountBetween(lo, hi)  => ("row_count", "*",
            m >= lit(lo.toDouble) && m <= lit(hi.toDouble))
          case f => throw new IllegalArgumentException(s"unexpected $f")
        }
        // a NULL metric (guarded denominator above) FAILS the check —
        // "couldn't measure" must never read as "passed"
        struct(lit(name).as("chk"), lit(target).as("target"),
          round(m, 6).as("metric"), coalesce(passed, lit(false)).as("passed"))
      }
      Some(aggd.select(explode(array(rows: _*)).as("_r")).select(col("_r.*")))
    }

    val fkReports: Seq[DataFrame] = fkChecks.map {
      case ForeignKey(c, ref, refC) =>
        df.select(col(c)).filter(col(c).isNotNull)
          .join(ref.select(col(refC).as(c)), Seq(c), "left_anti")
          .agg(count(lit(1)).cast("double").as("_orphans"))
          .select(lit("foreign_key").as("chk"), lit(c).as("target"),
            round(col("_orphans"), 6).as("metric"),
            (col("_orphans") === lit(0.0)).as("passed"))
    }

    (scanReport.toSeq ++ fkReports)
      .reduce(_.unionByName(_))
      .select(ReportCols.map(col): _*)
      .orderBy(col("chk"), col("target"))
  }

  /** [[report]] with uniqueness evaluated via `approx_count_distinct`
    * (HLL, `rsd` relative error) — the 100 TB shape when exact distinct
    * over a high-cardinality key is the dominant cost. Uniqueness rows
    * then PASS when the estimated ratio is within `rsd` of 1.0 (an
    * estimate cannot assert exact uniqueness; pair with a keyed sample
    * check if exactness is required). */
  def reportApprox(df: DataFrame, checks: Seq[Check], rsd: Double = 0.05): DataFrame = {
    val (uniq, rest) = checks.partition(_.isInstanceOf[Uniqueness])
    val base = if (rest.nonEmpty) Some(report(df, rest)) else None
    val uniqReports = uniq.collect { case Uniqueness(cols) =>
      df.agg(when(count(lit(1)) > 0,
          approx_count_distinct(struct(cols.map(col): _*), rsd).cast("double") /
            count(lit(1)).cast("double")).as("_m"))
        .select(lit("uniqueness").as("chk"),
          lit(cols.mkString(",")).as("target"),
          round(col("_m"), 6).as("metric"),
          coalesce(col("_m") >= lit(1.0 - rsd), lit(false)).as("passed"))
    }
    (base.toSeq ++ uniqReports)
      .reduce(_.unionByName(_))
      .select(ReportCols.map(col): _*)
      .orderBy(col("chk"), col("target"))
  }
}
