package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Money-type policy. The reference engine stores money as FLOAT columns
  * (reference shopify_etl.py:39-41) and aggregates in binary floating
  * point; graft keeps DOUBLE as the oracle-parity default and offers exact
  * DECIMAL(18,2) as an opt-in mode — at 100 TB aggregation widths binary
  * floats accumulate cent-level error, fixed-point does not.
  *
  * The two modes deliberately differ in OUTPUT policy, not just input
  * casts: Dbl rounds aggregate results (floating sums are
  * order-dependent in the last bits; rounding makes them comparable),
  * while Dec never rounds — decimal sums are exact, and results surface
  * at the widened precision Spark's decimal arithmetic derives. Dec
  * avoids cross-engine division (avg) entirely: decimal division scale
  * and rounding rules are engine-specific, which would put an
  * engine-dependent rounding step back into an "exact" mode. */
sealed trait MoneyMode { def cast(c: Column): Column }
object MoneyMode {
  /** Reference-parity binary floating point. */
  case object Dbl extends MoneyMode {
    override def cast(c: Column): Column = c.cast("double")
  }
  /** Exact fixed-point money: DECIMAL(18,2) inputs, exact aggregation. */
  case object Dec extends MoneyMode {
    override def cast(c: Column): Column = c.cast(DecimalType(18, 2))
  }
}
