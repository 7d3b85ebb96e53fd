package graft.functions

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

class MoneySpec extends SparkSpec {
  import spark.implicits._

  // 3001 * 0.07 is not representable in binary floating point; a double
  // sum drifts in the low bits while DECIMAL(18,2) accumulation is exact.
  private def li = (1 to 3001)
    .map(_ => ("A", "F", 1.0, 0.07, 0.0))
    .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount")

  // Dec mode aggregates exact fixed-point internally but crosses the query
  // boundary as scale-pinned STRING (the canonical hash-stable cross-engine
  // form — see SparkEntry.pricingSummary doc).
  test("decimal mode aggregates money exactly; double mode drifts") {
    val dec = SparkEntry.pricingSummary(li, MoneyMode.Dec)
    assert(dec.schema("sum_base_price").dataType == StringType)
    val exact = dec.select($"sum_base_price").as[String].head()
    assert(exact == "210.07",
      s"decimal sum must be exact and scale-pinned, got $exact")

    val rawDouble = li.agg(sum($"l_extendedprice")).as[Double].head()
    assert(rawDouble != 210.07,
      "double accumulation of 3001 x 0.07 drifts — the reason Dbl mode rounds and Dec exists")
  }

  test("both modes agree after Dbl-mode rounding on drift-free data") {
    val dbl = SparkEntry.pricingSummary(li, MoneyMode.Dbl)
      .select($"sum_qty").as[Double].head()
    val dec = SparkEntry.pricingSummary(li, MoneyMode.Dec)
      .select($"sum_qty").as[String].head()
    assert(BigDecimal(dbl) == BigDecimal(dec))
  }
}
