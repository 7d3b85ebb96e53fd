package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.MoneyMode

/** Normalization of raw nested order documents into the six flat tables —
  * the reference's central data-model move (ref shopify-etl/shopify_etl.py
  * :350-426, return tuple :454-461), as pure narrow transformations: every
  * output is select/explode/coalesce/when over the ingest DataFrame, so
  * Catalyst prunes the nested struct fields each table actually reads and
  * nothing shuffles.
  *
  * Null-handling matrix (SURVEY §2.7 F6/F9), decided per the survey:
  *  - money strings → DoubleType via cast (ref float() :356-358)
  *  - missing status/source fields → "" (ref .get(k, "") :359-362)
  *  - missing customer → NULL customer_id (ref :363)
  *  - missing product_id/variant_id → NULL, not the reference's accidental
  *    "None" string (ref :371-372) — documented deviation; flip
  *    [[noneStringParity]] for bit-parity with the bug.
  */
object Flatten {

  /** Reference-bug parity switch: str(None) → "None" for missing
    * line-item product/variant ids (shopify_etl.py:371-372). */
  val noneStringParity = false

  private def idStr(c: org.apache.spark.sql.Column) =
    if (noneStringParity) coalesce(c.cast("string"), lit("None")) else c.cast("string")

  /** Money column policy: cast + null default in the chosen mode (Dbl keeps
    * reference float parity; Dec gives exact DECIMAL(18,2) end-to-end). */
  private def money(c: org.apache.spark.sql.Column, mode: MoneyMode) =
    coalesce(mode.cast(c), mode.cast(lit(0)))

  /** P1: orders projection (ref :350-364). */
  def orders(raw: DataFrame, mode: MoneyMode = MoneyMode.Dbl): DataFrame =
    raw.select(
      col("id").cast("string").as("order_id"),
      to_timestamp(col("created_at")).as("created_at"),
      to_timestamp(col("updated_at")).as("updated_at"),
      to_timestamp(col("processed_at")).as("processed_at"),
      money(col("subtotal_price"), mode).as("subtotal_price"),
      money(col("total_tax"), mode).as("total_tax"),
      money(col("total_price"), mode).as("total_price"),
      coalesce(col("financial_status"), lit("")).as("financial_status"),
      coalesce(col("fulfillment_status"), lit("")).as("fulfillment_status"),
      coalesce(col("currency"), lit("")).as("currency"),
      coalesce(col("source_name"), lit("")).as("source_name"),
      col("customer.id").cast("string").as("customer_id"))

  /** Line items with their 0-based position in the order's array as
    * `__pos` — the deterministic within-order arrival ordinal (the
    * reference keeps list order, shopify_etl.py:368-377), which is what
    * [[Dedup.compositeKeyDedup]] needs as its order column: the exploded
    * rows of one order all share the parent's arrival order, so without
    * the ordinal a first-wins tie-break among duplicate composite keys
    * would be nondeterministic. */
  def lineItemsOrdered(raw: DataFrame, mode: MoneyMode = MoneyMode.Dbl): DataFrame =
    raw.select(col("id").cast("string").as("order_id"),
        posexplode(col("line_items")).as(Seq("__pos", "li")))
      .select(
        col("order_id"),
        col("__pos"),
        idStr(col("li.product_id")).as("product_id"),
        idStr(col("li.variant_id")).as("variant_id"),
        coalesce(col("li.name"), lit("")).as("product_name"),
        money(col("li.price"), mode).as("price"),
        coalesce(col("li.quantity"), lit(0L)).as("quantity"),
        coalesce(col("li.vendor"), lit("")).as("vendor"))

  /** Line items: explode nested array (ref :368-377). */
  def lineItems(raw: DataFrame, mode: MoneyMode = MoneyMode.Dbl): DataFrame =
    lineItemsOrdered(raw, mode).drop("__pos")

  /** P2: customers projection, presence-guarded (ref :380-390). */
  def customers(raw: DataFrame): DataFrame =
    raw.filter(col("customer").isNotNull && col("customer.id").isNotNull)
      .select(
        col("customer.id").cast("string").as("customer_id"),
        coalesce(col("customer.email"), lit("")).as("email"),
        to_timestamp(col("customer.created_at")).as("created_at"),
        coalesce(col("customer.first_name"), lit("")).as("first_name"),
        coalesce(col("customer.last_name"), lit("")).as("last_name"),
        coalesce(col("customer.phone"), lit("")).as("phone"),
        coalesce(col("customer.verified_email"), lit(false)).as("verified_email"))

  /** P3: shipping addresses, presence-guarded (ref :393-404). */
  def shippingAddresses(raw: DataFrame): DataFrame =
    raw.filter(col("shipping_address").isNotNull)
      .select(
        col("id").cast("string").as("order_id"),
        coalesce(col("shipping_address.first_name"), lit("")).as("first_name"),
        coalesce(col("shipping_address.last_name"), lit("")).as("last_name"),
        coalesce(col("shipping_address.address1"), lit("")).as("address1"),
        coalesce(col("shipping_address.city"), lit("")).as("city"),
        coalesce(col("shipping_address.province"), lit("")).as("province"),
        coalesce(col("shipping_address.country"), lit("")).as("country"),
        coalesce(col("shipping_address.zip"), lit("")).as("zip"))

  /** Discount codes: explode nested array (ref :407-413). */
  def discountCodes(raw: DataFrame, mode: MoneyMode = MoneyMode.Dbl): DataFrame =
    raw.select(col("id").cast("string").as("order_id"),
        explode(col("discount_codes")).as("dc"))
      .select(
        col("order_id"),
        coalesce(col("dc.code"), lit("")).as("code"),
        money(col("dc.amount"), mode).as("amount"))

  /** P4: marketing consent — boolean → categorical (ref :417-426). */
  def marketingConsent(raw: DataFrame): DataFrame =
    raw.filter(col("customer").isNotNull && col("customer.id").isNotNull)
      .select(
        col("customer.id").cast("string").as("customer_id"),
        when(col("customer.accepts_marketing"), lit("yes")).otherwise(lit("no"))
          .as("email_consent"),
        lit("").as("sms_consent"))

  /** All six tables keyed by reference table name (ref return :454-461). */
  def all(raw: DataFrame, mode: MoneyMode = MoneyMode.Dbl): Map[String, DataFrame] = Map(
    "orders"             -> orders(raw, mode),
    "line_items"         -> lineItems(raw, mode),
    "customers"          -> customers(raw),
    "shipping_addresses" -> shippingAddresses(raw),
    "discount_codes"     -> discountCodes(raw, mode),
    "marketing_consent"  -> marketingConsent(raw))
}
