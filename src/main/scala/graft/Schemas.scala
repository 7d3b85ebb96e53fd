package graft

import org.apache.spark.sql.types._

/** Declared schemas for the pipeline, mirroring the reference's
  * FINAL_TABLE_SCHEMAS (ref shopify-etl/shopify_etl.py:33-86) and its raw
  * ingest shape (nested order documents, :339-426), plus the control table
  * (:237-267).
  *
  * Types follow SURVEY.md §1.2: BigQuery STRING→StringType,
  * TIMESTAMP→TimestampType, FLOAT→DoubleType, INTEGER→LongType,
  * BOOLEAN→BooleanType; REQUIRED→nullable=false.
  */
object Schemas {

  /** Raw Shopify order document (ingest, FIXTURES.md A.1). Schema-on-read
    * with tolerant ingest: undeclared JSON fields are simply not read
    * (Spark JSON reader drops them — matches ignore_unknown_values=True,
    * ref :134). */
  val rawOrder: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("created_at", StringType),
    StructField("updated_at", StringType),
    StructField("processed_at", StringType),
    StructField("subtotal_price", StringType),
    StructField("total_price", StringType),
    StructField("total_tax", StringType),
    StructField("financial_status", StringType),
    StructField("fulfillment_status", StringType),
    StructField("currency", StringType),
    StructField("source_name", StringType),
    StructField("customer", StructType(Seq(
      StructField("id", LongType),
      StructField("email", StringType),
      StructField("created_at", StringType),
      StructField("first_name", StringType),
      StructField("last_name", StringType),
      StructField("phone", StringType),
      StructField("verified_email", BooleanType),
      StructField("accepts_marketing", BooleanType)))),
    StructField("line_items", ArrayType(StructType(Seq(
      StructField("product_id", LongType),
      StructField("variant_id", LongType),
      StructField("name", StringType),
      StructField("price", StringType),
      StructField("quantity", LongType),
      StructField("vendor", StringType))))),
    StructField("shipping_address", StructType(Seq(
      StructField("first_name", StringType),
      StructField("last_name", StringType),
      StructField("address1", StringType),
      StructField("city", StringType),
      StructField("province", StringType),
      StructField("country", StringType),
      StructField("zip", StringType)))),
    StructField("discount_codes", ArrayType(StructType(Seq(
      StructField("code", StringType),
      StructField("amount", StringType)))))))

  /** Final flat table schemas (ref :33-86). */
  val orders: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = false),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("processed_at", TimestampType),
    StructField("subtotal_price", DoubleType),
    StructField("total_tax", DoubleType),
    StructField("total_price", DoubleType),
    StructField("financial_status", StringType),
    StructField("fulfillment_status", StringType),
    StructField("currency", StringType),
    StructField("source_name", StringType),
    StructField("customer_id", StringType)))

  val lineItems: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = false),
    StructField("product_id", StringType, nullable = false),
    StructField("variant_id", StringType, nullable = false),
    StructField("product_name", StringType),
    StructField("price", DoubleType),
    StructField("quantity", LongType),
    StructField("vendor", StringType)))

  val customers: StructType = StructType(Seq(
    StructField("customer_id", StringType, nullable = false),
    StructField("email", StringType),
    StructField("created_at", TimestampType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("phone", StringType),
    StructField("verified_email", BooleanType)))

  val shippingAddresses: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = false),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("address1", StringType),
    StructField("city", StringType),
    StructField("province", StringType),
    StructField("country", StringType),
    StructField("zip", StringType)))

  val discountCodes: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = false),
    StructField("code", StringType, nullable = false),
    StructField("amount", DoubleType)))

  val marketingConsent: StructType = StructType(Seq(
    StructField("customer_id", StringType, nullable = false),
    StructField("email_consent", StringType),
    StructField("sms_consent", StringType)))

  /** Control/checkpoint table (ref :237-267). */
  val syncControl: StructType = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("last_sync_timestamp", TimestampType, nullable = false),
    StructField("records_processed", LongType),
    StructField("status", StringType),
    StructField("run_id", StringType),
    StructField("notes", StringType),
    StructField("created_at", TimestampType)))

  /** MERGE keys per table (ref UNIQUE_KEYS shopify_etl.py:88-95). */
  val uniqueKeys: Map[String, Seq[String]] = Map(
    "orders"             -> Seq("order_id"),
    "line_items"         -> Seq("order_id", "product_id", "variant_id"),
    "customers"          -> Seq("customer_id"),
    "shipping_addresses" -> Seq("order_id"),
    "discount_codes"     -> Seq("order_id", "code"),
    "marketing_consent"  -> Seq("customer_id"))
}
