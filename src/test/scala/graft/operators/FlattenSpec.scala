package graft.operators

import graft.{Schemas, SparkSpec}
import graft.sources.PagedNdjsonSource
import org.apache.spark.sql.functions._

class FlattenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pagesDir =
    getClass.getResource("/orders_pages").getPath
  private lazy val raw =
    PagedNdjsonSource.read(spark, pagesDir, Schemas.rawOrder)

  test("paged source reads all pages with arrival order following page order") {
    assert(raw.count() == 5)
    val firstOfDup = raw.filter($"id" === 1001L)
      .orderBy($"_arrival_order")
      .select("financial_status").as[String].head()
    assert(firstOfDup == "paid", "page_00's copy must arrive before page_01's")
  }

  test("first-wins dedup across pages keeps the page_00 copy (ref :339-347)") {
    val deduped = Dedup.firstWins(raw, Seq("id"), "_arrival_order")
    assert(deduped.count() == 4)
    val o = Flatten.orders(deduped).filter($"order_id" === "1001")
    assert(o.select("financial_status").as[String].head() == "paid")
  }

  test("orders projection: casts, defaults, NULL customer_id (P1)") {
    val o = Flatten.orders(raw.filter($"id" === 1002L))
    val row = o.head()
    assert(row.getAs[String]("order_id") == "1002")
    assert(row.getAs[Double]("total_price") == 10.0)
    assert(row.getAs[String]("financial_status") == "") // missing -> "" (ref :359)
    assert(row.getAs[String]("source_name") == "")
    assert(row.getAs[String]("customer_id") == null)    // missing customer -> NULL (ref :363)
  }

  test("line items explode; missing product/variant ids are NULL (deviation from str(None) quirk)") {
    val li = Flatten.lineItems(raw)
    assert(li.count() == 6)
    val mystery = li.filter($"order_id" === "1002").head()
    assert(mystery.getAs[String]("product_id") == null)
    assert(mystery.getAs[String]("variant_id") == null)
  }

  test("customers presence-guarded; marketing consent boolean->categorical (P2/P4)") {
    val c = Flatten.customers(raw)
    assert(c.filter($"customer_id" === "").count() == 0)
    assert(!c.select("customer_id").as[String].collect().contains("1002"))
    val mc = Flatten.marketingConsent(raw.filter($"id" === 1003L))
    assert(mc.select("email_consent").as[String].head() == "yes")
    val mc2 = Flatten.marketingConsent(raw.filter($"id" === 1001L))
    assert(mc2.select("email_consent").as[String].head() == "no")
  }

  test("shipping addresses and discount codes presence-guarded explodes (P3)") {
    assert(Flatten.shippingAddresses(raw).count() == 2)
    val dc = Flatten.discountCodes(raw)
    assert(dc.count() == 3)
    assert(dc.filter($"order_id" === "1004").count() == 2)
  }

  test("Dec money mode: money columns are exact DECIMAL(18,2) across all tables") {
    import graft.functions.MoneyMode
    val all = Flatten.all(raw, MoneyMode.Dec)
    val moneyCols = Map(
      "orders" -> Seq("subtotal_price", "total_tax", "total_price"),
      "line_items" -> Seq("price"),
      "discount_codes" -> Seq("amount"))
    for ((table, cols) <- moneyCols; c <- cols)
      assert(all(table).schema(c).dataType.typeName == "decimal(18,2)",
        s"$table.$c should be decimal(18,2)")
    // values survive the decimal cast exactly (fixture prices are 2-dp)
    val dbl = Flatten.orders(raw).filter($"order_id" === "1002")
      .select($"total_price").as[Double].head()
    val dec = all("orders").filter($"order_id" === "1002")
      .select($"total_price".cast("double")).as[Double].head()
    assert(dbl == dec)
    // non-money columns are unaffected by the mode
    assert(all("orders").schema("updated_at").dataType.typeName == "timestamp")
    assert(all("customers").schema.fieldNames.toSeq == Schemas.customers.fieldNames.toSeq)
  }

  test("flattened outputs conform to declared schemas") {
    val all = Flatten.all(raw)
    assert(all("orders").schema.fieldNames.toSeq == Schemas.orders.fieldNames.toSeq)
    assert(all("line_items").schema.fieldNames.toSeq == Schemas.lineItems.fieldNames.toSeq)
    assert(all("customers").schema.fieldNames.toSeq == Schemas.customers.fieldNames.toSeq)
    assert(all("orders").schema("total_price").dataType.typeName == "double")
    assert(all("orders").schema("updated_at").dataType.typeName == "timestamp")
  }

  test("dead-letter routing quarantines malformed records, keeps the rest typed") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dlq")
    java.nio.file.Files.write(dir.resolve("page_00.ndjson"),
      ("""{"id": 1, "name": "ok-one", "updated_at": "2024-01-01T00:00:00Z"}""" + "\n" +
       """{"id": "not-a-number", "name": "bad-type"}""" + "\n" +
       """this is not json at all""" + "\n" +
       "   " + "\n" +
       """{"id": 2, "name": "ok-two", "updated_at": "2024-01-02T00:00:00Z"}""" + "\n")
        .getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("updated_at", org.apache.spark.sql.types.StringType)))
    val (good, dead) = graft.sources.PagedNdjsonSource
      .readWithDeadLetter(spark, dir.toString, schema)
    assert(good.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val raws = dead.select("raw").as[String].collect().toSeq
    assert(raws.size == 3, s"expected 3 dead rows (incl. the blank line), got $raws")
    assert(raws.exists(_.contains("not-a-number")) && raws.exists(_.contains("not json")))
    assert(dead.columns.toSeq == Seq("raw", "_page_file", "reason"))
    // the good side keeps the paged-scan contract (arrival order present)
    assert(good.columns.contains("_arrival_order"))
  }
}
