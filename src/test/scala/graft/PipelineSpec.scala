package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pagesDir = getClass.getResource("/orders_pages").getPath

  test("end-to-end: scan -> flatten -> dedup -> merge -> verify") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val p = new Pipeline(spark, wh)

    val counts = p.execute(pagesDir, forceFullLoad = true, runId = "run1")
    assert(counts("orders") == 4)        // 5 raw minus 1 cross-page dup
    // 4 deduped orders explode to 5 items; composite-key dedup drops order
    // 1003's duplicate (order 1002's NULL-key item bypasses dedup) -> 4
    assert(counts("line_items") == 4)
    assert(counts("customers") == 3)
    assert(counts("shipping_addresses") == 2)
    assert(counts("discount_codes") == 3)
    assert(counts("marketing_consent") == 3)

    // reference verification suite: uniqueness + FK orphans (A5-A8/J2)
    val v = p.verify()
    Schemas.uniqueKeys.keys.foreach { t =>
      val (total, distinct) = v(t)
      assert(total == distinct, s"$t keys not unique")
    }
    assert(v("line_items_orphans")._1 == 0)

    // control table recorded the run with the batch high-water mark (T2)
    val last = p.control.lastSyncWithBuffer("orders")
    assert(last.isDefined)
    assert(last.get.toString.startsWith("2024-03-03 09:00")) // max updated_at (10:00Z) minus 1h buffer

    // idempotence (T4): re-running the same batch changes nothing
    val counts2 = p.execute(pagesDir, forceFullLoad = true, runId = "run2")
    assert(counts2 == counts)

    // incremental run (T1/T3): checkpoint filters all already-seen rows
    val counts3 = p.execute(pagesDir, runId = "run3")
    assert(counts3("orders") == 4)
  }

  test("end-to-end in Dec money mode: exact DECIMAL tables, verification green") {
    import graft.functions.MoneyMode
    val wh = Files.createTempDirectory("graft_wh_dec").toString
    val p = new Pipeline(spark, wh, moneyMode = MoneyMode.Dec)

    val counts = p.execute(pagesDir, forceFullLoad = true, runId = "dec1")
    assert(counts("orders") == 4)
    assert(counts("line_items") == 4)

    // stored money columns are DECIMAL(18,2), values exact
    val o = p.readFinal("orders").get
    assert(o.schema("total_price").dataType.typeName == "decimal(18,2)")
    val dec = o.filter($"order_id" === "1002")
      .select($"total_price".cast("double")).as[Double].head()
    assert(dec == 10.0)

    // the reference verification suite passes identically in Dec mode
    val v = p.verify()
    Schemas.uniqueKeys.keys.foreach { t =>
      val (total, distinct) = v(t)
      assert(total == distinct, s"$t keys not unique in Dec mode")
    }
    assert(v("line_items_orphans")._1 == 0)

    // idempotence holds in Dec mode too
    assert(p.execute(pagesDir, forceFullLoad = true, runId = "dec2") == counts)
  }

  test("error path records an error control row and rethrows (T6)") {
    val wh = Files.createTempDirectory("graft_wh_err").toString
    val p = new Pipeline(spark, wh)
    intercept[Exception] { p.execute("/nonexistent_pages_dir", forceFullLoad = true) }
    val statuses = p.control.all().select("status").as[String].collect().toSeq
    assert(statuses.contains("error"))
  }

  test("driver entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
