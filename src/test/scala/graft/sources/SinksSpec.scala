package graft.sources

import java.nio.file.Files
import graft.{Schemas, SparkSpec}
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("chunked NDJSON sink bounds records per file (S6/U2)") {
    val dir = Files.createTempDirectory("graft_ndjson").toString
    val df = spark.range(250).select($"id", lit("x").as("v"))
    Sinks.writeNdjsonChunks(df.coalesce(1), dir, chunkSize = 100)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".json"))
    assert(files.length == 3, "250 rows / 100-chunk -> 3 files")
    val back = spark.read.json(dir)
    assert(back.count() == 250)
  }

  test("NDJSON -> staging load with tolerant schema (S7)") {
    val nd = Files.createTempDirectory("graft_nd").toString
    val staging = Files.createTempDirectory("graft_stage").toString + "/t"
    // extra field "unknown" must be dropped, not an error (ignore_unknown_values)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$nd/a.ndjson"),
      """{"id": 1, "created_at": "2024-01-01T00:00:00+00:00", "unknown": true}""" + "\n" +
      """{"id": 2, "created_at": "2024-01-02T00:00:00+00:00"}""" + "\n")
    val n = Sinks.loadNdjsonToStaging(spark, nd, Schemas.rawOrder, staging)
    assert(n == 2)
    val cols = spark.read.parquet(staging).columns.toSet
    assert(!cols.contains("unknown"))

    // records_processed semantics: a second load returns ITS batch count,
    // not the cumulative staging-table count (no O(table) re-scan per load)
    val nd2 = Files.createTempDirectory("graft_nd2").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$nd2/b.ndjson"),
      """{"id": 3, "created_at": "2024-01-03T00:00:00+00:00"}""" + "\n")
    val n2 = Sinks.loadNdjsonToStaging(spark, nd2, Schemas.rawOrder, staging)
    assert(n2 == 1, s"second load must report its own batch (got $n2)")
    assert(spark.read.parquet(staging).count() == 3, "staging accumulates both batches")
  }

  test("ensureTable creates empty typed table once; truncate empties it (S9/S10)") {
    val p = Files.createTempDirectory("graft_ddl").toString + "/orders"
    Sinks.ensureTable(spark, p, Schemas.orders)
    assert(spark.read.parquet(p).count() == 0)
    assert(spark.read.parquet(p).schema.fieldNames.toSeq == Schemas.orders.fieldNames.toSeq)
    Sinks.ensureTable(spark, p, Schemas.orders) // second call: no-op, no error
    Seq(("1", 1.0)).toDF("order_id", "total_price").write.mode("append")
      .option("mergeSchema", "false").format("parquet").save(p)
    Sinks.truncate(spark, p)
    assert(spark.read.parquet(p).count() == 0)
  }

  test("export to NDJSON round-trips (S11)") {
    val dir = Files.createTempDirectory("graft_export").toString + "/out"
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Sinks.exportJson(df, dir)
    assert(spark.read.json(dir).count() == 2)
  }
}
