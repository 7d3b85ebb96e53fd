package graft.streaming

import java.nio.file.Files
import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away"

  test("nearDupBatchFilter: history collisions drop, novelty survives, first id wins in-batch") {
    val bucketDir = Files.createTempDirectory("graft_buckets").toString + "/store"

    // batch 1: two unrelated docs -> both accepted, buckets claimed
    val b1 = Seq(
      (1L, s"$base home"),
      (2L, "completely different content about spark query engines and shuffles")
    ).toDF("doc_id", "text")
    val a1 = StreamingDedup.nearDupBatchFilter(spark, bucketDir, b1, "doc_id", "text")
    assert(a1.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))

    // batch 2: near-dup of doc 1 (history), a novel doc, and an in-batch
    // near-dup pair (5 vs 6 share text; smaller id wins)
    val b2 = Seq(
      (3L, s"$base house"), // near-dup of doc 1 -> dropped via bucket store
      (4L, "fresh unrelated totally novel words describing alpine weather patterns today"),
      (5L, "identical in batch pair of documents sharing every single token here now"),
      (6L, "identical in batch pair of documents sharing every single token here now")
    ).toDF("doc_id", "text")
    val a2 = StreamingDedup.nearDupBatchFilter(spark, bucketDir, b2, "doc_id", "text")
    assert(a2.select("doc_id").as[Long].collect().sorted.toSeq == Seq(4L, 5L))

    // batch 3: re-delivery of an accepted doc is dropped (idempotent ingest)
    val b3 = Seq((7L, s"$base home")).toDF("doc_id", "text")
    val a3 = StreamingDedup.nearDupBatchFilter(spark, bucketDir, b3, "doc_id", "text")
    assert(a3.isEmpty)

    // compaction dedups+rewrites the store; verdicts are unchanged
    val rowsBefore = spark.read.parquet(bucketDir).select("band", "bh").distinct().count()
    StreamingDedup.compactBuckets(spark, bucketDir, targetTasks = 1)
    assert(spark.read.parquet(bucketDir).count() == rowsBefore)
    val b4 = Seq((8L, s"$base home"), (9L, "never seen before text about volcanoes erupting"))
      .toDF("doc_id", "text")
    val a4 = StreamingDedup.nearDupBatchFilter(spark, bucketDir, b4, "doc_id", "text")
    assert(a4.select("doc_id").as[Long].collect().toSeq == Seq(9L),
      "post-compaction: history collision still drops, novelty still survives")
  }

  test("bucket store lookup scans only the batch's hash partitions") {
    val bucketDir = Files.createTempDirectory("graft_buckets_p").toString + "/store"
    // seed: enough distinct docs to claim buckets across many bhp partitions
    val seed = (1 to 60).map(i =>
      (i.toLong, s"seed document number $i with unique content token$i about topic$i"))
      .toDF("doc_id", "text")
    StreamingDedup.nearDupBatchFilter(spark, bucketDir, seed, "doc_id", "text")
    val allFiles = new java.io.File(bucketDir).listFiles()
      .filter(_.getName.startsWith("bhp="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath).toSet
    val partDirs = new java.io.File(bucketDir).listFiles()
      .count(_.getName.startsWith("bhp="))
    assert(partDirs > 8, s"seed must spread across partitions, got $partDirs dirs")

    // a one-doc batch touches at most 16 band hashes → ≤16 partitions
    val one = Seq((999L, "a single brand new probe document about volcano observatories"))
      .toDF("doc_id", "text")
    val parts = one
      .select(org.apache.spark.sql.functions.explode(
        Similarity.bandHashes(
          org.apache.spark.sql.functions.call_function("minhash_sig",
            graft.functions.Text.tokens($"text"),
            org.apache.spark.sql.functions.lit(3),
            org.apache.spark.sql.functions.lit(Similarity.MinhashPerms)))).as("bs"))
      .select(org.apache.spark.sql.functions.pmod($"bs.bh",
        org.apache.spark.sql.functions.lit(StreamingDedup.BucketStorePartitions))
        .cast("int").as("bhp"))
      .distinct().as[Int].collect().toSeq
    assert(parts.size <= 16)

    val pruned = StreamingDedup.prunedStore(spark, bucketDir, parts)
    assert(pruned.isDefined)
    val readFiles = pruned.get.inputFiles
      .map(f => new java.io.File(new java.net.URI(f)).getAbsolutePath).toSet
    assert(readFiles.subsetOf(allFiles))
    assert(readFiles.size < allFiles.size,
      s"pruned lookup must skip partitions: read ${readFiles.size} of ${allFiles.size}")
    readFiles.foreach { f =>
      val bhp = f.split("/").find(_.startsWith("bhp=")).get.stripPrefix("bhp=").toInt
      assert(parts.contains(bhp), s"file $f outside the batch's partitions")
    }
  }

  test("nearDupStream end-to-end over a file stream") {
    val root = Files.createTempDirectory("graft_sdd").toString
    val in = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(in))
    def page(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(s"$in/$name"),
        lines.mkString("\n").getBytes("UTF-8"))
    page("p0.ndjson", Seq(
      s"""{"doc_id": 1, "text": "$base home"}""",
      s"""{"doc_id": 2, "text": "novel second document with its own words entirely"}"""))
    page("p1.ndjson", Seq(
      s"""{"doc_id": 3, "text": "$base house"}""",
      s"""{"doc_id": 4, "text": "another genuinely new document about mountains and weather"}"""))

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)

    val q = StreamingDedup.nearDupStream(spark, stream, "doc_id", "text",
      s"$root/buckets", s"$root/out", s"$root/ckpt")
    q.awaitTermination()

    val out = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(1L, 2L, 4L), s"doc 3 (near-dup across micro-batches) must be dropped; got $out")
  }

  test("exactDedupStream drops exact re-arrivals within the watermark") {
    val root = Files.createTempDirectory("graft_sde").toString
    val in = s"$root/in"; Files.createDirectories(java.nio.file.Paths.get(in))
    Files.write(java.nio.file.Paths.get(s"$in/p0.ndjson"),
      Seq(
        s"""{"doc_id": 1, "text": "Same   Text here", "ts": "2024-01-01T10:00:00Z"}""",
        s"""{"doc_id": 2, "text": "same text HERE", "ts": "2024-01-01T10:05:00Z"}""",
        s"""{"doc_id": 3, "text": "entirely other content", "ts": "2024-01-01T10:06:00Z"}"""
      ).mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    val stream = spark.readStream.schema(schema).json(in)
    val deduped = StreamingDedup.exactDedupStream(stream, "text", "ts", "1 hour")
    val q = deduped.writeStream
      .format("parquet").option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$root/out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // normalize() lowercases and collapses whitespace -> docs 1 and 2 are
    // the same fingerprint; one of them survives plus doc 3
    assert(out.size == 2 && out.contains(3L), s"got $out")
  }
}
