package graft.operators

import java.io.File
import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Row-level and partition-pruned DELETE on the store — the update path
  * the index family's "delete the ids first" recovery recipe needs
  * (VERDICT r9 item 1). Deletes must be (a) pruned — a delete touching a
  * few keys leaves unmatched files / partition dirs byte-identical, (b)
  * null-safe on keys, (c) idempotent — re-running a delete of absent keys
  * is a 0-row no-op, which is also what makes a crashed delete converge
  * by re-running. */
class StoreDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot(dir: String): Map[String, (Long, Int)] = {
    val d = new File(dir)
    if (!d.exists()) Map.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(),
        java.util.Arrays.hashCode(Files.readAllBytes(f.toPath)))).toMap
  }

  test("row-level delete removes matched keys and leaves unmatched files byte-identical") {
    val wh = Files.createTempDirectory("graft_del").toString
    val store = new ParquetTableStore(spark, wh)
    val seed = (1L to 100L).map(k => (k, s"v$k", k.toDouble))
      .toDF("id", "status", "total")
    store.upsert("t", seed, Seq("id"))
    store.compact("t", targetFiles = 4)
    val before = snapshot(store.path("t"))
    assert(before.size >= 2)

    val removed = store.delete("t", Seq(7L, 8L).toDF("id"), Seq("id"))
    assert(removed == 2L)
    val left = store.read("t").get
    assert(left.count() == 98)
    assert(left.filter(col("id").isin(7L, 8L)).isEmpty)

    val after = snapshot(store.path("t"))
    val untouched = before.keySet intersect after.keySet
    assert(untouched.nonEmpty, "group pruning must keep unmatched files")
    untouched.foreach(f => assert(before(f) == after(f),
      s"file $f rewritten but contains no matched key"))

    // absent keys: no-op, returns 0 (crashed-delete convergence)
    assert(store.delete("t", Seq(7L, 8L).toDF("id"), Seq("id")) == 0L)
    assert(store.read("t").get.count() == 98)
  }

  test("delete is null-safe on keys") {
    val wh = Files.createTempDirectory("graft_deln").toString
    val store = new ParquetTableStore(spark, wh)
    val seed = Seq((Some(1L), "a"), (None, "b"), (Some(3L), "c"))
      .toDF("id", "v")
    store.replace("t", seed)
    val removed = store.delete("t", Seq(Option.empty[Long]).toDF("id"), Seq("id"))
    assert(removed == 1L)
    val left = store.read("t").get.select("v").as[String].collect().sorted
    assert(left.toSeq == Seq("a", "c"))
  }

  test("fallback delete handles schemas the v2 codec cannot carry (arrays)") {
    val wh = Files.createTempDirectory("graft_dela").toString
    val store = new ParquetTableStore(spark, wh)
    val seed = Seq((1L, Seq(1, 2)), (2L, Seq(3)), (3L, Seq.empty[Int]))
      .toDF("id", "xs")
    store.replace("t", seed)
    assert(store.delete("t", Seq(2L).toDF("id"), Seq("id")) == 1L)
    assert(store.read("t").get.select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 3L))
  }

  test("deletePartitioned rewrites only touched partitions and drops emptied ones") {
    val wh = Files.createTempDirectory("graft_delp").toString
    val store = new ParquetTableStore(spark, wh)
    // seg 0: ids 1-10, seg 1: ids 11-20, seg 2: ids 21-22
    val rows = ((1L to 10L).map((_, 0L)) ++ (11L to 20L).map((_, 1L)) ++
      Seq((21L, 2L), (22L, 2L))).toDF("id", "seg")
    store.replacePartitioned("t", rows, Seq("seg"))
    def segDir(s: Long) = s"${store.path("t")}/seg=$s"
    val seg0Before = snapshot(segDir(0))
    val seg1Before = snapshot(segDir(1))

    // delete two ids of seg 1 and ALL of seg 2
    val removed = store.deletePartitioned("t",
      Seq(11L, 12L, 21L, 22L).toDF("id"), Seq("id"), "seg")
    assert(removed == 4L)
    val left = store.read("t").get
    assert(left.count() == 18)
    assert(left.filter(col("seg") === 2).isEmpty)
    assert(!new File(segDir(2)).exists(), "fully-emptied partition dir must be dropped")
    // untouched partition byte-identical; touched one rewritten
    assert(snapshot(segDir(0)) == seg0Before, "untouched partition was rewritten")
    assert(snapshot(segDir(1)) != seg1Before, "touched partition must be rewritten")

    // absent keys: 0-row no-op (re-run convergence)
    assert(store.deletePartitioned("t",
      Seq(11L, 21L).toDF("id"), Seq("id"), "seg") == 0L)
    assert(store.read("t").get.count() == 18)
  }

  test("deletePartitioned is faithful to string partition directory names (no type re-inference)") {
    val wh = java.nio.file.Files.createTempDirectory("graft_delstr").toString
    val store = new ParquetTableStore(spark, wh)
    // "01" re-infers as integer 1 under partition type inference — the
    // reconstructed dir p=1 would not match the live dir p=01
    val rows = Seq((1L, "01"), (2L, "01"), (3L, "1"), (4L, "2"))
      .toDF("id", "p")
    store.replacePartitioned("t", rows, Seq("p"))
    assert(new java.io.File(s"${store.path("t")}/p=01").exists())
    val removed = store.deletePartitioned("t", Seq(1L).toDF("id"), Seq("id"), "p")
    assert(removed == 1L)
    val left = store.read("t").get.select("id").as[Long].collect().sorted.toSeq
    assert(left == Seq(2L, 3L, 4L), s"rows after delete: $left")
    // the p=01 dir was rewritten in place, not duplicated as p=1's
    // sibling (assert on the DIRECTORIES: a normal read's type inference
    // conflates "01" and "1" into one value, which is exactly why the
    // swap must reconstruct names inference-free)
    assert(new java.io.File(s"${store.path("t")}/p=01").exists())
    assert(spark.read.parquet(s"${store.path("t")}/p=01")
      .select("id").as[Long].collect().toSeq == Seq(2L),
      "p=01 must hold exactly the surviving row")
    assert(spark.read.parquet(s"${store.path("t")}/p=1")
      .select("id").as[Long].collect().toSeq == Seq(3L),
      "p=1 must be untouched")
  }

  test("deleting every row is refused loudly; the table stays intact") {
    val wh = java.nio.file.Files.createTempDirectory("graft_delall").toString
    val store = new ParquetTableStore(spark, wh)
    store.replace("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val e = intercept[RuntimeException] {
      store.delete("t", Seq(1L, 2L).toDF("id"), Seq("id"))
    }
    assert(e.getMessage.contains("every row"), e.getMessage)
    assert(store.read("t").get.count() == 2L, "refused delete must not touch data")

    store.replacePartitioned("tp",
      Seq((1L, 0L), (2L, 1L)).toDF("id", "seg"), Seq("seg"))
    val e2 = intercept[RuntimeException] {
      store.deletePartitioned("tp", Seq(1L, 2L).toDF("id"), Seq("id"), "seg")
    }
    assert(e2.getMessage.contains("every row"), e2.getMessage)
    assert(store.read("tp").get.count() == 2L)
    // emptying SOME partitions while others survive is still fine
    assert(store.deletePartitioned("tp", Seq(2L).toDF("id"), Seq("id"), "seg") == 1L)
    assert(store.read("tp").get.count() == 1L)
  }

  test("a single delete call is safe when the match frame reads the table being deleted") {
    val wh = java.nio.file.Files.createTempDirectory("graft_delself").toString
    val store = new ParquetTableStore(spark, wh)
    store.replace("t", Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c"), (5L, "a"))
      .toDF("id", "v"))
    // matches derive FROM the table itself: ids whose v appears > 1 times
    val t = store.read("t").get
    val dupIds = t.join(
        t.groupBy("v").count().filter(col("count") > 1).select("v"), Seq("v"))
      .select("id")
    val removed = store.delete("t", dupIds, Seq("id"))
    assert(removed == 3L)
    assert(store.read("t").get.select("id").as[Long].collect().sorted.toSeq
      == Seq(2L, 4L))
  }

  test("deletePartitioned interrupted mid-swap is restored and converges on re-run") {
    val wh = Files.createTempDirectory("graft_delc").toString
    val store = new ParquetTableStore(spark, wh)
    val rows = ((1L to 5L).map((_, 0L)) ++ (6L to 10L).map((_, 1L)))
      .toDF("id", "seg")
    store.replacePartitioned("t", rows, Seq("seg"))
    // simulate the crash window: partition renamed to backup, swap-in lost
    val backup = new File(s"$wh/_old_t/seg=1")
    backup.getParentFile.mkdirs()
    assert(new File(s"${store.path("t")}/seg=1").renameTo(backup))
    // next store op recovers the backup, then the delete converges
    val removed = store.deletePartitioned("t",
      Seq(6L).toDF("id"), Seq("id"), "seg")
    assert(removed == 1L)
    val left = store.read("t").get
    assert(left.count() == 9)
    assert(left.filter(col("seg") === 1).count() == 4)
  }
}
