package graft.operators

import java.io.File
import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF appends must be O(batch) in bytes written: new ids land as
  * APPENDED files inside their cell directories, never as a rewrite of
  * the touched partitions (the previous keyed-merge shape rewrote every
  * touched cell — a scattered batch touched all of them, so each append
  * silently cost O(corpus); the 100× smoke measured append time scaling
  * with corpus size). Pre-existing files byte-identical is the proof. */
class IvfAppendModeSpec extends SparkSpec {
  import spark.implicits._

  private def ring(ids: Range, denom: Int, dim: Int = 8) = ids.map { i =>
    val th = 2 * math.Pi * (i % denom) / denom
    (i.toLong, (Array(math.cos(th).toFloat, math.sin(th).toFloat) ++
      Array.fill(dim - 2)(0.0f)).toSeq)
  }.toDF("id", "v")

  /** name -> (size, content hash) for every parquet data file under dir,
    * recursively (partition layout). */
  private def snapshot(dir: String): Map[String, (Long, Int)] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new File(dir)).map(f =>
      f.getPath -> (f.length(),
        java.util.Arrays.hashCode(Files.readAllBytes(f.toPath)))).toMap
  }

  test("append of new ids leaves every pre-existing cells file byte-identical") {
    val wh = Files.createTempDirectory("graft_ivfap").toString
    val store = new ParquetTableStore(spark, wh)
    IvfIndex.build(store, "ix", ring(0 until 64, 128), "id", "v",
      nCells = 8, iterations = 3)
    val before = snapshot(store.path("ix_cells"))
    assert(before.nonEmpty)

    // a SCATTERED batch (every cell gets members — the shape that made
    // the merge path rewrite the whole table)
    IvfIndex.append(store, "ix", ring(64 until 128, 128), "id", "v")
    val after = snapshot(store.path("ix_cells"))
    before.foreach { case (f, sig) =>
      assert(after.get(f).contains(sig),
        s"pre-existing file $f was rewritten by an all-new-ids append")
    }
    assert(after.size > before.size, "appended files must exist")
    IvfIndex.verifyFresh(store, "ix", ring(0 until 128, 128), "id")

    // replay: identical re-send adds NO files and changes nothing
    IvfIndex.append(store, "ix", ring(64 until 128, 128), "id", "v")
    assert(snapshot(store.path("ix_cells")) == after,
      "a replayed batch must not touch the cells layout")

    // an appended id answers probes exactly like a built one
    val twin = ring(100 until 101, 128)
      .select(($"id" + 1000L).as("id"), $"v")
    val got = IvfIndex.probe(store, "ix", twin, "id", "v", topK = 1, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(got(1100L) == 100L, s"appended vector not retrievable: $got")
  }

  test("a same-cell changed vector is updated in place (not skipped, not duplicated)") {
    val wh = Files.createTempDirectory("graft_ivfap2").toString
    val store = new ParquetTableStore(spark, wh)
    val corpus = ring(0 until 32, 32)
    IvfIndex.build(store, "ix", corpus, "id", "v", nCells = 8, iterations = 3)
    // shrink id 5 to half length: same direction -> same cell, new floats
    val shrunk = corpus.filter($"id" === 5L)
      .select($"id", transform($"v", x => x * 0.5f).as("v"))
    IvfIndex.append(store, "ix", shrunk, "id", "v")
    val stored = store.read("ix_cells").get.filter($"id" === 5L)
      .select($"v").as[Seq[Float]].collect()
    assert(stored.length == 1, s"id 5 must have exactly one row, got ${stored.length}")
    val want = shrunk.select($"v").as[Seq[Float]].head()
    assert(stored.head == want, "the stored vector must be the NEW one")
    IvfIndex.verifyFresh(store, "ix", corpus, "id")
  }

  test("compactCells bounds file count; probes bit-identical; appends continue") {
    val wh = Files.createTempDirectory("graft_ivfap3").toString
    val store = new ParquetTableStore(spark, wh)
    IvfIndex.build(store, "ix", ring(0 until 32, 128), "id", "v",
      nCells = 4, iterations = 3)
    (1 to 4).foreach { b =>
      IvfIndex.append(store, "ix",
        ring(32 * b until 32 * (b + 1), 128), "id", "v")
    }
    val qs = ring(10 until 14, 128).select(($"id" + 9000L).as("id"), $"v")
    def probeRows(): Seq[(Long, Long, Long)] =
      IvfIndex.probe(store, "ix", qs, "id", "v", topK = 3, nProbe = 4)
        .select($"query_id", $"rank", $"neighbor_id")
        .as[(Long, Long, Long)].collect().toSeq.sorted
    val before = probeRows()
    val (filesBefore, rows) = IvfIndex.compactCells(store, "ix")
    assert(rows == 160L)
    val filesAfter = store.read("ix_cells").get.inputFiles.length
    assert(filesAfter < filesBefore,
      s"compaction must reduce files: $filesBefore -> $filesAfter")
    assert(probeRows() == before, "probes must be bit-identical through compaction")
    IvfIndex.append(store, "ix", ring(160 until 170, 128), "id", "v")
    IvfIndex.verifyFresh(store, "ix", ring(0 until 170, 128), "id")

    // and the maintenance rule drives it: tiny threshold -> compact once
    IvfIndex.append(store, "ix", ring(170 until 180, 128), "id", "v")
    val first = IndexMaintenance.maintainIvf(store, "ix", maxCellFiles = 1)
    assert(first.cells.exists(c => c.compacted && c.files > 1), first.toString)
    val second = IndexMaintenance.maintainIvf(store, "ix", maxCellFiles = 1000)
    assert(!second.cells.get.compacted, second.toString)
  }

  test("batch-internal duplicates: identical rows collapse, conflicting vectors are loud") {
    val wh = Files.createTempDirectory("graft_ivfdup").toString
    val store = new ParquetTableStore(spark, wh)
    IvfIndex.build(store, "ix", ring(0 until 32, 64), "id", "v",
      nCells = 4, iterations = 3)
    // the append-files fresh path writes rows verbatim — a doubled id
    // must NOT index twice (the keyed merge that used to collapse it is
    // gone on this path)
    val doubled = ring(32 until 40, 64).unionAll(ring(32 until 40, 64))
    IvfIndex.append(store, "ix", doubled, "id", "v")
    val counts = store.read("ix_cells").get
      .groupBy($"id").count().filter($"count" > 1).count()
    assert(counts == 0L, "a batch-internal duplicate id was indexed twice")
    IvfIndex.verifyFresh(store, "ix", ring(0 until 40, 64), "id")
    // one id, two DIFFERENT vectors in one batch: ambiguous — loud
    val conflicted = ring(40 until 41, 64).unionAll(
      ring(40 until 41, 64).select($"id", reverse($"v").as("v")))
    val e = intercept[RuntimeException] {
      IvfIndex.append(store, "ix", conflicted, "id", "v")
    }
    assert(e.getMessage.contains("more than once"), e.getMessage)
    // the failed append left the index untouched and fresh
    IvfIndex.verifyFresh(store, "ix", ring(0 until 40, 64), "id")
  }
}
