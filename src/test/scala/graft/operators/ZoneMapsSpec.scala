package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZoneMapsSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): ParquetTableStore = new ParquetTableStore(spark,
    java.nio.file.Files.createTempDirectory("graft_zones_spec").toString)

  private def clustered(store: ParquetTableStore, name: String,
                        n: Int = 2000, parts: Int = 8): Unit = {
    val df = (1 to n).map(i => (i.toLong, s"s${i % 7}", i * 2.0))
      .toDF("k", "tag", "v")
    store.replace(name, df.repartitionByRange(parts, col("k"))
      .sortWithinPartitions(col("k")))
    ZoneMaps.build(store, name, Seq("k", "tag", "v"))
  }

  test("pruned range read ≡ the plain filter, and the plan skips files") {
    val store = freshStore()
    clustered(store, "t")
    val (files, total) = ZoneMaps.planFiles(store, "t", "k", 100L, 300L)
    assert(total >= 8, s"expected >=8 data files, got $total")
    assert(files.nonEmpty && files.size < total,
      s"a narrow range over a range-clustered layout must skip files " +
        s"(admitted ${files.size} of $total)")
    val pruned = ZoneMaps.prunedReadRange(store, "t", "k", 100L, 300L)
      .select("k", "tag", "v").as[(Long, String, Double)].collect().toSet
    val full = store.read("t").get
      .filter(col("k") >= 100L && col("k") <= 300L)
      .select("k", "tag", "v").as[(Long, String, Double)].collect().toSet
    assert(pruned == full)
  }

  test("pruned ≡ unpruned over many ranges, including empty and all") {
    val store = freshStore()
    clustered(store, "t", n = 500, parts = 5)
    val ranges = Seq((1L, 500L), (-10L, 0L), (499L, 499L), (250L, 260L),
      (9999L, 99999L), (1L, 1L))
    ranges.foreach { case (lo, hi) =>
      val pruned = ZoneMaps.prunedReadRange(store, "t", "k", lo, hi)
        .select("k").as[Long].collect().sorted.toSeq
      val full = store.read("t").get
        .filter(col("k") >= lo && col("k") <= hi)
        .select("k").as[Long].collect().sorted.toSeq
      assert(pruned == full, s"range [$lo, $hi]")
    }
    // the empty range admits zero files and returns an empty frame with
    // the table's schema
    val (none, _) = ZoneMaps.planFiles(store, "t", "k", 9999L, 99999L)
    assert(none.isEmpty)
    val empty = ZoneMaps.prunedReadRange(store, "t", "k", 9999L, 99999L)
    assert(empty.count() == 0 &&
      empty.columns.toSeq == store.read("t").get.columns.toSeq)
  }

  test("string-typed zones prune and stay exact") {
    val store = freshStore()
    val df = ('a' to 'z').flatMap(c => (1 to 40).map(i => (s"$c$i", c.toString)))
      .zipWithIndex.map { case ((s, c), i) => (i.toLong, s, c) }
      .toDF("k", "s", "bucket")
    store.replace("st", df.repartitionByRange(6, col("bucket"))
      .sortWithinPartitions(col("bucket")))
    ZoneMaps.build(store, "st", Seq("bucket"))
    val (files, total) = ZoneMaps.planFiles(store, "st", "bucket", "d", "f")
    assert(files.size < total)
    val pruned = ZoneMaps.prunedReadRange(store, "st", "bucket", "d", "f")
      .select("k").as[Long].collect().toSet
    val full = store.read("st").get
      .filter(col("bucket") >= "d" && col("bucket") <= "f")
      .select("k").as[Long].collect().toSet
    assert(pruned == full)
  }

  test("nulls: never returned by a range read, and an all-null file is skipped") {
    val store = freshStore()
    val some = (1 to 100).map(i => (i.toLong, Some(i.toLong)))
    val nulls = (101 to 200).map(i => (i.toLong, Option.empty[Long]))
    // two explicit single-partition halves → the null half is its own file
    val df = (some ++ nulls).toDF("id", "k")
      .repartitionByRange(2, col("k").isNull, col("id"))
    store.replace("nt", df)
    ZoneMaps.build(store, "nt", Seq("k"))
    val zones = store.read("nt_zones").get
    val nullFiles = zones.filter(col("k_nulls") === col("n_rows"))
      .select("_file").as[String].collect()
    assert(nullFiles.nonEmpty, "fixture must produce an all-null file")
    val (admitted, _) = ZoneMaps.planFiles(store, "nt", "k", 1L, 1000L)
    assert(!admitted.exists(nullFiles.contains),
      "an all-null file can contain no range match and must be skipped")
    val got = ZoneMaps.prunedReadRange(store, "nt", "k", 1L, 1000L)
      .select("id").as[Long].collect().toSet
    assert(got == (1L to 100L).toSet)
  }

  test("a rewritten table makes the manifest loudly stale") {
    val store = freshStore()
    clustered(store, "t", n = 300, parts = 3)
    // table rewritten (compaction-shaped): file set changes, zones do not
    store.replace("t", store.read("t").get.repartition(1))
    val e = intercept[RuntimeException] {
      ZoneMaps.prunedReadRange(store, "t", "k", 1L, 10L)
    }
    assert(e.getMessage.contains("STALE"), e.getMessage)
    // rebuild heals it
    ZoneMaps.build(store, "t", Seq("k"))
    assert(ZoneMaps.prunedReadRange(store, "t", "k", 1L, 10L).count() == 10L)
  }

  test("bloom point lookup: skips files on an UNclustered key, stays exact") {
    val store = freshStore()
    // key k is scattered across files (layout clustered by g, not k) —
    // ranges can't skip here; the per-file bloom is the only handle
    val df = (1 to 3000).map(i => (i.toLong, i % 6))
      .toDF("k", "g")
    store.replace("pt", df.repartitionByRange(6, col("g")))
    ZoneMaps.build(store, "pt", Seq("g"), bloomCols = Seq("k"),
      expectedPerFile = 1000L)
    val (files, total) = ZoneMaps.planFilesPoint(store, "pt", "k", 1234L)
    assert(total >= 4, s"fixture needs several files, got $total")
    assert(files.nonEmpty && files.size < total,
      s"a point key living in one file must not admit all $total files " +
        s"(admitted ${files.size})")
    val got = ZoneMaps.prunedReadPoint(store, "pt", "k", 1234L)
      .select("k", "g").as[(Long, Int)].collect().toSeq
    assert(got == Seq((1234L, 1234 % 6)))
    // absent key: no false negatives means correctness is unconditional;
    // the bloom may admit a false-positive file or two, never all
    val (absent, _) = ZoneMaps.planFilesPoint(store, "pt", "k", 999999L)
    assert(absent.size < total)
    assert(ZoneMaps.prunedReadPoint(store, "pt", "k", 999999L).count() == 0)
  }

  test("bloom admission is a superset of the files that hold the key (no false negatives)") {
    val store = freshStore()
    val df = (1 to 2000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    store.replace("sup", df.repartition(8))
    ZoneMaps.build(store, "sup", Seq("k"), bloomCols = Seq("k"),
      expectedPerFile = 500L)
    val full = store.read("sup").get
    (Seq(1L, 777L, 2000L)).foreach { key =>
      val holder = full
        .filter(col("k") === key)
        .select(col("_metadata.file_path")).as[String].collect().toSet
      val (admitted, _) = ZoneMaps.planFilesPoint(store, "sup", "k", key)
      def n(p: String) = new java.net.URI(p).getPath
      assert(holder.map(n).subsetOf(admitted.map(n).toSet),
        s"key $key: bloom must admit every file that holds it")
    }
  }

  test("point probe is cast to the column type: an Int probe on a Long column still matches") {
    val store = freshStore()
    val df = (1 to 500).map(i => (i.toLong, i % 4)).toDF("k", "g")
    store.replace("tp", df.repartition(4))
    ZoneMaps.build(store, "tp", Seq("g"), bloomCols = Seq("k"),
      expectedPerFile = 200L)
    // value passed as Int, column is LongType — xxhash64(Int) differs
    // from xxhash64(Long), so without the cast this was a silent bloom
    // false negative (zero admitted files, empty result)
    val got = ZoneMaps.prunedReadPoint(store, "tp", "k", 123)
      .select("k").as[Long].collect().toSeq
    assert(got == Seq(123L))
  }

  test("maintain: builds when missing, no-ops when fresh, rebuilds (with blooms) after a rewrite") {
    val store = freshStore()
    val df = (1 to 400).map(i => (i.toLong, i % 5)).toDF("k", "g")
    store.replace("mt", df.repartitionByRange(4, col("k")))
    assert(ZoneMaps.maintain(store, "mt", Seq("k")),
      "missing manifest must trigger a build")
    assert(!ZoneMaps.maintain(store, "mt", Seq("k")),
      "fresh manifest must no-op")
    // add a bloom, then rewrite the table: maintain must rebuild and
    // PRESERVE the manifest's column choices, bloom included
    ZoneMaps.build(store, "mt", Seq("k"), bloomCols = Seq("g"))
    store.replace("mt", store.read("mt").get.repartition(2))
    assert(ZoneMaps.maintain(store, "mt", Seq("k")),
      "stale manifest must trigger a rebuild")
    val names = store.read("mt_zones").get.schema.fieldNames.toSet
    assert(names.contains("k_min") && names.contains("g_bloom"))
    assert(ZoneMaps.prunedReadPoint(store, "mt", "g", 3).count() ==
      df.filter(col("g") === 3).count())
  }

  test("maintain rebuilds with the manifest's OWN bloom sizing, not the default") {
    val store = freshStore()
    val df = (1 to 300).map(i => (i.toLong, i % 3)).toDF("k", "g")
    store.replace("bs", df.repartition(3))
    ZoneMaps.build(store, "bs", Seq("k"), bloomCols = Seq("k"),
      expectedPerFile = 777L)
    store.replace("bs", store.read("bs").get.repartition(2))
    assert(ZoneMaps.maintain(store, "bs", Seq("k")))
    val items = store.read("bs_zones").get
      .select("_bloom_items").as[Long].collect().toSet
    assert(items == Set(777L),
      s"rebuild must preserve the original bloom sizing, got $items")
  }

  test("point probe runs distributed: the collect carries only (name, bool), " +
      "the bloom is evaluated by graft_bloom_probe inside the plan") {
    val store = freshStore()
    val df = (1 to 600).map(i => (i.toLong, i % 3)).toDF("k", "g")
    store.replace("dp", df.repartition(4))
    ZoneMaps.build(store, "dp", Seq("g"), bloomCols = Seq("k"),
      expectedPerFile = 200L)
    val zones = store.read("dp_zones").get
    val frame = ZoneMaps.pointAdmitFrame(zones, "k",
      xxhash64(lit(42L).cast("long")))
    // the DRIVER-side shape (VERDICT r11's weak item): only the file name
    // and the admit flag reach the collect — no binary bloom column, so
    // driver bytes per lookup are file-count × name, flat in bloom size
    assert(frame.schema.fields.map(f => (f.name, f.dataType.simpleString))
        .toSeq == Seq(("_file", "string"), ("_admit", "boolean")),
      frame.schema.treeString)
    // and the probe expression itself sits IN the plan (executor-side),
    // not in driver code over collected bytes
    val plan = frame.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_bloom_probe"), plan)
    // end-to-end through the public path, for the same fixture
    val (admitted, total) = ZoneMaps.planFilesPoint(store, "dp", "k", 42L)
    assert(admitted.nonEmpty && total >= 4)
  }

  test("a null bloom (all-null file) admits nothing on the point path") {
    val store = freshStore()
    val some = (1 to 100).map(i => (i.toLong, Some(i.toLong)))
    val nulls = (101 to 200).map(i => (i.toLong, Option.empty[Long]))
    val df = (some ++ nulls).toDF("id", "k")
      .repartitionByRange(2, col("k").isNull, col("id"))
    store.replace("nb", df)
    ZoneMaps.build(store, "nb", Seq("k"), bloomCols = Seq("k"),
      expectedPerFile = 200L)
    val zones = store.read("nb_zones").get
    val nullFiles = zones.filter(col("k_nulls") === col("n_rows"))
      .select("_file").as[String].collect()
    assert(nullFiles.nonEmpty, "fixture must produce an all-null file")
    val (admitted, _) = ZoneMaps.planFilesPoint(store, "nb", "k", 50L)
    assert(!admitted.exists(nullFiles.contains),
      "an equality probe is null-false: the all-null file cannot match")
    assert(ZoneMaps.prunedReadPoint(store, "nb", "k", 50L)
      .select("id").as[Long].collect().toSeq == Seq(50L))
  }

  test("manifest accounting: n_rows and per-column null counts are exact") {
    val store = freshStore()
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")), (4L, None))
      .toDF("k", "s").coalesce(1)
    store.replace("acc", df)
    ZoneMaps.build(store, "acc", Seq("k", "s"))
    val z = store.read("acc_zones").get
      .select("n_rows", "k_min", "k_max", "k_nulls", "s_nulls")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(z == ((4L, 1L, 4L, 0L, 2L)))
  }

  test("maintain heals append-only growth incrementally: old rows carry over, result ≡ full rebuild") {
    val store = freshStore()
    clustered(store, "t", n = 1000, parts = 4)
    ZoneMaps.build(store, "t", Seq("k"), bloomCols = Seq("tag"),
      expectedPerFile = 5000L)
    def manifestRows() = store.read("t_zones").get
      .select(col("_file"), col("n_rows"), col("k_min"), col("k_max"),
        col("k_nulls"), col("_bloom_items"))
      .collect().map(r => (new java.net.URI(r.getString(0)).getPath,
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val before = manifestRows()
    // append-only growth: new files land in the table dir without
    // touching existing ones (the store's append-sink shape)
    val extra = (2001 to 2200).map(i => (i.toLong, s"s${i % 7}", i * 2.0))
      .toDF("k", "tag", "v")
    extra.repartition(2).write.mode("append").parquet(store.path("t"))
    assert(ZoneMaps.maintain(store, "t", Seq.empty), "growth must trigger a heal")
    val after = manifestRows()
    // every pre-existing manifest row carried over VERBATIM (per-file
    // stats are facts appends cannot change — the incremental path must
    // not rescan or recompute them)
    before.foreach { case (f, stats) =>
      assert(after.get(f).contains(stats), s"old manifest row changed for $f")
    }
    val newRows = after.keySet -- before.keySet
    assert(newRows.size == 2, s"expected 2 new file rows: $newRows")
    newRows.foreach { f =>
      assert(after(f)._3 >= 2001L, s"new row stats wrong for $f: ${after(f)}")
    }
    // the healed manifest answers exactly like a from-scratch build
    val pruned = ZoneMaps.prunedReadRange(store, "t", "k", 2050L, 2100L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(pruned == (2050L to 2100L).toSeq)
    val viaBloom = ZoneMaps.prunedReadPoint(store, "t", "tag", "s3")
      .select("k").as[Long].collect().toSet
    val plain = store.read("t").get.filter(col("tag") === "s3")
      .select("k").as[Long].collect().toSet
    assert(viaBloom == plain, "bloom point read wrong after incremental heal")
    // a REWRITE (vanished files) still takes the full-rebuild path
    store.replace("t", store.read("t").get.repartition(3))
    assert(ZoneMaps.maintain(store, "t", Seq.empty))
    assert(store.read("t_zones").get.count() == 3)
    assert(ZoneMaps.prunedReadPoint(store, "t", "tag", "s3")
      .select("k").as[Long].collect().toSet == plain)
  }

  test("property: pruned ≡ plain across seeded random append/rewrite/maintain sequences") {
    // the lifecycle the incremental heal must survive: arbitrary
    // interleavings of append-only growth (incremental path) and
    // rewrites (full-rebuild path), a maintain tick after each, and the
    // exactness contract re-checked over random ranges every step
    Seq(11L, 47L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val store = freshStore()
      var nextK = 1000L
      store.replace("t", (0L until nextK).map(i => (i, i % 13)).toDF("k", "g")
        .repartitionByRange(3, col("k")))
      ZoneMaps.build(store, "t", Seq("k"))
      (1 to 6).foreach { step =>
        if (rnd.nextBoolean()) { // append-only growth
          val n = 100 + rnd.nextInt(200)
          (nextK until nextK + n).map(i => (i, i % 13)).toDF("k", "g")
            .repartition(1 + rnd.nextInt(2))
            .write.mode("append").parquet(store.path("t"))
          nextK += n
        } else { // rewrite (compaction-shaped)
          store.replace("t",
            store.read("t").get.repartition(2 + rnd.nextInt(3)))
        }
        assert(ZoneMaps.maintain(store, "t", Seq.empty),
          s"seed $seed step $step: change must trigger a heal")
        assert(!ZoneMaps.maintain(store, "t", Seq.empty),
          s"seed $seed step $step: healed manifest must be fresh")
        val lo = rnd.nextInt(nextK.toInt).toLong
        val hi = lo + rnd.nextInt(500)
        val pruned = store.readRange("t", "k", lo, hi)
          .select("k").as[Long].collect().sorted.toSeq
        val plain = store.read("t").get
          .filter(col("k") >= lo && col("k") <= hi)
          .select("k").as[Long].collect().sorted.toSeq
        assert(pruned == plain, s"seed $seed step $step range [$lo,$hi]")
      }
    }
  }

  test("routed read pushes the residual predicate into the parquet scan") {
    val store = freshStore()
    clustered(store, "t")
    val plan = store.readRange("t", "k", 100L, 300L)
      .queryExecution.executedPlan.toString
    // file skipping happens at plan time (inputFiles assertion in the
    // routing test); WITHIN the admitted files the residual must reach
    // the scan so row-group stats prune too — two independent layers
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(k,100)") &&
      plan.contains("LessThanOrEqual(k,300)"),
      s"residual range not pushed to the scan:\n$plan")
  }

  test("store.readRange routes through a fresh manifest by default and skips files") {
    // VERDICT r12 item 3: the manifest only pays if the COMMON read path
    // uses it — readRange/readPoint are that path, with the plain scan as
    // the no-manifest fallback and the staleness contract kept loud.
    val store = freshStore()
    clustered(store, "t")
    val total = store.read("t").get.inputFiles.length
    val routed = store.readRange("t", "k", 100L, 300L)
    assert(routed.inputFiles.length < total,
      s"routed read must open only admitted files " +
        s"(${routed.inputFiles.length} of $total)")
    val plain = store.read("t").get
      .filter(col("k") >= 100L && col("k") <= 300L)
      .select("k", "tag", "v").as[(Long, String, Double)].collect().toSet
    assert(routed.select("k", "tag", "v")
      .as[(Long, String, Double)].collect().toSet == plain)
    // no manifest -> the identical plain scan, all files
    store.replace("nm", store.read("t").get)
    val fallback = store.readRange("nm", "k", 100L, 300L)
    assert(fallback.inputFiles.length == store.read("nm").get.inputFiles.length)
    assert(fallback.select("k", "tag", "v")
      .as[(Long, String, Double)].collect().toSet == plain)
    // stale manifest stays LOUD on the routed path
    store.replace("t", store.read("t").get.repartition(3))
    val e = intercept[RuntimeException] { store.readRange("t", "k", 100L, 300L) }
    assert(e.getMessage.contains("STALE"), e.getMessage)
  }

  test("conjunctive readWhere: intersection admission, uncovered predicates as residuals, exact") {
    val store = freshStore()
    // clustered by k (stats), bloom on tag, v UNcovered by the manifest
    val df = (1 to 2000).map(i => (i.toLong, s"s${i % 7}", i * 2.0))
      .toDF("k", "tag", "v")
    store.replace("t", df.repartitionByRange(8, col("k"))
      .sortWithinPartitions(col("k")))
    ZoneMaps.build(store, "t", Seq("k"), bloomCols = Seq("tag"),
      expectedPerFile = 5000L)
    def plain(pred: org.apache.spark.sql.Column) = store.read("t").get
      .filter(pred).select("k", "tag", "v")
      .as[(Long, String, Double)].collect().toSet
    // range AND point: admitted files = intersection of the two
    // single-predicate admissions (at most the smaller)
    val both = store.readWhere("t", Seq(("k", 100L, 300L)), Seq(("tag", "s3")))
    val rangeOnly = store.readRange("t", "k", 100L, 300L)
    assert(both.inputFiles.length <= rangeOnly.inputFiles.length,
      "conjunction must admit no more files than either predicate alone")
    assert(both.select("k", "tag", "v").as[(Long, String, Double)]
      .collect().toSet ==
      plain(col("k") >= 100L && col("k") <= 300L && col("tag") === "s3"))
    // an UNCOVERED column rides along as a plain residual
    val mixed = store.readWhere("t",
      Seq(("k", 100L, 300L), ("v", 300.0, 500.0)), Seq(("tag", "s3")))
    assert(mixed.select("k", "tag", "v").as[(Long, String, Double)]
      .collect().toSet ==
      plain(col("k") >= 100L && col("k") <= 300L && col("tag") === "s3" &&
        col("v") >= 300.0 && col("v") <= 500.0))
    // contradiction on covered predicates admits nothing, schema kept
    val none = store.readWhere("t", Seq(("k", 100L, 110L)), Seq(("tag", "zz")))
    assert(none.count() == 0 &&
      none.columns.toSeq == store.read("t").get.columns.toSeq)
    // nothing covered at all: identical plain scan
    store.replace("nm", store.read("t").get)
    assert(store.readWhere("nm", Seq(("v", 300.0, 500.0)))
      .select("k").as[Long].collect().toSet ==
      store.read("nm").get.filter(col("v") >= 300.0 && col("v") <= 500.0)
        .select("k").as[Long].collect().toSet)
  }

  test("heal is APPEND-shaped: old manifest files persist on disk, new rows land as new files") {
    // VERDICT r13's one weak component: the r13 heal collected the whole
    // manifest (bloom bytes included) to the driver and REPLACED the
    // table. The fix appends only the new files' rows — observable on
    // disk: the manifest's existing parquet files survive the heal
    // byte-identically (a replace would swap in a fresh directory), and
    // the new rows arrive as additional files.
    val store = freshStore()
    clustered(store, "t", n = 800, parts = 4)
    ZoneMaps.build(store, "t", Seq("k"), bloomCols = Seq("tag"),
      expectedPerFile = 5000L)
    val beforeFiles = store.listDataFiles("t_zones")
    assert(beforeFiles.nonEmpty)
    (801 to 900).map(i => (i.toLong, s"s${i % 7}", i * 2.0))
      .toDF("k", "tag", "v")
      .repartition(1).write.mode("append").parquet(store.path("t"))
    assert(ZoneMaps.maintain(store, "t", Seq.empty))
    val afterFiles = store.listDataFiles("t_zones")
    beforeFiles.foreach { case (p, size) =>
      assert(afterFiles.get(p).contains(size),
        s"heal must not rewrite the existing manifest file $p")
    }
    assert(afterFiles.size > beforeFiles.size,
      "heal must append the new files' rows as new manifest files")
    // and the healed manifest still answers exactly
    assert(ZoneMaps.prunedReadRange(store, "t", "k", 850L, 860L)
      .select("k").as[Long].collect().sorted.toSeq == (850L to 860L).toSeq)
  }

  test("relocating a warehouse keeps manifests VALID: routed reads prune and stay exact, maintain reports fresh (r15)") {
    val oldRoot = java.nio.file.Files.createTempDirectory("graft_zmove_a")
    val store0 = new ParquetTableStore(spark, oldRoot.toString)
    val df = (1 to 2000).map(i => (i.toLong, (i * 7919L) % 500L, i * 2.0))
      .toDF("k", "p", "v")
    store0.replace("t", df.repartitionByRange(8, col("k"))
      .sortWithinPartitions(col("k")))
    ZoneMaps.build(store0, "t", Seq("k"), bloomCols = Seq("p"),
      expectedPerFile = 1000L)
    // MOVE the whole warehouse — bucket migration / dir rename / restored
    // backup: the manifest's stored paths now all carry a dead root
    val newRoot = java.nio.file.Files.createTempDirectory("graft_zmove_b")
    java.nio.file.Files.delete(newRoot)
    java.nio.file.Files.move(oldRoot, newRoot)
    val store = new ParquetTableStore(spark, newRoot.toString)
    // freshness keys are root-relative: NOT stale, no heal needed
    assert(!ZoneMaps.maintain(store, "t", Seq.empty),
      "a relocated warehouse must read as FRESH (root-relative fingerprint)")
    // routed range read: prunes (the remap resolves stored paths onto the
    // NEW root) and is exact
    val routed = store.readRange("t", "k", 100L, 300L)
    assert(routed.inputFiles.forall(_.contains(newRoot.toString)),
      "admitted files must resolve to the LIVE root, not the manifest's")
    assert(routed.inputFiles.length < 8, "relocated manifest must still prune")
    assert(routed.select("k").as[Long].collect().sorted.toSeq ==
      (100L to 300L).toSeq)
    // bloom point read across the relocation
    val viaBloom = store.readPoint("t", "p", 123L)
      .select("k").as[Long].collect().toSet
    assert(viaBloom == store.read("t").get.filter(col("p") === 123L)
      .select("k").as[Long].collect().toSet)
    // ...and the mixed-tree path
    val tree = ZonePred.And(Seq(ZonePred.Range("k", 100L, 400L),
      ZonePred.Point("p", 123L)))
    assert(store.readWhereExpr("t", tree).select("k").as[Long].collect().toSet ==
      store.read("t").get.filter(ZoneMaps.predExpr(tree))
        .select("k").as[Long].collect().toSet)
  }

  test("readWhereExpr: mixed AND/OR trees prune; partial and no coverage degrade exactly (VERDICT r14 item 6)") {
    val store = freshStore()
    clustered(store, "t") // manifest covers k, tag, v; 8 k-ranged files
    import ZonePred._
    val total = store.read("t").get.inputFiles.length
    def plainRows(p: ZonePred): Seq[Long] = store.read("t").get
      .filter(ZoneMaps.predExpr(p)).select("k").as[Long].collect().sorted.toSeq
    // fully covered mixed tree: a AND (b OR c) — the shape neither flat
    // routed entry point expresses; v ∈ [300,500] ⇔ k ∈ [150,250], so
    // the composed admission (k-range ∩ (v-range ∪ point)) skips files
    val tree = And(Seq(Range("k", 100L, 400L),
      Or(Seq(Range("v", 300.0, 500.0), Point("k", 380L)))))
    val routed = store.readWhereExpr("t", tree)
    assert(routed.inputFiles.length < total,
      s"mixed tree must prune (${routed.inputFiles.length} of $total)")
    val got = routed.select("k").as[Long].collect().sorted.toSeq
    assert(got == plainRows(tree), "pruned ≡ plain broken on the mixed tree")
    assert(got == ((150L to 250L) :+ 380L).sorted, "wrong rows")
    // manifest covering ONLY k: an OR with an uncovered leaf is poisoned
    // (could match anywhere), but under the AND the covered k-range still
    // prunes and the WHOLE tree re-applies as the residual
    clustered(store, "u")
    ZoneMaps.build(store, "u", Seq("k"))
    val partial = And(Seq(Range("k", 100L, 400L),
      Or(Seq(Point("tag", "s3"), Range("k", 350L, 360L)))))
    val routedU = store.readWhereExpr("u", partial)
    assert(routedU.inputFiles.length < total, "covered AND-child must still prune")
    assert(routedU.select("k").as[Long].collect().sorted.toSeq ==
      store.read("u").get.filter(ZoneMaps.predExpr(partial))
        .select("k").as[Long].collect().sorted.toSeq)
    // nothing covered: the plain filtered scan (full listing), exact
    val uncovered = Or(Seq(Point("tag", "s3"), Point("tag", "s5")))
    val plainPath = store.readWhereExpr("u", uncovered)
    assert(plainPath.inputFiles.length == total,
      "an uncovered tree must not consult the manifest")
    assert(plainPath.select("k").as[Long].collect().sorted.toSeq ==
      store.read("u").get.filter(ZoneMaps.predExpr(uncovered))
        .select("k").as[Long].collect().sorted.toSeq)
  }

  test("maintainTable compacts a many-small-files manifest past the threshold; heals stay incremental after (VERDICT r14 item 3)") {
    val store = freshStore()
    clustered(store, "t", n = 600, parts = 3)
    def appendBatch(lo: Int): Unit =
      (lo until lo + 10).map(i => (i.toLong, s"s${i % 7}", i * 2.0))
        .toDF("k", "tag", "v")
        .repartition(1).write.mode("append").parquet(store.path("t"))
    def prunedEqPlain(): Unit = {
      val hi = store.read("t").get.agg(max(col("k"))).head().getLong(0)
      val pruned = store.readRange("t", "k", 300L, hi)
        .select("k").as[Long].collect().sorted.toSeq
      val plain = store.read("t").get.filter(col("k") >= 300L && col("k") <= hi)
        .select("k").as[Long].collect().sorted.toSeq
      assert(pruned == plain, "routed read drifted from the plain filter")
    }
    // five streaming-shaped ticks: each appends one data file and heals —
    // one new manifest file per tick (the append-only heal shape)
    (0 until 5).foreach { b =>
      appendBatch(601 + b * 10)
      val r = IndexMaintenance.maintainTable(store, "t", Seq.empty,
        maxManifestFiles = 100)
      assert(r.zonesRebuilt && !r.manifest.get.compacted)
    }
    val grown = store.listDataFiles("t_zones").size
    assert(grown >= 5, s"each heal tick must append a manifest file ($grown)")
    prunedEqPlain()
    // past the threshold: ONE compaction, routed reads exact after
    val r = IndexMaintenance.maintainTable(store, "t", Seq.empty,
      maxManifestFiles = 3)
    assert(r.manifest.exists(m => m.compacted && m.files == grown.toLong))
    val compacted = store.listDataFiles("t_zones")
    assert(compacted.size == 1, s"manifest must compact to one file: $compacted")
    prunedEqPlain()
    // the NEXT heal is still incremental: the compacted manifest file
    // survives byte-identically, the new batch's rows arrive as a new file
    appendBatch(651)
    assert(IndexMaintenance.maintainTable(store, "t", Seq.empty,
      maxManifestFiles = 100).zonesRebuilt)
    val after = store.listDataFiles("t_zones")
    compacted.foreach { case (p, size) =>
      assert(after.get(p).contains(size),
        s"post-compaction heal must not rewrite the compacted manifest file $p")
    }
    assert(after.size == 2, s"heal after compaction must append, got $after")
    prunedEqPlain()
  }

  test("zero-row data files get n_rows=0 manifest rows; maintain converges instead of healing forever") {
    // ADVICE r13: a zero-row parquet file contributes no group to the
    // stats aggregate, so without the backfill it never gets a manifest
    // row — every routed read fails loudly and maintain re-heals forever.
    val store = freshStore()
    val df = (1 to 400).map(i => (i.toLong, s"s${i % 5}")).toDF("k", "tag")
    store.replace("z", df.repartitionByRange(4, col("k")))
    // an empty data file inside the table dir (a task that saw no rows)
    store.read("z").get.limit(0).coalesce(1)
      .write.mode("append").parquet(store.path("z"))
    ZoneMaps.build(store, "z", Seq("k"), bloomCols = Seq("tag"),
      expectedPerFile = 1000L)
    val z = store.read("z_zones").get
    assert(z.count() == store.read("z").get.inputFiles.length,
      "every live data file, including the empty one, needs a manifest row")
    val empty = z.filter(col("n_rows") === 0L)
    assert(empty.count() == 1)
    val er = empty.select("k_min", "k_max", "tag_bloom").head()
    assert(er.isNullAt(0) && er.isNullAt(1) && er.isNullAt(2),
      "the empty file's row must carry null stats and null bloom")
    assert(!ZoneMaps.maintain(store, "z", Seq.empty),
      "a backfilled manifest is FRESH — no heal loop")
    // routed reads work, and the empty file is never admitted
    val (admitted, total) = ZoneMaps.planFiles(store, "z", "k", 1L, 1000L)
    assert(total == store.read("z").get.inputFiles.length)
    assert(admitted.size == total - 1, "null stats admit nothing")
    assert(store.readRange("z", "k", 10L, 20L)
      .select("k").as[Long].collect().sorted.toSeq == (10L to 20L).toSeq)
    // heal path: an append batch that includes ANOTHER empty file
    (401 to 450).map(i => (i.toLong, s"s${i % 5}")).toDF("k", "tag")
      .repartition(1).write.mode("append").parquet(store.path("z"))
    store.read("z").get.limit(0).coalesce(1)
      .write.mode("append").parquet(store.path("z"))
    assert(ZoneMaps.maintain(store, "z", Seq.empty), "growth must heal")
    assert(!ZoneMaps.maintain(store, "z", Seq.empty),
      "the incremental heal must converge with empty files present")
    assert(store.read("z_zones").get.filter(col("n_rows") === 0L).count() == 2)
    assert(store.readPoint("z", "tag", "s3").count() ==
      store.read("z").get.filter(col("tag") === "s3").count())
  }

  test("in-place file overwrite (same name, different bytes) reads as STALE and maintain full-rebuilds") {
    // ADVICE r13: name-set extension alone is not proof the old files'
    // bytes are unchanged — the manifest carries each file's byte length
    // (`_size`, the Delta/Iceberg discipline), so an external writer
    // overwriting a part file in place trips the attest instead of the
    // dead bytes' stats being carried forward.
    val store = freshStore()
    val df = (1 to 600).map(i => (i.toLong, i % 7)).toDF("k", "g")
    store.replace("ow", df.repartitionByRange(3, col("k")))
    ZoneMaps.build(store, "ow", Seq("k"))
    // overwrite one data file in place with different (tiny) content
    val victim = new java.net.URI(
      store.read("ow").get.inputFiles.head).getPath
    val tmp = java.nio.file.Files.createTempDirectory("graft_ow").toString
    Seq((9999L, 0)).toDF("k", "g").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val tiny = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    java.nio.file.Files.copy(tiny, java.nio.file.Paths.get(victim),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the local-FS checksum sidecar the out-of-band overwrite
    // invalidated (a real external writer would rewrite it; the test
    // bypasses Hadoop, so the stale .crc must go)
    val vf = new java.io.File(victim)
    java.nio.file.Files.deleteIfExists(
      new java.io.File(vf.getParentFile, s".${vf.getName}.crc").toPath)
    val e = intercept[RuntimeException] {
      ZoneMaps.prunedReadRange(store, "ow", "k", 1L, 100L)
    }
    assert(e.getMessage.contains("STALE"), e.getMessage)
    // maintain takes the FULL rebuild (no verbatim carry-over of the
    // overwritten file's stats), after which reads are exact again
    assert(ZoneMaps.maintain(store, "ow", Seq.empty))
    val plain = store.read("ow").get
      .filter(col("k") >= 1L && col("k") <= 10000L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(ZoneMaps.prunedReadRange(store, "ow", "k", 1L, 10000L)
      .select("k").as[Long].collect().sorted.toSeq == plain)
    assert(plain.contains(9999L), "the overwritten file's new content " +
      "must be visible through the rebuilt manifest")
  }

  test("disjunctive readWhereAny: union admission, exact, falls back when a disjunct is uncovered") {
    val store = freshStore()
    val df = (1 to 2000).map(i => (i.toLong, s"s${i % 7}", i * 2.0))
      .toDF("k", "tag", "v")
    store.replace("t", df.repartitionByRange(8, col("k"))
      .sortWithinPartitions(col("k")))
    ZoneMaps.build(store, "t", Seq("k"), bloomCols = Seq("tag"),
      expectedPerFile = 5000L)
    def plain(pred: org.apache.spark.sql.Column) = store.read("t").get
      .filter(pred).select("k", "tag", "v")
      .as[(Long, String, Double)].collect().toSet
    // two disjoint ranges: admitted = union of the per-predicate
    // admissions, still fewer files than the table
    val total = store.read("t").get.inputFiles.length
    val ranges = store.readWhereAny("t",
      Seq(("k", 100L, 200L), ("k", 1500L, 1600L)))
    assert(ranges.inputFiles.length < total,
      s"disjunction over covered ranges must still skip files " +
        s"(${ranges.inputFiles.length} of $total)")
    assert(ranges.select("k", "tag", "v").as[(Long, String, Double)]
      .collect().toSet ==
      plain((col("k") >= 100L && col("k") <= 200L) ||
        (col("k") >= 1500L && col("k") <= 1600L)))
    // adding a bloom-point disjunct on a key that truly lives in every
    // file (tag cycles mod 7): the union honestly admits everything —
    // the negative control — and the result stays exact
    val both = store.readWhereAny("t",
      Seq(("k", 100L, 200L), ("k", 1500L, 1600L)), Seq(("tag", "s3")))
    assert(both.select("k", "tag", "v").as[(Long, String, Double)]
      .collect().toSet ==
      plain((col("k") >= 100L && col("k") <= 200L) ||
        (col("k") >= 1500L && col("k") <= 1600L) || col("tag") === "s3"))
    // an UNCOVERED disjunct (v has no stats) forces the full scan — the
    // fallback is the plain OR filter, result identical by construction
    val fb = store.readWhereAny("t",
      Seq(("k", 100L, 200L), ("v", 300.0, 310.0)))
    assert(fb.inputFiles.length == total,
      "an uncovered disjunct can match anywhere: no pruning allowed")
    assert(fb.select("k", "tag", "v").as[(Long, String, Double)]
      .collect().toSet ==
      plain((col("k") >= 100L && col("k") <= 200L) ||
        (col("v") >= 300.0 && col("v") <= 310.0)))
    // empty disjunction result keeps the schema
    val none = store.readWhereAny("t", Seq(("k", 99999L, 100000L)))
    assert(none.count() == 0 &&
      none.columns.toSeq == store.read("t").get.columns.toSeq)
  }

  test("routed reads recover a mid-swap publish crash like read() does") {
    // the attest lists through listDataFiles, not read(): it must run the
    // same _swap_<name> backup recovery, or a crash window that read()
    // heals would fail every routed read as "does not exist" forever
    val store = freshStore()
    clustered(store, "t", n = 300, parts = 3)
    val wh = new java.io.File(store.path("t")).getParent
    // simulate publish dying between rename(dst -> backup) and
    // rename(tmp -> dst): the table exists ONLY at _swap_t
    assert(new java.io.File(store.path("t"))
      .renameTo(new java.io.File(s"$wh/_swap_t")))
    val got = store.readRange("t", "k", 10L, 20L)
      .select("k").as[Long].collect().sorted.toSeq
    assert(got == (10L to 20L).toSeq,
      "routed read must restore the stranded backup and answer")
    assert(new java.io.File(store.path("t")).exists,
      "recovery must move the table back into place")
  }

  test("property: disjunctive pruned ≡ plain OR across seeded random range sets") {
    Seq(7L, 29L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val store = freshStore()
      val n = 3000
      store.replace("t", (1 to n).map(i => (i.toLong, i % 11))
        .toDF("k", "g").repartitionByRange(6, col("k"))
        .sortWithinPartitions(col("k")))
      ZoneMaps.build(store, "t", Seq("k"))
      (1 to 8).foreach { step =>
        val nDisjuncts = 1 + rnd.nextInt(3)
        val ranges = (1 to nDisjuncts).map { _ =>
          val lo = rnd.nextInt(n).toLong
          ("k", lo: Any, (lo + rnd.nextInt(400)): Any)
        }
        val pruned = store.readWhereAny("t", ranges)
          .select("k").as[Long].collect().sorted.toSeq
        val plain = store.read("t").get
          .filter(ranges.map { case (_, lo, hi) =>
            col("k") >= lit(lo) && col("k") <= lit(hi) }.reduce(_ || _))
          .select("k").as[Long].collect().sorted.toSeq
        assert(pruned == plain, s"seed $seed step $step ranges $ranges")
      }
    }
  }

  test("store.readPoint routes via bloom when present, degenerate range on stats, plain scan otherwise") {
    val store = freshStore()
    // unclustered high-cardinality key with a bloom
    val df = (1 to 1000).map(i => ((i * 7919L) % 1000L, i.toLong))
      .toDF("k", "id")
    store.replace("pb", df.repartition(6))
    ZoneMaps.build(store, "pb", Seq.empty, bloomCols = Seq("k"),
      expectedPerFile = 1000L)
    val viaBloom = store.readPoint("pb", "k", 500L)
    val plain = store.read("pb").get.filter(col("k") === 500L)
      .select("id").as[Long].collect().toSet
    assert(viaBloom.select("id").as[Long].collect().toSet == plain)
    // stats-only manifest: the point read prunes as the range [v, v]
    clustered(store, "ps")
    val viaStats = store.readPoint("ps", "k", 250L)
    assert(viaStats.inputFiles.length < store.read("ps").get.inputFiles.length)
    assert(viaStats.select("k").as[Long].collect().toSeq == Seq(250L))
    // no manifest at all: plain equality scan
    store.replace("pn", df)
    assert(store.readPoint("pn", "k", 500L)
      .select("id").as[Long].collect().toSet == plain)
  }

  test("compactSorted restores clustering: an interleaved table admits all, the sorted rewrite strictly fewer, answers identical (VERDICT r15 item 2)") {
    val store = freshStore()
    // interleaved layout: round-robin files, each spanning the full key
    // range — the decay shape a long-lived appended table reaches
    val df = (1 to 2000).map(i => (i.toLong, i * 2.0)).toDF("k", "v")
    store.replace("cl", df.repartition(8))
    ZoneMaps.build(store, "cl", Seq("k"))
    val (before, total0) = ZoneMaps.planFiles(store, "cl", "k", 100L, 300L)
    assert(total0 == 8 && before.size == total0,
      s"round-robin files each span the key range — admission must " +
        s"degenerate to admit-all (${before.size} of $total0)")
    val plain = store.read("cl").get
      .filter(col("k") >= 100L && col("k") <= 300L)
      .select("k", "v").as[(Long, Double)].collect().toSet
    assert(store.readRange("cl", "k", 100L, 300L)
      .select("k", "v").as[(Long, Double)].collect().toSet == plain)
    // one scheduled tick with clusterCols: 8 files > threshold 4 → the
    // SORTED rewrite (never plain compact — that scrambles clustering),
    // and the same tick's heal rebuilds the manifest over the new layout
    val rep = IndexMaintenance.maintainTable(store, "cl", Seq.empty,
      clusterCols = Seq("k"), maxDataFiles = 4)
    assert(rep.data.exists(_.compacted) && rep.zonesRebuilt,
      s"tick must rewrite AND heal in one pass: $rep")
    val (after, total1) = ZoneMaps.planFiles(store, "cl", "k", 100L, 300L)
    assert(total1 == 4, s"sorted rewrite must hit the target file count")
    assert(after.size < before.size && after.size < total1,
      s"clustered layout must admit strictly fewer files " +
        s"(${after.size} of $total1 vs ${before.size} of $total0)")
    assert(store.readRange("cl", "k", 100L, 300L)
      .select("k", "v").as[(Long, Double)].collect().toSet == plain,
      "pruning is I/O, never semantics — the answer must not move")
    // a further tick under the threshold is a no-op on the data table
    val rep2 = IndexMaintenance.maintainTable(store, "cl", Seq.empty,
      clusterCols = Seq("k"), maxDataFiles = 4)
    assert(rep2.data.exists(!_.compacted) && !rep2.zonesRebuilt,
      s"under-threshold tick must not rewrite: $rep2")
  }

  test("ZonePred.In: routed ≡ plain isin with one consult; past the cap it falls back to the plain scan (VERDICT r15 item 6)") {
    val store = freshStore()
    clustered(store, "t") // 8 k-ranged files, stats on k/tag/v
    import ZonePred._
    val total = store.read("t").get.inputFiles.length
    // covered IN (≤ cap): an OR of point admissions — files outside the
    // listed keys' ranges are skipped, the residual isin restores exact
    // membership
    val in = In("k", Seq(5L, 7L, 1900L))
    val routed = store.readWhereExpr("t", in)
    assert(routed.inputFiles.length < total,
      s"IN must prune (${routed.inputFiles.length} of $total)")
    assert(routed.select("k").as[Long].collect().sorted.toSeq ==
      Seq(5L, 7L, 1900L))
    // under an AND, the In composes like any leaf
    val mixed = And(Seq(Range("k", 1L, 100L), In("k", Seq(5L, 7L, 1900L))))
    assert(store.readWhereExpr("t", mixed)
      .select("k").as[Long].collect().sorted.toSeq == Seq(5L, 7L))
    // past the cap the leaf is uncovered → the PLAIN scan answers. The
    // stale-manifest trick proves the path taken: rewrite the table
    // without healing — a routed consult would fail LOUD, the plain
    // scan answers silently
    store.replace("t", store.read("t").get.repartition(3))
    val big = In("k", (1L to (ZoneMaps.InAdmissionCap + 1).toLong).toSeq)
    assert(store.readWhereExpr("t", big).select("k").as[Long]
      .collect().sorted.toSeq == (1L to 51L).toSeq,
      "an over-cap IN must take the plain path (no consult, no staleness)")
    val small = In("k", Seq(5L))
    val e = intercept[RuntimeException] { store.readWhereExpr("t", small) }
    assert(e.getMessage.contains("STALE"),
      "…while a covered IN still consults (and fails loud on staleness)")
  }

  test("compactZOrder prunes BOTH dimensions where the lexicographic sort clusters only its leading column") {
    val store = freshStore()
    // two near-independent dimensions (g = k·7919 mod 10000 scatters g
    // uniformly against k), interleaved base layout
    val df = (1 to 10000).map(i =>
      (i.toLong, (i * 7919L) % 10000L, i * 1.0)).toDF("k", "g", "v")
    def relay(): Unit = ZoneMaps.maintain(store, "z2", Seq("k", "g"))
    store.replace("z2", df.repartition(16))
    ZoneMaps.build(store, "z2", Seq("k", "g"))
    def admits(c: String, lo: Long, hi: Long): Int =
      ZoneMaps.planFiles(store, "z2", c, lo, hi)._1.size
    val total = store.read("z2").get.inputFiles.length
    assert(total == 16)
    // narrow 3% slabs on each dimension
    assert(admits("k", 4000L, 4300L) == total, "interleaved: k admits all")
    assert(admits("g", 4000L, 4300L) == total, "interleaved: g admits all")
    val exactK = store.read("z2").get
      .filter(col("k").between(4000L, 4300L)).select("k", "g", "v")
      .as[(Long, Long, Double)].collect().toSet
    val exactG = store.read("z2").get
      .filter(col("g").between(4000L, 4300L)).select("k", "g", "v")
      .as[(Long, Long, Double)].collect().toSet
    // lexicographic (k, g): k prunes hard, g not at all — every file
    // still spans the full g range
    store.compactSorted("z2", Seq("k", "g"), targetFiles = 16)
    relay()
    assert(admits("k", 4000L, 4300L) < total / 2, "lex: k prunes")
    assert(admits("g", 4000L, 4300L) == total,
      "lex: the SECOND sort column cannot prune — the gap z-order closes")
    // z-order: BOTH dimensions prune, answers identical on both
    store.compactZOrder("z2", "k", "g", targetFiles = 16)
    relay()
    val zk = admits("k", 4000L, 4300L); val zg = admits("g", 4000L, 4300L)
    assert(zk < total && zg < total, s"z-order must prune both ($zk, $zg of $total)")
    assert(ZoneMaps.prunedReadRange(store, "z2", "k", 4000L, 4300L)
      .select("k", "g", "v").as[(Long, Long, Double)].collect().toSet == exactK)
    assert(ZoneMaps.prunedReadRange(store, "z2", "g", 4000L, 4300L)
      .select("k", "g", "v").as[(Long, Long, Double)].collect().toSet == exactG)
  }

  test("clusteringDepth reads decay from the manifest; the depth trigger fires on an interleaved layout and sleeps on a sorted one") {
    val store = freshStore()
    val df = (1 to 4000).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
    // sorted layout: files disjoint in k → depth ≈ 1
    store.replace("dp", df.repartitionByRange(8, col("k"))
      .sortWithinPartitions(col("k")))
    ZoneMaps.build(store, "dp", Seq("k"))
    val dSorted = ZoneMaps.clusteringDepth(store, "dp", "k")
    assert(dSorted < 1.5, s"sorted layout must read ≈1, got $dSorted")
    // interleaved: every file spans the range → depth ≈ fileCount
    store.replace("dp", df.repartition(8))
    ZoneMaps.maintain(store, "dp", Seq.empty)
    val dInter = ZoneMaps.clusteringDepth(store, "dp", "k")
    assert(dInter > 6.0, s"interleaved layout must read ≈fileCount, got $dInter")
    // the trigger: depth > threshold → sorted rewrite at the SAME file
    // count (maxDataFiles unset), manifest healed in the same tick
    val rep = IndexMaintenance.maintainTable(store, "dp", Seq.empty,
      clusterCols = Seq("k"), maxClusterDepth = 3.0)
    assert(rep.clusterDepth.exists(_ > 6.0) && rep.data.exists(_.compacted),
      s"depth rule must fire on the interleaved layout: $rep")
    assert(store.read("dp").get.inputFiles.length == 8,
      "depth-triggered rewrite keeps the file count")
    assert(ZoneMaps.clusteringDepth(store, "dp", "k") < 1.5,
      "…and restores the clustering the metric measures")
    // a sorted table does NOT trigger — no useless O(table) rewrite
    val rep2 = IndexMaintenance.maintainTable(store, "dp", Seq.empty,
      clusterCols = Seq("k"), maxClusterDepth = 3.0)
    assert(rep2.clusterDepth.exists(_ < 1.5) && rep2.data.exists(!_.compacted),
      s"a clustered table must sleep through the depth rule: $rep2")
    // string stats refuse the metric by name (widths need arithmetic)
    val sdf = (1 to 100).map(i => (f"s$i%04d", i)).toDF("tag", "n")
    store.replace("ds", sdf.repartition(2))
    ZoneMaps.build(store, "ds", Seq("tag"))
    val e = intercept[RuntimeException] {
      ZoneMaps.clusteringDepth(store, "ds", "tag")
    }
    assert(e.getMessage.contains("numeric"), e.getMessage)
  }

  test("duplicate root-relative file keys fail LOUDLY instead of silently dropping rows (ADVICE r15)") {
    val store = freshStore()
    clustered(store, "dup", n = 200, parts = 2)
    // plant a nested subdirectory named exactly like the table, holding
    // a file whose NAME collides with a live data file — the layout the
    // (name, length) attest cannot protect: both live files collapse to
    // one fileKey, freshness could pass symmetrically, and toLive would
    // map both stored paths onto one live file (dropped rows, no error)
    val dataFile = new java.io.File(new java.net.URI(
      store.read("dup").get.inputFiles.head))
    val nested = new java.io.File(dataFile.getParentFile, "dup")
    nested.mkdirs()
    java.nio.file.Files.copy(dataFile.toPath,
      nested.toPath.resolve(dataFile.getName))
    val e = intercept[RuntimeException] {
      ZoneMaps.planFiles(store, "dup", "k", 1L, 50L)
    }
    assert(e.getMessage.contains("collapse"), e.getMessage)
    val e2 = intercept[RuntimeException] {
      ZoneMaps.maintain(store, "dup", Seq.empty)
    }
    assert(e2.getMessage.contains("collapse"), e2.getMessage)
  }
}
