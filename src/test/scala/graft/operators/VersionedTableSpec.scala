package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def newTable(tag: String) = new VersionedTable(spark,
    java.nio.file.Files.createTempDirectory(s"graft_vt_$tag").toString, "t")

  test("commit/read roundtrip and version numbering") {
    val vt = newTable("rt")
    assert(vt.versions.isEmpty && vt.latestVersion.isEmpty)
    assert(vt.commit(Seq((1, "a")).toDF("k", "s"), ts = 10L) == 0)
    assert(vt.commit(Seq((2, "b")).toDF("k", "s"), ts = 20L) == 1)
    assert(vt.versions == Seq(0, 1))
    assert(vt.read().as[(Int, String)].collect().toSet == Set((2, "b")))
    assert(vt.read(Some(0)).as[(Int, String)].collect().toSet == Set((1, "a")))
  }

  test("snapshot isolation: an old version's contents never change under new commits") {
    val vt = newTable("iso")
    vt.commit(Seq((1, 100L)).toDF("k", "v"), ts = 10L)
    val v0 = vt.read(Some(0)) // resolved BEFORE later commits
    (1 to 3).foreach(i => vt.commit(Seq((1, 100L + i)).toDF("k", "v"), ts = 10L + i))
    assert(v0.as[(Int, Long)].collect().toSet == Set((1, 100L)),
      "previously-resolved reader must see its snapshot")
    assert(vt.read(Some(0)).as[(Int, Long)].collect().toSet == Set((1, 100L)),
      "re-resolved v0 must be identical")
    assert(vt.read().as[(Int, Long)].collect().toSet == Set((1, 103L)))
  }

  test("asOf resolves the latest version at-or-before the timestamp") {
    val vt = newTable("asof")
    vt.commit(Seq(("v0", 0)).toDF("tag", "x"), ts = 100L)
    vt.commit(Seq(("v1", 1)).toDF("tag", "x"), ts = 200L)
    vt.commit(Seq(("v2", 2)).toDF("tag", "x"), ts = 300L)
    assert(vt.asOf(250L).select("tag").as[String].head() == "v1")
    assert(vt.asOf(200L).select("tag").as[String].head() == "v1") // inclusive
    assert(vt.asOf(99999L).select("tag").as[String].head() == "v2")
    val e = intercept[RuntimeException](vt.asOf(50L))
    assert(e.getMessage.contains("no version at or before"), e.getMessage)
  }

  test("prune drops old versions, keeps the rest readable, and reading a pruned version fails loudly") {
    val vt = newTable("prune")
    (0 until 4).foreach(i => vt.commit(Seq(i).toDF("x"), ts = i * 10L))
    assert(vt.prune(keepLast = 2, graceMillis = 0L) == Seq(0, 1))
    assert(vt.versions == Seq(2, 3))
    assert(vt.read(Some(2)).as[Int].head() == 2)
    val e = intercept[RuntimeException](vt.read(Some(0)))
    assert(e.getMessage.contains("no version 0"), e.getMessage)
  }

  test("a crashed commit (data dir, no manifest) is invisible and swept by prune") {
    val root = java.nio.file.Files.createTempDirectory("graft_vt_crash").toString
    val vt = new VersionedTable(spark, root, "t")
    vt.commit(Seq(1).toDF("x"), ts = 10L)
    // simulate a crash after the data write, before the manifest rename
    val orphan = new java.io.File(s"$root/t/data/c1-deadbeef")
    Seq(2).toDF("x").write.parquet(orphan.toString)
    assert(vt.latestVersion.contains(0), "orphan data dir must not be a version")
    assert(vt.read().as[Int].head() == 1)
    // within the grace window the orphan is SPARED (it could be an
    // in-flight commit about to rename its manifest)
    vt.prune(keepLast = 1)
    assert(orphan.exists(), "grace period must protect a fresh orphan")
    vt.prune(keepLast = 1, graceMillis = 0L)
    assert(!orphan.exists(), "past grace, prune must sweep the orphan dir")
    assert(vt.read().as[Int].head() == 1, "retained version untouched by the sweep")
  }
}
