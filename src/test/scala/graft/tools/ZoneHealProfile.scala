package graft.tools

import org.apache.spark.sql.functions._

/** Component-level timing for the zone-map heal path against the smoke's
  * leftover 10k-file table — run after ZoneMapsScaleSmoke to attribute a
  * slow heal to its actual component.
  *
  * Run: sbt 'Test/runMain graft.tools.ZoneHealProfile [warehouse]' */
object ZoneHealProfile {
  def main(args: Array[String]): Unit = {
    val wh = if (args.nonEmpty) args(0) else "/tmp/graft_zonesmoke_wh"
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val store = new graft.operators.ParquetTableStore(spark, wh)

    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime
      val r = f
      println(f"[prof] $name: ${(System.nanoTime - s) / 1e9}%.2f s")
      r
    }

    val live = t("store.read(many)") { store.read("many").get }
    t("live.inputFiles (listing)") { live.inputFiles.length }
    t("listDataFiles(many)") { store.listDataFiles("many").size }
    t("listDataFiles(many) again") { store.listDataFiles("many").size }
    val zones = t("store.read(many_zones)") { store.read("many_zones").get }
    t("zones (_file,_size) collect (cold)") {
      zones.select(col("_file"), col("_size")).collect().length
    }
    t("zones (_file,_size) collect (warm)") {
      zones.select(col("_file"), col("_size")).collect().length
    }
    t("zones _file-only collect") {
      zones.select(col("_file")).collect().length
    }
    t("zones max(_bloom_items)") {
      zones.select(max(col("_bloom_items"))).head()
    }
    t("pointAdmitFrame collect (distributed bloom probe)") {
      graft.operators.ZoneMaps.pointAdmitFrame(zones, "k",
        xxhash64(lit(4242L).cast("long"))).collect().length
    }
    t("count(*) over the 10k-file table (scan task packing)") {
      live.count()
    }
    t("zoneRows-shaped aggregate over 10 files (the heal's scan)") {
      val ten = live.inputFiles.take(10)
      spark.read.schema(live.schema).parquet(ten: _*)
        .groupBy(col("_metadata.file_path")).agg(count(lit(1))).collect().length
    }
    t("maintain (fresh: attest only)") {
      graft.operators.ZoneMaps.maintain(store, "many", Seq.empty)
    }
    t("prunedReadPoint end-to-end (attest + admit + read, 10k files)") {
      graft.operators.ZoneMaps.prunedReadPoint(store, "many", "k", 4242L)
        .count()
    }
    spark.stop()
  }
}
