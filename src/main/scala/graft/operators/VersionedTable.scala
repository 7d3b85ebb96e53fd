package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Manifest-versioned table: every commit is a new immutable data
  * directory plus a tiny manifest file whose atomic rename IS the
  * commit — the metadata-level versioning move of the lakehouse table
  * formats (Delta/Iceberg), reduced to its load-bearing core:
  *
  *   - **Snapshot isolation**: a reader resolves a manifest once and
  *     then reads immutable files; concurrent commits cannot change or
  *     delete anything under it (data dirs are only removed by
  *     [[prune]], which never touches retained versions).
  *   - **Time travel**: [[read]] takes any retained version;
  *     [[asOf]] resolves a commit timestamp — "train on the corpus
  *     exactly as it stood before Tuesday's ingest" is a first-class
  *     read, which is the reproducibility primitive a training-data
  *     pipeline actually needs.
  *   - **Atomic publish**: the manifest (`v<k>.json`) is staged and
  *     renamed into place; a crash mid-commit leaves an orphan data dir
  *     (swept by [[prune]]) and NO manifest — the table is simply still
  *     at its previous version. There is no swap window at all, unlike
  *     dir-swap replacement ([[ParquetTableStore.replace]]), because
  *     data is never renamed over — only referenced.
  *
  * Layout under `<root>/<name>/`:
  *   `data/c<k>-<token>/part-*.parquet` — immutable files of commit k
  *     (writer-unique token: concurrent committers never share a dir)
  *   `manifests/v<k>.json`              — {version, dir, ts, rows}
  *
  * Complement, not replacement, of [[ParquetTableStore]]: the store
  * gives keyed row-level MERGE on a single live version; this gives
  * multi-version reads of replace-style publishes (state snapshots,
  * corpus freezes, dimension history). Differencing two versions is
  * exactly [[SnapshotDiff.diff]]'s contract.
  */
class VersionedTable(spark: SparkSession, root: String, name: String) {

  private val base = s"$root/$name"
  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir = new Path(s"$base/manifests")

  /** Data dirs are writer-unique: `c<k>-<token>`. Two concurrent
    * commits of version k write DIFFERENT directories and the manifest
    * rename alone picks the winner — without the token they would both
    * write `c<k>` and the winner's manifest could reference the loser's
    * (or a half-deleted) directory. The loser's dir becomes an
    * unreferenced orphan, swept by [[prune]] after its grace period. */
  private def newDataDir(k: Int): String =
    s"$base/data/c$k-${java.util.UUID.randomUUID().toString.take(8)}"

  /** Retained versions, ascending (a manifest file = a committed version). */
  def versions: Seq[Int] = {
    val d = manifestDir
    val f = fs(d)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt }
      .sorted.toSeq
  }

  def latestVersion: Option[Int] = versions.lastOption

  private def manifest(k: Int): Map[String, String] = {
    val p = new Path(s"$base/manifests/v$k.json")
    val in = fs(p).open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // one flat {"key":"value"|number} line, written by commit() below
    """"(\w+)"\s*:\s*(?:"([^"]*)"|(-?\d+))""".r.findAllMatchIn(txt).map { m =>
      m.group(1) -> Option(m.group(2)).getOrElse(m.group(3))
    }.toMap
  }

  /** Commit `df` as the next version; returns the version number. The
    * data directory is written first (invisible — no manifest refers to
    * it), then the manifest is staged and RENAMED into place: rename is
    * the only mutation, so every observable state is either "version k
    * absent" or "version k complete". `ts` is the commit timestamp
    * recorded for [[asOf]] — injectable for deterministic tests. */
  def commit(df: DataFrame, ts: Long = System.currentTimeMillis()): Int = {
    val k = latestVersion.map(_ + 1).getOrElse(0)
    val dir = newDataDir(k) // writer-unique: never collides, never overwrites
    ParquetTableStore.withMicrosTimestamps(df.sparkSession) {
      df.write.mode(SaveMode.ErrorIfExists).parquet(dir)
    }
    val rows = spark.read.parquet(dir).count()
    val rel = dir.stripPrefix(s"$base/")
    val mf = s"""{"version":$k,"dir":"$rel","ts":$ts,"rows":$rows}"""
    val mdir = manifestDir
    val f = fs(mdir)
    f.mkdirs(mdir)
    val tmp = new Path(s"$base/manifests/_tmp_v${k}_${java.util.UUID.randomUUID().toString.take(8)}.json")
    val out = f.create(tmp, true)
    try out.write(mf.getBytes("UTF-8")) finally out.close()
    val dst = new Path(s"$base/manifests/v$k.json")
    if (!f.rename(tmp, dst)) {
      // lost the race: this writer's manifest AND data dir are garbage —
      // clean both so the loser leaves no orphan at all
      f.delete(tmp, true)
      f.delete(new Path(dir), true)
      sys.error(s"concurrent commit of $name v$k lost the rename race")
    }
    k
  }

  /** Read a specific version (default: latest). Fails loudly on a
    * version that never existed or was pruned. */
  def read(version: Option[Int] = None): DataFrame = {
    val k = version.orElse(latestVersion).getOrElse(
      sys.error(s"versioned table '$name' has no commits"))
    val m = manifest(if (versions.contains(k)) k else
      sys.error(s"versioned table '$name' has no version $k " +
        s"(retained: ${versions.mkString(", ")})"))
    spark.read.parquet(s"$base/${m("dir")}")
  }

  /** The latest version committed at or before `ts` — time travel by
    * timestamp ("the corpus as of Monday 09:00"). */
  def asOf(ts: Long): DataFrame = {
    val k = versions.filter(v => manifest(v)("ts").toLong <= ts).lastOption
      .getOrElse(sys.error(
        s"versioned table '$name' has no version at or before ts $ts"))
    read(Some(k))
  }

  /** Drop all but the newest `keepLast` versions: pruned manifests are
    * removed FIRST (the version disappears atomically), then their data
    * dirs — plus any orphan data dir no retained manifest references
    * (crash residue, rename-race losers). Orphans younger than
    * `graceMillis` are SPARED: an unreferenced dir may be an IN-FLIGHT
    * commit that has written data but not yet renamed its manifest, and
    * sweeping it would let that commit "succeed" pointing at deleted
    * files. The default grace comfortably exceeds any commit's
    * write-to-rename window; tests pass 0 to sweep immediately. */
  def prune(keepLast: Int, graceMillis: Long = 3600000L): Seq[Int] = {
    require(keepLast >= 1, "must retain at least one version")
    val vs = versions
    val dropped = vs.dropRight(keepLast)
    val f = fs(manifestDir)
    dropped.foreach { k =>
      f.delete(new Path(s"$base/manifests/v$k.json"), false)
    }
    // re-resolve post-delete; retained dirs come from the manifests
    // themselves (basename of their "dir"), not a naming convention
    val retainedDirs = versions.map(k => manifest(k)("dir").split('/').last).toSet
    val now = System.currentTimeMillis()
    val dd = new Path(s"$base/data")
    if (f.exists(dd)) f.listStatus(dd).foreach { st =>
      if (!retainedDirs.contains(st.getPath.getName) &&
          now - st.getModificationTime >= graceMillis)
        f.delete(st.getPath, true)
    }
    dropped
  }
}
