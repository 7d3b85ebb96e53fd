package graft

import org.apache.spark.sql.SparkSession

/** Per-JVM memoization of gate FIXTURES — the built indexes and staged
  * warehouses the registered queries probe (VERDICT r14 item 5 / next-
  * round item 1: q163/q92/q145-class gates each rebuilt their index
  * family from scratch on every invocation, so the bench's warmup + N
  * timed sweeps paid every build N+1 times and the driver's 172-gate
  * sweep stopped fitting its window).
  *
  * Scope and correctness:
  *  - The cache lives for ONE JVM only (a ConcurrentHashMap — nothing is
  *    reused across processes). `graft.Verify` runs in a fresh JVM and
  *    each gate once, so the CORRECTNESS gate still exercises every
  *    build path cold; only repeated invocations inside one process
  *    (the bench's sweeps, a spec suite) reuse.
  *  - Keys must fully determine the artifact: the builder id, the data
  *    directory, and every build parameter. Builds here are
  *    deterministic given (data, params) — seeded k-means, seeded
  *    hashes — so a reused fixture is bit-identical to a rebuilt one
  *    and gate results are unchanged (the sanctioned change is WHEN the
  *    build runs, never what the gate returns).
  *  - Read-only gates share the cached directory directly (and must
  *    treat it as read-only). MUTATING gates (append/delete/upsert
  *    lifecycles) take [[freshCopy]]: the base build is paid once per
  *    JVM, each invocation pays only a local file copy — the mutation
  *    path itself still runs end-to-end every time.
  */
object QueryFixtures {
  private val dirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val values =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, Any)]()
  /** Last writable copy handed out per key — see [[freshCopy]]. */
  private val lastCopy =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()
  /** Every directory this object ever created, reaped on JVM exit —
    * without it each bench invocation of a mutating gate leaked a full
    * warehouse copy into java.io.tmpdir for the life of the box
    * (VERDICT r15 item 3 / ADVICE r15). A Set, registered ONCE: one
    * hook walking the survivors beats a hook per directory. */
  private val created =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    created.forEach(deleteTree(_))))

  private def track(p: java.nio.file.Path): java.nio.file.Path = {
    created.add(p); p
  }

  /** Memoized on-disk fixture: `build` runs ONCE per key per JVM into a
    * fresh temp directory; later calls return the same directory.
    * Callers must not mutate it — mutators use [[freshCopy]]. A build
    * that THROWS leaves nothing behind (the half-built dir is deleted
    * before the rethrow, and computeIfAbsent maps no entry), so the next
    * call retries the build instead of serving a broken fixture. */
  def cachedDir(key: String)(build: String => Unit): String =
    dirs.computeIfAbsent(key, _ => {
      val dir = track(java.nio.file.Files.createTempDirectory("graft_fx_"))
      try build(dir.toString)
      catch { case e: Throwable =>
        deleteTree(dir); created.remove(dir); throw e }
      dir.toString
    })

  /** A fresh WRITABLE copy of the memoized fixture, for gates that
    * mutate state: base build once per JVM, a local file-tree copy per
    * invocation (milliseconds at gate scale vs seconds of rebuild).
    * Lifecycle: the copy is valid until the NEXT freshCopy call for the
    * same key — each call reaps the key's previous copy, so a bench
    * sweeping a mutating gate N times holds at most ONE live copy per
    * key instead of N; whatever survives at exit is reaped by the
    * shutdown hook. */
  def freshCopy(key: String)(build: String => Unit): String = {
    val base = java.nio.file.Paths.get(cachedDir(key)(build))
    val dst = track(java.nio.file.Files.createTempDirectory("graft_fxcp_"))
    copyTree(base, dst)
    val prev = lastCopy.put(key, dst)
    if (prev != null) { deleteTree(prev); created.remove(prev) }
    dst.toString
  }

  /** Memoized session-tied value (a trained codebook frame, a count):
    * rebuilt when requested from a DIFFERENT session — frames reference
    * session state and must not leak across sessions. */
  def memo[T](s: SparkSession, key: String)(f: => T): T =
    values.compute(key, (_, cur) =>
      if (cur != null && (cur._1 eq s)) cur else (s, f))._2.asInstanceOf[T]

  private def deleteTree(root: java.nio.file.Path): Unit =
    try {
      import java.nio.file._
      if (Files.exists(root)) {
        val stream = Files.walk(root)
        try stream.sorted(java.util.Comparator.reverseOrder())
          .forEach(Files.deleteIfExists(_))
        finally stream.close()
      }
    } catch { case _: Exception => () } // best-effort reaping

  private def copyTree(src: java.nio.file.Path,
                       dst: java.nio.file.Path): Unit = {
    import java.nio.file._
    val stream = Files.walk(src)
    try stream.forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else {
        Files.createDirectories(t.getParent)
        Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.COPY_ATTRIBUTES)
      }
    } finally stream.close()
  }
}
