package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Lifecycle contract of the per-JVM gate-fixture cache (VERDICT r15
  * item 3 / ADVICE r15): the r15 shape never reclaimed its temp trees —
  * each bench invocation of a mutating gate leaked a full warehouse copy
  * into java.io.tmpdir for the life of the box, and a build that threw
  * inside computeIfAbsent leaked its half-built dir AND pinned no entry
  * retry could fix. No SparkSession needed: the cache is pure file
  * plumbing. */
class QueryFixturesSpec extends AnyFunSuite {

  private def uniq(tag: String) = s"qfspec_${tag}_${System.nanoTime()}"

  test("cachedDir builds once per key and returns the same directory") {
    var builds = 0
    val key = uniq("once")
    def get() = QueryFixtures.cachedDir(key) { dir =>
      builds += 1
      Files.write(Paths.get(dir, "marker"), "x".getBytes("UTF-8"))
    }
    val a = get(); val b = get()
    assert(a == b && builds == 1)
    assert(Files.exists(Paths.get(a, "marker")))
  }

  test("a build that throws leaves no directory behind and the next call retries") {
    val key = uniq("throw")
    var attempts = 0
    var firstDir: String = null
    val e = intercept[RuntimeException] {
      QueryFixtures.cachedDir(key) { dir =>
        attempts += 1; firstDir = dir
        sys.error("synthetic build failure")
      }
    }
    assert(e.getMessage.contains("synthetic"))
    assert(!Files.exists(Paths.get(firstDir)),
      "the half-built dir must be deleted before the rethrow")
    // the failure pinned no entry: the next call RETRIES the build
    val ok = QueryFixtures.cachedDir(key) { dir =>
      attempts += 1
      Files.write(Paths.get(dir, "marker"), "y".getBytes("UTF-8"))
    }
    assert(attempts == 2 && Files.exists(Paths.get(ok, "marker")))
  }

  test("freshCopy reaps the key's previous copy: at most one live copy per key") {
    val key = uniq("copy")
    def build(dir: String): Unit =
      Files.write(Paths.get(dir, "base"), "b".getBytes("UTF-8"))
    val c1 = QueryFixtures.freshCopy(key)(build)
    assert(Files.exists(Paths.get(c1, "base")))
    // mutate the copy — the base and later copies must not see it
    Files.write(Paths.get(c1, "mutation"), "m".getBytes("UTF-8"))
    val c2 = QueryFixtures.freshCopy(key)(build)
    assert(c2 != c1)
    assert(!Files.exists(Paths.get(c1)),
      "requesting a new copy must reap the previous one (the r15 leak)")
    assert(Files.exists(Paths.get(c2, "base")) &&
      !Files.exists(Paths.get(c2, "mutation")),
      "each copy starts from the pristine base")
    // the shared base fixture itself is untouched and still cached
    val base = QueryFixtures.cachedDir(key)(build)
    assert(Files.exists(Paths.get(base, "base")) &&
      !Files.exists(Paths.get(base, "mutation")))
  }
}
