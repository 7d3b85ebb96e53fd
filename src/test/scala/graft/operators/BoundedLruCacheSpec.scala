package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Eviction contract of the v2 admission cache's backing store (VERDICT
  * r15 item 5): the r15 shape cleared the WHOLE cache at the cap, so a
  * steady mixed workload crossing 512 entries re-paid every table's
  * manifest read at once; LRU must evict only the coldest entry and a
  * get must refresh recency, so hot tables' admissions survive cap
  * crossings. */
class BoundedLruCacheSpec extends AnyFunSuite {

  test("entry capacity+1 evicts ONLY the coldest; everything else survives") {
    val c = new BoundedLruCache[Int, String](512)
    (1 to 512).foreach(i => c.put(i, s"v$i"))
    assert(c.size == 512)
    c.put(513, "v513")
    assert(c.size == 512, "the cap holds")
    assert(c.get(1) == null, "the coldest entry (1) is the one evicted")
    assert((2 to 513).forall(i => c.get(i) == s"v$i"),
      "every other entry survives the cap crossing — the r15 clear() " +
        "would have dropped all 512")
  }

  test("a get refreshes recency: a hot entry outlives colder ones") {
    val c = new BoundedLruCache[Int, String](3)
    c.put(1, "a"); c.put(2, "b"); c.put(3, "c")
    assert(c.get(1) == "a") // 1 is now the HOTTEST; 2 the coldest
    c.put(4, "d")
    assert(c.get(2) == null, "2 (coldest) evicted")
    assert(c.get(1) == "a" && c.get(3) == "c" && c.get(4) == "d")
  }

  test("put of an existing key updates in place without eviction") {
    val c = new BoundedLruCache[Int, String](2)
    c.put(1, "a"); c.put(2, "b")
    c.put(1, "a2")
    assert(c.size == 2 && c.get(1) == "a2" && c.get(2) == "b")
  }
}
