package graft.operators

/** Tiny synchronized LRU (access-ordered LinkedHashMap with
  * removeEldestEntry) for bounded per-JVM memoization — replaces the
  * wholesale `clear()`-at-cap eviction the v2 admission cache shipped
  * with in r15 (VERDICT r15 item 5 / nit 2: a steady mixed workload
  * crossing the cap re-paid EVERY table's manifest read at once; LRU
  * evicts only the coldest entry, so hot tables' admissions survive cap
  * crossings). Coarse `synchronized` is the right tool here: entries are
  * planning-time artifacts touched a handful of times per query, never a
  * hot loop — correctness over cleverness. */
private[graft] final class BoundedLruCache[K, V](capacity: Int) {
  require(capacity > 0, "LRU capacity must be positive")

  private val map = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      this.size() > capacity
  }

  /** null when absent (mirrors Map.get — callers are Java-interop style
    * hot paths that avoid an Option allocation per lookup). Refreshes
    * the entry's recency. */
  def get(k: K): V = map.synchronized(map.get(k))

  def put(k: K, v: V): Unit = map.synchronized { map.put(k, v); () }

  /** Existing value, or `mk` inserted and returned — atomic under the
    * same lock as every other access. */
  def getOrPut(k: K)(mk: => V): V = map.synchronized {
    val cur = map.get(k)
    if (cur != null) cur else { val v = mk; map.put(k, v); v }
  }

  /** Point-in-time copy of the entries (iteration outside the lock). */
  def snapshot: Seq[(K, V)] = map.synchronized {
    val b = Seq.newBuilder[(K, V)]
    map.forEach((k, v) => b += ((k, v)))
    b.result()
  }

  def size: Int = map.synchronized(map.size())

  def containsKey(k: K): Boolean = map.synchronized(map.containsKey(k))
}
