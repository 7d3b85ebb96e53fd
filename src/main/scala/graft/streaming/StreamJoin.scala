package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval joins — the attribution shape ("purchase
  * within H of the click that led to it") that completes the streaming
  * surface next to aggregation ([[Incremental]]), dedup
  * ([[StreamingDedup]]) and custom state ([[Sessionize]]).
  *
  * Spark's micro-batch engine buffers BOTH sides in state and emits
  * matches as they arrive; without bounds that state grows forever.
  * The interval condition
  *
  *   rightTs ∈ [leftTs, leftTs + horizon]
  *
  * plus a watermark on each side is exactly what the engine needs to
  * derive eviction: a left row is droppable once the right watermark
  * passes leftTs + horizon, a right row once the left watermark passes
  * rightTs. State is then bounded by horizon + watermark delay worth
  * of rows per key — the 100 TB/day requirement is a bounded horizon,
  * never an unconditioned stream-stream join. The same call runs
  * unchanged on static frames (Spark's unified Dataset API), which is
  * how the spec pins stream ≡ batch. */
object StreamJoin {

  /** Inner equi+interval join: rows of `right` within
    * `[leftTs, leftTs + horizon]` of a matching `left` row. Both
    * inputs MUST already carry `withWatermark` when streaming (the
    * watermark must be attached before the join — a post-join
    * watermark cannot bound join state). Column names must be
    * disjoint apart from `keyCols`. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTsCol: String, rightTsCol: String,
                   horizon: String): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    // enforce the documented disjointness contract up front: overlapping
    // non-key names would silently produce duplicate output columns that
    // only fail later as ambiguous references downstream
    val overlap = left.columns.intersect(right.columns).toSet -- keyCols
    require(overlap.isEmpty,
      s"intervalJoin: non-key column names must be disjoint between the " +
        s"two sides, but both carry ${overlap.mkString(", ")} — rename or " +
        "drop them on one side before joining")
    val keyEq = keyCols.map(k => left(k) === right(k)).reduce(_ && _)
    val lo = right(rightTsCol) >= left(leftTsCol)
    val hi = right(rightTsCol) <= left(leftTsCol) + expr(s"INTERVAL $horizon")
    val joined = left.join(right, keyEq && lo && hi, "inner")
    // collapse the duplicated key columns to one copy
    val rightKeep = right.columns.filterNot(keyCols.contains)
    joined.select(keyCols.map(left(_)) ++
      left.columns.filterNot(keyCols.contains).map(left(_)) ++
      rightKeep.map(right(_)): _*)
  }
}
