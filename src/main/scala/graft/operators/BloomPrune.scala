package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the "runtime filter" pattern
  * (Spark's own InjectRuntimeFilter, Trino/Snowflake dynamic filters)
  * as an EXPLICIT operator: when a big probe side joins a selective
  * build side whose keys are too many to broadcast as an exact set but
  * few enough to sketch, build a bloom over the build keys as ONE
  * DISTRIBUTED aggregate (partial blooms per partition, OR-merge — no
  * driver collect of keys), broadcast the one-row bloom frame, and
  * drop probe rows inside the scan projection BEFORE they reach the
  * join exchange. The exact join still runs behind the filter, so
  * bloom false positives cost shuffle bytes, never correctness — the
  * result is bit-identical to the unpruned join.
  *
  * Why it matters at 100 TB: a probe-side shuffle is priced per byte
  * that leaves the scan. A 1% -selective build side with a 1% -fpp
  * bloom turns the probe exchange into ~2% of its unpruned volume for
  * the cost of one broadcast of `numBits/8` bytes. Spark's optimizer
  * injects this rewrite only under narrow heuristics
  * (spark.sql.optimizer.runtimeFilter.*, creation-side size caps);
  * this operator is the same machinery under caller control — both
  * halves ([[graft.plans.GraftExtensions]] `graft_bloom_agg` /
  * `graft_might_contain`) are Spark's own codegen'd expressions.
  *
  * Keys of any type participate via `xxhash64` (the insert and probe
  * sides hash identically); hash collisions are just bloom false
  * positives, removed by the exact join like any other. Null probe
  * keys never match an equi-join; [[pruned]] drops them explicitly
  * with an `isNotNull` conjunct — xxhash64(null) evaluates to the
  * seed constant, so without the conjunct a null row could pass
  * `might_contain` and ride the shuffle to the exact join (the
  * null-safe variant is out of contract). `estimatedItems` sizes the
  * bloom — pass the build side's approximate key cardinality;
  * internally capped by the runtime-filter size confs. */
object BloomPrune {

  /** The 1-row bloom frame over the build side's keys. Reusable across
    * several probes of the same build batch. */
  def bloomOf(build: DataFrame, buildKey: String,
              estimatedItems: Long): DataFrame = {
    require(estimatedItems > 0, s"estimatedItems must be > 0: $estimatedItems")
    build.select(call_function("graft_bloom_agg",
      xxhash64(col(buildKey)), lit(estimatedItems)).as("_bloom"))
  }

  /** `probe` filtered to rows whose key the bloom admits — a superset
    * of the rows with a real build-side match. The bloom frame rides
    * in as a SCALAR SUBQUERY (`Dataset.scalar()` — the constant-input
    * shape `might_contain` requires and the one Spark's own injected
    * runtime filters use): it executes once and its bytes reach every
    * probe task as a literal, so the filter sits in the scan
    * projection with no join node at all. */
  def pruned(probe: DataFrame, probeKey: String, bloom: DataFrame): DataFrame =
    probe.filter(col(probeKey).isNotNull &&
      call_function("graft_might_contain", bloom.scalar(),
        xxhash64(col(probeKey))))

  private def exact(probe: DataFrame, probeKey: String, build: DataFrame,
                    buildKey: String, estimatedItems: Long,
                    joinType: String): DataFrame = {
    val bloom = bloomOf(build, buildKey, estimatedItems)
    val p = pruned(probe, probeKey, bloom)
    // side-qualified references: probeKey and buildKey may share a name
    // (the natural call for a shared key column), where bare col()
    // would be ambiguous
    p.join(build, p(probeKey) === build(buildKey), joinType)
  }

  /** Exact left-semi join with the probe exchange bloom-pruned:
    * ≡ `probe.join(build, key, "left_semi")`. */
  def semiJoin(probe: DataFrame, probeKey: String, build: DataFrame,
               buildKey: String, estimatedItems: Long): DataFrame =
    exact(probe, probeKey, build, buildKey, estimatedItems, "left_semi")

  /** Exact inner join with the probe exchange bloom-pruned:
    * ≡ `probe.join(build, probeKey === buildKey)`. */
  def innerJoin(probe: DataFrame, probeKey: String, build: DataFrame,
                buildKey: String, estimatedItems: Long): DataFrame =
    exact(probe, probeKey, build, buildKey, estimatedItems, "inner")
}
