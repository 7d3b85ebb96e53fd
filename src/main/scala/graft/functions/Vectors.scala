package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * Spark's higher-order functions (zip_with/aggregate/transform) — no UDFs,
  * no driver-side collects.
  *
  * Math is done in DOUBLE (floats are cast element-wise, accumulation is a
  * sequential left fold) so results are deterministic and reproducible in
  * the DuckDB oracle.
  */
object Vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Codegen'd native dot product ([[graft.plans.VecDot]], registered by
    * GraftExtensions) — bit-identical results to [[dot]] (same sequential
    * double fold), ~orders faster per row on the ANN hot path. */
  def dotNative(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Native multi-table LSH sketch: array of nTables bucket codes. */
  def lshSketch(vec: Column, nBits: Int, nTables: Int): Column =
    call_function("vec_lsh_sketch", vec, lit(nBits), lit(nTables))

  def normL2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (normL2(a) * normL2(b))

  /** Sign bit (0/1) of the projection of `vec` onto deterministic pseudo-random
    * hyperplane `j`: component i is ±1 derived from xxhash64(j, i). Stable
    * across executors/runs — no RNG state to ship. */
  def hyperplaneBit(vec: Column, j: Int): Column = {
    val proj = aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast("double") *
          when(pmod(xxhash64(lit(j), i), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))),
      lit(0.0), (acc, v) => acc + v)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  /** Random-hyperplane LSH bucket code from `nBits` sign bits (hyperplanes
    * are disjoint per `table` so multiple independent hash tables can be
    * built). Vectors with high cosine land in the same bucket with high
    * probability; the bucket code is a shuffle key, so candidate generation
    * is a hash join, not an all-pairs cross product — the 100 TB path. */
  def lshBucket(vec: Column, nBits: Int, table: Int = 0): Column =
    (0 until nBits).map(j => hyperplaneBit(vec, table * nBits + j) * lit(1 << j))
      .reduce(_ + _)
}
