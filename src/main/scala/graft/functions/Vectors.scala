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

  /** Multi-table random-hyperplane LSH sketch: array of nTables bucket
    * codes of nBits sign bits each ([[graft.plans.VecLshSketch]], the ONLY
    * bucket-code implementation — sketches from any call site are mutually
    * compatible). A bucket code is a shuffle key: vectors with high cosine
    * land in the same bucket with high probability, so candidate generation
    * is a hash join, never an all-pairs cross product — the 100 TB path. */
  def lshSketch(vec: Column, nBits: Int, nTables: Int): Column =
    call_function("vec_lsh_sketch", vec, lit(nBits), lit(nTables))

  def normL2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (normL2(a) * normL2(b))

  // ------------------------------------------------- int8 quantization
  // Symmetric per-vector quantization — the storage/bandwidth lever for
  // ANN at corpus scale (4x smaller vectors, SIMD-friendly int math).
  // scale = max|v_i| / 127, q_i = round(v_i / scale); reconstruction error
  // per element is bounded by scale/2. Callers must alias the scale to an
  // attribute before passing it into the per-element lambdas (the O(dim²)
  // HOF duplication trap — LangId.scala).

  /** Per-vector quantization scale (floored at 1e-12 so an all-zero vector
    * quantizes to zeros instead of dividing by zero). */
  def int8Scale(v: Column): Column =
    greatest(
      aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double")))),
      lit(1e-12)) / lit(127.0)

  /** Quantize to int codes in [-127, 127]. */
  def int8Quantize(v: Column, scale: Column): Column =
    transform(v, x => round(x.cast("double") / scale).cast("int"))

  /** Reconstruct doubles from codes. */
  def int8Dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)
}
