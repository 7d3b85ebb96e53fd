package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass sketches over a token array — the signature stages of MinHash
  * and SimHash as pure per-document expressions.
  *
  * Both reproduce the exact hash arithmetic of their DataFrame
  * formulations (`xxhash64` = XXH64 with seed 42, one chained step per
  * argument), asserted by property tests, so swapping formulations never
  * changes a sketch value. The point is the SHAPE: the composed pipelines
  * explode ~len(doc) rows per document into a 64-column aggregation — a
  * shuffle-adjacent stage proportional to corpus token count — while an
  * expression runs map-side inside the scan projection, leaving the
  * candidate join as the only shuffle. That is the right 100 TB shape for
  * a sketch: a function of one document needs no data movement.
  *
  * Per-row work is a tight JVM loop; CodegenFallback costs one virtual
  * call per ROW (not per token), the WinnowFingerprint tradeoff. */
object SketchExpressions {
  val Seed = 42L // Spark's xxhash64 default seed

  /** h = xxhash64(tokens[from], ..., tokens[until-1]) — the chained
    * multi-arg form; null elements leave the hash unchanged, like null
    * children of the xxhash64 expression. */
  private[plans] def hashTokens(arr: ArrayData, from: Int, until: Int): Long = {
    var h = Seed
    var i = from
    while (i < until) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, h)
      }
      i += 1
    }
    h
  }

  /** xxhash64(concat_ws(" ", tokens)) — the fewer-than-k-tokens fallback
    * of Similarity.shingleHashesOf. */
  private[plans] def hashJoined(arr: ArrayData, n: Int): Long = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // concat_ws skips nulls
        if (sb.length > 0) sb.append(' ')
        sb.append(arr.getUTF8String(i).toString)
      }
      i += 1
    }
    val s = UTF8String.fromString(sb.toString)
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
  }
}

/** MinHash signature of a token array in one pass: for every word
  * k-shingle, h0 = xxhash64(tokens...) (hash-combined, no shingle string);
  * permutation j = xxhash64(h0, j); signature[j] = min over shingles.
  * Value-identical to exploding Similarity.shingleHashesOf into 64 min
  * aggregates (min over the multiset equals min over the distinct set, so
  * no dedup is needed), with zero data movement. */
case class MinhashSig(child: Expression, k: Int, perms: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 1 && perms >= 1, s"need k>=1, perms>=1; got k=$k perms=$perms")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(perms)(Long.MaxValue)
    var pos = 0
    val nShingles = if (n >= k) n - k + 1 else 1
    while (pos < nShingles) {
      val h0 =
        if (n >= k) SketchExpressions.hashTokens(arr, pos, pos + k)
        else SketchExpressions.hashJoined(arr, n)
      val base = XXH64.hashLong(h0, SketchExpressions.Seed)
      var j = 0
      while (j < perms) {
        val hj = XXH64.hashInt(j, base) // = xxhash64(h0, j)
        if (hj < sig(j)) sig(j) = hj
        j += 1
      }
      pos += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array in one pass: each DISTINCT token votes
  * ±1 per bit of its xxhash64; the sign of each bit's vote sum is the
  * sketch bit. Value-identical to the explode → 64 bit-vote sums
  * formulation (distinctness by token hash rather than token text — a
  * difference only under a 64-bit collision). */
case class Simhash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val hashes = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        hashes(m) = SketchExpressions.hashTokens(arr, i, i + 1)
        m += 1
      }
      i += 1
    }
    java.util.Arrays.sort(hashes, 0, m)
    val votes = new Array[Int](64)
    var prev = 0L
    var first = true
    i = 0
    while (i < m) {
      val h = hashes(i)
      if (first || h != prev) { // distinct tokens vote once
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        prev = h
        first = false
      }
      i += 1
    }
    var sketch = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sketch |= (1L << b)
      b += 1
    }
    sketch
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
