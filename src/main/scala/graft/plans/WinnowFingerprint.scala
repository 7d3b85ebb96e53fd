package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer, Wilkerson, Aiken: "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003 — public
  * algorithm): rolling polynomial hashes of every k-char gram, then one
  * selected hash (the minimum, rightmost-on-ties) per window of w
  * consecutive gram hashes. Guarantees: any shared substring of length
  * >= k + w - 1 between two documents yields at least one shared selected
  * fingerprint — the property that makes fingerprint-equality a sound
  * candidate join key for near-dup detection at scale.
  *
  * Output: distinct selected hashes in document order (ArrayType(LongType)).
  * The per-row work is a tight JVM loop over the UTF8 bytes; CodegenFallback
  * only costs a virtual call per row, not per char — acceptable off the
  * per-element hot path (unlike VecDot/VecLshSketch which run per pair).
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 2 && w >= 1, s"need k>=2, w>=1; got k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  private val Base = 257L

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) {
      // shorter than one gram: fingerprint = hash of the whole content
      var h = 0L
      var i = 0
      while (i < n) { h = h * Base + (bytes(i) & 0xFF); i += 1 }
      return new GenericArrayData(Array(h))
    }
    // rolling hashes of all k-grams (mod 2^64 via natural overflow)
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    var pow = 1L // Base^(k-1)
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xFF); i += 1 }
    hashes(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - (bytes(i - 1) & 0xFF) * pow) * Base + (bytes(i + k - 1) & 0xFF)
      hashes(i) = h
      i += 1
    }
    // winnow: min (rightmost on ties) per window of w gram hashes
    val selected = scala.collection.mutable.LinkedHashSet[Long]()
    val nWin = math.max(nGrams - w + 1, 1)
    var win = 0
    while (win < nWin) {
      var minIdx = win
      var j = win + 1
      val end = math.min(win + w, nGrams)
      while (j < end) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
      selected += hashes(minIdx)
      win += 1
    }
    new GenericArrayData(selected.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rolling k-char-gram hashes of a string — [[WinnowFingerprint]]'s gram
  * stage without the winnowing selection. Exact set semantics: two
  * documents' hash sets intersect exactly where their k-gram sets do (64-bit
  * rolling hash; collision odds are ~|grams|²/2⁶⁴ for k where grams exceed
  * 8 bytes, and exactly ZERO for k <= 8 — base-257 over bytes < 257 is an
  * injective positional encoding there). Immaterial next to the measured
  * cost of materializing every k-char substring as a string — building
  * string gram arrays for exact-Jaccard verify was 3.1 s vs ~0.3 s hashed,
  * sf0.1. With `distinct` (the default): SORTED distinct hashes (sort+dedup
  * over a primitive array, no boxing). With distinct=false: every gram
  * occurrence in document order — the multiset, for occurrence-weighted
  * scoring like n-gram language ID. Either way the array is empty for
  * strings shorter than k — matching the `length(t) >= k` guard oracle SQL
  * uses, so a short doc pairs with nothing.
  *
  * Two window units:
  *  - `overChars = false` (default): windows slide over UTF-8 BYTES with
  *    the base-257 positional encoding — exactly injective for grams of
  *    <= 8 bytes. Right for exact-match joins against ASCII keys (the
  *    language-ID profile): ASCII bytes never occur inside a multi-byte
  *    UTF-8 sequence, so a byte window equals an ASCII key iff the char
  *    window does.
  *  - `overChars = true`: windows slide over CHARACTERS (FNV-prime rolling
  *    hash; set-equal to char substrings w.h.p.). Required when the gram
  *    SET SIZES enter a score compared against substring semantics —
  *    byte windows would count extra windows inside multi-byte chars and
  *    shift Jaccard on any non-ASCII document. */
case class CharGramHashes(child: Expression, k: Int, distinct: Boolean = true,
                          overChars: Boolean = false)
  extends UnaryExpression with CodegenFallback {

  require(k >= 2, s"need k>=2; got k=$k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_gram_hashes expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  private val ByteBase = 257L
  private val CharBase = 0x100000001B3L // FNV-64 prime; odd => invertible mod 2^64

  private def dedup(hashes: Array[Long], n: Int): GenericArrayData = {
    if (!distinct) return new GenericArrayData(
      if (n == hashes.length) hashes else java.util.Arrays.copyOf(hashes, n))
    java.util.Arrays.sort(hashes, 0, n)
    var out = 1
    var i = 1
    while (i < n) {
      if (hashes(i) != hashes(i - 1)) { hashes(out) = hashes(i); out += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hashes, out))
  }

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    if (overChars) evalChars(u.toString) else evalBytes(u.getBytes)
  }

  private def evalBytes(bytes: Array[Byte]): Any = {
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    var pow = 1L
    var i = 1
    while (i < k) { pow *= ByteBase; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * ByteBase + (bytes(i) & 0xFF); i += 1 }
    hashes(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - (bytes(i - 1) & 0xFF) * pow) * ByteBase + (bytes(i + k - 1) & 0xFF)
      hashes(i) = h
      i += 1
    }
    dedup(hashes, nGrams)
  }

  private def evalChars(s: String): Any = {
    val n = s.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    var pow = 1L
    var i = 1
    while (i < k) { pow *= CharBase; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * CharBase + s.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - s.charAt(i - 1) * pow) * CharBase + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    dedup(hashes, nGrams)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
