package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity (Winkler 1990) as a shared static kernel:
  * the edit-distance family's transposition-tolerant member, the
  * standard name-matching scorer in record linkage — "marhta" vs
  * "martha" scores 0.961 where Levenshtein charges 2 full edits.
  *
  * Standard parameterization (match window ⌊max/2⌋−1, prefix scale
  * 0.1 over at most 4 chars, boost threshold 0.7) — verified
  * value-identical to DuckDB's `jaro_winkler_similarity` including
  * the empty-string convention (either side empty → 0.0, EVEN for two
  * empties), so the expression is oracle-replayable. Comparison is by
  * UTF-8 BYTE, directly on the UTF8String buffer — no String
  * decode/allocation per row (measured on the blocked-pair join),
  * ASCII-exact, and the same unit DuckDB's byte-wise implementation
  * compares. */
object JaroWinklerImpl {

  def similarity(s1: String, s2: String): Double =
    similarity(s1.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      s2.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def similarity(a: Array[Byte], b: Array[Byte]): Double = {
    val (l1, l2) = (a.length, b.length)
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(i + window + 1, l2)
      var j = math.max(i - window, 0)
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val transpositions = t / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - transpositions).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val maxPrefix = math.min(4, math.min(l1, l2))
      while (l < maxPrefix && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }
}

/** `jaro_winkler(left, right)` — null-safe, DoubleType; registered in
  * [[GraftExtensions]]. Implements doGenCode (NOT CodegenFallback): the
  * expression sits in the hot filter of a blocked self-JOIN stage, and
  * a fallback there de-codegens the whole 10⁶-pair stage — measured
  * ~2× on the q121 join — where a static call into the shared kernel
  * keeps the stage inside whole-stage codegen (the [[VecDot]]
  * rationale, not the [[SketchExpressions]] one). */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.similarity(a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaroWinklerImpl.similarity(" +
        s"$a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
