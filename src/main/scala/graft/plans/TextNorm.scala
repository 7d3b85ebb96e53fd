package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC composition as a static kernel — the canonical-form step
  * of corpus text cleanup (a crawl mixes precomposed `é` with
  * `e`+U+0301; fingerprints, shingles and equality joins must see ONE
  * byte sequence for one grapheme, or exact dedup silently misses
  * visually-identical duplicates).
  *
  * The fast path matters at corpus scale: `Normalizer.isNormalized` is a
  * scan without allocation, and real training text is overwhelmingly
  * already-NFC (all ASCII is), so the common row costs one check and
  * returns the INPUT UTF8String untouched — no decode, no re-encode.
  * Only rows that actually carry decomposed sequences pay the normalize
  * allocation. Value-parity with DuckDB's utf8proc `nfc_normalize` is
  * what makes the expression oracle-replayable (gate q158): both
  * implement Unicode canonical composition, which is stable across
  * versions for assigned code points. */
object TextNormImpl {
  private val NFC = java.text.Normalizer.Form.NFC

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, NFC))
  }
}

/** `graft_nfc(string)` — null-safe NFC composition; registered in
  * [[GraftExtensions]]. Real doGenCode (the [[JaroWinkler]] rationale):
  * it runs inside the scan projection of every corpus pass that wants
  * clean text, and a CodegenFallback there would de-codegen the whole
  * projection stage. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc needs a string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(v: Any): Any =
    TextNormImpl.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TextNormImpl.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
