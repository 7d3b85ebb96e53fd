package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Deterministic ±1 pseudo-random signs for hyperplane sketches, shared by
  * interpreted eval and generated code (object methods compile to static
  * forwarders, so codegen can call `graft.plans.GraftHash.sgn(...)`). */
object GraftHash {
  /** Sign of hyperplane j at dimension i — a 64-bit splitmix-style mix of
    * (j, i); stable across JVMs/executors (no RNG state). */
  def sgn(j: Int, i: Int): Double = {
    var h = (j.toLong * 100003L + i.toLong + 1L) * 0x9E3779B97F4A7C15L
    h ^= (h >>> 32)
    if ((h & 1L) == 0L) 1.0 else -1.0
  }
}

/** Native dot product over array<float|double> columns with whole-stage
  * codegen: a tight JIT'd loop instead of the interpreted per-element
  * lambdas of `aggregate(zip_with(...))`. Accumulation is the same
  * sequential left-to-right double fold, so results are bit-identical to
  * the higher-order-function formulation (and to the DuckDB oracle).
  *
  * At 100 TB the ANN scoring inner loop dominates similarity workloads;
  * keeping it inside WholeStageCodegen (no virtual calls, no boxing) is the
  * difference between compute-bound and interpreter-bound scans. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<float|double>, array<float|double>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  /** Divergent inputs degrade the same way the HOF formulation does:
    * mismatched lengths or a null element yield NULL (zip_with pads with
    * null → null product → null fold) — a truncated or corrupt embedding
    * must surface as NULL, not a plausible partial score. */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      val getA = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $getA * $getB;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native multi-table random-hyperplane LSH sketch: array of `nTables`
  * bucket codes (`nBits` sign bits each) in one codegen pass over the
  * vector — replaces nTables×nBits interpreted aggregate/zip_with lambda
  * evaluations per row. */
case class VecLshSketch(child: Expression, nBits: Int, nTables: Int)
  extends UnaryExpression {

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_lsh_sketch expects array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_lsh_sketch"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val fl = elemIsFloat
    val codes = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var code = 0L
      var j = 0
      while (j < nBits) {
        val hj = t * nBits + j
        var p = 0.0
        var i = 0
        while (i < dim) {
          val xv = if (fl) v.getFloat(i).toDouble else v.getDouble(i)
          p += xv * GraftHash.sgn(hj, i)
          i += 1
        }
        if (p >= 0) code |= (1L << j)
        j += 1
      }
      codes(t) = code
      t += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val t = ctx.freshName("t"); val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val dim = ctx.freshName("dim"); val codes = ctx.freshName("codes")
      val code = ctx.freshName("code"); val p = ctx.freshName("p"); val hj = ctx.freshName("hj")
      val get = if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $dim = $a.numElements();
         |long[] $codes = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $code = 0L;
         |  for (int $j = 0; $j < $nBits; $j++) {
         |    int $hj = $t * $nBits + $j;
         |    double $p = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) { $p += $get * graft.plans.GraftHash.sgn($hj, $i); }
         |    if ($p >= 0) $code |= (1L << $j);
         |  }
         |  $codes[$t] = $code;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
