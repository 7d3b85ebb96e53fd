package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Deterministic Gaussian hyperplane coefficients for LSH sketches, shared
  * by interpreted eval and generated code (object methods compile to static
  * forwarders, so codegen can call `graft.plans.GraftHash.gaussRow(...)`). */
object GraftHash {

  private def mix(x: Long): Long = {
    var h = x * 0x9E3779B97F4A7C15L
    h ^= (h >>> 30); h *= 0xBF58476D1CE4E5B9L
    h ^= (h >>> 27); h *= 0x94D049BB133111EBL
    h ^ (h >>> 31)
  }

  /** GAUSSIAN coefficient of hyperplane j at dimension i — deterministic
    * Box-Muller over two hash-derived uniforms; stable across
    * JVMs/executors (no RNG state).
    *
    * Gaussian (not ±1 Rademacher) coefficients are load-bearing for
    * recall math: only a rotation-invariant hyperplane distribution gives
    * P(plane separates a, b) = θ/π for EVERY pair. Under ±1 planes the
    * separation probability is pair-structure-dependent and was MEASURED
    * here to reach ~0.8 for specific cosine-0.4 embedding pairs — four
    * qualifying pairs missed all 32 tables (SimilaritySpec caught it);
    * with Gaussian planes the (1-(1-θ/π)^bits)-per-table bound holds and
    * the same configuration misses with probability < 1e-7. */
  def gauss(j: Int, i: Int): Double = {
    val a = mix(j.toLong * 0x51D0F14A7L + i.toLong + 1L)
    val b = mix(a + 0x632BE59BD9B4E019L)
    // uniforms in (0,1]: take 53 bits, never exactly 0 (ln(0) = -inf)
    val u1 = ((a >>> 11) + 1L).toDouble / 9007199254740993.0
    val u2 = (b >>> 11).toDouble / 9007199254740992.0
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  /** Coefficients of hyperplane `j` for dimensions [0, dim), memoized
    * per JVM: the Box-Muller transcendentals are row-independent, so the
    * sketch hot loop must be a multiply-add over a cached array, not a
    * log+cos per (plane, dim, ROW). The cache is tiny (planes × dim
    * doubles) and grows monotonically to the widest vector seen. */
  private val rows = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Double]]()
  def gaussRow(j: Int, dim: Int): Array[Double] = {
    val hit = rows.get(j)
    if (hit != null && hit.length >= dim) hit
    else rows.compute(j, (_, old) =>
      if (old != null && old.length >= dim) old
      else Array.tabulate(math.max(dim, 64))(i => gauss(j, i)))
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
        val coefs = GraftHash.gaussRow(t * nBits + j, dim)
        var p = 0.0
        var i = 0
        while (i < dim) {
          val xv = if (fl) v.getFloat(i).toDouble else v.getDouble(i)
          p += xv * coefs(i)
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
         |    double[] $hj = graft.plans.GraftHash.gaussRow($t * $nBits + $j, $dim);
         |    double $p = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) { $p += $get * $hj[$i]; }
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
