package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Static kernel for [[BloomBytesContain]]: deserialize a
  * `spark.util.sketch.BloomFilter` from its serialized bytes and probe
  * one long. Each call deserializes — the expression exists for frames
  * where the bloom VARIES per row (a zone-map manifest holding one bloom
  * per data file), so there is nothing to cache across rows; for a
  * CONSTANT bloom probed per row use Spark's own
  * `BloomFilterMightContain` (`graft_might_contain`), whose lazy
  * deserialize-once is exactly the constant-side optimization this
  * kernel cannot have. */
object BloomBytesProbe {
  def mightContain(bytes: Array[Byte], h: Long): Boolean =
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(bytes))
      .mightContainLong(h)
}

/** `graft_bloom_probe(bloom_bytes, hash)` — probe a PER-ROW serialized
  * bloom filter column with an xxhash64 long; null-safe, BooleanType;
  * registered in [[GraftExtensions]].
  *
  * The distributed half of the zone-map point path (VERDICT r11's one
  * weak component): [[graft.operators.ZoneMaps]] stores one bloom per
  * data file in the manifest, and a point lookup must evaluate "does
  * file F's bloom admit key k" for every file — as a FILTER on the
  * manifest frame running on executors, so the driver collects only the
  * admitted file names (file-count × name bytes), never the blooms
  * themselves (file-count × ~100 KB — gigabytes at the 100k-file design
  * point). Spark's own `BloomFilterMightContain` cannot express this:
  * it requires a foldable/scalar-subquery bloom side (it deserializes
  * once and caches), while here the bloom is a different value on every
  * row. Implements doGenCode via the static kernel so a manifest scan
  * stays inside whole-stage codegen; the per-row deserialization is the
  * irreducible cost of per-row blooms, paid on executors in parallel
  * instead of serially on the driver. */
case class BloomBytesContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_probe needs (binary bloom bytes, bigint hash), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override def nullSafeEval(bytes: Any, h: Any): Any =
    BloomBytesProbe.mightContain(bytes.asInstanceOf[Array[Byte]],
      h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.plans.BloomBytesProbe.mightContain($b, $h);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
