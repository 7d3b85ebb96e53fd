package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Session extensions registering the engine's native expressions so they
  * are first-class SQL/DataFrame functions (callable via
  * `functions.call_function` or `expr("vec_dot(...)")`). Installed by
  * [[graft.GraftSession]]; usable with any Spark deployment via
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(AsOfJoinStrategy.apply)

    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children(0), children(1))))

    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprint"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fingerprint"),
      (children: Seq[Expression]) =>
        WinnowFingerprint(children(0),
          k = intLit(children(1), "k"),
          w = intLit(children(2), "w"))))

    def boolLit(e: Expression, what: String): Boolean = e match {
      case Literal(b: Boolean, _) => b
      case other => throw new IllegalArgumentException(s"$what must be a boolean literal, got $other")
    }
    ext.injectFunction((
      new FunctionIdentifier("char_gram_hashes"),
      new ExpressionInfo(classOf[CharGramHashes].getName, "char_gram_hashes"),
      (children: Seq[Expression]) =>
        CharGramHashes(children(0), k = intLit(children(1), "k"),
          distinct = children.lift(2).forall(boolLit(_, "distinct")),
          overChars = children.lift(3).exists(boolLit(_, "overChars")))))

    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) =>
        MinhashSig(children(0),
          k = intLit(children(1), "k"),
          perms = intLit(children(2), "perms"))))

    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Simhash64].getName, "simhash64"),
      (children: Seq[Expression]) => Simhash64(children.head)))

    ext.injectFunction((
      new FunctionIdentifier("media_header"),
      new ExpressionInfo(classOf[MediaHeader].getName, "media_header"),
      (children: Seq[Expression]) => MediaHeader(children.head)))

    ext.injectFunction((
      new FunctionIdentifier("media_gray8x8"),
      new ExpressionInfo(classOf[GrayBlock].getName, "media_gray8x8"),
      (children: Seq[Expression]) => GrayBlock(children.head)))

    ext.injectFunction((
      new FunctionIdentifier("vec_lsh_sketch"),
      new ExpressionInfo(classOf[VecLshSketch].getName, "vec_lsh_sketch"),
      (children: Seq[Expression]) =>
        VecLshSketch(children(0),
          nBits = intLit(children(1), "nBits"),
          nTables = intLit(children(2), "nTables"))))

    // Spark ships BloomFilterMightContain for its own runtime-filter
    // rewrites but does not SQL-register it; exposing it here (graft_
    // prefix — no clash if later Spark versions register the builtin
    // name) gives the streaming decontamination filter a codegen'd bloom
    // probe instead of a per-row set scan. The filter bytes come from
    // spark.util.sketch.BloomFilter — the same class the expression
    // deserializes.
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))

    // The per-row-bloom sibling of graft_might_contain: Spark's builtin
    // requires a CONSTANT bloom side (it deserializes once), so a frame
    // carrying a different serialized bloom per row (the zone-map
    // manifest: one bloom per data file) needs its own probe expression —
    // the distributed point-lookup path of [[graft.operators.ZoneMaps]].
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_probe"),
      new ExpressionInfo(classOf[BloomBytesContain].getName,
        "graft_bloom_probe"),
      (children: Seq[Expression]) =>
        BloomBytesContain(children(0), children(1))))

    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[Expression]) => JaroWinkler(children(0), children(1))))

    ext.injectFunction((
      new FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))

    // The build half of the same runtime-filter pair: Spark's internal
    // BloomFilterAggregate, SQL-registered so a bloom can be built as a
    // DISTRIBUTED aggregate (partial blooms per partition, OR-merge)
    // instead of a driver-side collect — the shape
    // [[graft.operators.BloomPrune]] needs for semi-join pruning where
    // the build side has too many keys to collect but few enough to
    // filter with. Output bytes deserialize with graft_might_contain.
    // Arity 1/2/3 mirrors the builtin: (xxhash64-long child
    // [, estimatedNumItems [, numBits]]), the estimates foldable longs,
    // internally capped by the runtime-filter size confs.
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        children match {
          case Seq(c)       => new BloomFilterAggregate(c)
          case Seq(c, n)    => new BloomFilterAggregate(c, n)
          case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
          case other => throw new IllegalArgumentException(
            s"graft_bloom_agg takes 1-3 arguments, got ${other.size}")
        }
      }))
  }
}

object GraftExtensions {
  /** Idempotently register the zone-map bloom expressions on an EXISTING
    * session. The extension mechanism only reaches sessions built with
    * `withExtensions`/`spark.sql.extensions`; the v2 scan's admission path
    * ([[graft.operators.ZoneMaps]].admitForV2Scan) runs on whatever
    * session is PLANNING the query, which in a multi-session app may not
    * be one of those (ADVICE r14) — without this, admission would fail on
    * every scan and silently disable pruning. Registration is per-session
    * state, so re-registering an already-present function is a cheap
    * overwrite with the identical builder. */
  def ensureBloomFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (reg.lookupFunctionBuilder(new FunctionIdentifier("graft_bloom_probe")).isEmpty)
      reg.registerFunction(
        new FunctionIdentifier("graft_bloom_probe"),
        new ExpressionInfo(classOf[BloomBytesContain].getName, "graft_bloom_probe"),
        (children: Seq[Expression]) => BloomBytesContain(children(0), children(1)))
    if (reg.lookupFunctionBuilder(new FunctionIdentifier("graft_bloom_agg")).isEmpty)
      reg.registerFunction(
        new FunctionIdentifier("graft_bloom_agg"),
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
          "graft_bloom_agg"),
        (children: Seq[Expression]) => {
          import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
          children match {
            case Seq(c)       => new BloomFilterAggregate(c)
            case Seq(c, n)    => new BloomFilterAggregate(c, n)
            case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
            case other => throw new IllegalArgumentException(
              s"graft_bloom_agg takes 1-3 arguments, got ${other.size}")
          }
        })
  }
}
