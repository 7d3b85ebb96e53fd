package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    ("d1", "a", Some(1.0)), ("d1", "a", Some(3.0)), ("d1", "b", Some(10.0)),
    ("d2", "a", Some(5.0)), ("d2", "b", None), ("d2", "b", Some(-2.0)),
    ("d3", "a", Some(7.0))
  ).toDF("day", "typ", "v")

  test("state + delta merge equals full recompute, at same and coarser granularity") {
    val full = IncrementalAgg.partialState(rows, Seq("day", "typ"), "v")
    val state = IncrementalAgg.partialState(rows.filter($"day" < "d3"), Seq("day", "typ"), "v")
    val delta = IncrementalAgg.partialState(rows.filter($"day" >= "d3"), Seq("day", "typ"), "v")
    val merged = IncrementalAgg.mergeStates(Seq("day", "typ"), state, delta)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("day", "typ").collect().toSeq
    assert(canon(merged) == canon(full))
    // coarsen from partials vs recompute from rows
    val byTyp = IncrementalAgg.mergeStates(Seq("typ"), merged)
    val direct = IncrementalAgg.partialState(rows, Seq("typ"), "v")
    assert(byTyp.orderBy("typ").collect().toSeq == direct.orderBy("typ").collect().toSeq)
  }

  test("nulls are ignored consistently across all five components") {
    val st = IncrementalAgg.partialState(rows, Seq("typ"), "v")
      .filter($"typ" === "b")
      .select("_cnt", "_sum", "_min", "_max", "_sumsq")
      .as[(Long, Option[Double], Option[Double], Option[Double], Option[Double])].head()
    assert(st == ((2L, Some(8.0), Some(-2.0), Some(10.0), Some(104.0))))
  }

  test("finish derives n/total/avg/lo/hi with the gate's rounding") {
    val out = IncrementalAgg.finish(
      IncrementalAgg.partialState(rows, Seq("typ"), "v"), Seq("typ"))
      .filter($"typ" === "a")
      .select("n", "total", "avg", "lo", "hi")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(out == ((4L, 16.0, 4.0, 1.0, 7.0)))
  }

  test("all-null group keeps a state row with cnt 0 and null measures") {
    val df = Seq(("x", Option.empty[Double])).toDF("typ", "v")
    val st = IncrementalAgg.partialState(df, Seq("typ"), "v")
      .select("_cnt", "_sum").as[(Long, Option[Double])].head()
    assert(st == ((0L, None)))
  }

  test("foreachBatch maintenance: streamed state equals batch recompute (IVM under streaming)") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivm_in").toString
    val wh = java.nio.file.Files.createTempDirectory("graft_ivm_wh").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_ivm_cp").toString
    def drop(name: String, lines: String*): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, name), lines.mkString("\n"))
    drop("b0.json", """{"typ":"a","v":1.0}""", """{"typ":"a","v":3.0}""",
      """{"typ":"b","v":10.0}""")
    drop("b1.json", """{"typ":"a","v":5.0}""", """{"typ":"b","v":-2.0}""")
    val schema = StructType(Seq(StructField("typ", StringType),
      StructField("v", DoubleType)))
    val store = new ParquetTableStore(spark, wh)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir) // one file per micro-batch
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        IncrementalAgg.foldIntoStore(store, "state", batch, Seq("typ"), "v",
          id, epoch = cp)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish in time")
    def state = store.read("state").get.drop("_last_batch", "_epoch")
      .orderBy("typ").collect().toSeq
    val direct = IncrementalAgg.partialState(
      Seq(("a", 1.0), ("a", 3.0), ("b", 10.0), ("a", 5.0), ("b", -2.0))
        .toDF("typ", "v"), Seq("typ"), "v").orderBy("typ").collect().toSeq
    assert(state == direct,
      s"streamed state $state != batch recompute $direct")

    // at-least-once replay of the LAST batch (the foreachBatch failure
    // mode): the batch marker must make the re-application a no-op
    val lastBatch = Seq(("a", 5.0), ("b", -2.0)).toDF("typ", "v")
    IncrementalAgg.foldIntoStore(store, "state", lastBatch, Seq("typ"), "v",
      1L, epoch = cp)
    assert(state == direct, "replayed batch must not double-count")
    // a genuinely new batch still applies
    IncrementalAgg.foldIntoStore(store, "state",
      Seq(("a", 100.0)).toDF("typ", "v"), Seq("typ"), "v", 2L, epoch = cp)
    assert(state != direct)
    // a DIFFERENT epoch (fresh checkpoint, batch ids restart at 0) must
    // fail loudly instead of silently skipping or double-counting
    val e = intercept[RuntimeException] {
      IncrementalAgg.foldIntoStore(store, "state",
        Seq(("a", 1.0)).toDF("typ", "v"), Seq("typ"), "v", 0L, epoch = "other")
    }
    assert(e.getMessage.contains("epoch"))
  }

  test("foldIntoStore bootstraps over a marker-less pre-existing state table") {
    val wh = java.nio.file.Files.createTempDirectory("graft_ivm_boot").toString
    val store = new ParquetTableStore(spark, wh)
    // bootstrap via the batch path: no _epoch/_last_batch columns
    store.replace("state",
      IncrementalAgg.partialState(Seq(("a", 1.0)).toDF("typ", "v"), Seq("typ"), "v"))
    IncrementalAgg.foldIntoStore(store, "state",
      Seq(("a", 2.0)).toDF("typ", "v"), Seq("typ"), "v", 0L, epoch = "e1")
    val st = store.read("state").get.select("typ", "_cnt", "_sum")
      .as[(String, Long, Double)].collect().toSeq
    assert(st == Seq(("a", 2L, 3.0)), s"bootstrap fold wrong: $st")
  }

  test("variance state survives Long-typed value columns that overflow integer products") {
    // per-row x² of 4e9 wraps a Long (1.6e19 > 9.2e18) and (Σx)² wraps
    // far earlier — both must compute in double, or _sd silently
    // collapses to 0/null on realistic count-like columns. The spread
    // (1e6) keeps the true variance inside the documented double
    // headroom (≈ log10(mean²·n/var) = 7-8 digits lost of 15), so a
    // correct double path recovers it while a wrapped integer path
    // cannot.
    val big = Seq(("g", 4000000000L), ("g", 4001000000L)).toDF("grp", "v")
    val state = IncrementalAgg.partialState(big, Seq("grp"), "v")
    val sd = IncrementalAgg.momentsFromState(state, Seq("grp"))
      .select($"_sd").as[Double].head()
    // true sample stddev of {x, x+1e6} is 1e6/sqrt(2)
    val want = 1e6 / math.sqrt(2.0)
    assert(math.abs(sd - want) / want < 1e-6,
      s"expected ~$want, got $sd (integer overflow in the state path?)")
  }

  test("plans are pure hash aggregates — no sort, no window") {
    val plan = IncrementalAgg.mergeStates(Seq("typ"),
      IncrementalAgg.partialState(rows, Seq("day", "typ"), "v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.matches("(?s).*\\bSort\\b.*"), s"unexpected sort:\n$plan")
  }
}
