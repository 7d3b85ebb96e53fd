package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // 12-token docs; doc 2 shares its tail 8-gram run with eval doc 100
  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (2L, "one two three four five six seven eight nine ten eleven twelve"),
    (3L, "red orange yellow green blue indigo violet cyan magenta black white gray"),
    (4L, "short doc under eight tokens")
  ).toDF("doc_id", "text")

  private def evalDocs = Seq(
    (100L, "three four five six seven eight nine ten"), // 8 tokens ⊂ doc 2
    (101L, "totally unrelated benchmark question text here now ok")
  ).toDF("doc_id", "text")

  test("flags exactly the docs sharing an 8-gram with the eval set") {
    val c = Decontaminate.contaminated(docs, evalDocs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(c == Seq(2L))
  }

  test("clean and contaminated partition the corpus") {
    val c = Decontaminate.contaminated(docs, evalDocs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val k = Decontaminate.clean(docs, evalDocs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert((c & k).isEmpty)
    assert((c | k) == Set(1L, 2L, 3L, 4L))
  }

  test("short docs fall back to whole-text grams (exact-match only)") {
    val shortEval = Seq((200L, "short doc under eight tokens")).toDF("doc_id", "text")
    val c = Decontaminate.contaminated(docs, shortEval, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(c == Seq(4L)) // identical short text matches; nothing else can
    val near = Seq((201L, "short doc under eight token")).toDF("doc_id", "text")
    assert(Decontaminate.contaminated(docs, near, "doc_id", "text").count() == 0L)
  }

  test("wider n flags nothing when the shared run is shorter than n") {
    // doc 2 shares an 8-token run with eval 100; at n=9 no 9-gram overlaps
    assert(Decontaminate.contaminated(docs, evalDocs, "doc_id", "text", n = 9).count() == 0L)
  }

  test("cleanStream on a real stream equals batch clean(), row for row") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)]
    val streamDocs = mem.toDF().toDF("doc_id", "text")
    val out = Decontaminate.cleanStream(streamDocs, evalDocs, "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("clean_stream")
      .outputMode("append").start()
    docs.as[(Long, String)].collect().foreach(mem.addData(_))
    q.processAllAvailable()
    val streamed = spark.sql("SELECT doc_id FROM clean_stream")
      .as[Long].collect().toSet
    q.stop()
    val batch = Decontaminate.clean(docs, evalDocs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed == Set(1L, 3L, 4L)) // doc 2 is the contaminated one
  }

  test("cleanStream with an empty eval set keeps everything") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Decontaminate.cleanStream(docs, empty, "doc_id", "text").count() == 4L)
  }

  test("extra corpus columns survive contaminated()") {
    val withCols = docs.withColumn("source", lit("web"))
    val out = Decontaminate.contaminated(withCols, evalDocs, "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "text", "source"))
  }

  private val base = "the quick brown fox jumps over the lazy dog while " +
    "birds sing in the morning light and rivers flow gently to the sea " +
    "under a warm golden sun that rises slowly"

  test("fuzzyHits finds the paraphrase leak the exact 8-gram recipe misses") {
    // eval doc: the corpus doc with every 8th word changed — no 8-gram
    // survives intact, but 3-shingle Jaccard stays high
    val tweaked = base.split(" ").zipWithIndex
      .map { case (w, i) => if (i % 8 == 7) w.toUpperCase else w }
      .mkString(" ")
    val corpus = Seq((1L, base), (2L, "completely unrelated text about " +
      "spark shuffles partitions and catalyst optimizer internals at scale"))
      .toDF("doc_id", "text")
    val eval = Seq((900L, tweaked)).toDF("doc_id", "text")
    // exact recipe: nothing flagged (no shared 8-gram)
    assert(Decontaminate.contaminated(corpus, eval, "doc_id", "text").count() == 0)
    // fuzzy recipe: doc 1 flagged, doc 2 untouched
    val hits = Decontaminate.fuzzyHits(corpus, eval, "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect()
    assert(hits.map(h => (h._1, h._2)).toSet == Set((1L, 900L)))
    assert(hits.head._3 >= 0.5 && hits.head._3 < 1.0)
    val kept = Decontaminate.fuzzyClean(corpus, eval, "doc_id", "text", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L))
  }

  test("fuzzyHits threshold is a boundary on the ROUNDED exact jaccard") {
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    val eval = Seq((900L, base + " tail")).toDF("doc_id", "text")
    val j = Decontaminate.fuzzyHits(corpus, eval, "doc_id", "text", 0.0)
      .select("jaccard").as[Double].head()
    // at exactly-j threshold the pair is kept; just above it is not
    assert(Decontaminate.fuzzyHits(corpus, eval, "doc_id", "text", j).count() == 1)
    assert(Decontaminate.fuzzyHits(corpus, eval, "doc_id", "text", j + 0.0001).count() == 0)
  }

  test("fuzzyHits is cross-side only: corpus near-dup PAIRS never surface") {
    // two corpus docs that are near-dups of each other, eval unrelated:
    // no hit may be emitted, in either direction
    val corpus = Seq((1L, base), (2L, base + " extra")).toDF("doc_id", "text")
    val eval = Seq((900L, "nothing in common with the corpus at all here " +
      "just spark catalyst tungsten codegen exchange partitions"))
      .toDF("doc_id", "text")
    assert(Decontaminate.fuzzyHits(corpus, eval, "doc_id", "text", 0.1).count() == 0)
  }
}
