package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interleaved-lifecycle invariant for the stored indexes: under ANY
  * seeded sequence of append / edit (upsert) / delete / compact, the
  * index must stay equivalent to a ONE-SHOT build over the net corpus —
  * the model-based property that pins the whole lifecycle, not each op
  * in isolation. The model is a plain Scala map of the expected corpus
  * maintained alongside the ops; equivalence is checked through the
  * freshness attest plus bit-equal search / rank-1 twin retrieval. */
class IndexLifecyclePropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("apple", "banana", "cherry", "durian", "fig",
    "grape", "kiwi", "lemon", "mango", "olive")

  private def textOf(rnd: scala.util.Random): String =
    Seq.fill(3 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("bm25: any interleaving of append/upsert/delete/compact equals one-shot over the net corpus") {
    for (seed <- Seq(11, 47)) {
      val rnd = new scala.util.Random(seed)
      val wh = java.nio.file.Files.createTempDirectory(s"graft_prop$seed").toString
      val store = new ParquetTableStore(spark, wh)
      var model = (1L to 6L).map(i => i -> textOf(rnd)).toMap
      var nextId = 7L
      Bm25Index.build(store, "bx", model.toSeq.toDF("doc_id", "text"),
        "doc_id", "text")
      for (batch <- 1 to 6) {
        rnd.nextInt(4) match {
          case 0 => // append new docs
            val fresh = (0 until 1 + rnd.nextInt(2)).map { _ =>
              val id = nextId; nextId += 1; id -> textOf(rnd)
            }.toMap
            model ++= fresh
            Bm25Index.append(store, "bx", fresh.toSeq.toDF("doc_id", "text"),
              "doc_id", "text", batch.toLong)
          case 1 => // edit an existing doc (+ maybe one new) via upsertDocs
            val victim = model.keys.toSeq(rnd.nextInt(model.size))
            val edited = Map(victim -> textOf(rnd))
            model ++= edited
            Bm25Index.upsertDocs(store, "bx", edited.toSeq.toDF("doc_id", "text"),
              "doc_id", "text", batch.toLong)
          case 2 if model.size > 2 => // delete a doc
            val victim = model.keys.toSeq(rnd.nextInt(model.size))
            model -= victim
            Bm25Index.delete(store, "bx", Seq(victim).toDF("doc_id"), "doc_id")
          case _ =>
            Bm25Index.compactSegments(store, "bx")
        }
      }
      val corpus = model.toSeq.toDF("doc_id", "text")
      Bm25Index.verifyFresh(store, "bx", corpus, "doc_id")
      val queries = vocab.take(4).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("query_id", "term")
      val fromIndex = Bm25Index.search(store, "bx", queries, 10)
        .orderBy("query_id", "rank").as[(Long, Long, Long, Double)].collect().toSeq
      val oneShot = Bm25.search(corpus, "doc_id", "text", queries, 10)
        .orderBy("query_id", "rank").as[(Long, Long, Long, Double)].collect().toSeq
      assert(fromIndex == oneShot,
        s"seed $seed: lifecycle index diverges from one-shot\n$fromIndex\nvs\n$oneShot")
    }
  }

  test("ivf-sq: any interleaving of append/upsertVectors/delete/compact keeps attest + twin retrieval") {
    def vec(rnd: scala.util.Random): Seq[Float] = {
      val th = rnd.nextDouble() * 2 * math.Pi
      Seq(math.cos(th).toFloat, math.sin(th).toFloat, 0f, 0f, 0f, 0f, 0f, 0f)
    }
    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      val wh = java.nio.file.Files.createTempDirectory(s"graft_vprop$seed").toString
      val store = new ParquetTableStore(spark, wh)
      var model = (1L to 12L).map(i => i -> vec(rnd)).toMap
      var nextId = 13L
      IvfSq.build(store, "ix", model.toSeq.toDF("id", "v"), "id", "v",
        nCells = 4, iterations = 2)
      for (batch <- 1 to 5) {
        rnd.nextInt(4) match {
          case 0 =>
            val fresh = (0 until 2).map { _ =>
              val id = nextId; nextId += 1; id -> vec(rnd)
            }.toMap
            model ++= fresh
            IvfSq.append(store, "ix", fresh.toSeq.toDF("id", "v"), "id", "v",
              batch.toLong)
          case 1 =>
            val victim = model.keys.toSeq(rnd.nextInt(model.size))
            val edited = Map(victim -> vec(rnd))
            model ++= edited
            IvfSq.upsertVectors(store, "ix", edited.toSeq.toDF("id", "v"),
              "id", "v", batch.toLong)
          case 2 if model.size > 4 =>
            val victim = model.keys.toSeq(rnd.nextInt(model.size))
            model -= victim
            IvfSq.delete(store, "ix", Seq(victim).toDF("id"), "id")
          case _ =>
            IvfSq.compactCodeSegments(store, "ix")
        }
      }
      val corpus = model.toSeq.toDF("id", "v")
      IvfSq.verifyFresh(store, "ix", corpus, "id") // freshness + parity
      // every survivor's planted twin retrieves ITSELF at rank 1 under an
      // exhaustive probe (nProbe = nCells) — the index holds exactly the
      // model corpus, nothing stale answering, nothing lost
      val planted = corpus.select(($"id" + 100000L).as("id"), $"v")
      val got = IvfSq.probe(store, "ix", planted, "id", "v", topK = 1,
          nProbe = 4)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
      model.keys.foreach { id =>
        assert(got(id + 100000L) == id,
          s"seed $seed: twin of $id lost after lifecycle: ${got.get(id + 100000L)}")
      }
    }
  }
}
