package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  // deterministic unit vectors on a ring in the first two dims of each
  // half: id i -> 8-dim vector whose two 4-dim subspaces both rotate
  private def ring(n: Int): org.apache.spark.sql.DataFrame = (0 until n).map { i =>
    val th = 2 * math.Pi * i / n
    // 1/sqrt(2) per half keeps the stacked 8-dim vector unit-norm, so
    // the twin's exact self-dot is 1.0
    val c = (math.cos(th) / math.sqrt(2)).toFloat
    val s = (math.sin(th) / math.sqrt(2)).toFloat
    val half = Array(c, s, 0.0f, 0.0f)
    (i.toLong, (half ++ half).toSeq)
  }.toDF("id", "v")

  test("codes have the declared shape: length m, values in [0, ksub)") {
    val corpus = ring(40)
    val cb = ProductQuantizer.train(corpus, "id", "v", dim = 8, m = 2, ksub = 8,
      iterations = 2)
    assert(cb.count() == 16) // m * ksub
    val codes = ProductQuantizer.encode(corpus, "id", "v", 8, cb, m = 2)
      .select($"id", $"codes").as[(Long, Seq[Int])].collect()
    assert(codes.length == 40)
    codes.foreach { case (id, cs) =>
      assert(cs.length == 2, s"id $id codes $cs")
      assert(cs.forall(c => c >= 0 && c < 8), s"id $id codes $cs")
    }
  }

  test("training is deterministic: two runs produce the identical codebook") {
    val corpus = ring(30)
    def run() = ProductQuantizer.train(corpus, "id", "v", 8, m = 2, ksub = 4,
        iterations = 3)
      .select($"sub", $"code", to_json($"centroid").as("c"))
      .as[(Int, Int, String)].collect().toSet
    assert(run() == run())
  }

  test("searchAdc retrieves planted twins at rank 1 with the exact score") {
    val corpus = ring(48)
    val cb = ProductQuantizer.train(corpus, "id", "v", 8, m = 2, ksub = 8,
      iterations = 3)
    val codes = ProductQuantizer.encode(corpus, "id", "v", 8, cb, m = 2)
    val queries = corpus.filter($"id" < 6)
      .select(($"id" + 1000L).as("id"), $"v")
    val got = ProductQuantizer.searchAdc(queries, codes, corpus, "id", "v",
        cb, 8, topK = 1, m = 2, ksub = 8)
      .select("query_id", "neighbor_id", "score")
      .as[(Long, Long, Double)].collect()
    assert(got.length == 6)
    got.foreach { case (q, n, s) =>
      assert(n == q - 1000L, s"twin of ${q - 1000} not at rank 1 (got $n)")
      assert(math.abs(s - 1.0) < 1e-6, s"twin score should be ~1.0, got $s")
    }
  }

  test("a small shortlist still returns exact-rescored order within it") {
    val corpus = ring(32)
    val cb = ProductQuantizer.train(corpus, "id", "v", 8, m = 2, ksub = 8,
      iterations = 2)
    val codes = ProductQuantizer.encode(corpus, "id", "v", 8, cb, m = 2)
    val queries = corpus.filter($"id" === 0L).select(($"id" + 1000L).as("id"), $"v")
    val got = ProductQuantizer.searchAdc(queries, codes, corpus, "id", "v",
        cb, 8, topK = 3, m = 2, ksub = 8, shortlist = 8)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    // ring neighbors of 0 are 1 and 31; the twin (id 0) is rank 1
    assert(got.head == 0L, s"self twin must lead: ${got.toSeq}")
    assert(Set(1L, 31L).subsetOf(got.toSet),
      s"ring neighbors must follow within the shortlist: ${got.toSeq}")
  }

  test("ADC assigns a corpus vector its own codes (self-distance is the quantization floor)") {
    val corpus = ring(24)
    val cb = ProductQuantizer.train(corpus, "id", "v", 8, m = 2, ksub = 6,
      iterations = 3)
    val codes = ProductQuantizer.encode(corpus, "id", "v", 8, cb, m = 2)
    // re-encode a relabeled copy: identical subvectors must yield identical codes
    val twin = corpus.filter($"id" < 5).select(($"id" + 100L).as("id"), $"v")
    val twinCodes = ProductQuantizer.encode(twin, "id", "v", 8, cb, m = 2)
      .select(($"id" - 100L).as("id"), $"codes".as("tc"))
    val both = codes.join(twinCodes, "id")
      .select(to_json($"codes").as("a"), to_json($"tc").as("b"))
      .as[(String, String)].collect()
    assert(both.length == 5)
    both.foreach { case (a, b) => assert(a == b, s"twin codes diverge: $a vs $b") }
  }
}
