package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PhashSpec extends SparkSpec {
  import spark.implicits._

  private def hashOf(s: String): String =
    Seq(s).toDF("t").select(
      Multimodal.aHashBits(col("t").cast("binary")).as("h"))
      .collect().head.getString(0)

  test("hand-computed hash: short payload zero-pads") {
    // "ab" → bytes 97, 98, then 62 zeros; Σ = 195; 97·64 > 195 → '1'
    assert(hashOf("ab") == "11" + "0" * 62)
  }

  test("payloads beyond 64 bytes are truncated to the leading block") {
    val base = "x" * 64
    assert(hashOf(base) == hashOf(base + "completely different tail"))
  }

  test("uniform payload hashes to all zeros (no byte exceeds the mean)") {
    assert(hashOf("a" * 64) == "0" * 64)
  }

  test("Hamming near-dup finds planted twins and matches brute force") {
    val rnd = new scala.util.Random(11)
    val base = Seq.fill(40)(Seq.fill(64)(
      (97 + rnd.nextInt(26)).toChar).mkString)
    // twins: flip ONE character far up vs its original (≤ a few hash bits)
    val twins = base.take(5).map(s => "Z" + s.substring(1))
    val docs = (base ++ twins).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
      .select(col("id"), col("t").cast("binary").as("payload"))
    val got = Multimodal.phashNearDup(docs, "id", "payload",
      maxHamming = 3, nBands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over all pairs
    val sigs = docs.select(col("id"),
      Multimodal.aHashBits(col("payload")).as("b")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = sigs(a).zip(sigs(b)).count { case (x, y) => x != y }
      if h <= 3
    } yield (a, b)).toSet
    assert(got == brute, s"banded ≠ brute: missing ${brute -- got}, extra ${got -- brute}")
    assert(got.nonEmpty, "fixture must plant at least one near pair")
  }

  test("hamming distances on the pairs are exact") {
    val docs = Seq((1L, "aaaa" + "b" * 60), (2L, "aaab" + "b" * 60))
      .toDF("id", "t")
      .select(col("id"), col("t").cast("binary").as("payload"))
    val rows = Multimodal.phashNearDup(docs, "id", "payload",
      maxHamming = 63, nBands = 64).collect()
    rows.foreach { r =>
      val expect = {
        val h = Seq(1L, 2L).map(i => docs.filter(col("id") === i)
          .select(Multimodal.aHashBits(col("payload"))).collect().head.getString(0))
        h(0).zip(h(1)).count { case (x, y) => x != y }
      }
      assert(r.getInt(2) == expect)
    }
  }

  test("invalid banding geometry fails loudly") {
    val d = Seq((1L, "x")).toDF("id", "t")
      .select(col("id"), col("t").cast("binary").as("payload"))
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDup(d, "id", "payload", maxHamming = 4, nBands = 4)
    }
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDup(d, "id", "payload", maxHamming = 2, nBands = 3)
    }
  }
}
