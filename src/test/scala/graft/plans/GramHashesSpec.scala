package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GramHashesSpec extends SparkSpec {
  import spark.implicits._

  private def charGrams(s: String, k: Int): Set[String] =
    if (s.length < k) Set.empty
    else (0 to s.length - k).map(i => s.substring(i, i + k)).toSet

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if ((a ++ b).isEmpty) Double.NaN
    else (a & b).size.toDouble / (a ++ b).size.toDouble

  test("char-window mode matches substring Jaccard on non-ASCII text") {
    // accented chars are 2 UTF-8 bytes: byte windows would count extra
    // grams inside them and shift the set sizes
    val t1 = "le café déjà vu du quartier est très agréable le matin"
    val t2 = "le café déjà vu du quartier est très agréable le soir"
    val k = 16
    val df = Seq((1L, t1), (2L, t2)).toDF("id", "t")
      .select($"id", call_function("char_gram_hashes", $"t", lit(k), lit(true), lit(true)).as("g"))
    val sets = df.as[(Long, Seq[Long])].collect().toMap
    val hashJ = (sets(1L).toSet & sets(2L).toSet).size.toDouble /
      (sets(1L).toSet ++ sets(2L).toSet).size.toDouble
    val exactJ = jaccard(charGrams(t1, k), charGrams(t2, k))
    assert(math.abs(hashJ - exactJ) < 1e-12,
      s"char-window hashed Jaccard $hashJ must equal substring Jaccard $exactJ")
    // and the gram COUNTS equal the substring counts (byte mode would not)
    assert(sets(1L).size == charGrams(t1, k).size)
  }

  test("byte-window mode stays exactly injective for ASCII (langid contract)") {
    val df = Seq((1L, "the quick brown fox")).toDF("id", "t")
      .select(call_function("char_gram_hashes", $"t", lit(3), lit(false)).as("g"))
    val grams = df.as[Seq[Long]].head()
    assert(grams.size == "the quick brown fox".length - 2, "one window per byte position")
    assert(grams.distinct.size == charGrams("the quick brown fox", 3).size,
      "distinct byte-window hashes == distinct grams (injective base-257 encoding)")
  }

  test("short strings yield empty gram sets in both modes") {
    val df = Seq((1L, "tiny")).toDF("id", "t").select(
      call_function("char_gram_hashes", $"t", lit(16), lit(true), lit(false)).as("b"),
      call_function("char_gram_hashes", $"t", lit(16), lit(true), lit(true)).as("c"))
    val (b, c) = df.as[(Seq[Long], Seq[Long])].head()
    assert(b.isEmpty && c.isEmpty)
  }
}
