package graft.plans

import graft.SparkSpec
import graft.operators.EntityResolution
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerImpl.similarity(a, b)

  test("textbook values") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-12)
    assert(jw("same", "same") == 1.0)
    assert(jw("ab", "ba") == 0.0, "window 0 admits no match for a 2-swap")
  }

  test("empty-string convention matches the oracle engine (0.0, even twice-empty)") {
    assert(jw("", "") == 0.0)
    assert(jw("abc", "") == 0.0 && jw("", "abc") == 0.0)
  }

  test("boost applies only above the 0.7 threshold and caps at 4 prefix chars") {
    // low-sim pair with a 4-char shared prefix: m=4, t=0 →
    // jaro = (4/9 + 4/16 + 1)/3 ≈ 0.5648, below the boost threshold —
    // the result must be the UNBOOSTED jaro (an unconditional-boost
    // regression would yield 0.7389)
    val low = jw("abcdxxxxx", "abcdyyyyyyyyzzzz")
    val unboosted = (4.0 / 9 + 4.0 / 16 + 1.0) / 3
    assert(math.abs(low - unboosted) < 1e-12,
      s"below-threshold pair must not be prefix-boosted: $low")
    // long shared prefix: boost uses l = 4, not more
    val j9 = jw("prefixAAAA", "prefixAAAB")
    val jaroOnly = (9.0 / 10 + 9.0 / 10 + 1.0) / 3
    assert(math.abs(j9 - (jaroOnly + 4 * 0.1 * (1 - jaroOnly))) < 1e-12)
  }

  test("SQL-registered expression evaluates and propagates nulls") {
    val r = Seq(("martha", "marhta")).toDF("a", "b")
      .select(expr("jaro_winkler(a, b)")).collect().head.getDouble(0)
    assert(math.abs(r - 0.9611111111111111) < 1e-12)
    val n = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(expr("jaro_winkler(a, b)")).collect().head
    assert(n.isNullAt(0))
  }

  test("matchPairsJw finds the transposition Levenshtein double-charges") {
    val recs = Seq((1L, "jonathan", 1), (2L, "jonathna", 1), (3L, "zzz", 1))
      .toDF("id", "name", "blk")
    val pairs = EntityResolution.matchPairsJw(recs, "id", "name",
      Seq("blk"), minSim = 0.95).collect()
    assert(pairs.length == 1)
    assert((pairs.head.getLong(0), pairs.head.getLong(1)) == ((1L, 2L)))
    assert(pairs.head.getDouble(2) > 0.97)
  }

  test("invalid minSim fails loudly") {
    val recs = Seq((1L, "a", 1)).toDF("id", "name", "blk")
    intercept[IllegalArgumentException] {
      EntityResolution.matchPairsJw(recs, "id", "name", Seq("blk"), 0.0)
    }
  }
}
