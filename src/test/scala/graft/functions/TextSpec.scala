package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount / lexTokenCount") {
    val df = Seq("the cat sat", "a b c d").toDF("text")
    assert(df.select(Text.tokenCount($"text")).as[Long].collect().toSeq == Seq(3L, 4L))
    assert(df.select(Text.lexTokenCount($"text")).as[Long].collect().toSeq == Seq(3L, 4L))
  }

  test("lexTokenCount splits punctuation and digits") {
    val df = Seq("it's 42 degrees!").toDF("text")
    // tokens: it, ', s, 42, degrees, !  => 6
    assert(df.select(Text.lexTokenCount($"text")).as[Long].head() == 6L)
  }

  test("normalize + fingerprint: whitespace/case variants collide, content changes don't") {
    val df = Seq("The  Quick   Fox", "the quick fox", "the quick dog").toDF("text")
    val fps = df.select(Text.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
    val fp64 = df.select(Text.fingerprint64($"text")).as[Long].collect()
    assert(fp64(0) == fp64(1) && fp64(0) != fp64(2))
  }

  test("langGuess picks the language whose stopwords dominate") {
    val df = Seq(
      "the cat is in the house and it is warm",     // en
      "el gato y la casa de la abuela que canta",   // es
      "der hund und die katze mit den kindern",     // de
      "le chat et les chiens dans une maison",      // fr
      "xyzzy plugh"                                 // none -> und
    ).toDF("text")
    assert(df.select(Text.langGuess($"text")).as[String].collect().toSeq ==
      Seq("en", "es", "de", "fr", "und"))
  }

  test("qualityScore is in [0,1] and rewards natural prose") {
    val df = Seq(
      "the cat is on the mat and it is a good day today for all of us to rest",
      "zz"
    ).toDF("text")
    val scores = df.select(Text.qualityScore($"text")).as[Double].collect()
    assert(scores.forall(sc => sc >= 0.0 && sc <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("chunkTokensOf covers every token, overlaps by size-stride, no empty chunk") {
    // generated docs of 1..50 distinct numbered tokens; size=8, stride=4
    val docs = spark.range(1, 51).select(col("id"),
      transform(sequence(lit(1), col("id").cast("int")),
        i => concat(lit("t"), i.cast("string"))).as("w"))
    val chunked = docs.select(col("id"), col("w"),
      Text.chunkTokensOf(col("w"), size = 8, stride = 4).as("chunks"))
    val rows = chunked.select(col("id"),
        size(col("w")).as("n"),
        size(col("chunks")).as("nc"),
        // chunk token counts, and the distinct set of all covered tokens
        transform(col("chunks"), c => size(split(c, " "))).as("lens"),
        array_distinct(flatten(transform(col("chunks"), c => split(c, " ")))).as("covered"))
      .as[(Long, Int, Int, Seq[Int], Seq[String])].collect()
    for ((id, n, nc, lens, covered) <- rows) {
      assert(nc == math.max(math.ceil(n / 4.0).toInt, 1), s"doc $id chunk count")
      assert(lens.forall(_ > 0), s"doc $id has an empty chunk")
      assert(lens.forall(_ <= 8), s"doc $id chunk over size")
      assert(covered.size == n, s"doc $id: ${covered.size} of $n tokens covered")
      // every non-final chunk advances by exactly stride and is full when
      // enough tokens remain
      lens.init.zipWithIndex.foreach { case (l, i) =>
        if (i * 4 + 8 <= n) assert(l == 8, s"doc $id chunk $i not full")
      }
    }
  }

  test("repetition ratios: phrase loops score high on bigram, low-novelty on unigram") {
    val df = Seq(
      "a b c d e f g h",          // all distinct: ur=0, br=0
      "spam spam spam spam",      // one word looped: ur high, br high
      "x y x y x y x y",          // two words alternating: ur high, br high
      "one"                       // single token: bigram falls back to tokens
    ).toDF("text")
      .select($"text", Text.repetitionRatio($"text").as("ur"),
        Text.tokens($"text").as("w"))
      .select($"ur", Text.bigramRepetitionRatioOf($"w").as("br"))
      .as[(Double, Double)].collect()
    assert(df(0) == ((0.0, 0.0)))
    assert(df(1)._1 == 0.75 && df(1)._2 > 0.6) // 4 tokens 1 distinct; 3 bigrams 1 distinct
    assert(df(2)._1 == 0.75 && df(2)._2 > 0.6)
    assert(df(3) == ((0.0, 0.0))) // no repetition derivable from one token
  }

  test("chunkTokensOf with stride == size partitions exactly (no overlap)") {
    val docs = Seq(Seq.tabulate(10)(i => s"w$i")).toDF("w")
    val out = docs.select(Text.chunkTokensOf(col("w"), 4, 4).as("chunks"))
      .select(flatten(transform(col("chunks"), c => split(c, " "))).as("all"))
      .as[Seq[String]].head()
    assert(out == Seq.tabulate(10)(i => s"w$i")) // concatenation == original
  }

  test("normalizeText: NFC composes, controls/format chars die, whitespace collapses") {
    def norm(s: String): String =
      Seq(s).toDF("t").select(Text.normalizeText($"t")).as[String].head()
    // decomposed e + U+0301 composes to the single-codepoint U+00E9
    assert(norm("cafe\u0301") == "caf\u00e9")
    assert(norm("cafe\u0301").length == 4)
    // NUL (Cc), BEL (Cc), ZWSP (Cf), BiDi LRM (Cf) -> spaces -> collapsed
    assert(norm("a\u0000b\u0007c\u200Bd\u200Ee") == "a b c d e")
    // NBSP runs and mixed ASCII whitespace collapse; edges trim
    assert(norm(" \t a\u00A0\u00A0b \n c \r ") == "a b c")
    // plain ASCII passes through untouched
    assert(norm("already clean text") == "already clean text")
  }

  test("normalizeText is idempotent and null-safe; graft_nfc is SQL-callable") {
    val dirty = Seq(Some("x\u0007y \u00A0 cafe\u0301 z"), None).toDF("t")
    val once = dirty.select(Text.normalizeText($"t").as("n"))
    val twice = once.select(Text.normalizeText($"n").as("n"))
    assert(once.as[Option[String]].collect().toSeq ==
      twice.as[Option[String]].collect().toSeq)
    assert(once.filter($"n".isNull).count() == 1)
    val viaSql = spark.sql("SELECT graft_nfc('cafe\u0301') AS n")
      .as[String].head()
    assert(viaSql == "caf\u00e9")
  }
}
