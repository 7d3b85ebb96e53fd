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
}
