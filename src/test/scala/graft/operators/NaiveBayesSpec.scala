package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    ("en", "the cat sat"),
    ("en", "the dog sat"),
    ("fr", "le chat noir"),
    ("fr", "le chien noir")
  ).toDF("lang", "text")

  test("classify matches the hand-computed multinomial NB posterior") {
    // vocab V = 8 {the,cat,sat,dog,le,chat,noir,chien}; totals: en 6, fr 6
    // doc "the cat": en: ln(2/4) + ln((2+1)/14) + ln((1+1)/14)
    //               fr: ln(2/4) + ln((0+1)/14) + ln((0+1)/14)
    val st = NaiveBayes.state(train, "lang", "text")
    val got = NaiveBayes.classify(st, Seq((1L, "the cat")).toDF("id", "text"),
      "id", "text").head()
    val en = math.log(0.5) + math.log(3.0 / 14) + math.log(2.0 / 14)
    assert(got.getString(1) == "en")
    assert(math.abs(got.getDouble(2) - math.rint(en * 1e4) / 1e4) < 1e-9,
      s"score ${got.getDouble(2)} != hand-computed $en")
  }

  test("unknown tokens contribute the smoothing floor, not nothing") {
    val st = NaiveBayes.state(train, "lang", "text")
    // all-unknown doc: score_c = logprior + n * logfloor; equal priors and
    // equal totals -> exact tie -> smallest class name wins
    val got = NaiveBayes.classify(st,
      Seq((1L, "zzz qqq")).toDF("id", "text"), "id", "text").head()
    assert(got.getString(1) == "en", s"tie must break to smallest class: $got")
    val want = math.log(0.5) + 2 * (math.log(1.0) - math.log(14.0))
    assert(math.abs(got.getDouble(2) - math.rint(want * 1e4) / 1e4) < 1e-9)
  }

  test("null class/text rows are excluded from training; null id/text docs from scoring") {
    val noisy = train.unionByName(Seq(
      (null.asInstanceOf[String], "junk text"),
      ("en", null.asInstanceOf[String])).toDF("lang", "text"))
    val st = NaiveBayes.state(noisy, "lang", "text")
    assert(st.filter($"class".isNull).count() == 0)
    assert(st.filter($"term".isNull).agg(sum($"cnt")).head().getLong(0) == 4)
  }

  test("fold-maintained state classifies identically to one-shot training") {
    val wh = java.nio.file.Files.createTempDirectory("graft_nb_fold").toString
    val store = new ParquetTableStore(spark, wh)
    val bigTrain = (1 to 60).map { i =>
      if (i % 2 == 0) ("en", s"the cat sat on mat $i word${i % 7}")
      else ("fr", s"le chat noir dort la $i mot${i % 7}")
    }.toDF("lang", "text")
    def fold(r: Int, bid: Long): Unit =
      NaiveBayes.foldIntoStore(store, "nb",
        bigTrain.filter(length($"text") % 3 === r), "lang", "text", bid, "e1")
    fold(0, 0L); fold(1, 1L); fold(1, 1L) /* replay */; fold(2, 2L)
    val test = Seq((1L, "the cat dort"), (2L, "le chat sat"), (3L, "mat mot"))
      .toDF("id", "text")
    val maintained = NaiveBayes.classify(
      store.read("nb").get.drop("_last_batch", "_epoch"), test, "id", "text")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    val oneShot = NaiveBayes.classify(
      NaiveBayes.state(bigTrain, "lang", "text"), test, "id", "text")
      .orderBy("id").as[(Long, String, Double)].collect().toSeq
    assert(maintained == oneShot,
      s"folded classifier diverged:\n$maintained\nvs\n$oneShot")
  }

  test("confusion matrix counts every evaluated doc exactly once") {
    val st = NaiveBayes.state(train, "lang", "text")
    val eval = Seq((1L, "en", "the cat"), (2L, "fr", "le chien"),
      (3L, "en", "noir chat"), (4L, "fr", "zzz")).toDF("id", "lang", "text")
    val cm = NaiveBayes.confusion(st, eval, "id", "lang", "text")
    assert(cm.agg(sum($"n")).head().getLong(0) == 4)
    // the obviously-French doc scores fr even though its label says en
    val wrong = cm.filter($"class" === "en" && $"predicted" === "fr")
      .select("n").as[Long].collect()
    assert(wrong.nonEmpty && wrong.head >= 1, cm.collect().mkString("; "))
  }
}
