package graft.operators

import graft.SparkSpec

class LangIdSpec extends SparkSpec {
  import spark.implicits._

  test("trigram profile identifies clearly-marked languages") {
    val docs = Seq(
      (1L, "the cat and the dog are here with that hat from this town"),
      (2L, "los gatos y las casas que tienen para una fiesta con del mar"),
      (3L, "der hund und die katze von den kindern mit sich selbst"),
      (4L, "les chats dans une maison pour des amis par sur la table"),
      (5L, "qqqq zzzz xxxx")
    ).toDF("doc_id", "text")
    val out = LangId.predict(docs, "doc_id", "text")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "de")
    assert(out(4L) == "fr")
    assert(out(5L) == "und")
  }

  test("Han char-range vote identifies zh; latin-majority mixed text does not flip") {
    val docs = Seq(
      (1L, "这是一个关于机器学习的文档"), // pure zh
      (2L, "今天天气很好我们去爬山了 go"), // 12 Han vs 2 latin: majority Han
      (3L, "the weather is nice today 天气"), // minority Han -> latin path
      (4L, "the cat and the dog are here with that hat from this town")
    ).toDF("doc_id", "text")
    val out = LangId.predict(docs, "doc_id", "text")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "zh")
    assert(out(2L) == "zh")
    assert(out(3L) != "zh", "minority Han must fall through to the trigram path")
    assert(out(4L) == "en")
  }

  test("predict keeps every input row exactly once") {
    val docs = graft.Tables.documents(spark, sfDir)
    val out = LangId.predict(docs, "doc_id", "text")
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
  }

  test("profile table is tiny (broadcastable by construction)") {
    assert(LangId.profileRows.size < 200)
    assert(LangId.profileRows.forall(_._2.length == 3))
  }
}
