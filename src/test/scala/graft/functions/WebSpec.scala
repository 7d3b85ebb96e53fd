package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WebSpec extends SparkSpec {
  import spark.implicits._

  private def hostOf(url: String): String =
    Seq(url).toDF("u").select(Web.urlHost($"u")).as[String].head()

  test("urlHost extracts and lowercases the hostname, stopping at delimiters") {
    assert(hostOf("https://Example.COM/path?q=1") == "example.com")
    assert(hostOf("http://a.b.c/") == "a.b.c")
    assert(hostOf("https://host.example.com:8080/p") == "host.example.com")
    assert(hostOf("https://h.io#frag") == "h.io")
    assert(hostOf("ftp://no.http.scheme/x") == "") // non-http scheme: no match
    assert(hostOf("not a url") == "")
  }

  test("urlHost is not fooled by userinfo (blocklist-bypass vector)") {
    assert(hostOf("https://user:pw@evil.com/x") == "evil.com")
    assert(hostOf("https://user@evil.com/x") == "evil.com")
    assert(hostOf("https://evil.com/x@path") == "evil.com") // @ in path is not userinfo
    assert(hostOf("https://a@b@c.com/") == "c.com")         // greedy userinfo
  }

  test("stripWww drops exactly one leading www label") {
    val got = Seq("www.ex.com", "ex.com", "wwwx.com", "www.www.ex.com")
      .toDF("h").select(Web.stripWww($"h")).as[String].collect().toSeq
    assert(got == Seq("ex.com", "ex.com", "wwwx.com", "www.ex.com"))
  }

  test("registrableDomain keeps the last two labels") {
    val got = Seq("a.b.example.com", "example.com", "localhost")
      .toDF("h").select(Web.registrableDomain($"h")).as[String].collect().toSeq
    assert(got == Seq("example.com", "example.com", "")) // single label: no match
  }

  private def psl(hosts: String*): Seq[(String, Option[String])] = {
    val df = hosts.zipWithIndex.map { case (h, i) => (i, h) }.toDF("i", "host")
    Web.withRegistrableDomain(df, "host", "reg")
      .orderBy("i").select("host", "reg")
      .as[(String, Option[String])].collect().toSeq
  }

  test("withRegistrableDomain: multi-label public suffixes group correctly") {
    assert(psl("shop.example.co.uk", "example.co.uk", "a.b.sample.com.au",
      "x.demo.ac.uk", "deep.campus.k12.ma.us") == Seq(
      ("shop.example.co.uk", Some("example.co.uk")),
      ("example.co.uk", Some("example.co.uk")),
      ("a.b.sample.com.au", Some("sample.com.au")),
      ("x.demo.ac.uk", Some("demo.ac.uk")),
      ("deep.campus.k12.ma.us", Some("campus.k12.ma.us"))))
  }

  test("withRegistrableDomain: longest match wins over the shorter rule") {
    // both 'uk' and 'co.uk' are rules: co.uk must win
    assert(psl("example.co.uk").head._2 == Some("example.co.uk"))
    // 'example.uk' under the bare 'uk' rule
    assert(psl("shop.example.uk").head._2 == Some("example.uk"))
  }

  test("withRegistrableDomain: PSL default rule for unlisted TLDs = last two labels") {
    assert(psl("a.site.unlistedtld") == Seq(("a.site.unlistedtld", Some("site.unlistedtld"))))
    assert(psl("plain.example.com").head._2 == Some("example.com"))
  }

  test("withRegistrableDomain: a bare public suffix and empty host have NO registrable domain") {
    assert(psl("co.uk", "com", "", "singlelabel") == Seq(
      ("co.uk", None), ("com", None), ("", None),
      ("singlelabel", None))) // default rule: the host IS its public suffix
  }

  test("withRegistrableDomain plans broadcast joins only — the fact side never shuffles") {
    val df = Seq((1, "a.example.co.uk")).toDF("i", "host")
    val plan = Web.withRegistrableDomain(df, "host", "reg")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
