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
}
