package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain column builders for web-corpus curation (the CCNet /
  * RefinedWeb-style pipeline stage: group documents by site, score or
  * block whole domains, then filter). Pure codegen'd expressions — no
  * UDFs — so they run inside the scan projection at corpus scale.
  */
object Web {

  /** Hostname of an http(s) URL, lowercased; '' when the value does not
    * parse (regexp_extract's no-match result — null-safe downstream
    * grouping treats unparseable URLs as one bucket). The optional
    * `[^/?#]*@` prefix consumes RFC 3986 userinfo — without it,
    * `https://user:pw@evil.com/` would return `user` and
    * `https://user@evil.com/` would return `user@evil.com`, letting a
    * blocklisted domain slip through the anti-join. The capture class
    * then excludes `/:?#@`, so ports, paths, queries and fragments all
    * terminate the host. */
  def urlHost(u: Column): Column =
    lower(regexp_extract(u, "^https?://(?:[^/?#]*@)?([^/:?#@]+)", 1))

  /** Drop one leading `www.` label (display-domain canonicalization). */
  def stripWww(host: Column): Column =
    regexp_replace(host, "^www\\.", "")

  /** Naive registrable domain: the last two labels. Correct for
    * single-label public suffixes (.com, .org, …); multi-label suffixes
    * (.co.uk) need a public-suffix list lookup — see
    * [[withRegistrableDomain]], the PSL-backed variant. */
  def registrableDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)

  /** Bundled public-suffix-list SNAPSHOT (fixture subset of the Mozilla
    * PSL's plain rules — publicsuffix.org; the full list is ~9k entries
    * and drops in unchanged: it is just more rows in this broadcast
    * side). Semantics implemented: plain rules with longest-match-wins
    * and the PSL default rule (an unlisted TLD is itself a public
    * suffix, so the registrable domain is the last two labels —
    * matching [[registrableDomain]]'s behavior for unknown TLDs).
    * Wildcard (`*.ck`) and exception (`!www.ck`) rules are out of scope
    * for the snapshot and documented as such. */
  val pslSnapshot: Seq[String] = Seq(
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "ai", "dev",
    "app", "info", "biz", "xyz",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "ltd.uk",
    "au", "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "jp", "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "br", "com.br", "net.br", "org.br",
    "cn", "com.cn", "net.cn", "org.cn", "edu.cn",
    "in", "co.in", "net.in", "org.in",
    "kr", "co.kr", "or.kr", "ac.kr",
    "za", "co.za", "org.za", "ac.za",
    "mx", "com.mx", "org.mx",
    "ar", "com.ar", "org.ar",
    "tr", "com.tr", "org.tr",
    "nz", "co.nz", "org.nz", "ac.nz",
    "us", "k12.ma.us", "cc.ca.us")

  /** Longest label count of any snapshot rule — bounds the candidate
    * probes [[withRegistrableDomain]] generates. */
  private val pslMaxLabels: Int = pslSnapshot.map(_.count(_ == '.') + 1).max

  /** PSL snapshot as a (sfx, nl) frame — the broadcast side of the
    * lookup join. */
  def pslTable(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    pslSnapshot.map(s => (s, s.count(_ == '.') + 1)).toDF("sfx", "nl")
  }

  /** PSL snapshot rendered as SQL VALUES rows, for oracles that must
    * replay the same lookup (the LangId profileRows precedent). */
  def pslValues: String =
    pslSnapshot.sorted.map(s => s"('$s', ${s.count(_ == '.') + 1})").mkString(", ")

  /** Attach the PSL-correct registrable domain of `hostCol` as `out`.
    *
    * PSL algorithm for plain rules: the public suffix is the LONGEST
    * listed rule matching a suffix of the host's label sequence (default
    * rule: the bare last label); the registrable domain is that suffix
    * plus one more label, or NULL when the host IS a public suffix (or
    * is empty/unparseable).
    *
    * Plan shape: one candidate-suffix column per rule length (bounded by
    * the longest rule in the list, not by host length) and one BROADCAST
    * hash equi-join per length against the rules of that length — zero
    * shuffles, no explode/re-aggregate per host, stays in whole-stage
    * codegen. The full ~9k-rule PSL changes nothing: it is still a
    * handful of broadcast joins against a few-KB side. */
  def withRegistrableDomain(df: DataFrame, hostCol: String, out: String): DataFrame = {
    val spark = df.sparkSession
    val psl = pslTable(spark)
    val lbl = s"__psl_lbl"
    var cur = df.withColumn(lbl, split(col(hostCol), "\\."))
    for (k <- 1 to pslMaxLabels) {
      val side = broadcast(psl.filter(col("nl") === k).select(col("sfx").as(s"__psl_m$k")))
      cur = cur.join(side,
        when(size(col(lbl)) >= k, array_join(slice(col(lbl), -k, k), "."))
          .otherwise(lit(null)) === col(s"__psl_m$k"),
        "left")
    }
    val matched = coalesce(
      ((pslMaxLabels to 1 by -1).map(k =>
        when(col(s"__psl_m$k").isNotNull, lit(k))) :+ lit(1)): _*)
    cur
      .withColumn(out,
        when(length(col(hostCol)) === 0, lit(null).cast("string"))
          .otherwise(when(size(col(lbl)) > matched,
            array_join(slice(col(lbl), -(matched + lit(1)), matched + lit(1)), "."))))
      .drop((lbl +: (1 to pslMaxLabels).map(k => s"__psl_m$k")): _*)
  }
}
