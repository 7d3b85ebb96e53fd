package graft.functions

import org.apache.spark.sql.Column
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
    * (.co.uk) need a public-suffix list lookup — a broadcast map join at
    * scale — which this deliberately does not embed. */
  def registrableDomain(host: Column): Column =
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
}
