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
    * grouping treats unparseable URLs as one bucket). The character
    * class excludes path/port/query/fragment delimiters, so
    * `https://Host.Example.com:8080/p?q#f` → `host.example.com:8080` is
    * avoided — the port stops the match: → `host.example.com`. */
  def urlHost(u: Column): Column =
    lower(regexp_extract(u, "^https?://([^/:?#]+)", 1))

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
