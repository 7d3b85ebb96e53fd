package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the training-data pipeline: token
  * counting, quality scoring, language ID, document fingerprinting.
  *
  * All are pure `Column` expressions (no UDFs) so they stay inside Catalyst
  * and get pushed/pruned/codegen'd where Spark supports it — at 100 TB the
  * difference between a codegen'd expression and a Scala UDF on the scan
  * path is the whole game.
  */
object Text {

  /** Canonical whitespace/caseless normalization used before fingerprinting. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokens (documents are single-space separated). */
  def tokens(c: Column): Column = split(c, " ")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish lexer token count: alpha runs, digit runs, and single
    * non-alnum-non-space chars each count as one token. */
  def lexTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")

  /** English stopwords (tiny public list) — basis of the quality score. */
  val stopwordsEn: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "it")
  val stopwordsEs: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un", "por")
  val stopwordsDe: Seq[String] = Seq("der", "die", "und", "den", "von", "zu", "das", "mit")
  val stopwordsFr: Seq[String] = Seq("le", "les", "des", "et", "du", "une", "dans", "pour")

  def stopwordCount(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), w => w.isin(words: _*))).cast("long")

  /** Document quality score in [0,1]: blends stopword ratio (natural prose
    * has some), mean word length sanity (2..12 chars), and length floor.
    * Deterministic closed form — mirrored 1:1 in the DuckDB oracle. */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c)
    val swRatio = stopwordCount(c, stopwordsEn).cast("double") / nTok.cast("double")
    val meanWordLen = length(c).cast("double") / nTok.cast("double")
    val lenOk = when(nTok >= 20, lit(1.0)).otherwise(nTok.cast("double") / lit(20.0))
    round(least(lit(1.0), swRatio * 2.0) * 0.4
      + when(meanWordLen.between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0)) * 0.3
      + lenOk * 0.3, 4)
  }

  /** Stopword-vote language ID with a deterministic priority tie-break
    * (en > es > de > fr, else 'und'). A char-n-gram profile variant lives in
    * the scale path; this closed form is oracle-comparable. */
  def langGuess(c: Column): Column = {
    val en = stopwordCount(c, stopwordsEn)
    val es = stopwordCount(c, stopwordsEs)
    val de = stopwordCount(c, stopwordsDe)
    val fr = stopwordCount(c, stopwordsFr)
    when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }

  /** Content fingerprint over normalized text (md5 — matches DuckDB md5()). */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** 64-bit rolling-style fingerprint for internal dedup joins (xxhash64 is
    * seeded/stable across executors; cheaper than md5 strings at shuffle). */
  def fingerprint64(c: Column): Column = xxhash64(normalize(c))
}
