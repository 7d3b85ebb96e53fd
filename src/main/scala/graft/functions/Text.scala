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

  /** Unicode-clean crawl text, the cleanup pass ahead of fingerprinting /
    * shingling / equality dedup: NFC composition (native
    * [[graft.plans.NfcNormalize]] — one grapheme, one byte sequence),
    * control + format characters (`\p{Cc}\p{Cf}`: NUL, BEL, tabs,
    * zero-width spaces/joiners, BiDi marks) to spaces, whitespace
    * including NBSP collapsed, trimmed. Every step is the same regex
    * dialect subset in Java and RE2, so the whole pipeline replays in
    * DuckDB (gate q158). Idempotent by construction (spec-pinned). */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(call_function("graft_nfc", c), "[\\p{Cc}\\p{Cf}]", " "),
      "[\\s\\x{00A0}]+", " "))

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

  /** Gopher-style repetition signal: fraction of tokens that repeat an
    * earlier token (1 − distinct/total). High values flag boilerplate and
    * degenerate generations; a standard pre-training quality filter. */
  def repetitionRatio(c: Column): Column = repetitionRatioOf(tokens(c))

  /** Unigram repetition off a token-array expression. Prefer passing a
    * pre-aliased attribute when combined with other token-array consumers
    * in one projection (q54 computes both repetition ratios from ONE
    * aliased split — re-tokenizing per metric multiplies the scan cost). */
  def repetitionRatioOf(w: Column): Column =
    round(lit(1.0) - size(array_distinct(w)).cast("double") / size(w).cast("double"), 4)

  /** Phrase-level repetition: fraction of word bigrams that repeat.
    * Catches copy-paste runs the unigram ratio misses (a doc can repeat
    * every WORD without repeating any PHRASE).
    *
    * `w` must be a pre-materialized token-array attribute (project
    * [[tokens]] under an alias first, like [[graft.operators.Similarity]]
    * does with `shingleHashesOf`): the slices below evaluate `w` a constant
    * number of times, never per element — an inline `split` here is the
    * O(len²) HOF trap this repo measured at 23 s vs <1 s. */
  def bigramRepetitionRatioOf(w: Column): Column = {
    // zip token i with token i+1 via two aligned slices; no per-element
    // lambda ever touches `w` itself, so nothing re-evaluates per token
    val n = size(w)
    val bigrams = when(n >= 2,
      zip_with(slice(w, lit(1), n - 1), slice(w, lit(2), n - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(w)
    round(lit(1.0) - size(array_distinct(bigrams)).cast("double") /
      size(bigrams).cast("double"), 4)
  }

  /** Context-window chunking: split a document's tokens into overlapping
    * windows of `size` tokens advancing by `stride` (< size ⇒ overlap) —
    * how corpora are cut to a model's sequence length. Chunk i covers
    * tokens [i·stride+1, i·stride+size]; the last chunk starts at the
    * final stride boundary before the end, so every token lands in ≥ 1
    * chunk and no chunk is empty. Pure array HOFs — the chunking runs
    * inside the scan projection, nothing shuffles until the caller
    * aggregates.
    *
    * `w` must be a pre-materialized token-array attribute (see
    * [[bigramRepetitionRatioOf]]); the `transform` lambda slices `w` per
    * chunk, which is per-chunk work only when `w` is an attribute read —
    * with an inline `split` it would re-tokenize the document per chunk. */
  def chunkTokensOf(w: Column, size: Int, stride: Int): Column = {
    require(stride > 0 && size >= stride, "need 0 < stride <= size")
    val nTok = org.apache.spark.sql.functions.size(w)
    val nChunks = ceil(nTok.cast("double") / stride).cast("int")
    transform(sequence(lit(0), greatest(nChunks, lit(1)) - 1),
      i => array_join(slice(w, i * stride + 1, lit(size)), " "))
  }

  /** Content fingerprint over normalized text (md5 — matches DuckDB md5()). */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** 64-bit rolling-style fingerprint for internal dedup joins (xxhash64 is
    * seeded/stable across executors; cheaper than md5 strings at shuffle). */
  def fingerprint64(c: Column): Column = xxhash64(normalize(c))
}
