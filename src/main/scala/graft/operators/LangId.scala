package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Character-trigram language identification — the n-gram profile method
  * (Cavnar & Trenkle-style) expressed as a broadcast join instead of a
  * per-row UDF loop:
  *
  *   doc → explode char trigrams → broadcast-join tiny profile table
  *       → groupBy(doc, lang) sum weights → max_by argmax per doc
  *
  * Shape at 100 TB: the profile table is O(langs × trigrams) ≈ KBs and
  * broadcasts; the only shuffle is the per-doc aggregation, which is the
  * minimum any per-document scoring needs. The profile below is a compact
  * built-in seed (trigrams of frequent function words per language); a
  * production profile would be trained offline and loaded the same way.
  */
object LangId {

  /** Seed words per language (public common function words). zh has no
    * entry: Chinese runs without word spacing, so space-padded word
    * trigrams can never match running text — zh resolves through the
    * Han char-range vote instead (see [[predict]]). */
  private val seedWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "that", "with", "this", "from", "have", "are"),
    "es" -> Seq("que", "los", "las", "por", "con", "para", "una", "del"),
    "de" -> Seq("der", "die", "und", "den", "von", "das", "mit", "sich"),
    "fr" -> Seq("les", "des", "que", "une", "dans", "pour", "par", "sur"))

  /** Unified CJK Han block, shared verbatim by the Spark expression and the
    * DuckDB oracle (both Java regex and RE2 accept the \x{...} class). */
  val HanRange = "[^\\x{4e00}-\\x{9fff}]"

  /** (lang, trigram, weight) profile rows derived from the seed words,
    * padded like running text (" word "). Public so the correctness oracle
    * can inline the exact same profile as SQL VALUES. */
  def profileRows: Seq[(String, String, Double)] =
    (for {
      (lang, words) <- seedWords.toSeq
      w <- words
      padded = s" $w "
      i <- 0 to padded.length - 3
    } yield (lang, padded.substring(i, i + 3)))
      .groupBy(identity).map { case ((lang, tg), hits) => (lang, tg, hits.size.toDouble) }
      .toSeq

  /** The same base-257 positional encoding graft.plans.CharGramHashes
    * computes over UTF-8 bytes — injective for grams of <= 8 bytes, so a
    * hashed trigram join is exactly equivalent to a string trigram join. */
  def trigramHash(s: String): Long =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .foldLeft(0L)((h, b) => h * 257L + (b & 0xFF))

  /** (idCol, pred_lang, score) — argmax language per document; docs whose
    * trigrams match no profile get pred_lang = 'und'.
    *
    * Zero-shuffle scoring: the profile is a compile-time constant, so each
    * language's trigram→weight table is baked in as a foldable map LITERAL
    * (constant-folded once, not rebuilt per element) and each language
    * score is an `aggregate` fold over the doc's gram-hash array inside
    * the scan projection — no explode, no broadcast join, no per-doc
    * aggregation exchange. The earlier formulation (explode → broadcast
    * profile join → groupBy(doc, lang) → argmax) shuffled ~len(doc) rows
    * per document twice; at 100 TB the scoring stage now shuffles nothing
    * (per-doc scoring is embarrassingly parallel and lives with the scan).
    * Argmax = array_max over struct(score, lang) — lexicographic struct
    * order IS (score DESC, lang DESC tie-break), the oracle's rule.
    *
    * zh (ADVICE r2): documents whose non-whitespace text is majority Han
    * characters vote 'zh' directly with score = Han char count — the
    * char-range vote, since unspaced CJK can never match a space-padded
    * word-trigram profile. The vote is a pure Column expression replayed
    * verbatim by the q27 oracle. */
  def predict(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val byLang: Seq[(String, Seq[(Long, Double)])] = profileRows
      .groupBy(_._1).view.mapValues(_.map { case (_, tg, w) => (trigramHash(tg), w) })
      .toSeq.sortBy(_._1)
    // Alias the normalized padded text BEFORE the gram expression:
    // embedding `normalize(text)` as a raw expression at both use sites
    // (length + lambda body) would duplicate the regexp per trigram element
    // (O(len²) per doc — measured 23s vs <1s at sf0.1). As a multi-referenced
    // non-cheap alias, CollapseProject keeps it a separate projection.
    // Same trap for the gram ARRAY: aliased once, folded over per language.
    val prepared = docs.select(col(idCol),
      concat(lit(" "), Text.normalize(col(textCol)), lit(" ")).as("_padded"))
    val withGrams = prepared.select(col(idCol), col("_padded"),
      call_function("char_gram_hashes", col("_padded"), lit(3), lit(false)).as("_g"))
    val scoreCols = byLang.map { case (lang, entries) =>
      val weightOf = map(entries.flatMap { case (h, w) => Seq(lit(h), lit(w)) }: _*)
      aggregate(col("_g"), lit(0.0),
        (acc, h) => acc + coalesce(element_at(weightOf, h), lit(0.0))).as(s"_s_$lang")
    }
    val best = array_max(array(byLang.map { case (lang, _) =>
      struct(col(s"_s_$lang").as("score"), lit(lang).as("lang"))
    }: _*))
    withGrams
      .select(col(idCol) +: col("_padded") +: scoreCols: _*)
      .select(col(idCol),
        length(regexp_replace(col("_padded"), HanRange, "")).as("_han"),
        length(regexp_replace(col("_padded"), "\\s", "")).as("_nws"),
        best.as("_best"))
      .select(col(idCol),
        when(col("_han") > 0 && col("_han") * 2 >= col("_nws"), lit("zh"))
          .when(col("_best.score") > 0.0, col("_best.lang"))
          .otherwise(lit("und")).as("pred_lang"),
        when(col("_han") > 0 && col("_han") * 2 >= col("_nws"),
          col("_han").cast("double"))
          .otherwise(when(col("_best.score") > 0.0, col("_best.score")).otherwise(lit(0.0)))
          .as("score"))
  }
}
