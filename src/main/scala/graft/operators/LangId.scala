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
    * zh (ADVICE r2): documents whose non-whitespace text is majority Han
    * characters vote 'zh' directly with score = Han char count — the
    * char-range vote, since unspaced CJK can never match a space-padded
    * word-trigram profile. The vote is a pure Column expression replayed
    * verbatim by the q27 oracle. */
  def predict(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // join on the injective trigram hash: the exploded doc side carries a
    // long instead of a per-position 3-char substring allocation
    val profile = profileRows.map { case (lang, tg, w) => (lang, trigramHash(tg), w) }
      .toDF("lang", "tgh", "w")
    // Alias the normalized padded text BEFORE the gram expression:
    // embedding `normalize(text)` as a raw expression at both use sites
    // (length + lambda body) would duplicate the regexp per trigram element
    // (O(len²) per doc — measured 23s vs <1s at sf0.1). As a multi-referenced
    // non-cheap alias, CollapseProject keeps it a separate projection.
    val prepared = docs.select(col(idCol),
      concat(lit(" "), Text.normalize(col(textCol)), lit(" ")).as("_padded"))
    val scored = prepared
      .select(col(idCol), explode(call_function("char_gram_hashes",
        col("_padded"), lit(3), lit(false))).as("tgh"))
      .join(broadcast(profile), "tgh")
      .groupBy(col(idCol), col("lang"))
      .agg(sum(col("w")).as("score"))
      .groupBy(col(idCol))
      .agg(max_by(struct(col("score"), col("lang")), struct(col("score"), col("lang"))).as("best"))
      .select(col(idCol), col("best.lang").as("pred_lang"), col("best.score").as("score"))
    prepared
      .select(col(idCol),
        length(regexp_replace(col("_padded"), HanRange, "")).as("_han"),
        length(regexp_replace(col("_padded"), "\\s", "")).as("_nws"))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        when(col("_han") > 0 && col("_han") * 2 >= col("_nws"), lit("zh"))
          .otherwise(coalesce(col("pred_lang"), lit("und"))).as("pred_lang"),
        when(col("_han") > 0 && col("_han") * 2 >= col("_nws"),
          col("_han").cast("double"))
          .otherwise(coalesce(col("score"), lit(0.0))).as("score"))
  }
}
