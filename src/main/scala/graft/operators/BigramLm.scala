package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Bigram language-model scoring with add-one smoothing — the "perplexity
  * against a reference corpus" quality signal of CCNet-lineage pipelines
  * (Wenzek et al. 2020 score with a Wikipedia-trained KenLM; the n-gram
  * machinery here is the same, order 2, with the simplest replayable
  * smoothing): P(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁·) + V), doc score =
  * mean log₁₀ P over the doc's bigrams. Upgrades [[graft.SparkEntry]]'s
  * q57 unigram scorer with first-order context: word-salad docs whose
  * unigrams are individually common (high unigram score) but whose
  * TRANSITIONS are improbable now score low.
  *
  * Model = three frames, all relational and mergeable: bigram counts
  * (vocabulary²-bounded, in practice Heaps-law-sized), left-context
  * counts DERIVED from the bigram counts (one vocabulary-sized aggregate,
  * not a second corpus scan), and the 1-row vocab size. Scoring attaches
  * the two count frames by plain equi-joins on the gram key — the q75
  * attach-join shape; count frames are deliberately NOT broadcast-hinted
  * (vocabulary grows with the corpus; AQE downgrades when small) — and
  * the 1-row V frame is an explicit broadcast. Unseen bigrams hit the
  * left-join null path: (0 + 1)/(c(w₁·) + V), unseen left contexts
  * (0 + 1)/(0 + V) — so a model trained once scores ANY batch, the
  * incremental-scoring shape (train on reference, score forever).
  * Docs with fewer than 2 tokens have no bigrams and no score. */
object BigramLm {

  /** Positional bigram strings from a token-ARRAY attribute (pass an
    * aliased attribute — the HOF-trap contract of
    * [[Similarity.shingleHashesOf]]). Tokens are space-split so the
    * "w₁ w₂" encoding is collision-free. */
  def bigramsOf(w: Column): Column =
    when(size(w) >= 2,
      transform(sequence(lit(0), size(w) - 2),
        i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** A trained model: (bigram counts `b/cb`, left-context counts `l/cl`,
    * vocab size `v`). */
  case class Model(bigrams: DataFrame, lefts: DataFrame, vocab: DataFrame)

  /** Train on a reference corpus — one corpus scan for the bigram
    * aggregate plus one for the distinct-token vocab count; left counts
    * derive from the (much smaller) bigram frame. */
  def train(docs: DataFrame, textCol: String): Model = {
    val cb = docs.select(Text.tokens(col(textCol)).as("_w"))
      .select(explode(bigramsOf(col("_w"))).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cb"))
    val cl = cb.select(substring_index(col("b"), " ", 1).as("l"), col("cb"))
      .groupBy(col("l")).agg(sum(col("cb")).as("cl"))
    val v = docs.select(explode(Text.tokens(col(textCol))).as("_t"))
      .agg(count_distinct(col("_t")).as("v"))
    Model(cb, cl, v)
  }

  /** (id, n_bigrams, doc_lp·4dp) for every doc with ≥ 2 tokens: doc_lp =
    * mean log₁₀ of the smoothed bigram probabilities under `model`.
    * `keep` columns ride along (group keys for a downstream rollup). */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
                model: Model, keep: Seq[String] = Seq.empty): DataFrame = {
    val keepCols = keep.map(col)
    val db = docs
      .select(col(idCol) +: Text.tokens(col(textCol)).as("_w") +: keepCols: _*)
      .select(col(idCol) +: explode(bigramsOf(col("_w"))).as("b") +: keepCols: _*)
      .withColumn("l", substring_index(col("b"), " ", 1))
    db.join(model.bigrams, Seq("b"), "left")
      .join(model.lefts, Seq("l"), "left")
      .crossJoin(broadcast(model.vocab))
      .withColumn("_lp", log10(
        (coalesce(col("cb"), lit(0L)) + lit(1)).cast("double") /
          (coalesce(col("cl"), lit(0L)) + col("v")).cast("double")))
      .groupBy((col(idCol) +: keepCols): _*)
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("_lp")), 4).as("doc_lp"))
  }
}
