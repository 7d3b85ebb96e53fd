package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier (McCallum & Nigam, AAAI'98
  * workshop formulation) — the language-ID / quality-filter shape a
  * curation pipeline actually trains: per-class token counts + Laplace
  * smoothing, argmax_c [ln P(c) + Σ_tok ln P(tok|c)]. The engine
  * already scores text with FIXED heuristics ([[LangId]], quality
  * ratios); this is the TRAINED counterpart, and its training state is
  * nothing but counts — so the model is mergeable and folds through
  * [[IncrementalAgg.foldStateIntoStore]] like every other count state
  * (the classifier stays current per ingest micro-batch; q148).
  *
  * Scale shapes:
  *   - TRAIN = one hash aggregate over the tokenized corpus → rows
  *     (class, term, cnt), plus one doc-count row per class (term
  *     NULL) — a "model-sized" frame (vocab × classes), tiny next to
  *     the corpus, stored as a table like any other model.
  *   - CLASSIFY = tokenize the batch, fan out tokens × classes (class
  *     count is small — broadcast), LEFT-join the term-class log-prob
  *     frame (broadcast — model-sized), coalesce misses to the
  *     smoothing floor ln(α/(total_c + α·V)) — unknown tokens MUST
  *     contribute the floor, not drop out, or long out-of-vocabulary
  *     docs lose their length penalty — then one (doc, class) sum and
  *     a max_by argmax. No window, no driver loop.
  *
  * Determinism contract: scores are sums of ln of EXACT count ratios;
  * the per-(doc, class) addition order differs between engines only at
  * ~1e-13, far below any real class gap, and the gate compares the
  * argmax CONFUSION MATRIX (integer counts), not raw scores. Ties
  * break to the lexicographically smallest class in both engines. */
object NaiveBayes {

  /** Mergeable training state: (class, term, cnt) token counts, plus
    * one (class, NULL, cnt) row per class carrying its DOCUMENT count
    * (the prior's numerator). Merging is groupBy-sum — NULL terms
    * group with NULL ([[mergeStates]]), so the doc-count rows fold
    * exactly like token rows. */
  def state(docs: DataFrame, classCol: String, textCol: String): DataFrame = {
    val clean = docs.filter(col(classCol).isNotNull && col(textCol).isNotNull)
    val tokens = clean
      .select(col(classCol).as("class"),
        explode(graft.functions.Text.tokens(col(textCol))).as("term"))
      .groupBy(col("class"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val docCounts = clean.groupBy(col(classCol).as("class"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("class"), lit(null).cast("string").as("term"), col("cnt"))
    tokens.unionByName(docCounts)
  }

  /** Fold state frames: plain group-sum over (class, term) with
    * null-safe term grouping. */
  def mergeStates(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "mergeStates needs at least one state frame")
    states.reduce(_.unionByName(_))
      .groupBy(col("class"), col("term"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Replay-idempotent streaming maintenance of the classifier. */
  def foldIntoStore(store: ParquetTableStore, name: String, batch: DataFrame,
                    classCol: String, textCol: String,
                    batchId: Long, epoch: String): Unit =
    IncrementalAgg.foldStateIntoStore(store, name,
      state(batch, classCol, textCol),
      (p, d) => mergeStates(p, d), batchId, epoch)

  /** Classify `docs` from a training state: (id, predicted, score·4dp)
    * — predicted = argmax class, ties to the smallest class name.
    * `alpha` is the Laplace pseudo-count. */
  def classify(stateDf: DataFrame, docs: DataFrame, idCol: String,
               textCol: String, alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, "Laplace alpha must be positive")
    val termRows = stateDf.filter(col("term").isNotNull)
    val docRows = stateDf.filter(col("term").isNull)
      .select(col("class"), col("cnt").as("n_docs"))
    // corpus constants: per-class token totals, total docs, vocab size
    val classTotals = termRows.groupBy(col("class"))
      .agg(sum(col("cnt")).as("total"))
      .join(docRows, Seq("class"))
    val consts = termRows.select(col("term")).distinct()
      .agg(count(lit(1)).as("v"))
      .crossJoin(docRows.agg(sum(col("n_docs")).as("all_docs")))
    // per-(term, class) log-likelihood and per-class floor + prior —
    // all model-sized, broadcast below
    val perClass = classTotals.crossJoin(consts)
      .select(col("class"),
        (log(col("n_docs").cast("double")) - log(col("all_docs").cast("double")))
          .as("logprior"),
        (log(lit(alpha)) -
          log(col("total").cast("double") + lit(alpha) * col("v")))
          .as("logfloor"),
        (col("total").cast("double") + lit(alpha) * col("v")).as("den"))
    val perTerm = termRows.join(perClass.select(col("class"), col("den")), Seq("class"))
      .select(col("class"), col("term"),
        (log(col("cnt").cast("double") + lit(alpha)) - log(col("den"))).as("logp"))
    val tokens = docs.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        explode(graft.functions.Text.tokens(col(textCol))).as("term"))
    val scored = tokens
      .crossJoin(broadcast(perClass.select(col("class"), col("logprior"), col("logfloor"))))
      .join(broadcast(perTerm), Seq("class", "term"), "left")
      .groupBy(col("id"), col("class"))
      .agg(first(col("logprior")).as("logprior"),
        sum(coalesce(col("logp"), col("logfloor"))).as("loglik"))
      .select(col("id"), col("class"),
        (col("logprior") + col("loglik")).as("score"))
    // argmax with ties to the smallest class name: max score per doc,
    // then min class among the (rare, exactly-equal) score ties — both
    // frames are doc × class sized, one co-keyed aggregate each
    val best = scored.groupBy(col("id")).agg(max(col("score")).as("score"))
    scored.join(best, Seq("id", "score"))
      .groupBy(col("id"), col("score"))
      .agg(min(col("class")).as("predicted"))
      .select(col("id").as(idCol), col("predicted"),
        round(col("score"), 4).as("score"))
  }

  /** Confusion matrix of a labeled evaluation set: (class, predicted,
    * n) — the gate's integer-exact summary of classifier behavior. */
  def confusion(stateDf: DataFrame, docs: DataFrame, idCol: String,
                classCol: String, textCol: String,
                alpha: Double = 1.0): DataFrame =
    classify(stateDf, docs, idCol, textCol, alpha)
      .join(docs.select(col(idCol), col(classCol).as("class")), Seq(idCol))
      .groupBy(col("class"), col("predicted"))
      .agg(count(lit(1)).as("n"))
}
