package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative byte-pair-encoding vocabulary induction + tokenizer apply —
  * the operator a training-data pipeline tokenizes with (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units",
  * the standard word-level BPE formulation: split distinct words into
  * characters, repeatedly merge the globally most frequent adjacent
  * symbol pair). Extends q56's single-round pair statistic into the full
  * K-round trainer plus the merge-application path.
  *
  * State encoding: each word's symbol sequence is ONE string,
  * `"||s1||s2||...||"`. The double separator makes greedy left-to-right
  * non-overlapping merge application exactly a string `replace`:
  * searching `"|a||b|"` consumes the shared boundary so an overlapping
  * second occurrence (`a b a b`) still matches, while a self-overlap
  * (`a a a` under pair `(a,a)`) correctly merges only the first two —
  * both the semantics Sennrich's reference merge loop has, and both
  * engines (Spark `replace`, DuckDB `replace`) implement the same
  * left-to-right scan, which is what lets the oracle replay training
  * bit for bit. Symbols are substrings of corpus words; words containing
  * the separator character `|` are excluded from vocabulary up front
  * (contract, enforced in [[wordVocab]]).
  *
  * Scale shape: training state is the DISTINCT-WORD vocabulary with
  * counts — Heaps'-law sized, far below corpus size — persisted once and
  * rewritten per round by a codegen'd `replace` projection. Each round
  * is ONE symbol-pair hash aggregate over the vocabulary plus a
  * driver-side argmax of one row (the q62 convergence-loop precedent:
  * driver coordinates rounds, executors do all the data work; the
  * `.limit(1).collect()` is bounded). Rounds are K by construction, so
  * the loop is K small jobs, not a data-dependent fixpoint. Apply is a
  * pure expression chain (K `replace`s) — codegen'd, shuffle-free,
  * usable directly in a scan projection at any corpus size.
  */
object Bpe {

  /** One learned merge: `rank` is 1-based round order; `merged` is the
    * plain concatenation the pair collapses into. */
  final case class Merge(rank: Int, lft: String, rgt: String,
                         merged: String, cnt: Long)

  /** Distinct-word vocabulary with counts from a text column. Empty
    * tokens (split artifacts) and words containing the separator `|`
    * are excluded — the contract of the seq-string encoding. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(graft.functions.Text.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) >= 1 && !col("word").contains("|"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** `"||c1||c2||...||"` — the initial character-level symbol sequence.
    * `w` must be an aliased attribute (the lambda references it per
    * character — the O(len²) HOF re-evaluation trap otherwise). */
  def initialSeq(w: Column): Column =
    concat(lit("||"),
      concat_ws("||", transform(sequence(lit(1), length(w)),
        i => substr(w, i, lit(1)))),
      lit("||"))

  /** Symbol array of a seq string (split on the double separator, empty
    * boundary artifacts dropped). */
  def symbolsOf(seq: Column): Column =
    filter(split(seq, "\\|\\|"), x => x =!= "")

  /** Train `rounds` merges over a (word, cnt) vocabulary. Each round:
    * one pair-count aggregate (occurrence-counted, overlapping — the
    * Sennrich get_stats convention), deterministic argmax (count desc,
    * then pair lexicographically), one `replace` rewrite. Stops early
    * only if no adjacent pair exists at all (every word fully merged). */
  def train(vocab: DataFrame, rounds: Int): Seq[Merge] = {
    require(rounds >= 1 && rounds <= 64, s"rounds=$rounds out of [1,64]")
    val spark = vocab.sparkSession
    var seqs = vocab.select(col("word"), col("cnt"),
        initialSeq(col("word")).as("seq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    seqs.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    try {
      for (r <- 1 to rounds) {
        val best = seqs
          .select(col("cnt"), symbolsOf(col("seq")).as("_s"))
          .select(col("cnt"), explode(
            when(size(col("_s")) >= 2,
              transform(sequence(lit(1), size(col("_s")) - 1),
                i => struct(element_at(col("_s"), i).as("l"),
                  element_at(col("_s"), i + 1).as("r"))))
              .otherwise(array().cast("array<struct<l:string,r:string>>")))
            .as("p"))
          .groupBy(col("p.l"), col("p.r"))
          .agg(sum(col("cnt")).as("total"))
          .orderBy(col("total").desc, col("l"), col("r"))
          .limit(1).collect()
        if (best.isEmpty) return merges.toSeq
        val (l, rr, total) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += Merge(r, l, rr, l + rr, total)
        val next = seqs.withColumn("seq",
            replace(col("seq"), lit(s"|$l||$rr|"), lit(s"|$l$rr|")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count()
        seqs.unpersist()
        seqs = next
      }
      merges.toSeq
    } finally seqs.unpersist()
  }

  /** Apply learned merges, in rank order, to a WORD column: the
    * tokenizer path. Returns the final seq string; a new word (not in
    * the training vocabulary) segments by the same greedy rule. Pure
    * expression chain — no join, no shuffle, no state. `w` must be an
    * aliased attribute (see [[initialSeq]]). */
  def applyMerges(w: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(initialSeq(w)) { (acc, m) =>
      replace(acc, lit(s"|${m.lft}||${m.rgt}|"), lit(s"|${m.merged}|"))
    }

  /** Subword token count of an applied seq string. */
  def tokenCountOf(seq: Column): Column =
    size(symbolsOf(seq)).cast("long")
}
