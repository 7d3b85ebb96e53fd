package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Benchmark decontamination — remove (or flag) training documents that
  * share any word n-gram with a held-out evaluation set, so eval answers
  * cannot leak into the training corpus. The standard published recipe is
  * 8-13-gram overlap against each benchmark's text.
  *
  * Scale shape: the two sides are wildly asymmetric — benchmarks are
  * megabytes, the corpus is the 100 TB side. So the eval set's distinct
  * gram hashes are built first (tiny) and BROADCAST; the corpus side then
  * explodes its grams in the scan projection and LEFT SEMI joins against
  * the broadcast set — one pass over the corpus, zero corpus shuffles
  * before the per-doc distinct. Grams travel as xxhash64 of their k
  * tokens ([[Similarity.shingleHashesOf]]): no n-gram string is ever
  * materialized or shuffled, and a hash collision can only over-flag
  * (never leak) a document.
  */
object Decontaminate {

  private def gramHashes(docs: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame =
    docs.select(col(idCol), Text.tokens(col(textCol)).as("_w"))
      .select(col(idCol), explode(Similarity.shingleHashesOf(col("_w"), n)).as("gram"))

  /** Distinct ids of training docs sharing ≥1 n-gram with the eval set —
    * the broadcast-semi-join pass both public methods hang off. */
  private def hitIds(docs: DataFrame, evalDocs: DataFrame,
                     idCol: String, textCol: String, n: Int): DataFrame = {
    val evalGrams = gramHashes(evalDocs, idCol, textCol, n)
      .select(col("gram")).distinct()
    gramHashes(docs, idCol, textCol, n)
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** Training docs sharing ≥1 n-gram with the eval set. `docs` may carry
    * extra columns; they are preserved on the result via the final
    * semi-join back (so callers can aggregate by any of them). */
  def contaminated(docs: DataFrame, evalDocs: DataFrame,
                   idCol: String, textCol: String, n: Int = 8): DataFrame =
    docs.join(hitIds(docs, evalDocs, idCol, textCol, n), Seq(idCol), "left_semi")

  /** The keep side: training docs with NO n-gram overlap with the eval
    * set — the actual decontaminated corpus a pipeline writes out. */
  def clean(docs: DataFrame, evalDocs: DataFrame,
            idCol: String, textCol: String, n: Int = 8): DataFrame =
    docs.join(hitIds(docs, evalDocs, idCol, textCol, n), Seq(idCol), "left_anti")
}
