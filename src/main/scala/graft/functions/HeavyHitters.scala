package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items summary (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS'12): at most
  * `capacity` counters of bounded-undercount term frequencies, plus the
  * exact stream length. The deterministic, mergeable alternative to a
  * full `groupBy(term).count()` when the term domain is vocabulary-sized:
  * the groupBy shuffles EVERY distinct term (Heaps'-law vocabularies
  * reach 10^8+ at corpus scale) to answer a question whose output is a
  * handful of rows; this summary's state is O(capacity) per partition
  * and the shuffle ships one buffer per partition, not the vocabulary.
  *
  * Guarantees (hold under ANY merge tree — Spark's partial aggregation
  * included): no counter overcounts; every counter undercounts by at
  * most n/(capacity+1); hence every term with true frequency
  * > n/(capacity+1) is present in the summary. The summary alone does
  * not bound which OTHER terms appear — callers wanting the exact
  * heavy-hitter set rescore candidates exactly
  * ([[graft.operators.HeavyHitters.exact]]).
  *
  * Buffer is (n, counters); null terms are ignored entirely (not
  * counted in n — a null is the absence of a term, not a term).
  */
class MisraGriesAggregator(capacity: Int)
  extends Aggregator[String, (Long, Map[String, Long]), (Long, Seq[(String, Long)])] {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def zero: (Long, Map[String, Long]) = (0L, Map.empty)

  override def reduce(buf: (Long, Map[String, Long]), t: String): (Long, Map[String, Long]) = {
    if (t == null) buf
    else {
      val (n, m) = buf
      m.get(t) match {
        case Some(c) => (n + 1, m.updated(t, c + 1))
        case None if m.size < capacity => (n + 1, m.updated(t, 1L))
        case None =>
          // classic MG step: the arriving term and every counter give up
          // one unit; zeroed counters free their slot
          (n + 1, m.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None })
      }
    }
  }

  override def merge(a: (Long, Map[String, Long]),
                     b: (Long, Map[String, Long])): (Long, Map[String, Long]) = {
    val combined = b._2.foldLeft(a._2) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    val trimmed =
      if (combined.size <= capacity) combined
      else {
        // subtract the (capacity+1)-th largest count from everything and
        // drop the non-positive — the PODS'12 rule that preserves the
        // n/(capacity+1) undercount bound across arbitrary merge trees
        val cut = combined.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse)
          .apply(capacity)
        combined.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
      }
    (a._1 + b._1, trimmed)
  }

  /** (n, candidates sorted by count desc then term asc). */
  override def finish(buf: (Long, Map[String, Long])): (Long, Seq[(String, Long)]) =
    (buf._1, buf._2.toSeq.sortBy { case (t, c) => (-c, t) })

  override def bufferEncoder: Encoder[(Long, Map[String, Long])] = ExpressionEncoder()
  override def outputEncoder: Encoder[(Long, Seq[(String, Long)])] = ExpressionEncoder()
}

object MisraGries {
  /** Column form: `misraGries(100)(col("term"))` → one
    * struct<_1: n, _2: array<struct<_1: term, _2: est>>> per group. */
  def misraGries(capacity: Int): Column => Column = {
    val fn = udaf(new MisraGriesAggregator(capacity), Encoders.STRING)
    term => fn(term)
  }
}
