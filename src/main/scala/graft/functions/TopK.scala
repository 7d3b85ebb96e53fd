package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregator: keeps at most k (id, score) pairs ordered by
  * (score desc, id asc) — the typed `Aggregator[IN, BUF, OUT]` alternative
  * to `row_number() OVER (ORDER BY score DESC)` for per-group top-k.
  *
  * Scale rationale: the window formulation sorts every group's full
  * candidate list (and with partial aggregation disabled, ships it whole
  * through the shuffle); this aggregator's buffer is O(k) per group on the
  * map side, so a 10^6-candidate group shuffles k rows, not 10^6. Merge is
  * a bounded merge of two sorted arrays.
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def insert(buf: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] = {
    if (buf.size == k && !better(x, buf.last)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      (pre :+ x) ++ post.take(k - pre.size - 1)
    }
  }

  override def zero: Seq[(Long, Double)] = Seq.empty

  override def reduce(buf: Seq[(Long, Double)], in: (Long, Double)): Seq[(Long, Double)] =
    insert(buf, in)

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
}

/** Bounded bottom-k STRINGS: keeps the k lexicographically smallest input
  * strings (duplicates kept). Same O(k) map-side-state rationale as
  * [[TopKAggregator]] — the bounded replacement for `row_number() OVER
  * (PARTITION BY g ORDER BY s) <= k` when a group's candidate list is
  * large: the window sorts and ships the whole group, this buffer ships k
  * rows. Basis of [[graft.operators.QuotaSample]]'s deterministic
  * fixed-quota sampling. */
class BottomKAggregator(k: Int)
  extends Aggregator[String, Seq[String], Seq[String]] {

  private def insert(buf: Seq[String], x: String): Seq[String] =
    if (x == null) buf
    else if (buf.size == k && x >= buf.last) buf
    else {
      val (pre, post) = buf.span(_ <= x)
      (pre :+ x) ++ post.take(k - pre.size - 1)
    }

  override def zero: Seq[String] = Seq.empty
  override def reduce(buf: Seq[String], in: String): Seq[String] = insert(buf, in)
  override def merge(a: Seq[String], b: Seq[String]): Seq[String] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[String]): Seq[String] = buf
  override def bufferEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}

/** [[TopKAggregator]] for string-keyed counts: at most k (term, cnt) pairs
  * ordered by (cnt desc, term asc) — the bounded replacement for
  * `row_number() OVER (PARTITION BY g ORDER BY cnt DESC, term)` when the
  * partition key has low cardinality and a window would funnel each
  * group's full term list through one task. */
class TopKTermsAggregator(k: Int)
  extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {

  private def better(a: (String, Long), b: (String, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def insert(buf: Seq[(String, Long)], x: (String, Long)): Seq[(String, Long)] = {
    if (buf.size == k && !better(x, buf.last)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      (pre :+ x) ++ post.take(k - pre.size - 1)
    }
  }

  override def zero: Seq[(String, Long)] = Seq.empty
  override def reduce(buf: Seq[(String, Long)], in: (String, Long)): Seq[(String, Long)] =
    insert(buf, in)
  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] = buf
  override def bufferEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}

/** Bounded bottom-k DISTINCT longs: keeps the k smallest distinct input
  * values, ascending. The KMV/theta sketch buffer ([[graft.operators
  * .KmvSketch]]): O(k) map-side state, shuffle ships ≤ k values per
  * partition — never the distinct key set itself (which is exactly the
  * shuffle a sketch exists to avoid). Once the buffer saturates, rows
  * hashing above its largest value reject in O(1); the O(k) dedup scan
  * only runs for rows that would actually enter. */
class BottomKDistinctLongAggregator(k: Int)
  extends Aggregator[Long, Seq[Long], Seq[Long]] {

  private def insert(buf: Seq[Long], x: Long): Seq[Long] =
    if (buf.size == k && x >= buf.last) buf
    else if (buf.contains(x)) buf
    else {
      val (pre, post) = buf.span(_ < x)
      (pre :+ x) ++ post.take(k - pre.size - 1)
    }

  override def zero: Seq[Long] = Seq.empty
  override def reduce(buf: Seq[Long], in: Long): Seq[Long] = insert(buf, in)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[Long]): Seq[Long] = buf
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object TopK {
  /** Untyped column form: `topK(5)(col("id"), col("score"))` → array of
    * struct<_1: id, _2: score> ordered by (score desc, id asc). */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    (id, score) => fn(id, score)
  }

  /** `topTerms(3)(col("term"), col("cnt"))` → array of struct<_1: term,
    * _2: cnt> ordered by (cnt desc, term asc). */
  def topTerms(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKTermsAggregator(k),
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
    (term, cnt) => fn(term, cnt)
  }

  /** `bottomK(10)(col("s"))` → array of the k lexicographically smallest
    * strings, ascending. */
  def bottomK(k: Int): Column => Column = {
    val fn = udaf(new BottomKAggregator(k), Encoders.STRING)
    s => fn(s)
  }

  /** `bottomKDistinct(256)(col("h"))` → array of the k smallest DISTINCT
    * longs, ascending — the KMV sketch buffer. */
  def bottomKDistinct(k: Int): Column => Column = {
    val fn = udaf(new BottomKDistinctLongAggregator(k), Encoders.scalaLong)
    h => fn(h)
  }
}
