package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String, Long, Long)*) =
    rows.toSeq.toDF("user_id", "et", "us", "eid")
      .select(col("user_id"), col("et"),
        timestamp_micros(col("us") * 1000000L).as("ts"), col("eid"))

  test("hand-built matrix: counts and row-normalized probabilities") {
    // u1: A→B→A→C ; u2: A→B — transitions: A→B ×2, B→A, A→C
    val d = df((1L, "A", 1L, 1L), (1L, "B", 2L, 2L), (1L, "A", 3L, 3L),
      (1L, "C", 4L, 4L), (2L, "A", 1L, 5L), (2L, "B", 2L, 6L))
    val m = Transitions.matrix(d, "user_id", "et", "ts", "eid").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(m == Map(
      ("A", "B") -> ((2L, 0.666667)),
      ("A", "C") -> ((1L, 0.333333)),
      ("B", "A") -> ((1L, 1.0))))
  }

  test("sequences never cross users") {
    val d = df((1L, "A", 1L, 1L), (2L, "B", 2L, 2L))
    assert(Transitions.matrix(d, "user_id", "et", "ts", "eid").isEmpty,
      "two single-event users share no transition")
  }

  test("same-timestamp bursts order deterministically by the tie-break") {
    val d = df((1L, "X", 5L, 10L), (1L, "Y", 5L, 11L), (1L, "Z", 5L, 12L))
    val got = Transitions.matrix(d, "user_id", "et", "ts", "eid").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("X", "Y"), ("Y", "Z")),
      s"tie order must follow event_id: $got")
  }

  test("a null-typed event BREAKS the sequence instead of splicing") {
    // A, ∅, B: A and B were never consecutive — no A→B transition
    val d = Seq((1L, Option("A"), 1L, 1L), (1L, Option.empty[String], 2L, 2L),
      (1L, Option("B"), 3L, 3L))
      .toDF("user_id", "et", "us", "eid")
      .select(col("user_id"), col("et"),
        timestamp_micros(col("us") * 1000000L).as("ts"), col("eid"))
    assert(Transitions.matrix(d, "user_id", "et", "ts", "eid").isEmpty,
      "null-typed middle event must stop adjacency from splicing")
  }

  test("null tie-break rows are dropped (engines disagree on null sort order)") {
    val d = Seq((1L, "A", 1L, Option(1L)), (1L, "B", 2L, Option.empty[Long]),
      (1L, "C", 3L, Option(3L)))
      .toDF("user_id", "et", "us", "eid")
      .select(col("user_id"), col("et"),
        timestamp_micros(col("us") * 1000000L).as("ts"), col("eid"))
    val got = Transitions.matrix(d, "user_id", "et", "ts", "eid").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("A", "C")),
      s"the null-eid row must vanish from the sequence entirely: $got")
  }

  test("randomized: matrix ≡ brute-force sequence walk") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.tabulate(300)(i =>
        (rnd.nextInt(15).toLong, Seq("A", "B", "C")(rnd.nextInt(3)),
          rnd.nextInt(40).toLong, i.toLong)) // coarse ts → real ties
      val evs = rows.toDF("user_id", "et", "us", "eid")
        .select(col("user_id"), col("et"),
          timestamp_micros(col("us") * 1000000L).as("ts"), col("eid"))
      val got = Transitions.matrix(evs, "user_id", "et", "ts", "eid")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val brute = rows.groupBy(_._1).values.flatMap { es =>
        val ordered = es.sortBy(e => (e._3, e._4)).map(_._2)
        ordered.zip(ordered.tail)
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got == brute, s"seed $seed: $got vs $brute")
    }
  }

  test("probabilities sum to 1 per from_type on the real fixture") {
    val m = Transitions.matrix(graft.Tables.events(spark, sfDir),
      "user_id", "event_type", "ts", "event_id")
    val sums = m.groupBy(col("from_type")).agg(sum(col("prob")).as("s"))
      .collect().map(_.getDouble(1))
    assert(sums.nonEmpty && sums.forall(s => math.abs(s - 1.0) < 1e-4), sums.toSeq.toString)
  }
}
