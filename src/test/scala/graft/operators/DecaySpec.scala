package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecaySpec extends SparkSpec {
  import spark.implicits._

  // asOf = 2024-01-02 00:00:00 UTC
  private val asOf = 1704153600000000L
  private val hour = 3600L * 1000000L

  private def df(rows: (String, Long, Double)*) =
    rows.toSeq.toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))

  test("hand-computed half-life weights") {
    // ages: 0h (w=1), 24h with halfLife 24 (w=0.5), 48h (w=0.25)
    val d = df(("a", asOf, 10.0), ("a", asOf - 24 * hour, 10.0),
      ("a", asOf - 48 * hour, 10.0))
    val r = Decay.scores(d, "k", "ts", "v", asOf, halfLifeHours = 24.0)
      .collect().head
    assert(r.getDouble(1) == 1.75, "1 + 0.5 + 0.25")
    assert(r.getDouble(2) == 17.5)
    assert(r.getLong(3) == 3L)
  }

  test("future events (ts > asOf) are excluded, not overweighted") {
    val d = df(("a", asOf + hour, 100.0), ("a", asOf, 1.0))
    val r = Decay.scores(d, "k", "ts", "v", asOf, 24.0).collect().head
    assert(r.getDouble(1) == 1.0 && r.getLong(3) == 1L)
  }

  test("recency dominance: a recent burst outranks a larger stale one") {
    val d = df(
      (("hot"), asOf - hour, 0.0), (("hot"), asOf - 2 * hour, 0.0),
      (("stale"), asOf - 2000 * hour, 0.0), (("stale"), asOf - 2001 * hour, 0.0),
      (("stale"), asOf - 2002 * hour, 0.0))
    val m = Decay.scores(d, "k", "ts", "v", asOf, 24.0).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("hot") > m("stale"),
      s"2 fresh events must outscore 3 ancient ones: $m")
  }

  test("decayed sums are mergeable: decay distributes over partial sums") {
    // score(asOf2) == score(asOf1) · 2^(−gap/halfLife) for a fixed set
    val d = df(("a", asOf - hour, 1.0), ("a", asOf - 5 * hour, 2.0))
    val s1 = Decay.scores(d, "k", "ts", "v", asOf, 24.0)
      .collect().head.getDouble(1)
    val gap = 12L
    val s2 = Decay.scores(d, "k", "ts", "v", asOf + gap * hour, 24.0)
      .collect().head.getDouble(1)
    val expected = s1 * math.pow(0.5, gap / 24.0)
    assert(math.abs(s2 - expected) < 1e-3,
      s"decay must distribute: $s2 vs $expected")
  }

  test("state + scoresFromState ≡ the batch scores, without rescanning") {
    val d = df(("a", asOf - hour, 2.0), ("a", asOf - 30 * hour, 4.0),
      ("b", asOf - 5 * hour, 1.0), ("b", asOf - 100 * hour, 8.0))
    val batch = Decay.scores(d, "k", "ts", "v", asOf, 24.0).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val st = Decay.state(d, "k", "ts", "v", 24.0)
    val fromState = Decay.scoresFromState(st, asOf, 24.0).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(fromState == batch, s"$fromState vs $batch")
  }

  test("merge across arbitrary splits ≡ the one-shot state") {
    val rows = (1 to 40).map(i =>
      (s"k${i % 3}", asOf - i.toLong * hour, i.toDouble))
    val all = df(rows: _*)
    val (s1, s2) = (df(rows.take(15): _*), df(rows.drop(15): _*))
    val merged = Decay.merge(Decay.state(s1, "k", "ts", "v", 24.0),
      Decay.state(s2, "k", "ts", "v", 24.0), 24.0)
    val one = Decay.scoresFromState(
      Decay.state(all, "k", "ts", "v", 24.0), asOf, 24.0).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val two = Decay.scoresFromState(merged, asOf, 24.0).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(one == two, s"$one vs $two")
  }

  test("scoresFromState refuses a backfill asOf the state has outrun") {
    val st = Decay.state(df(("a", asOf, 1.0), ("b", asOf - 50 * hour, 1.0)),
      "k", "ts", "v", 24.0)
    val back = Decay.scoresFromState(st, asOf - 10 * hour, 24.0).collect()
      .map(_.getString(0)).toSet
    assert(back == Set("b"),
      "key 'a' folded future events relative to the backfill instant")
    // outrunKeys is the alarm surface for that exclusion: it names the
    // dropped key and by how much its reference outran the read instant
    val outrun = Decay.outrunKeys(st, asOf - 10 * hour).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(outrun == Map("a" -> 10 * hour), outrun.toString)
    assert(Decay.outrunKeys(st, asOf).isEmpty,
      "nothing outruns a current-time read here")
  }

  test("foldIntoStore is replay-idempotent and matches the full recompute") {
    val wh = java.nio.file.Files.createTempDirectory("graft_decay_fold").toString
    val store = new ParquetTableStore(spark, wh)
    val rows = (1 to 30).map(i =>
      (s"k${i % 2}", asOf - i.toLong * hour, i.toDouble))
    val all = df(rows: _*)
    val (b1, b2) = (df(rows.take(10): _*), df(rows.drop(10): _*))
    Decay.foldIntoStore(store, "dec", b1, "k", "ts", "v", 24.0, 0L, "e1")
    Decay.foldIntoStore(store, "dec", b2, "k", "ts", "v", 24.0, 1L, "e1")
    Decay.foldIntoStore(store, "dec", b2, "k", "ts", "v", 24.0, 1L, "e1") // replay
    val folded = Decay.scoresFromState(
      store.read("dec").get.drop("_last_batch", "_epoch"), asOf, 24.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val full = Decay.scores(all, "k", "ts", "v", asOf, 24.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(folded == full,
      s"folded diverged from full recompute (replay double-count?): $folded vs $full")
  }

  test("invalid half-life fails loudly") {
    intercept[IllegalArgumentException] {
      Decay.scores(df(("a", asOf, 1.0)), "k", "ts", "v", asOf, 0.0)
    }
  }
}
