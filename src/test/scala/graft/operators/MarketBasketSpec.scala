package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MarketBasketSpec extends SparkSpec {
  import spark.implicits._

  // 4 baskets: {a,b}, {a,b}, {a,c}, {b} — c(a)=3 c(b)=3 c(ab)=2
  private lazy val tx = Seq(
    (1L, "a"), (1L, "b"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "c"),
    (4L, "b"),
    (2L, "a") // duplicate item in a basket must not inflate support
  ).toDF("basket", "item")

  test("hand-computed support / confidence / lift, both directions") {
    val rows = MarketBasket.rules(tx, "basket", "item",
      minCount = 2, minConfidence = 0.0).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // support 2/4, conf a→b = 2/3, lift = 4·2/(3·3)
    assert(rows(("a", "b")) == ((2L, 0.5, 0.666667, 0.888889)))
    assert(rows(("b", "a")) == ((2L, 0.5, 0.666667, 0.888889)))
    assert(rows.size == 2, s"only the (a,b) pair reaches minCount=2: $rows")
  }

  test("confidence is directional when item frequencies differ") {
    // c in 1 basket, a in 3 → conf(c→a)=1.0, conf(a→c)=1/3
    val rows = MarketBasket.rules(tx, "basket", "item",
      minCount = 1, minConfidence = 0.0).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(rows(("c", "a")) == 1.0)
    assert(rows(("a", "c")) == 0.333333)
  }

  test("minConfidence filters one direction but keeps the other") {
    val rows = MarketBasket.rules(tx, "basket", "item",
      minCount = 1, minConfidence = 0.9).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows.contains(("c", "a")) && !rows.contains(("a", "c")))
  }

  test("lift above/below 1 separates positive and negative association") {
    // {x,y} {x,y} vs z alone twice: x,y positively associated
    val t = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "z"), (4L, "z")).toDF("basket", "item")
    val l = MarketBasket.rules(t, "basket", "item", 1, 0.0).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(l(("x", "y")) == 2.0, "P(xy)=1/2 vs P(x)P(y)=1/4 → lift 2")
  }

  test("randomized: rules ≡ brute-force counting") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.tabulate(200)(_ =>
        (rnd.nextInt(30).toLong, s"i${rnd.nextInt(8)}"))
      val got = MarketBasket.rules(rows.toDF("basket", "item"),
        "basket", "item", minCount = 2, minConfidence = 0.0).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val bi = rows.distinct
      val items = bi.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val byBasket = bi.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
      val pairCnt = byBasket.values.toSeq.flatMap(is =>
        for (a <- is; b <- is if a < b) yield (a, b))
        .groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= 2).toMap
      val brute = pairCnt.flatMap { case ((a, b), c) =>
        Seq((a, b) -> c, (b, a) -> c) }
      assert(got == brute, s"seed $seed: $got vs $brute")
      // spot-check one rule's measures against hand arithmetic
      got.headOption.foreach { case ((a, b), c) =>
        val row = MarketBasket.rules(rows.toDF("basket", "item"),
          "basket", "item", 2, 0.0)
          .filter(col("item_a") === a && col("item_b") === b).collect().head
        val n = byBasket.size.toDouble
        assert(row.getDouble(4) ==
          math.rint(c.toDouble / items(a) * 1e6) / 1e6)
        assert(row.getDouble(3) == math.rint(c / n * 1e6) / 1e6)
      }
    }
  }

  test("oversized baskets drop wholesale") {
    val big = (1 to 30).map(i => (99L, s"i$i")) ++ Seq((1L, "a"), (1L, "b"))
    val rows = MarketBasket.rules(big.toDF("basket", "item"),
      "basket", "item", 1, 0.0, maxBasket = 10).collect()
    assert(rows.forall(r => Set("a", "b")(r.getString(0))),
      "pairs from the over-cap basket must be absent")
  }

  test("invalid thresholds fail loudly") {
    intercept[IllegalArgumentException] {
      MarketBasket.rules(tx, "basket", "item", 0, 0.5)
    }
    intercept[IllegalArgumentException] {
      MarketBasket.rules(tx, "basket", "item", 1, 1.5)
    }
  }
}
