package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    PageRank.run(edges.toDF("src", "dst"), "src", "dst", 0.85, iters)
      .as[(Long, Double)].collect().toMap

  test("two-node cycle is the uniform fixed point") {
    val r = ranksOf(Seq((1L, 2L), (2L, 1L)), iters = 5)
    assert(math.abs(r(1L) - 0.5) < 1e-12 && math.abs(r(2L) - 0.5) < 1e-12)
  }

  test("dangling node: hand-computed first iteration") {
    // a→b, b dangling. r0 = (.5, .5); dm = .5
    // a: .15/2 + .85·(0 + .25)  = .2875
    // b: .15/2 + .85·(.5 + .25) = .7125
    val r = ranksOf(Seq((1L, 2L)), iters = 1)
    assert(math.abs(r(1L) - 0.2875) < 1e-12, r.toString)
    assert(math.abs(r(2L) - 0.7125) < 1e-12, r.toString)
  }

  test("rank mass is conserved across iterations on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    for (k <- Seq(1, 3, 6)) {
      val total = ranksOf(edges, k).values.sum
      assert(math.abs(total - 1.0) < 1e-9, s"iters=$k mass=$total")
    }
  }

  test("authority flows: a node cited by everyone outranks its citers") {
    // 1..5 all link to 6; 6 links back only to 1. The closed 1↔6 loop
    // oscillates for small K (the two-node exchange has period 2), so
    // assert at a converged K: fixed point r6 ≈ .473 > r1 ≈ .427 ≫
    // peers = .025, and the oscillation amplitude decays as 0.7225^K.
    val edges = (1L to 5L).map(i => (i, 6L)) :+ (6L, 1L)
    val r = ranksOf(edges, 20)
    assert(r(6L) > r(1L) && r(1L) > r(2L), r.toString)
    assert(math.abs(r(2L) - r(5L)) < 1e-12) // symmetric peers tie
  }

  test("invalid parameters are loud") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] { PageRank.run(e, "src", "dst", iters = 0) }
    intercept[IllegalArgumentException] { PageRank.run(e, "src", "dst", damping = 1.0) }
  }

  test("ε-loop fixed point matches a long fixed-K run (unique contraction fixed point)") {
    // the oscillating 1↔6 authority graph + a random component: both
    // loop contracts must land on the same (unique) fixed point
    val rnd = new scala.util.Random(11)
    val edges = ((1L to 5L).map(i => (i, 6L)) :+ (6L, 1L)) ++
      (1 to 120).map(_ => (10 + rnd.nextInt(25).toLong, 10 + rnd.nextInt(25).toLong))
        .filter(e => e._1 != e._2).distinct
    // damping 0.5 so the contraction (delta ~ 2·d^k) reaches tight eps in
    // ~30 rounds: at d=0.85 an eps of 1e-10 needs ~150 rounds of driver
    // loop — correct but a pointlessly slow spec
    val eps = PageRank.runToConvergence(edges.toDF("src", "dst"), "src", "dst",
      0.5, eps = 1e-10).as[(Long, Double)].collect().toMap
    val fixedK = PageRank.run(edges.toDF("src", "dst"), "src", "dst", 0.5, 60)
      .as[(Long, Double)].collect().toMap // 2·0.5^60 ~ 1e-18 — fully converged
    assert(eps.keySet == fixedK.keySet)
    eps.foreach { case (n, r) =>
      assert(math.abs(r - fixedK(n)) < 1e-9, s"node $n: eps=$r fixedK=${fixedK(n)}")
    }
    // mass conservation holds for the ε variant too
    assert(math.abs(eps.values.sum - 1.0) < 1e-9)
  }

  test("ε-loop throws loudly when maxIters can't reach eps") {
    val edges = ((1L to 5L).map(i => (i, 6L)) :+ (6L, 1L)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      PageRank.runToConvergence(edges, "src", "dst", 0.85, eps = 1e-12, maxIters = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
