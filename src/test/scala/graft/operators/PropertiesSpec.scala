package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll

/** ScalaCheck invariants promised in SURVEY §5: dedup idempotence, merge
  * idempotence (T4), post-merge key uniqueness (A5), salted-join equality.
  * Run through scalatest so the shared SparkSession is reused. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, Int, Double)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 1000), Gen.choose(0.0, 9.9)))

  private def check(p: Prop): Unit = {
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), p)
    assert(result.passed, result.status.toString)
  }

  test("property: firstWins dedup is idempotent and leaves keys unique") {
    check(forAll(rowsGen) { rows =>
      val df = rows.zipWithIndex.map { case ((k, v, d), i) => (k, v, d, i.toLong) }
        .toDF("k", "v", "d", "ord")
      val once = Dedup.firstWins(df, Seq("k"), "ord")
      val twice = Dedup.firstWins(once, Seq("k"), "ord")
      val o = once.orderBy("ord").collect().toSeq
      val t = twice.orderBy("ord").collect().toSeq
      o == t && once.select("k").distinct().count() == once.count()
    })
  }

  test("property: merge is idempotent (T4) and post-merge keys unique (A5)") {
    check(forAll(rowsGen, rowsGen) { (currentRows, updateRows) =>
      val current = Dedup.firstWins(
        currentRows.zipWithIndex.map { case ((k, v, d), i) => (k, v, d, i.toLong) }
          .toDF("k", "v", "d", "ord"), Seq("k"), "ord").drop("ord")
      val updates = Dedup.firstWins(
        updateRows.zipWithIndex.map { case ((k, v, d), i) => (k, v, d, i.toLong) }
          .toDF("k", "v", "d", "ord"), Seq("k"), "ord").drop("ord")
      val once = Upsert.merge(current, updates, Seq("k"))
      val twice = Upsert.merge(once, updates, Seq("k"))
      once.orderBy("k", "v").collect().toSeq == twice.orderBy("k", "v").collect().toSeq &&
        once.select("k").distinct().count() == once.count()
    })
  }

  test("property: merge never emits duplicate keys, even from duplicate-keyed batches") {
    // round-1 hazard: two different rows sharing a key both survived
    // `updates.distinct()`; keyDedup must reduce them to one, with or
    // without an explicit order column.
    check(forAll(rowsGen, rowsGen) { (currentRows, updateRows) =>
      val current = Dedup.firstWins(
        currentRows.zipWithIndex.map { case ((k, v, d), i) => (k, v, d, i.toLong) }
          .toDF("k", "v", "d", "ord"), Seq("k"), "ord").drop("ord")
      val updates = updateRows.map { case (k, v, d) => (k, v, d) }.toDF("k", "v", "d")
      val plain = Upsert.merge(current, updates, Seq("k"))
      val ordered = Upsert.merge(current, updates, Seq("k"), orderCol = Some("d"))
      plain.select("k").distinct().count() == plain.count() &&
        ordered.select("k").distinct().count() == ordered.count()
    })
  }

  test("property: saltedJoin equals plain inner join") {
    check(forAll(rowsGen) { rows =>
      val big = rows.map { case (k, v, d) => (k, v, d) }.toDF("k", "v", "d")
      val small = (0 to 5).map(k => (k, s"dim$k")).toDF("k", "name")
      val plain = big.join(small, "k").orderBy("k", "v", "d").collect().toSeq
      val salted = Skew.saltedJoin(big, small, "k", 4)
        .select("k", "v", "d", "name")
        .orderBy("k", "v", "d").collect().toSeq
      // column order can differ; compare as sets of row seqs
      plain.map(_.toSeq.toSet).toSet == salted.map(_.toSeq.toSet).toSet &&
        plain.size == salted.size
    })
  }

  test("property: winnowing guarantee — shared substring >= k+w-1 implies shared fingerprint") {
    val word = Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
    val gen = for {
      pre1 <- Gen.listOfN(5, word); pre2 <- Gen.listOfN(5, word)
      common <- Gen.listOfN(4, word) // >= 11 chars once joined
    } yield (pre1.mkString(" "), pre2.mkString(" "), common.mkString(" "))
    check(forAll(gen) { case (pre1, pre2, common) =>
      val df = Seq((1L, s"$pre1 $common"), (2L, s"$pre2 $common")).toDF("doc_id", "text")
      // k=8, w=4: guarantee window k+w-1 = 11 <= common.length (27)
      Similarity.winnowNearDup(df, "doc_id", "text", k = 8, w = 4, minShared = 1)
        .count() >= 1
    })
  }

  // random docs: 1-9 words drawn from a tiny vocabulary (forces shared
  // shingles, duplicate words, and the fewer-than-k-tokens fallback path)
  private val docsGen: Gen[List[String]] = Gen.listOfN(8,
    Gen.choose(1, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("fox", "dog", "the", "runs", "spark", "a"))
        .map(_.mkString(" "))))

  test("property: one-pass minhash_sig equals the exploded 64-min-agg formulation") {
    check(forAll(docsGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val native = Similarity.minhashSignatures(df, "doc_id", "text", 3)
        .as[(Long, Seq[Long])].collect().toMap
      val exploded = Similarity.minhashSignaturesExploded(df, "doc_id", "text", 3)
        .as[(Long, Seq[Long])].collect().toMap
      native == exploded
    })
  }

  test("property: one-pass simhash64 equals the exploded bit-vote formulation") {
    check(forAll(docsGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val native = Similarity.simhash(df, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      val exploded = Similarity.simhashExploded(df, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      native == exploded
    })
  }

  test("property: asOf join equals the window row_number formulation") {
    val gen = for {
      left  <- Gen.listOfN(15, Gen.zip(Gen.choose(0, 4), Gen.choose(0L, 100L)))
      right <- Gen.listOfN(15, Gen.zip(Gen.choose(0, 4), Gen.choose(0L, 100L), Gen.choose(0, 999)))
    } yield (left, right)
    check(forAll(gen) { case (leftRows, rightRows) =>
      val left = leftRows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new java.sql.Timestamp(t * 1000)) }
        .toDF("lid", "k", "lts")
      val right = rightRows.zipWithIndex
        .map { case ((k, t, p), i) => (k, new java.sql.Timestamp(t * 1000), i.toLong) }
        .toDF("rk", "rts", "pid")
      val viaOp = AsOfJoin.asOf(left, right, "k", "rk", "lts", "rts",
          Seq("pid"), Seq("pid"))
        .select("lid", "pid").as[(Long, Option[Long])].collect().toMap
      // reference formulation: row_number over the range join
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"lid")
        .orderBy($"rts".desc_nulls_last, $"pid".desc_nulls_last)
      val viaWindow = left
        .join(right, $"k" === $"rk" && $"rts" <= $"lts", "left")
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rn" === 1)
        .select("lid", "pid").as[(Long, Option[Long])].collect().toMap
      viaOp == viaWindow
    })
  }

  test("property: saltedAgg equals direct aggregation for algebraic aggs") {
    check(forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v", "d")
      val direct = df.groupBy($"k")
        .agg(count(lit(1)).as("n"), round(sum($"d"), 6).as("s"))
        .orderBy("k").collect().toSeq
      val salted = Skew.saltedAgg(df, "k", 4,
        partials = Seq((count(lit(1)), "pn"), (sum($"d"), "ps")),
        finals = Seq((sum(col("pn")), "n"), (round(sum(col("ps")), 6), "s")))
        .orderBy("k").collect().toSeq
      direct == salted
    })
  }
}
