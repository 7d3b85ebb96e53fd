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
