package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join on the bucket key plans without a shuffle exchange") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "o_bucketed", "o_orderkey", 8)

    val joined = Bucketing.readTable(spark, "li_bucketed")
      .join(Bucketing.readTable(spark, "o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))

    // disable broadcast so the join must pick sort-merge; bucketing then
    // removes both Exchange nodes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(!Bucketing.hasShuffle(joined),
        s"bucketed join must not shuffle, plan:\n$plan")
      // result still correct vs plain join
      val expected = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("q64 gated query: the only hash exchange is the aggregation's, never the join's") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = graft.SparkEntry.q64_bucketed_join(spark, sfDir)
        .queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"bucketed join must not shuffle its inputs; got $exchanges hash exchanges:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS q64_li")
      spark.sql("DROP TABLE IF EXISTS q64_o")
    }
  }
}
