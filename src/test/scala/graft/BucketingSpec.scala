package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

/** Bucketed co-located joins: the join over two tables bucketed on the
  * same (count, key) must plan WITHOUT a shuffle on either side, and
  * must return the same rows as the plain join.
  */
class BucketingSpec extends SparkSpec {

  // AQE wraps the final plan in AdaptiveSparkPlanExec, whose TreeNode
  // collect does NOT descend into materialized query stages — node
  // matching silently sees zero exchanges everywhere. The rendered plan
  // string DOES show the final stages, so assert on that.
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE finalizes the physical plan
    df.queryExecution.executedPlan.toString
  }
  private def hasExchange(plan: String): Boolean =
    plan.contains("Exchange") || plan.contains("ShuffleQueryStage")

  test("join of co-bucketed tables plans zero shuffles and matches plain join") {
    val o = Tables.load(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val l = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(o, "b_orders", 4, "o_orderkey")
    Bucketing.writeBucketed(l, "b_lineitem", 4, "o_orderkey")
    // force SMJ on both planners (AQE has its own broadcast threshold;
    // a broadcast join would hide the exchange question entirely)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cocolocatedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val jp = finalPlan(joined)
      assert(!hasExchange(jp), s"co-bucketed join must not shuffle:\n$jp")
      assert(jp.contains("SortMergeJoin"),
        "co-bucketed join should be a sort-merge join, not a broadcast")

      val plain = o.join(l, "o_orderkey")
      assert(hasExchange(finalPlan(plain.select(col("o_orderkey")))),
        "plain join should shuffle (sanity: bucketing is what removed it)")
      assert(joined.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("bucketed aggregation on the bucket key avoids the exchange") {
    val o = Tables.load(spark, sf0001, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(o, "b_orders_agg", 4, "o_orderkey")
    try {
      val agg = spark.table("b_orders_agg")
        .groupBy("o_orderkey").agg(sum("o_totalprice").as("s"))
      val ap = finalPlan(agg)
      assert(!hasExchange(ap),
        s"groupBy on the bucket key must reuse the bucket partitioning:\n$ap")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders_agg")
    }
  }
}
