package graft

import org.apache.spark.sql.functions._
import graft.plans.BinnedRangeJoinRule

/** The optimizer rule turns a nested-loop range join into a binned
  * shuffle join with identical results.
  */
class RangeJoinRuleSpec extends SparkSpec {

  private def pointsAndIntervals = {
    import spark.implicits._
    val base = lit("1995-01-01").cast("date")
    val o = Tables.load(spark, sf0001, "orders")
    (o.select($"o_orderkey".as("pk"),
       datediff($"o_orderdate", base).cast("long").as("pday")),
     o.select($"o_orderkey".as("ik"),
       (datediff($"o_orderdate", base).cast("long") - 15).as("lo"),
       datediff($"o_orderdate", base).cast("long").as("hi")))
  }

  test("range-containment join is rewritten off the nested loop, same results") {
    import spark.implicits._
    val (pts, ivs) = pointsAndIntervals
    def query = pts.join(ivs, $"pday" >= $"lo" && $"pday" <= $"hi")
      .select($"pk", $"ik")

    val before = query
    assert(before.queryExecution.executedPlan.toString.contains("NestedLoop"),
      "expected the baseline plan to nested-loop")
    val plainResult = before.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinnedRangeJoinRule(32)
    try {
      val after = query
      val plan = after.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), s"rule did not fire:\n$plan")
      val ruleResult = after.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(ruleResult == plainResult)
      assert(ruleResult.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[BinnedRangeJoinRule])
    }
  }

  test("GraftExtensions registers the rule on a session built with withExtensions") {
    import org.apache.spark.sql.SparkSession
    // force a NEW session on the shared context so extensions apply
    val prior = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extSpark = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      assert(extSpark ne prior, "expected a fresh session")
      import extSpark.implicits._
      val base = lit("1995-01-01").cast("date")
      val o = extSpark.read.parquet(s"$sf0001/orders.parquet")
      val pts = o.select($"o_orderkey".as("pk"),
        datediff($"o_orderdate", base).cast("long").as("pday"))
      val ivs = o.select($"o_orderkey".as("ik"),
        (datediff($"o_orderdate", base).cast("long") - 15).as("lo"),
        datediff($"o_orderdate", base).cast("long").as("hi"))
      val df = pts.join(ivs, $"pday" >= $"lo" && $"pday" <= $"hi").select($"pk", $"ik")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), s"extension rule did not fire:\n$plan")
      assert(df.count() > 0)
    } finally {
      SparkSession.setActiveSession(prior)
      SparkSession.setDefaultSession(prior)
    }
  }

  test("joins with an existing equi key are left untouched") {
    import spark.implicits._
    val (pts, ivs) = pointsAndIntervals
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BinnedRangeJoinRule(32)
    try {
      // equi conjunct present -> not a pure range join -> no rewrite
      val df = pts.join(ivs, $"pk" === $"ik" && $"pday" >= $"lo" && $"pday" <= $"hi")
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("_pbin"), s"rule should not fire:\n$plan")
      assert(df.count() > 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[BinnedRangeJoinRule])
    }
  }
}
