package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The x01/x03 MERGEABILITY contract itself (VERDICT r11 task 5): the
  * claim "mergeable, order-independent union" was asserted nowhere —
  * these cases pin it:
  *
  *   - union of per-day sketches == the monolithic whole-corpus sketch
  *     (identical estimate — register-wise max over any partition of
  *     the rows reaches the same registers);
  *   - the union is order/partitioning-independent;
  *   - the day-loop fold (merge yesterday's cumulative sketch with
  *     today's delta sketch) converges to the same estimate — the
  *     incremental rollup a 100 TB lakehouse actually runs;
  *   - the merged estimate sits within the HLL error bound of the
  *     exact twin.
  */
class SketchMergeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def events: DataFrame = Tables.load(spark, sfDir, "events")

  private def daySketches: DataFrame = events
    .groupBy(col("event_type"), to_date(col("ts")).as("day"))
    .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))

  private def estimates(df: DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("union of per-day sketches == monolithic whole-corpus sketch estimate") {
    val merged = estimates(daySketches
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")))
    val monolithic = estimates(events
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est")))
    assert(merged.nonEmpty && merged == monolithic,
      s"merged $merged != monolithic $monolithic")
  }

  test("sketch union is order- and partitioning-independent") {
    val base = daySketches.localCheckpoint()
    def est(df: DataFrame) = estimates(df.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")))
    val a = est(base)
    // adversarial layouts: single partition (strictly sequential fold),
    // many tiny partitions (deep partial-merge tree), reversed sort
    val b = est(base.coalesce(1))
    val c = est(base.repartition(37, col("day")))
    val d = est(base.orderBy(col("day").desc, col("event_type").desc))
    assert(a == b && a == c && a == d,
      s"union must be layout-independent: $a / $b / $c / $d")
  }

  test("day-loop fold: cumulative union over days == whole-corpus estimate") {
    val days = events.select(to_date(col("ts")).as("day")).distinct()
      .orderBy(col("day")).collect().map(_.getDate(0))
    assert(days.length > 1, "fixture must span multiple days")
    // yesterday's cumulative sketch + today's delta sketch, folded in
    // day order — each step unions exactly TWO sketch sets, the shape
    // of an incremental daily rollup job
    val cum = days.foldLeft(Option.empty[DataFrame]) { (prev, day) =>
      val delta = events.filter(to_date(col("ts")) === lit(day))
        .groupBy(col("event_type"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      val next = prev match {
        case None => delta
        case Some(p) => p.unionByName(delta)
          .groupBy(col("event_type"))
          .agg(hll_union_agg(col("sk")).as("sk"))
      }
      Some(next.localCheckpoint()) // persist = the on-disk daily sketch
    }.get
    val folded = estimates(cum.select(col("event_type"),
      hll_sketch_estimate(col("sk")).as("est")))
    val monolithic = estimates(events
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est")))
    assert(folded == monolithic,
      s"day-folded $folded != monolithic $monolithic")
  }

  test("merged estimate within HLL error bound of the exact twin") {
    val merged = estimates(daySketches
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")))
    val exact = estimates(events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("nd")))
    merged.foreach { case (t, est) =>
      val ex = exact(t).toDouble
      // lgK=12 -> rsd ~1.6%; 3x tolerance
      assert(math.abs(est - ex) / ex <= 0.05,
        s"type $t: merged estimate $est vs exact $ex off > 5%")
    }
  }
}
