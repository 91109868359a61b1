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

  // ---- Misra-Gries frequent-items contract (x04's substrate) ----

  /** Skewed key stream: a handful of heavy keys over a long uniform
    * tail — the shape heavy-hitter detection exists for.
    */
  private def skewed: DataFrame = {
    import spark.implicits._
    val heavy = Seq.tabulate(5)(h => Seq.fill(2000 - h * 300)(s"hot_$h")).flatten
    val tail = (0 until 12000).map(i => s"cold_${i % 4000}")
    new scala.util.Random(7).shuffle(heavy ++ tail).toDF("k")
  }

  test("Misra-Gries: the survivor set contains every key above n/(m+1) under ANY partitioning") {
    import graft.expressions.MisraGries.mg_sketch
    val df = skewed
    val n = df.count()
    val m = 16
    val exactHH = df.groupBy(col("k")).count()
      .filter(col("count") > n / (m + 1))
      .collect().map(_.getString(0)).toSet
    assert(exactHH.size >= 3, s"fixture must have heavy keys: $exactHH")
    Seq(1, 7, 32).foreach { p =>
      val sk = df.repartition(p)
        .agg(mg_sketch(col("k"), m)).collect()(0).getMap[String, Long](0)
      val cands = sk.keysIterator.toSet
      assert(cands.size <= m, s"p=$p: sketch must hold <= $m keys")
      assert(exactHH.subsetOf(cands),
        s"p=$p: guarantee broken — missing ${exactHH -- cands}")
    }
  }

  test("Misra-Gries: estimates undercount by at most n/(m+1), never overcount") {
    import graft.expressions.MisraGries.mg_sketch
    val df = skewed
    val n = df.count()
    val m = 16
    val exact = df.groupBy(col("k")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = df.repartition(13)
      .agg(mg_sketch(col("k"), m)).collect()(0).getMap[String, Long](0)
    sk.foreach { case (k, est) =>
      assert(est <= exact(k), s"$k: estimate $est overcounts ${exact(k)}")
      assert(exact(k) - est <= n / (m + 1) + 1,
        s"$k: undercount ${exact(k) - est} exceeds the n/(m+1) bound")
    }
  }

  test("Misra-Gries: sketch + exact re-verify == plain GROUP BY HAVING (the x04 shape)") {
    import graft.expressions.MisraGries.mg_sketch
    val df = skewed
    val n = df.count()
    val m = 16
    val cands = df.agg(mg_sketch(col("k"), m).as("sk"))
      .select(explode(map_keys(col("sk"))).as("k"))
    val got = df.join(broadcast(cands), Seq("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n / (m + 1))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    val exact = df.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n / (m + 1))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(got == exact && got.nonEmpty,
      "sketch-narrowed exact recount must equal the full GROUP BY")
  }
  test("mg_sketch rejects a non-string key at analysis time") {
    import spark.implicits._
    import graft.expressions.MisraGries.mg_sketch
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L, 2L).toDF("k").agg(mg_sketch(col("k"), 4)).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string"),
      s"expected the STRING type-check message, got: ${ex.getMessage}")
  }
}
