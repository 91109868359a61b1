package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** x-family mergeability probe (VERDICT r11 task 5): SketchMergeSpec
  * pins the algebra (per-day unions == monolithic sketch, layout
  * independence, day-fold convergence); this probe measures the CLAIM
  * the algebra exists for — answering "distinct users per type over
  * the whole range" from persisted ~KB day sketches WITHOUT rescanning
  * the event lake:
  *
  *   - build: per-(type, day) sketches written to parquet (the daily
  *     incremental job; wall recorded, runs once);
  *   - serve_sketch: read the sketch table, union, estimate — cost
  *     tracks |types x days| rows of KB sketches;
  *   - serve_exact: countDistinct over the full event scan — the cost
  *     the sketch path avoids, growing with the lake;
  *   - correctness in-probe: merged estimates equal the monolithic
  *     whole-corpus sketch exactly, and sit within 5% of exact.
  *
  * Usage: runMain graft.SketchProbe [sfDir]. Writes
  * BENCH_sketch_probe.json; last stdout line is the JSON.
  */
object SketchProbe {

  private def f2(d: Double) = math.round(d * 100.0) / 100.0

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/benchdata/sf10join"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sketch-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Tables.load(spark, sfDir, "events")
    val nEvents = events.count() // warm the scan

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val skDir = java.nio.file.Files.createTempDirectory("graft-sk").toString
    val (_, buildSec) = timed {
      events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
        .write.mode("overwrite").parquet(skDir)
    }
    val skRows = spark.read.parquet(skDir).count()
    val skBytes = spark.read.parquet(skDir)
      .agg(sum(length(col("sk")))).collect()(0).getLong(0)

    def ests(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val (merged, serveSketchSec) = timed {
      ests(spark.read.parquet(skDir)
        .groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est")))
    }
    val (exact, serveExactSec) = timed {
      ests(events.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("nd")))
    }
    val (mono, _) = timed {
      ests(events.groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est")))
    }

    require(merged == mono,
      s"merged-from-persisted must equal monolithic: $merged vs $mono")
    val worstErr = merged.map { case (t, est) =>
      math.abs(est - exact(t).toDouble) / exact(t) }.max
    require(worstErr <= 0.05, s"worst estimate error $worstErr > 5%")

    println(f"[sketch] events $nEvents, sketches $skRows rows / $skBytes B")
    println(f"[sketch] build ${buildSec}%.2fs serve_sketch ${serveSketchSec}%.2fs " +
      f"serve_exact ${serveExactSec}%.2fs worst_err ${worstErr}%.4f")
    val json =
      s"""{"metric":"sketch_probe","sf":"$sfDir","events":$nEvents,""" +
      s""""sketch_rows":$skRows,"sketch_bytes":$skBytes,""" +
      s""""build_sec":${f2(buildSec)},"serve_sketch_sec":${f2(serveSketchSec)},""" +
      s""""serve_exact_sec":${f2(serveExactSec)},""" +
      s""""worst_rel_err":${math.round(worstErr * 10000.0) / 10000.0},""" +
      s""""merged_equals_monolithic":true}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_sketch_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(skDir))
    spark.stop()
  }
}
