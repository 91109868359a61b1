package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Compactor

/** Day-N LAKE loop: the analytics twin of the dedup DayLoopProbe —
  * each day's event crawl lands as small files, is compacted into its
  * own z-ordered day directory with a stats manifest, and the
  * whole-lake selective query a dashboard actually runs (one user's
  * events across ALL history) is re-measured as the lake grows.
  *
  * Claims under test, asserted not narrated:
  *   - per-day ingest cost (compact + z-order + manifest) tracks the
  *     DELTA, not the lake (walls recorded per day);
  *   - the whole-history user query's cost tracks the MATCHING data:
  *     the manifest prune touches a bounded handful of files per day
  *     (<= maxFilesPerDay asserted), so scan rows grow with the user's
  *     own history, never with lake volume;
  *   - pruned results equal the full-scan filter on every day (exact
  *     row parity, all days).
  *
  * Usage: runMain graft.LakeLoopProbe [sfDir] [nDays]. Writes
  * BENCH_lakeloop_probe.json; last stdout line is the JSON.
  */
object LakeLoopProbe {

  private def f2(d: Double) = math.round(d * 100.0) / 100.0

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/benchdata/sf10join"
    val nDays = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // INT64 micros: time-column stats pruning needs it (see
      // Compactor.zorderParquet scaladoc)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .localCheckpoint()
    val nRows = events.count()
    // split history into nDays contiguous time slices (the crawl's
    // natural arrival order)
    val cuts = events.select(col("ts").cast("double").as("tsd")).stat
      .approxQuantile("tsd", (1 until nDays).map(_.toDouble / nDays).toArray, 0.001)
      .map(s => new java.sql.Timestamp((s * 1000).toLong))

    def daySlice(d: Int): DataFrame = {
      val lo = if (d == 0) None else Some(cuts(d - 1))
      val hi = if (d == nDays - 1) None else Some(cuts(d))
      var df = events
      lo.foreach(t => df = df.filter(col("ts") >= t))
      hi.foreach(t => df = df.filter(col("ts") < t))
      df
    }

    val work = java.nio.file.Files.createTempDirectory("graft-lakeloop").toString
    val probeUser = events.filter(col("user_id") % 1000 === 7)
      .agg(min(col("user_id"))).collect()(0).getLong(0)
    val maxFilesPerDay = 4

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ONE partitioned lake driven entirely through the public API:
    // zorderParquet writes each day's partition directory, the stats
    // manifest is written once and APPENDED per day (delta-sized pass,
    // never a lake rescan), and the dashboard query is one
    // readPruned over the whole lake — no hand-rolled per-day
    // loop on the query side (the r12 probe carried one because
    // zorderParquet refused partitioned lakes; it no longer does).
    val lake = s"$work/lake"
    val dayRows = (0 until nDays).map { d =>
      val incoming = s"$work/incoming/day$d"
      val dayDir = s"$lake/day=$d"
      val delta = daySlice(d)
      val deltaN = delta.count()
      delta.repartition(50).write.parquet(incoming) // the crawl residue
      val (_, ingestSec) = timed {
        Compactor.zorderParquet(incoming, dayDir,
          targetBytes = 8L * 1024 * 1024, Seq("user_id", "ts"))
        if (d == 0) Compactor.writeStatsManifest(lake, Seq("user_id", "ts"))
        else Compactor.appendStatsManifest(lake,
          spark.read.parquet(dayDir).inputFiles.toSeq)
      }
      // the whole-history dashboard query: this user, ALL days so far,
      // one manifest-pruned read of the whole lake
      val ((hits, filesTouched), querySec) = timed {
        val pruned = Compactor.readPruned(
          lake, "user_id", lit(probeUser), lit(probeUser))
        (pruned.count(), pruned.inputFiles.length)
      }
      // parity vs the full scan, and the bounded-files claim
      val expect = spark.read.parquet(lake)
        .filter(col("user_id") === probeUser).count()
      require(hits == expect, s"day $d: pruned $hits != full $expect")
      require(filesTouched <= maxFilesPerDay * (d + 1),
        s"day $d: $filesTouched files touched > ${maxFilesPerDay * (d + 1)}")
      println(f"[lakeloop] day $d: delta $deltaN%8d ingest $ingestSec%6.2fs " +
        f"query $querySec%5.2fs ($hits hits, $filesTouched files over ${d + 1} days)")
      s"""{"day":$d,"delta_rows":$deltaN,"ingest_sec":${f2(ingestSec)},""" +
      s""""query_sec":${f2(querySec)},"query_hits":$hits,""" +
      s""""files_touched":$filesTouched}"""
    }

    val json =
      s"""{"metric":"lakeloop_probe","sf":"$sfDir","rows":$nRows,""" +
      s""""days":$nDays,"per_day":${dayRows.mkString("[", ",", "]")}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_lakeloop_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
