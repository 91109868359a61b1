package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order OPTIMIZE probe: measures the thing the layout exists for —
  * selective scans on EITHER clustered column skipping most of the
  * lake via parquet min/max stats — on the 100x event stream
  * (10M rows), against the two layouts a lake actually has otherwise:
  * arrival order (an event log lands time-sorted) and a single-column
  * user sort (the first OPTIMIZE a user-heavy workload reaches for).
  *
  * Three layouts x two predicates (one user's events; one narrow time
  * slice). Reported per run: wall and the rows the SCAN produced after
  * row-group pruning (from the FileSourceScanExec metric — rows the
  * executor actually decoded, the cost stats-skipping removes).
  * Correctness asserted in-probe: every layout returns identical
  * result counts, and the z-layout preserves all rows.
  *
  * Usage: runMain graft.ZOrderProbe [sfDir]. Writes
  * BENCH_zorder_probe.json; last stdout line is the JSON.
  */
object ZOrderProbe {

  private def f2(d: Double) = math.round(d * 100.0) / 100.0

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/benchdata/sf10join"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-zorder-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Spark's DEFAULT parquet timestamp encoding is INT96, which has
      // NO usable min/max stats — a time-sliced scan can never skip a
      // row group no matter how the lake is sorted (measured here:
      // 100% scanned on a perfectly ts-sorted lake). Any lake that
      // wants time-predicate pruning must write INT64 micros; this is
      // a WRITER-session property of the lake, not of the query.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
    val nRows = events.count()

    val work = java.nio.file.Files.createTempDirectory("graft-zprobe").toString
    // the "as-crawled" lake: ARRIVAL order — an event log lands in time
    // order, so the realistic baseline is ts-sorted (time slices prune,
    // point-user scans read everything)
    events.repartitionByRange(24, col("ts")).sortWithinPartitions(col("ts"))
      .write.parquet(s"$work/arrival")
    val target = {
      val bytes = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet").option("recursiveFileLookup", "true")
        .load(s"$work/arrival").agg(sum(col("length"))).collect()(0).getLong(0)
      math.max(1L, bytes / 24)
    }
    // user-sorted: the single-column OPTIMIZE a user-heavy workload
    // reaches for first (user scans prune, time slices read everything)
    spark.read.parquet(s"$work/arrival").repartitionByRange(24, col("user_id"))
      .sortWithinPartitions(col("user_id")).write.parquet(s"$work/usorted")
    // z-ordered on (user_id, ts)
    val (manifest, zWall) = {
      val t0 = System.nanoTime()
      val m = graft.operators.Compactor.zorderParquet(
        s"$work/arrival", s"$work/zorder", target, Seq("user_id", "ts"))
      (m.collect()(0), (System.nanoTime() - t0) / 1e9)
    }
    require(manifest.getLong(0) == nRows, "z rewrite must preserve rows")

    // post-pruning rows actually decoded by the scan (sum over leaves,
    // walking through AQE wrappers)
    def scanRows(df: DataFrame): Long = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def walk(p: SparkPlan): Long = {
        val self = p match {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
          case _ => 0L
        }
        val nested = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case _ => p.children
        }
        self + nested.map(walk).sum
      }
      walk(df.queryExecution.executedPlan)
    }

    val bounds = events.agg(min(col("ts")), max(col("ts"))).collect()(0)
    val t0 = bounds.getTimestamp(0).getTime
    val t1 = bounds.getTimestamp(1).getTime
    val sliceLo = new java.sql.Timestamp(t0 + (t1 - t0) / 2)
    val sliceHi = new java.sql.Timestamp(t0 + (t1 - t0) / 2 + (t1 - t0) / 100)
    val someUser = events.filter(col("user_id") % 1000 === 7)
      .agg(min(col("user_id"))).collect()(0).getLong(0)

    def run(layout: String, tag: String, pred: DataFrame => DataFrame)
        : (String, Long, Long, Double) = {
      val base = spark.read.parquet(s"$work/$layout")
      val df = pred(base)
      val t = System.nanoTime()
      df.queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t) / 1e9
      val hits = df.count()
      (tag, hits, scanRows(df), wall)
    }

    val runs = for {
      layout <- Seq("arrival", "usorted", "zorder")
      (ptag, pred) <- Seq[(String, DataFrame => DataFrame)](
        ("user", _.filter(col("user_id") === someUser)),
        ("time", _.filter(col("ts") >= sliceLo && col("ts") < sliceHi)))
    } yield {
      val (tag, hits, scanned, wall) = run(layout, s"$layout/$ptag", pred)
      println(f"[zorder] $tag%-16s hits $hits%8d scanned $scanned%9d " +
        f"(${scanned * 100.0 / nRows}%5.1f%% of lake) wall $wall%5.2fs")
      (tag, hits, scanned, wall)
    }
    // identical answers on every layout
    Seq("user", "time").foreach { p =>
      val hs = runs.filter(_._1.endsWith(p)).map(_._2).distinct
      require(hs.size == 1, s"$p predicate disagrees across layouts: $hs")
    }
    // the claim: each single-column layout prunes ONLY its own column;
    // the z layout prunes BOTH
    val scanned = runs.map(r => r._1 -> r._3).toMap
    require(scanned("zorder/user") < scanned("arrival/user") / 2,
      "z layout must skip most of the lake for the user predicate")
    require(scanned("zorder/time") < scanned("usorted/time") / 2,
      "z layout must skip most of the lake for the time predicate")

    // planning-level prune: the stats manifest answers "which files can
    // contain this slice" without opening a single parquet footer —
    // the file-count lever that matters once lakes have 10^6 files
    val (statsN, statsWall) = {
      val t = System.nanoTime()
      val m = graft.operators.Compactor.writeStatsManifest(
        s"$work/zorder", Seq("user_id", "ts"))
      (m.count(), (System.nanoTime() - t) / 1e9)
    }
    val (prunedHits, prunedFiles, prunedWall) = {
      val t = System.nanoTime()
      val df = graft.operators.Compactor.readPruned(
        s"$work/zorder", "ts", lit(sliceLo), lit(sliceHi))
      df.queryExecution.toRdd.count()
      val w = (System.nanoTime() - t) / 1e9
      (df.count(), df.inputFiles.length, w)
    }
    val inclusiveHits = spark.read.parquet(s"$work/zorder")
      .filter(col("ts") >= sliceLo && col("ts") <= sliceHi).count()
    require(prunedHits == inclusiveHits,
      s"manifest-pruned read must match the full filter: $prunedHits vs $inclusiveHits")
    require(prunedFiles < statsN / 2,
      s"manifest must prune most files: read $prunedFiles of $statsN")
    println(f"[zorder] stats manifest: build ${statsWall}%.2fs; pruned time " +
      f"slice touches $prunedFiles of $statsN files, wall $prunedWall%.2fs")

    // hash-DICTIONARY point skip on a BUCKETED lake — the layout where
    // span stats are provably useless: files clustered by
    // hash(user_id) have min/max covering the whole domain (hash order
    // is not value order), but each file holds |users|/buckets distinct
    // users. The manifest dict makes a point lookup touch only the
    // files that truly contain the key, with no reader-side knowledge
    // of the bucketing function — the self-describing version of
    // bucket pruning. Cap note: the dict is bounded BY DESIGN
    // (over-cap files store null and degrade to span pruning), so the
    // manifest can never bloat past cap x 8 bytes per file per column.
    val nUsers = events.select(countDistinct(col("user_id")))
      .collect()(0).getLong(0)
    val buckets = 128
    events.repartition(buckets, col("user_id"))
      .write.parquet(s"$work/bucketed")
    graft.operators.Compactor.writeStatsManifest(s"$work/bucketed",
      Seq("user_id"), dictCols = Seq("user_id"),
      dictCap = math.max(1024, (nUsers / buckets * 4).toInt))
    val (dictHits, dictFiles, dictWall) = {
      val t = System.nanoTime()
      val df = graft.operators.Compactor.readPrunedEq(
        s"$work/bucketed", Seq(("user_id", lit(someUser))))
      df.queryExecution.toRdd.count()
      val w = (System.nanoTime() - t) / 1e9
      (df.count(), df.inputFiles.length, w)
    }
    val bucketedFull = spark.read.parquet(s"$work/bucketed")
      .filter(col("user_id") === someUser)
    require(dictHits == bucketedFull.count(),
      s"dict-pruned read must match the full filter: $dictHits")
    // span stats CANNOT prune this layout; the dict must
    require(dictFiles <= 2,
      s"dict must isolate the user's bucket file(s): touched $dictFiles")
    val (spanHits, spanWall) = {
      val t = System.nanoTime()
      val c = bucketedFull.count()
      (c, (System.nanoTime() - t) / 1e9)
    }
    require(spanHits == dictHits)
    println(f"[zorder] dict point skip: $dictFiles of $buckets bucket files " +
      f"touched (full scan $spanWall%.2fs -> dict $dictWall%.2fs), " +
      f"$nUsers users")

    // IN-list variant: the prune is the UNION of per-literal dict hits
    // — k keys touch at most k bucket files, never the whole lake
    val inUsers = Seq(someUser, someUser + 7, someUser + 23)
    val (inHits, inFiles, inWall) = {
      val t = System.nanoTime()
      val df = graft.operators.Compactor.readPrunedIn(
        s"$work/bucketed", Seq(("user_id", inUsers.map(lit(_)))))
      df.queryExecution.toRdd.count()
      val w = (System.nanoTime() - t) / 1e9
      (df.count(), df.inputFiles.length, w)
    }
    val inFull = spark.read.parquet(s"$work/bucketed")
      .filter(col("user_id").isin(inUsers: _*)).count()
    require(inHits == inFull,
      s"IN-list pruned read must match the full filter: $inHits vs $inFull")
    require(inFiles <= inUsers.size * 2,
      s"IN-list prune must stay per-literal: touched $inFiles")
    println(f"[zorder] dict IN-list skip: ${inUsers.size} keys touch " +
      f"$inFiles of $buckets files, wall $inWall%.2fs")

    println(f"[zorder] rewrite wall $zWall%.1fs, ${manifest.getLong(1)} files")
    val runJson = runs.map { case (t, h, sc, w) =>
      s"""{"run":"$t","hits":$h,"scan_rows":$sc,"wall_sec":${f2(w)}}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"metric":"zorder_probe","sf":"$sfDir","rows":$nRows,""" +
      s""""zorder_rewrite_sec":${f2(zWall)},"files":${manifest.getLong(1)},""" +
      s""""stats_manifest":{"build_sec":${f2(statsWall)},""" +
      s""""pruned_files":$prunedFiles,"total_files":$statsN,""" +
      s""""wall_sec":${f2(prunedWall)}},""" +
      s""""dict_point_skip":{"bucket_files":$buckets,"touched":$dictFiles,""" +
      s""""users":$nUsers,"full_scan_sec":${f2(spanWall)},""" +
      s""""dict_sec":${f2(dictWall)}},""" +
      s""""dict_in_list_skip":{"keys":${inUsers.size},"touched":$inFiles,""" +
      s""""bucket_files":$buckets,"wall_sec":${f2(inWall)}},""" +
      s""""runs":$runJson}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_zorder_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
