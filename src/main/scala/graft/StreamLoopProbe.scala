package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-leg scale probe (verdict r16 #6): price CurationStream and
  * AnnStream at genuine scale, next to their batch twins.
  *
  * Curation leg — `benchdata/sf10organic` (500k organically-novel
  * docs): bootstrap 60% as batch 0, stream two 20% batches through
  * [[graft.streaming.CurationStream.processBatch]], and run the SAME
  * slices through the batch day loop (bootstrap + runIncremental) in a
  * separate state dir. The claim measured: a streamed batch costs the
  * batch day plus one narrow survivor-metadata output write — there is
  * no streaming tax beyond the emit. Plus the two replay windows at
  * scale: a markered replay is a sub-second no-op, the crash-window
  * replay re-emits without advancing the horizon, and batch-2 streamed
  * output row-equals the batch-loop day-2 output.
  *
  * ANN leg — synthetic hash-noise vectors (the adversarial corpus for
  * recall curves): bootstrap 100k with a measured curve and a stated
  * recall target, append two 200k batches. Appends triple N, the
  * stored absolute-m grid decays, and the drift loop must fire and
  * re-ground the curve IN the batch that decayed it (grid change is
  * observable in meta; needsRetrain false after every batch). A
  * replayed append (marker lost) must insert nothing.
  *
  * Writes BENCH_streamloop_probe.json; last stdout line is the JSON.
  */
object StreamLoopProbe {

  private def f2(d: Double) = math.round(d * 100.0) / 100.0

  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.length > 0) args(0) else "/root/repo/benchdata/sf10organic"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-streamloop-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "64"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{AnnIndex, Caches, IncrementalPipeline}
    import graft.streaming.{AnnStream, CurationStream}

    def settle(): Unit = {
      val t0 = System.nanoTime()
      def load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      while (load > 4.0 && (System.nanoTime() - t0) / 1e9 < 120)
        Thread.sleep(5000)
    }
    def timed[T](body: => T): (T, Double) = {
      settle()
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def tmp(tag: String): String =
      java.nio.file.Files.createTempDirectory(tag).toFile.getAbsolutePath

    // ---- curation leg ------------------------------------------------
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val budget = docs.dropDuplicates("text")
      .agg(sum(size(graft.functions.TextFns.tokens(col("text")))))
      .collect()(0).getLong(0) * 6 / 10 / 4
    val mx = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val (c1, c2) = (mx * 3 / 5, mx * 4 / 5)
    val base = docs.filter(col("doc_id") <= c1)
    val day1 = docs.filter(col("doc_id") > c1 && col("doc_id") <= c2)
    val day2 = docs.filter(col("doc_id") > c2)
    val bench = col("doc_id") % 101 === 0
    val params = IncrementalPipeline.Params(budget)

    // batch twin first (its own state dir)
    val dirB = tmp("slp-batch")
    Caches.release()
    val (_, tBoot) = timed(IncrementalPipeline.bootstrap(dirB, base, bench,
      params).queryExecution.toRdd.count())
    Caches.release()
    val (_, tD1) = timed(IncrementalPipeline.runIncremental(dirB, day1, bench)
      .queryExecution.toRdd.count())
    Caches.release()
    var batchD2Rows: Set[Seq[Any]] = Set.empty
    val (_, tD2) = timed {
      val out = IncrementalPipeline.runIncremental(dirB, day2, bench)
      batchD2Rows = out.collect().map(_.toSeq).toSet
      batchD2Rows.size
    }

    // streamed leg: same slices through processBatch (bootstrap + two
    // days + the full-output emit per batch)
    val dirS = tmp("slp-stream-state")
    val outS = tmp("slp-stream-out")
    Caches.release()
    val (_, tS0) = timed(
      CurationStream.processBatch(base, dirS, outS, bench, params, 0L))
    Caches.release()
    val (_, tS1) = timed(
      CurationStream.processBatch(day1, dirS, outS, bench, params, 1L))
    Caches.release()
    val (_, tS2) = timed(
      CurationStream.processBatch(day2, dirS, outS, bench, params, 2L))
    val streamedRows = spark.read.parquet(s"$outS/batch_id=2")
      .collect().map(_.toSeq).toSet
    val equalRows = streamedRows == batchD2Rows

    // replay windows at scale
    val (_, tReplayMark) = timed(
      CurationStream.processBatch(day2, dirS, outS, bench, params, 2L))
    new java.io.File(s"$dirS/commits/2").delete()
    Caches.release()
    val (_, tReplayCrash) = timed(
      CurationStream.processBatch(day2, dirS, outS, bench, params, 2L))
    val hzOk = IncrementalPipeline.committedHorizon(spark, dirS).contains(mx)

    // ---- ANN leg -----------------------------------------------------
    val dim = 64
    def vecs(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi, 1L, cpus.toInt)
        .select(col("id").as("vec_id"),
          expr(s"transform(sequence(0, ${dim - 1}), " +
            "d -> cast(cast(xxhash64(id * 64 + d) % 997 as float) / 997.0 " +
            "as float))").as("embedding"))
    val ixDir = tmp("slp-ann")
    def grid(): Seq[Int] = AnnIndex.loadSketchMeta(spark, ixDir).curveM
    val (_, tA0) = timed(AnnStream.processBatch(vecs(0, 100000), ixDir, 0L,
      targetRecall = 0.5, k = 10))
    val g0 = grid()
    val (_, tA1) = timed(AnnStream.processBatch(vecs(100000, 300000), ixDir, 1L,
      targetRecall = 0.5, k = 10))
    val g1 = grid()
    val (_, tA2) = timed(AnnStream.processBatch(vecs(300000, 500000), ixDir, 2L,
      targetRecall = 0.5, k = 10))
    val g2 = grid()
    val retrainAfter =
      AnnIndex.needsRetrain(spark, ixDir, k = 10, targetRecall = 0.5)
    // replay with the marker lost: the id anti-join must insert nothing
    def nVec = spark.read.parquet(s"$ixDir/vectors").count()
    val n0 = nVec
    new org.apache.hadoop.fs.Path(s"$ixDir/commits/2")
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(s"$ixDir/commits/2"), false)
    val (_, tAReplay) = timed(AnnStream.processBatch(vecs(300000, 500000),
      ixDir, 2L, targetRecall = 0.5, k = 10))
    val replayNoop = nVec == n0

    val json =
      s"""{"metric":"streamloop_probe","sf":"$sfDir","rows":${docs.count()},""" +
      s""""curation":{"batch":{"bootstrap_sec":${f2(tBoot)},""" +
      s""""day1_sec":${f2(tD1)},"day2_sec":${f2(tD2)}},""" +
      s""""streamed":{"batch0_sec":${f2(tS0)},"batch1_sec":${f2(tS1)},""" +
      s""""batch2_sec":${f2(tS2)}},""" +
      s""""equal_rows":$equalRows,"replay_marker_sec":${f2(tReplayMark)},""" +
      s""""replay_crash_sec":${f2(tReplayCrash)},"horizon_stable":$hzOk},""" +
      s""""ann":{"bootstrap_100k_sec":${f2(tA0)},""" +
      s""""append_200k_sec":[${f2(tA1)},${f2(tA2)}],""" +
      s""""curve_reground":[${g0 != g1},${g1 != g2}],""" +
      s""""needs_retrain_after":$retrainAfter,""" +
      s""""replay_sec":${f2(tAReplay)},"replay_noop":$replayNoop}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_streamloop_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
