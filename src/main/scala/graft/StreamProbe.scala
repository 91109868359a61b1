package graft

import org.apache.spark.sql.{SparkSession, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Sustained-rate probe for the two-hop streaming topology (VERDICT r6
  * task 6, widened to key-width scaling in r8): the collector hop
  * ([[graft.streaming.FlushStream.bundleTextFileSink]] — per-key
  * size-rotated bundle assignment via `flatMapGroupsWithState`, text
  * bundle files out) chained into the flusher hop
  * ([[graft.streaming.FlushStream.flushToPartitionedLake]] —
  * file-stream source over the committed bundle manifest, date-
  * partitioned parquet lake out). Correctness and double-restart
  * exactly-once are proven in PipelineE2ESpec; this measures the
  * numbers a capacity plan needs, from `StreamingQueryProgress`:
  *   - records/s per hop (wall and engine-reported peak),
  *   - micro-batch count (maxFilesPerTrigger paces the drain, so the
  *     state machine is exercised across many batches, not one giant
  *     replay),
  *   - flatMapGroupsWithState state-store peak rows + bytes (the
  *     collector holds ONE accumulator per key — state must scale with
  *     KEYS, never records),
  *   - end-to-end wall and a record-exact lake count.
  *
  * The probe runs the whole topology once per key width (default 8 and
  * 1024): `flatMapGroupsWithState` serializes each key's appends, so
  * key width IS hop 1's parallelism ceiling — 8 keys on a 32-core box
  * is an 8-way pipe, ~1024 keys (the per-host/per-topic fan a real log
  * shipper has — reference analog: one collector per source,
  * `core/collector.py:57-80`) must scale throughput up while state
  * rows stay == keys.
  *
  * A third hop closes the wide-key small-file story: at 1,024 keys the
  * per-batch-per-key lake writes leave thousands of small part files,
  * and the answer is the batch compactor — hop 3 runs
  * [[graft.operators.Compactor.compactDirectoryIncremental]] over the
  * streamed lake and the probe reports its wall, the file-count
  * collapse (in → out), and byte-exact blob preservation, so the
  * "compaction absorbs this" claim is a measured row, not prose.
  *
  * Payload is md5-chained (incompressible) so the ~1 GB driven through
  * the text bundles is a real gigabyte on disk, not a compression
  * artifact.
  *
  * Usage: runMain graft.StreamProbe [workDir] [nRecords] [keyWidths]
  * (keyWidths comma-separated, default "8,1024"). Run with
  * SPARK_DRIVER_MEM=16g — the whole-bundle rows of hop 2 OOM the
  * default 8 g single-JVM heap (0.5 GB/core is the documented sizing
  * for whole-object streaming rows, SURVEY §13 task 6). Emits one JSON
  * line (last stdout line) and writes BENCH_stream_probe.json in cwd.
  */
object StreamProbe {

  private def progressStats(q: StreamingQuery): (Long, Int, Double, Long, Long) = {
    val ps = q.recentProgress
    val rows = ps.map(_.numInputRows).sum
    val peakRate = ps.map(_.processedRowsPerSecond)
      .filterNot(_.isNaN).foldLeft(0.0)(math.max)
    val statePeakRows = ps.flatMap(_.stateOperators.map(_.numRowsTotal))
      .foldLeft(0L)(math.max)
    val statePeakBytes = ps.flatMap(_.stateOperators.map(_.memoryUsedBytes))
      .foldLeft(0L)(math.max)
    (rows, ps.length, peakRate, statePeakRows, statePeakBytes)
  }

  private def f0(d: Double) = math.round(d)
  private def f2(d: Double) = math.round(d * 100.0) / 100.0

  /** One full two-hop run at a given key width; returns the JSON
    * fragment for this width. The work dir is wiped first — each width
    * starts from clean staging/bundles/lake/checkpoints.
    */
  private def runOne(spark: SparkSession, work: String, nRecs: Long,
                     nKeys: Int): String = {
    import graft.streaming.FlushStream

    val staging = s"$work/staging"
    val bundles = s"$work/bundles"
    val lake = s"$work/lake"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))

    // ~1 KiB incompressible payload per record: 32 chained md5 blocks
    // (codegen'd, deterministic). size carries the payload length the
    // rotation fold bins on.
    val payload = concat((0 until 32).map(i =>
      md5(concat(col("id").cast("string"), lit(s":$i")))): _*)
    val gen = spark.range(nRecs)
      .select(
        concat(lit("k"), pmod(col("id"), lit(nKeys.toLong))).as("key"),
        col("id").as("event_id"),
        (lit(1700000000000000000L) + col("id") * 1000000L).as("ts_ns"),
        length(payload).cast("long").as("size"),
        payload.as("payload"))
    gen.repartition(256).write.parquet(staging)
    val totalBytes = spark.read.parquet(staging)
      .agg(sum(col("size"))).collect()(0).getLong(0)

    // Hop 1: collector — 32 staging files per micro-batch, so rotation
    // state crosses ~8 batch boundaries instead of one bulk replay.
    // 8 MiB bundles: hop 2 ships each bundle file as ONE whole-text row
    // (the reference flusher moves bundles as opaque objects), so the
    // bundle size IS hop 2's row size — 8 MiB keeps 32 concurrent
    // whole-bundle rows (UTF-16 doubled, plus parquet page + compressor
    // buffers) comfortably inside the default heap, where 32 MiB
    // bundles OOMed the lake write. The same sizing rule applies on a
    // real cluster: whole-object rows budget executor memory at
    // rowsPerTask x bundleBytes x ~4.
    val t1 = System.nanoTime()
    val recs = spark.readStream
      .schema(Encoders.product[FlushStream.PayloadRec].schema)
      .option("maxFilesPerTrigger", "32")
      .parquet(staging)
      .as[FlushStream.PayloadRec](Encoders.product[FlushStream.PayloadRec])
    val q1 = FlushStream.bundleTextFileSink(
      recs, targetBytes = 8L << 20, bundles, s"$work/ckpt1")
    q1.awaitTermination()
    val hop1Wall = (System.nanoTime() - t1) / 1e9
    val (h1Rows, h1Batches, h1Peak, h1StateRows, h1StateBytes) = progressStats(q1)

    // Hop 2: flusher — consumes hop 1's committed file manifest
    val t2 = System.nanoTime()
    val q2 = FlushStream.flushToPartitionedLake(
      spark, bundles, lake, s"$work/ckpt2")
    q2.awaitTermination()
    val hop2Wall = (System.nanoTime() - t2) / 1e9
    val (h2Rows, h2Batches, h2Peak, _, _) = progressStats(q2)

    // record-exact delivery: each lake row is one WHOLE bundle file
    // (opaque blob); the records inside are its newline-terminated
    // lines, so newline count across the lake == records generated
    val lakeDf = spark.read.parquet(lake)
    val lakeBundles = lakeDf.count()
    val lakeRecords = lakeDf
      .select(sum(length(col("content")) -
        length(regexp_replace(col("content"), "\n", ""))).as("n"))
      .collect()(0).getLong(0)
    require(lakeRecords == nRecs && h1Rows == nRecs,
      s"lost records: lakeRecords=$lakeRecords hop1In=$h1Rows expected=$nRecs")

    // Hop 3: the batch compactor absorbs the streaming sink's
    // small-file residue (at wide key counts the per-batch-per-key
    // lake writes leave thousands of small part files — the documented
    // wide-key cost). One incremental-compaction pass consolidates the
    // lake's parquet part files into ~totalBytes/target bundles; rerun
    // on a schedule it keeps absorbing new residue through the
    // watermark fast path. MEASURED, not claimed:
    def dataFiles(dir: String): Seq[java.nio.file.Path] = {
      val root = java.nio.file.Paths.get(dir)
      val out = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
      val stream = java.nio.file.Files.walk(root)
      try stream.forEach { p =>
        // hidden SEGMENTS disqualify, not just the basename — the files
        // inside _spark_metadata/ have plain names
        val hidden = root.relativize(p).iterator()
        var skip = false
        while (hidden.hasNext && !skip) {
          val s = hidden.next().toString
          skip = s.startsWith("_") || s.startsWith(".")
        }
        if (!skip && java.nio.file.Files.isRegularFile(p)) out += p
      } finally stream.close()
      out.toSeq
    }
    val filesIn = dataFiles(lake).size
    val compacted = s"$work/lake_compacted"
    // tiny parquet parts at 4 MiB phantom open cost would pack ~32
    // files per task; same trade as CompactProbe (warm-store open cost
    // is far below 4 MiB)
    val prevOpenCost = spark.conf.getOption("spark.sql.files.openCostInBytes")
    spark.conf.set("spark.sql.files.openCostInBytes", (64L * 1024).toString)
    val (hop3Bundles, hop3Wall) =
      try {
        val t3 = System.nanoTime()
        val mf = graft.operators.Compactor.compactDirectoryIncremental(
          lake, compacted, targetBytes = 64L << 20)(spark)
        val b = mf.count()
        (b, (System.nanoTime() - t3) / 1e9)
      } finally prevOpenCost match {
        case Some(v) => spark.conf.set("spark.sql.files.openCostInBytes", v)
        case None    => spark.conf.unset("spark.sql.files.openCostInBytes")
      }
    val filesOut = dataFiles(compacted).size
    // byte-exact preservation: every lake part file survives as a
    // byte-identical blob row (path + md5(content) sets equal), and the
    // lake itself was just verified record-exact against nRecs — so the
    // compacted lake carries exactly the generated records
    val origSig = spark.read.format("binaryFile").load(lake)
      .select(col("path"), md5(col("content")).as("sig"))
    val compSig = spark.read.parquet(compacted)
      .select(col("path"), md5(col("content")).as("sig"))
    require(compSig.count() == filesIn &&
        origSig.except(compSig).isEmpty && compSig.except(origSig).isEmpty,
      "compacted lake is not a byte-exact copy of the streamed lake")
    val e2e = hop1Wall + hop2Wall + hop3Wall

    s"""{"keys":$nKeys,"payload_bytes":$totalBytes,""" +
    s""""hop1_wall_sec":${f2(hop1Wall)},"hop1_rows_per_sec":${f0(nRecs / hop1Wall)},""" +
    s""""hop1_peak_engine_rows_per_sec":${f0(h1Peak)},"hop1_batches":$h1Batches,""" +
    s""""hop1_state_peak_rows":$h1StateRows,"hop1_state_peak_bytes":$h1StateBytes,""" +
    s""""hop2_wall_sec":${f2(hop2Wall)},"hop2_bundles":$h2Rows,""" +
    s""""hop2_records_per_sec":${f0(nRecs / hop2Wall)},""" +
    s""""hop2_peak_engine_bundles_per_sec":${f2(h2Peak)},"hop2_batches":$h2Batches,""" +
    s""""hop3_lake_files_in":$filesIn,"hop3_wall_sec":${f2(hop3Wall)},""" +
    s""""hop3_bundles":$hop3Bundles,"hop3_lake_files_out":$filesOut,""" +
    s""""hop3_mb_per_sec":${f2(totalBytes / 1e6 / hop3Wall)},""" +
    s""""end_to_end_sec":${f2(hop1Wall + hop2Wall)},""" +
    s""""mb_per_sec_end_to_end":${f2(totalBytes / 1e6 / (hop1Wall + hop2Wall))},""" +
    s""""end_to_end_with_compaction_sec":${f2(e2e)},""" +
    s""""mb_per_sec_with_compaction":${f2(totalBytes / 1e6 / e2e)},""" +
    s""""verified_lake_bundles":$lakeBundles,"verified_lake_records":$lakeRecords,""" +
    s""""verified_compacted_byte_exact":true}"""
  }

  def main(args: Array[String]): Unit = {
    val work = if (args.length > 0) args(0)
               else "/root/repo/benchdata/streamprobe"
    val nRecs = if (args.length > 1) args(1).toLong else 1000000L
    val widths = (if (args.length > 2) args(2) else "8,1024")
      .split(",").map(_.trim.toInt).toSeq

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // blob-lake writer memory bound (see flushToPartitionedLake
      // scaladoc): whole-bundle rows + the default 128 MiB parquet row
      // group OOM concurrent writers; MUST be a session setting — the
      // streaming file sink ignores writer options in its hadoop conf
      .config("spark.hadoop.parquet.block.size", (32L << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val runs = widths.map { k =>
      println(s"[streamprobe] running key width $k ...")
      runOne(spark, work, nRecs, k)
    }
    val json =
      s"""{"metric":"stream_throughput","records":$nRecs,""" +
      s""""key_widths":${widths.mkString("[", ",", "]")},""" +
      s""""driver_heap_max_mb":${Runtime.getRuntime.maxMemory() / (1024 * 1024)},""" +
      s""""cpus":$cpus,"errors":0,"runs":${runs.mkString("[", ",", "]")}}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_stream_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => }
    println(json)
    spark.stop()
  }
}
