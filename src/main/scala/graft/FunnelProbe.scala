package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Throughput + state-size probe for the streaming funnel (VERDICT r10
  * task 2): every other streaming claim carries a measured row
  * (rotation state 430 B/key, dedup stream per-batch parity) — this
  * drives >= 1M events through
  * [[graft.streaming.FunnelStream.funnelStream]] under AvailableNow
  * with a multi-batch in-order split and records, per micro-batch,
  * the state-store rows/bytes from `StreamingQueryProgress`, plus
  * records/s and the output hit count.
  *
  * == What the numbers must show ==
  * State rows must track IN-FLIGHT FUNNELS (one (stage, anchor) pair
  * per user whose attempt can still change), never events: the peak
  * stays ~nUsers regardless of nRecs, and the per-batch series DROPS
  * once the event-time watermark passes completed attempts' deadlines
  * — the eviction arc, not a monotone leak.
  *
  * == What the run itself regression-tests ==
  * The per-user step cycle is view -> click -> purchase -> other, so a
  * completed attempt is still stored when the user's next view
  * arrives; one cycle later the watermark has passed the stored
  * deadline and that view arrives as DATA for a key whose deadline
  * already expired — the exact invocation that used to throw
  * `setTimeoutTimestamp <= watermark` (IllegalArgumentException) and
  * kill the query before the r11 entry-eviction fix. At ~50k users x
  * many cycles this probe replays that collision massively; it
  * completing at all is the fix's at-scale witness.
  *
  * Usage: runMain graft.FunnelProbe [workDir] [nRecords] [nUsers]
  * [nChunks]. Appends a "funnel" section to BENCH_stream_probe.json
  * (replacing any previous one) and prints the section as the last
  * stdout line.
  */
object FunnelProbe {

  private def f0(d: Double) = math.round(d)
  private def f2(d: Double) = math.round(d * 100.0) / 100.0

  def main(args: Array[String]): Unit = {
    val work = if (args.length > 0) args(0)
               else "/root/repo/benchdata/funnelprobe"
    val nRecs = if (args.length > 1) args(1).toLong else 1600000L
    val nUsers = if (args.length > 2) args(2).toInt else 50000
    val nChunks = if (args.length > 3) args(3).toInt else 16

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    val staging = s"$work/staging"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(staging))

    // One event per ms of event time, users round-robin: a user's steps
    // are nUsers ms apart, cycling view -> click -> purchase -> other.
    // Window = 5 * nUsers ms, so view->click->purchase (2 * nUsers ms)
    // completes comfortably while completed attempts outlive the NEXT
    // view (4 * nUsers ms later) — forcing the expired-deadline data
    // collision the scaladoc describes on the cycle after that.
    val windowNs = 5L * nUsers * 1000000L
    val typeArr = array(lit("view"), lit("click"), lit("purchase"), lit("other"))
    def chunk(start: Long, end: Long) = spark.range(start, end).select(
      pmod(col("id"), lit(nUsers.toLong)).as("user_id"),
      element_at(typeArr,
        (pmod(floor(col("id") / nUsers).cast("long"), lit(4L)) + 1).cast("int"))
        .as("event_type"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 1000L).as("ts"))

    // nChunks in-order files with increasing mtimes: FileStreamSource +
    // maxFilesPerTrigger=1 turns them into nChunks ordered micro-batches
    val sz = nRecs / nChunks
    (0 until nChunks).foreach { i =>
      val stage = s"$work/stage_$i"
      chunk(i * sz, if (i == nChunks - 1) nRecs else (i + 1) * sz)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = java.nio.file.Paths.get(staging, f"chunk_$i%04d.parquet")
      java.nio.file.Files.copy(part.toPath, dest)
      dest.toFile.setLastModified(1700000000000L + i * 60000L)
    }

    val t0 = System.nanoTime()
    val q = graft.streaming.FunnelStream.funnelStream(
        spark.readStream.schema(spark.read.parquet(staging).schema)
          .option("maxFilesPerTrigger", 1).parquet(staging),
        Seq("view", "click", "purchase"), windowNs, watermark = "5 seconds")
      .writeStream.format("parquet")
      .option("path", s"$work/hits")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    require(q.exception.isEmpty, s"funnel stream failed: ${q.exception}")

    val ps = q.recentProgress
    val stateSeries = ps.flatMap(p => p.stateOperators.headOption.map(so =>
      (p.batchId, p.numInputRows, so.numRowsTotal, so.memoryUsedBytes)))
    val peakRows = stateSeries.map(_._3).foldLeft(0L)(math.max)
    val peakBytes = stateSeries.map(_._4).foldLeft(0L)(math.max)
    val lastRows = if (stateSeries.nonEmpty) stateSeries.last._3 else 0L
    val hits = spark.read.parquet(s"$work/hits").count()
    val completed = spark.read.parquet(s"$work/hits")
      .filter(col("stage_idx") === 3).count()
    require(hits > 0 && completed > 0, "degenerate probe: no funnel hits")
    // the state contract, asserted not narrated: bounded by users (one
    // in-flight pair each), never by events
    require(peakRows <= nUsers.toLong + 1,
      s"state rows $peakRows exceed the one-pair-per-user bound $nUsers")

    val seriesJson = stateSeries.map { case (b, in, rows, bytes) =>
      s"""{"batch":$b,"rows_in":$in,"state_rows":$rows,"state_bytes":$bytes}"""
    }.mkString("[", ",", "]")
    val perPair = if (peakRows > 0) peakBytes.toDouble / peakRows else 0.0
    val funnel =
      s"""{"records":$nRecs,"users":$nUsers,"batches":${ps.length},""" +
      s""""wall_sec":${f2(wall)},"records_per_sec":${f0(nRecs / wall)},""" +
      s""""hits":$hits,"completed_funnels":$completed,""" +
      s""""state_peak_rows":$peakRows,"state_peak_bytes":$peakBytes,""" +
      s""""state_bytes_per_pair":${f0(perPair)},"state_last_rows":$lastRows,""" +
      s""""state_series":$seriesJson}"""

    // merge into BENCH_stream_probe.json as the "funnel" section (it is
    // always spliced last, so replacing = truncate at the old key)
    val benchPath = java.nio.file.Paths.get("BENCH_stream_probe.json")
    try {
      val line = new String(java.nio.file.Files.readAllBytes(benchPath), "UTF-8").trim
      val base = line.indexOf(",\"funnel\":") match {
        case -1 => line.stripSuffix("}")
        case i  => line.substring(0, i)
      }
      java.nio.file.Files.write(benchPath,
        (base + s""","funnel":$funnel}""" + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => } // missing artifact: stdout still carries it
    println(s"""{"metric":"funnel_stream","funnel":$funnel}""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
