package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming flush stage (reference Flusher, SURVEY §3c) as Structured
  * Streaming: watch a directory of collected bundles, ship each new one
  * to a partitioned destination, exactly-once.
  *
  * Reference semantics replaced one-for-one:
  *  - watchdog `on_moved` event (`core/event_handler.py:10-12`) ->
  *    file-stream source discovery (only committed files are visible);
  *  - 1 s poll loop (`core/flusher.py:56-59`) -> processing-time
  *    trigger / `Trigger.AvailableNow` for batch-drain;
  *  - wall-clock `strftime` partition dirs (`flushers/local_lake.py:
  *    55-60`) -> event/processing-time partition COLUMNS (year/month/
  *    day), which downstream engines can prune on;
  *  - at-most-once + lost-event bundles (flusher crash drops the event
  *    forever — SURVEY §3c step 5) -> checkpointed source offsets:
  *    restart resumes from the last committed batch, nothing dropped,
  *    nothing double-shipped.
  */
object FlushStream {

  /** Stream whole-file text bundles from `collectedDir` into a
    * date-partitioned parquet lake. `clock` defaults to the file's own
    * mtime so tests (and Verify) are hash-stable — pass
    * `current_timestamp()` for reference-faithful wall-clock
    * partitioning (SURVEY §7 "hard bits").
    *
    * == Session requirement for MB-scale bundles ==
    * This lake is BLOB-shaped — each row is a whole bundle — and
    * parquet's default 128 MiB row group makes every concurrent writer
    * buffer 128 MiB of pages plus compressor copies; at normal task
    * concurrency that alone exceeds an executor's heap share (measured:
    * shipping 1 GB of 8 MiB bundles OOMed an 8g local[32] driver, ~20
    * concurrent lake writers). Cap the row group in the SESSION conf,
    * e.g. `.config("spark.hadoop.parquet.block.size", 32 << 20)`: a
    * 32 MiB group still holds several bundles, blob content is fetched
    * whole (never column-scanned), and writer memory drops to
    * ~concurrent tasks x ~3 x 32 MiB. It must be a session setting
    * because Spark's streaming file sink builds its hadoop conf WITHOUT
    * writer options (`FileStreamSink` uses `newHadoopConf`, unlike the
    * batch writer's `newHadoopConfWithOptions`) — a `.option(...)` here
    * would be silently ignored.
    */
  def flushToPartitionedLake(spark: SparkSession, collectedDir: String,
                             destDir: String, checkpointDir: String,
                             trigger: Trigger = Trigger.AvailableNow(),
                             clock: Option[org.apache.spark.sql.Column] = None,
                             maxFileAge: String = "3650d"): StreamingQuery = {
    val ts = clock.getOrElse(col("mtime"))
    val src = spark.readStream
      .option("wholetext", "true")
      // The source's default maxFileAge (7d, relative to the NEWEST seen
      // file) silently drops bundles whose mtime lags a fresher file —
      // fatal for a ship-everything flusher. Trade seen-map size for
      // no-data-loss; tighten only with dir-retention guarantees.
      .option("maxFileAge", maxFileAge)
      .text(collectedDir)
      .select(
        col("_metadata.file_path").as("src_path"),
        col("_metadata.file_modification_time").as("mtime"),
        col("value").as("content"))
      .filter(length(col("content")) > 0) // F2: empty-bundle skip
      .withColumn("year", date_format(ts, "yyyy"))
      .withColumn("month", date_format(ts, "MM"))
      .withColumn("day", date_format(ts, "dd"))
    src.writeStream
      .format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("year", "month", "day")
      .trigger(trigger)
      .start()
  }

  /** Spark's event-time machinery (`withWatermark`) accepts only
    * TIMESTAMP, but parquet sources routinely surface event time as
    * TIMESTAMP_NTZ (any writer that omits tz annotation — including the
    * driver's regenerated events table). Normalize at the streaming
    * entry points: an NTZ event-time column is cast to TIMESTAMP,
    * interpreting its wall clock in the session timezone (run streams
    * under UTC for tz-free semantics); any other type is left alone so
    * the engine's own type error still surfaces.
    */
  private def watermarked(df: DataFrame, tsCol: String,
                          watermark: String): DataFrame = {
    val norm = df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _ => df
    }
    norm.withWatermark(tsCol, watermark)
  }

  /** Streaming sessionization over an event stream: event-time session
    * windows with a watermark (the streaming twin of batch
    * `e01_sessionize`; late data beyond the watermark is dropped rather
    * than corrupting closed sessions).
    */
  def sessionized(events: DataFrame, gapMinutes: Int = 30,
                  watermark: String = "1 hour"): DataFrame =
    watermarked(events, "ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("first_event"))

  /** Streaming exact dedup by key with bounded state — the streaming
    * twin of batch `d01_exact_dedup` and the first stage of a streaming
    * training-data pipeline. `dropDuplicatesWithinWatermark` keeps
    * per-key state only until the watermark passes, so state size is
    * bounded by the key arrival rate x watermark window (an unbounded
    * `dropDuplicates` would leak state forever on a 100 TB stream).
    */
  def dedupedStream(events: DataFrame, keys: Seq[String],
                    watermark: String = "1 hour"): DataFrame =
    watermarked(events, "ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** One record headed for a bundle: collector key, a unique id, exact
    * event-time ns, payload size.
    */
  case class BundleRec(key: String, event_id: Long, ts_ns: Long, size: Long)
  private[graft] case class BundleAcc(seq: Long, bytes: Long, n: Long,
                                      firstId: Long, openedAt: Long)
  /** One CLOSED bundle (the in-progress one stays in state). */
  case class BundleEmit(key: String, bundle_seq: Long, n_records: Long,
                        total_bytes: Long, first_event: Long)

  /** The reference's rotation contract (W1): roll when size OR age
    * exceeds its limit, whichever first — size per
    * `core/file_handler.py:43-59` (`current_size + len(next) >=
    * max_bytes`; the triggering record opens the NEXT bundle), age per
    * `core/collector.py:62-71` (roll when `now - created_at` passes the
    * limit, measured from bundle OPEN, not last append; tested at
    * `tests/core/test_collector.py:112-135`) — as CUSTOM STREAMING
    * STATE: `flatMapGroupsWithState` keeping one running (seq, bytes,
    * n, openedAt) accumulator per collector key. Closed bundles are
    * emitted downstream (append mode); the open bundle survives in
    * state across micro-batches, exactly like the reference's
    * in-progress file survives across poll ticks.
    *
    * The age half uses `ProcessingTimeTimeout`: each batch arms the
    * timeout for the open bundle's REMAINING age, so an under-target
    * bundle with no new records still closes on time — the micro-batch
    * engine schedules timeout-only batches for this. With
    * `maxAgeMs = None` the operator is pure size rotation (NoTimeout),
    * bitwise-deterministic, and the exact streaming twin of
    * [[graft.operators.Compactor.withBundleId]] (oracle-checked as
    * `c01_bundle_assign`); with an age limit, WHICH bundle a record
    * lands in necessarily depends on wall clock, same as the reference.
    *
    * Config migration: a checkpoint written with `maxAgeMs = None`
    * carries `openedAt = -1` and NO timeout timestamp in its state
    * rows, so restarting it WITH an age limit is rejected loudly by
    * Spark's state schema check (STATE_STORE_VALUE_SCHEMA_NOT_
    * COMPATIBLE — pinned in FlushStreamSpec). If a deployment forces
    * the migration with `stateSchemaCheck=false`, the fold treats the
    * unknown open time as opened-NOW (stamped on the first batch that
    * sees the key), never as infinitely old — without that, the timer
    * would arm at `-1 + limit - now` (clamped to 1 ms) and close the
    * bundle immediately regardless of its true age.
    *
    * State size: one accumulator per key — bounded by key cardinality,
    * independent of throughput. Per key per micro-batch the records are
    * sorted (ts_ns, event_id) so emission is deterministic; a group's
    * batch slice must fit in task memory (inherent to the
    * mapGroupsWithState API, same bound the hash aggregate needs).
    */
  def sizeRotatedBundles(recs: Dataset[BundleRec], targetBytes: Long,
                         maxAgeMs: Option[Long] = None): Dataset[BundleEmit] = {
    import recs.sparkSession.implicits._
    require(targetBytes >= 1)
    require(maxAgeMs.forall(_ >= 1))
    val timeoutConf =
      if (maxAgeMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    recs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (key: String, rows: Iterator[BundleRec], state: GroupState[BundleAcc]) => {
          var acc = state.getOption.getOrElse(
            BundleAcc(0L, 0L, 0L, Long.MaxValue, -1L))
          val out = scala.collection.mutable.ArrayBuffer[BundleEmit]()
          def close(): Unit = {
            out += BundleEmit(key, acc.seq, acc.n, acc.bytes, acc.firstId)
            acc = BundleAcc(acc.seq + 1, 0L, 0L, Long.MaxValue, -1L)
          }
          val now = maxAgeMs.map(_ => state.getCurrentProcessingTimeMs())
          // A checkpoint written with maxAgeMs=None carries openedAt=-1;
          // restarted WITH an age limit, that bundle's true open time is
          // unknown. Treat it as opened-now (stamp below) — never as
          // infinitely old: without this guard the timer arms at
          // openedAt+limit-t (hugely negative, clamped to 1 ms) and the
          // timeout closes the bundle immediately regardless of age.
          val legacyOpen = acc.n > 0 && acc.openedAt < 0
          // age half: close an expired open bundle FIRST, whether this
          // wake-up is a timeout (no rows) or new data racing the clock
          if (state.hasTimedOut && acc.n > 0 && !legacyOpen) close()
          else for (limit <- maxAgeMs; t <- now)
            if (acc.n > 0 && acc.openedAt >= 0 && t - acc.openedAt >= limit) close()
          if (acc.n > 0 && acc.openedAt < 0)
            for (t <- now) acc = acc.copy(openedAt = t)
          rows.toSeq.sortBy(r => (r.ts_ns, r.event_id)).foreach { r =>
            if (acc.n > 0 && acc.bytes + r.size >= targetBytes) close()
            val opened = if (acc.n == 0) now.getOrElse(-1L) else acc.openedAt
            acc = BundleAcc(acc.seq, acc.bytes + r.size, acc.n + 1,
              math.min(acc.firstId, r.event_id), opened)
          }
          state.update(acc)
          // arm the clock for the open bundle's remaining age; an empty
          // accumulator has no age and sets no timer
          for (limit <- maxAgeMs; t <- now)
            if (acc.n > 0 && acc.openedAt >= 0)
              state.setTimeoutDuration(math.max(1L, acc.openedAt + limit - t))
          out.iterator
        })
  }

  /** One payload-bearing record headed for a bundle FILE. */
  case class PayloadRec(key: String, event_id: Long, ts_ns: Long,
                        size: Long, payload: String)
  /** A record stamped with its assigned bundle. */
  case class BundledRec(key: String, bundle_seq: Long, event_id: Long,
                        ts_ns: Long, payload: String)

  /** Per-record bundle ASSIGNMENT as streaming state: the same
    * size-rotation fold as [[sizeRotatedBundles]], but emitting every
    * record immediately, stamped with the bundle it belongs to, instead
    * of a manifest row per closed bundle. This is what a payload sink
    * needs — records flow to files as they arrive; the accumulator (one
    * per key) carries (seq, bytes) across micro-batches so assignment
    * is identical to the reference's single-writer fold.
    */
  def bundleAssignedRecords(recs: Dataset[PayloadRec],
                            targetBytes: Long): Dataset[BundledRec] = {
    import recs.sparkSession.implicits._
    require(targetBytes >= 1)
    recs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[PayloadRec], state: GroupState[BundleAcc]) => {
          var acc = state.getOption.getOrElse(
            BundleAcc(0L, 0L, 0L, Long.MaxValue, -1L))
          val out = scala.collection.mutable.ArrayBuffer[BundledRec]()
          rows.toSeq.sortBy(r => (r.ts_ns, r.event_id)).foreach { r =>
            if (acc.n > 0 && acc.bytes + r.size >= targetBytes)
              acc = BundleAcc(acc.seq + 1, 0L, 0L, Long.MaxValue, -1L)
            acc = BundleAcc(acc.seq, acc.bytes + r.size, acc.n + 1,
              math.min(acc.firstId, r.event_id), acc.openedAt)
            out += BundledRec(key, acc.seq, r.event_id, r.ts_ns, r.payload)
          }
          state.update(acc)
          out.iterator
        })
  }

  /** End-to-end streaming collector (W1+K2 payload path): records in,
    * BUNDLE FILES out. Each bundle is the partition directory
    * `key=<k>/bundle_seq=<n>` of a parquet file-sink write — the
    * built-in sink's `_spark_metadata` manifest makes file emission
    * exactly-once across restarts (the reference's crash contract loses
    * the in-progress file; here the checkpoint replays it). A bundle's
    * records may span micro-batches; its directory accretes part files
    * until rotation moves the key to the next seq, and downstream reads
    * prune on (key, bundle_seq) like any partitioned table.
    */
  def bundleFileSink(recs: Dataset[PayloadRec], targetBytes: Long,
                     bundleDir: String, checkpointDir: String,
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    bundleAssignedRecords(recs, targetBytes).writeStream
      .format("parquet")
      .option("path", bundleDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("key", "bundle_seq")
      .trigger(trigger)
      .start()

  /** Text-bundle variant of [[bundleFileSink]]: one LINE per record in
    * `key=<k>/bundle_seq=<n>` dirs — the reference collector's on-disk
    * shape (`core/file_handler.py` text bundles), and the hand-off
    * format [[flushToPartitionedLake]] consumes. Chaining the two is
    * the full reference topology (collector -> flusher) as two
    * checkpointed streaming queries: this sink's `_spark_metadata`
    * manifest makes the downstream file-stream source see only
    * COMMITTED bundle files, so the hops compose exactly-once — either
    * hop can crash/restart without losing or double-shipping a record
    * (PipelineE2ESpec proves the double restart).
    */
  def bundleTextFileSink(recs: Dataset[PayloadRec], targetBytes: Long,
                         bundleDir: String, checkpointDir: String,
                         trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    bundleAssignedRecords(recs, targetBytes)
      .select(col("payload").as("value"), col("key"), col("bundle_seq"))
      .writeStream
      .format("text")
      .option("path", bundleDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("key", "bundle_seq")
      .trigger(trigger)
      .start()

  /** Streaming training-data cleaning: the first two stages of the
    * batch `p01_clean_corpus` pipeline as an incremental stream —
    * quality gate (token floor) then exact dedup on the normalized-text
    * fingerprint, with per-fingerprint state bounded by the watermark
    * (an arriving duplicate beyond the watermark re-admits; that is the
    * documented streaming-vs-batch divergence, same trade every
    * bounded-state dedup makes). Near-dup LSH stays batch: its
    * candidate self-join needs the full corpus on both sides.
    */
  def cleanCorpusStream(docs: DataFrame, minTokens: Int = 20,
                        watermark: String = "1 hour"): DataFrame = {
    val toks = filter(split(lower(col("text")), "[^a-z0-9]+"),
      (w: org.apache.spark.sql.Column) => w =!= "")
    docs
      .withColumn("n_tok", size(toks).cast("long"))
      .filter(col("n_tok") >= minTokens)
      .withColumn("fp", md5(graft.functions.TextFns.normalizeText(col("text"))))
      .transform(watermarked(_, "ts", watermark))
      .dropDuplicatesWithinWatermark(Seq("fp"))
  }

  /** Streaming NEAR-dup suppression by SimHash fingerprint: documents
    * whose SimHash (≤32 bits, one md5 per word) collides within the
    * watermark window are dropped — catches boilerplate variants that exact-fingerprint
    * dedup ([[cleanCorpusStream]]) misses, at per-record cost (one
    * codegen'd expression, no joins, no candidate generation). State is
    * one entry per distinct fingerprint per watermark window. The
    * full pairwise near-dup families (MinHash/LSH, Jaccard, embedding)
    * stay batch: their candidate self-joins need the corpus on both
    * sides.
    */
  def nearDupStream(docs: DataFrame, bits: Int = 32,
                    watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("simhash", graft.functions.TextFns.simhashBits(
        graft.functions.TextFns.tokens(col("text")), bits))
      .transform(watermarked(_, "ts", watermark))
      .dropDuplicatesWithinWatermark(Seq("simhash"))

  /** Streaming hourly tumbling-window counts (twin of e02). */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    watermarked(events, "ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
}
