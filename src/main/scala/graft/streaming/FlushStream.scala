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

  /** Streaming sessionization over an event stream: event-time session
    * windows with a watermark (the streaming twin of batch
    * `e01_sessionize`; late data beyond the watermark is dropped rather
    * than corrupting closed sessions).
    */
  def sessionized(events: DataFrame, gapMinutes: Int = 30,
                  watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
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
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** One record headed for a bundle: collector key, a unique id, exact
    * event-time ns, payload size.
    */
  case class BundleRec(key: String, event_id: Long, ts_ns: Long, size: Long)
  private[graft] case class BundleAcc(seq: Long, bytes: Long, n: Long, firstId: Long)
  /** One CLOSED bundle (the in-progress one stays in state). */
  case class BundleEmit(key: String, bundle_seq: Long, n_records: Long,
                        total_bytes: Long, first_event: Long)

  /** The reference's size-rotation (W1, `core/file_handler.py:43-59`:
    * roll when `current_size + len(next) >= max_bytes`; the triggering
    * record opens the NEXT bundle) as CUSTOM STREAMING STATE —
    * `flatMapGroupsWithState` keeping one running (seq, bytes, n)
    * accumulator per collector key. Closed bundles are emitted
    * downstream (append mode); the open bundle survives in state across
    * micro-batches, exactly like the reference's in-progress file
    * survives across poll ticks.
    *
    * State size: one accumulator per key — bounded by key cardinality,
    * independent of throughput. Per key per micro-batch the records are
    * sorted (ts_ns, event_id) so emission is deterministic; a group's
    * batch slice must fit in task memory (inherent to the
    * mapGroupsWithState API, same bound the hash aggregate needs).
    * The batch equivalent of this whole operator is
    * [[graft.operators.Compactor.withBundleId]] (oracle-checked as
    * `c01_bundle_assign`).
    */
  def sizeRotatedBundles(recs: Dataset[BundleRec],
                         targetBytes: Long): Dataset[BundleEmit] = {
    import recs.sparkSession.implicits._
    require(targetBytes >= 1)
    recs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: String, rows: Iterator[BundleRec], state: GroupState[BundleAcc]) => {
          var acc = state.getOption.getOrElse(BundleAcc(0L, 0L, 0L, Long.MaxValue))
          val out = scala.collection.mutable.ArrayBuffer[BundleEmit]()
          rows.toSeq.sortBy(r => (r.ts_ns, r.event_id)).foreach { r =>
            if (acc.n > 0 && acc.bytes + r.size >= targetBytes) {
              out += BundleEmit(key, acc.seq, acc.n, acc.bytes, acc.firstId)
              acc = BundleAcc(acc.seq + 1, 0L, 0L, Long.MaxValue)
            }
            acc = BundleAcc(acc.seq, acc.bytes + r.size, acc.n + 1,
              math.min(acc.firstId, r.event_id))
          }
          state.update(acc)
          out.iterator
        })
  }

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
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("fp"))
  }

  /** Streaming hourly tumbling-window counts (twin of e02). */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
}
