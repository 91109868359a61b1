package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered funnel — the streaming twin of batch `e07_funnel`
  * (view -> click-within-window -> purchase-within-window), as CUSTOM
  * STREAMING STATE: one fixed-size (stage, anchor) pair per in-flight
  * funnel, advanced by `flatMapGroupsWithState`.
  *
  * == Contract vs the batch twin ==
  * Within one invocation events process in (ts, type) order, so a
  * single AvailableNow drain reproduces the batch result exactly
  * (first view anchors; each later stage's FIRST qualifying event
  * strictly after the previous anchor, within `windowNs`). Across
  * micro-batches the in-order-arrival contract applies (late events
  * beyond the watermark are dropped — the same divergence every
  * streaming twin here documents).
  *
  * == State bound (the 100 TB question) ==
  * State is ONE (int, long) pair per user whose funnel STARTED within
  * the last `windowNs` of event time — never per event, never per
  * never-started user (stage 0 stores nothing). An event-time timeout
  * at `anchor + windowNs` evicts both stalled and completed funnels
  * once they can no longer change; a user who starts again after
  * eviction begins a NEW funnel attempt (the bounded-state restart
  * trade, exactly like watermark-evicted dedup re-admission; the batch
  * form anchors at the first view ever).
  */
object FunnelStream {

  /** (stage reached so far, event-time ns of that stage's anchor). */
  case class FunnelState(stage: Int, anchorNs: Long)

  /** One stage completion: `stage_idx` is 1-based position in `stages`. */
  case class FunnelHit(user_id: Long, stage_idx: Int, stage: String, ts_ns: Long)

  /** @param events  streaming frame with `user_id`, `event_type`, and an
    *                event-time `ts` (TIMESTAMP or TIMESTAMP_NTZ)
    * @param stages  ordered funnel stage event types
    * @param windowNs max event-time ns between consecutive stage anchors
    */
  def funnelStream(events: DataFrame, stages: Seq[String], windowNs: Long,
                   watermark: String = "1 hour"): Dataset[FunnelHit] = {
    require(stages.nonEmpty, "stages must be non-empty")
    val spark = events.sparkSession
    import spark.implicits._
    val norm = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        events.withColumn("ts", col("ts").cast("timestamp"))
      case _ => events
    }
    norm
      .withWatermark("ts", watermark)
      // the watermarked event-time column must SURVIVE into the stateful
      // operator's input or analysis rejects the event-time timeout
      .select(col("user_id").cast("long"), col("event_type"),
        (unix_micros(col("ts")) * lit(1000L)).as("ts_ns"), col("ts"))
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
         state: GroupState[FunnelState]) =>
          val it = rows.map(r => (r._1, r._2, r._3))
          if (state.hasTimedOut) {
            // anchor + window passed: this attempt can never advance
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            val wmMs = state.getCurrentWatermarkMs()
            // A live state whose deadline the watermark has already
            // passed is one the event-time timeout WOULD have evicted,
            // except this batch delivered data for the key first (data
            // invocations preempt the timeout callback). No admissible
            // event can advance it — anything at or above the watermark
            // is past anchor + window — so evict it HERE, before
            // processing, exactly as the timeout would have: this
            // batch's events may then anchor a fresh attempt, and we
            // never re-register a timeout at or below the watermark
            // (Spark rejects that with IllegalArgumentException,
            // failing the whole query).
            if (st.stage > 0 && (st.anchorNs + windowNs) / 1000000L <= wmMs)
              st = FunnelState(0, Long.MinValue)
            val out = Seq.newBuilder[FunnelHit]
            // deterministic within-batch order — one AvailableNow batch
            // therefore reproduces the batch twin exactly
            it.toSeq.sortBy(e => (e._3, e._2)).foreach { case (_, typ, ts) =>
              if (st.stage < stages.length && typ == stages(st.stage) &&
                  (st.stage == 0 ||
                   (ts > st.anchorNs && ts <= st.anchorNs + windowNs))) {
                st = FunnelState(st.stage + 1, ts)
                out += FunnelHit(uid, st.stage, typ, ts)
              }
            }
            if (st.stage > 0) {
              // in-flight AND completed funnels both persist until the
              // last anchor's window passes: in-flight because they can
              // still advance, completed because dropping them at once
              // would let the NEXT micro-batch restart a funnel the
              // batch twin considers done. Either way the state can't
              // outlive anchor + window — the eviction that keeps state
              // bounded by recent starters, not user history.
              state.update(st)
              // clamp: a fresh anchor is >= the watermark (it was
              // admitted), but ms-flooring of anchor + a sub-ms window
              // can still land the deadline AT the watermark — one ms
              // later is the earliest Spark accepts
              state.setTimeoutTimestamp(
                math.max((st.anchorNs + windowNs) / 1000000L, wmMs + 1L))
            } else if (state.exists) {
              // pre-processing eviction above cleared a dead attempt
              // and nothing re-anchored: drop the stored state too
              state.remove()
            }
            // stage 0 stores nothing: a user who never starts costs 0 bytes
            out.result().iterator
          }
      }
  }
}
