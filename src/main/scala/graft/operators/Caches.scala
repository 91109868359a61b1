package graft.operators

import org.apache.spark.sql.DataFrame

/** Registry for intermediate DataFrames persisted by operators whose
  * results are returned lazily (shingle tables, LSH band keys, bundling
  * projections). A long-lived session issuing many such calls would
  * otherwise accumulate cached partitions without bound.
  *
  * `release()` is the cleanup hook: unpersisting is always safe — a
  * still-referenced plan silently recomputes — so callers drain the
  * registry whenever the results built on these caches have been
  * materialized (end of a pipeline run, between Verify queries, after a
  * bench wave).
  */
object Caches {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val hooks = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()

  /** Persist `df` and register it for a later [[release]]. */
  private[graft] def track(df: DataFrame): DataFrame = {
    df.persist()
    live.add(df)
    df
  }

  /** Register a callback run on every [[release]] — operators holding
    * memo maps OVER tracked frames (e.g. [[Dedup]]'s shingle-pass memo)
    * must drop their references when the frames are unpersisted, or
    * later lookups would silently hand out uncached plans.
    */
  private[graft] def onRelease(h: () => Unit): Unit = hooks.add(h)

  /** Unpersist every registered intermediate (non-blocking). */
  def release(): Unit = {
    var d = live.poll()
    while (d != null) { d.unpersist(false); d = live.poll() }
    hooks.forEach(h => h())
  }

  /** Number of currently registered cached intermediates (for tests). */
  def liveCount: Int = live.size()
}
