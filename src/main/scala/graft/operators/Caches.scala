package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded registry for intermediate DataFrames persisted by operators
  * whose results are returned lazily (shingle tables, LSH band keys,
  * bundling projections). A long-lived session issuing many such calls
  * over DIFFERENT corpora would otherwise accumulate cached partitions
  * without bound — the registry is an LRU capped at [[capacity]]
  * entries, and eviction unpersists (always safe: a still-referenced
  * plan silently recomputes).
  *
  * Eviction also fires [[onEvict]] hooks so memo maps holding
  * references to tracked frames (e.g. [[Dedup]]'s shingle-pass memo)
  * drop the matching entries — otherwise a later memo hit would
  * silently hand out an unpersisted plan and lose the sharing the memo
  * exists for.
  *
  * `release()` stays the bulk cleanup hook: callers drain the registry
  * whenever the results built on these caches have been materialized
  * (end of a pipeline run, between Verify queries, after a bench wave).
  *
  * == Concurrency ==
  * Every mutation — including a victim's unpersist and its evict
  * hooks — runs while holding the registry lock, so the registry is
  * linearizable: a concurrent `track`/`touch` can never interleave
  * between victim selection and unpersist and resurrect an
  * already-unpersisted frame into the map (tracked-but-unpersisted).
  * All operations are driver-side plan bookkeeping (persist/unpersist
  * registration, never Spark jobs), so holding the lock is cheap; the
  * lock is reentrant, and hooks must not run Spark jobs.
  */
object Caches {

  /** Insertion+access-ordered map: eldest = least recently used. Values
    * are unused; the map is an ordered identity set of live frames.
    */
  private val lru =
    new java.util.LinkedHashMap[DataFrame, java.lang.Boolean](16, 0.75f, true)
  private val releaseHooks = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()
  private val evictHooks =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame => Unit]()

  @volatile private var cap: Int =
    sys.env.getOrElse("SPARK_GRAFT_CACHE_CAP", "64").toInt

  /** Max live tracked frames before LRU eviction. The default (64)
    * covers every concurrent Bench/Verify wave — the 101-query suite
    * plus one full incremental-pipeline run (which tracks ~17 frames
    * across bootstrap + day) peaks under it — while bounding a session
    * that iterates over unboundedly many corpora.
    */
  def capacity: Int = cap

  /** Resize the registry (tests use a tiny cap to observe eviction).
    * Shrinking evicts immediately.
    */
  def setCapacity(n: Int): Unit = {
    require(n >= 1, s"capacity must be >= 1, got $n")
    lru.synchronized {
      cap = n
      evictOverflowLocked()
    }
  }

  /** Persist `df` and register it; may evict (and unpersist) the least
    * recently used frames past [[capacity]].
    */
  private[graft] def track(df: DataFrame): DataFrame = lru.synchronized {
    df.persist()
    lru.put(df, java.lang.Boolean.TRUE)
    evictOverflowLocked()
    df
  }

  /** [[track]] at an explicit storage level (CorpusPipeline's Persist
    * policy routes its per-stage pins here so repeated pipeline runs
    * stay bounded by the same LRU instead of accumulating session-
    * lifetime cache entries).
    */
  private[graft] def track(df: DataFrame,
                           level: org.apache.spark.storage.StorageLevel): DataFrame =
    lru.synchronized {
      df.persist(level)
      lru.put(df, java.lang.Boolean.TRUE)
      evictOverflowLocked()
      df
    }

  /** Refresh `df`'s recency (memo hits call this so hot corpora stay
    * resident while cold ones age out). Returns whether the frame is
    * still tracked — false means it was evicted (or released) since the
    * caller last saw it, and any memo entry handing it out is stale;
    * callers must rebuild rather than serve an unpersisted plan.
    */
  private[graft] def touch(df: DataFrame): Boolean =
    lru.synchronized { lru.get(df) != null } // access-order map: get reorders

  // caller must hold the lru lock: victim removal, unpersist, and evict
  // hooks are one atomic step (see the concurrency note above).
  // Victims are collected FIRST and hooks fire after the iterator is
  // done: the lock is reentrant, so a hook may legally re-enter the
  // registry (track/setCapacity/release), and doing that under an open
  // iterator would mutate the map mid-iteration (CME).
  private def evictOverflowLocked(): Unit = {
    val victims = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val it = lru.entrySet().iterator()
    while (lru.size() > cap && it.hasNext) {
      victims += it.next().getKey
      it.remove() // decrements size immediately
    }
    victims.foreach { df =>
      df.unpersist(false)
      evictHooks.forEach(h => h(df))
    }
  }

  /** Register a callback run on every [[release]] — operators holding
    * memo maps OVER tracked frames must drop their references when the
    * frames are unpersisted.
    */
  private[graft] def onRelease(h: () => Unit): Unit = releaseHooks.add(h)

  /** Register a callback fired with each frame the registry unpersists
    * (LRU eviction AND [[release]] — release is a bulk eviction, and a
    * registrant relying on per-frame invalidation must see it as one),
    * so memo maps can drop exactly the entries referencing the frame.
    * Hooks run under the registry lock: keep them O(1) bookkeeping and
    * never run Spark jobs or block on other locks inside one.
    */
  private[graft] def onEvict(h: DataFrame => Unit): Unit = evictHooks.add(h)

  /** Unpersist every registered intermediate (non-blocking). Fires
    * [[onEvict]] per drained frame, then the bulk [[onRelease]] hooks.
    */
  def release(): Unit = lru.synchronized {
    // drain-then-fire, same re-entrancy discipline as eviction
    import scala.jdk.CollectionConverters._
    val drained = lru.keySet().asScala.toVector
    lru.clear()
    drained.foreach { df =>
      df.unpersist(false)
      evictHooks.forEach(h => h(df))
    }
    releaseHooks.forEach(h => h())
  }

  /** Number of currently registered cached intermediates (for tests). */
  def liveCount: Int = lru.synchronized { lru.size() }

  /** Snapshot of currently tracked frames, LRU-oldest first (tests). */
  private[graft] def trackedFrames: Seq[DataFrame] = lru.synchronized {
    import scala.jdk.CollectionConverters._
    lru.keySet().asScala.toVector
  }
}
