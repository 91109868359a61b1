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
  */
object Caches {

  /** Insertion+access-ordered map: eldest = least recently used. Values
    * are unused; the map is an ordered identity set of live frames.
    * All access is synchronized on the map — operations are O(1) plan
    * bookkeeping, never Spark jobs.
    */
  private val lru =
    new java.util.LinkedHashMap[DataFrame, java.lang.Boolean](16, 0.75f, true)
  private val releaseHooks = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()
  private val evictHooks =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame => Unit]()

  @volatile private var cap: Int =
    sys.env.getOrElse("SPARK_GRAFT_CACHE_CAP", "48").toInt

  /** Max live tracked frames before LRU eviction. The default (48)
    * covers every concurrent Bench/Verify wave (the full 75-query run
    * peaks well under it) while bounding a session that iterates over
    * unboundedly many corpora.
    */
  def capacity: Int = cap

  /** Resize the registry (tests use a tiny cap to observe eviction).
    * Shrinking evicts immediately.
    */
  def setCapacity(n: Int): Unit = {
    require(n >= 1, s"capacity must be >= 1, got $n")
    cap = n
    evictOverflow()
  }

  /** Persist `df` and register it; may evict (and unpersist) the least
    * recently used frames past [[capacity]].
    */
  private[graft] def track(df: DataFrame): DataFrame = {
    df.persist()
    lru.synchronized { lru.put(df, java.lang.Boolean.TRUE) }
    evictOverflow()
    df
  }

  /** Refresh `df`'s recency (memo hits call this so hot corpora stay
    * resident while cold ones age out).
    */
  private[graft] def touch(df: DataFrame): Unit =
    lru.synchronized { lru.get(df) } // access-order map: get reorders

  /** Drop + unpersist one frame (lost memo races discard their build). */
  private[graft] def forget(df: DataFrame): Unit = {
    lru.synchronized { lru.remove(df) }
    df.unpersist(false)
  }

  private def evictOverflow(): Unit = {
    val victims = Vector.newBuilder[DataFrame]
    lru.synchronized {
      val it = lru.entrySet().iterator()
      while (lru.size() > cap && it.hasNext) {
        victims += it.next().getKey
        it.remove()
      }
    }
    victims.result().foreach { df =>
      df.unpersist(false)
      evictHooks.forEach(h => h(df))
    }
  }

  /** Register a callback run on every [[release]] — operators holding
    * memo maps OVER tracked frames must drop their references when the
    * frames are unpersisted.
    */
  private[graft] def onRelease(h: () => Unit): Unit = releaseHooks.add(h)

  /** Register a callback fired with each LRU-evicted frame, so memo
    * maps can drop exactly the entries that reference it.
    */
  private[graft] def onEvict(h: DataFrame => Unit): Unit = evictHooks.add(h)

  /** Unpersist every registered intermediate (non-blocking). */
  def release(): Unit = {
    val all = lru.synchronized {
      val vs = new java.util.ArrayList(lru.keySet())
      lru.clear()
      vs
    }
    all.forEach(_.unpersist(false))
    releaseHooks.forEach(h => h())
  }

  /** Number of currently registered cached intermediates (for tests). */
  def liveCount: Int = lru.synchronized { lru.size() }
}
