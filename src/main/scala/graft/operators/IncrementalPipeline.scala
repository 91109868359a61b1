package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Day-N incremental curation — the production form of the composed
  * pipeline ([[CorpusPipeline.run]]): you never re-curate the lake per
  * crawl; you curate today's delta against persisted state and emit
  * the SAME output the monolithic pipeline would have produced over
  * base ∪ delta (IncrementalPipelineSpec pins the equality row for
  * row, with and without the train/val split stage).
  *
  * == What is stored (the "curation state") ==
  * All state tables are NARROW (ids, hashes, shingle keys, 4-column
  * stats) — document text never enters the state, so daily state
  * rewrites are survivor-metadata-sized, not corpus-sized:
  *
  *  - `index/` — a [[DedupIndex]] over the post-exact corpus
  *    (hashes/bands/shingles). APPEND-ONLY; rows are keyed by doc id,
  *    and loads filter to ids ≤ the committed horizon, so a torn
  *    day-N append is invisible until day N commits (crash-retry may
  *    duplicate rows beyond the horizon; every probe is set/min-based,
  *    so duplicates cost space, never correctness).
  *  - `v<N>/` — versioned small tables: near-dup rep maps at the drop
  *    and (optionally) split thresholds, per-doc contamination hit
  *    counts, the bench shingle-key blocklist, pre-pack survivor
  *    stats, the packed set, and a one-row `meta` (written LAST — a
  *    version directory without a readable meta is torn and ignored,
  *    so the meta write IS the commit point).
  *
  * == Why each piece exists (the monolithic-equality argument) ==
  *  - Gopher gate and redaction are per-row → delta-only, trivially
  *    equal.
  *  - Exact dedup keeps the LOWEST id per text. Day-N ids are required
  *    to exceed the committed horizon (asserted), so the base winner
  *    never changes: delta docs drop against `index/hashes` plus a
  *    delta-internal min-id pass.
  *  - Near-dup clustering: the union pair graph's components equal the
  *    components of the CONTRACTED graph — old clusters collapsed to
  *    their reps (each rep is its component's min id) plus the new
  *    delta×base and delta×delta edges. [[Dedup.clusters]] over that
  *    contracted edge set therefore reproduces monolithic labels
  *    exactly, including base↔base merges THROUGH a delta bridge —
  *    which retro-drop a base doc that used to be its own rep.
  *  - Decontamination: old and new blocklist keys are disjoint by
  *    construction, so a base doc's hit count against the grown
  *    blocklist = stored count + hits against NEW keys only. New keys
  *    exist only when the delta carries bench docs; the retro probe
  *    then scans the index's shingle table (compact, no re-shingling),
  *    and is skipped entirely in the common fixed-benchmark case.
  *  - Pack: a prefix-of-ranking per stratum — a delta survivor can
  *    displace a base doc at the budget boundary, so affected strata
  *    re-rank over the stored 4-column survivor stats; untouched
  *    strata reuse the stored packed rows verbatim.
  *  - Shard/pos: recomputed over the packed narrow set (the seeded
  *    permutation is global by design; the input is pack-limited).
  *
  * Single-writer per state dir (the [[AnnIndex.appendSketchVectors]]
  * contract); parameters are pinned in `meta` and re-imposed on every
  * incremental run, so a mixed-recipe day is impossible.
  */
object IncrementalPipeline {

  private val FormatVersion = 1

  /** Pipeline parameters, fixed at bootstrap and pinned in state.
    * `shingleN`/`k`/`bands` correspond 1:1 to [[CorpusPipeline.run]]'s
    * recipe knobs of the same names — the incremental == monolithic
    * equality contract is parameterized over ALL of them, not just the
    * defaults (IncrementalPipelineSpec pins a non-default recipe too).
    */
  final case class Params(budgetPerStratum: Long, nShards: Int = 64,
                          minSim: Double = 0.8, contamMinHits: Long = 20,
                          shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                          split: Option[CorpusPipeline.SplitCfg] = None)

  private final case class State(ver: Int, maxId: Long, params: Params,
                                 reps: DataFrame, repsSplit: Option[DataFrame],
                                 contam: DataFrame, blocklist: DataFrame,
                                 survivors: DataFrame, packed: DataFrame)

  // ---------------------------------------------------------------- //

  /** Monolithic bootstrap: curate `docs` (doc_id, text), persist the
    * curation state at `dir`, and return the curated output (same
    * schema and values as [[CorpusPipeline.run]] with the matching
    * configuration — spec-pinned).
    */
  def bootstrap(dir: String, docs: DataFrame, benchPred: Column,
                params: Params): DataFrame =
    bootstrap(dir, docs, benchPred, params, dsirBuckets = None)

  /** [[bootstrap]] with the optional DSIR feature sidecar (VERDICT r18
    * #7): when `dsirBuckets` is set, the post-exact corpus is also
    * featurized into a day-versioned [[DsirIndex]] at `dir/dsir` —
    * one more table in the bootstrap fan-out — and every later
    * [[runIncremental]] folds its delta in ([[DsirIndex
    * .appendVersioned]] riding the index-append batch), so the
    * production day cost carries curation AND data-selection
    * maintenance in one artifact. Select with [[dsirSelect]]; features
    * follow the same commit discipline as the index tables (versioned
    * partitions, pruned to the committed version — a torn day is
    * invisible, a retried day overwrites itself).
    */
  def bootstrap(dir: String, docs: DataFrame, benchPred: Column,
                params: Params, dsirBuckets: Option[Int]): DataFrame = {
    val spark = docs.sparkSession
    val p = params
    // Fresh-lineage guard: commitMeta's retirement only prunes BELOW
    // ver-1, so stale v2+ dirs from a previous lineage would survive a
    // re-bootstrap and a later loadState would pair the OLD highest
    // committed version (its reps/horizon) with the freshly rebuilt
    // index. Clear every v<N> dir and the index before writing v1.
    locally {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(root)) fs.listStatus(root).foreach { s =>
        val n = s.getPath.getName
        if (n == "index" || n == "dsir" ||
            (n.startsWith("v") && n.drop(1).nonEmpty && n.drop(1).forall(_.isDigit)))
          fs.delete(s.getPath, true)
      }
    }
    val s1 = docs.filter(CorpusPipeline.gopherGate(col("text")))
    val s2 = Caches.track(
      Dedup.exactFirst(s1, Seq(md5(col("text"))), Seq(col("doc_id").asc))
        .select(col("doc_id"), col("text")))
    val pairs = Dedup.jaccardPairs(s2, col("doc_id"), col("text"),
      p.shingleN, p.k, p.bands, p.minSim)
    val reps = sect("bs_cc_drop")(
      Dedup.clusters(pairs, col("doc_a"), col("doc_b")))
      .select(col("doc_id"), col("cluster_rep").as("rep"))
    // counts at minHits=1: the state keeps EVERY non-bench doc's hit
    // count so day-N retro contamination can ADD new-key hits to it
    val counts = Dedup.decontaminate(s2, col("doc_id"), col("text"),
      benchPred, p.shingleN, minHits = 1L)
    val drops = reps.filter(col("doc_id") =!= col("rep")).select("doc_id")
      .unionByName(counts.filter(col("n_hits") >= p.contamMinHits).select("doc_id"))
      .distinct()
    val s5 = s2.join(drops, Seq("doc_id"), "left_anti")
      .withColumn("text", Redact.redact(col("text")))
    // cached: three consumers scan the redact+tokenize chain — the
    // pack's eager offsets pass (populates the cache), the survivors
    // state write, and the packed write racing it in the fan-out below
    val surv = Caches.track(CorpusPipeline.packStats(s5))
    val packed = Curation.packByBudget(surv, col("stratum"), col("quality"),
        Seq(col("doc_id").asc), col("n_tok"), p.budgetPerStratum,
        qualityBounds = Some((0.0, 1.0)))
      .select(col("doc_id"), col("stratum"), col("n_tok"))
    val repsSplit = p.split.map { cfg =>
      val pairs3 = Dedup.jaccardPairs(s2, col("doc_id"), col("text"),
        p.shingleN, p.k, p.bands, cfg.minSim)
      sect("bs_cc_split")(Dedup.clusters(pairs3, col("doc_a"), col("doc_b")))
        .select(col("doc_id"), col("cluster_rep").as("rep"))
    }
    val keyed = Dedup.shingleKeys(
      Dedup.shingleTable(s2, col("doc_id"), col("text"), p.shingleN))
    val blocklist = keyed.filter(benchPred).select("_k").distinct()
    val maxId = sect("bs_maxid")(
      docs.agg(max(col("doc_id"))).collect()(0).getLong(0))
    // every write below reads only the docs input (through the cached
    // post-exact s2), so the index tables, the inverted keys, and the
    // six version tables fan out as ONE concurrent batch; the metas
    // land strictly after (version meta = the commit point)
    val ixB = DedupIndex.frames(s2, col("doc_id"), col("text"),
      DedupIndex.Meta(p.shingleN, p.k, p.bands))
    // ONE spine action before the fan-out (the runIncremental lesson
    // applied to bootstrap): the survivors and packed writes both read
    // the surv cache, and without a spine the two concurrent write
    // jobs race to BUILD it — convoying on block locks over the cold
    // redact+tokenize chain (measured: bs_state_writes 2.6 s -> ~1 s
    // with the spine at sf0.1). One count() materializes it in
    // dependency order; every fan-out job below then reads caches.
    sect("bs_spine")(surv.count())
    // Index tables, inverted keys, DSIR sidecar, and the six version
    // tables are ALL independent writes reading only cached frames —
    // one concurrent batch instead of two sequential ones (wall = the
    // slowest write, not the sum of the two batches' slowest). The
    // metas land strictly after: DedupIndex meta after its tables,
    // version meta (the commit point) last of all, so a crash anywhere
    // in the batch leaves a torn, invisible state exactly as before.
    sect("bs_writes")(runAll(Seq(
      () => ixB.hashes.write.mode("overwrite").parquet(s"$dir/index/hashes"),
      () => ixB.bands.write.mode("overwrite").parquet(s"$dir/index/bands"),
      () => ixB.shingles.write.mode("overwrite").parquet(s"$dir/index/shingles"),
      () => writeKeys(dir, keyed, "overwrite"),
      () => writeTables(dir, 1, reps, repsSplit, counts, blocklist,
        surv, packed)) ++
      dsirBuckets.map(b => () => DsirIndex.writeVersioned(s"$dir/dsir",
        s2, col("doc_id"), col("text"), b, ver = 1)).toSeq))
    DedupIndex.writeMeta(spark, s"$dir/index", ixB.meta)
    sect("bs_commit")(commitMeta(spark, dir, 1, maxId, p))
    // the returned output re-roots on the committed v1 state (the same
    // device as runIncremental's return): the caller's action re-reads
    // the narrow packed table instead of recomputing the pack chain
    val shardedOut = CorpusPipeline.shardAssign(
      spark.read.parquet(s"$dir/v1/packed"), p.nShards)
    p.split match {
      case Some(cfg) => annotateSplit(shardedOut,
        spark.read.parquet(s"$dir/v1/reps_split"), cfg)
      case None => shardedOut
    }
  }

  // ---- inverted key -> doc index (retro decontamination probe) ------ //
  // `index/keys` stores the per-doc-DISTINCT shingle keys of the
  // indexed corpus FLAT and PRE-HASHED (doc_id, 16-byte _k), hash-
  // partitioned into [[KeyParts]] directories by key. The retro
  // decontamination probe (a delta that ADDS bench documents must
  // re-score BASE docs against the new blocklist keys) then reads only
  // the partitions the new keys hash into and broadcast-joins them —
  // state touched is O(min(newKeys, KeyParts)/KeyParts) of the table,
  // with no per-shingle explode or md5 re-derivation (the legacy path
  // re-derived every base doc's keys from the index's shingle arrays —
  // a base-CPU-sized pass even though its output was tiny). Appends
  // ride the day-N commit alongside the other index tables and heal
  // the same way: rows beyond the committed horizon are ignored.
  // private[graft]: the retro probe (IncPipeProbe) prunes by the SAME
  // partition function — a re-derived copy there would silently read
  // the wrong _kp directories if this ever changed (ADVICE r15)
  private[graft] val KeyParts = 64
  private[graft] def keyPart(k: Column): Column = pmod(xxhash64(k), lit(KeyParts))

  // Writer task count: a dynamic-partition write pays per-task
  // file-open/commit overhead for every (task, partition) pair it
  // touches, so a day-sized append wants FEW tasks each covering many
  // prefixes (measured: 32 tasks 4.2 s vs 8 tasks ~1 s for the same
  // 10k-key append). At cluster scale raise toward KeyParts (one task
  // per directory) once per-task volume, not per-task overhead, is the
  // binding cost.
  private val KeyWriteTasks = 8

  private def writeKeys(dir: String, keyed: DataFrame, mode: String): Unit =
    keyed.select(col("doc_id"), col("_k"))
      .withColumn("_kp", keyPart(col("_k")))
      .repartition(KeyWriteTasks, col("_kp"))
      .write.mode(mode).partitionBy("_kp").parquet(s"$dir/index/keys")

  /** Curate `delta` (doc_id, text) against the state at `dir`; returns
    * the FULL curated output over base ∪ delta (== the monolithic run)
    * and commits the advanced state. Delta ids must exceed the
    * committed horizon (append-only id discipline — asserted).
    */
  // env-gated section walls (SPARK_GRAFT_INCPIPE_DEBUG=1): most of the
  // body is lazy plan construction — these timers bracket the driver
  // ACTIONS, which is where the wall actually accrues
  private val debugTiming = sys.env.get("SPARK_GRAFT_INCPIPE_DEBUG").contains("1")
  private def sect[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    if (debugTiming)
      System.err.println(f"[incpipe] $name%-14s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def runIncremental(dir: String, delta: DataFrame,
                     benchPred: Column): DataFrame = {
    val spark = delta.sparkSession
    // the three opening steps — state load (meta collect + 6 table
    // opens), index load (meta collect + 3 opens), and the delta id
    // range — have no mutual dependencies: overlap them
    val ixF = java.util.concurrent.CompletableFuture.supplyAsync(
      () => DedupIndex.load(spark, s"$dir/index"))
    val idrF = java.util.concurrent.CompletableFuture.supplyAsync(
      () => delta.agg(min(col("doc_id")), max(col("doc_id"))).collect()(0))
    val st = sect("load_state")(loadState(spark, dir))
    val p = st.params
    val ix = sect("load_index")(ixF.get())
    require(ix.meta.shingleN == p.shingleN && ix.meta.k == p.k &&
      ix.meta.bands == p.bands, s"state at $dir: index recipe ${ix.meta} " +
      s"does not match pinned params $p")
    // torn-append self-heal: only rows at or below the committed id
    // horizon are part of the corpus this state describes
    val hz = st.maxId
    val hashes = ix.hashes.filter(col("base_id") <= hz)
    val bandsB = ix.bands.filter(col("base_id") <= hz)
    val shB = ix.shingles.filter(col("base_id") <= hz)

    val idr = sect("id_range")(idrF.get())
    if (idr.isNullAt(0)) {
      // no-op day: nothing to curate — re-emit the committed output
      // from the stored packed set, advance nothing
      val sharded = CorpusPipeline.shardAssign(st.packed, p.nShards)
      return p.split match {
        case Some(cfg) => annotateSplit(sharded, st.repsSplit.get, cfg)
        case None => sharded
      }
    }
    require(idr.getLong(0) > hz,
      s"runIncremental: delta ids must exceed the committed horizon $hz " +
      s"(got min ${if (idr.isNullAt(0)) "none" else idr.getLong(0)}) — " +
      "the keep-lowest-id dedup and min-id cluster reps are only " +
      "incremental under append-only ids")

    // -- gate + exact dedup (vs index, then delta-internal min-id) --
    // no distinct on the index hash side: left_anti is set-semantics
    // regardless of build-side duplicates, and the distinct was a
    // base-sized shuffle bought for nothing
    val tPlan0 = System.nanoTime()
    val s1 = delta.filter(CorpusPipeline.gopherGate(col("text")))
    // LOCAL CHECKPOINT, not cache (r16): d2 is the root of every day
    // frame, and its lineage reads index/hashes (the exact-dedup
    // anti-join). A cached d2 forces the hashes append to wait for
    // every state write (Spark recaches by path on insert — the r15
    // triple-pay); a checkpointed d2's plan roots at a LogicalRDD,
    // path-FREE, so no append can ever invalidate the day's caches and
    // the whole index fan-out overlaps the commit. Two further wins:
    // the scan listing is frozen at load (appends are invisible to the
    // captured physical plan even pre-materialization), and every
    // downstream analyzed tree shallows by the full delta-pipeline
    // subtree — measured ~1s off the day's driver-side plan
    // construction alone. Lazy (eager=false): the first spine/append
    // job to touch it materializes all partitions once.
    val d2 = Dedup.exactFirst(
        s1.withColumn("_h", md5(col("text")))
          .join(hashes.select(col("_h")), Seq("_h"), "left_anti"),
        Seq(col("_h")), Seq(col("doc_id").asc))
      .select(col("doc_id"), col("text"))
      .localCheckpoint(false)

    // -- ONE shingle pass over the delta feeds everything below --
    val shD = Dedup.shingleTable(d2, col("doc_id"), col("text"), p.shingleN)
    val candX = Dedup.lshKeysFromShingles(shD, p.k, p.bands)
      .join(bandsB, Seq("band_idx", "band_hash"))
      .select(col("doc_id"), col("base_id")).distinct()
    // raw-scored cross pairs, shared by the drop and split thresholds
    // (the jaccardPairs memo plays the same role for delta-internal
    // pairs); the d04/d05 rounding recipe keeps threshold semantics
    // bit-identical to the monolithic pass
    val crossScored = Caches.track(candX
      .join(shD, "doc_id")
      .join(shB.toDF("base_id", "sh_b"), "base_id")
      .withColumn("_jac_raw", graft.expressions.NativeFns
        .jaccard_sim_sorted(col("sh"), col("sh_b")))
      .select(col("base_id"), col("doc_id").as("delta_id"), col("_jac_raw")))
    def crossAt(t: Double): DataFrame = crossScored
      .filter(col("_jac_raw") >= t - 1e-6)
      .filter(round(col("_jac_raw"), 6) >= t)
      .select(col("base_id"), col("delta_id"))
    def deltaPairsAt(t: Double): DataFrame =
      Dedup.jaccardPairs(d2, col("doc_id"), col("text"),
        p.shingleN, p.k, p.bands, t).select(col("doc_a"), col("doc_b"))

    // -- decontamination probe keys (declared FIRST: the tiny count
    //    job overlaps extend_reps' driver collect below). Cached: the
    //    frame feeds newKeys, deltaCounts, AND the day's keys append —
    //    uncached, each consumer re-paid the explode+distinct shuffle --
    val keyedD = Caches.track(Dedup.shingleKeys(shD))
    val newKeys = Caches.track(keyedD.filter(benchPred).select("_k").distinct()
      .join(st.blocklist, Seq("_k"), "left_anti"))
    // ONE tiny job returns both the new-key count and the key-partition
    // histogram the retro probe prunes by (<= KeyParts rows), and it is
    // delta-sized but job-scheduling-bound at the day floor — run it
    // concurrently with extend_reps' driver collect below (independent
    // lineages; shared upstreams are cached and Spark's block locks
    // serialize their materialization)
    val newKeyPartsF = java.util.concurrent.CompletableFuture.supplyAsync(
      () => newKeys.groupBy(keyPart(col("_k")).as("_kp"))
        .agg(count(lit(1)).as("n")).collect())

    if (debugTiming) System.err.println(
      f"[incpipe] plan_build1    ${(System.nanoTime() - tPlan0) / 1e9}%.2fs")

    // -- per-row pack stats of the WHOLE post-exact delta, materialized
    //    CONCURRENTLY with the rep extensions below. Stats are per-row
    //    and drop-independent, so computing them before the drop set is
    //    known wastes only the dropped fraction — post-exact-dedup days
    //    are typically a few % near-dup/contam drops (the heavy
    //    duplicate kill already happened in d2) — and it takes the
    //    day's heaviest per-row pass (redact + tokenize + quality) off
    //    the serial chain: it used to run inside packByBudget's eager
    //    offsets job, strictly AFTER extend_reps (measured ~2.8s of a
    //    ~10s day at 5k rows). dStats then anti-joins the NARROW stats
    //    instead of re-deriving them from text.
    val statsAll = Caches.track(CorpusPipeline.packStats(
      d2.withColumn("text", Redact.redact(col("text")))))
    val statsAllF = java.util.concurrent.CompletableFuture.runAsync(
      () => statsAll.count())

    // -- decontamination retro chain, fully ASYNC: key histogram ->
    //    base-doc re-score against NEW keys — it depends only on keyedD
    //    and the persisted state, never on the rep extensions, so the
    //    whole chain (including the checkpoint's stage execution)
    //    overlaps extend_reps' collect below. Skipped (st.contam
    //    passthrough) when the delta adds no bench content.
    //    Primary path: the persisted inverted `index/keys` table —
    //    partition-pruned to the directories the new keys hash into,
    //    broadcast-joined, distinct-ed (torn-append duplicates below
    //    the horizon must count once). Legacy fallback (a pre-keys
    //    state dir): re-derive keys by exploding the index's shingle
    //    arrays — base-CPU-sized, kept only so old state loads; the
    //    spec pins both paths to the same monolithic output.
    val baseCountsF = java.util.concurrent.CompletableFuture.supplyAsync(() => {
      val keyHist = newKeyPartsF.get()
      val nNewKeys = keyHist.map(_.getLong(1)).sum
      if (nNewKeys == 0) (st.contam, nNewKeys)
      else {
        val keysPath = new org.apache.hadoop.fs.Path(s"$dir/index/keys")
        val fsK = keysPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val probeHits =
          if (fsK.exists(keysPath)) {
            val parts = keyHist.map(_.getLong(0)) // bounded: <= KeyParts entries
            spark.read.parquet(keysPath.toString)
              .filter(col("_kp").isin(parts.toIndexedSeq: _*))
              .filter(col("doc_id") <= hz && !benchPred)
              .join(broadcast(newKeys), "_k")
              .select(col("doc_id"), col("_k")).distinct()
              .groupBy(col("doc_id")).agg(count(lit(1)).as("_add"))
          } else
            shB.toDF("doc_id", "sh")
              .filter(!benchPred)
              .select(col("doc_id"), explode(col("sh")).as("_sh"))
              .select(col("doc_id"), unhex(md5(col("_sh"))).as("_k"))
              .join(broadcast(newKeys), "_k")
              .distinct()
              .groupBy(col("doc_id")).agg(count(lit(1)).as("_add"))
        // checkpoint, not cache, for the same reason as d2: this is the
        // only other day frame whose lineage reads an appended index
        // path (index/keys — or index/shingles on the legacy fallback);
        // truncating it makes the keys append safe to overlap the
        // commit even on retro days. (AQE runs the non-result stages
        // inside this call — which is exactly why it lives on this
        // future instead of the serial chain.)
        (st.contam
          .join(probeHits, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            (coalesce(col("n_hits"), lit(0L)) + coalesce(col("_add"), lit(0L)))
              .as("n_hits"))
          .localCheckpoint(false), nNewKeys)
      }
    })
    val fullBl = st.blocklist.unionByName(newKeys)
    val deltaCounts = Caches.track(keyedD.filter(!benchPred)
      .join(broadcast(fullBl), "_k")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits")))

    // -- near-dup clusters extended at the drop threshold — and, when
    //    the split stage is configured, at ITS threshold CONCURRENTLY:
    //    extendReps is eager (componentsOf collects the contracted
    //    edges), the two extensions share the cached crossScored /
    //    shingle memos (block locks coordinate first-touch), and the
    //    split map is not needed until the commit — running them
    //    serially paid a second full extension on the split day's
    //    critical path (p06 day measured +2.2 s over the plain day) --
    val repsSplitNewF = p.split.map { cfg =>
      java.util.concurrent.CompletableFuture.supplyAsync(() =>
        Caches.track(extendReps(st.repsSplit.get,
          crossAt(cfg.minSim), deltaPairsAt(cfg.minSim))))
    }
    val repsNew = sect("extend_reps")(Caches.track(
      extendReps(st.reps, crossAt(p.minSim), deltaPairsAt(p.minSim))))

    val baseCounts = sect("retro_join")(baseCountsF.get()._1)
    // warm the two caches at the BOTTOM of the spine's dependency chain
    // while the driver is still building plans and launching the append
    // fan-out — their stages are first on the spine's critical path,
    // and they depend on nothing the spine hasn't already produced.
    // Errors are swallowed: the spine recomputes and surfaces them.
    val warmF = java.util.concurrent.CompletableFuture.runAsync(() =>
      try { deltaCounts.count(); repsNew.count() }
      catch { case _: Throwable => })

    // -- delta survivors: drop rows from the precomputed stats --
    val tPlan1 = System.nanoTime()
    // no distinct: dDrops only ever feeds anti-joins, which are
    // set-semantics regardless of right-side duplicates — the distinct
    // was one more AQE stage round-trip on the day's critical path
    val dDrops = repsNew
      .filter(col("doc_id") > hz && col("doc_id") =!= col("rep"))
      .select("doc_id")
      .unionByName(deltaCounts.filter(col("n_hits") >= p.contamMinHits)
        .select("doc_id"))
    // row-equal to packStats(d2 anti-join drops): packStats is per-row,
    // so filtering before or after it is the same set of rows
    val dStats = statsAll.join(dDrops, Seq("doc_id"), "left_anti")

    // -- base survivor retro-drops (cluster merges through a delta
    //    bridge; threshold crossings from new blocklist keys) --
    // same no-distinct argument: retro feeds one anti-join and one
    // semi-join, both duplicate-tolerant
    val retro = repsNew
      .filter(col("doc_id") <= hz && col("doc_id") =!= col("rep"))
      .select("doc_id")
      .unionByName(baseCounts.filter(col("n_hits") >= p.contamMinHits)
        .select("doc_id"))
    val baseSurv = st.survivors.join(retro, Seq("doc_id"), "left_anti")
    val survNew = Caches.track(baseSurv.unionByName(dStats))

    // -- re-pack AFFECTED strata only; untouched strata reuse the
    //    stored packed rows verbatim --
    // affected strata stay a LAZY broadcast set — a driver collect here
    // cost a full extra materialization of the delta stats at the gate
    val affStrata = dStats.select("stratum")
      .unionByName(st.survivors.join(retro, Seq("doc_id"), "left_semi")
        .select("stratum"))
      .distinct()
    val packedNew = Caches.track(
      st.packed.join(broadcast(affStrata), Seq("stratum"), "left_anti")
        .select(col("doc_id"), col("stratum"), col("n_tok"))
        .unionByName(
          sect("  pack_offsets")(Curation.packByBudget(
              survNew.join(broadcast(affStrata), Seq("stratum"), "left_semi"),
              col("stratum"), col("quality"), Seq(col("doc_id").asc),
              col("n_tok"), p.budgetPerStratum,
              qualityBounds = Some((0.0, 1.0))))
            .select(col("doc_id"), col("stratum"), col("n_tok"))))

    // -- split-stage rep extension: join the future launched above --
    val repsSplitNew = repsSplitNewF.map(f => sect("extend_split")(f.get()))

    // -- commit. r15 ordered state writes before index appends because
    //    Spark recaches by path on insert and every cached day frame
    //    then read the index files through d2's lineage. r16 removes
    //    the hazard at the root instead: d2 and baseCounts — the ONLY
    //    day frames whose lineage touches an appended path — are
    //    locally checkpointed (plans root at LogicalRDD, path-free),
    //    and crossScored/candX (the remaining index readers) are dead
    //    after the EAGER rep extensions above. No live cached lineage
    //    reads index/*, so ALL index appends fan out as one concurrent
    //    batch overlapping the spine materialization and the state
    //    writes. Correctness never depended on the order anyway: every
    //    index consumer filters to the committed horizon, and scan
    //    listings are frozen at load — the ordering was purely a
    //    recompute-cost story. Still load-bearing:
    //    1. ONE spine action before the state writes: packedNew's
    //       lineage covers survNew -> retro -> repsNew/baseCounts and
    //       dStats -> deltaCounts, so a single count() materializes
    //       every cached state frame in dependency order instead of
    //       letting concurrent write jobs race to build overlapping
    //       uncached lineages.
    //    2. Meta strictly LAST (the commit point): a version dir
    //       without meta — like index rows beyond the horizon — is
    //       invisible, so a crash anywhere in between is torn, not
    //       wrong.
    val vNew = st.ver + 1
    if (debugTiming) System.err.println(
      f"[incpipe] plan_build2    ${(System.nanoTime() - tPlan1) / 1e9}%.2fs")
    val ixNew = DedupIndex.frames(d2, col("doc_id"), col("text"), ix.meta)
    // keys append only when the table exists: a legacy (pre-keys) state
    // must stay on the fallback path — a keys table covering only the
    // deltas would hand the probe a partial corpus
    val haveKeys = locally {
      val kp = new org.apache.hadoop.fs.Path(s"$dir/index/keys")
      kp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(kp)
    }
    // DSIR sidecar fold (bootstrap-time opt-in — see the bootstrap
    // overload): the delta's features ride the same append fan-out,
    // day-versioned so a crash-retry overwrites v<N> instead of
    // double-appending, and invisible to [[dsirSelect]] until the
    // meta commit below advances the version horizon
    val haveDsir = locally {
      val dp = new org.apache.hadoop.fs.Path(s"$dir/dsir/meta")
      dp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(dp)
    }
    val early = java.util.concurrent.CompletableFuture.runAsync(() =>
      runAll(Seq(
        () => sect("  app_bands")(ixNew.bands.write.mode("append").parquet(s"$dir/index/bands")),
        () => sect("  app_shingles")(ixNew.shingles.write.mode("append").parquet(s"$dir/index/shingles")),
        () => sect("  app_hashes")(ixNew.hashes.write.mode("append").parquet(s"$dir/index/hashes"))) ++
        (if (haveKeys) Seq(
          () => sect("  app_keys")(writeKeys(dir, keyedD, "append")))
         else Nil) ++
        (if (haveDsir) Seq(
          () => sect("  app_dsir")(DsirIndex.appendVersioned(s"$dir/dsir",
            d2, col("doc_id"), col("text"), vNew)))
         else Nil)))
    // If materialize/state_write throws, the `early` append jobs must
    // NOT be left running while the caller unwinds: a retry of
    // runIncremental would race the orphan's appends to the same index
    // dirs (FileOutputCommitter _temporary collisions) — the
    // single-writer contract broken from inside the pipeline (ADVICE
    // r15). Await it before propagating; its own error is secondary.
    try {
      // ONE spine action before the state writes: packedNew's lineage
      // covers survNew -> retro -> repsNew/baseCounts and dStats ->
      // deltaCounts, so a single count() materializes every cached
      // state frame in dependency order. (Measured both ways at 5k
      // rows: fusing the spine into the six concurrent writes convoys
      // them on block locks over the deep cold chains — day-1 walls
      // 15-17s vs ~10s with the spine. The spine stays.)
      sect("materialize") {
        packedNew.count()
        repsSplitNew.foreach(_.count())
      }
      sect("state_write")(writeTables(dir, vNew, repsNew, repsSplitNew,
        baseCounts.unionByName(deltaCounts), fullBl, survNew, packedNew))
    } catch {
      case e: Throwable =>
        try early.get() catch { case _: Throwable => }
        throw e
    }
    sect("index_append")(early.get())
    sect("meta_commit")(commitMeta(spark, dir, vNew, idr.getLong(1), p))

    // -- the returned output re-roots on the JUST-COMMITTED state: its
    //    lineage reads only v<N> paths (never appended), so the index
    //    appends above cannot invalidate it and the caller's action is
    //    a narrow parquet read + the shard window — never a day
    //    recompute. Values are identical by construction (v<N>/packed
    //    IS packedNew; shard/pos are deterministic functions of it). --
    val shardedOut = CorpusPipeline.shardAssign(
      spark.read.parquet(s"$dir/v$vNew/packed"), p.nShards)
    p.split match {
      case Some(cfg) => annotateSplit(shardedOut,
        spark.read.parquet(s"$dir/v$vNew/reps_split"), cfg)
      case None => shardedOut
    }
  }

  // ---------------------------------------------------------------- //

  /** Components of the union pair graph via contraction: old clusters
    * collapse to their (min-id) reps, new edges are rewritten onto rep
    * space, and one [[Dedup.clusters]] over the result reproduces the
    * monolithic labels — base↔base merges through delta bridges
    * included. Returns the UPDATED full rep map (old entries relabeled
    * where their rep merged; new vertices appended).
    */
  /** Edge-count ceiling for the driver-side union-find fast path. The
    * contracted graph is DELTA-sized by construction (old clusters are
    * single vertices), and a day's new-edge set under the cap — 2M
    * edges ≈ 32 MB — resolves in milliseconds of driver CPU where the
    * distributed loop pays several scheduler round-trips per CC round;
    * past the cap the [[Dedup.clusters]] two-phase plan takes over
    * (the same bounded-collect-with-distributed-fallback pattern as
    * its own broadcastVertices knob). Both paths produce identical
    * min-id labels: union-by-smaller-root keeps every DSU root the
    * component minimum.
    */
  private val LocalCcEdgeCap = 2000000L

  private def componentsOf(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // Collect through the primitive (Long, Long) tuple encoder, not
    // Row: Tuple2 is @specialized on Long, so an edge costs ~32 B
    // (object header + two unboxed longs) instead of the ~150 B of a
    // GenericRow with boxed Longs — the cap's real driver footprint is
    // ~64 MB, an order of magnitude below the Row-collect worst case.
    val es = edges
      .select(col(edges.columns(0)).cast("long"), col(edges.columns(1)).cast("long"))
      .as[(Long, Long)]
      .limit((LocalCcEdgeCap + 1).toInt).collect()
    if (es.length <= LocalCcEdgeCap) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      parent.keys.toSeq.map(v => (v, find(v))).toDF("vtx", "label")
    } else
      Dedup.clusters(edges, col(edges.columns(0)), col(edges.columns(1)))
        .toDF("vtx", "label")
  }

  private def extendReps(oldReps: DataFrame, cross: DataFrame,
                         deltaPairs: DataFrame): DataFrame = {
    val contracted = cross
      .join(oldReps.toDF("base_id", "_r"), Seq("base_id"), "left")
      .select(coalesce(col("_r"), col("base_id")).as("u"),
        col("delta_id").as("v"))
      .unionByName(deltaPairs.select(col("doc_a").as("u"),
        col("doc_b").as("v")))
    val cc = componentsOf(contracted)
    // old docs: relabel through their rep (identity when it never
    // entered the new graph); new vertices (delta docs and previously
    // unclustered base endpoints) append directly
    val updated = oldReps
      .join(cc.toDF("rep", "_nl"), Seq("rep"), "left")
      .select(col("doc_id"), coalesce(col("_nl"), col("rep")).as("rep"))
    val fresh = cc.join(oldReps.select(col("doc_id").as("vtx")),
        Seq("vtx"), "left_anti")
      .select(col("vtx").as("doc_id"), col("label").as("rep"))
    updated.unionByName(fresh)
  }

  private def annotateSplit(sharded: DataFrame, reps: DataFrame,
                            cfg: CorpusPipeline.SplitCfg): DataFrame =
    sharded.join(reps.toDF("doc_id", "cluster_rep"), Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_rep"), col("doc_id")))
      .withColumn("split",
        Curation.splitOfRep(col("rep"), cfg.trainBuckets, cfg.salt))
      .select(col("doc_id"), col("stratum"), col("n_tok"),
        col("shard"), col("pos"), col("rep"), col("split"))

  // ---- versioned state I/O ----------------------------------------- //
  // v<N>/meta is written LAST: a version dir without a readable meta is
  // torn and ignored, so the meta write is the commit point. The loader
  // picks the highest committed N; the two newest versions are kept
  // (current + rollback), older ones deleted.

  /** Run independent Spark write jobs concurrently on a bounded pool,
    * awaiting EVERY future (a fail-fast await would leave stragglers
    * racing the caller's next step — the maintainLake lesson).
    */
  private def runAll(jobs: Seq[() => Unit]): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, math.max(1, jobs.size)))
    try {
      val fs = jobs.map(j => pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = j()
      }))
      var firstErr: Option[Throwable] = None
      fs.foreach { f =>
        try f.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          if (firstErr.isEmpty) firstErr = Some(e.getCause) }
      }
      firstErr.foreach(throw _)
    } finally pool.shutdown()
  }

  /** The six state tables are independent writes — run them as
    * concurrent jobs on a bounded pool (the maintainLake recipe,
    * awaiting EVERY future) instead of sequential job round-trips.
    */
  /** Writer task count per state table. The tables are narrow survivor
    * metadata; at day scale a 32-task write is pure per-task overhead
    * (the KeyWriteTasks lesson). At cluster scale raise it once
    * per-task volume binds. coalesce (not repartition): narrow read of
    * the cached partitions, no shuffle.
    */
  private val StateWriteTasks = 8

  private def writeTables(dir: String, ver: Int,
                          reps: DataFrame, repsSplit: Option[DataFrame],
                          contam: DataFrame, blocklist: DataFrame,
                          survivors: DataFrame, packed: DataFrame): Unit = {
    val v = s"$dir/v$ver"
    def w(df: DataFrame, name: String): Unit = sect(s"  w_$name")(
      df.coalesce(StateWriteTasks).write.mode("overwrite").parquet(s"$v/$name"))
    runAll(Seq(
      () => w(reps, "reps"),
      () => repsSplit.foreach(w(_, "reps_split")),
      () => w(contam, "contam"),
      () => w(blocklist, "blocklist"),
      () => w(survivors, "survivors"),
      () => w(packed, "packed")))
  }

  /** Meta is written LAST — its write is the commit point — then
    * versions older than ver-1 retire (keep one rollback).
    */
  private def commitMeta(spark: SparkSession, dir: String, ver: Int,
                         maxId: Long, p: Params): Unit = {
    val v = s"$dir/v$ver"
    import spark.implicits._
    Seq((FormatVersion, ver, maxId, p.budgetPerStratum, p.nShards, p.minSim,
        p.contamMinHits, p.shingleN, p.k, p.bands,
        p.split.map(_.minSim).getOrElse(-1.0),
        p.split.map(_.trainBuckets).getOrElse(-1),
        p.split.map(_.salt).getOrElse("")))
      .toDF("format", "ver", "max_id", "budget", "n_shards", "min_sim",
        "contam_min_hits", "shingle_n", "k", "bands",
        "split_min_sim", "train_buckets", "salt")
      .coalesce(1).write.mode("overwrite").parquet(s"$v/meta")
    // retire versions older than ver-1 (keep one rollback)
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith("v") && n.drop(1).forall(_.isDigit) &&
          n.drop(1).toInt < ver - 1)
        fs.delete(s.getPath, true)
    }
  }

  /** The committed id horizon at `dir`, or None when no bootstrap has
    * committed yet — the public probe [[graft.streaming.CurationStream]]
    * uses to make micro-batch replays idempotent (a replayed batch's
    * ids are at or below the horizon; filtering them out turns the
    * replay into runIncremental's no-op re-emit path instead of a
    * horizon violation).
    */
  def committedHorizon(spark: SparkSession, dir: String): Option[Long] =
    committedVerOf(spark, dir).map { n =>
      spark.read.parquet(s"$dir/v$n/meta").collect()(0).getAs[Long]("max_id")
    }

  /** Highest COMMITTED state version at `dir` (meta written = commit
    * point), or None before any bootstrap commits.
    */
  private def committedVerOf(spark: SparkSession, dir: String): Option[Int] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.drop(1).nonEmpty && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toInt).sorted.reverse
      .find(n => fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v$n/meta/_SUCCESS")))
  }

  /** DSIR selection against the pipeline's feature sidecar, pruned to
    * the COMMITTED version horizon — a torn day's features (written by
    * the append fan-out of a day that crashed before its meta commit)
    * contribute nothing until the retry commits. Same contract as
    * [[Curation.dsirSelectIndexed]] (features once, target domain per
    * call), over the pipeline's post-exact survivor corpus.
    */
  def dsirSelect(spark: SparkSession, dir: String, targetIds: DataFrame,
                 budget: Int, viaRank: Option[Boolean] = None): DataFrame = {
    val ver = committedVerOf(spark, dir).getOrElse(throw new IllegalStateException(
      s"no committed curation state at $dir — run bootstrap first"))
    val (feats, meta) = DsirIndex.loadUpTo(spark, s"$dir/dsir", ver)
    Curation.dsirSelectFeatures(feats, meta.buckets, targetIds, budget, viaRank)
  }

  private def loadState(spark: SparkSession, dir: String): State = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vers = fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toInt).sorted.reverse
    val committed = vers.find { n =>
      fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v$n/meta/_SUCCESS"))
    }.getOrElse(throw new IllegalStateException(
      s"no committed curation state at $dir — run bootstrap first"))
    val v = s"$dir/v$committed"
    val m = spark.read.parquet(s"$v/meta").collect()(0)
    require(m.getAs[Int]("format") == FormatVersion,
      s"curation state at $dir: format ${m.getAs[Int]("format")}, " +
      s"expected $FormatVersion")
    val split =
      if (m.getAs[Int]("train_buckets") < 0) None
      else Some(CorpusPipeline.SplitCfg(m.getAs[Double]("split_min_sim"),
        m.getAs[Int]("train_buckets"), m.getAs[String]("salt")))
    val p = Params(m.getAs[Long]("budget"), m.getAs[Int]("n_shards"),
      m.getAs[Double]("min_sim"), m.getAs[Long]("contam_min_hits"),
      m.getAs[Int]("shingle_n"), m.getAs[Int]("k"), m.getAs[Int]("bands"),
      split)
    // spark.read.parquet pays a driver-side listing + footer schema
    // read per table — ~50-100 ms each, serial = a visible slice of
    // the day floor. The six are independent: open them concurrently.
    import java.util.concurrent.CompletableFuture
    def rd(name: String) =
      CompletableFuture.supplyAsync(() => spark.read.parquet(s"$v/$name"))
    val (fReps, fContam, fBl, fSurv, fPacked) =
      (rd("reps"), rd("contam"), rd("blocklist"), rd("survivors"), rd("packed"))
    val fSplit = split.map(_ => rd("reps_split"))
    State(m.getAs[Int]("ver"), m.getAs[Long]("max_id"), p,
      fReps.get(), fSplit.map(_.get()),
      fContam.get(), fBl.get(), fSurv.get(), fPacked.get())
  }
}
