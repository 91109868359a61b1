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
                params: Params): DataFrame = {
    val spark = docs.sparkSession
    val p = params
    // Fresh-lineage guard: writeVersion's retirement only prunes BELOW
    // ver-1, so stale v2+ dirs from a previous lineage would survive a
    // re-bootstrap and a later loadState would pair the OLD highest
    // committed version (its reps/horizon) with the freshly rebuilt
    // index. Clear every v<N> dir and the index before writing v1.
    locally {
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(root)) fs.listStatus(root).foreach { s =>
        val n = s.getPath.getName
        if (n == "index" ||
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
    val reps = Dedup.clusters(pairs, col("doc_a"), col("doc_b"))
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
    val surv = CorpusPipeline.packStats(s5)
    val packed = Curation.packByBudget(surv, col("stratum"), col("quality"),
        Seq(col("doc_id").asc), col("n_tok"), p.budgetPerStratum,
        qualityBounds = Some((0.0, 1.0)))
      .select(col("doc_id"), col("stratum"), col("n_tok"))
    val sharded = CorpusPipeline.shardAssign(packed, p.nShards)
    val (out, repsSplit) = p.split match {
      case Some(cfg) =>
        val pairs3 = Dedup.jaccardPairs(s2, col("doc_id"), col("text"),
          p.shingleN, p.k, p.bands, cfg.minSim)
        val reps3 = Dedup.clusters(pairs3, col("doc_a"), col("doc_b"))
          .select(col("doc_id"), col("cluster_rep").as("rep"))
        (annotateSplit(sharded, reps3, cfg), Some(reps3))
      case None => (sharded, None)
    }
    val keyed = Dedup.shingleKeys(
      Dedup.shingleTable(s2, col("doc_id"), col("text"), p.shingleN))
    val blocklist = keyed.filter(benchPred).select("_k").distinct()
    val maxId = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    DedupIndex.write(s"$dir/index", s2, col("doc_id"), col("text"),
      p.shingleN, p.k, p.bands)
    writeKeys(dir, keyed, "overwrite")
    writeVersion(spark, dir, 1, maxId, p,
      reps, repsSplit, counts, blocklist, surv, packed)
    out
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
  private val KeyParts = 64
  private def keyPart(k: Column): Column = pmod(xxhash64(k), lit(KeyParts))

  private def writeKeys(dir: String, keyed: DataFrame, mode: String): Unit =
    keyed.select(col("doc_id"), col("_k"))
      .withColumn("_kp", keyPart(col("_k")))
      .repartition(col("_kp"))
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
    val st = sect("load_state")(loadState(spark, dir))
    val p = st.params
    val ix = DedupIndex.load(spark, s"$dir/index")
    require(ix.meta.shingleN == p.shingleN && ix.meta.k == p.k &&
      ix.meta.bands == p.bands, s"state at $dir: index recipe ${ix.meta} " +
      s"does not match pinned params $p")
    // torn-append self-heal: only rows at or below the committed id
    // horizon are part of the corpus this state describes
    val hz = st.maxId
    val hashes = ix.hashes.filter(col("base_id") <= hz)
    val bandsB = ix.bands.filter(col("base_id") <= hz)
    val shB = ix.shingles.filter(col("base_id") <= hz)

    val idr = sect("id_range")(delta.agg(min(col("doc_id")), max(col("doc_id"))).collect()(0))
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
    val s1 = delta.filter(CorpusPipeline.gopherGate(col("text")))
    val d2 = Caches.track(Dedup.exactFirst(
        s1.withColumn("_h", md5(col("text")))
          .join(hashes.select(col("_h")), Seq("_h"), "left_anti"),
        Seq(col("_h")), Seq(col("doc_id").asc))
      .select(col("doc_id"), col("text")))

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

    // -- near-dup clusters extended at the drop threshold --
    val repsNew = sect("extend_reps")(Caches.track(
      extendReps(st.reps, crossAt(p.minSim), deltaPairsAt(p.minSim))))

    // -- decontamination: delta probes the full blocklist; base docs
    //    are re-scored against NEW keys only (skipped when none) --
    val keyedD = Dedup.shingleKeys(shD)
    val newKeys = Caches.track(keyedD.filter(benchPred).select("_k").distinct()
      .join(st.blocklist, Seq("_k"), "left_anti"))
    val nNewKeys = sect("new_keys")(newKeys.count()) // tiny: distinct keys of delta BENCH docs
    val fullBl = st.blocklist.unionByName(newKeys)
    val deltaCounts = Caches.track(keyedD.filter(!benchPred)
      .join(broadcast(fullBl), "_k")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits")))
    // base retro probe: hits of BASE docs against the NEW blocklist
    // keys only (skipped entirely when the delta adds no bench
    // content). Primary path: the persisted inverted `index/keys`
    // table — partition-pruned to the directories the new keys hash
    // into, broadcast-joined, distinct-ed (torn-append duplicates
    // below the horizon must count once). Legacy fallback (a pre-keys
    // state dir): re-derive keys by exploding the index's shingle
    // arrays — base-CPU-sized, kept only so old state loads; the spec
    // pins both paths to the same monolithic output.
    val baseCounts =
      if (nNewKeys == 0) st.contam
      else {
        val keysPath = new org.apache.hadoop.fs.Path(s"$dir/index/keys")
        val fsK = keysPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val probeHits =
          if (fsK.exists(keysPath)) {
            val parts = newKeys.select(keyPart(col("_k")).as("_kp"))
              .distinct().collect().map(_.getLong(0)) // bounded: <= KeyParts rows
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
        Caches.track(st.contam
          .join(probeHits, Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            (coalesce(col("n_hits"), lit(0L)) + coalesce(col("_add"), lit(0L)))
              .as("n_hits")))
      }

    // -- delta survivors -> redact -> pack stats --
    val dDrops = repsNew
      .filter(col("doc_id") > hz && col("doc_id") =!= col("rep"))
      .select("doc_id")
      .unionByName(deltaCounts.filter(col("n_hits") >= p.contamMinHits)
        .select("doc_id"))
      .distinct()
    val dStats = CorpusPipeline.packStats(
      d2.join(dDrops, Seq("doc_id"), "left_anti")
        .withColumn("text", Redact.redact(col("text"))))

    // -- base survivor retro-drops (cluster merges through a delta
    //    bridge; threshold crossings from new blocklist keys) --
    val retro = repsNew
      .filter(col("doc_id") <= hz && col("doc_id") =!= col("rep"))
      .select("doc_id")
      .unionByName(baseCounts.filter(col("n_hits") >= p.contamMinHits)
        .select("doc_id"))
      .distinct()
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
          Curation.packByBudget(
              survNew.join(broadcast(affStrata), Seq("stratum"), "left_semi"),
              col("stratum"), col("quality"), Seq(col("doc_id").asc),
              col("n_tok"), p.budgetPerStratum,
              qualityBounds = Some((0.0, 1.0)))
            .select(col("doc_id"), col("stratum"), col("n_tok"))))

    // -- shard/pos permutation over the packed narrow set --
    val sharded = CorpusPipeline.shardAssign(packedNew, p.nShards)
    val (out, repsSplitNew) = p.split match {
      case Some(cfg) =>
        val r3 = Caches.track(extendReps(st.repsSplit.get,
          crossAt(cfg.minSim), deltaPairsAt(cfg.minSim)))
        (annotateSplit(sharded, r3, cfg), Some(r3))
      case None => (sharded, None)
    }

    // -- commit: index append first (invisible until the horizon
    //    advances), then the new version dir with meta LAST --
    val ixNew = DedupIndex.frames(d2, col("doc_id"), col("text"), ix.meta)
    // keys append only when the table exists: a legacy (pre-keys) state
    // must stay on the fallback path — a keys table covering only the
    // deltas would hand the probe a partial corpus
    val haveKeys = locally {
      val kp = new org.apache.hadoop.fs.Path(s"$dir/index/keys")
      kp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(kp)
    }
    sect("index_append")(runAll(Seq(
      () => ixNew.hashes.write.mode("append").parquet(s"$dir/index/hashes"),
      () => ixNew.bands.write.mode("append").parquet(s"$dir/index/bands"),
      () => ixNew.shingles.write.mode("append").parquet(s"$dir/index/shingles")) ++
      (if (haveKeys) Seq(() => writeKeys(dir, keyedD, "append")) else Nil)))
    sect("write_version")(writeVersion(spark, dir, st.ver + 1, idr.getLong(1), p,
      repsNew, repsSplitNew, baseCounts.unionByName(deltaCounts),
      fullBl, survNew, packedNew))
    out
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
      math.min(4, math.max(1, jobs.size)))
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

  private def writeVersion(spark: SparkSession, dir: String, ver: Int,
                           maxId: Long, p: Params,
                           reps: DataFrame, repsSplit: Option[DataFrame],
                           contam: DataFrame, blocklist: DataFrame,
                           survivors: DataFrame, packed: DataFrame): Unit = {
    val v = s"$dir/v$ver"
    // the six state tables are independent writes — run them as
    // concurrent jobs on a bounded pool (the maintainLake recipe,
    // awaiting EVERY future) instead of six sequential job round-trips;
    // meta stays strictly LAST because its write is the commit point
    runAll(Seq(
      () => reps.write.mode("overwrite").parquet(s"$v/reps"),
      () => repsSplit.foreach(_.write.mode("overwrite").parquet(s"$v/reps_split")),
      () => contam.write.mode("overwrite").parquet(s"$v/contam"),
      () => blocklist.write.mode("overwrite").parquet(s"$v/blocklist"),
      () => survivors.write.mode("overwrite").parquet(s"$v/survivors"),
      () => packed.write.mode("overwrite").parquet(s"$v/packed")))
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
    State(m.getAs[Int]("ver"), m.getAs[Long]("max_id"), p,
      spark.read.parquet(s"$v/reps"),
      split.map(_ => spark.read.parquet(s"$v/reps_split")),
      spark.read.parquet(s"$v/contam"),
      spark.read.parquet(s"$v/blocklist"),
      spark.read.parquet(s"$v/survivors"),
      spark.read.parquet(s"$v/packed"))
  }
}
