package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction as a Spark batch program.
  *
  * Reference semantics (cloudindus-com/lakeflush): scan files in mtime
  * order, append records to a rotating bundle that rolls when it would
  * exceed a size threshold (`core/file_handler.py:43-59`), name bundles
  * uniquely (`core/collector.py:82-91`), and keep lineage metadata
  * (`utils/file/store.py:10-21`). Re-expressed Spark-first: bundle
  * membership is a *running-sum window computation* over the mtime total
  * order — `bundle_id = floor(exclusive_prefix_sum(size) / target)` —
  * followed by a partitioned write and a manifest DataFrame (strictly
  * stronger than the reference's sidecar files).
  *
  * == Scale design ==
  * A naive `Window.orderBy(...)` with no partition key collapses to a
  * single partition — fine at 60k rows, fatal at 100 TB. Instead we do a
  * deterministic two-phase distributed prefix sum:
  *
  *  1. bucket rows by *range* of the primary order key, with boundaries
  *     from `approxQuantile` (deterministic Greenwald-Khanna sketch, one
  *     scan; no RangePartitioner sampling, whose boundaries can differ
  *     between jobs and would desynchronize phases 2/3);
  *  2. per-bucket totals -> exclusive bucket offsets, computed as a
  *     window over the tiny totals table (never collected to the
  *     driver), broadcast-joined back;
  *  3. within-bucket running sum (`Window.partitionBy(bucket)`), so no
  *     task ever sorts more than one bucket.
  *
  * `offset(bucket) + local_prefix == global_prefix` for ANY bucket
  * boundaries, so results do not depend on the quantile sketch accuracy —
  * only balance does. Everything is expressible as one SQL window in the
  * DuckDB oracle. The three phases live in [[PrefixSum.runningTotal]],
  * shared verbatim with [[Curation.packByBudget]] (stratum = constant
  * here).
  */
object Compactor {

  /** Columns appended by [[withBundleId]]. */
  val BundleCol = "bundle_id"

  /** Assign `bundle_id = floor(exclusive_prefix_sum(size) / targetBytes)`
    * over the total order `(primaryOrder, tieBreakers...)`.
    *
    * The running sum is the shared [[PrefixSum.runningTotal]] recipe
    * (range buckets from one deterministic quantile sketch, per-bucket
    * offsets computed distributed and broadcast back — no driver
    * collect anywhere), with one global group and an EXCLUSIVE frame.
    * Ordering is by the ORIGINAL key, not its double image: casting a
    * timestamp to double can collapse nearby microsecond values, which
    * may only cost bucket balance, never order correctness.
    *
    * @param primaryOrder  orderable column used for range bucketing
    *                      (numeric/timestamp); cast to double internally
    * @param tieBreakers   extra order columns making the order total
    * @param buckets       range buckets (parallelism of the window stage);
    *                      defaults to `spark.sql.shuffle.partitions`
    */
  def withBundleId(df: DataFrame, primaryOrder: Column, tieBreakers: Seq[Column],
                   sizeCol: Column, targetBytes: Long, buckets: Int = 0): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    PrefixSum.runningTotal(df,
        groupCol = lit(0),
        ordKey = primaryOrder.cast("double"),
        orderCols = primaryOrder +: tieBreakers,
        valueCol = sizeCol,
        buckets = buckets,
        inclusive = false,
        nullsLast = false, // asc order: NULLS FIRST, so bucket 0
        outCol = "_prefix",
        keepValueAs = Some("record_bytes"))
      .withColumn(BundleCol, floor(col("_prefix") / lit(targetBytes)))
      .drop("_prefix")
  }

  /** Bundle manifest — the queryable replacement for the reference's
    * `.lakeflush.flushed` sidecars (`utils/file/store.py:10-21`): one row
    * per bundle with record count, byte total and key span.
    */
  def manifest(withBundles: DataFrame, keyCol: Column): DataFrame =
    withBundles.groupBy(col(BundleCol))
      .agg(
        count(lit(1)).as("n_records"),
        sum(col("record_bytes")).as("total_bytes"),
        min(keyCol).as("first_key"),
        max(keyCol).as("last_key"))

  /** End-to-end directory compaction: read every file under `inputDir` as
    * an opaque blob (reference S1+S3: whole-file records in mtime order —
    * `utils/file/processor.py:9-118`, `utils/file/reader/json.py:8-12`),
    * skip empties (F2, `core/flusher.py:40-42`), optionally glob-filter
    * (F1, `utils/file/processor.py:38-50`), assign bundles, and write one
    * directory per bundle (K1/K2). Returns the manifest.
    *
    * Unlike the reference this is exactly-once: the parquet commit
    * protocol plays the rotate-rename role (SURVEY §3c).
    */
  def compactDirectory(inputDir: String, outputDir: String, targetBytes: Long,
                       glob: Option[String] = None)
                      (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val reader = spark.read.format("binaryFile")
    val files = glob.fold(reader)(g => reader.option("pathGlobFilter", g)).load(inputDir)
    // Bundle assignment runs on the LISTING ONLY (path, mtime, size come
    // from file status — the pruned binaryFile scan never opens a file),
    // so the prefix-sum window shuffles a few dozen bytes per file, not
    // payloads. Content is then read once and shuffled once (the
    // per-bundle co-location below); payload bytes never pass through a
    // sort. The tiny assignment table is cached (Caches.release() hook)
    // because the join and the manifest both consume it.
    val listing = files.select(col("path"), col("modificationTime"), col("length"))
      .filter(col("length") > 0)
    val assign = Caches.track(withBundleId(listing, col("modificationTime"),
      Seq(col("path")), col("length"), targetBytes))
    val content = files.select(col("path"), col("content"))
    content
      // no broadcast hint: AQE broadcasts the assignment while it fits
      // (≲10M files) and falls back to a shuffle join beyond — both keep
      // the single content shuffle.
      .join(assign, "path")
      .select(col(BundleCol), col("path"), col("modificationTime"),
        col("record_bytes"), col("content"))
      // co-locate each bundle in one task: one parquet file per bundle
      // (the reference's one-file-per-bundle contract) instead of
      // |tasks| x |bundles| commit-protocol fragments
      .repartition(col(BundleCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(BundleCol)
      .parquet(outputDir)
    manifest(assign, col("path"))
  }

  /** Name of the advisory listing high-water-mark sidecar written next
    * to the bundled lake. Underscore-prefixed, so every parquet reader
    * ignores it. Losing or deleting it only costs speed (the full
    * anti-join fallback), never correctness.
    */
  val WatermarkFile = "_graft_watermark.json"

  private def hadoopPath(dir: String, child: String)
                        (implicit spark: org.apache.spark.sql.SparkSession) = {
    val p = new org.apache.hadoop.fs.Path(dir, child)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Canonical URI spelling for a lake file path, shared by every
    * manifest consumer (prune staleness, append dup-guard, maintain
    * dirty test). QUALIFIES the path against its FileSystem first, so
    * a scheme-less caller string ("/lake/f.parquet" — the natural
    * spelling for a hand-built Seq[String]), "file:/x", and
    * `input_file_name()`'s "file:///x" all render identically;
    * without the qualify step a bare path normalized to "null://..."
    * and silently never matched any manifest entry.
    */
  private def normPath(p: String)
                      (implicit spark: org.apache.spark.sql.SparkSession): String = {
    val hp = new org.apache.hadoop.fs.Path(p)
    try {
      val u = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(hp).toUri
      s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}${u.getPath}"
    } catch { case scala.util.control.NonFatal(_) =>
      // The manifest is ADVISORY — its consumers must fall back, never
      // crash. A manifest migrated from another environment can spell
      // entries in a scheme whose FileSystem isn't loadable here
      // (connector jar/credentials absent): render the URI as-is. The
      // un-qualified spelling simply fails to match the current
      // listing, so the staleness check full-scans (readPrunedMulti)
      // or the entry is dropped as dead (maintainLake's resync) — the
      // safe direction either way.
      val u = hp.toUri
      s"${Option(u.getScheme).getOrElse("")}://${Option(u.getAuthority).getOrElse("")}${u.getPath}"
    }
  }

  /** Watermark fast-path policy for [[compactDirectoryIncremental]]. */
  sealed trait WatermarkMode
  /** Auto-enable the high-water mark only on DATE-SHAPED layouts: every
    * visited partition level is a `k=v` directory whose key is
    * date-like (`date`, `dt`, `year`, `month`, `day`, `hour`, `hr`,
    * `minute`, `min` — case-insensitive) and whose sibling values are
    * uniform-width digit strings (zero-padded, so the mark's
    * lexicographic compare IS the chronological compare). Any other
    * `k=v` layout (`host=...`, `source=...`, unpadded values) keeps the
    * full anti-join: a lexicographic mark over a non-chronological key
    * would silently and permanently skip files backfilled into
    * below-mark directories.
    */
  case object WatermarkAuto extends WatermarkMode
  /** Opt-in: trust ANY uniform `k=v` layout. The caller asserts the
    * monotone-arrival contract holds for their key (new files only ever
    * land in directories `>=` the newest directory that has ever held
    * data, under lexicographic compare).
    */
  case object WatermarkOn extends WatermarkMode
  /** Never read, install, or advance the sidecar — always the full
    * anti-join. */
  case object WatermarkOff extends WatermarkMode

  /** The bundled lake's listing high-water mark: the RELATIVE partition
    * path (`k=v` segments joined with `/`, e.g.
    * `year=2026/month=08/day=13`) of the newest directory known to
    * contain a bundled file. Older sidecars holding a first-level-only
    * mark stay valid: a shorter mark prunes at coarser granularity.
    * None when absent or unreadable (advisory metadata).
    */
  def readWatermark(outputDir: String)
                   (implicit spark: org.apache.spark.sql.SparkSession): Option[String] =
    try {
      val (fs, p) = hadoopPath(outputDir, WatermarkFile)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
        """"max_dir"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(s).map(_.group(1))
      }
    } catch { case _: Exception => None }

  private def writeWatermark(outputDir: String, maxDir: String)
                            (implicit spark: org.apache.spark.sql.SparkSession): Unit =
    try {
      val (fs, p) = hadoopPath(outputDir, WatermarkFile)
      val out = fs.create(p, true)
      out.write(s"""{"max_dir":"$maxDir"}""".getBytes("UTF-8"))
      out.close()
    } catch { case _: Exception => () } // advisory: losing it costs speed only

  private val DateLikeKeys =
    Set("date", "dt", "year", "month", "day", "hour", "hr", "minute", "min")
  private val KvName = "([A-Za-z0-9_.\\-]+)=(.+)".r

  private def visible(s: org.apache.hadoop.fs.FileStatus): Boolean = {
    val n = s.getPath.getName
    !n.startsWith("_") && !n.startsWith(".")
  }

  /** One partition level's entries, validated: every visible entry a
    * directory, all sharing ONE key name; under `requireDateLike` the
    * key must be date-like and the values uniform-width digit strings
    * (see [[WatermarkAuto]]). Returns (key, (status, value) pairs), or
    * None when the level disqualifies the layout.
    */
  private def partitionLevel(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, requireDateLike: Boolean)
      : Option[(String, Seq[(org.apache.hadoop.fs.FileStatus, String)])] = {
    val entries = fs.listStatus(dir).toSeq.filter(visible)
    if (entries.isEmpty || !entries.forall(_.isDirectory)) return None
    val parsed = entries.map(e => e.getPath.getName match {
      case KvName(k, v) => Some((e, k, v))
      case _            => None
    })
    if (parsed.exists(_.isEmpty)) return None
    val ps = parsed.flatten
    val keys = ps.map(_._2).distinct
    if (keys.size != 1) return None
    val key = keys.head
    if (requireDateLike) {
      if (!DateLikeKeys.contains(key.toLowerCase)) return None
      val vals = ps.map(_._3)
      if (vals.map(_.length).distinct.size != 1 ||
          !vals.forall(_.matches("[0-9][0-9:.\\- T]*"))) return None
    }
    Some((key, ps.map(p => (p._1, p._3))))
  }

  /** Partition depth of `inputDir` when the layout is watermark-eligible
    * under `mode`'s gate; None otherwise (flat, mixed, multi-key, or —
    * in auto mode — not date-shaped). Walks the MAX branch only
    * (O(depth) listStatus calls, metadata-scale): each visited level is
    * fully validated across its siblings, unvisited sub-branches are
    * covered by the same monotone-arrival contract the mark itself
    * assumes and re-validated whenever a later pass's boundary chain
    * visits them.
    */
  private def eligibleDepth(inputDir: String, requireDateLike: Boolean)
      (implicit spark: org.apache.spark.sql.SparkSession): Option[Int] =
    try {
      val root = new org.apache.hadoop.fs.Path(inputDir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      @annotation.tailrec
      def down(dir: org.apache.hadoop.fs.Path, depth: Int): Option[Int] =
        if (depth > 8) None // sanity bound: not a partition tree
        else partitionLevel(fs, dir, requireDateLike) match {
          case None =>
            if (depth > 0) Some(depth) else None // leaf level (files)
          case Some((key, ps)) =>
            down(ps.maxBy(p => s"$key=${p._2}")._1.getPath, depth + 1)
        }
      down(root, 0) // flat layouts exit at depth 0 -> None
    } catch { case _: Exception => None }

  /** Pruned listing roots for the fast path: the directories whose
    * leaves can hold files at-or-past `mark` (inclusive). Walks ONLY
    * the boundary chain — at each level, siblings `<` the mark segment
    * are skipped, siblings `>` it are emitted WHOLE (their entire
    * subtree qualifies; `load` reads them recursively), and the one
    * `==` sibling is descended. O(depth) listStatus calls regardless of
    * tree width. A mark shorter than the tree (an old first-level
    * sidecar) stops early and prunes at its own coarser granularity.
    * None when any visited level disqualifies the layout — including a
    * tree SHALLOWER than the mark (layout changed under us) — which
    * falls back to the full anti-join.
    */
  private def prunedListingRoots(inputDir: String, mark: String,
      requireDateLike: Boolean)
      (implicit spark: org.apache.spark.sql.SparkSession): Option[Seq[String]] =
    try {
      val root = new org.apache.hadoop.fs.Path(inputDir)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      val markSegs = mark.split("/").toIndexedSeq
      def walk(dir: org.apache.hadoop.fs.Path, depth: Int,
               rel: String): Option[List[String]] = {
        if (depth == markSegs.length) return Some(List(rel))
        partitionLevel(fs, dir, requireDateLike) match {
          case None => None
          case Some((key, ps)) =>
            val m = markSegs(depth)
            var out = List.empty[String]
            for ((st, v) <- ps) {
              val seg = s"$key=$v"
              val r = if (rel.isEmpty) seg else s"$rel/$seg"
              if (seg > m) out ::= r
              else if (seg == m) walk(st.getPath, depth + 1, r) match {
                case Some(ls) => out :::= ls
                case None     => return None
              }
            }
            Some(out)
        }
      }
      walk(root, 0, "")
    } catch { case _: Exception => None }

  /** The last `depth` `k=v` segments of `path` (its relative partition
    * path), if present. */
  private def relPartitionOf(path: String, depth: Int): Option[String] = {
    val segs = "/([^/=]+=[^/]+)(?=/)".r.findAllMatchIn(path)
      .map(_.group(1)).toSeq
    if (depth > 0 && segs.length >= depth)
      Some(segs.takeRight(depth).mkString("/"))
    else None
  }

  /** Incremental compaction pass: bundle only files not already present
    * in the output lake (the written bundles carry their source `path`
    * column — the lake IS the processed-set), appending new bundles
    * with ids after the existing maximum. The reference re-reads the
    * whole tree every `start()` and dedups nothing (its SQLite
    * metastore is dead code — SURVEY §1); rerunning THIS pass on a
    * schedule gives the continuous-collector behavior with exactly-once
    * bundling per file. Returns the manifest of the NEW bundles only
    * (empty when nothing new).
    *
    * Scale: the anti-join is listing-vs-path-column — both narrow; the
    * processed-set read prunes to the `path` column only.
    *
    * == High-water-mark fast path ==
    * On date-shaped inputs (every partition level a `k=v` directory
    * with a date-like key and zero-padded values — the reference
    * flusher's own `date=.../hour=...` and `year=/month=/day=` layouts,
    * `flushers/local_lake.py:55-60`) a sidecar `_graft_watermark.json`
    * records the FULL relative partition path of the newest directory
    * known to hold a bundled file (e.g. `year=2026/month=08/day=13`).
    * The next pass walks only the mark's boundary chain — O(depth)
    * driver listStatus calls, independent of tree width — listing
    * sibling subtrees `>=` the mark segment at each level (inclusive,
    * so a still-filling current dir keeps catching late files) and
    * prunes the processed-set to the same roots: a small periodic delta
    * costs the delta, not a million-file re-list + million-path
    * anti-join. On a nested `year=/month=/day=` tree the mark is
    * day-granular, so a January-to-December lake re-lists one day, not
    * the whole year.
    *
    * Assumes date-monotone arrivals (new files land in dirs at-or-past
    * the newest dir that has ever held data — the log-shipper reality);
    * writers that backfill OLD date dirs must delete the sidecar or
    * pass [[WatermarkOff]]. Non-date `k=v` layouts (`host=...`,
    * unpadded values) never auto-enable — a lexicographic mark over a
    * non-chronological key would silently skip backfilled dirs forever
    * — but [[WatermarkOn]] opts in when the caller knows their key is
    * monotone. Flat/mixed layouts, absent sidecars, and deleted mark
    * dirs all fall back to the full anti-join automatically.
    */
  def compactDirectoryIncremental(inputDir: String, outputDir: String,
                                  targetBytes: Long, glob: Option[String] = None,
                                  watermark: WatermarkMode = WatermarkAuto)
                                 (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val gate = watermark == WatermarkAuto
    // partition depth when the layout is eligible under the gate; the
    // single source of truth for whether marks are written at all
    def markDepth: Option[Int] =
      if (watermark == WatermarkOff) None
      else eligibleDepth(inputDir, gate)
    def installMark(maxPath: Option[String]): Unit =
      markDepth.foreach { d =>
        maxPath.flatMap(relPartitionOf(_, d)).foreach(writeWatermark(outputDir, _))
      }
    val prev =
      try {
        val p = spark.read.parquet(outputDir)
        if (p.columns.contains("path")) Some(p) else None
      } catch { case _: org.apache.spark.sql.AnalysisException => None }
    prev match {
      case None =>
        val mf = compactDirectory(inputDir, outputDir, targetBytes, glob)
        // manifest last_key is max(path) per bundle — the global max
        // bundled path falls out of the tiny manifest frame
        installMark(Option(
          mf.agg(max(col("last_key"))).collect()(0).getString(0)))
        mf
      case Some(p) =>
        val reader = spark.read.format("binaryFile")
        val mark =
          if (watermark == WatermarkOff) None else readWatermark(outputDir)
        // pruned listing roots for the fast path; None = full scan
        val cand: Option[Seq[String]] = mark
          .flatMap(prunedListingRoots(inputDir, _, gate))
          .filter(_.nonEmpty)
        val base = inputDir.stripSuffix("/")
        val files = cand match {
          case Some(c) =>
            // basePath anchors partition discovery at the lake root so
            // the k=v roots don't read as conflicting structures
            val r = glob.fold(reader)(g => reader.option("pathGlobFilter", g))
              .option("basePath", base)
            r.load(c.map(d => s"$base/$d"): _*)
          case None =>
            glob.fold(reader)(g => reader.option("pathGlobFilter", g)).load(inputDir)
        }
        // processed-set pruned to the candidate roots on the fast path:
        // paths are URIs, so root membership is a substring test (codegen
        // disjunction over a handful of roots), not a prefix compare
        val done = cand match {
          case Some(c) =>
            p.select(col("path"))
              .filter(c.map(d => col("path").contains(s"/$d/")).reduce(_ || _))
          case None => p.select(col("path"))
        }
        val nextBundle = p.agg(max(col(BundleCol).cast("long"))).collect()(0)
          .getLong(0) + 1
        val listing = files
          .select(col("path"), col("modificationTime"), col("length"))
          .filter(col("length") > 0)
          .join(done, Seq("path"), "left_anti")
        if (listing.isEmpty) {
          // nothing new. Install the watermark if the layout supports
          // one and none exists yet (one narrow max(path) scan of the
          // lake buys every subsequent pass the pruned listing).
          if (mark.isEmpty && watermark != WatermarkOff)
            installMark(Option(
              p.agg(max(col("path"))).collect()(0).getString(0)))
          // empty manifest with the standard schema
          manifest(listing
            .withColumn(BundleCol, lit(0L))
            .withColumn("record_bytes", lit(0L)), col("path"))
        } else {
          // localCheckpoint (eager, narrow rows only): the assignment's
          // lineage reads outputDir through the anti-join, so the append
          // below would invalidate a mere cache and the recompute would
          // see its own output — anti-joining away every new file.
          // Checkpointing pins the PRE-write assignment.
          val assign = withBundleId(listing, col("modificationTime"),
            Seq(col("path")), col("length"), targetBytes)
            .withColumn(BundleCol, col(BundleCol) + nextBundle)
            .localCheckpoint()
          files.select(col("path"), col("content"))
            .join(assign, "path")
            .select(col(BundleCol), col("path"), col("modificationTime"),
              col("record_bytes"), col("content"))
            .repartition(col(BundleCol))
            .write.mode(SaveMode.Append)
            .partitionBy(BundleCol)
            .parquet(outputDir)
          // advance the watermark to the newest dir this pass bundled
          // from (max over the tiny checkpointed assignment; never
          // regresses below the existing mark — a full-depth new mark
          // always compares past the shorter prefix it refines)
          markDepth.foreach { d =>
            val maxPath = assign.agg(max(col("path"))).collect()(0).getString(0)
            val newMark = (mark.toSeq ++ Option(maxPath).flatMap(relPartitionOf(_, d)))
              .maxOption
            newMark.foreach(writeWatermark(outputDir, _))
          }
          manifest(assign, col("path"))
        }
    }
  }

  /** Text-bundle variant with optional compression (reference W2 gzip
    * handler, `core/gzipfile_handler.py:30-114`): one directory per
    * bundle of concatenated record text, written through the codec.
    *
    * The reference targets the COMPRESSED size (re-stat every ~100 KB,
    * overshooting by one check interval); a distributed writer cannot
    * observe compressed size mid-write. With `targetCompressed=false`
    * bundles are sized on uncompressed bytes (bounded bundles, the same
    * practical contract — documented divergence, SURVEY §2 W2). With
    * `targetCompressed=true` the divergence narrows: a BOUNDED sample
    * of the corpus (first files in mtime order, truncated — ≲2 MB to
    * the driver, metadata-scale like the bucket totals) is deflated
    * once to estimate the compression ratio, and the uncompressed
    * budget becomes `targetBytes / ratio`, so written `.gz` bundles
    * land near the compressed target whenever the corpus compresses
    * homogeneously — the same assumption the reference's check
    * interval makes WITHIN a file, applied per run.
    *
    * Sampling: 32 files spread across the corpus by hash(path) order —
    * NOT the mtime head, which would bias the ratio toward whatever the
    * oldest files contain (e.g. an early schema era). Each sampled file
    * contributes only its first 64 KiB, so a large file whose prefix
    * compresses unlike its body (header-heavy formats) still biases the
    * estimate; the clamp bounds the damage to 1-50x.
    */
  def compactToText(inputDir: String, outputDir: String, targetBytes: Long,
                    codec: Option[String] = Some("gzip"),
                    glob: Option[String] = None,
                    targetCompressed: Boolean = false)
                   (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val files = Readers.wholeTextRecords(spark, inputDir, glob)
    val effectiveTarget =
      if (!targetCompressed || codec.forall(_ == "none")) targetBytes
      else {
        // deterministic corpus-wide spread: hash order decorrelates the
        // sample from mtime (age) and path lexicography (partition dirs)
        val sample = files.orderBy(hash(col("path")), col("path"))
          .select(substring(col("content"), 1, 65536).as("c"))
          .limit(32).collect().map(_.getString(0)).mkString("\n")
          .getBytes("UTF-8")
        val ratio =
          if (sample.isEmpty) 1.0
          else {
            val out = new java.io.ByteArrayOutputStream()
            val gz = new java.util.zip.GZIPOutputStream(out)
            gz.write(sample); gz.close()
            // clamp: never inflate the budget past 50x or below 1x
            math.min(1.0, math.max(0.02, out.size.toDouble / sample.length))
          }
        math.max(1L, math.round(targetBytes / ratio))
      }
    // same listing-only assignment as compactDirectory: the window never
    // sees payload bytes
    val listing = files.select(col("path"), col("mtime"), col("size"))
    val assign = Caches.track(withBundleId(listing, col("mtime"),
      Seq(col("path")), col("size"), effectiveTarget))
    val writer = files.select(col("path"), col("content"))
      .join(assign, "path")
      .select(col(BundleCol), col("content").as("value"))
      .repartition(col(BundleCol)) // one text file per bundle
      .write.mode(SaveMode.Overwrite).partitionBy(BundleCol)
    codec.fold(writer)(c => writer.option("compression", c)).text(outputDir)
    manifest(assign, col("path"))
  }

  /** Parquet-lake OPTIMIZE — the standard lake-maintenance pass every
    * long-running ingest needs (a streaming sink or frequent small
    * batches leave thousands of KB-scale part files per partition;
    * scan cost becomes per-FILE, not per-byte): rewrite the lake so
    * each partition directory's files approach `targetBytes`,
    * preserving the partition layout and every row.
    *
    * Same division of labor as [[compactDirectory]] at 100 TB:
    *  - bundle assignment runs on the LISTING ONLY (path, size from
    *    file status — no file is opened), one [[PrefixSum]] pass
    *    grouped by partition directory, so the planning shuffle
    *    carries a few dozen bytes per FILE;
    *  - row bytes are then read once and shuffled once, hash-clustered
    *    by (partition dir, bundle) so each task writes whole bundles
    *    into the partitioned writer (`maxRecordsPerFile`-style row
    *    slicing is exactly what this pass exists to undo);
    *  - targeting is on INPUT (encoded) bytes, the unit the listing
    *    has — output files land near `targetBytes` modulo re-encoding
    *    drift, the same estimate-vs-exact trade as W2 gzip targeting.
    *
    * Non-destructive: writes the optimized lake at `outputDir`
    * (swap-then-delete is the caller's commit policy, like every
    * OPTIMIZE that must not race readers). Returns a per-(partition
    * dir, bundle) manifest with file/byte counts.
    * [[commitOptimized]] is the packaged form of that commit policy —
    * two directory renames that retire the fragmented lake and promote
    * the optimized one at the original path.
    */
  def optimizeParquet(inputDir: String, outputDir: String, targetBytes: Long)
                     (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val rows = spark.read.parquet(inputDir)
    // partition columns come from the relation, not name guessing
    val partCols = partitionColsOf(rows)
    // listing-only planning pass: binaryFile surfaces (path, length)
    // from file status without opening anything
    val listing = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .load(inputDir)
      .select(col("path"), col("length"))
      .withColumn("part_dir", regexp_extract(col("path"), "^(.*)/[^/]+$", 1))
    val assign = Caches.track(
      PrefixSum.runningTotal(listing,
          groupCol = col("part_dir"),
          ordKey = col("length").cast("double"),
          orderCols = Seq(col("length").asc, col("path").asc),
          valueCol = col("length"),
          buckets = 0,
          inclusive = false,
          nullsLast = false,
          outCol = "_prefix",
          keepValueAs = Some("file_bytes"))
        .withColumn(BundleCol, floor(col("_prefix") / lit(targetBytes)))
        .drop("_prefix"))
    // Guard against silent row loss: the row scan reads EVERY data file
    // of the relation, but the listing is '*.parquet'-globbed — a data
    // file with any other extension would plan into the relation yet
    // miss the bundle assignment, and the inner join below would drop
    // its rows without a trace. Both file sets are already driver-side
    // listings (inputFiles comes from the relation's file index, the
    // assignment manifest is file-level), so the check costs a set
    // diff, not a data pass. Fail loudly; never "optimize" rows away.
    def norm(p: String): String = {
      val u = new org.apache.hadoop.fs.Path(p).toUri
      s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}${u.getPath}"
    }
    val listed = assign.select(col("path")).collect().map(r => norm(r.getString(0))).toSet
    val unassigned = rows.inputFiles.map(norm).filterNot(listed.contains)
    require(unassigned.isEmpty,
      s"optimizeParquet($inputDir): ${unassigned.length} data file(s) in the " +
        s"relation have no bundle assignment (non-'*.parquet' names or files " +
        s"the listing missed) — refusing to drop their rows. First few: " +
        unassigned.take(3).mkString(", "))
    rows
      .withColumn("_path", col("_metadata.file_path"))
      // AQE broadcasts the file-level assignment while it fits; the row
      // payload shuffles exactly once either way
      .join(assign.select(col("path").as("_path"), col("part_dir"), col(BundleCol)), "_path")
      .repartition(col("part_dir"), col(BundleCol))
      .drop("_path", "part_dir", BundleCol)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partCols: _*)
      .parquet(outputDir)
    assign.groupBy(col("part_dir"), col(BundleCol))
      .agg(count(lit(1)).as("n_files"), sum(col("file_bytes")).as("total_bytes"))
  }

  /** The swap-then-delete commit [[optimizeParquet]] delegates to the
    * caller, packaged: retire the fragmented lake and promote the
    * optimized copy AT THE ORIGINAL PATH via two directory renames —
    *
    *   1. `lakeDir`      -> `lakeDir.pre-optimize-<millis>`  (retire)
    *   2. `optimizedDir` -> `lakeDir`                        (promote)
    *
    * On HDFS and POSIX filesystems each rename is an atomic metadata
    * operation, so a reader either resolves the old directory or the
    * new one — never a half-written mix — and the retired copy stays
    * intact for rollback until the caller deletes it (returned path).
    * The window BETWEEN the renames is the recipe's known gap: a
    * listing issued in that instant sees no directory, which is why
    * the swap must run outside reader traffic or behind a catalog
    * repoint. In-flight scans that already resolved file blocks keep
    * reading the retired inode either way.
    *
    * NOT for object stores: S3 "rename" is copy+delete per object —
    * neither atomic nor cheap. There the commit is a metastore/catalog
    * pointer swap (the table location moves from `lakeDir` to
    * `optimizedDir`); this helper refuses non-`file`/`hdfs` schemes
    * rather than fake atomicity.
    *
    * If promotion fails after the retire rename succeeded, the retire
    * is rolled back so the lake never stays missing.
    *
    * @return the retired directory's path (delete after readers drain)
    */
  def commitOptimized(lakeDir: String, optimizedDir: String)
                     (implicit spark: org.apache.spark.sql.SparkSession): String = {
    import org.apache.hadoop.fs.Path
    val lake = new Path(lakeDir)
    val opt = new Path(optimizedDir)
    val fs = lake.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    require(scheme == "file" || scheme == "hdfs",
      s"commitOptimized: directory rename is not atomic on scheme '$scheme' — " +
        "commit via a catalog pointer swap instead")
    require(fs.exists(opt) && fs.listStatus(opt).nonEmpty,
      s"commitOptimized: optimized lake at $optimizedDir is missing or empty")
    require(fs.exists(lake), s"commitOptimized: lake at $lakeDir does not exist")
    val retired = new Path(s"$lakeDir.pre-optimize-${System.currentTimeMillis()}")
    require(fs.rename(lake, retired),
      s"commitOptimized: failed to retire $lakeDir -> $retired")
    if (!fs.rename(opt, lake)) {
      fs.rename(retired, lake) // roll back: the lake must never stay missing
      throw new IllegalStateException(
        s"commitOptimized: failed to promote $optimizedDir -> $lakeDir; retire rolled back")
    }
    retired.toString
  }

  /** Rewrite-past-threshold maintenance for ONE parquet table dir —
    * the persisted-index form of lake maintenance (VERDICT r18 #5):
    * [[graft.operators.DsirIndex.append]] and the ANN-index appends
    * accrete one parquet file-set per day, so after a year of day-N
    * runs the feature table is itself a small-file lake (the exact
    * pathology the reference exists to fix — lakeflush
    * `collectors/local_lake.py` compacts row files for the same
    * reason). When the dir holds more than `maxFiles` data files,
    * rewrite it with the engine's own OPTIMIZE ([[optimizeParquet]]
    * size-binned bundles at `targetBytes`) and commit via the
    * [[commitOptimized]] rename swap, deleting the retired copy.
    * Below the threshold this is a listing-only no-op, so callers can
    * run it after every append.
    *
    * @return true when a rewrite happened
    */
  def compactTableIf(dir: String, maxFiles: Int = 256,
                     targetBytes: Long = 128L * 1024 * 1024)
                    (implicit spark: org.apache.spark.sql.SparkSession): Boolean = {
    require(maxFiles >= 1, s"compactTableIf: maxFiles must be >= 1, got $maxFiles")
    val nFiles = spark.read.parquet(dir).inputFiles.length
    if (nFiles <= maxFiles) false
    else {
      val opt = s"$dir.optimize-${System.currentTimeMillis()}"
      optimizeParquet(dir, opt, targetBytes)
      val retired = commitOptimized(dir, opt)
      val p = new org.apache.hadoop.fs.Path(retired)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      true
    }
  }

  /** OPTIMIZE with Z-ORDER clustering: rewrite a parquet lake sorted by
    * the Morton interleave of `zorderCols` — the lakehouse layout move
    * that makes selective scans on ANY of those columns skip most row
    * groups via parquet min/max stats (a plain compaction preserves
    * arrival order, so every file spans the full value range of every
    * column and nothing can be skipped; a single-column sort only
    * tightens its own column).
    *
    * Mechanics, all bounded:
    *  - each column is rank-bucketed to 2^bits ids with
    *    [[graft.expressions.RangeBucket]] over `approxQuantile` bounds
    *    (driver state: 2^bits doubles per column — ~32 KB at the
    *    default 12 bits), so arbitrary numeric/timestamp distributions
    *    interleave uniformly regardless of skew;
    *  - the Morton key is the native [[graft.expressions.ZValue]];
    *  - `repartitionByRange(nFiles, z)` + in-partition sort lays rows
    *    out in z order. This IS a global range exchange — correct
    *    here, unlike in a query plan (the repo-wide no-global-sort
    *    guard covers query results): a clustering REWRITE's entire
    *    point is a total layout order, its width is bounded by the
    *    OUTPUT FILE COUNT (totalBytes / targetBytes), and it runs
    *    once per OPTIMIZE, not per query.
    *
    * Caveat discovered by measurement (ZOrderProbe): Spark's DEFAULT
    * parquet timestamp encoding is INT96, which carries NO usable
    * min/max stats — a time predicate can never skip a row group no
    * matter how the lake is sorted. A lake that wants time-column
    * pruning must be WRITTEN with
    * `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS` (writer-
    * session property; the probe session sets it and measures 100%
    * scanned without it vs 1-8% with).
    *
    * Row preservation is the caller-visible contract: the returned
    * manifest carries input/output row counts and the write refuses to
    * commit silently unequal ones (same guard philosophy as
    * [[optimizeParquet]]). Combine with [[commitOptimized]] to swap
    * the clustered lake in atomically.
    *
    * @return one-row manifest: (rows, n_files, total_bytes)
    */
  def zorderParquet(inputDir: String, outputDir: String, targetBytes: Long,
                    zorderCols: Seq[String], bits: Int = 12)
                   (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    require(zorderCols.nonEmpty, "zorderParquet: need at least one column")
    require(zorderCols.size * bits <= 63,
      s"zorderParquet: ${zorderCols.size} cols x $bits bits exceeds 63")
    val rows = spark.read.parquet(inputDir)
    // A partitioned lake is rewritten PER PARTITION DIRECTORY — a
    // whole-lake rewrite would silently FLATTEN (partition dirs become
    // plain columns), and partition values don't need z-bits anyway:
    // directory pruning already covers them. Each leaf directory gets
    // its own quantile bounds and its own range exchange (bounded by
    // that partition's file count), and the output reproduces the
    // exact dir layout, so readers and manifest pruning see the same
    // partitioned lake, just clustered within each partition.
    val zPartCols = partitionColsOf(rows)
    if (zPartCols.nonEmpty) {
      require(zorderCols.forall(c => !zPartCols.contains(c)),
        s"zorderParquet($inputDir): ${zorderCols.mkString(",")} includes a " +
          s"partition column (${zPartCols.mkString(",")}) — directory " +
          "pruning already covers those; z-order data columns only")
      val base = new org.apache.hadoop.fs.Path(inputDir)
        .toUri.getPath.stripSuffix("/")
      val leafRel = rows.inputFiles.map { f =>
        val p = new org.apache.hadoop.fs.Path(f).getParent.toUri.getPath
        require(p.startsWith(base),
          s"zorderParquet($inputDir): input file $f outside the lake root")
        p.stripPrefix(base).stripPrefix("/")
      }.distinct.sorted.toSeq
      require(leafRel.forall(_.nonEmpty),
        s"zorderParquet($inputDir): mixed flat+partitioned layout")
      val perPart = leafRel.map { rel =>
        zorderFlat(s"$inputDir/$rel", s"$outputDir/$rel",
          targetBytes, zorderCols, bits)
          .select(col("rows"), col("n_files"), col("total_bytes")).collect()(0)
      }
      import spark.implicits._
      return Seq((perPart.map(_.getLong(0)).sum,
        perPart.map(_.getLong(1)).sum,
        perPart.map(_.getLong(2)).sum))
        .toDF("rows", "n_files", "total_bytes")
    }
    zorderFlat(inputDir, outputDir, targetBytes, zorderCols, bits)
  }

  /** The single-directory z-order rewrite behind [[zorderParquet]]. */
  private def zorderFlat(inputDir: String, outputDir: String, targetBytes: Long,
                         zorderCols: Seq[String], bits: Int)
                        (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import graft.expressions.NativeFns.{range_bucket, z_value}
    val rows = spark.read.parquet(inputDir)
    val inRows = rows.count()
    // per-column bucket bounds: 2^bits - 1 interior quantiles of the
    // double-cast columns, ONE Greenwald-Khanna pass for all of them.
    // approxQuantile ignores nulls; null values produce a null z and
    // cluster together at the range boundary.
    val nB = 1 << bits
    val probs = (1 until nB).map(_.toDouble / nB).toArray
    val qNames = zorderCols.indices.map(i => s"_q$i")
    val allBounds = rows
      .select(zorderCols.zip(qNames).map { case (c, a) =>
        col(c).cast("double").as(a) }: _*)
      .stat.approxQuantile(qNames.toArray, probs, 0.001)
    val zInput = array(zorderCols.zipWithIndex.map { case (c, i) =>
      range_bucket(col(c).cast("double"), dedupSorted(allBounds(i)))
    }: _*)
    val totalBytesRow = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .load(inputDir)
      .agg(sum(col("length"))).collect()(0)
    // same mismatch optimizeParquet fail-louds: a readable lake whose
    // data files lack the .parquet extension lists to nothing here
    require(!totalBytesRow.isNullAt(0),
      s"zorderParquet($inputDir): no '*.parquet' files in the listing — " +
        "refusing to plan output sizing from an empty byte total")
    val totalBytes = totalBytesRow.getLong(0)
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    rows.withColumn("_z", z_value(zInput, bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(outputDir)
    val out = spark.read.parquet(outputDir)
    val outRows = out.count()
    require(outRows == inRows,
      s"zorderParquet($inputDir): wrote $outRows rows, expected $inRows — " +
        "refusing to report a lossy rewrite as success")
    import spark.implicits._
    Seq((outRows, out.inputFiles.length.toLong, totalBytes))
      .toDF("rows", "n_files", "total_bytes")
  }

  // approxQuantile bounds can repeat on skewed data; RangeBucket
  // requires strictly usable sorted bounds (repeats are harmless for
  // binary search but waste bucket ids — collapse them)
  private def dedupSorted(bounds: Array[Double]): Array[Double] =
    bounds.distinct.sorted

  /** Partition columns of a parquet relation, from the relation itself
    * (never name guessing); shared by [[optimizeParquet]] and
    * [[zorderParquet]].
    */
  private def partitionColsOf(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.partitionSchema.fieldNames.toSeq
          case _ => Seq.empty[String]
        }
    }.getOrElse(Seq.empty)

  /** Underscore-prefixed stats-manifest directory inside a lake: every
    * parquet reader ignores it, same convention as [[WatermarkFile]].
    */
  val StatsDir = "_graft_stats"

  /** Write a per-FILE min/max stats manifest for `cols` as a sidecar
    * table inside the lake — the Delta/Iceberg move that makes
    * data-skipping a PLANNING-time file-list prune instead of a
    * footer-read-per-file: at millions of files, opening every footer
    * to discover "nothing here" IS the query bottleneck; the manifest
    * answers the same question from one KB-scale table.
    *
    * Computed with one data pass at OPTIMIZE time (when the rewrite
    * just touched every row anyway — [[zorderParquet]] + this is one
    * job each); queries then call [[readPruned]] forever after. The
    * manifest is advisory like the watermark: losing it costs the
    * prune, never correctness.
    */
  def writeStatsManifest(dir: String, cols: Seq[String],
                         dictCols: Seq[String] = Nil,
                         dictCap: Int = 1024)
                        (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    require(cols.nonEmpty, "writeStatsManifest: need at least one column")
    val lake = spark.read.parquet(dir)
    // one manifest row per lake file: size the manifest's OWN file
    // count off the listing (driver-sized by design) so a 10^6-file
    // lake never funnels through a single write task, while the
    // common KB-scale manifest stays one file
    val manFiles = math.max(1,
      ((lake.inputFiles.length + ManifestRowsPerFile - 1)
        / ManifestRowsPerFile)).toInt
    statsOf(lake, cols, dictCols, dictCap)
      .repartitionByRange(manFiles, col("file"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/$StatsDir")
    // return the WRITTEN manifest, not the aggregation plan — the plan
    // would re-scan the whole lake on every downstream action
    spark.read.parquet(s"$dir/$StatsDir")
  }

  /** Manifest rows per manifest file — 500k ~ a few tens of MB. */
  private val ManifestRowsPerFile = 500000

  private def statsOf(df: DataFrame, cols: Seq[String],
                      dictCols: Seq[String] = Nil,
                      dictCap: Int = 1024): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    val base = df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
    // Per-file hash DICTIONARY for point-predicate skipping: min/max
    // spans are useless for a high-cardinality column the layout isn't
    // sorted by (every file's [min,max] covers everything), but the SET
    // of values a 100 MB file actually holds is often small — store
    // xxhash64 of each distinct value, capped at `dictCap` entries
    // (over-cap files store null = never skipped). Hash collisions can
    // only ADD files to a scan (false positive), never drop one: the
    // hash of a present value is always in the set. Scale shape: the
    // candidate set is built from a DISTINCT over (file, hash) pairs —
    // never an unbounded collect_set buffer — and only under-cap files
    // pay the collect at all.
    dictCols.foldLeft(base) { (acc, c) =>
      // xxhash64 is total (a null value hashes to the seed) — a file of
      // nulls gets a one-entry dict, and since an equality predicate
      // can never match a null row, skipping such files stays exact
      val pairs = df.select(input_file_name().as("file"),
          xxhash64(col(c)).as("_h")).distinct()
      val small = pairs.groupBy(col("file")).agg(count(lit(1)).as("_n"))
        .filter(col("_n") <= dictCap).select(col("file"))
      val dict = pairs.join(small, Seq("file"))
        .groupBy(col("file"))
        .agg(sort_array(collect_set(col("_h"))).as(s"dict_$c"))
      acc.join(dict, Seq("file"), "left")
    }
  }

  /** Append per-file stats for ONLY `newFiles` to an existing manifest
    * — the incremental move that keeps the prune alive across daily
    * ingests without re-scanning the lake: the full
    * [[writeStatsManifest]] costs one pass over EVERY row, while a
    * day's append costs one pass over the day's delta (typically the
    * same rows the ingest job just wrote, still hot). Stats columns
    * are taken from the existing manifest so append can never fork the
    * schema; appending a file the manifest already knows refuses
    * (a duplicate row would make [[readPrunedMulti]] hand the same
    * path to the reader twice).
    */
  def appendStatsManifest(dir: String, newFiles: Seq[String],
                          dictCap: Int = 1024)
                         (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    require(newFiles.nonEmpty, "appendStatsManifest: no files to append")
    val (fs, statsPath) = hadoopPath(dir, StatsDir)
    require(fs.exists(statsPath),
      s"appendStatsManifest($dir): no manifest — writeStatsManifest first")
    val existing = spark.read.parquet(s"$dir/$StatsDir")
    val cols = existing.columns.filter(_.startsWith("min_"))
      .map(_.stripPrefix("min_")).toSeq
    // dict columns ride along off the existing schema, like min/max —
    // append can never fork the manifest shape. (dictCap only bounds
    // THIS delta's dict sizes; the null-over-cap rule is per file, so a
    // different cap than the base write costs skip quality on the new
    // files at most, never correctness.)
    val dictCols = existing.columns.filter(_.startsWith("dict_"))
      .map(_.stripPrefix("dict_")).toSeq
    require(cols.nonEmpty,
      s"appendStatsManifest($dir): existing manifest has no stats columns")
    val known = existing.select(col("file")).collect()
      .map(r => normPath(r.getString(0))).toSet
    val dupes = newFiles.filter(f => known.contains(normPath(f)))
    require(dupes.isEmpty,
      s"appendStatsManifest($dir): already in the manifest: " +
        dupes.take(3).mkString(", "))
    // basePath: partition columns of a partitioned lake must resolve
    // exactly as they do in the full-scan stats pass
    statsOf(spark.read.option("basePath", dir)
        .parquet(newFiles: _*), cols, dictCols, dictCap)
      .select(existing.columns.toIndexedSeq.map(col): _*)
      .write.mode(SaveMode.Append).parquet(s"$dir/$StatsDir")
    spark.read.parquet(s"$dir/$StatsDir")
  }

  /** Read only the lake files whose [min, max] interval for `colName`
    * intersects [lo, hi], per the stats manifest — then apply the exact
    * predicate. Files with null stats (all-null column) are kept: the
    * prune may only ever REMOVE provably-disjoint files.
    *
    * The manifest is ADVISORY, enforced here, not just promised: a
    * missing manifest falls back to the full filtered scan, and a
    * STALE one (lake files appended after the manifest was written,
    * i.e. present in the listing but absent from the manifest) also
    * falls back — the prune may cost speed, never rows.
    *
    * The matching file list is collected to the driver — the same
    * planning-time bound Spark's own FileIndex carries (a file LISTING
    * is driver-sized by design; the manifest prune only shrinks it).
    */
  def readPruned(dir: String, colName: String, lo: Column, hi: Column)
                (implicit spark: org.apache.spark.sql.SparkSession): DataFrame =
    readPrunedMulti(dir, Seq((colName, lo, hi)))

  /** [[readPruned]] over a CONJUNCTION of range predicates — the
    * z-order case: a query constraining both clustered columns prunes
    * by the intersection of both manifest intervals, which on a
    * z-ordered lake is the product of two small fractions.
    */
  def readPrunedMulti(dir: String, preds: Seq[(String, Column, Column)])
                     (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    require(preds.nonEmpty, "readPrunedMulti: need at least one predicate")
    prunedScan(dir,
      applyExact = df => preds.foldLeft(df) { case (d, (c, lo, hi)) =>
        d.filter(col(c) >= lo && col(c) <= hi) },
      manifestPred = (_, _) => preds.map { case (c, lo, hi) =>
        coalesce(col(s"max_$c") >= lo, lit(true)) &&
          coalesce(col(s"min_$c") <= hi, lit(true))
      }.reduce(_ && _))
  }

  /** Point-predicate prune: read only the lake files that can hold
    * `col = value`, per the manifest's per-file hash DICTIONARY
    * (`dict_<col>`, written by [[writeStatsManifest]]'s `dictCols`) and
    * min/max span when present. The dictionary is what min/max cannot
    * be for a high-cardinality column the layout isn't sorted by:
    * every file's span covers the whole domain, but each file's VALUE
    * SET is small — a point lookup touches only the files that truly
    * contain the key. Hash collisions only ever ADD files (the hash of
    * a present value is always in the set); files with a null dict
    * (over-cap or pre-dict manifests) are kept. Same advisory contract
    * as [[readPrunedMulti]]: absent/stale manifest = full scan.
    */
  def readPrunedEq(dir: String, eqPreds: Seq[(String, Column)])
                  (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    require(eqPreds.nonEmpty, "readPrunedEq: need at least one predicate")
    readPrunedIn(dir, eqPreds.map { case (c, v) => (c, Seq(v)) })
  }

  /** IN-list prune-set cap: the manifest predicate is a literal-wise
    * OR, so an unbounded list would compile an unbounded expression
    * (and a 10^5-key probe is a JOIN, not a point skip).
    */
  val MaxInListLiterals = 256

  /** [[readPrunedEq]] over a bounded IN-list per column: a file
    * survives the prune when ANY literal could live in it (union of
    * per-literal dict/span hits), columns combine as a conjunction.
    * Degradation contract is per literal, same as the point form: a
    * null dict (over-cap file, pre-dict manifest) or null span keeps
    * the file, so growing the list can only ever ADD files to the
    * scan. Lists longer than [[MaxInListLiterals]] refuse loudly — at
    * that size the right plan is a (broadcast) semi-join, not a
    * planning-time file prune.
    */
  def readPrunedIn(dir: String, inPreds: Seq[(String, Seq[Column])])
                  (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    require(inPreds.nonEmpty, "readPrunedIn: need at least one predicate")
    inPreds.foreach { case (c, vs) =>
      require(vs.nonEmpty, s"readPrunedIn: empty IN-list for column $c")
      require(vs.size <= MaxInListLiterals,
        s"readPrunedIn: ${vs.size} literals for column $c exceed " +
        s"$MaxInListLiterals — probe that big is a semi-join, not a prune")
    }
    prunedScan(dir,
      applyExact = df => inPreds.foldLeft(df) { case (d, (c, vs)) =>
        d.filter(vs.map(v => col(c) === v).reduce(_ || _)) },
      manifestPred = (manifest, full) => inPreds.map { case (c, vs) =>
        vs.map(v => pointFilePred(manifest, full, c, v)).reduce(_ || _)
      }.reduce(_ && _))
  }

  /** Can `col(c) = v` live in a manifest row's file? Span AND dict
    * check for one literal; null stats keep the file (advisory-only).
    */
  private def pointFilePred(manifest: DataFrame, full: DataFrame,
                            c: String, v: Column): Column = {
    // hash EXACTLY what the write side hashed: the value cast to
    // the lake column's native type (xxhash64 is type-sensitive —
    // an int literal probed against a long column would otherwise
    // hash differently and silently skip the right files)
    val typed = v.cast(full.schema(c).dataType)
    val range =
      if (manifest.columns.contains(s"min_$c"))
        coalesce(col(s"max_$c") >= typed, lit(true)) &&
          coalesce(col(s"min_$c") <= typed, lit(true))
      else lit(true)
    val dict =
      if (manifest.columns.contains(s"dict_$c"))
        coalesce(array_contains(col(s"dict_$c"), xxhash64(typed)),
          lit(true))
      else lit(true)
    range && dict
  }

  private def prunedScan(dir: String,
                         applyExact: DataFrame => DataFrame,
                         manifestPred: (DataFrame, DataFrame) => Column)
                        (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val full = spark.read.parquet(dir)
    val exact = applyExact(full)
    val (fs, statsPath) = hadoopPath(dir, StatsDir)
    if (!fs.exists(statsPath)) return exact // advisory: absent => full scan
    val manifest = spark.read.parquet(s"$dir/$StatsDir")
    // normalize both sides: input_file_name() and DataFrame.inputFiles
    // render the same file as different URI spellings
    // ("file:///x" vs "file:/x")
    val known = manifest.select(col("file")).collect()
      .map(r => normPath(r.getString(0))).toSet
    // stale manifest, either direction: a current data file the
    // manifest doesn't know about could hold matching rows, and a
    // manifest entry with no current file (retention purge, manual
    // delete) would hand spark.read a dead path and throw — the
    // advisory contract is "never correctness, never a crash", so any
    // mismatch falls back to the full scan
    val current = full.inputFiles.map(normPath).toSet
    if (current != known) return exact
    val files = manifest.filter(manifestPred(manifest, full))
      .select(col("file")).collect().map(_.getString(0))
    val base =
      if (files.isEmpty)
        // provably empty: keep the lake schema WITHOUT referencing any
        // file (a limit(0) over the dir would still list every file,
        // polluting inputFiles-based accounting)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full.schema)
      // basePath: reading explicit file paths would otherwise DROP
      // partition columns (the dirs are no longer scanned as a
      // partition tree) — with it, a partitioned lake prunes correctly
      else spark.read.option("basePath", dir).parquet(files.toIndexedSeq: _*)
    applyExact(base)
  }

  /** One-call lake maintenance: compact + z-order every DIRTY partition
    * and bring the stats manifest back in sync — the composition of the
    * streaming-sink residue story (small files landing continuously),
    * [[zorderParquet]], and the manifest lifecycle, as the single entry
    * point an operator actually schedules.
    *
    * "Dirty" is defined BY the manifest: a partition directory is dirty
    * iff it holds any data file the manifest doesn't know (new ingest,
    * streaming residue, or no manifest yet). Each dirty partition is
    * rewritten z-ordered (compaction and clustering are the same
    * rewrite) and swapped in with [[commitOptimized]]'s atomic rename
    * pair; clean partitions are NOT touched — maintenance cost tracks
    * the dirty fraction, not lake volume. The manifest is then rebuilt
    * as (LIVE entries of clean partitions) UNION (fresh delta-pass
    * stats of the rewritten ones) and swapped into place, so the prune
    * is live again the moment the call returns. Deletions are handled
    * too, without a rewrite: a manifest entry whose file no longer
    * exists (retention purge) would otherwise trip [[readPruned]]'s
    * staleness fallback on every query forever — maintain drops the
    * dead rows in the same resync pass.
    *
    * Idempotent by construction: a second run finds every file
    * manifest-known, rewrites nothing, and leaves the lake byte-
    * identical (MaintainSpec asserts file-set identity and a zero
    * maintained count). Like [[commitOptimized]], the rename swap
    * wants a quiet lake — run it from the maintenance schedule, not
    * under live readers.
    *
    * @return one row per partition directory:
    *         (partition, maintained, n_files, rows)
    */
  def maintainLake(lake: String, targetBytes: Long, zorderCols: Seq[String],
                   bits: Int = 12)
                  (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    require(zorderCols.nonEmpty, "maintainLake: need at least one z-order column")
    val rows = spark.read.parquet(lake)
    val partCols = partitionColsOf(rows)
    require(zorderCols.forall(c => !partCols.contains(c)),
      s"maintainLake($lake): z-order data columns only (directory pruning " +
        s"already covers ${partCols.mkString(",")})")
    val (fs, statsPath) = hadoopPath(lake, StatsDir)
    val hadManifest = fs.exists(statsPath)
    // (raw, normalized) pairs: raw values drive the manifest resync
    // semi-join below, normalized ones the dirty-partition test
    val knownPairs: Array[(String, String)] =
      if (!hadManifest) Array.empty
      else spark.read.parquet(s"$lake/$StatsDir").select(col("file"))
        .collect().map(r => (r.getString(0), normPath(r.getString(0))))
    val known: Set[String] = knownPairs.map(_._2).toSet
    val base = new org.apache.hadoop.fs.Path(lake).toUri.getPath.stripSuffix("/")
    val byPart: Seq[(String, Array[String])] = rows.inputFiles
      .groupBy { f =>
        val p = new org.apache.hadoop.fs.Path(f).getParent.toUri.getPath
        require(p.startsWith(base), s"maintainLake($lake): $f outside the lake")
        p.stripPrefix(base).stripPrefix("/")
      }.toSeq.sortBy(_._1)
    val dirty = byPart.filter(_._2.exists(f => !known.contains(normPath(f))))
    // manifest entries with no current file (retention purge, manual
    // delete — possibly of a whole partition directory): these need no
    // rewrite, but they DO disable the prune — readPruned's staleness
    // check sees current != known and full-scans every query until the
    // dead rows are dropped. Detected here, resolved in the resync.
    val currentNorm: Set[String] = rows.inputFiles.map(normPath(_)).toSet
    val deadEntries = knownPairs.filterNot(kp => currentNorm.contains(kp._2))

    // one partition's rewrite-and-swap; runs on a maintenance thread
    def rewriteOne(rel: String): (Long, Long) = {
      val src = if (rel.isEmpty) lake else s"$lake/$rel"
      // dot-prefixed staging dir: invisible to readers and partition
      // discovery while the rewrite runs
      val tmp =
        if (rel.isEmpty) s"$lake.maintain-tmp"
        else s"$lake/.maintain-tmp-${rel.replace('/', '_')}"
      val man = zorderFlat(src, tmp, targetBytes, zorderCols, bits)
        .collect()(0)
      if (rel.isEmpty) {
        // flat lake: the manifest dir must survive the swap — move it
        // into the staging dir before promoting. If the promote fails
        // (commitOptimized rolls the retire back and throws), move it
        // BACK: otherwise the lake is restored but its manifest is
        // stranded in the staging dir — every read full-scans and the
        // next maintain pays a whole-lake rewrite.
        if (hadManifest) {
          val moved =
            fs.rename(statsPath, new org.apache.hadoop.fs.Path(tmp, StatsDir))
          // abort BEFORE the swap: an ignored failed rename would let
          // the manifest ride the retired lake directory into
          // fs.delete, and the post-commit resync would then throw on
          // the vanished $lake/StatsDir with the data swap already
          // committed — unrecoverable short of a whole-lake rebuild
          require(moved, s"could not stage the stats manifest out of " +
            s"$src before the swap — aborting pre-commit (lake untouched)")
        }
        try fs.delete(new org.apache.hadoop.fs.Path(commitOptimized(src, tmp)), true)
        catch { case t: Throwable =>
          val stranded = new org.apache.hadoop.fs.Path(tmp, StatsDir)
          if (hadManifest && fs.exists(stranded)) fs.rename(stranded, statsPath)
          throw t
        }
      } else {
        fs.delete(new org.apache.hadoop.fs.Path(commitOptimized(src, tmp)), true)
      }
      (man.getLong(1), man.getLong(0))
    }

    // dirty partitions rewrite CONCURRENTLY on a bounded driver pool:
    // each rewrite is ~5 small driver-blocking jobs (count, quantiles,
    // listing, write, verify), so a daily-partition lake with many
    // small dirty dirs would otherwise idle the cluster between jobs —
    // overlapping partitions keeps it saturated while staging dirs and
    // swaps stay strictly per-partition (no shared mutable state; a
    // failure aborts the batch only after EVERY submitted partition has
    // fully drained — success or failure — and the committed ones are
    // absorbed by the next idempotent run)
    val dirtyResults: Map[String, (Long, Long)] =
      if (dirty.isEmpty) Map.empty
      else if (dirty.size == 1) Map(dirty.head._1 -> rewriteOne(dirty.head._1))
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(4, dirty.size))
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        try {
          val futs = dirty.map { case (rel, _) =>
            scala.concurrent.Future(rel -> rewriteOne(rel)) }
          // Await EVERY future individually — Future.sequence is
          // fail-fast, and rethrowing while sibling rewrites are still
          // mid-swap (or queued ones still start on the live pool)
          // would hand a retrying caller a lake with partitions
          // transiently retired and staging dirs it would collide with
          val done = futs.map(f => scala.util.Try(scala.concurrent.Await
            .result(f, scala.concurrent.duration.Duration.Inf)))
          done.foreach(t => if (t.isFailure) throw t.failed.get)
          done.map(_.get).toMap
        } finally pool.shutdown()
      }

    val report = byPart.map { case (rel, files) =>
      dirtyResults.get(rel) match {
        case Some((nFiles, nRows)) => (rel, true, nFiles, nRows)
        case None => (rel, false, files.length.toLong, -1L)
      }
    }

    // manifest resync: keep clean partitions' LIVE entries (dead ones
    // — deletions with no accompanying ingest — are dropped so the
    // staleness fallback stops full-scanning), fresh-stats the
    // rewritten partitions (delta pass only), swap atomically
    if (dirty.nonEmpty || deadEntries.nonEmpty || !hadManifest) {
      val statsCols =
        if (!hadManifest) zorderCols
        else {
          val c = spark.read.parquet(s"$lake/$StatsDir").columns
            .filter(_.startsWith("min_")).map(_.stripPrefix("min_")).toSeq
          require(c.sorted == zorderCols.sorted,
            s"maintainLake($lake): manifest stats cols $c != z-order cols " +
              s"$zorderCols — rewrite the manifest explicitly to change them")
          c
        }
      // dict columns ride the existing manifest shape, like append:
      // a maintenance pass must not silently drop point-skip coverage
      val dictCols =
        if (!hadManifest) Nil
        else spark.read.parquet(s"$lake/$StatsDir").columns
          .filter(_.startsWith("dict_")).map(_.stripPrefix("dict_")).toSeq
      val rewrittenFiles = dirty.map(_._1).flatMap { rel =>
        val dir = if (rel.isEmpty) lake else s"$lake/$rel"
        spark.read.parquet(dir).inputFiles
      }
      // a pure-deletion resync has nothing to rewrite and nothing to
      // fresh-stat — it only drops dead rows from the kept entries
      val fresh =
        if (rewrittenFiles.isEmpty) None
        else Some(statsOf(
          spark.read.option("basePath", lake).parquet(rewrittenFiles: _*),
          statsCols, dictCols))
      // prefix test runs on URI PATHS (scheme spellings differ between
      // the caller's lake string and input_file_name output; `base` is
      // already the lake's URI path)
      val dirtyPrefixes = dirty.map { case (rel, _) =>
        (if (rel.isEmpty) base else s"$base/$rel") + "/" }
      val all =
        if (!hadManifest)
          fresh.getOrElse(throw new IllegalStateException(
            s"maintainLake($lake): no manifest and nothing to stat"))
        else {
          import spark.implicits._
          // clean = manifest entries NOT under a rewritten partition
          // AND still present in the current listing (dead entries are
          // dropped here); resolved driver-side on the already-
          // collected listing and re-joined on the RAW file strings
          // (no path-normalization expression needed in the plan)
          val cleanRaw = knownPairs.collect {
            case (raw, n) if currentNorm.contains(n) && !dirtyPrefixes.exists(
              new org.apache.hadoop.fs.Path(raw).toUri.getPath.startsWith) => raw
          }.toSeq
          val keep = spark.read.parquet(s"$lake/$StatsDir")
            .join(cleanRaw.toDF("file"), Seq("file"), "left_semi")
          fresh.fold(keep)(f =>
            keep.unionByName(f.select(keep.columns.toIndexedSeq.map(col): _*)))
        }
      val tmpStats = new org.apache.hadoop.fs.Path(lake, s".$StatsDir-tmp")
      val manFiles = math.max(1,
        (rows.inputFiles.length + ManifestRowsPerFile - 1) / ManifestRowsPerFile)
      all.repartitionByRange(manFiles, col("file"))
        .write.mode(SaveMode.Overwrite).parquet(tmpStats.toString)
      fs.delete(statsPath, true)
      require(fs.rename(tmpStats, statsPath),
        s"maintainLake($lake): failed to promote the rebuilt manifest")
    }

    import spark.implicits._
    report.toDF("partition", "maintained", "n_files", "rows")
  }
}
