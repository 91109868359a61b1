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
  *  2. per-bucket totals -> driver (≤ `buckets` rows) -> exclusive bucket
  *     offsets, broadcast-joined back;
  *  3. within-bucket running sum (`Window.partitionBy(bucket)`), so no
  *     task ever sorts more than one bucket.
  *
  * `offset(bucket) + local_prefix == global_prefix` for ANY bucket
  * boundaries, so results do not depend on the quantile sketch accuracy —
  * only balance does. Everything is expressible as one SQL window in the
  * DuckDB oracle.
  */
object Compactor {

  /** Columns appended by [[withBundleId]]. */
  val BundleCol = "bundle_id"

  /** Assign `bundle_id = floor(exclusive_prefix_sum(size) / targetBytes)`
    * over the total order `(primaryOrder, tieBreakers...)`.
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
    val spark = df.sparkSession
    val b = if (buckets > 0) buckets
            else spark.sessionState.conf.numShufflePartitions

    // Phases 1-2 run on a NARROW projection (order key + size ONLY —
    // never the payload: caching record content is exactly what cannot
    // work at 100 TB, and columnar sources prune the payload read).
    // Cached just for the two eager passes below, released before
    // returning — nothing stays pinned.
    val narrow = df
      .select(primaryOrder.cast("double").as("_ord"),
        coalesce(sizeCol.cast("long"), lit(0L)).as("_sz"))
      .persist()

    // Phase 1: deterministic range boundaries (one pass, driver gets b-1
    // doubles; Greenwald-Khanna sketch — RangePartitioner sampling could
    // differ between jobs and desynchronize phases 2/3).
    val probes = (1 until b).map(_.toDouble / b).toArray
    val bounds: Array[Double] =
      if (b <= 1) Array.empty
      else narrow.stat.approxQuantile("_ord", probes, 0.01).distinct.sorted

    // Bucket index = number of boundaries <= key. Depends only on the key,
    // so equal keys share a bucket and buckets tile the key space in order.
    // Binary search, not a chained-when fold: the fold's generated code
    // grows with the bucket count and falls out of whole-stage codegen
    // at the thousands-of-buckets configs a 100x scale-up needs.
    // A null key lands in bucket 0, same as the fold it replaced.
    def bucketOf(ord: Column): Column =
      if (bounds.isEmpty) lit(0)
      else coalesce(
        graft.expressions.NativeFns.range_bucket(ord, bounds), lit(0))

    // Phase 2: per-bucket totals -> exclusive offsets (tiny; broadcast back).
    val totals = narrow.withColumn("_bucket", bucketOf(col("_ord")))
      .groupBy("_bucket").agg(sum("_sz").as("_total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    narrow.unpersist(false) // both eager passes done
    val exclusive = totals.map(_._2).scanLeft(0L)(_ + _) // len = totals.len + 1
    val offsetsDf = spark.createDataFrame(totals.map(_._1).zip(exclusive).toSeq)
      .toDF("_bucket", "_offset")

    // Phase 3 (lazy, computed when the caller materializes): ONE fresh
    // pass over the full source — bucket + within-bucket running sum +
    // broadcast offset. Order by the ORIGINAL key, not the double
    // `_ord`: casting a timestamp to double can collapse nearby
    // microsecond values, and the tie-breaker would then reorder rows
    // vs. an exact-key sort. `_ord` is monotone (non-strictly) in the
    // key, so buckets still tile the exact order.
    val w = Window.partitionBy(col("_bucket"))
      .orderBy((primaryOrder +: tieBreakers): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df
      .withColumn("_sz", coalesce(sizeCol.cast("long"), lit(0L)))
      .withColumn("_bucket", bucketOf(primaryOrder.cast("double")))
      .join(broadcast(offsetsDf), "_bucket")
      .withColumn("_prefix", coalesce(sum(col("_sz")).over(w), lit(0L)) + col("_offset"))
      .withColumn(BundleCol, floor(col("_prefix") / lit(targetBytes)))
      .drop("_bucket", "_offset", "_prefix")
      .withColumnRenamed("_sz", "record_bytes")
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

  /** The bundled lake's listing high-water mark: the max first-level
    * `k=v` directory known to contain a bundled file. None when absent
    * or unreadable (advisory metadata).
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

  /** First-level directory names of `inputDir` when the layout is
    * partition-shaped — EVERY entry a `k=v` directory (the reference
    * flusher's own `date=.../hour=...` layout,
    * `flushers/local_lake.py:55-60`). None for flat or mixed layouts:
    * those keep the full-anti-join path. One driver-side listStatus —
    * |date dirs| entries, metadata-scale.
    */
  private def firstLevelPartitionDirs(inputDir: String)
      (implicit spark: org.apache.spark.sql.SparkSession): Option[Seq[String]] =
    try {
      val p = new org.apache.hadoop.fs.Path(inputDir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val entries = fs.listStatus(p)
      val named = entries.toSeq.map(e => (e.isDirectory, e.getPath.getName))
      if (named.nonEmpty && named.forall { case (d, n) =>
            d && n.matches("[A-Za-z0-9_.\\-]+=.+") })
        Some(named.map(_._2))
      else None
    } catch { case _: Exception => None }

  /** First-level dir (member of `dirs`) appearing in `path`, if any. */
  private def dirOfPath(path: String, dirs: Seq[String]): Option[String] = {
    val ds = dirs.toSet
    "/([^/]+=[^/]+)(?=/)".r.findAllMatchIn(path).map(_.group(1))
      .find(ds.contains)
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
    * On partition-shaped inputs (every first-level entry a `k=v`
    * directory — the reference flusher's `date=.../hour=...` layout) a
    * sidecar `_graft_watermark.json` records the max first-level dir
    * known to hold a bundled file. The next pass then lists ONLY
    * directories `>= mark` (inclusive, so a still-filling current dir
    * keeps catching late files) and prunes the processed-set to the
    * same dirs — a small periodic delta costs the delta, not a
    * million-file re-list + million-path anti-join. Assumes
    * date-monotone arrivals (new files land in dirs at-or-past the
    * newest dir that has ever held data — the log-shipper reality);
    * writers that backfill OLD date dirs must delete the sidecar (or
    * not use it — flat/mixed layouts, absent sidecar, and deleted mark
    * dirs all fall back to the full anti-join automatically).
    */
  def compactDirectoryIncremental(inputDir: String, outputDir: String,
                                  targetBytes: Long, glob: Option[String] = None)
                                 (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val prev =
      try {
        val p = spark.read.parquet(outputDir)
        if (p.columns.contains("path")) Some(p) else None
      } catch { case _: org.apache.spark.sql.AnalysisException => None }
    prev match {
      case None =>
        val mf = compactDirectory(inputDir, outputDir, targetBytes, glob)
        firstLevelPartitionDirs(inputDir).foreach { ds =>
          // manifest last_key is max(path) per bundle — the global max
          // bundled path falls out of the tiny manifest frame
          val maxPath = mf.agg(max(col("last_key"))).collect()(0).getString(0)
          Option(maxPath).flatMap(dirOfPath(_, ds))
            .foreach(writeWatermark(outputDir, _))
        }
        mf
      case Some(p) =>
        val reader = spark.read.format("binaryFile")
        val dirs = firstLevelPartitionDirs(inputDir)
        val mark = readWatermark(outputDir)
        // candidate first-level dirs for the fast path; None = full scan
        val cand: Option[Seq[String]] = (mark, dirs) match {
          case (Some(m), Some(ds)) =>
            val c = ds.filter(_ >= m).sorted
            if (c.nonEmpty) Some(c) else None
          case _ => None
        }
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
        // processed-set pruned to the candidate dirs on the fast path:
        // paths are URIs, so dir membership is a substring test (codegen
        // disjunction over a handful of dirs), not a prefix compare
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
          if (mark.isEmpty) dirs.foreach { ds =>
            val maxPath = p.agg(max(col("path"))).collect()(0).getString(0)
            Option(maxPath).flatMap(dirOfPath(_, ds))
              .foreach(writeWatermark(outputDir, _))
          }
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
          // regresses below the existing mark)
          dirs.foreach { ds =>
            val maxPath = assign.agg(max(col("path"))).collect()(0).getString(0)
            val newMark = (mark.toSeq ++ Option(maxPath).flatMap(dirOfPath(_, ds)))
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
}
