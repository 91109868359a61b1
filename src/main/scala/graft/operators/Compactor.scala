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
    val (res, cached) = bundleIdPhases(df, primaryOrder, tieBreakers, sizeCol,
      targetBytes, buckets)
    // registered, not leaked: Caches.release() is the cleanup hook for
    // long-lived sessions (the end-to-end paths below release per-call)
    Caches.track(cached)
    res
  }

  private def bundleIdPhases(df: DataFrame, primaryOrder: Column,
                             tieBreakers: Seq[Column], sizeCol: Column,
                             targetBytes: Long, buckets: Int): (DataFrame, DataFrame) = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val spark = df.sparkSession
    val b = if (buckets > 0) buckets
            else spark.sessionState.conf.numShufflePartitions
    // Persisted: three phases (quantile sketch, bucket totals, final
    // window) each consume this projection; without the persist each
    // phase re-scans the source. The projection is narrow (order key +
    // size + tie-breakers) — at 100M files that's a few GB cluster-wide,
    // far cheaper than three source scans.
    val ordered = df
      .withColumn("_ord", primaryOrder.cast("double"))
      .withColumn("_sz", coalesce(sizeCol.cast("long"), lit(0L)))
      .persist()

    // Phase 1: deterministic range boundaries (one scan, driver gets b-1 doubles).
    val probes = (1 until b).map(_.toDouble / b).toArray
    val bounds: Array[Double] =
      if (b <= 1) Array.empty
      else ordered.stat.approxQuantile("_ord", probes, 0.01).distinct.sorted

    // Bucket index = number of boundaries <= key. Depends only on the key,
    // so equal keys share a bucket and buckets tile the key space in order.
    val bucketCol = bounds.foldLeft(lit(0)) { (acc, bound) =>
      acc + when(col("_ord") >= lit(bound), 1).otherwise(0)
    }
    val bucketed = ordered.withColumn("_bucket", bucketCol)

    // Phase 2: per-bucket totals -> exclusive offsets (tiny; broadcast back).
    val totals = bucketed.groupBy("_bucket").agg(sum("_sz").as("_total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val exclusive = totals.map(_._2).scanLeft(0L)(_ + _) // len = totals.len + 1
    val offsetsDf = spark.createDataFrame(totals.map(_._1).zip(exclusive).toSeq)
      .toDF("_bucket", "_offset")

    // Phase 3: within-bucket exclusive running sum + broadcast offset.
    // Order by the ORIGINAL key, not the double `_ord`: casting a timestamp
    // to double can collapse nearby microsecond values, and the tie-breaker
    // would then reorder rows vs. an exact-key sort. `_ord` is monotone
    // (non-strictly) in the key, so buckets still tile the exact order.
    val w = Window.partitionBy(col("_bucket"))
      .orderBy((primaryOrder +: tieBreakers): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val res = bucketed
      .join(broadcast(offsetsDf), "_bucket")
      .withColumn("_prefix", coalesce(sum(col("_sz")).over(w), lit(0L)) + col("_offset"))
      .withColumn(BundleCol, floor(col("_prefix") / lit(targetBytes)))
      .drop("_ord", "_bucket", "_offset", "_prefix")
      .withColumnRenamed("_sz", "record_bytes")
    (res, ordered)
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
      .select(col("path"), col("modificationTime"), col("length"), col("content"))
      .filter(col("length") > 0)
    val (withB, cached) = bundleIdPhases(files, col("modificationTime"),
      Seq(col("path")), col("length"), targetBytes, 0)
    withB
      .select(col(BundleCol), col("path"), col("modificationTime"),
        col("record_bytes"), col("content"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(BundleCol)
      .parquet(outputDir)
    // phase 3 has executed; release the projection cache now and compute
    // the manifest from the WRITTEN bundles (no input rescan, and the
    // manifest then describes exactly what landed on disk).
    cached.unpersist(false)
    val written = spark.read.parquet(outputDir)
      .select(col(BundleCol).cast("long").as(BundleCol), col("path"),
        col("record_bytes"))
    manifest(written, col("path"))
  }

  /** Text-bundle variant with optional compression (reference W2 gzip
    * handler, `core/gzipfile_handler.py:30-114`): one directory per
    * bundle of concatenated record text, written through the codec.
    * The reference targets the COMPRESSED size (re-stat every ~100 KB,
    * overshooting by one check interval); a distributed writer can't
    * observe compressed size mid-write either, so bundles are sized on
    * uncompressed bytes — same practical contract (bounded bundles),
    * documented divergence (SURVEY §2 W2).
    */
  def compactToText(inputDir: String, outputDir: String, targetBytes: Long,
                    codec: Option[String] = Some("gzip"),
                    glob: Option[String] = None)
                   (implicit spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val files = Readers.wholeTextRecords(spark, inputDir, glob)
    val (withB, cached) = bundleIdPhases(files, col("mtime"), Seq(col("path")),
      col("size"), targetBytes, 0)
    val writer = withB.select(col(BundleCol), col("content").as("value"))
      .write.mode(SaveMode.Overwrite).partitionBy(BundleCol)
    codec.fold(writer)(c => writer.option("compression", c)).text(outputDir)
    // text bundles carry no metadata columns, so the manifest still reads
    // through `withB`; release the cache now — a manifest consumed later
    // recomputes with one extra source scan instead of pinning memory.
    cached.unpersist(false)
    manifest(withB, col("path"))
  }
}
