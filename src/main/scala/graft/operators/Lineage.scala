package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Lineage & observability — the live replacements for the reference's
  * dead bookkeeping:
  *  - collected/flushed/errored counters (`utils/metadata/store.py:5-23`,
  *    initialized but never incremented) -> `Dataset.observe` metrics,
  *    collected by the driver per action;
  *  - `.lakeflush.flushed` sidecar files (`utils/file/store.py:10-21`,
  *    one dest-path string per bundle) -> an appendable parquet manifest
  *    TABLE (bundle, destination, run id, byte/record counts) that
  *    downstream jobs can join/prune — queryable lineage instead of a
  *    million tiny marker files (which would recreate the exact
  *    small-file problem this engine exists to fix);
  *  - the dead SQLiteMetastore KV (`utils/metastore.py`) -> nothing:
  *    the manifest table + Spark catalog cover its imagined uses.
  */
object Lineage {

  /** Attach collected-counter metrics to a record stream. Read them
    * from the action's `observedMetrics` (batch) or
    * `StreamingQueryProgress` (streaming) under `name`.
    */
  def observed(df: DataFrame, name: String, sizeCol: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("collected_records"),
      coalesce(sum(col(sizeCol)), lit(0L)).as("collected_bytes"))

  /** Append one manifest row per flushed bundle. `runId` is
    * caller-supplied (keeps reruns idempotent-by-key and tests
    * hash-stable — no wall clock inside the engine, SURVEY §7).
    */
  def appendFlushManifest(manifest: DataFrame, manifestDir: String,
                          runId: String, destination: String): Unit =
    manifest
      .withColumn("run_id", lit(runId))
      .withColumn("destination", lit(destination))
      .write.mode(SaveMode.Append).parquet(manifestDir)

  /** Bundles recorded by a prior run (for idempotent catch-up: the
    * reference forever-drops bundles whose flush event was lost —
    * SURVEY §3c step 5; a join against this manifest re-discovers
    * them).
    */
  def flushedBundles(spark: SparkSession, manifestDir: String): DataFrame =
    spark.read.parquet(manifestDir).select(col("bundle_id"), col("run_id"),
      col("destination"))
}
