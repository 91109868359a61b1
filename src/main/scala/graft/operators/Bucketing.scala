package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location: the pre-shuffle that makes repeated
  * big-big joins shuffle-free at 100 TB.
  *
  * A fact-to-fact equi-join (orders x lineitem on orderkey, or a daily
  * incremental merge into a bundled lake) shuffles BOTH sides every
  * run. Writing each side bucketed (`bucketBy(n, key)` + `sortBy`) pays
  * that shuffle once at write time; every later join on the bucket key
  * is planned as a sort-merge join over co-located buckets with NO
  * Exchange on either side (asserted in BucketingSpec against the
  * physical plan). The reference's mtime-ordered bundle files
  * (`core/collector.py:82-91`) give no such co-location — bundles are
  * time-ordered, so every downstream join reshuffles; this is the
  * Spark-first replacement.
  *
  * Scale notes: pick bucket counts so one bucket of the LARGER table
  * fits an executor's sort buffer (e.g. 100 TB / 8192 buckets ≈ 12 GB —
  * spill-tolerant; prefer 16384 for headroom). Both sides must agree on
  * (bucket count, key) or Spark falls back to shuffling the mismatched
  * side only.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). Bucketing
    * requires the table catalog — a plain path write cannot record
    * bucket metadata.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    key: String, moreKeys: String*): Unit =
    df.write
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .saveAsTable(table)

  /** Equi-join two bucketed tables on their shared bucket key. When both
    * sides were written with [[writeBucketed]] under the same (buckets,
    * key), the planner emits a shuffle-free sort-merge join.
    */
  def cocolocatedJoin(spark: SparkSession, leftTable: String,
                      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
