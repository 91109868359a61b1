package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curation-stage operators for training-data pipelines: the selection
  * step between scoring and training.
  *
  * Reference provenance: the rotation prefix-sum of lakeflush W1
  * (`core/file_handler.py:43-59`) — accumulate a running total in a
  * deterministic order, cut at a threshold — applied to token budgets
  * instead of bundle bytes. Like [[Compactor.withBundleId]], the
  * running sum is computed as a DISTRIBUTED prefix sum so no task ever
  * sorts a whole stratum alone.
  */
object Curation {

  /** Per-stratum quality-first token-budget packing: within each
    * stratum, order documents by (quality DESC, tieBreakers), compute
    * the inclusive running token sum, and keep the prefix with
    * `cum_tok <= budget` — prefix-of-ranking, not knapsack: the
    * deterministic, engine-independent contract a reproducible data mix
    * needs.
    *
    * == Scale design ==
    * The naive form is one window per stratum — parallelism = |strata|,
    * and at 100 TB a stratum is a whole training domain sorted and
    * scanned by a single (spillable, but serial) task. Here the same
    * three-phase distributed prefix sum as [[Compactor.withBundleId]],
    * generalized per-group:
    *
    *  1. range-bucket the pack order on NEGATED quality via ONE global
    *     `approxQuantile` (boundaries shared across strata: boundaries
    *     affect only balance, never results, so per-stratum sketches
    *     would buy nothing but extra passes);
    *  2. per-(stratum, bucket) token totals -> exclusive per-stratum
    *     bucket offsets. Unlike withBundleId this phase never collects
    *     to the driver: the totals table is |strata| x |buckets| rows
    *     and the offsets are a window over THAT (partitioned by
    *     stratum, <= |buckets| rows per partition), eagerly
    *     localCheckpointed while the narrow projection is cached, then
    *     broadcast back;
    *  3. within-(stratum, bucket) inclusive running sum + offset =
    *     the stratum-global prefix — window parallelism is
    *     |strata| x |buckets| instead of |strata|, so one hot stratum
    *     fans out across `buckets` tasks.
    *
    * `offset(stratum, bucket) + local_prefix == stratum_prefix` for ANY
    * bucket boundaries, so skew (one stratum holding 90% of the corpus)
    * costs balance, never correctness — pinned by the bucket-count
    * independence case in CurationSpec.
    *
    * @param tieBreakers order columns after quality making the
    *                    per-stratum order total (e.g. `$"doc_id".asc`)
    * @param buckets     range buckets (window parallelism per stratum);
    *                    defaults to `spark.sql.shuffle.partitions`
    * @param cumCol      name of the appended running-total column
    * @param qualityBounds when the caller KNOWS the quality range
    *                    (e.g. a composite score in [0,1] by
    *                    construction), pass `Some((lo, hi))`: bucket
    *                    boundaries become a static uniform grid and the
    *                    approxQuantile pass (plus its narrow persist) is
    *                    skipped entirely — boundaries affect only
    *                    balance, never results, so a mildly clumped
    *                    score distribution trades some balance for one
    *                    less corpus pass. None = quantile boundaries.
    */
  def packByBudget(df: DataFrame, stratumCol: Column, qualityCol: Column,
                   tieBreakers: Seq[Column], tokenCol: Column, budget: Long,
                   buckets: Int = 0, cumCol: String = "cum_tok",
                   qualityBounds: Option[(Double, Double)] = None): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val spark = df.sparkSession
    val b = if (buckets > 0) buckets
            else spark.sessionState.conf.numShufflePartitions

    // negated quality is ascending in the quality-DESC pack order, so
    // range buckets tile the pack order in ascending bucket index
    val ord = negate(qualityCol.cast("double"))

    // Phase-2 input: a narrow (stratum, order, tokens) projection —
    // never the payload. Persisted only when the quantile pass ALSO
    // needs it (two consumers); with static bounds it feeds exactly one
    // aggregation and caching would be pure overhead.
    def narrowProj = df.select(stratumCol.as("_st"), ord.as("_ord"),
      coalesce(tokenCol.cast("long"), lit(0L)).as("_tok"))

    val (bounds: Array[Double], narrow: DataFrame, cached: Boolean) =
      qualityBounds match {
        case _ if b <= 1 => (Array.empty[Double], narrowProj, false)
        case Some((lo, hi)) =>
          require(hi > lo, s"qualityBounds must satisfy hi > lo, got ($lo, $hi)")
          // uniform grid over NEGATED quality: -hi .. -lo ascending
          val grid = (1 until b)
            .map(i => -hi + i * (hi - lo) / b).toArray
          (grid, narrowProj, false)
        case None =>
          val n = narrowProj.persist()
          val probes = (1 until b).map(_.toDouble / b).toArray
          (n.stat.approxQuantile("_ord", probes, 0.01).distinct.sorted, n, true)
      }
    // a NULL quality sorts last under `desc` (both engines default
    // NULLS LAST), so null order keys must land in the LAST bucket —
    // bucket 0 would put them before every real row's offset while the
    // within-bucket sort still pushed them to its end
    def bucketOf(c: Column): Column =
      if (bounds.isEmpty) lit(0)
      else coalesce(graft.expressions.NativeFns.range_bucket(c, bounds),
        lit(bounds.length))

    // exclusive per-stratum offsets over the tiny totals table; the
    // EAGER localCheckpoint materializes it while `narrow` is still
    // cached and pins the result, so phase 3's execution re-reads a few
    // hundred checkpointed rows, not the totals aggregation
    val wOff = Window.partitionBy(col("_st")).orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = narrow.withColumn("_bucket", bucketOf(col("_ord")))
      .groupBy(col("_st"), col("_bucket"))
      .agg(sum(col("_tok")).as("_total"))
      .withColumn("_offset", coalesce(sum(col("_total")).over(wOff), lit(0L)))
      .select(col("_st"), col("_bucket"), col("_offset"))
      .localCheckpoint()
    if (cached) narrow.unpersist(false)

    // Phase 3 (lazy): ONE fresh pass over the source — bucket,
    // broadcast-join the offset, within-bucket inclusive running sum.
    // Ordered by the ORIGINAL quality column + tie-breakers, not the
    // negated double (same exactness argument as withBundleId phase 3).
    val w = Window.partitionBy(col("_pk_st"), col("_pk_bucket"))
      .orderBy((qualityCol.desc +: tieBreakers): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("_pk_st", stratumCol)
      .withColumn("_pk_tok", coalesce(tokenCol.cast("long"), lit(0L)))
      .withColumn("_pk_bucket", bucketOf(ord))
      .join(broadcast(offsets.toDF("_pk_st", "_pk_bucket", "_pk_off")),
        Seq("_pk_st", "_pk_bucket"))
      .withColumn(cumCol, sum(col("_pk_tok")).over(w) + col("_pk_off"))
      .filter(col(cumCol) <= budget)
      .drop("_pk_st", "_pk_bucket", "_pk_tok", "_pk_off")
  }
}
