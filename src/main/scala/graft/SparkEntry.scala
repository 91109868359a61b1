package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory is assembled from the per-domain [[graft.queries.Q]]
  * sets; every entry that is SQL-expressible carries a DuckDB oracle with
  * pairwise-identical column names.
  */
object SparkEntry {

  private val sets: Seq[QuerySet] =
    Seq(LakeOps, Relational, Relational2, Relational3, Relational4,
      Relational5, Relational6, Relational7, DedupOps, TextOps,
      SimilarityOps, EventOps, MediaOps, SketchOps, PipelineOps)

  /** Flagship: end-to-end compaction semantics (scan -> mtime order ->
    * running-sum bundling -> manifest) on sf0.001; driver smoke-checks
    * rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("c01_bundle_assign")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sets.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    sets.flatMap(_.oracles).toMap
}
