package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Sketch/approximate aggregates. No DuckDB oracle: HLL++ (Spark) and
  * DuckDB's approx algorithms differ by design — the driver records the
  * weaker rows-only check for these (builder contract allows omitting
  * `oracleSql` for non-SQL-expressible ops). The exact counterparts are
  * oracle-checked elsewhere (q15 countDistinct, e02 n_users).
  */
object SketchOps extends QuerySet {

  val all: Seq[Q] = Seq(

    // approx_count_distinct (HLL++) + quantile sketch per event type —
    // the at-scale forms of distinct-count and percentile (exact
    // versions shuffle every distinct value; sketches shuffle ~KB).
    Q("x01_sketch_aggregates",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "events")
          .groupBy($"event_type")
          .agg(
            approx_count_distinct($"user_id", 0.01).as("approx_users"),
            percentile_approx($"value", lit(0.5), lit(1000)).as("median_value"),
            count(lit(1)).as("n"))
      },
      None)
  )
}
