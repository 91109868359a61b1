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
      None),

    // Exact twins of the x01 sketches, per event type — fully
    // oracle-checkable (exact distinct count; exact continuous
    // percentile, which Spark's `percentile` and DuckDB's
    // `quantile_cont` both define by linear interpolation; rounding
    // absorbs interpolation ulp).
    Q("x02_exact_quantiles",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "events")
          .groupBy($"event_type")
          .agg(
            countDistinct($"user_id").as("nd_users"),
            round(expr("percentile(value, 0.5)"), 4).as("p50"),
            round(expr("percentile(value, 0.95)"), 4).as("p95"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT event_type,
             |  count(DISTINCT user_id) AS nd_users,
             |  round(quantile_cont(value, 0.5), 4) AS p50,
             |  round(quantile_cont(value, 0.95), 4) AS p95,
             |  count(*) AS n
             |FROM events GROUP BY event_type""".stripMargin)),

    // MERGEABLE sketch columns — the lakehouse rollup pattern: stage 1
    // builds a per-(type, day) HLL sketch COLUMN (DataSketches binary),
    // stage 2 unions day sketches into per-type estimates. At 100 TB
    // stage 1 is the daily incremental job persisting ~KB sketches per
    // partition; stage 2 answers "distinct users over any day range"
    // without rescanning events — the thing an exact countDistinct
    // fundamentally cannot do incrementally. Register-wise max makes
    // the union order-independent, so results are deterministic under
    // any partitioning. No DuckDB oracle (engine-specific binary);
    // QueriesSpec pins the estimates against exact counts.
    Q("x03_sketch_columns",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "events")
          .groupBy($"event_type", to_date($"ts").as("day"))
          .agg(hll_sketch_agg($"user_id", lit(12)).as("sk"),
            count(lit(1)).as("n"))
          .groupBy($"event_type")
          .agg(
            hll_sketch_estimate(hll_union_agg($"sk")).as("approx_users"),
            sum($"n").as("n_events"),
            count(lit(1)).as("n_day_sketches"))
      },
      None),

    // --- Heavy hitters over the token stream: Misra-Gries sketch
    // (bounded ≤m counters per partial, mergeable with additive error —
    // the PODS'12 mergeable-summaries construction) narrows the
    // candidates, then ONE exact re-count of only those ≤m keys
    // verifies. The sketch's superset guarantee (every key with true
    // count > n/(m+1) survives any merge tree) makes the FINAL output
    // deterministic and exactly SQL-expressible — the sketch family's
    // first full DuckDB oracle. Scale shape: map-side sketch -> p×m
    // entries to one tiny merge -> broadcast candidates -> exact count
    // of candidate rows only. The full token cardinality never
    // shuffles; an exact GROUP BY token at 100 TB shuffles billions of
    // distinct keys to answer a 64-row question.
    Q("x04_heavy_hitters",
      (s, d) => {
        import s.implicits._
        val m = 64
        val words = Tables.load(s, d, "documents")
          .select(explode(graft.functions.TextFns.tokens($"text")).as("token"))
        // n rides the sketch pass (one agg, two outputs) and travels to
        // the recount inside the ≤m-row broadcast — exactly TWO corpus
        // scans total, the minimum while the recount is the correctness
        // surface (a standalone words.count() was a third full pass).
        // n DIV (m+1): integer floor division, matching the oracle's //.
        val cands = words
          .agg(graft.expressions.MisraGries.mg_sketch($"token", m).as("sk"),
            count(lit(1)).as("n"))
          .select(explode(map_keys($"sk")).as("token"),
            expr(s"n DIV ${m + 1}").as("thresh"))
        words.join(broadcast(cands), Seq("token"))
          .groupBy($"token", $"thresh")
          .agg(count(lit(1)).as("cnt"))
          .filter($"cnt" > $"thresh")
          .select($"token", $"cnt")
      },
      Some("""WITH E AS (SELECT unnest(list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS token
             |  FROM documents),
             |N AS (SELECT count(*) AS n FROM E)
             |SELECT token, CAST(count(*) AS BIGINT) AS cnt
             |FROM E GROUP BY token
             |HAVING count(*) > (SELECT n // 65 FROM N)""".stripMargin))
  )
}
