package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-stream operators in batch form: sessionization
  * (lag-gap-cumsum), event-time tumbling windows, as-of join. The
  * streaming (Structured Streaming) equivalents live in
  * [[graft.streaming]]; these batch forms are the DuckDB-verifiable
  * surface. All event-time arithmetic uses the exact `ts_ns` long to
  * sidestep ns->us truncation (see [[graft.Tables]]).
  */
object EventOps extends QuerySet {

  private val GapNs = 30L * 60 * 1000 * 1000 * 1000 // 30 min session gap

  val all: Seq[Q] = Seq(

    // --- Sessionization: batch lag-gap-cumsum. One shuffle on user_id;
    // both windows share the same partitioning so Spark plans a single
    // exchange + sort.
    Q("e01_sessionize",
      (s, d) => {
        import s.implicits._
        val byUser = Window.partitionBy($"user_id").orderBy($"ts_ns".asc, $"event_id".asc)
        Tables.load(s, d, "events")
          .withColumn("new_sess",
            when(lag($"ts_ns", 1).over(byUser).isNull ||
                 $"ts_ns" - lag($"ts_ns", 1).over(byUser) > GapNs, 1).otherwise(0))
          .withColumn("session_id",
            sum($"new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_events"),
               min($"event_id").as("first_event"),
               round(((max($"ts_ns") - min($"ts_ns")) / lit(1e9)), 3).as("duration_secs"))
      },
      Some("""WITH x AS (SELECT user_id, event_id, epoch_ns(ts) AS tn,
             |  CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
             |       OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
             |  THEN 1 ELSE 0 END AS new_sess
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |y AS (SELECT user_id, event_id, tn,
             |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY tn, event_id
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |  FROM x)
             |SELECT user_id, session_id, count(*) AS n_events,
             |min(event_id) AS first_event,
             |round((max(tn) - min(tn)) / 1e9, 3) AS duration_secs
             |FROM y GROUP BY user_id, session_id""".stripMargin)),

    // --- Event-time tumbling window (1 h) aggregation. Bucketing by
    // integer division of the exact ns epoch — identical on both
    // engines; at scale this is a single hash aggregation keyed by
    // (bucket, type) with map-side partials.
    Q("e02_hourly_windows",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "events")
          .withColumn("hour_bucket", expr("ts_ns DIV 3600000000000"))
          .groupBy($"hour_bucket", $"event_type")
          .agg(count(lit(1)).as("n"),
               round(sum($"value"), 2).as("sum_value"),
               countDistinct($"user_id").as("n_users"))
      },
      Some("""SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
             |count(*) AS n, round(sum(value),2) AS sum_value,
             |count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // --- As-of join: each purchase event matched to the customer's
    // latest order at-or-before the event time. Spark lacks a batch
    // as-of join; the rank-filter form keeps it an equi-join on the key
    // (user_id) plus a per-event window — no cross product, scales with
    // the per-key order count.
    Q("e03_asof_join",
      (s, d) => {
        import s.implicits._
        val ev = Tables.load(s, d, "events")
          .filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts")
        val o = Tables.load(s, d, "orders")
          .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
        val w = Window.partitionBy($"event_id")
          .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
        ev.join(o, $"user_id" === $"o_custkey" && $"o_orderdate" <= $"ts", "left")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"event_id", $"user_id", $"o_orderkey".as("last_orderkey"),
            round($"o_totalprice", 2).as("last_price"))
      },
      Some("""WITH ev AS (SELECT event_id, user_id, ts FROM events
             |  WHERE event_type = 'purchase'),
             |j AS (SELECT ev.event_id, ev.user_id, o.o_orderkey, o.o_totalprice,
             |  row_number() OVER (PARTITION BY ev.event_id
             |    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
             |  FROM ev LEFT JOIN orders o
             |  ON o.o_custkey = ev.user_id AND o.o_orderdate <= ev.ts)
             |SELECT event_id, user_id, o_orderkey AS last_orderkey,
             |round(o_totalprice, 2) AS last_price
             |FROM j WHERE rn = 1""".stripMargin)),

    // --- As-of join, merge form ([[graft.operators.AsOf]]): same
    // semantics as e03 but ZERO pair blowup — each side shuffles once
    // on user_id, cogroups merge with two pointers. The oracle states
    // the declarative (join-then-rank) form; hash-equal results prove
    // the merge implements it.
    Q("e05_asof_merge",
      (s, d) => {
        import s.implicits._
        import graft.operators.AsOf
        val ev = Tables.load(s, d, "events")
          .filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", unix_micros($"ts".cast("timestamp")).as("lt"))
        val o = Tables.load(s, d, "orders")
          .select($"o_custkey".as("user_id"), $"o_orderkey",
            unix_micros($"o_orderdate".cast("timestamp")).as("rt"), $"o_totalprice")
        AsOf.backward(ev, o, "user_id", "lt", "rt", "o_orderkey")
          .select($"event_id", $"user_id", $"o_orderkey".as("last_orderkey"),
            round($"o_totalprice", 2).as("last_price"))
      },
      Some("""WITH ev AS (SELECT event_id, user_id, ts FROM events
             |  WHERE event_type = 'purchase'),
             |j AS (SELECT ev.event_id, ev.user_id, o.o_orderkey, o.o_totalprice,
             |  row_number() OVER (PARTITION BY ev.event_id
             |    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
             |  FROM ev LEFT JOIN orders o
             |  ON o.o_custkey = ev.user_id AND o.o_orderdate <= ev.ts)
             |SELECT event_id, user_id, o_orderkey AS last_orderkey,
             |round(o_totalprice, 2) AS last_price
             |FROM j WHERE rn = 1""".stripMargin)),

    // --- As-of join, PLANNED form: the custom Catalyst operator
    // ([[graft.plans.AsOfJoinPlan]] -> strategy -> streaming
    // [[graft.plans.AsOfJoinExec]]); EnsureRequirements inserts the
    // exchanges and spillable sorts. Same oracle as e03/e05 — three
    // implementations, one contract.
    Q("e06_asof_planned",
      (s, d) => {
        import s.implicits._
        import graft.operators.AsOf
        val ev = Tables.load(s, d, "events")
          .filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", unix_micros($"ts".cast("timestamp")).as("lt"))
        val o = Tables.load(s, d, "orders")
          .select($"o_custkey", $"o_orderkey",
            unix_micros($"o_orderdate".cast("timestamp")).as("rt"), $"o_totalprice")
        AsOf.backwardPlanned(ev, o, "user_id", "o_custkey", "lt", "rt", "o_orderkey")
          .select($"event_id", $"user_id", $"o_orderkey".as("last_orderkey"),
            round($"o_totalprice", 2).as("last_price"))
      },
      Some("""WITH ev AS (SELECT event_id, user_id, ts FROM events
             |  WHERE event_type = 'purchase'),
             |j AS (SELECT ev.event_id, ev.user_id, o.o_orderkey, o.o_totalprice,
             |  row_number() OVER (PARTITION BY ev.event_id
             |    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
             |  FROM ev LEFT JOIN orders o
             |  ON o.o_custkey = ev.user_id AND o.o_orderdate <= ev.ts)
             |SELECT event_id, user_id, o_orderkey AS last_orderkey,
             |round(o_totalprice, 2) AS last_price
             |FROM j WHERE rn = 1""".stripMargin)),

    // --- Batch twin of [[graft.streaming.FlushStream.dedupedStream]]:
    // keyed exact dedup keeping one canonical row per (user_id,
    // event_type). The canonical pick is min(event_id) — unique and
    // engine-independent, where a timestamp pick would tie-break on
    // sub-microsecond ns the oracle can't see. One hash aggregation
    // with map-side partials; at stream scale the same contract runs as
    // dropDuplicatesWithinWatermark with state bounded by the watermark.
    Q("e04_keyed_dedup",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "events")
          .groupBy($"user_id", $"event_type")
          .agg(min($"event_id").as("first_event"),
               count(lit(1)).as("n_dupes"))
      },
      Some("""SELECT user_id, event_type, min(event_id) AS first_event,
             |count(*) AS n_dupes
             |FROM events GROUP BY user_id, event_type""".stripMargin)),

    // --- Ordered, time-bounded funnel (view -> click-within-24h ->
    // purchase-within-24h): per user, the first view, the first click
    // inside 24 h strictly after it, the first purchase inside 24 h
    // strictly after that; emitted as per-stage user counts. Three
    // aggregations and two joins, ALL keyed on user_id — one logical
    // partitioning end to end, so a co-partitioned engine runs the
    // whole funnel without re-shuffling between stages; each stage's
    // input is filtered to one event type before it ever shuffles. The
    // exact ts_ns long keeps "strictly after" identical on both engines.
    Q("e07_funnel",
      (s, d) => {
        import s.implicits._
        val winNs = 86400L * 1000 * 1000 * 1000 // 24 h conversion window
        val ev = Tables.load(s, d, "events")
          .select($"user_id", $"event_type", $"ts_ns")
        val fv = ev.filter($"event_type" === "view")
          .groupBy($"user_id").agg(min($"ts_ns").as("fv"))
        val fc = ev.filter($"event_type" === "click").join(fv, "user_id")
          .filter($"ts_ns" > $"fv" && $"ts_ns" <= $"fv" + winNs)
          .groupBy($"user_id").agg(min($"ts_ns").as("fc"))
        val fp = ev.filter($"event_type" === "purchase").join(fc, "user_id")
          .filter($"ts_ns" > $"fc" && $"ts_ns" <= $"fc" + winNs)
          .groupBy($"user_id").agg(min($"ts_ns").as("fp"))
        fv.agg(count(lit(1)).as("users")).select(lit("1_view").as("stage"), $"users")
          .unionAll(fc.agg(count(lit(1)).as("users"))
            .select(lit("2_click").as("stage"), $"users"))
          .unionAll(fp.agg(count(lit(1)).as("users"))
            .select(lit("3_purchase").as("stage"), $"users"))
      },
      Some("""WITH fv AS (SELECT user_id, min(epoch_ns(ts)) AS fv FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |fc AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS fc FROM events e
             |  JOIN fv ON e.user_id = fv.user_id AND epoch_ns(e.ts) > fv.fv
             |    AND epoch_ns(e.ts) <= fv.fv + 86400000000000
             |  WHERE e.event_type = 'click' GROUP BY 1),
             |fp AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS fp FROM events e
             |  JOIN fc ON e.user_id = fc.user_id AND epoch_ns(e.ts) > fc.fc
             |    AND epoch_ns(e.ts) <= fc.fc + 86400000000000
             |  WHERE e.event_type = 'purchase' GROUP BY 1)
             |SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS users FROM fv
             |UNION ALL
             |SELECT '2_click' AS stage, CAST(count(*) AS BIGINT) AS users FROM fc
             |UNION ALL
             |SELECT '3_purchase' AS stage, CAST(count(*) AS BIGINT) AS users FROM fp""".stripMargin)),

    // --- Last-touch attribution: each purchase's revenue credited to
    // the user's most recent click/view at-or-before it, but only if
    // that touch landed within the 6 h attribution window — else the
    // purchase books as 'unattributed'. The per-purchase match is the
    // [[graft.operators.AsOf]] cogrouped MERGE (each side shuffles
    // once on user_id, two-pointer walk, output exactly |purchases| —
    // never the (purchase x earlier-touch) pair table the rank form
    // would materialize; at 100 TB a hot user's thousands of touches
    // cost a sort, not a blowup). The window cut runs AFTER the merge
    // on the single matched row — semantics identical to cutting
    // inside the match, because backward picks the LATEST touch and
    // any other in-window touch is no later. The oracle states the
    // declarative join-then-rank form; hash-equality proves the merge
    // implements it. Final rollup is |channels| rows.
    Q("e08_attribution",
      (s, d) => {
        import s.implicits._
        import graft.operators.AsOf
        val winNs = 6L * 3600 * 1000 * 1000 * 1000
        val ev = Tables.load(s, d, "events")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts_ns".as("lt"), $"value")
        val touches = ev.filter($"event_type".isin("click", "view"))
          .select($"user_id", $"event_id".as("touch_id"),
            $"event_type".as("touch_type"), $"ts_ns".as("rt"))
        AsOf.backward(purchases, touches, "user_id", "lt", "rt", "touch_id")
          .withColumn("channel",
            when($"rt".isNotNull && ($"lt" - $"rt") <= winNs, $"touch_type")
              .otherwise(lit("unattributed")))
          .groupBy($"channel")
          .agg(count(lit(1)).as("n_purchases"),
               round(sum($"value"), 2).as("revenue"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, epoch_ns(ts) AS lt, value
             |  FROM events WHERE event_type = 'purchase'),
             |t AS (SELECT user_id, event_id AS touch_id,
             |  event_type AS touch_type, epoch_ns(ts) AS rt
             |  FROM events WHERE event_type IN ('click', 'view')),
             |j AS (SELECT p.event_id, p.value, t.touch_type, t.rt, p.lt,
             |  row_number() OVER (PARTITION BY p.event_id
             |    ORDER BY t.rt DESC, t.touch_id DESC) AS rn
             |  FROM p LEFT JOIN t ON t.user_id = p.user_id AND t.rt <= p.lt),
             |a AS (SELECT CASE WHEN rt IS NOT NULL
             |    AND lt - rt <= 21600000000000
             |    THEN touch_type ELSE 'unattributed' END AS channel, value
             |  FROM j WHERE rn = 1)
             |SELECT channel, CAST(count(*) AS BIGINT) AS n_purchases,
             |  round(sum(value), 2) AS revenue
             |FROM a GROUP BY 1""".stripMargin)),

    // --- Weekly retention cohorts: cohort = ISO week of a user's
    // first event, activity = distinct (user, week), retention =
    // active users at each week offset / cohort size. Two aggregations
    // and one join, all keyed on user_id / cohort_week — the same
    // shuffle-key family as sessionize, no self-join, no global
    // window. The cohort SIZE needs no extra corpus pass: a user's
    // first-event week is by definition one of their active weeks, so
    // size = n_users at week_offset 0, lifted across the cohort by a
    // window over the |weeks|²-row matrix (the naive sizes-from-first
    // formulation planned a THIRD events aggregation — Catalyst does
    // not share the `first` subtree between two consumers).
    // Both engines truncate weeks to ISO Monday (Spark date_trunc and
    // DuckDB date_trunc agree), so offsets are exact multiples of 7.
    Q("e09_retention_cohorts",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.load(s, d, "events").select($"user_id", $"ts")
        val first = ev.groupBy($"user_id")
          .agg(to_date(date_trunc("week", min($"ts"))).as("cohort_week"))
        val weekly = ev
          .select($"user_id", to_date(date_trunc("week", $"ts")).as("week"))
          .distinct()
        val byCohort = Window.partitionBy($"cohort_week")
        weekly.join(first, Seq("user_id"))
          .withColumn("week_offset",
            (datediff($"week", $"cohort_week") / 7).cast("long"))
          .groupBy($"cohort_week", $"week_offset")
          .agg(count(lit(1)).as("n_users"))
          .withColumn("cohort_size",
            max(when($"week_offset" === 0, $"n_users")).over(byCohort))
          .select($"cohort_week", $"week_offset", $"n_users", $"cohort_size",
            round($"n_users" / $"cohort_size".cast("double"), 6)
              .as("retention"))
      },
      Some("""WITH f AS (SELECT user_id,
             |  CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
             |  FROM events GROUP BY user_id),
             |w AS (SELECT DISTINCT user_id,
             |  CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
             |a AS (SELECT f.cohort_week,
             |  CAST(date_diff('day', f.cohort_week, w.week) / 7 AS BIGINT)
             |    AS week_offset,
             |  CAST(count(*) AS BIGINT) AS n_users
             |  FROM w JOIN f USING (user_id) GROUP BY 1, 2)
             |SELECT cohort_week, week_offset, n_users,
             |  max(CASE WHEN week_offset = 0 THEN n_users END)
             |    OVER (PARTITION BY cohort_week) AS cohort_size,
             |  round(n_users / CAST(max(CASE WHEN week_offset = 0 THEN n_users END)
             |    OVER (PARTITION BY cohort_week) AS DOUBLE), 6) AS retention
             |FROM a""".stripMargin))
  )
}
