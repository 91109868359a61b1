package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational parity, part 4 (round 2): the TPC-H decision-support
  * shapes not yet covered — min-over-group join-back (Q2), outer-join
  * distribution (Q13), global-fraction HAVING (Q11), conditional
  * aggregation (Q12), top-k revenue join (Q10) — plus
  * ntile/percent_rank/cume_dist windows.
  *
  * Scale notes: every query here is shuffle-minimal — aggregations are
  * partial+final on their natural keys, the Q2 shape reuses the
  * (partkey, suppkey) grouping for both levels (the second aggregate is
  * a narrow dependency of the first), the Q11 threshold is a 1-row
  * broadcast cross join (never a driver collect), and top-ks are
  * TakeOrderedAndProject (never a global sort).
  */
object Relational4 extends QuerySet {

  val all: Seq[Q] = Seq(

    // --- Q2 shape: cheapest supplier per small part (min over a group,
    // joined back to recover the argmin rows; unit costs are IEEE
    // division results, so cross-engine equality is exact).
    //
    // The `p_size < 15` part filter SEMI-JOINS lineitem BEFORE the
    // per-(partkey, suppkey) aggregation: both aggregation levels are
    // per-part, so rows of non-qualifying parts can never influence a
    // surviving group — filtering first is semantics-preserving and cuts
    // ~3.5x of aggregation input at TPC-H selectivity (the round-6
    // plan-audit finding; joining part in after the aggs made q25 the
    // worst 100x join-probe ratio). The semi join shuffles on
    // l_partkey when the key set is too big to broadcast — the same key
    // the aggregation clusters on, so Catalyst reuses the partitioning
    // and the filter costs no extra lineitem shuffle; at dimension-
    // fraction sizes AQE turns it into a broadcast instead.
    // r12: the per-part minimum is a WINDOW over the per-pair
    // aggregate, not a groupBy + join-back — the join form FORKS the
    // perPair subtree (the min branch prunes to (partkey, cost), the
    // probe branch keeps suppkey too), and the branches' differing
    // pruned columns defeat AQE stage reuse, so lineitem aggregated
    // twice (the same trap q36's rewrite hit; QueriesSpec pins both).
    // The window form has ONE consumer: lineitem aggregates once, the
    // window re-clusters the tiny per-(part,supplier) table by partkey
    // and takes a per-group min — no self-join, no second pass.
    Q("q25_min_cost_supplier",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val smallParts = Tables.load(s, d, "part")
          .filter($"p_size" < 15).select($"p_partkey")
        val perPair = Tables.load(s, d, "lineitem")
          .join(smallParts, $"l_partkey" === $"p_partkey", "left_semi")
          .select($"l_partkey", $"l_suppkey",
            ($"l_extendedprice" / $"l_quantity").as("unit"))
          .groupBy($"l_partkey", $"l_suppkey")
          .agg(min($"unit").as("unit_cost"))
        val supp = Tables.load(s, d, "supplier").select($"s_suppkey", $"s_name")
        perPair
          .withColumn("mc",
            min($"unit_cost").over(Window.partitionBy($"l_partkey")))
          .filter($"unit_cost" === $"mc")
          // no broadcast hint: supplier GROWS with scale factor (10k
          // rows/SF — not a fixed dim like nation/region), so the join
          // strategy stays AQE's size-adaptive call
          .join(supp, $"l_suppkey" === $"s_suppkey")
          .select($"l_partkey".as("p_partkey"), $"s_suppkey", $"s_name",
            round($"unit_cost", 4).as("unit_cost"))
          .orderBy(round($"unit_cost", 4).asc, $"p_partkey".asc, $"s_suppkey".asc)
          .limit(100)
      },
      Some("""WITH pc AS (SELECT l_partkey, l_suppkey,
             |    min(l_extendedprice / l_quantity) AS unit_cost
             |  FROM lineitem GROUP BY 1, 2),
             |m AS (SELECT l_partkey, min(unit_cost) AS mc FROM pc GROUP BY 1)
             |SELECT pc.l_partkey AS p_partkey, pc.l_suppkey AS s_suppkey,
             |  s.s_name, round(pc.unit_cost, 4) AS unit_cost
             |FROM pc JOIN m ON pc.l_partkey = m.l_partkey AND pc.unit_cost = m.mc
             |JOIN part p ON p.p_partkey = pc.l_partkey AND p.p_size < 15
             |JOIN supplier s ON s.s_suppkey = pc.l_suppkey
             |ORDER BY round(pc.unit_cost, 4) ASC, p_partkey ASC, s_suppkey ASC
             |LIMIT 100""".stripMargin)),

    // --- Q13 shape: customer order-count distribution through a left
    // outer join with an ON-clause filter (never a WHERE — that would
    // turn the outer join inner).
    Q("q26_customer_distribution",
      (s, d) => {
        import s.implicits._
        val o = Tables.load(s, d, "orders")
          .filter($"o_orderpriority" =!= "1-URGENT")
        val perCust = Tables.load(s, d, "customer")
          .join(o, $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("c_count"))
        perCust.groupBy($"c_count")
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey)
             |GROUP BY c_count""".stripMargin)),

    // --- Q11 shape: parts whose revenue exceeds a fraction of the
    // global total. The threshold is a one-row aggregate broadcast into
    // a cross join — no driver collect; both the per-part sums and the
    // threshold are rounded before comparison so parallel-summation ulp
    // noise cannot flip boundary rows.
    Q("q27_important_parts",
      (s, d) => {
        import s.implicits._
        val li = Tables.load(s, d, "lineitem")
          .select($"l_partkey",
            ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("v"))
        val byPart = li.groupBy($"l_partkey").agg(sum($"v").as("raw"))
        val thresh = li.agg(round(sum($"v") * 0.0005, 2).as("thresh"))
        byPart.crossJoin(broadcast(thresh))
          .filter(round($"raw", 2) > $"thresh")
          .select($"l_partkey", round($"raw", 2).as("val"))
      },
      Some("""SELECT l_partkey,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS val
             |FROM lineitem GROUP BY l_partkey
             |HAVING round(sum(l_extendedprice * (1.0 - l_discount)), 2) >
             |  (SELECT round(sum(l_extendedprice * (1.0 - l_discount)) * 0.0005, 2)
             |   FROM lineitem)""".stripMargin)),

    // --- Q12 shape: conditional aggregation (CASE inside SUM) over an
    // order-lineitem join.
    Q("q28_priority_lines",
      (s, d) => {
        import s.implicits._
        val hi = Seq("1-URGENT", "2-HIGH")
        Tables.load(s, d, "orders")
          .join(Tables.load(s, d, "lineitem"),
            $"o_orderkey" === $"l_orderkey")
          .filter($"l_shipdate" >= $"o_orderdate")
          .groupBy($"l_linestatus")
          .agg(
            sum(when($"o_orderpriority".isin(hi: _*), 1).otherwise(0))
              .as("high_line_count"),
            sum(when(!$"o_orderpriority".isin(hi: _*), 1).otherwise(0))
              .as("low_line_count"))
      },
      Some("""SELECT l_linestatus,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_shipdate >= o_orderdate
             |GROUP BY l_linestatus""".stripMargin)),

    // --- Q10 shape: top returned-revenue customers; rank on the ROUNDED
    // revenue with the unique custkey tiebreak so the top-20 cut is
    // cross-engine deterministic.
    Q("q29_returned_revenue",
      (s, d) => {
        import s.implicits._
        val li = Tables.load(s, d, "lineitem")
          .filter($"l_returnflag" === "R")
          .select($"l_orderkey",
            ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
        Tables.load(s, d, "customer")
          .join(Tables.load(s, d, "orders"), $"c_custkey" === $"o_custkey")
          .join(li, $"o_orderkey" === $"l_orderkey")
          .groupBy($"c_custkey", $"c_name")
          .agg(round(sum($"rev"), 2).as("revenue"))
          .orderBy($"revenue".desc, $"c_custkey".asc)
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_returnflag = 'R'
             |GROUP BY c_custkey, c_name
             |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin)),

    // --- ntile / percent_rank / cume_dist distribution windows (the
    // analytic trio q02/q12/q16/q24 don't cover). Rank outputs cast to
    // long (Spark emits int32, DuckDB BIGINT); the acctbal order carries
    // the unique custkey tiebreak.
    Q("q30_acctbal_deciles",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"c_mktsegment")
          .orderBy($"c_acctbal".asc, $"c_custkey".asc)
        Tables.load(s, d, "customer")
          .select($"c_custkey", $"c_mktsegment",
            ntile(10).over(w).cast("long").as("decile"),
            round(percent_rank().over(w), 6).as("pct_rank"),
            round(cume_dist().over(w), 6).as("cume"))
      },
      Some("""SELECT c_custkey, c_mktsegment,
             |  ntile(10) OVER w AS decile,
             |  round(percent_rank() OVER w, 6) AS pct_rank,
             |  round(cume_dist() OVER w, 6) AS cume
             |FROM customer
             |WINDOW w AS (PARTITION BY c_mktsegment
             |  ORDER BY c_acctbal ASC, c_custkey ASC)""".stripMargin)),

    // --- JSON scalar functions (§2 scalar-function family): extract a
    // typed field from the events.props JSON payload and aggregate.
    // get_json_object is codegen'd path extraction — no UDF, no
    // whole-document parse.
    Q("q31_json_extract",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "events")
          .select($"event_type",
            get_json_object($"props", "$.k").cast("long").as("k"))
          .groupBy($"event_type")
          .agg(count($"k").as("n_with_k"),
               sum($"k").as("sum_k"),
               round(avg($"k"), 4).as("avg_k"),
               min($"k").as("min_k"),
               max($"k").as("max_k"))
      },
      Some("""SELECT event_type,
             |  count(CAST(props ->> '$.k' AS BIGINT)) AS n_with_k,
             |  CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k,
             |  round(avg(CAST(props ->> '$.k' AS BIGINT)), 4) AS avg_k,
             |  min(CAST(props ->> '$.k' AS BIGINT)) AS min_k,
             |  max(CAST(props ->> '$.k' AS BIGINT)) AS max_k
             |FROM events GROUP BY event_type""".stripMargin)),

    // --- Correlated LATERAL subquery with per-row ORDER BY + LIMIT
    // (top-2 orders per customer). Catalyst decorrelates the lateral
    // into a rank-filtered join; the SQL surface is what's exercised.
    Q("q32_lateral_topn",
      (s, d) => {
        // Per-customer top-2 orders by price — the LATERAL-limit shape.
        // NOT spark.sql LATERAL: Spark 4.1 decorrelates
        //   `customer, LATERAL (... ORDER BY price LIMIT 2)`
        // into a GLOBAL range-partitioned sort of the whole orders
        // table (Exchange rangepartitioning(o_totalprice DESC, ...))
        // before re-hashing by o_custkey — two shuffles, one of them a
        // total order over the fact table, measured 7.5x at the 100x
        // probe. The rank-filter form below is the plan the semantics
        // deserve: ONE hash shuffle on o_custkey with an in-partition
        // sort, window rank <= 2, then a broadcast join to customers.
        // The oracle keeps the LATERAL SQL — same semantics, and
        // hash-equality proves the rewrite.
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        val topn = Tables.load(s, d, "orders")
          .select($"o_custkey", $"o_orderkey", $"o_totalprice")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 2)
        Tables.load(s, d, "customer").select($"c_custkey")
          .join(topn, $"c_custkey" === $"o_custkey")
          .select($"c_custkey", $"o_orderkey",
            round($"o_totalprice", 2).as("top_price"))
      },
      Some("""SELECT c_custkey, o.o_orderkey, o.top_price FROM customer,
             |LATERAL (SELECT o_orderkey, round(o_totalprice, 2) AS top_price
             |         FROM orders WHERE o_custkey = c_custkey
             |         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o""".stripMargin))
  )
}
