package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Relational parity queries over the TPC-H-ish star schema (SURVEY
  * §2.6-2.10: categories absent from the reference, supplied by Spark
  * built-ins). Each is a declarative DataFrame program — Catalyst gets
  * full freedom for pushdown/pruning/join selection. Broadcast policy:
  * explicit hints ONLY for fixed-cardinality dimensions (region: 5
  * rows, nation: 25 — size-independent of SF); every table that scales
  * with the data (customer, supplier, part, orders) is left to
  * AQE/CBO, which broadcasts when runtime stats allow and falls back
  * to shuffle joins at 100 TB where a forced hint would OOM.
  */
object Relational extends QuerySet {

  val all: Seq[Q] = Seq(

    // --- Aggregation: hash agg with partial (map-side) combine; the
    // grouping key is low-cardinality so pre-shuffle partials shrink the
    // exchange to ~6 rows per task regardless of input scale.
    Q("q01_pricing_summary",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "lineitem")
          .filter($"l_shipdate" <= lit("2001-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            round(sum($"l_quantity"), 2).as("sum_qty"),
            round(sum($"l_extendedprice"), 2).as("sum_base_price"),
            round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
            round(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 2).as("sum_charge"),
            round(avg($"l_quantity"), 4).as("avg_qty"),
            round(avg($"l_extendedprice"), 4).as("avg_price"),
            round(avg($"l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |round(sum(l_quantity),2) AS sum_qty,
             |round(sum(l_extendedprice),2) AS sum_base_price,
             |round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
             |round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
             |round(avg(l_quantity),4) AS avg_qty,
             |round(avg(l_extendedprice),4) AS avg_price,
             |round(avg(l_discount),4) AS avg_disc,
             |count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // --- 3-way join + agg + top-k. Customer filter is pushed to the
    // scan; join strategies left to AQE (the filtered sides broadcast
    // at small SF, shuffle at scale).
    Q("q03_top_orders",
      (s, d) => {
        import s.implicits._
        val cut = lit("1998-07-01").cast("timestamp")
        val c = Tables.load(s, d, "customer").filter($"c_mktsegment" === "BUILDING")
        val o = Tables.load(s, d, "orders").filter($"o_orderdate" < cut)
        val l = Tables.load(s, d, "lineitem").filter($"l_shipdate" > cut)
        l.join(o.join(c, $"o_custkey" === $"c_custkey"),
            $"l_orderkey" === $"o_orderkey")
          .groupBy($"l_orderkey", $"o_orderdate".cast("date").as("orderdate"), $"o_orderpriority")
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey".asc)
          .limit(10)
      },
      Some("""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority,
             |round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
             |FROM customer JOIN orders ON o_custkey = c_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |AND o_orderdate < TIMESTAMP '1998-07-01'
             |AND l_shipdate  > TIMESTAMP '1998-07-01'
             |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
             |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin)),

    // --- 6-way join through region->nation->(customer,supplier) with
    // the same-nation constraint; fixed-size dims (nation/region)
    // broadcast-hinted, scaling tables AQE-decided.
    //
    // r13 (solo sf10join 12.5 s / 10x -> the join-order fix): the
    // declarative chain put the ASIA restriction LAST, so without CBO
    // stats every fact shuffle ran on the full 60M rows and the 5/25
    // nation filter arrived after the work was done. The selective dim
    // now enters FIRST: nation x region(ASIA) is 5 rows, broadcast
    // into supplier (suppliers drop 5/25 and carry n_name), and THAT
    // broadcast prunes lineitem before the single orderkey shuffle.
    // orders joins customer on the broadcastable customer side, so the
    // same-nation test (c_nationkey = s_nationkey) rides the orderkey
    // join as a residual condition. One fact shuffle, on 1/5 of the
    // fact. Same result set, oracle unchanged.
    Q("q05_region_volume",
      (s, d) => {
        import s.implicits._
        val r = Tables.load(s, d, "region").filter($"r_name" === "ASIA")
        val n = Tables.load(s, d, "nation")
        val cJ = Tables.load(s, d, "customer")
          .select($"c_custkey", $"c_nationkey")
        val sup = Tables.load(s, d, "supplier")
          .select($"s_suppkey", $"s_nationkey")
        val o = Tables.load(s, d, "orders").select($"o_orderkey", $"o_custkey")
        val l = Tables.load(s, d, "lineitem")
          .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
        val asiaNations = n.join(broadcast(r), $"n_regionkey" === $"r_regionkey")
          .select($"n_nationkey", $"n_name")
        val asiaSup = sup.join(broadcast(asiaNations),
            $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"s_nationkey", $"n_name")
        // c_nationkey = s_nationkey and s_nationkey in ASIA together
        // imply c_nationkey in ASIA: pre-filtering customers by the
        // same 5-row broadcast shrinks the orders join 5x before the
        // fact sees it
        val asiaCust = cJ.join(broadcast(asiaNations.select($"n_nationkey")),
            $"c_nationkey" === $"n_nationkey")
          .select($"c_custkey", $"c_nationkey")
        val oc = o.join(asiaCust, $"o_custkey" === $"c_custkey")
          .select($"o_orderkey", $"c_nationkey")
        l.join(asiaSup, $"l_suppkey" === $"s_suppkey")
          .join(oc, $"l_orderkey" === $"o_orderkey" &&
            $"c_nationkey" === $"s_nationkey")
          .groupBy($"n_name")
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      },
      Some("""SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name""".stripMargin))
  )
}
