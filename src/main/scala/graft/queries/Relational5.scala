package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Relational parity, part 5: the remaining TPC-H multi-join
  * aggregation shapes — nation-pair volume (Q7), market share (Q8),
  * and product-profit-by-nation-year (Q9). All are star joins whose
  * dimension arms (nation, region) broadcast; the fact-side
  * aggregations keep map-side partials on low-cardinality keys.
  */
object Relational5 extends QuerySet {

  val all: Seq[Q] = Seq(

    // --- Q7 shape: revenue shipped between two specific nations, per
    // (supplier nation, customer nation, year) in either direction.
    Q("q33_nation_volume",
      (s, d) => {
        import s.implicits._
        val li = Tables.load(s, d, "lineitem")
          .select($"l_orderkey", $"l_suppkey", year($"l_shipdate").as("l_year"),
            // exact cents per row: with ~600 pair-year groups, float sums
            // reliably hit .005 boundaries where the engines' round(x,2)
            // disagree (same lesson as q35)
            round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
              .cast("long").as("volume_c"))
        val o = Tables.load(s, d, "orders").select($"o_orderkey", $"o_custkey")
        val c = Tables.load(s, d, "customer").select($"c_custkey", $"c_nationkey")
        val sup = Tables.load(s, d, "supplier").select($"s_suppkey", $"s_nationkey")
        val n1 = Tables.load(s, d, "nation")
          .select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))
        val n2 = Tables.load(s, d, "nation")
          .select($"n_nationkey".as("ck"), $"n_name".as("cust_nation"))
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .join(sup, $"l_suppkey" === $"s_suppkey")
          .join(broadcast(n1), $"s_nationkey" === $"sk")
          .join(broadcast(n2), $"c_nationkey" === $"ck")
          // cross-border only (any pair): a specific nation pair is empty
          // at sf0.001 and would gut the oracle to a trivial 0-row match
          .filter($"supp_nation" =!= $"cust_nation")
          .groupBy($"supp_nation", $"cust_nation", $"l_year")
          .agg(sum($"volume_c").as("revenue_cents"))
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
             |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
             |    AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM lineitem
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |JOIN supplier ON s_suppkey = l_suppkey
             |JOIN nation n1 ON n1.n_nationkey = s_nationkey
             |JOIN nation n2 ON n2.n_nationkey = c_nationkey
             |WHERE n1.n_name <> n2.n_name
             |GROUP BY 1, 2, 3""".stripMargin)),

    // --- Q8 shape: one nation's share of regional revenue per year —
    // a conditional-sum fraction over the full star join.
    Q("q34_market_share",
      (s, d) => {
        import s.implicits._
        val li = Tables.load(s, d, "lineitem")
          .select($"l_orderkey", $"l_suppkey",
            round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
              .cast("long").as("volume_c"))
        val o = Tables.load(s, d, "orders")
          .select($"o_orderkey", $"o_custkey", year($"o_orderdate").as("o_year"))
        val c = Tables.load(s, d, "customer").select($"c_custkey", $"c_nationkey")
        val sup = Tables.load(s, d, "supplier").select($"s_suppkey", $"s_nationkey")
        val cn = Tables.load(s, d, "nation")
          .select($"n_nationkey".as("ck"), $"n_regionkey".as("c_region"))
        val sn = Tables.load(s, d, "nation")
          .select($"n_nationkey".as("sk"), $"n_name".as("supp_nation"))
        val r = Tables.load(s, d, "region")
          .filter($"r_name" === "ASIA").select($"r_regionkey")
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .join(broadcast(cn), $"c_nationkey" === $"ck")
          .join(broadcast(r), $"c_region" === $"r_regionkey")
          .join(sup, $"l_suppkey" === $"s_suppkey")
          .join(broadcast(sn), $"s_nationkey" === $"sk")
          .groupBy($"o_year")
          // parts-per-million by integer floor division over exact cent
          // sums (both positive): no float round anywhere in the output
          .agg(sum(when($"supp_nation" === "NATION_3", $"volume_c")
                 .otherwise(0L)).as("nat_c"),
               sum($"volume_c").as("tot_c"))
          .select($"o_year",
            expr("(nat_c * 1000000) div tot_c").as("mkt_share_ppm"))
      },
      Some("""SELECT o_year, (nat_c * 1000000) // tot_c AS mkt_share_ppm
             |FROM (
             |SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |  CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
             |      THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
             |      ELSE 0 END) AS BIGINT) AS nat_c,
             |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
             |    AS BIGINT)) AS BIGINT) AS tot_c
             |FROM lineitem
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |JOIN nation cn ON cn.n_nationkey = c_nationkey
             |JOIN region ON r_regionkey = cn.n_regionkey AND r_name = 'ASIA'
             |JOIN supplier ON s_suppkey = l_suppkey
             |JOIN nation sn ON sn.n_nationkey = s_nationkey
             |GROUP BY 1)""".stripMargin)),

    // --- Q9 shape: profit (revenue minus a part-cost proxy) by
    // supplier nation and year, for parts matching a name pattern.
    Q("q35_product_profit",
      (s, d) => {
        import s.implicits._
        val li = Tables.load(s, d, "lineitem")
          .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity",
            ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("gross"))
        val p = Tables.load(s, d, "part")
          .filter($"p_name".like("%widget%"))
          .select($"p_partkey", $"p_retailprice")
        val o = Tables.load(s, d, "orders")
          .select($"o_orderkey", year($"o_orderdate").as("o_year"))
        val sup = Tables.load(s, d, "supplier").select($"s_suppkey", $"s_nationkey")
        val n = Tables.load(s, d, "nation")
          .select($"n_nationkey", $"n_name".as("nation"))
        li.join(p, $"l_partkey" === $"p_partkey")
          .join(o, $"l_orderkey" === $"o_orderkey")
          .join(sup, $"l_suppkey" === $"s_suppkey")
          .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
          // exact integer ten-thousandths: the profit SUBTRACTION makes
          // sums land on .005 rounding boundaries where parallel-vs-
          // sequential ulp noise flips the last cent (observed at
          // sf0.01); per-row rounding to a long and an exact long sum
          // remove the float path entirely
          .withColumn("profit_dm",
            round($"gross" * 10000 - $"p_retailprice" * lit(0.1) * $"l_quantity" * 10000)
              .cast("long"))
          .groupBy($"nation", $"o_year")
          .agg(sum($"profit_dm").as("dm"))
          // cents by integer half-away division — the engines' round(x,2)
          // disagree at .xx5 double boundaries, so no float ever touches
          // the output
          .select($"nation", $"o_year",
            (signum($"dm").cast("long") *
              expr("(abs(dm) + 50) div 100")).cast("long").as("sum_profit_cents"))
      },
      Some("""SELECT nation, o_year,
             |  CAST((CASE WHEN s < 0 THEN -1 WHEN s > 0 THEN 1 ELSE 0 END)
             |    * ((abs(s) + 50) // 100) AS BIGINT) AS sum_profit_cents
             |FROM (
             |  SELECT n.n_name AS nation,
             |    CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |    CAST(sum(CAST(round(
             |      l_extendedprice * (1.0 - l_discount) * 10000
             |      - p_retailprice * 0.1 * l_quantity * 10000) AS BIGINT)) AS BIGINT) AS s
             |  FROM lineitem
             |  JOIN part ON p_partkey = l_partkey AND p_name LIKE '%widget%'
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN nation n ON n.n_nationkey = s_nationkey
             |  GROUP BY 1, 2)""".stripMargin))
  )
}
