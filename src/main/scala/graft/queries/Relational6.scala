package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Relational parity, part 6: the last two TPC-H join shapes —
  * Q21 (correlated EXISTS + NOT-EXISTS against the same fact table)
  * and Q22 (scalar-aggregate threshold + anti-join with substring
  * grouping). The testdata lacks `l_receiptdate`/`l_commitdate`/
  * `c_phone`, so the PREDICATES are restated on available columns
  * ("late" = shipped >90 days after order date; "country code" = the
  * last two digits of `c_name`) while the join/subquery structure is
  * kept exactly: that structure — semi + anti against the same table,
  * scalar threshold + anti — is what exercises the planner.
  */
object Relational6 extends QuerySet {

  val all: Seq[Q] = Seq(

    // --- Q21 shape: suppliers who were the ONLY late shipper of a
    // multi-supplier finalized order. One semi-join (another supplier
    // exists in the order) and one anti-join (no OTHER supplier was
    // late) against lineitem itself; both plan as hash joins on the
    // order key with the supplier inequality as a residual condition.
    Q("q36_waiting_suppliers",
      (s, d) => {
        import s.implicits._
        val oF = Tables.load(s, d, "orders")
          .filter($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_orderdate")
        val li = Tables.load(s, d, "lineitem")
          .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
        // late line rows of finalized orders (keeps row multiplicity:
        // numwait counts LINE ROWS, like Q21's count(*))
        val late = li.join(oF, $"l_orderkey" === $"o_orderkey")
          .filter($"l_shipdate" > date_add($"o_orderdate", 90))
          .select($"l_orderkey", $"l_suppkey")
        val others = li.select($"l_orderkey".as("o2"), $"l_suppkey".as("s2"))
        val lateOthers = late.select($"l_orderkey".as("o3"), $"l_suppkey".as("s3"))
        val sup = Tables.load(s, d, "supplier").select($"s_suppkey", $"s_name")
        late
          .join(others, $"o2" === $"l_orderkey" && $"s2" =!= $"l_suppkey",
            "left_semi")
          .join(lateOthers, $"o3" === $"l_orderkey" && $"s3" =!= $"l_suppkey",
            "left_anti")
          .join(sup, $"l_suppkey" === $"s_suppkey")
          .groupBy($"s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy($"numwait".desc, $"s_name") // s_name unique: total order
          .limit(100)
      },
      Some("""SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
             |FROM lineitem l1
             |JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
             |JOIN supplier ON s_suppkey = l1.l_suppkey
             |WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
             |GROUP BY s_name
             |ORDER BY numwait DESC, s_name
             |LIMIT 100""".stripMargin)),

    // --- Q22 shape: "wealthy customers with no urgent order" per
    // country code — balance above the positive-balance average
    // (scalar subquery) and an anti-join against a filtered orders
    // subset (every customer has SOME order in this testdata, so the
    // subset keeps the anti-join non-degenerate). The average
    // threshold is compared in EXACT integer arithmetic (cents x count
    // vs total cents): a float avg would flip boundary rows between
    // engines.
    Q("q37_global_sales_opportunity",
      (s, d) => {
        import s.implicits._
        val cust = Tables.load(s, d, "customer")
          .select($"c_custkey", expr("right(c_name, 2)").as("cntrycode"),
            round($"c_acctbal" * 100).cast("long").as("bal_c"))
        val thr = cust.filter($"bal_c" > 0)
          .agg(sum($"bal_c").as("tot_c"), count(lit(1)).as("cnt"))
          .withColumn("_k", lit(1))
        val urgent = Tables.load(s, d, "orders")
          .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
        cust.withColumn("_k", lit(1))
          .join(broadcast(thr), "_k") // one-row threshold: equi on a const
          .filter($"bal_c" * $"cnt" > $"tot_c")
          .join(urgent, $"o_custkey" === $"c_custkey", "left_anti")
          .groupBy($"cntrycode")
          .agg(count(lit(1)).as("numcust"), sum($"bal_c").as("totacctbal_c"))
      },
      Some("""SELECT right(c_name, 2) AS cntrycode,
             |  CAST(count(*) AS BIGINT) AS numcust,
             |  CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
             |FROM (SELECT c_custkey, c_name,
             |        CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
             |      FROM customer) c
             |CROSS JOIN (SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
             |                     AS BIGINT) AS tot_c,
             |                   CAST(count(*) AS BIGINT) AS cnt
             |            FROM customer WHERE round(c_acctbal * 100) > 0) t
             |WHERE bal_c * cnt > tot_c
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c.c_custkey
             |                    AND o_orderpriority = '1-URGENT')
             |GROUP BY 1""".stripMargin))
  )
}
