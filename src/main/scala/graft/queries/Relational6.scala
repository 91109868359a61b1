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
    // multi-supplier finalized order. The EXISTS/NOT-EXISTS pair is
    // rewritten to per-order supplier stats (r12, the q25 recipe):
    //   EXISTS another supplier        <=> distinct suppliers >= 2
    //   NOT EXISTS another LATE suppl. <=> distinct LATE suppliers = 1
    //     (the probed row is itself late, so it is in that set)
    // — equivalences that hold row-for-row, so numwait's line-row
    // multiplicity is preserved and the oracle hash is unchanged.
    // Scale shape: the old form probed the FULL lineitem twice (semi +
    // anti, each its own fact-sized shuffle). Now lineitem shuffles
    // ONCE (the orders join) and the per-order supplier counts are
    // WINDOW aggregates over that same orderkey partitioning — a
    // single consumer of a single fact subtree, so there is no twin
    // scan for canonicalization to miss, and the window needs a sort
    // but no exchange. (A groupBy-then-rejoin form was tried first: it
    // forks the fact subtree, and the branches' differing pushed
    // filters/pruned columns defeat AQE stage reuse — lineitem
    // shuffled twice anyway. QueriesSpec pins the exchange count so
    // the regression can't sneak back.) The window buffers one ORDER's
    // line rows at a time — bounded by lines-per-order (7 here; small
    // in any sane schema), never by the corpus.
    Q("q36_waiting_suppliers",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val oF = Tables.load(s, d, "orders")
          .filter($"o_orderstatus" === "F")
          .select($"o_orderkey", $"o_orderdate")
        val li = Tables.load(s, d, "lineitem")
          .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
        // finalized-order line rows with their lateness flag: the ONE
        // fact-table shuffle in the query
        val liF = li.join(oF, $"l_orderkey" === $"o_orderkey")
          .select($"l_orderkey", $"l_suppkey",
            ($"l_shipdate" > date_add($"o_orderdate", 90)).as("is_late"))
        val w = Window.partitionBy($"l_orderkey")
        val sup = Tables.load(s, d, "supplier").select($"s_suppkey", $"s_name")
        liF
          .withColumn("n_sup", size(collect_set($"l_suppkey").over(w)))
          .withColumn("n_late_sup",
            size(collect_set(when($"is_late", $"l_suppkey")).over(w)))
          .filter($"is_late" && $"n_sup" >= 2 && $"n_late_sup" === 1)
          // explicit broadcast: supplier is the dim side; a shuffle join
          // here would re-partition the surviving fact rows by suppkey
          .join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
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
