package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Relational parity, part 7: the final two TPC-H join shapes missing
  * from the inventory — Q16 (NOT IN null-aware anti-join + multi-key
  * COUNT DISTINCT) and Q20 (chained IN subqueries with an aggregated
  * threshold). The testdata has no `partsupp`, so `lineitem` plays the
  * part-supplier bridge and the Q20 "excess availability" predicate is
  * restated as supplier dominance (shipped more than 10% of a part's
  * total quantity — this generator spreads parts across suppliers, max
  * share ~25%); the SUBQUERY STRUCTURE — what exercises the planner —
  * is kept exactly.
  *
  * Both are written as SQL over per-query temp views: `NOT IN
  * (subquery)` and `IN (subquery)` have no DataFrame-API spelling, and
  * the point of q38 is the null-aware anti-join plan itself.
  */
object Relational7 extends QuerySet {

  val all: Seq[Q] = Seq(

    // --- Q16 shape: supplier diversity per part group, excluding a
    // NOT-IN supplier subquery. With the default
    // spark.sql.optimizer.nullAwareAntiJoin the NOT IN plans as a
    // null-aware BroadcastHashJoin (NAAJ), not a nested loop; the
    // exclusion set (negative-balance suppliers) must stay
    // broadcast-able, which holds at any SF here because it is a fixed
    // fraction of the ALREADY dimension-sized supplier table. A
    // provably-null-free column would let the optimizer degrade to a
    // plain anti hash join — parquet columns are nullable, so the
    // null-aware form is what a real lake hits.
    Q("q38_parts_supplier_counts",
      (s, d) => {
        Tables.load(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"))
          .createOrReplaceTempView("q38_lineitem")
        Tables.load(s, d, "part").createOrReplaceTempView("q38_part")
        Tables.load(s, d, "supplier").createOrReplaceTempView("q38_supplier")
        s.sql("""
          SELECT p_brand, p_type, p_size,
                 CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
          FROM q38_lineitem
          JOIN q38_part ON p_partkey = l_partkey
          WHERE p_brand <> 'Brand#5'
            AND p_type <> 'ECONOMY'
            AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
            AND l_suppkey NOT IN (SELECT s_suppkey FROM q38_supplier
                                  WHERE s_acctbal < 0)
          GROUP BY p_brand, p_type, p_size""")
      },
      Some("""SELECT p_brand, p_type, p_size,
             |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#5'
             |  AND p_type <> 'ECONOMY'
             |  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
             |                        WHERE s_acctbal < 0)
             |GROUP BY p_brand, p_type, p_size""".stripMargin)),

    // --- Q20 shape: suppliers reached through TWO chained IN
    // subqueries (supplier <- dominant shipments <- name-filtered
    // parts), the inner one carrying a grouped aggregate threshold.
    // Catalyst decorrelates both INs to semi joins; the threshold
    // ("supplier shipped more than 10% of the part's total" — this
    // data spreads each part over many suppliers, max share ~25%)
    // compares EXACT integer quantities (l_quantity is integer-valued
    // here) so no float boundary can flip a supplier between engines.
    // Everything shuffles on part/supplier keys — no driver-side set
    // materialization at any SF.
    Q("q39_dominant_suppliers",
      (s, d) => {
        Tables.load(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast("long").as("qty"))
          .createOrReplaceTempView("q39_lineitem")
        Tables.load(s, d, "part").createOrReplaceTempView("q39_part")
        Tables.load(s, d, "supplier").createOrReplaceTempView("q39_supplier")
        s.sql("""
          SELECT s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
          FROM q39_supplier
          WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM q39_lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM q39_part
                                WHERE p_name LIKE 'red%')
            GROUP BY l_partkey, l_suppkey
            HAVING sum(qty) * 10 > (SELECT sum(qty) FROM q39_lineitem i
                                   WHERE i.l_partkey = q39_lineitem.l_partkey))""")
      },
      Some("""SELECT s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
             |FROM supplier
             |WHERE s_suppkey IN (
             |  SELECT l_suppkey
             |  FROM (SELECT l_partkey, l_suppkey,
             |          CAST(l_quantity AS BIGINT) AS qty FROM lineitem) l
             |  WHERE l_partkey IN (SELECT p_partkey FROM part
             |                      WHERE p_name LIKE 'red%')
             |  GROUP BY l_partkey, l_suppkey
             |  HAVING sum(qty) * 10 > (SELECT CAST(sum(CAST(l_quantity AS BIGINT))
             |                                AS BIGINT) FROM lineitem i
             |                         WHERE i.l_partkey = l.l_partkey))""".stripMargin))
  )
}
