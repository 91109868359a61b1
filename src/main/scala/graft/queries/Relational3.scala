package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.RangeJoin

/** Relational parity, part 3: pivot, explode/lateral, binned range
  * join.
  */
object Relational3 extends QuerySet {

  val all: Seq[Q] = Seq(

    // --- Pivot: return-flag columns per line status.
    Q("q21_pivot",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "lineitem")
          .groupBy($"l_linestatus")
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(round(sum($"l_quantity"), 2))
      },
      Some("""SELECT l_linestatus,
             |round(sum(CASE WHEN l_returnflag='A' THEN l_quantity END),2) AS A,
             |round(sum(CASE WHEN l_returnflag='N' THEN l_quantity END),2) AS N,
             |round(sum(CASE WHEN l_returnflag='R' THEN l_quantity END),2) AS R
             |FROM lineitem GROUP BY l_linestatus""".stripMargin)),

    // --- Explode / lateral view: top-20 words across the corpus.
    Q("t06_word_explode",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .select(explode(filter(
            split(lower($"text"), "[^a-z0-9]+"), w => w =!= "")).as("word"))
          .groupBy($"word")
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"word".asc)
          .limit(20)
      },
      Some("""SELECT word, count(*) AS n FROM (
             |  SELECT unnest(list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS word
             |  FROM documents)
             |GROUP BY word ORDER BY n DESC, word ASC LIMIT 20""".stripMargin)),

    // --- Correlated scalar subquery (SQL surface): Catalyst
    // decorrelates it into the aggregate-join q17 builds by hand.
    Q("q23_correlated_subquery",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql("""SELECT round(sum(l_extendedprice), 2) AS small_qty_revenue,
                |count(*) AS n_lines
                |FROM lineitem l1
                |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
                |                    FROM lineitem l2
                |                    WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)
      },
      Some("""SELECT round(sum(l_extendedprice), 2) AS small_qty_revenue,
             |count(*) AS n_lines
             |FROM lineitem l1
             |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
             |                    FROM lineitem l2
             |                    WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)),

    // --- first_value/last_value over a full-partition frame.
    Q("q24_first_last_order",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.load(s, d, "orders")
          .select($"o_custkey",
            first($"o_orderkey").over(w).as("first_order"),
            last($"o_orderkey").over(w).as("last_order"),
            round(first($"o_totalprice").over(w), 2).as("first_price"))
          .distinct()
      },
      Some("""SELECT DISTINCT o_custkey,
             |first_value(o_orderkey) OVER w AS first_order,
             |last_value(o_orderkey) OVER w AS last_order,
             |round(first_value(o_totalprice) OVER w, 2) AS first_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin)),

    // --- Binned range join: orders of the same customer within 30 days
    // before each order (point-in-interval containment restored to an
    // equi join on day bins; see RangeJoin scaladoc).
    Q("q22_range_join",
      (s, d) => {
        import s.implicits._
        val base = lit("1995-01-01").cast("date")
        val o = Tables.load(s, d, "orders")
        val pts = o.select($"o_orderkey".as("pk"), $"o_custkey".as("pc"),
          datediff($"o_orderdate", base).cast("long").as("pday"))
        val ivs = o.select($"o_orderkey".as("ik"), $"o_custkey".as("ic"),
          (datediff($"o_orderdate", base).cast("long") - 30).as("lo"),
          datediff($"o_orderdate", base).cast("long").as("hi"))
        RangeJoin.pointInInterval(pts, ivs, col("pday"), col("lo"), col("hi"), 32L)
          .filter($"pc" === $"ic" && $"pk" =!= $"ik")
          .groupBy($"ik".as("o_orderkey"))
          .agg(count(lit(1)).as("n_prior_30d"))
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey,
             |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS day
             |  FROM orders)
             |SELECT i.o_orderkey, count(*) AS n_prior_30d
             |FROM o i JOIN o p ON p.o_custkey = i.o_custkey
             |  AND p.day BETWEEN i.day - 30 AND i.day
             |  AND p.o_orderkey <> i.o_orderkey
             |GROUP BY i.o_orderkey""".stripMargin))
  )
}
