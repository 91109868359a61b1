package graft

/** Smoke coverage: every registered query runs at sf0.001 and returns a
  * schema with at least one row-producing plan (full value correctness
  * is the driver's DuckDB gate; see tools/check.py).
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query is registered, runnable, and non-degenerate") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      // an empty result passes any oracle while testing nothing — a
      // degenerate filter (it happened: q10's first draft matched every
      // customer) must fail loudly here
      val n = fn(spark, sf0001).count()
      assert(n >= 1, s"$name returned 0 rows — degenerate query")
    }
  }

  test("no query silently plans a nested-loop/cartesian join") {
    // BNLJ/cartesian means a missing equi key — quadratic at scale. The
    // allowlist is the set where the nested loop IS the algorithm:
    //   q27: one-row global-threshold broadcast
    //   s01: brute-force kNN, the exact baseline (scan x broadcast queries)
    //   s04: nprobe ranking against 16 broadcast centroids
    val allow = Set("q27_important_parts", "s01_knn_bruteforce", "s04_knn_ivf")
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
      val bad = plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct")
      assert(allow(name) || !bad,
        s"$name plans a nested-loop/cartesian join:\n$plan")
    }
  }

  test("dedup/minhash operators are deterministic across runs") {
    val a = SparkEntry.queries("d02_minhash_lsh")(spark, sf0001).collect().toSet
    val b = SparkEntry.queries("d02_minhash_lsh")(spark, sf0001).collect().toSet
    assert(a == b)
  }
}
