package graft

/** Smoke coverage: every registered query runs at sf0.001 and returns a
  * schema with at least one row-producing plan (full value correctness
  * is the driver's DuckDB gate; see tools/check.py).
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query with an oracle is registered and runnable") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("dedup/minhash operators are deterministic across runs") {
    val a = SparkEntry.queries("d02_minhash_lsh")(spark, sf0001).collect().toSet
    val b = SparkEntry.queries("d02_minhash_lsh")(spark, sf0001).collect().toSet
    assert(a == b)
  }
}
