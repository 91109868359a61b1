package graft

import org.apache.spark.sql.SparkSession

/** One-off measurement-integrity probe: for each named query, time
  * `df.count()` (what Bench historically measured — Catalyst prunes
  * every column the final count doesn't need, so a projection-final
  * query can degenerate to a parquet row-count) against
  * `df.queryExecution.toRdd.count()` (materializes every output row
  * of the plan AS PLANNED — no pruning from the probe itself, no
  * driver collect). The delta is the cost count() was hiding.
  *
  * Usage: runMain graft.MatProbe <sfDir> <query ...>
  */
object MatProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warm once, then best-of-2 each
      fn(spark, sfDir).count()
      val c = (1 to 2).map(_ => timed(fn(spark, sfDir).count())).min
      val m = (1 to 2).map(_ =>
        timed(fn(spark, sfDir).queryExecution.toRdd.count())).min
      println(f"[mat] $n%-28s count() $c%6.2fs   toRdd.count() $m%6.2fs   hidden ${m / c}%4.1fx")
    }
    spark.stop()
  }
}
