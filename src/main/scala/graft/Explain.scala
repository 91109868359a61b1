package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints `explain("formatted")` for the named
  * queries (or all). Usage:
  *   sbt "runMain graft.Explain <sfDir> [query ...]"
  * Greps worth running on the output: PushedFilters (scan pushdown),
  * ReadSchema (column pruning), BroadcastHashJoin vs SortMergeJoin,
  * WholeStageCodegen spans, Exchange count per plan.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val wanted = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (wanted.isEmpty || wanted.contains(name)) {
        println(s"\n===================== $name =====================")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
