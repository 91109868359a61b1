package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** p05/p06 reset-wall attribution (guide §1): the gate's exact
  * incrementalRun shape — budget/cut scalar collects, bootstrap (60%
  * of docs, with split), one incremental day (40%) — timed piecewise,
  * fresh caches, so the reset regime's dominant 15s cost is located
  * before anything is changed. Run twice in one JVM: pass 2 separates
  * JIT/codegen warm-up from structural cost.
  */
object P05Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Caches, CorpusPipeline, IncrementalPipeline}

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[p05prof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to 2).foreach { pass =>
      println(s"[p05prof] ---- pass $pass ----")
      Caches.release()
      val docs = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val budget = timed("budget_collect") {
        docs.dropDuplicates("text")
          .agg(sum(size(graft.functions.TextFns.tokens(col("text")))))
          .collect()(0).getLong(0) * 6 / 10 / 4
      }
      val cut = timed("cut_collect") {
        docs.agg(max(col("doc_id"))).collect()(0).getLong(0) * 3 / 5
      }
      val bench = col("doc_id") % 101 === 0
      val dir = java.nio.file.Files.createTempDirectory("graft-p05prof")
        .toFile.getAbsolutePath
      timed("bootstrap_60pct") {
        IncrementalPipeline.bootstrap(dir, docs.filter(col("doc_id") <= cut),
          bench, IncrementalPipeline.Params(budget,
            split = Some(CorpusPipeline.SplitCfg())))
          .queryExecution.toRdd.count()
      }
      timed("incremental_day_40pct") {
        IncrementalPipeline.runIncremental(dir,
          docs.filter(col("doc_id") > cut), bench)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
