package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** t27_dsir_rankcut stage attribution (guide §1): where the forced
  * PrefixSum rank-cut's extra ~2s over t25's TakeOrdered goes —
  * weights aggregation, narrow persist + approxQuantile, offsets
  * checkpoint, or the phase-3 window pass.
  */
object T27Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          starts.put(j.jobId, System.nanoTime())
          jobLog.add(f"job ${j.jobId}%4d START " +
            j.properties.getProperty("spark.job.description", ""))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.getOrDefault(j.jobId, System.nanoTime())
          jobLog.add(f"job ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        }
      })

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[t27prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.load(spark, sfDir, "documents")
    docs.count()

    // t25 form (TakeOrdered), then t27 form (viaRank), fresh each
    timed("t25_takeordered") {
      graft.operators.Curation.dsirSelect(docs, col("doc_id"), col("text"),
        col("source") === "src1", budget = 200)
        .queryExecution.toRdd.count()
    }
    graft.operators.Caches.release()
    jobLog.clear()
    timed("t27_viarank_cold") {
      graft.operators.Curation.dsirSelect(docs, col("doc_id"), col("text"),
        col("source") === "src1", budget = 200, viaRank = Some(true))
        .queryExecution.toRdd.count()
    }
    Thread.sleep(300)
    jobLog.forEach(s => println(s"[t27prof]   $s"))
    jobLog.clear()
    timed("t27_viarank_warm") {
      graft.operators.Curation.dsirSelect(docs, col("doc_id"), col("text"),
        col("source") === "src1", budget = 200, viaRank = Some(true))
        .queryExecution.toRdd.count()
    }
    Thread.sleep(300)
    jobLog.forEach(s => println(s"[t27prof]   $s"))
    spark.stop()
  }
}
