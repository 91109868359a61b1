package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** d11_semdedup stage attribution at sf0.1 (guide §1: measure first).
  * The gate fixture is tiny (2000 vectors × dim 64), so the 5.2 s solo
  * wall is plan/round-trip overhead, not arithmetic — this probe says
  * WHERE: training (cached vs cold), pair scoring, connected
  * components, final join. Solo walls, one JVM, stages timed in
  * dependency order so each wall owns only its increment.
  */
object D11Prof {
  private def f2(d: Double) = math.round(d * 1000.0) / 1000.0

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
    import graft.operators.{Dedup, Similarity}

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    e.count() // warm footers
    spark.range(1000000).selectExpr("sum(id)").collect()

    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[d11prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // per-job wall visibility: which driver round-trips own the time
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(j.jobId, System.nanoTime())
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.getOrDefault(j.jobId, System.nanoTime())
          jobLog.add(f"job ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        }
      })

    val base = e.select(col("vec_id"), col("embedding").as("v"))
    // 1. training, cold then cached
    val cents = timed("train_cold (k=8,iters=2)") {
      Similarity.trainIvfCentroids(base, 8, 2, 64, "kcenter")
    }
    timed("train_cached") {
      Similarity.trainedCached(base, 8, 2, 64, "kcenter")
    }
    val assigned = base.withColumn("cell",
      graft.expressions.NativeFns.nearest_centroid(col("v"), cents))
    // 2. assignment alone
    timed("assign_only") {
      assigned.queryExecution.toRdd.count()
    }
    // 3. pair scoring
    val pairs = Dedup.embeddingPairs(assigned, col("vec_id"), col("v"),
      col("cell"), minCos = 0.3, cellCap = 1024)
    val nPairs = timed("pairs_materialize") {
      pairs.queryExecution.toRdd.count()
    }
    println(s"[d11prof] pairs = $nPairs")
    // 4. connected components over the pair graph (includes its own
    //    driver-coordinated rounds) + materialize
    jobLog.clear()
    val comps = timed("clusters_construct") {
      Dedup.clusters(pairs, col("id_a"), col("id_b"))
    }
    Thread.sleep(500)
    jobLog.forEach(s => println(s"[d11prof]   $s"))
    timed("clusters_materialize") {
      comps.queryExecution.toRdd.count()
    }
    // 5. full d11 end-to-end (warm memo: centroids cached)
    timed("semdedup_e2e_warm") {
      Dedup.semDedup(e, col("vec_id"), col("embedding"),
        nCells = 8, iters = 2, dim = 64, tau = 0.3, seedMode = "kcenter")
        .queryExecution.toRdd.count()
    }
    timed("semdedup_e2e_warm2") {
      Dedup.semDedup(e, col("vec_id"), col("embedding"),
        nCells = 8, iters = 2, dim = 64, tau = 0.3, seedMode = "kcenter")
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
