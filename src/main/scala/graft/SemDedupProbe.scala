package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup cell-dial probe over the 100x dedup corpus
  * (`benchdata/sf10` — 100 id-shifted exact copies of the sf0.1
  * embeddings, 200k vectors): the fixed registered dial (nCells = 8,
  * the oracle-matched gate setting) against the auto dial
  * (nCells = 0 ⇒ ceil(sqrt(N)) — the production setting). The claim
  * measured: Σ|cell|² — the pair stage's work term — flattens from
  * ~N²/k to ~N^1.5, and the wall follows. Exact copies always share a
  * cell (assignment is a pure function of the vector), so the
  * fixture's 10,000x duplicate-pair multiplicity survives either dial
  * — the dial changes which ORGANIC cross-document pairs are
  * considered, exactly the paper's k ≈ sqrt(N) recall/cost trade.
  *
  * Solo fresh-JVM walls, best-of-`reps`; Caches.release() between reps
  * so every wall pays its own training and pair pass. Writes
  * BENCH_semdedup_probe.json; last stdout line is the JSON.
  */
object SemDedupProbe {

  private def f2(d: Double) = math.round(d * 100.0) / 100.0

  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.length > 0) args(0) else "/root/repo/benchdata/sf10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-semdedup-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Caches, Dedup, Similarity}

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = e.count()

    def settle(): Unit = {
      val t0 = System.nanoTime()
      def load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      while (load > 4.0 && (System.nanoTime() - t0) / 1e9 < 120)
        Thread.sleep(5000)
    }

    // cell-occupancy stats for a dial: sum|cell|^2 is the pair-stage
    // work term the probe is about; computed from one assignment pass
    def cellStats(k: Int): (Long, Long, Double) = {
      val cents = Similarity.trainedCached(
        e.toDF("vec_id", "v"), k, 2, 64, "kcenter")
      val occ = e.withColumn("cell",
          graft.expressions.NativeFns.nearest_centroid(col("embedding"), cents))
        .groupBy("cell").agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * col("n")), max(col("n")), count(lit(1)))
        .collect()(0)
      (occ.getLong(0), occ.getLong(1), occ.getLong(2).toDouble)
    }

    val reps = sys.env.getOrElse("SPARK_GRAFT_SEMDEDUP_REPS", "2").toInt
    def timedKept(nCells: Int): (Double, Long) = {
      val walls = (0 until reps).map { _ =>
        Caches.release()
        settle()
        val t0 = System.nanoTime()
        val kept = Dedup.semDedup(e, col("vec_id"), col("embedding"),
            nCells = nCells, iters = 2, dim = 64, tau = 0.3,
            seedMode = "kcenter")
          .filter(col("kept")).count()
        ((System.nanoTime() - t0) / 1e9, kept)
      }
      (walls.map(_._1).min, walls.head._2)
    }

    val kAuto = math.ceil(math.sqrt(n.toDouble)).toInt
    val (tFixed, keptFixed) = timedKept(8)
    val (sq8, max8, nc8) = cellStats(8)
    Caches.release()
    val (tAuto, keptAuto) = timedKept(0)
    val (sqA, maxA, ncA) = cellStats(kAuto)

    val json =
      s"""{"metric":"semdedup_probe","sf":"$sfDir","n":$n,""" +
      s""""fixed":{"n_cells":8,"sec":${f2(tFixed)},"kept":$keptFixed,""" +
      s""""sum_cell_sq":$sq8,"max_cell":$max8,"cells_used":${nc8.toLong}},""" +
      s""""auto":{"n_cells":$kAuto,"sec":${f2(tAuto)},"kept":$keptAuto,""" +
      s""""sum_cell_sq":$sqA,"max_cell":$maxA,"cells_used":${ncA.toLong}},""" +
      s""""pair_work_ratio":${f2(sq8.toDouble / math.max(1L, sqA))},""" +
      s""""wall_ratio":${f2(tFixed / tAuto)}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_semdedup_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
