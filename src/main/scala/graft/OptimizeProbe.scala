package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Compactor

/** Parquet-lake OPTIMIZE probe: the op's reason to exist is file-count
  * pressure (a streaming sink or frequent small batches leave
  * thousands of KB-scale part files per partition; scan cost becomes
  * per-FILE), so the probe builds exactly that shape and measures the
  * rewrite end to end.
  *
  * Phases (one JVM):
  *   1. `build_sec`     — fragment sf1 lineitem (6M rows, ~110 MB
  *                        encoded) into a lake partitioned by
  *                        l_returnflag with ~2,000 part files per
  *                        partition directory (~6,000 files total,
  *                        KB-scale) — the streaming-sink residue shape.
  *   2. `scan_frag_sec` — full-scan aggregate over the FRAGMENTED lake
  *                        (the pain the pass exists to remove).
  *   3. `optimize_sec`  — [[Compactor.optimizeParquet]] at 128 MiB
  *                        target: listing-only planning + one row
  *                        shuffle. The headline number.
  *   4. `scan_opt_sec`  — the same full-scan aggregate over the
  *                        optimized lake; with target >= partition
  *                        bytes this is one file per partition dir.
  *
  * Row preservation is asserted (count + checksum of a value column),
  * not just reported.
  *
  * Usage: runMain graft.OptimizeProbe <sf1Dir> [dupFactor] [nFragFiles]
  * — `dupFactor` unions the source that many times before fragmenting
  * (dupFactor 20 x sf1 lineitem ≈ 2.2 GB encoded, the ≥2 GB volume
  * the r10 verdict asked for: at 194 MB the probe was orchestration-
  * bound and proved nothing about the row-shuffle's scaling) and
  * `nFragFiles` sets the fragment count.
  */
object OptimizeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/repo/benchdata/sf1"
    val dupFactor = if (args.length > 1) args(1).toInt else 1
    val nFragFiles = if (args.length > 2) args(2).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-optimize-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-opt-probe")
    val fragDir = s"$root/frag"
    val optDir = s"$root/opt"

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // dupFactor > 1: replicate rows with distinct l_orderkey ranges so
    // the duplicated lake checksums like real data, not repeated pages
    val li = if (dupFactor <= 1) li0
      else li0.crossJoin(spark.range(dupFactor).select(col("id").as("_dup")))
        .withColumn("l_orderkey",
          col("l_orderkey") + col("_dup") * lit(1000000000L))
        .drop("_dup")
    val (_, buildSec) = timed {
      li.repartition(nFragFiles) // nFragFiles writers x 3 partition values
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(fragDir)
    }
    def fileStats(dir: String): (Long, Long) = {
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
      var n = 0L; var bytes = 0L
      while (it.hasNext) {
        val p = it.next()
        if (p.toString.endsWith(".parquet")) { n += 1; bytes += p.toFile.length() }
      }
      (n, bytes)
    }
    val (nFrag, bytesFrag) = fileStats(fragDir)

    def scanAgg(dir: String): (Long, Double) = {
      val r = spark.read.parquet(dir)
        .agg(count(lit(1)), sum(col("l_extendedprice").cast("decimal(18,2)")))
        .collect()(0)
      (r.getLong(0), r.getDecimal(1).doubleValue())
    }
    val ((rowsFrag, sumFrag), scanFragSec) = timed(scanAgg(fragDir))

    val (manifest, optSec) = timed {
      val m = Compactor.optimizeParquet(fragDir, optDir, 128L * 1024 * 1024)
      m.count() // materialize the pass
      m
    }
    val nBundles = manifest.count()
    val (nOpt, bytesOpt) = fileStats(optDir)
    val ((rowsOpt, sumOpt), scanOptSec) = timed(scanAgg(optDir))

    require(rowsOpt == rowsFrag, s"row loss: $rowsFrag -> $rowsOpt")
    require(math.abs(sumOpt - sumFrag) < 1e-6,
      s"checksum drift: $sumFrag -> $sumOpt")
    // collapse bound scales with volume: ~bytes/target bundles plus
    // per-partition-dir remainder slack (3 l_returnflag dirs)
    val maxOut = bytesFrag / (128L * 1024 * 1024) + 6
    require(nOpt <= maxOut, s"not collapsed: $nOpt output files (bound $maxOut)")

    val mbs = bytesFrag / 1e6 / optSec
    val json =
      f"""{"metric":"optimize_probe","rows":$rowsFrag,"dup_factor":$dupFactor,""" +
      f""""files_in":$nFrag,"files_out":$nOpt,"bundles":$nBundles,""" +
      f""""bytes_in":$bytesFrag,"bytes_out":$bytesOpt,""" +
      f""""build_sec":$buildSec%.2f,"scan_frag_sec":$scanFragSec%.2f,""" +
      f""""optimize_sec":$optSec%.2f,"scan_opt_sec":$scanOptSec%.2f,""" +
      f""""optimize_mb_per_sec":$mbs%.1f,""" +
      f""""files_per_sec":${nFrag / optSec}%.0f}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_optimize_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)

    // temp lake cleanup — probe data only
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.forEach(rm(_)) finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    rm(root)
    spark.stop()
  }
}
