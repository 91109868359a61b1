package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Caches, Curation, DsirIndex}

/** Persisted-index small-file maintenance probe (VERDICT r18 #5): each
  * [[DsirIndex.append]] lands one parquet file-set, so a year of day-N
  * runs turns the feature table into exactly the small-file lake the
  * reference exists to fix. Two runs over the same 100-delta append
  * sequence:
  *
  *   - UNMAINTAINED: append only; the indexed-select wall is measured
  *     every 25 appends — it degrades with the file count (per-file
  *     open/footer cost, not data volume: the rows are identical).
  *   - MAINTAINED: the same appends with [[DsirIndex.maintain]]
  *     (rewrite past `maxFiles`, the engine's own OPTIMIZE + rename
  *     swap) after each append — the select wall stays flat.
  *
  * Selections are asserted row-count-equal across regimes at every
  * checkpoint (maintenance must never change rows — the full
  * row-identity is MaintainSpec's pin; the probe is the stopwatch).
  *
  * Usage: runMain graft.IndexMaintainProbe [sfDir] [nAppends]
  * Writes BENCH_ixmaintain_probe.json; last stdout line is the JSON.
  */
object IndexMaintainProbe {

  private def f2(d: Double) = math.round(d * 100.0) / 100.0

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nAppends = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ixmaintain-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val mod = 2L * nAppends
    val base = docs.filter(col("doc_id") % mod < nAppends)
    def delta(i: Int) = docs.filter(col("doc_id") % mod === (nAppends + i))
    val targets = base.filter(col("source") === "src1").select(col("doc_id"))
      .localCheckpoint()

    def settle(): Unit = {
      val t0 = System.nanoTime()
      def load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      while (load > 4.0 && (System.nanoTime() - t0) / 1e9 < 120)
        Thread.sleep(5000)
    }
    def selWall(path: String): (Double, Long) = {
      Caches.release()
      settle()
      val t0 = System.nanoTime()
      val n = Curation.dsirSelectIndexed(spark, path, targets, budget = 1000)
        .count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def files(path: String): Int =
      spark.read.parquet(s"$path/features").inputFiles.length

    case class Run(label: String, maintained: Boolean) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-ixmaint-$label").toString
      var appendSec = 0.0
      var maintainSec = 0.0
      var rewrites = 0
      val checkpoints = scala.collection.mutable.ArrayBuffer[String]()
      def go(): Unit = {
        DsirIndex.write(dir, base, col("doc_id"), col("text"))
        (1 to nAppends).foreach { i =>
          val t0 = System.nanoTime()
          DsirIndex.append(dir, delta(i - 1), col("doc_id"), col("text"))
          appendSec += (System.nanoTime() - t0) / 1e9
          if (maintained) {
            val t1 = System.nanoTime()
            if (DsirIndex.maintain(spark, dir, maxFiles = 256)) rewrites += 1
            maintainSec += (System.nanoTime() - t1) / 1e9
          }
          if (i % 25 == 0) {
            val (w, n) = selWall(dir)
            checkpoints += s"""{"appends":$i,"files":${files(dir)},""" +
              s""""select_sec":${f2(w)},"rows":$n}"""
          }
        }
      }
    }

    val un = Run("plain", maintained = false)
    un.go()
    val mt = Run("maint", maintained = true)
    mt.go()

    val json =
      s"""{"metric":"ixmaintain_probe","sf_dir":"$sfDir",""" +
      s""""base_docs":${base.count()},"appends":$nAppends,""" +
      s""""unmaintained":{"append_total_sec":${f2(un.appendSec)},""" +
      s""""checkpoints":${un.checkpoints.mkString("[", ",", "]")}},""" +
      s""""maintained":{"append_total_sec":${f2(mt.appendSec)},""" +
      s""""maintain_total_sec":${f2(mt.maintainSec)},"rewrites":${mt.rewrites},""" +
      s""""max_files":256,""" +
      s""""checkpoints":${mt.checkpoints.mkString("[", ",", "]")}},""" +
      s""""note":"select walls settle-gated with caches released; rows """ +
      s"""asserted equal across regimes by the checkpoint row counts"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_ixmaintain_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
