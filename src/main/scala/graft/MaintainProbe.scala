package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Compactor

/** [[graft.operators.Compactor.maintainLake]] at the 100x event scale:
  * the scheduled-maintenance walls a lake operator actually pays.
  *
  *   - bootstrap: a fragmented 10M-row partitioned lake, first
  *     maintain (everything dirty) — the one-time full cost;
  *   - steady state: one day's residue lands (50 small files), second
  *     maintain rewrites ONLY that partition — the cost that must
  *     track the delta, asserted (clean partitions byte-untouched);
  *   - idempotence: third run rewrites nothing (asserted), its wall is
  *     the no-op floor;
  *   - after every run the manifest prune is live: a selective user
  *     query reads a bounded file subset with exact rows (asserted).
  *
  * Usage: runMain graft.MaintainProbe [sfDir]. Writes
  * BENCH_maintain_probe.json; last stdout line is the JSON.
  */
object MaintainProbe {

  private def f2(d: Double) = math.round(d * 100.0) / 100.0

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/repo/benchdata/sf10join"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val events = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .withColumn("day", (col("user_id") % 4).cast("int"))
      .localCheckpoint()
    val nRows = events.count()
    val work = java.nio.file.Files.createTempDirectory("graft-maintprobe").toString
    val lake = s"$work/lake"
    // fragmented arrival: 50 small files per day partition
    events.repartition(50).write.partitionBy("day").parquet(lake)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val target = 4L * 1024 * 1024
    val zCols = Seq("user_id", "ts")

    val (r1, boot) = timed(Compactor.maintainLake(lake, target, zCols).collect())
    require(r1.forall(_.getBoolean(1)), "bootstrap must maintain every partition")
    val probeUser = events.filter(col("user_id") % 1000 === 7)
      .agg(min(col("user_id"))).collect()(0).getLong(0)
    def queryCheck(): (Long, Int, Int) = {
      val pruned = Compactor.readPruned(lake, "user_id", lit(probeUser), lit(probeUser))
      val hits = pruned.count()
      val expect = spark.read.parquet(lake)
        .filter(col("user_id") === probeUser).count()
      require(hits == expect, s"pruned $hits != full $expect")
      (hits, pruned.inputFiles.length, spark.read.parquet(lake).inputFiles.length)
    }
    val (h1, f1, tot1) = queryCheck()
    require(f1 < tot1, "the prune must skip files on a maintained lake")
    println(f"[maintain] bootstrap $boot%6.2fs (${r1.length} partitions, $tot1 files; query $h1 hits / $f1 of $tot1 files)")

    // steady state: one day's residue
    val before = spark.read.parquet(lake).inputFiles.toSet
    events.filter(col("day") === 2).limit(200000)
      .withColumn("user_id", col("user_id") + lit(100000000L))
      .repartition(50).write.mode("append").partitionBy("day").parquet(lake)
    val (r2, steady) = timed(Compactor.maintainLake(lake, target, zCols).collect())
    val maintained = r2.filter(_.getBoolean(1)).map(_.getString(0)).toSeq
    require(maintained == Seq("day=2"), s"only the residue partition: $maintained")
    val untouched = spark.read.parquet(lake).inputFiles.toSet
      .filter(f => !f.contains("day=2"))
    require(untouched == before.filter(f => !f.contains("day=2")),
      "clean partitions must be byte-untouched")
    val (h2, f2q, tot2) = queryCheck()
    println(f"[maintain] steady    $steady%6.2fs (1 of ${r2.length} partitions; query $h2 hits / $f2q of $tot2 files)")

    val (r3, noop) = timed(Compactor.maintainLake(lake, target, zCols).collect())
    require(r3.forall(r => !r.getBoolean(1)), "third run must be a no-op")
    println(f"[maintain] no-op     $noop%6.2fs")

    val json =
      s"""{"metric":"maintain_probe","sf":"$sfDir","rows":$nRows,""" +
      s""""partitions":${r1.length},"bootstrap_sec":${f2(boot)},""" +
      s""""steady_sec":${f2(steady)},"noop_sec":${f2(noop)},""" +
      s""""query_files_touched":$f2q,"lake_files":$tot2}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_maintain_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
