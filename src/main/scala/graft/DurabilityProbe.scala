package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-day durability probe for [[graft.operators.IncrementalPipeline]]:
  * bootstrap 50% of the corpus, then five incremental days (10% each),
  * asserting after EVERY day that
  *
  *   - version retirement keeps exactly {current, rollback} — the
  *     commitMeta delete loop can never leak old versions;
  *   - the state dir stays survivor-metadata-sized (per-day byte rows
  *     for index/ and v<N>/ land in the artifact);
  *
  * then that day 5's output row-equals the monolithic pipeline over
  * the full corpus, and finally that a TORN day commit self-heals: a
  * simulated crash between the index append and the meta write (run a
  * day, delete its version meta) leaves duplicate index rows beyond
  * the horizon; the crash-retry must re-commit cleanly and both that
  * day and the next must still row-equal their monolithic unions
  * (duplicates cost bytes, never correctness — probes are set/min
  * based).
  *
  * Writes BENCH_durability_probe.json; last stdout line is the JSON.
  */
object DurabilityProbe {

  private def f2(d: Double) = math.round(d * 100.0) / 100.0

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-durability-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.{Caches, CorpusPipeline, IncrementalPipeline}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val budget = docs.dropDuplicates("text")
      .agg(sum(size(graft.functions.TextFns.tokens(col("text")))))
      .collect()(0).getLong(0) * 6 / 10 / 4
    val mx = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val bench = col("doc_id") % 101 === 0
    val cuts = (0 to 5).map(i => mx * (5 + i) / 10)
    def slice(lo: Long, hi: Long): DataFrame =
      docs.filter(col("doc_id") > lo && col("doc_id") <= hi)
    val base = docs.filter(col("doc_id") <= cuts(0))

    def rowsOf(df: DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    def monoRows(hi: Long): Set[Seq[Any]] = {
      val r = rowsOf(CorpusPipeline.run(docs.filter(col("doc_id") <= hi),
        benchPred = bench, budgetPerStratum = budget, nShards = 64).out)
      Caches.release()
      r
    }
    def dirBytes(p: java.io.File): Long =
      if (!p.exists()) 0L
      else if (p.isFile) p.length()
      else p.listFiles().map(dirBytes).sum
    def versionsIn(dir: String): Seq[Int] =
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .map(_.getName).filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
        .map(_.drop(1).toInt).sorted.toSeq

    // ---- five-day run with per-day retirement + size assertions ----
    val dir = java.nio.file.Files.createTempDirectory("durability")
      .toFile.getAbsolutePath
    IncrementalPipeline.bootstrap(dir, base, bench,
      IncrementalPipeline.Params(budget))
    var lastOut: DataFrame = null
    val dayStats = (1 to 5).map { i =>
      Caches.release()
      val t0 = System.nanoTime()
      lastOut = IncrementalPipeline.runIncremental(dir,
        slice(cuts(i - 1), cuts(i)), bench)
      lastOut.queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val vs = versionsIn(dir)
      require(vs == Seq(i, i + 1),
        s"day $i: retirement must keep exactly {current, rollback}, got $vs")
      val ixB = dirBytes(new java.io.File(s"$dir/index"))
      val vB = vs.map(v => dirBytes(new java.io.File(s"$dir/v$v"))).sum
      (wall, ixB, vB)
    }
    val day5Equal = rowsOf(lastOut) == monoRows(cuts(5))
    require(day5Equal, "day-5 output must row-equal the monolithic run")

    // ---- torn-commit recovery -------------------------------------
    // run day 1 fully, then delete its version META (the state the
    // pipeline is in if it dies between the index append and the meta
    // write: index rows appended, version tables possibly written, no
    // commit). The retry must (a) load v1 (the torn v2 is invisible),
    // (b) re-append — duplicating index rows — and (c) re-commit, with
    // the day AND the following day still monolithic-equal.
    val dir2 = java.nio.file.Files.createTempDirectory("durability-torn")
      .toFile.getAbsolutePath
    IncrementalPipeline.bootstrap(dir2, base, bench,
      IncrementalPipeline.Params(budget))
    Caches.release()
    IncrementalPipeline.runIncremental(dir2, slice(cuts(0), cuts(1)), bench)
      .queryExecution.toRdd.count()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(s"$dir2/v2/meta"))
    // duplicate-append evidence: retry doubles the day-1 hash rows
    val hashRowsBefore = spark.read.parquet(s"$dir2/index/hashes")
      .filter(col("base_id") > cuts(0)).count()
    Caches.release()
    val retryOut = IncrementalPipeline.runIncremental(dir2,
      slice(cuts(0), cuts(1)), bench)
    retryOut.queryExecution.toRdd.count()
    val hashRowsAfter = spark.read.parquet(s"$dir2/index/hashes")
      .filter(col("base_id") > cuts(0)).count()
    // exactly doubled: the retry re-appends the day's novel slice. On
    // an all-duplicate corpus (the sf10 probe fixture is 100 exact
    // copies) the slice is empty and the duplication evidence is
    // vacuous (0 == 0) — the sf0.1 artifact carries the non-vacuous
    // row; the equality requires below hold either way.
    require(hashRowsAfter == 2 * hashRowsBefore,
      s"retry must re-append exactly the day's novel slice " +
      s"($hashRowsBefore -> $hashRowsAfter)")
    val tornDayEqual = rowsOf(retryOut) == monoRows(cuts(1))
    require(tornDayEqual, "torn-commit retry must row-equal the monolithic run")
    Caches.release()
    val afterTorn = IncrementalPipeline.runIncremental(dir2,
      slice(cuts(1), cuts(2)), bench)
    val nextDayEqual = rowsOf(afterTorn) == monoRows(cuts(2))
    require(nextDayEqual,
      "the day AFTER a healed torn commit must row-equal the monolithic run " +
      "(duplicate index rows below the horizon must count once)")

    val json =
      s"""{"metric":"durability_probe","sf":"$sfDir","days":5,""" +
      s""""day5_equal_rows":$day5Equal,"torn_day_equal_rows":$tornDayEqual,""" +
      s""""post_torn_day_equal_rows":$nextDayEqual,""" +
      s""""dup_index_rows":{"before_retry":$hashRowsBefore,"after_retry":$hashRowsAfter},""" +
      s""""retirement":"current+rollback only, asserted after every day",""" +
      s""""day_walls":[${dayStats.map(d => f2(d._1)).mkString(",")}],""" +
      s""""index_bytes_by_day":[${dayStats.map(_._2).mkString(",")}],""" +
      s""""version_bytes_by_day":[${dayStats.map(_._3).mkString(",")}]}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_durability_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
