package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The COMPOSED production day loop, end to end — both halves that the
  * other probes price separately, run as one story:
  *
  *   day d:  crawl lands as small files
  *           -> compact into the lake's day partition (ingest)
  *           -> maintainLake (z-order + stats manifest; only the dirty
  *              partition rewrites — wall must track the delta, not
  *              the lake)
  *           -> runIncremental (day-N curation against persisted
  *              state; output == monolithic by contract)
  *           -> a whole-history point query stays MANIFEST-PRUNED
  *              (files touched ~ partitions x 1, not the file count)
  *
  * DayLoopProbe prices the lake half, IncPipeProbe the curation half;
  * this artifact proves the composition: per-day walls for both
  * halves, the maintain pass rewriting ONLY the new partition, and the
  * final day's curated output row-equal to the monolithic pipeline
  * over everything ingested.
  *
  * Usage: runMain graft.ProductionLoopProbe [sfDir] [nDays]
  * Writes BENCH_prodloop_probe.json; last stdout line is the JSON.
  */
object ProductionLoopProbe {

  private def f2(d: Double) = math.round(d * 100.0) / 100.0

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nDays = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-prodloop-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.{Caches, Compactor, CorpusPipeline, IncrementalPipeline}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val budget = docs.dropDuplicates("text")
      .agg(sum(size(graft.functions.TextFns.tokens(col("text")))))
      .collect()(0).getLong(0) * 6 / 10 / 4
    val mx = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val bench = col("doc_id") % 101 === 0
    // base = 50% by id, then nDays equal slices over the rest
    val cuts = (0 to nDays).map(i => mx / 2 + i * (mx - mx / 2) / nDays)

    val work = java.nio.file.Files.createTempDirectory("prodloop")
      .toFile.getAbsolutePath
    val lake = s"$work/lake"
    val state = s"$work/state"

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // a day's crawl residue: many small part files, compacted into the
    // lake's date partition
    def ingest(day: Int, df: DataFrame): Unit = {
      val in = s"$work/incoming/date=2026-09-$day"
      df.repartition(50).write.mode("overwrite").parquet(in)
      Compactor.optimizeParquet(in, s"$lake/date=2026-09-$day",
        128L * 1024 * 1024)
    }

    // ---- day 0: base ingest + first maintain + curation bootstrap ----
    ingest(0, docs.filter(col("doc_id") <= cuts(0)))
    val (_, maint0) = timed {
      Compactor.maintainLake(lake, 128L * 1024 * 1024, Seq("doc_id"))
    }
    val (_, boot0) = timed {
      IncrementalPipeline.bootstrap(state,
        spark.read.parquet(s"$lake/date=2026-09-0")
          .select(col("doc_id"), col("text")),
        bench, IncrementalPipeline.Params(budget))
        .queryExecution.toRdd.count()
    }

    // probe id for the whole-history point query: a base doc that is
    // never retro-dropped from the LAKE (the lake keeps raw history;
    // curation state is separate)
    val probeId = cuts(0) / 2

    var lastOut: DataFrame = null
    val dayRows = (1 to nDays).map { day =>
      Caches.release()
      val (_, ingestSec) = timed {
        ingest(day, docs.filter(col("doc_id") > cuts(day - 1) &&
          col("doc_id") <= cuts(day)))
      }
      val (maintRows, maintSec) = timed {
        Compactor.maintainLake(lake, 128L * 1024 * 1024, Seq("doc_id"))
          .collect()
      }
      // only the NEW partition may rewrite — maintenance cost tracks
      // the dirty fraction, not lake volume
      val rewritten = maintRows.filter(_.getBoolean(1)).map(_.getString(0))
      require(rewritten.toSeq == Seq(s"date=2026-09-$day"),
        s"day $day: maintain must rewrite only the new partition, " +
          s"got ${rewritten.mkString(",")}")
      val (_, curateSec) = timed {
        lastOut = IncrementalPipeline.runIncremental(state,
          spark.read.parquet(s"$lake/date=2026-09-$day")
            .select(col("doc_id"), col("text")), bench)
        lastOut.queryExecution.toRdd.count()
      }
      // whole-history point query through the manifest: files touched
      // must stay ~ one per partition (span prune within partitions),
      // never the lake's file count
      val ((qRows, qFiles, totFiles), querySec) = timed {
        val pruned = Compactor.readPrunedEq(lake, Seq(("doc_id", lit(probeId))))
        (pruned.filter(col("doc_id") === probeId).count(),
          pruned.inputFiles.length,
          spark.read.parquet(lake).inputFiles.length)
      }
      require(qRows == 1, s"day $day: point query must find doc $probeId once")
      require(qFiles < totFiles,
        s"day $day: history query must stay manifest-pruned " +
          s"($qFiles touched of $totFiles)")
      println(f"[prodloop] day $day: ingest $ingestSec%.2f maintain " +
        f"$maintSec%.2f curate $curateSec%.2f query $querySec%.2f " +
        f"(pruned $qFiles/$totFiles files)")
      s"""{"day":$day,"ingest_sec":${f2(ingestSec)},""" +
      s""""maintain_sec":${f2(maintSec)},"curate_sec":${f2(curateSec)},""" +
      s""""history_query_sec":${f2(querySec)},""" +
      s""""query_files_touched":$qFiles,"lake_files":$totFiles}"""
    }

    // the composed loop's correctness gate: after N days of
    // ingest+maintain+curate, the curated output must row-equal the
    // monolithic pipeline over everything ingested
    Caches.release()
    val mono = CorpusPipeline.run(docs.filter(col("doc_id") <= cuts(nDays)),
      benchPred = bench, budgetPerStratum = budget, nShards = 64).out
    val equal = lastOut.collect().map(_.toSeq).toSet ==
      mono.collect().map(_.toSeq).toSet
    require(equal, "final day's curated output must row-equal the monolithic run")

    val json =
      s"""{"metric":"prodloop_probe","sf":"$sfDir","days":$nDays,""" +
      s""""equal_rows":$equal,"maintain0_sec":${f2(maint0)},""" +
      s""""bootstrap_sec":${f2(boot0)},""" +
      s""""per_day":${dayRows.mkString("[", ",", "]")}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_prodloop_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
