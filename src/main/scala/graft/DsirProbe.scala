package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR scale probe (verdict r17 #2/#3): the two production edges of
  * the t25 contract that the sf-gate's budget=200 never exercises.
  *
  *  1. Driver-hostile budgets: a real DSIR selection takes MILLIONS of
  *     documents — the probe selects budget=1M from a 2M-doc corpus
  *     through the PrefixSum rank cut (auto above
  *     Curation.DsirRankCutBudget), where the driver holds only bucket
  *     offsets; the TakeOrdered form would hold the full megarow
  *     result. Row-equality of the two cut forms is spec-pinned at
  *     small budget (CurationSpec); here the rank cut's 1M output is
  *     except-checked against the inline weights' own top-1M.
  *
  *  2. Day-N selection through the persisted feature table
  *     ([[graft.operators.DsirIndex]]): the corpus explode+md5 pass —
  *     the dominant, volume-linear cost (BENCH_r17_probe.json) — is
  *     paid once at index build and per-delta at append; the daily
  *     selection then reads the reduced (id, bucket, n) table. The
  *     claim measured: append+select tracks the DELTA, not the corpus.
  *
  * Deterministic synthetic corpus (no testdata dependency): 2M docs x
  * 20 words from a hash vocabulary; every 10th doc is the target
  * domain, drawn from a 100-word subvocab of the 1000-word raw vocab,
  * so target-resembling raw docs genuinely exist.
  *
  * Writes BENCH_dsir_probe.json; last stdout line is the JSON.
  * Caches.release() before every timed rep — iteration 2 of dsirSelect
  * otherwise rides the (doc, bucket, n) cache memo and reports the
  * warm path (the r17 iters=1 probe rule).
  */
object DsirProbe {

  private def f2(d: Double) = math.round(d * 100.0) / 100.0

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dsir-probe")
      // partitions scale with DATA (the cluster-scale rule the 100x
      // probes follow): 40M exploded occurrences through 32 hash maps
      // puts ~1.2M keys of state in each; 128 keeps tasks at the sf0.1
      // per-task state the suite is tuned for
      .config("spark.sql.shuffle.partitions", "128")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Caches, Curation, DsirIndex}

    val nDocs = 2000000L
    val budget = 1000000
    def docs(n: Long, words: Int): DataFrame = spark.range(0L, n, 1L, cpus.toInt)
      .select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(10L)) === 0, lit("src1"))
          .otherwise(lit("src0")).as("source"),
        expr(s"""array_join(transform(sequence(0, ${words - 1}),
          w -> concat('w', cast(pmod(xxhash64(id * 131 + w),
            case when id % 10 = 0 then 100 else 1000 end) as string))), ' ')""")
          .as("text"))

    def settle(): Unit = {
      val t0 = System.nanoTime()
      def load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      while (load > 4.0 && (System.nanoTime() - t0) / 1e9 < 150)
        Thread.sleep(5000)
    }
    def timed[T](body: => T): (T, Double) = {
      settle()
      val t0 = System.nanoTime()
      val out = body
      (out, (System.nanoTime() - t0) / 1e9)
    }
    def run(df: DataFrame): Long = df.queryExecution.toRdd.count()

    // rank-cut corpus: MANY short docs (the budget is what's probed);
    // day-N corpus: realistic document lengths — featurization (the
    // cost the index amortizes) scales with occurrences, and 20-word
    // docs would undersell it (real corpora and the t25 100x probe
    // corpus run hundreds of words per doc)
    val corpus = docs(nDocs, 20)
    val pred = col("source") === "src1"

    // ---- 1. budget >= 1M through the distributed rank cut ------------
    // two fresh reps (memo released between), best-of reported alongside
    val rankWalls = (1 to 2).map { _ =>
      Caches.release()
      val (n, w) = timed(run(
        Curation.dsirSelect(corpus, col("doc_id"), col("text"), pred, budget)))
      require(n == budget, s"rank cut must select exactly $budget rows, got $n")
      w
    }
    // cross-form check at full scale: the rank cut's rows == the
    // TakeOrdered form's (except both ways, distributed — the
    // TakeOrdered twin runs here ONLY as the check; locally its 1M-row
    // driver result is ~40 MB, at cluster scale it is the reason the
    // rank cut exists)
    Caches.release()
    val a = Curation.dsirSelect(corpus, col("doc_id"), col("text"), pred,
      budget, viaRank = Some(true))
    val b = Curation.dsirSelect(corpus, col("doc_id"), col("text"), pred,
      budget, viaRank = Some(false))
    val equalRank = a.except(b).isEmpty && b.except(a).isEmpty
    Caches.release()

    // ---- 2. day-N: persisted features vs inline corpus re-explode ----
    val nDay = 300000L
    val dayCorpus = docs(nDay, 150) // ~45M bigram occurrences
    val base = dayCorpus.filter(pmod(col("doc_id"), lit(20L)) =!= 0)  // 95%
    val delta = dayCorpus.filter(pmod(col("doc_id"), lit(20L)) === 0) // 5%
    val dayBudget = 100000
    Caches.release()
    val (_, wInline) = timed(run(
      Curation.dsirSelect(dayCorpus, col("doc_id"), col("text"), pred, dayBudget)))
    Caches.release()
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir-probe").toString
    val (_, wBuild) = timed(
      DsirIndex.write(dir, base, col("doc_id"), col("text")))
    val targets = dayCorpus.filter(pred).select(col("doc_id"))
    val (_, wAppend) = timed(
      DsirIndex.append(dir, delta, col("doc_id"), col("text")))
    val (_, wSelect) = timed(run(
      Curation.dsirSelectIndexed(spark, dir, targets, dayBudget)))
    // the indexed day selection must equal the inline form over the
    // full corpus — the same pin CurationSpec holds at sf0.001, here at
    // 2M docs (except-based, distributed)
    Caches.release()
    val inl = Curation.dsirSelect(dayCorpus, col("doc_id"), col("text"), pred,
      dayBudget)
    val idx = Curation.dsirSelectIndexed(spark, dir, targets, dayBudget)
    val equalDay = idx.except(inl).isEmpty && inl.except(idx).isEmpty

    def loadavg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val json =
      s"""{"metric":"dsir_probe","n_docs":$nDocs,"load_after":$loadavg,""" +
      s""""rank_cut":{"budget":$budget,"walls":[${rankWalls.map(f2).mkString(",")}],""" +
      s""""best":${f2(rankWalls.min)},"equal_rows":$equalRank,""" +
      s""""note":"PrefixSum rank filter — driver holds bucket offsets only; """ +
      s"""TakeOrdered at this budget would hold the 1M-row result"},""" +
      s""""day_n":{"n_docs":$nDay,"words_per_doc":150,"budget":$dayBudget,"inline_full_corpus_sec":${f2(wInline)},""" +
      s""""index_build_once_sec":${f2(wBuild)},""" +
      s""""delta_append_sec":${f2(wAppend)},""" +
      s""""indexed_select_sec":${f2(wSelect)},""" +
      s""""day_total_sec":${f2(wAppend + wSelect)},""" +
      s""""delta_frac":0.05,"equal_rows":$equalDay,""" +
      s""""note":"day cost = append(delta) + select(features); the corpus """ +
      s"""explode+md5 pass is paid once at build, never per day"}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_dsir_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
