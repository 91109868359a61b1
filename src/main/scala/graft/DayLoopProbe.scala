package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Compactor, Dedup, DedupIndex}

/** Day-N composed ingest loop probe (VERDICT r10 task 7): the pieces
  * all exist with their own numbers — incremental compaction, the
  * persisted dedup index, `appendNovel` — but no artifact showed the
  * COMPOSED daily loop a production lake actually runs:
  *
  *   day d:  crawl delta lands as small files
  *           -> compact the delta (optimizeParquet on the day dir)
  *           -> flag the compacted delta against the persisted index
  *           -> fold the novel slice into the index (appendNovel)
  *           -> day d+1 probes an index that grew by day d's novelty
  *
  * The claim under test is the incremental contract: per-day wall
  * tracks the DELTA, not the lake. By day 3 the corpus is 4x the
  * delta and the index has absorbed three days of novelty — if any
  * stage re-shingled the lake or re-compacted history, its wall would
  * grow ~linearly in day number instead of staying flat.
  *
  * Each day's delta is three slices:
  *   - exact-duplicate slice: half the base corpus, id-shifted, text
  *     identical — must ALL be flagged `exact`;
  *   - novel slice: day-salted md5-token docs, no shingle overlap
  *     with anything prior — must ALL land unflagged and be folded;
  *   - NEAR-DUPLICATE slice (round 12): last-token-dropout copies of
  *     the PREVIOUS day's novel docs (23 of 24 tokens kept => shingle
  *     Jaccard 21/22 ~ 0.95) — this forces the band-key x
  *     Jaccard-refinement path to probe index content that was FOLDED
  *     on an earlier day, which is the persisted-shingle machinery's
  *     whole reason to exist. Day 1 perturbs a "day 0" novelty batch
  *     that ships inside the base index build.
  *
  * Assertions per day: every exact dup flagged `exact`; every `near`
  * flag is a planted near-dup AND points at its true source doc
  * (match_id arithmetic — zero tolerance); near detection rate >= 98%
  * (banding at J=0.954 with k=16/bands=4 misses a doc with p~8e-4 —
  * deterministic for fixed text, but the a-priori bound is what the
  * assertion encodes); the novel fold count equals the novel slice
  * plus the (few) banding misses. So the probe is also a correctness
  * witness for the composition, not just a stopwatch.
  *
  * Usage: runMain graft.DayLoopProbe [sfDir] [workDir] [nDays]
  * [baseCopies]. Defaults give a ~50k-doc base (10x sf0.1 documents =
  * the sf1 shape) and ~50k-doc daily deltas. Writes
  * BENCH_dayloop_probe.json in cwd; last stdout line is the JSON.
  */
object DayLoopProbe {

  private def f2(d: Double) = math.round(d * 100.0) / 100.0

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val work = if (args.length > 1) args(1) else "/root/repo/benchdata/dayloop"
    val nDays = if (args.length > 2) args(2).toInt else 3
    val copies = if (args.length > 3) args(3).toInt else 10

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    implicit val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    val ixPath = s"$work/dedup_index"
    val lake = s"$work/lake"

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val D = docs0.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1

    // base corpus: `copies` id-shifted replicas (text per replica made
    // unique with a replica salt so the base itself is dup-free and the
    // index starts at |base| representatives)
    val base = docs0.crossJoin(spark.range(copies).select(col("id").as("_k")))
      .select((col("doc_id") + col("_k") * D).as("doc_id"),
        concat(col("text"), lit(" basecopy "), col("_k").cast("string")).as("text"))
    val baseN = base.count()
    val plantedN = baseN / 4

    // synthetic novel text: 24 md5 tokens salted by (day, id) — no
    // shingle overlap with the base or any other day, deterministic.
    // `nTok` < 24 builds the near-dup slice: the same tokens with the
    // tail dropped (23 => shingle Jaccard 21/22 ~ 0.954)
    def novelText(day: Int, nTok: Int = 24) = concat_ws(" ",
      (0 until nTok).map(i =>
        md5(concat(lit(s"d$day:t$i:"), col("id").cast("string")))): _*)

    // "day 0" novelty: folded with the base build so day 1's near-dup
    // slice probes index content exactly the way later days probe
    // earlier days' folded novelty. Its id range sits ABOVE every
    // day's three slices (day ranges end below (copies + 3*nDays) *
    // D * copies) — an offset inside the day span would collide with
    // day 1's dup slice at copies=1
    val nov0Off = (copies + 3L * nDays) * D * copies
    val nov0 = spark.range(plantedN)
      .select((col("id") + lit(nov0Off)).as("doc_id"), novelText(0).as("text"))
    val (_, baseIxSec) = timed {
      DedupIndex.write(ixPath, base.unionByName(nov0), col("doc_id"), col("text"))
    }
    // DSIR leg (r19): the day loop also maintains the data-selection
    // feature table — build over the same base corpus, fold each day's
    // NOVEL slice (the post-dedup survivors, exactly what the dedup
    // index absorbs), and run one indexed selection per day. Append
    // cost must track the delta; the select is feature-table-sized by
    // design (one pass per target domain, amortized across domains).
    val dsirPath = s"$work/dsir_index"
    val (_, dsirBuildSec) = timed {
      graft.operators.DsirIndex.write(dsirPath, base.unionByName(nov0),
        col("doc_id"), col("text"))
    }
    // target domain: the day-0 novelty slice
    val dsirTargets = nov0.select(col("doc_id"))

    // day d's novel ids live at novOff(d); day 0's inside the base
    def novOff(day: Int): Long =
      if (day == 0) nov0Off
      else (copies + (day - 1) * 3).toLong * D * copies + D * copies

    val dayRows = (1 to nDays).map { day =>
      // ids: dup / novel / near slices each get a day-unique range
      val dupOff = (copies + (day - 1) * 3).toLong * D * copies
      val nearOff = dupOff + 2L * D * copies
      val dupHalf = base.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + lit(dupOff)).as("doc_id"), col("text"))
      val novHalf = spark.range(baseN / 2)
        .select((col("id") + lit(novOff(day))).as("doc_id"),
          novelText(day).as("text"))
      // near-dup slice: 23-token prefixes of YESTERDAY's novel docs —
      // same ids 0..plantedN, so the true source of near doc
      // (nearOff + i) is index doc (novOff(day-1) + i)
      val nearSlice = spark.range(plantedN)
        .select((col("id") + lit(nearOff)).as("doc_id"),
          novelText(day - 1, nTok = 23).as("text"))
      val incoming = s"$work/incoming/date=2026-08-$day"
      val compacted = s"$lake/date=2026-08-$day"
      // the day's crawl residue: 200 small part files
      dupHalf.unionByName(novHalf).unionByName(nearSlice).repartition(200)
        .write.mode("overwrite").parquet(incoming)

      val (_, compactSec) = timed {
        Compactor.optimizeParquet(incoming, compacted, 128L * 1024 * 1024)
      }
      val delta = spark.read.parquet(compacted)
      val ((flags, nExact, nNear), flagSec) = timed {
        val ix = DedupIndex.load(spark, ixPath)
        val f = Dedup.incrementalFlagsIndexed(ix, delta, col("doc_id"), col("text"))
          .localCheckpoint() // one materialization serves count + fold
        val byKind = f.groupBy(col("dup_kind")).count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        (f, byKind.getOrElse("exact", 0L), byKind.getOrElse("near", 0L))
      }
      val (_, foldSec) = timed {
        DedupIndex.appendNovel(ixPath, delta, col("doc_id"), col("text"), flags)
      }
      // DSIR leg: fold the novel survivors' features, then one indexed
      // selection against the day-0 target domain
      val novelSlice = delta.join(flags.select("doc_id"), Seq("doc_id"), "left_anti")
      val (_, dsirAppendSec) = timed {
        graft.operators.DsirIndex.append(dsirPath, novelSlice,
          col("doc_id"), col("text"))
      }
      val (dsirSelN, dsirSelectSec) = timed {
        graft.operators.Curation.dsirSelectIndexed(spark, dsirPath,
          dsirTargets, budget = 1000).count()
      }
      require(dsirSelN == 1000,
        s"day $day: dsir select returned $dsirSelN of budget 1000")
      val deltaN = delta.count()
      val novelN = deltaN - flags.select("doc_id").distinct().count()
      // composition correctness, not just walls: every dup flagged
      // exact; every near flag is a planted near-dup AND its match_id
      // is the true source (id arithmetic, zero tolerance); detection
      // >= 98% of planted; the novel fold absorbs exactly the novel
      // slice plus the banding misses
      require(nExact == dupHalf.count(),
        s"day $day: expected all ${dupHalf.count()} dups exact, got $nExact")
      val badNear = flags.filter(col("dup_kind") === "near")
        .filter(col("doc_id") < nearOff || col("doc_id") >= nearOff + plantedN ||
          col("match_id") =!= col("doc_id") - nearOff + novOff(day - 1))
        .count()
      require(badNear == 0,
        s"day $day: $badNear near flags outside the planted slice or " +
          "pointing at the wrong source")
      require(nNear >= (plantedN * 98) / 100,
        s"day $day: near detection $nNear of planted $plantedN < 98%")
      require(novelN == baseN / 2 + (plantedN - nNear),
        s"day $day: expected ${baseN / 2} novel + ${plantedN - nNear} " +
          s"banding misses, got $novelN")
      val total = compactSec + flagSec + foldSec + dsirAppendSec
      println(f"[dayloop] day $day: compact $compactSec%.2f flag $flagSec%.2f " +
        f"fold $foldSec%.2f dsir_append $dsirAppendSec%.2f " +
        f"dsir_select $dsirSelectSec%.2f total $total%.2f " +
        f"(delta $deltaN rows, $novelN novel, near $nNear/$plantedN)")
      s"""{"day":$day,"delta_rows":$deltaN,"exact_flags":$nExact,""" +
      s""""near_planted":$plantedN,"near_flags":$nNear,""" +
      s""""novel":$novelN,"compact_sec":${f2(compactSec)},""" +
      s""""flag_sec":${f2(flagSec)},"fold_sec":${f2(foldSec)},""" +
      s""""dsir_append_sec":${f2(dsirAppendSec)},""" +
      s""""dsir_select_sec":${f2(dsirSelectSec)},""" +
      s""""total_sec":${f2(total)}}"""
    }

    val ixRows = spark.read.parquet(s"$ixPath/hashes").count()
    val dsirRows = spark.read.parquet(s"$dsirPath/features").count()
    val json =
      s"""{"metric":"dayloop_probe","base_rows":$baseN,"days":$nDays,""" +
      s""""base_index_build_sec":${f2(baseIxSec)},""" +
      s""""dsir_build_sec":${f2(dsirBuildSec)},""" +
      s""""index_rows_final":$ixRows,"dsir_rows_final":$dsirRows,""" +
      s""""per_day":${dayRows.mkString("[", ",", "]")}}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_dayloop_probe.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => }
    println(json)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    spark.stop()
  }
}
