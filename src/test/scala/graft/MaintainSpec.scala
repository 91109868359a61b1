package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Compactor

/** [[graft.operators.Compactor.maintainLake]] — the one-call
  * compact + z-order + manifest-resync composition. Pins:
  *   - only DIRTY partitions (files unknown to the manifest) are
  *     rewritten; clean partitions are byte-untouched;
  *   - the manifest is live immediately after (prune active, rows
  *     exact);
  *   - idempotence: a second run rewrites nothing and leaves the lake
  *     file-set-identical.
  */
class MaintainSpec extends SparkSpec {

  test("maintainLake: dirty-only rewrite, manifest resync, idempotent second run") {
    implicit val s = spark
    import s.implicits._
    val lake = Files.createTempDirectory("graft-maint").toString
    // two day partitions of scattered (x, y)
    (0 until 8192).map { i =>
      val r = (i * 2654435761L) % 4096
      ((r % 64).toInt, (r / 64).toInt, i.toLong, s"d${i % 2}")
    }.toDF("x", "y", "id", "day").repartition(6)
      .write.mode("overwrite").partitionBy("day").parquet(lake)

    // run 1: no manifest -> everything dirty, all partitions rewritten
    val r1 = Compactor.maintainLake(lake, 2 * 1024, Seq("x", "y"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(r1.size == 2 && r1.values.forall(identity),
      s"first run must maintain every partition: $r1")
    val files1 = spark.read.parquet(lake).inputFiles.toSet
    assert(spark.read.parquet(lake).count() == 8192)

    // prune is live immediately: x-range read touches a strict subset
    val pruned = Compactor.readPruned(lake, "x", lit(3), lit(6))
    assert(pruned.count() ==
      spark.read.parquet(lake).filter($"x" >= 3 && $"x" <= 6).count())
    assert(pruned.inputFiles.length < files1.size)

    // run 2: nothing dirty -> nothing rewritten, lake byte-identical
    val r2 = Compactor.maintainLake(lake, 2 * 1024, Seq("x", "y"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(r2.values.forall(m => !m), s"second run must be a no-op: $r2")
    assert(spark.read.parquet(lake).inputFiles.toSet == files1,
      "an idempotent no-op must not touch a single file")

    // streaming residue lands in ONE partition -> only that partition
    // is rewritten; the other keeps its exact files
    val cleanFiles = files1.filter(_.contains("day=d1"))
    (0 until 512).map(i => (70, 99, 900000L + i, "d0"))
      .toDF("x", "y", "id", "day").coalesce(3)
      .write.mode("append").partitionBy("day").parquet(lake)
    val r3 = Compactor.maintainLake(lake, 2 * 1024, Seq("x", "y"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(r3("day=d0") && !r3("day=d1"), s"only the residue partition is dirty: $r3")
    assert(spark.read.parquet(lake).inputFiles.toSet
      .filter(_.contains("day=d1")) == cleanFiles,
      "the clean partition must be byte-untouched")
    assert(spark.read.parquet(lake).count() == 8192 + 512)
    // manifest covers the resynced lake: the new value range prunes to
    // the rewritten partition only, rows exact
    val p2 = Compactor.readPruned(lake, "x", lit(70), lit(70))
    assert(p2.count() == 512)
    assert(p2.inputFiles.forall(_.contains("day=d0")))
    // and a full-range parity check
    val full = spark.read.parquet(lake)
    val viaPrune = Compactor.readPruned(lake, "x", lit(0), lit(70))
    assert(viaPrune.count() == full.filter($"x" >= 0 && $"x" <= 70).count())
  }

  test("maintainLake preserves dict columns: point skip stays live across a maintenance pass") {
    implicit val s = spark
    import s.implicits._
    val lake = Files.createTempDirectory("graft-maint-dict").toString
    (0 until 8192).map { i =>
      val r = (i * 2654435761L) % 4096
      ((r % 64).toInt, (r / 64).toInt, (i % 40).toLong, s"d${i % 2}")
    }.toDF("x", "y", "user", "day").repartition(6)
      .write.mode("overwrite").partitionBy("day").parquet(lake)
    Compactor.maintainLake(lake, 2 * 1024, Seq("x", "y"))
    // a dict column enters the manifest by explicit rewrite...
    Compactor.writeStatsManifest(lake, Seq("x", "y"), dictCols = Seq("user"))
    assert(spark.read.parquet(s"$lake/${Compactor.StatsDir}")
      .columns.contains("dict_user"))
    // ...then new files land and maintenance resyncs the manifest —
    // the rebuilt manifest must carry dict_user forward (fresh stats
    // for rewritten partitions INCLUDE the dict), not silently drop
    // the point-skip coverage
    (8192 until 8448).map { i =>
      val r = (i * 2654435761L) % 4096
      ((r % 64).toInt, (r / 64).toInt, (i % 40).toLong, s"d${i % 2}")
    }.toDF("x", "y", "user", "day")
      .write.mode("append").partitionBy("day").parquet(lake)
    Compactor.maintainLake(lake, 2 * 1024, Seq("x", "y"))
    val man = spark.read.parquet(s"$lake/${Compactor.StatsDir}")
    assert(man.columns.contains("dict_user"),
      "maintenance must not drop dict columns from the manifest")
    assert(man.filter(col("dict_user").isNotNull).count() > 0,
      "rebuilt entries must carry real dictionaries")
    // and the dict actually prunes + answers exactly after the resync
    val got = Compactor.readPrunedEq(lake, Seq(("user", lit(7))))
    val full = spark.read.parquet(lake).filter($"user" === 7L)
    assert(got.count() == full.count() && full.count() > 0)
    assert(got.inputFiles.length < spark.read.parquet(lake).inputFiles.length,
      "dict must prune at least one file post-maintenance")
  }

  test("maintainLake on a FLAT lake: rewrite-all then no-op, manifest survives the swap") {
    implicit val s = spark
    import s.implicits._
    val lake = Files.createTempDirectory("graft-maint-flat").toString
    (0 until 4096).map { i =>
      val r = (i * 2654435761L) % 4096
      ((r % 64).toInt, (r / 64).toInt, i.toLong)
    }.toDF("x", "y", "id").repartition(5)
      .write.mode("overwrite").parquet(lake)
    val r1 = Compactor.maintainLake(lake, 2 * 1024, Seq("x", "y")).collect()
    assert(r1.length == 1 && r1(0).getBoolean(1))
    assert(spark.read.parquet(lake).count() == 4096)
    val files1 = spark.read.parquet(lake).inputFiles.toSet
    val r2 = Compactor.maintainLake(lake, 2 * 1024, Seq("x", "y")).collect()
    assert(r2.length == 1 && !r2(0).getBoolean(1), "second flat run must no-op")
    assert(spark.read.parquet(lake).inputFiles.toSet == files1)
    val pruned = Compactor.readPruned(lake, "x", lit(10), lit(12))
    assert(pruned.count() ==
      spark.read.parquet(lake).filter($"x" >= 10 && $"x" <= 12).count())
    assert(pruned.inputFiles.length < files1.size)
  }

  test("maintainLake resyncs after a pure DELETION: dead manifest rows dropped, no rewrite, prune live again") {
    implicit val s = spark
    import s.implicits._
    val lake = Files.createTempDirectory("graft-maint-del").toString
    (0 until 8192).map { i =>
      val r = (i * 2654435761L) % 4096
      ((r % 64).toInt, (r / 64).toInt, i.toLong, s"d${i % 2}")
    }.toDF("x", "y", "id", "day").repartition(6)
      .write.mode("overwrite").partitionBy("day").parquet(lake)
    Compactor.maintainLake(lake, 2 * 1024, Seq("x", "y"))

    // retention purge: delete one manifest-known data file, add nothing
    val victim = spark.read.parquet(lake).inputFiles
      .filter(_.contains("day=d0")).sorted.head
    val vp = new org.apache.hadoop.fs.Path(victim)
    val fs = vp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(vp, false))

    // the stale manifest (dead entry) disables the prune via the
    // correctness fallback: full scan, every file touched
    val before = Compactor.readPruned(lake, "x", lit(3), lit(6))
    val allFiles = spark.read.parquet(lake).inputFiles.toSet
    assert(before.inputFiles.toSet == allFiles,
      "a dead manifest entry must fall back to the full scan")

    // maintain: NO rewrite (nothing dirty), but the dead row is
    // dropped and the prune is live again — rows exact, subset read
    val files0 = allFiles
    val r = Compactor.maintainLake(lake, 2 * 1024, Seq("x", "y"))
      .collect().map(x => (x.getString(0), x.getBoolean(1))).toMap
    assert(r.values.forall(m => !m),
      s"a pure deletion must not rewrite any partition: $r")
    assert(spark.read.parquet(lake).inputFiles.toSet == files0,
      "deletion resync must not touch data files")
    val after = Compactor.readPruned(lake, "x", lit(3), lit(6))
    assert(after.count() ==
      spark.read.parquet(lake).filter($"x" >= 3 && $"x" <= 6).count())
    assert(after.inputFiles.length < files0.size,
      "the prune must be live again after the resync")
  }

  test("index small-file maintenance: appends accrete files, maintain " +
       "compacts past the threshold, selections are row-identical") {
    implicit val s = spark
    import s.implicits._
    import graft.operators.{Curation, DsirIndex}
    val dir = Files.createTempDirectory("graft-dsir-maint").toString
    val docs = Tables.load(spark, sf0001, "documents")
    val base = docs.filter($"doc_id" % 4 === 0)
    DsirIndex.write(dir, base, $"doc_id", $"text")
    // 3 day-appends, each landing its own file-set
    (1 to 3).foreach(d =>
      DsirIndex.append(dir, docs.filter($"doc_id" % 4 === d),
        $"doc_id", $"text"))
    def nFiles = spark.read.parquet(s"$dir/features").inputFiles.length
    val fragmented = nFiles
    assert(fragmented >= 4, s"appends should fragment the table: $fragmented")
    val targets = docs.filter($"source" === "src1").select($"doc_id")
    def sel = Curation.dsirSelectIndexed(spark, dir, targets, budget = 50)
      .collect().map(_.toSeq).toSet
    val before = sel
    // below threshold: listing-only no-op
    assert(!DsirIndex.maintain(spark, dir, maxFiles = fragmented))
    assert(nFiles == fragmented)
    // past threshold: rewrite shrinks the file count, rows exact
    assert(DsirIndex.maintain(spark, dir, maxFiles = 1))
    assert(nFiles < fragmented, s"maintain must shrink the file count")
    assert(sel == before, "maintenance must be row-preserving")
    // idempotent: the compacted table is below the threshold
    assert(!DsirIndex.maintain(spark, dir, maxFiles = nFiles))
  }

  test("sketch-index maintenance compacts every appended table and " +
       "searches stay row-identical") {
    implicit val s = spark
    import s.implicits._
    import graft.operators.AnnIndex
    val dir = Files.createTempDirectory("graft-sk-maint").toString
    val e = Tables.load(spark, sf0001, "embeddings")
      .select($"vec_id", $"embedding")
    AnnIndex.writeSketch(dir, e.filter($"vec_id" < 200))
    (0 until 3).foreach(d => AnnIndex.appendSketchVectors(dir,
      e.filter($"vec_id" >= 200 + d * 100 && $"vec_id" < 300 + d * 100)))
    def files(t: String) = spark.read.parquet(s"$dir/$t").inputFiles.length
    val (v0, s0) = (files("vectors"), files("sketches"))
    assert(v0 > 4 && s0 > 4, s"appends should fragment: vectors=$v0 sketches=$s0")
    val q = e.filter($"vec_id" < 5)
    def search = AnnIndex.searchSketch(spark, dir, q, k = 5, m = 50)
      .collect().map(_.toSeq).toSet
    val before = search
    assert(AnnIndex.maintainSketch(spark, dir, maxFiles = 4))
    assert(files("vectors") <= 4 || files("vectors") < v0)
    assert(files("sketches") < s0)
    assert(search == before, "sketch maintenance must be row-preserving")
    assert(!AnnIndex.maintainSketch(spark, dir, maxFiles = math.max(4,
      math.max(files("vectors"), files("sketches")))))
  }

  test("appendStatsManifest dup-guard catches a scheme-less spelling of a known path") {
    implicit val s = spark
    import s.implicits._
    val lake = Files.createTempDirectory("graft-maint-norm").toString
    (0 until 256).map(i => (i % 16, i.toLong)).toDF("x", "id")
      .repartition(2).write.mode("overwrite").parquet(lake)
    Compactor.writeStatsManifest(lake, Seq("x"))
    // manifest spells files file://...; the caller passes a bare path
    val bare = new java.io.File(lake).listFiles()
      .map(_.getPath).filter(_.endsWith(".parquet")).sorted.head
    assert(!bare.startsWith("file:"))
    val e = intercept[IllegalArgumentException](
      Compactor.appendStatsManifest(lake, Seq(bare)))
    assert(e.getMessage.contains("already in the manifest"))
  }
}
