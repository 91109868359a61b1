package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, IncrementalPipeline}
import graft.operators.IncrementalPipeline.Params

/** The day-N contract: bootstrap(base) + runIncremental(delta) emits
  * EXACTLY the rows the monolithic pipeline produces over base ∪ delta
  * — including the retro paths (base↔base cluster merges through a
  * delta bridge; base docs crossing the contamination threshold when
  * the delta adds bench documents).
  */
class IncrementalPipelineSpec extends SparkSpec {

  private def docsAll: DataFrame = {
    import spark.implicits._
    Tables.load(spark, sf0001, "documents").select($"doc_id", $"text")
  }

  private def budgetOf(docs: DataFrame): Long =
    docs.dropDuplicates("text")
      .agg(sum(size(graft.functions.TextFns.tokens(col("text")))))
      .collect()(0).getLong(0) * 6 / 10 / 4

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  private val bench = col("doc_id") % 101 === 0

  test("bootstrap == monolithic run over the same corpus") {
    val docs = docsAll
    val mx = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val base = docs.filter(col("doc_id") <= mx * 3 / 5)
    val budget = budgetOf(docs)
    val dir = tmpDir("incpipe-boot").toString
    val boot = IncrementalPipeline.bootstrap(dir, base, bench, Params(budget))
    val mono = CorpusPipeline.run(base, benchPred = bench,
      budgetPerStratum = budget, nShards = 64).out
    assert(rows(boot) == rows(mono))
  }

  test("two incremental days == monolithic over each union (no split)") {
    val docs = docsAll
    val mx = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val (c1, c2) = (mx * 3 / 5, mx * 4 / 5)
    val budget = budgetOf(docs)
    val dir = tmpDir("incpipe-2d").toString
    IncrementalPipeline.bootstrap(dir, docs.filter(col("doc_id") <= c1),
      bench, Params(budget))
    val day1 = IncrementalPipeline.runIncremental(dir,
      docs.filter(col("doc_id") > c1 && col("doc_id") <= c2), bench)
    val mono1 = CorpusPipeline.run(docs.filter(col("doc_id") <= c2),
      benchPred = bench, budgetPerStratum = budget, nShards = 64).out
    assert(rows(day1) == rows(mono1), "day 1 must equal the monolithic union")
    val day2 = IncrementalPipeline.runIncremental(dir,
      docs.filter(col("doc_id") > c2), bench)
    val mono2 = CorpusPipeline.run(docs, benchPred = bench,
      budgetPerStratum = budget, nShards = 64).out
    assert(rows(day2) == rows(mono2), "day 2 must equal the monolithic union")
  }

  test("split variant: incremental == monolithic, cluster-atomic annotation included") {
    val docs = docsAll
    val mx = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val c1 = mx * 3 / 5
    val budget = budgetOf(docs)
    val cfg = CorpusPipeline.SplitCfg()
    val dir = tmpDir("incpipe-split").toString
    IncrementalPipeline.bootstrap(dir, docs.filter(col("doc_id") <= c1),
      bench, Params(budget, split = Some(cfg)))
    val day1 = IncrementalPipeline.runIncremental(dir,
      docs.filter(col("doc_id") > c1), bench)
    val mono = CorpusPipeline.run(docs, benchPred = bench,
      budgetPerStratum = budget, nShards = 64,
      trainValSplit = Some(cfg)).out
    assert(rows(day1) == rows(mono))
    // the projection identity the p05/p06 shared gate run rests on:
    // the split stage only annotates, so dropping (rep, split) from
    // the split-enabled day recovers the split-free day-N output
    val monoPlain = CorpusPipeline.run(docs, benchPred = bench,
      budgetPerStratum = budget, nShards = 64).out
    assert(rows(day1.drop("rep", "split")) == rows(monoPlain),
      "split-enabled incremental output must project to the split-free output")
  }

  private def retroCase(dirTag: String, dropKeysTable: Boolean): Unit = {
    import spark.implicits._
    // tokens: unique 6-char words; trigram-shingle set algebra is then
    // controllable block by block (see inline comments)
    def w(p: String, i: Int) = f"$p$i%04d"
    val core = (0 until 102).map(w("tok", _)).updated(50, "the")
    // A and B: each replaces its own run of C's words (10 at the head,
    // 6 at the tail): J(A,C)=90/110≈0.818, J(B,C)=94/106≈0.887 — both
    // ≥ 0.8 and band-collide under the 16/4 LSH recipe — while
    // J(A,B)=84/116≈0.724 < 0.8, so base-only clustering leaves {A},
    // {B} apart and the delta doc C bridges them into one cluster with
    // rep = A's id
    val cWords = core
    val aWords = (0 until 10).map(w("aaa", _)) ++ core.drop(10)
    val bWords = core.take(96) ++ (0 until 6).map(w("bbb", _))
    // D: 41 unique words (39 trigrams); the delta BENCH doc copies D's
    // first 26 words (24 shared trigrams ≥ contamMinHits 20) so D
    // crosses the contamination threshold only once the delta lands.
    // J(D, benchDoc) ≈ 24/54 ≈ 0.44 < 0.8 — never a near-dup drop.
    val dWords = (0 until 41).map(w("ddd", _)).updated(20, "the")
    val benchWords = dWords.take(26) ++ (0 until 15).map(w("qqq", _))
    // filler so packing/stats see several strata
    val fill = (0 until 4).map { i =>
      (4L + i, ((0 until 30).map(w(s"fl$i", _)) :+ "the").mkString(" "))
    }
    val base = (Seq(
      (1L, aWords.mkString(" ")),
      (2L, bWords.mkString(" ")),
      (3L, dWords.mkString(" "))) ++ fill).toDF("doc_id", "text")
    val delta = Seq(
      (1000L, cWords.mkString(" ")),          // the bridge
      (1010L, benchWords.mkString(" ")),      // bench: 1010 % 101 == 0
      (1011L, aWords.mkString(" "))           // exact dup of base doc 1
    ).toDF("doc_id", "text")
    val union = base.unionByName(delta)
    // keep-everything budget: the drop/keep assertions below must see
    // dedup and contamination verdicts, never pack-boundary cuts
    val budget = 1000000L
    // preconditions — the fixture really exercises both retro paths
    val prePairs = graft.operators.Dedup.jaccardPairs(
      union.filter(col("doc_id").isin(1L, 2L, 1000L)),
      col("doc_id"), col("text"), minSim = 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prePairs == Set((1L, 1000L), (2L, 1000L)),
      s"fixture: C must bridge A and B without an A-B edge, got $prePairs")

    val dir = tmpDir(dirTag).toString
    val day0 = IncrementalPipeline.bootstrap(dir, base, bench, Params(budget))
    val d0 = day0.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(d0.contains(2L) && d0.contains(3L),
      s"fixture: B and D must survive day 0, got $d0")
    val keysDir = new java.io.File(s"$dir/index/keys")
    assert(keysDir.exists(), "bootstrap must write the inverted keys table")
    if (dropKeysTable) {
      // legacy (pre-keys) state: the retro probe must fall back to the
      // shingle-array scan and produce the SAME monolithic output
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(keysDir)
    }
    val day1 = IncrementalPipeline.runIncremental(dir, delta, bench)
    val mono = CorpusPipeline.run(union, benchPred = bench,
      budgetPerStratum = budget, nShards = 64).out
    assert(rows(day1) == rows(mono))
    val d1 = day1.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!d1.contains(2L), "bridge merge must retro-drop base doc 2 (rep moves to 1)")
    assert(!d1.contains(3L), "new bench keys must retro-contaminate base doc 3")
    assert(!d1.contains(1011L), "exact dup of a base doc must drop against the index")
  }

  test("commit path-freedom pin: the returned output scans ONLY v<N> paths, and later index appends cannot change it") {
    // The r16 commit overlaps ALL index appends with the state writes.
    // That is only safe while two structural invariants hold; this test
    // pins them against refactors:
    //  1. the returned output re-roots on the committed v<N> tables —
    //     its physical plan must contain no index/* (or input-delta)
    //     scan, so an index append can never invalidate or recompute it;
    //  2. rows already returned stay byte-identical even if the index
    //     dirs grow afterwards (torn-append healing relies on exactly
    //     this: beyond-horizon rows are invisible).
    val docs = docsAll
    val mx = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val budget = budgetOf(docs)
    val dir = tmpDir("incpipe-pathfree").toString
    IncrementalPipeline.bootstrap(dir, docs.filter(col("doc_id") <= mx * 3 / 5),
      bench, Params(budget))
    val day = IncrementalPipeline.runIncremental(dir,
      docs.filter(col("doc_id") > mx * 3 / 5), bench)
    val before = rows(day)
    // 1. every file scan in the returned plan lives under v<N>
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // collect() stops at AQE boundaries (AdaptiveSparkPlanExec and
    // QueryStageExec expose their inner plan via fields, not children)
    // — recurse through them explicitly or the traversal sees nothing
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
      val here = p.collect {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
      }.flatten
      val nested = p.collect {
        case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansOf(s.plan)
      }.flatten
      here ++ nested
    }
    val roots = scansOf(day.queryExecution.executedPlan)
    assert(roots.nonEmpty, "output must read the committed state")
    assert(roots.forall(_.matches(s".*/v\\d+/.*")),
      s"output must scan only v<N> paths, got: $roots")
    // 2. an out-of-band index append (simulating day N+1's overlap or a
    // torn retry) leaves the already-returned frame untouched
    spark.read.parquet(s"$dir/index/hashes").limit(3)
      .withColumn("base_id", col("base_id") + 1000000L)
      .write.mode("append").parquet(s"$dir/index/hashes")
    assert(rows(day) == before,
      "index appends must not be able to change a returned output")
  }

  test("retro paths: a delta bridge merges base clusters; delta bench keys retro-contaminate") {
    retroCase("incpipe-retro", dropKeysTable = false)
  }

  test("retro probe fallback: a legacy state without index/keys scans the shingle arrays to the same answer") {
    retroCase("incpipe-retro-legacy", dropKeysTable = true)
  }

  test("non-default recipe: incremental == monolithic at shingleN=2, k=8, bands=2") {
    val docs = docsAll
    val mx = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val c1 = mx * 3 / 5
    val budget = budgetOf(docs)
    val dir = tmpDir("incpipe-recipe").toString
    IncrementalPipeline.bootstrap(dir, docs.filter(col("doc_id") <= c1),
      bench, Params(budget, shingleN = 2, k = 8, bands = 2))
    val day1 = IncrementalPipeline.runIncremental(dir,
      docs.filter(col("doc_id") > c1), bench)
    val mono = CorpusPipeline.run(docs, benchPred = bench,
      budgetPerStratum = budget, nShards = 64,
      shingleN = 2, k = 8, bands = 2).out
    assert(rows(day1) == rows(mono),
      "the equality contract must hold for non-default recipes too — " +
      "CorpusPipeline.run takes the same shingleN/k/bands knobs")
  }

  test("re-bootstrap clears stale lineage (v2+ dirs and the old index)") {
    val docs = docsAll
    val mx = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val (c1, c2) = (mx * 2 / 5, mx * 3 / 5)
    val budget = budgetOf(docs)
    val dir = tmpDir("incpipe-reboot").toString
    // first lineage advances to v2 (bootstrap + one incremental day)
    IncrementalPipeline.bootstrap(dir, docs.filter(col("doc_id") <= c1),
      bench, Params(budget))
    IncrementalPipeline.runIncremental(dir,
      docs.filter(col("doc_id") > c1 && col("doc_id") <= c2), bench)
    assert(new java.io.File(s"$dir/v2/meta").exists(), "fixture: v2 must exist")
    // re-bootstrap over a DIFFERENT base: without the fresh-lineage
    // guard, loadState would pick the old v2 (highest committed) and
    // pair its reps/horizon with the rebuilt index
    IncrementalPipeline.bootstrap(dir, docs.filter(col("doc_id") <= c2),
      bench, Params(budget))
    assert(!new java.io.File(s"$dir/v2").exists(),
      "re-bootstrap must delete stale v2+ dirs")
    val day1 = IncrementalPipeline.runIncremental(dir,
      docs.filter(col("doc_id") > c2), bench)
    val mono = CorpusPipeline.run(docs, benchPred = bench,
      budgetPerStratum = budget, nShards = 64).out
    assert(rows(day1) == rows(mono))
  }

  test("DSIR sidecar: day-N select == inline over the monolithic post-exact " +
       "corpus; torn feature partitions are invisible; a day retry " +
       "overwrites itself") {
    import spark.implicits._
    import graft.operators.{Curation, Dedup, DsirIndex}
    val docs = docsAll
    val mx = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val (c1, c2) = (mx * 3 / 5, mx * 4 / 5)
    val budget = budgetOf(docs)
    val dir = tmpDir("incpipe-dsir").toString
    IncrementalPipeline.bootstrap(dir, docs.filter($"doc_id" <= c1),
      bench, Params(budget), dsirBuckets = Some(4096))
    IncrementalPipeline.runIncremental(dir,
      docs.filter($"doc_id" > c1 && $"doc_id" <= c2), bench)
    // the features describe the pipeline's own survivor corpus:
    // gate + exact-dedup over the union (the same s2/d2 set the dedup
    // index holds) — the inline dsirSelect over that corpus is the
    // monolithic twin
    def postExact(d: DataFrame) = Dedup.exactFirst(
        d.filter(CorpusPipeline.gopherGate(col("text"))),
        Seq(md5(col("text"))), Seq(col("doc_id").asc))
      .select(col("doc_id"), col("text"))
    val mono1 = postExact(docs.filter($"doc_id" <= c2))
    def viaPipe = rows(IncrementalPipeline.dsirSelect(spark, dir,
      mono1.filter(bench).select($"doc_id"), budget = 50))
    val day1Sel = viaPipe
    assert(day1Sel == rows(Curation.dsirSelect(mono1, $"doc_id", $"text",
      bench, budget = 50)),
      "pipeline DSIR select must equal the inline monolithic form")
    // a TORN day (features written, meta never committed — here ver 3
    // with garbage content): invisible to selects
    DsirIndex.appendVersioned(s"$dir/dsir",
      docs.filter($"doc_id" <= 20), $"doc_id", $"text", ver = 3)
    assert(viaPipe == day1Sel, "uncommitted feature partitions must not leak")
    // the day-2 retry commits ver 3 for real — its append OVERWRITES
    // the torn partition (idempotent), and the select now equals the
    // inline form over everything
    IncrementalPipeline.runIncremental(dir, docs.filter($"doc_id" > c2), bench)
    val mono2 = postExact(docs)
    assert(rows(IncrementalPipeline.dsirSelect(spark, dir,
        mono2.filter(bench).select($"doc_id"), budget = 50))
      == rows(Curation.dsirSelect(mono2, $"doc_id", $"text", bench,
        budget = 50)),
      "after the retried day commits, the select must cover the union")
  }

  test("refuses deltas at or below the committed horizon; torn version dirs are ignored") {
    import spark.implicits._
    val docs = docsAll
    val mx = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val budget = budgetOf(docs)
    val dir = tmpDir("incpipe-guard").toString
    IncrementalPipeline.bootstrap(dir, docs.filter(col("doc_id") <= mx / 2),
      bench, Params(budget))
    val ex = intercept[IllegalArgumentException] {
      IncrementalPipeline.runIncremental(dir,
        docs.filter(col("doc_id") <= mx / 2).limit(3), bench)
    }
    assert(ex.getMessage.contains("horizon"))
    // a torn v2 (no meta) must not shadow the committed v1
    new java.io.File(s"$dir/v2/reps").mkdirs()
    val out = IncrementalPipeline.runIncremental(dir,
      docs.filter(col("doc_id") > mx / 2), bench)
    val mono = CorpusPipeline.run(docs, benchPred = bench,
      budgetPerStratum = budget, nShards = 64).out
    assert(rows(out) == rows(mono))
  }
}
