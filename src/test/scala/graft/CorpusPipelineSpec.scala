package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusPipeline, Dedup}

/** Composition contract of the chained curation pipeline
  * ([[graft.operators.CorpusPipeline]]): stage count, survivor
  * monotonicity, the ONE-shingle-pass guarantee, id-set discipline
  * between stages, and pack/shard identities.
  */
class CorpusPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("composed pipeline: one shingle pass, monotone survivors, shard permutation") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val totalTok = docs
      .agg(sum(size(graft.functions.TextFns.tokens(col("text")))))
      .collect()(0).getLong(0)

    val sb0 = Dedup.shingleBuilds
    val res = CorpusPipeline.run(docs,
      benchPred = col("doc_id") % 97 === 0,
      budgetPerStratum = totalTok * 6 / 10 / 4,
      materialize = CorpusPipeline.Materialize.LocalCheckpoint,
      collectStats = true)
    val out = res.out.localCheckpoint()

    // stage roster is the pipeline's public contract
    assert(res.stats.map(_.stage) == Seq("gopher_filter", "exact_dedup",
      "near_dedup_decontam", "pii_redact", "token_pack", "shard_assign"))

    // the corpus was shingled at most once (0 = a previous test in this
    // JVM already memoized the same post-exact frame)
    assert(Dedup.shingleBuilds - sb0 <= 1,
      "near-dedup + decontamination must share one shingle pass")

    // filter stages only remove; the fixture must exercise every stage
    val n = res.stats.map(_.rowsOut)
    assert(n == n.sorted.reverse, s"survivors must be non-increasing: $n")
    assert(res.rowsAfter("gopher_filter") < docs.count(),
      "gopher filter must drop something on this fixture")
    assert(res.rowsAfter("near_dedup_decontam") < res.rowsAfter("exact_dedup"),
      "near dedup must drop something on this fixture")
    assert(res.rowsAfter("token_pack") < res.rowsAfter("pii_redact"),
      "the 60% budget must make the pack bite")

    // shard stage is a permutation of the packed set with dense 1..n
    // positions per shard
    assert(res.rowsAfter("shard_assign") == res.rowsAfter("token_pack"))
    assert(CorpusPipeline.nonDensePositionShards(out) == 0,
      "per-shard positions must be dense 1..n")

    // every emitted doc survived every filter: output ids are a subset
    // of the input ids (and unique)
    assert(out.select("doc_id").distinct().count() == out.count())
    assert(out.join(docs, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("materialization policy changes execution, never results: fused None == staged LocalCheckpoint") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val pred = col("doc_id") % 97 === 0
    // fused default: no per-stage pin, no stats — ONE Catalyst plan
    val fused = CorpusPipeline.run(docs, benchPred = pred,
      budgetPerStratum = 5000L)
    assert(fused.stats.isEmpty, "stats are opt-in; default must collect none")
    val a = fused.out.localCheckpoint()
    // staged probe/spec config
    val b = CorpusPipeline.run(docs, benchPred = pred,
      budgetPerStratum = 5000L,
      materialize = CorpusPipeline.Materialize.LocalCheckpoint,
      collectStats = true).out
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "fused and staged configurations must emit identical rows")
    // composition invariants hold under the fused config too
    assert(CorpusPipeline.nonDensePositionShards(a) == 0)
    assert(a.select("doc_id").distinct().count() == a.count())
    assert(a.join(docs, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("persist policy pins stages at a replicated-capable level and matches") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(2000)
    val pred = col("doc_id") % 97 === 0
    val p = CorpusPipeline.run(docs, benchPred = pred,
      budgetPerStratum = 3000L,
      materialize = CorpusPipeline.Materialize.Persist(),
      collectStats = true)
    val d = CorpusPipeline.run(docs, benchPred = pred,
      budgetPerStratum = 3000L)
    assert(p.stats.map(_.stage).size == 6)
    assert(p.out.exceptAll(d.out).isEmpty && d.out.exceptAll(p.out).isEmpty)
    p.out.sparkSession.sharedState.cacheManager.clearCache()
  }

  test("split stage: annotation-only, pure function of rep, cluster-atomic, shared shingle pass") {
    // Plant REPHRASED twins: the 60% word-prefix of every third doc.
    // Prefix trigrams are a subset of the full doc's, so Jaccard lands
    // near 0.6 — above the 0.3 split threshold, below the 0.8 near-dedup
    // drop, i.e. exactly the pair class a per-document hash split leaks
    // across and dedup never removes.
    val baseDocs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val w = graft.functions.TextFns.tokens(col("text"))
    val twins = baseDocs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        array_join(slice(w, lit(1), size(w) * 3 / 5), " ").as("text"))
      .filter(size(graft.functions.TextFns.tokens(col("text"))) >= 15)
    val docs = baseDocs.unionByName(twins)
    val pred = col("doc_id") % 97 === 0
    val sb0 = Dedup.shingleBuilds
    // budget large enough that the pack keeps every survivor — the
    // straddle check needs both twin endpoints in the OUTPUT
    val base = CorpusPipeline.run(docs, benchPred = pred,
      budgetPerStratum = 10000000L).out
    val withSplit = CorpusPipeline.run(docs, benchPred = pred,
      budgetPerStratum = 10000000L,
      trainValSplit = Some(CorpusPipeline.SplitCfg())).out.localCheckpoint()

    // the corpus was shingled at most once across BOTH runs: the split
    // stage rides the same memoized shingle + scored-pair tables
    assert(Dedup.shingleBuilds - sb0 <= 1,
      "split stage must reuse the pipeline's shingle pass")

    // annotation-only: projecting rep/split away recovers the split-free
    // pipeline bit-for-bit
    val proj = withSplit.drop("rep", "split")
    assert(proj.exceptAll(base).isEmpty && base.exceptAll(proj).isEmpty,
      "split must annotate, never re-pack or re-shard")

    // split is a pure function of the representative
    assert(withSplit.select("rep", "split").distinct()
      .groupBy("rep").count().filter(col("count") > 1).count() == 0)

    // both sides populated on this fixture (230/256 ~ 90/10)
    val sides = withSplit.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sides.getOrElse("train", 0L) > 0 && sides.getOrElse("val", 0L) > 0,
      s"fixture must land docs on both sides: $sides")

    // cluster atomicity at the split threshold: every >=0.3 near-dup
    // pair among the OUTPUT documents sits on one side. (The operator
    // additionally closes over pairs transitive through dropped docs —
    // this check is the direct-edge floor of that guarantee.)
    val outDocs = docs.join(withSplit.select("doc_id"), Seq("doc_id"))
    val pairs = Dedup.jaccardPairs(outDocs, col("doc_id"), col("text"),
      minSim = 0.3)
    val lab = withSplit.select(col("doc_id"), col("split"))
    val straddle = pairs
      .join(lab.toDF("doc_a", "side_a"), "doc_a")
      .join(lab.toDF("doc_b", "side_b"), "doc_b")
      .filter(col("side_a") =!= col("side_b"))
    assert(pairs.count() > 0, "fixture must contain near-dup pairs among survivors")
    assert(straddle.count() == 0, "near-dup pairs must never straddle the split")

    // stage roster gains exactly the one terminal stage under stats
    val staged = CorpusPipeline.run(docs, benchPred = pred,
      budgetPerStratum = 10000000L,
      materialize = CorpusPipeline.Materialize.LocalCheckpoint,
      collectStats = true,
      trainValSplit = Some(CorpusPipeline.SplitCfg()))
    assert(staged.stats.map(_.stage) == Seq("gopher_filter", "exact_dedup",
      "near_dedup_decontam", "pii_redact", "token_pack", "shard_assign",
      "split_assign"))
    assert(staged.rowsAfter("split_assign") == staged.rowsAfter("shard_assign"),
      "annotation stage preserves row count")
  }

  test("pipeline is deterministic: a rerun emits the identical shard assignment") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val a = CorpusPipeline.run(docs, benchPred = col("doc_id") % 97 === 0,
      budgetPerStratum = 5000L).out
    val b = CorpusPipeline.run(docs, benchPred = col("doc_id") % 97 === 0,
      budgetPerStratum = 5000L).out
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "composed pipeline must be run-to-run stable")
  }
  test("gate pays the pipeline once: p03 is p04's projection over one shared run") {
    // r13 ran the full six/seven-stage pipeline once for p03 and again
    // for p04 — the two heaviest gate entries, each ~20 s co-elapsed at
    // sf0.1. The registry now memoizes ONE split-configured run per
    // (session, sf dir) and derives p03 by projecting rep/split away
    // (annotation-only: pinned bit-for-bit elsewhere in this suite).
    val sb0 = Dedup.shingleBuilds
    val p4 = graft.SparkEntry.queries("p04_pipeline_split")(spark, sf0001)
    val rows4 = p4.collect()
    val p3 = graft.SparkEntry.queries("p03_full_pipeline")(spark, sf0001)
    val rows3 = p3.collect()
    assert(Dedup.shingleBuilds - sb0 <= 1,
      "p03 + p04 together must shingle the corpus at most once")
    assert(p3.columns.toSeq == Seq("doc_id", "stratum", "n_tok", "shard", "pos"))
    assert(p4.columns.toSeq ==
      Seq("doc_id", "stratum", "n_tok", "shard", "pos", "rep", "split"))
    val proj = rows4.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).sorted.toSeq
    val got = rows3.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(got == proj, "p03 must equal p04 minus the split annotation")
  }
}
