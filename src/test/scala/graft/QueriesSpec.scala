package graft

/** Smoke coverage: every registered query runs at sf0.001 and returns a
  * schema with at least one row-producing plan (full value correctness
  * is the driver's DuckDB gate; see tools/check.py).
  */
class QueriesSpec extends SparkSpec {

  /** Partitionings of the DISTINCT shuffle Exchanges in the physical
    * plan, descending through AQE wrappers (plain `collect` stops at
    * the AdaptiveSparkPlanExec boundary and sees nothing) and deduping
    * by node identity — after execution, AQE reuses identical shuffle
    * stages, and a reused stage must count once (it IS one shuffle).
    * Call on an EXECUTED plan when pinning runtime shuffle counts.
    */
  private def shufflePartitionings(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.catalyst.plans.physical.Partitioning] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[org.apache.spark.sql.execution.SparkPlan, java.lang.Boolean]())
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.catalyst.plans.physical.Partitioning] = {
      if (!seen.add(p)) return Seq.empty // reused subtree: already counted
      val self = p match {
        case e: ShuffleExchangeExec => Seq(e.outputPartitioning)
        case _ => Seq.empty
      }
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      self ++ nested.flatMap(walk)
    }
    walk(p)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query is registered, runnable, and non-degenerate") {
    val qs = SparkEntry.queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      // an empty result passes any oracle while testing nothing — a
      // degenerate filter (it happened: q10's first draft matched every
      // customer) must fail loudly here
      val n = fn(spark, sf0001).count()
      assert(n >= 1, s"$name returned 0 rows — degenerate query")
    }
  }

  test("no query silently plans a nested-loop/cartesian join") {
    // BNLJ/cartesian means a missing equi key — quadratic at scale. The
    // allowlist is the set where the nested loop IS the algorithm:
    //   q27, q37: one-row global-threshold broadcast (Catalyst constant-
    //             folds the dummy equi key away — the one-row nested
    //             loop IS the right plan)
    //   s01: brute-force kNN, the exact baseline (scan x broadcast queries)
    //   s04/s05: nprobe ranking against 16 broadcast centroids
    //   t19: one-row corpus-total broadcast onto the vocab table (the
    //        same global-threshold shape as q27/q37)
    //   t25/t26/t27: one-row occurrence-totals broadcast onto the
    //        4096-row bucket-counts table (the t19 shape — both sides
    //        bounded; t26 is the same weigh stage over the persisted
    //        features, t27 the same weigh stage with the PrefixSum
    //        rank cut below it)
    //   s06/s07: the sketch PASS is definitionally scan x broadcast
    //        queries (every corpus row gets a sketch score — that is
    //        the operator's contract; the expensive exact re-rank
    //        below it is an equi join on the m survivors)
    val allow = Set("q27_important_parts", "q37_global_sales_opportunity",
      "s01_knn_bruteforce", "s04_knn_ivf", "s05_knn_ivf_indexed",
      "t19_unigram_logprob", "t25_dsir_select", "t26_dsir_indexed",
      "t27_dsir_rankcut",
      "s06_knn_sketch_rerank", "s07_knn_sketch_indexed")
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
      val bad = plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("CartesianProduct")
      assert(allow(name) || !bad,
        s"$name plans a nested-loop/cartesian join:\n$plan")
    }
  }

  test("q36 shuffles the fact table once; stats + probes ride the orderkey partitioning") {
    // The r12 rewrite's scale contract: lineitem is shuffled exactly
    // once (the orders join); the per-(order,supplier) and per-order
    // aggregations plus the stats join all reuse HashPartitioning on
    // the order key, and the supplier dim joins by broadcast. Expected
    // hash exchanges: lineitem, orders, and the final tiny s_name
    // aggregation — three, with zero range exchanges. Auto-broadcast
    // off so sf0.001's tiny inputs can't mask the 100 TB shape.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val exec = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      val df = SparkEntry.queries("q36_waiting_suppliers")(spark, sf0001)
      df.collect() // run it: AQE only DEDUPES the twin lineitem/orders
                   // exchanges into reused stages at execution time
      df.queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning}
    val parts = shufflePartitionings(exec)
    assert(!parts.exists(_.isInstanceOf[RangePartitioning]),
      s"q36 must not global-sort:\n$exec")
    assert(parts.count(_.isInstanceOf[HashPartitioning]) == 3,
      s"q36 must shuffle lineitem/orders/final-agg only, got $parts:\n$exec")
    assert(exec.toString.contains("BroadcastHashJoin"),
      s"supplier dim must broadcast:\n$exec")
  }

  test("x04 never shuffles the token cardinality: one object-agg merge + broadcast recount") {
    // The claim behind the heavy-hitters sketch: at 100 TB an exact
    // GROUP BY token shuffles every distinct key; x04 must plan as
    // (a) a partial/final ObjectHashAggregate pair for the MG sketch —
    //     the only exchange for the sketch is the SinglePartition
    //     final-merge (p maps of <= m entries each);
    // (b) a BroadcastHashJoin feeding the candidate recount, so the
    //     recount's hash shuffle carries <= m distinct keys;
    // (c) NO range exchange (repo-wide no-global-sort rule).
    val df = SparkEntry.queries("x04_heavy_hitters")(spark, sf0001)
    df.collect()
    val exec = df.queryExecution.executedPlan
    val plan = exec.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"MG sketch must plan as an object aggregate (partial+final):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate set must broadcast into the recount:\n$plan")
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    val parts = shufflePartitionings(exec)
    assert(!parts.exists(_.isInstanceOf[RangePartitioning]),
      s"x04 must not global-sort:\n$plan")
    // (d) exactly TWO corpus scans: n rides the sketch agg, so the
    //     plan is sketch pass + candidate recount and nothing else
    //     (a third scan = the r13 standalone words.count() regression)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val self = p match { case f: FileSourceScanExec => Seq(f); case _ => Seq.empty }
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case _ => p.children
      }
      self ++ nested.flatMap(scans)
    }
    //     At sf0.001 AQE goes further still: the sketch pass and the
    //     recount share the load-spread exchange as a reused stage, so
    //     the parquet scan runs ONCE — identity-dedup then sees 1.
    val docScans = scans(exec).filter(_.relation.location.rootPaths
      .exists(_.toString.contains("documents")))
    assert(docScans.size <= 2 && docScans.nonEmpty,
      s"x04 must scan documents at most twice, saw ${docScans.size}:\n$plan")
  }

  test("t19 broadcasts only the min-count-pruned vocab head; the residue joins by shuffle") {
    // The r10 weak mark: broadcasting the UNPRUNED distinct-token vocab
    // OOMs the driver at web scale (billions of typo/UUID-tail rows).
    // Pin the skew-split shape: both count-threshold filters present, a
    // broadcast join for the head AND the anti-split, and a genuine
    // shuffle join (SMJ/ShuffledHash) for the rare-token residue — the
    // shape that proves the full vocab is never a broadcast build side.
    // size-based auto-broadcast off: at sf0.001 Catalyst would happily
    // broadcast EVERYTHING (all inputs are tiny), hiding the intent.
    // With it off, only the explicit broadcast() hints survive — which
    // is exactly the 100 TB plan, where no input is auto-broadcastable.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val plan = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
      SparkEntry.queries("t19_unigram_logprob")(spark, sf0001)
        .queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert("0.002".r.findAllIn(plan).size >= 2,
      s"t19 lost the head/tail share-threshold split filters:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"t19 head join and anti-split must both be broadcast joins:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"t19 must route non-head rows via a broadcast LEFT ANTI:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"t19 residue must shuffle-join (full vocab must never broadcast):\n$plan")
    // and the fixture must exercise BOTH paths, or the split is untested
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cut = org.apache.spark.sql.functions.expr(
      s"sum(g) over () * ${graft.queries.TextOps.VocabHeadShare}")
    val g = Tables.load(spark, sf0001, "documents")
      .select(explode(graft.functions.TextFns.tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("g"))
      .withColumn("cut", cut)
      .agg(sum(when($"g" >= $"cut", 1).otherwise(0)).as("nHead"),
           sum(when($"g" < $"cut", 1).otherwise(0)).as("nTail")).collect()(0)
    assert(g.getLong(0) > 0 && g.getLong(1) > 0,
      s"sf0.001 vocab does not exercise both split paths: $g")
  }

  test("q25 filters lineitem BELOW the per-(partkey,suppkey) aggregation") {
    // The round-6 plan-audit finding: joining the p_size filter in AFTER
    // the aggregations made both agg levels chew ~3.5x the needed input
    // and q25 the worst 100x join-probe ratio (13.2x; 5.6x once fixed).
    // Pin the shape so a refactor can't silently reintroduce it: every
    // two-key aggregate (the per-(partkey,suppkey) level — the plan
    // references it twice via the join-back) must sit on an input
    // already semi-joined against the qualifying part keys.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    val plan = SparkEntry.queries("q25_min_cost_supplier")(spark, sf0001)
      .queryExecution.optimizedPlan
    val pairAggs = plan.collect {
      case a: Aggregate if a.groupingExpressions.size == 2 => a
    }
    assert(pairAggs.nonEmpty, s"expected per-(partkey,suppkey) aggregates:\n$plan")
    pairAggs.foreach { a =>
      val semiBelow = a.child.collect {
        case j: Join if j.joinType == LeftSemi => j
      }
      assert(semiBelow.nonEmpty,
        s"aggregation input is not pre-filtered by the part semi join:\n$plan")
    }
  }

  test("x01 tolerance contract: booleans hold, and the raw sketch really " +
       "sits within the pinned bounds") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // x01's registered output IS the contract (tol booleans + exact n,
    // fully DuckDB-oracled); this pin (a) asserts the shipped booleans
    // are true — never null — at sf0001, and (b) recomputes the RAW
    // estimate-vs-exact comparison independently, so a bug in the
    // in-query boolean logic (e.g. an accidental lit(true)) cannot
    // self-certify.
    val contract = SparkEntry.queries("x01_sketch_aggregates")(spark, sf0001)
      .collect()
    assert(contract.nonEmpty)
    contract.foreach { r =>
      assert(r.getAs[Boolean]("users_tol_ok"), s"contract violated: $r")
      assert(r.getAs[Boolean]("median_tol_ok"), s"contract violated: $r")
    }
    val raw = Tables.load(spark, sf0001, "events")
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", 0.01).as("approx_users"),
        percentile_approx($"value", lit(0.5), lit(1000)).as("median_value"),
        countDistinct($"user_id").as("nd_users"),
        expr("percentile(value, 0.49)").as("p_lo"),
        expr("percentile(value, 0.51)").as("p_hi"))
      .collect()
    assert(raw.nonEmpty)
    raw.foreach { r =>
      val approxU = r.getAs[Long]("approx_users").toDouble
      val exactU = r.getAs[Long]("nd_users").toDouble
      // rsd 0.01 requested -> 5 sigma tolerance, the shipped constant
      assert(math.abs(approxU - exactU) / exactU <= queries.SketchOps.HllRtol,
        s"HLL count off >${queries.SketchOps.HllRtol}: $r")
      val med = r.getAs[Double]("median_value")
      assert(med >= r.getAs[Double]("p_lo") && med <= r.getAs[Double]("p_hi"),
        s"approx median outside exact [p49, p51] band: $r")
    }
  }

  test("x03 tolerance contract holds; union merges multiple day sketches; " +
       "deterministic across runs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val merged = SparkEntry.queries("x03_sketch_columns")(spark, sf0001)
    val rows = merged.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("users_tol_ok"), s"contract violated: $r")
      // the union actually merged multiple day sketches
      assert(r.getAs[Long]("n_day_sketches") > 1, s"degenerate: $r")
    }
    // independent raw pin: merged-union estimate vs exact, outside the
    // query's own boolean
    val ev = Tables.load(spark, sf0001, "events")
    val est = ev.groupBy($"event_type", to_date($"ts").as("day"))
      .agg(hll_sketch_agg($"user_id", lit(12)).as("sk"))
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("approx_users"))
    val exact = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("nd_users"))
    est.join(exact, "event_type").collect().foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val ex = r.getAs[Long]("nd_users").toDouble
      assert(math.abs(approx - ex) / ex <= queries.SketchOps.HllRtol,
        s"merged HLL estimate off >${queries.SketchOps.HllRtol}: $r")
    }
    // determinism across runs (register-max union is order-independent)
    val again = SparkEntry.queries("x03_sketch_columns")(spark, sf0001)
      .collect().map(_.toString).sorted
    assert(again.sameElements(rows.map(_.toString).sorted))
  }

  test("dedup/minhash operators are deterministic across runs") {
    val a = SparkEntry.queries("d02_minhash_lsh")(spark, sf0001).collect().toSet
    val b = SparkEntry.queries("d02_minhash_lsh")(spark, sf0001).collect().toSet
    assert(a == b)
  }

  test("e07 funnel stages are ordered and the 24h bound discriminates") {
    val rows = SparkEntry.queries("e07_funnel")(spark, sf0001)
      .orderBy("stage").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq == Seq("1_view", "2_click", "3_purchase"))
    val Seq(v, c, p) = rows.map(_._2).toSeq
    assert(v >= c && c >= p, s"funnel not monotone: $v/$c/$p")
    // the conversion window must actually cut (an unbounded funnel on
    // this dense fixture converts every user at every stage)
    assert(c < v, s"24h click bound did not discriminate: $v/$c")
  }

  test("no query plans a range-partitioned (global-sort) exchange") {
    // The q32 bug class, pinned repo-wide: Spark 4.1's decorrelation of
    // LATERAL ... ORDER BY ... LIMIT planned a total-order
    // rangepartitioning Exchange over the whole fact table — 9.7 s at
    // the 100x probe where the rank-filter form costs 1.8 s. No query
    // in the suite needs a global sort: top-k compiles to
    // TakeOrderedAndProject (sort only what survives the limit,
    // per-partition, then a driver merge of k-row heads), ordering
    // within groups is a window over a hash exchange. A
    // rangepartitioning Exchange appearing anywhere is a planner
    // regression or a new query shipping an at-scale serialization
    // point — fail it here, at sf0.001, before a probe has to find it.
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
      assert(!plan.contains("rangepartitioning"),
        s"$name plans a global-sort exchange:\n$plan")
    }
  }

  test("t21 shard assignment: balanced seeded shards, dense in-shard order, no global sort") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("t21_shard_assign")(spark, sf0001).cache()
    try {
      // shard ids are the 2-hex-digit prefix domain, and md5 uniformity
      // must spread the fixture across many of them
      val stats = df.agg(min(col("shard")), max(col("shard")),
        countDistinct(col("shard")), count(lit(1))).collect()(0)
      assert(stats.getLong(0) >= 0 && stats.getLong(1) <= 255)
      assert(stats.getLong(2) > 100,
        s"only ${stats.getLong(2)} of 256 shards hit — not uniform")
      // positions are a dense 1..n ranking inside every shard
      val badPos = df.groupBy(col("shard"))
        .agg(count(lit(1)).as("n"), min(col("pos")).as("lo"),
          max(col("pos")).as("hi"), countDistinct(col("pos")).as("d"))
        .filter(col("lo") =!= 1 || col("hi") =!= col("n") || col("d") =!= col("n"))
      assert(badPos.count() == 0, "in-shard positions are not dense 1..n")
      // seeded determinism: a rerun is row-identical
      val rerun = SparkEntry.queries("t21_shard_assign")(spark, sf0001)
      assert(df.exceptAll(rerun).isEmpty && rerun.exceptAll(df).isEmpty,
        "shard assignment must be stable across runs")
    } finally df.unpersist()
    // the 100 TB shape: ONE hash shuffle on the shard id, independent
    // in-partition sorts, and NO total-order range exchange anywhere —
    // the plan property that separates this from orderBy(rand())
    // count typed plan NODES, not plan-string substrings — formatting
    // or AQE reuse wrappers moving the rendered text must not flip this
    val exec = SparkEntry.queries("t21_shard_assign")(spark, sf0001)
      .queryExecution.executedPlan
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning}
    val exchanges = shufflePartitionings(exec)
    assert(!exchanges.exists(_.isInstanceOf[RangePartitioning]),
      s"t21 must never global-sort:\n$exec")
    assert(exchanges.count(_.isInstanceOf[HashPartitioning]) == 1,
      s"t21 must shuffle exactly once, on the shard id:\n$exec")
  }

  test("t22 strip discriminates, and untouched docs reconstruct their exact token stream") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = SparkEntry.queries("t22_boilerplate_strip")(spark, sf0001).cache()
    try {
      val stripped = df.filter(col("n_kept") < col("n_chunks")).count()
      assert(stripped > 0, "fixture must exercise the strip path")
      assert(stripped < df.count(), "strip must not hit every doc")
      // reconstruction identity: a doc that lost nothing must emit its
      // token stream verbatim (chunks rejoined in order == tokens
      // joined) — the invariant that catches any ordering or
      // chunk-boundary bug in the collect_list/sort_array rebuild
      val orig = Tables.load(spark, sf0001, "documents")
        .select(col("doc_id"),
          array_join(graft.functions.TextFns.tokens(col("text")), " ").as("norm"))
      val drift = df.filter(col("n_kept") === col("n_chunks"))
        .join(orig, "doc_id").filter(col("clean_text") =!= col("norm"))
      assert(drift.count() == 0, "untouched docs must reconstruct verbatim")
    } finally df.unpersist()
  }

  test("e08 attribution conserves purchases and revenue across channels") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("e08_attribution")(spark, sf0001).cache()
    try {
      assert(df.count() >= 2, "fixture must produce multiple channels")
      val ev = Tables.load(spark, sf0001, "events")
        .filter(col("event_type") === "purchase")
      val total = ev.count()
      val attributed = df.agg(sum(col("n_purchases"))).collect()(0).getLong(0)
      assert(attributed == total,
        s"every purchase books exactly once: $attributed of $total")
      val rev = df.agg(sum(col("revenue"))).collect()(0).getDouble(0)
      val exact = ev.agg(sum(col("value"))).collect()(0).getDouble(0)
      assert(math.abs(rev - exact) < 0.05 * df.count(),
        s"revenue conserved up to per-channel 2dp rounding: $rev vs $exact")
    } finally df.unpersist()
  }

  test("t18 gopher flags discriminate and keep is exactly their conjunction") {
    import org.apache.spark.sql.functions.col
    val df = SparkEntry.queries("t18_gopher_filters")(spark, sf0001).cache()
    try {
      val n = df.count()
      val k = df.filter(col("keep")).count()
      assert(k > 0 && k < n, s"keep does not discriminate: $k of $n")
      val drift = df.filter(col("keep") =!=
        (col("ok_len") && col("ok_word_len") && col("ok_rep") && col("ok_stop")))
      assert(drift.count() == 0, "keep diverged from its component flags")
    } finally df.unpersist()
  }

  test("t19 buckets partition the score line and the vocab join broadcasts") {
    import org.apache.spark.sql.functions.{col, min, max}
    val df = SparkEntry.queries("t19_unigram_logprob")(spark, sf0001).cache()
    try {
      val mm = df.groupBy("bucket").agg(min("logprob"), max("logprob"))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      assert(mm.keySet == Set("head", "middle", "tail"),
        s"expected all three buckets on the fixture, got ${mm.keySet}")
      assert(mm("head")._1 >= -3.40 && mm("middle")._1 >= -3.41 &&
        mm("middle")._2 < -3.40 && mm("tail")._2 < -3.41,
        s"bucket ranges overlap the cuts: $mm")
      // Zipf-skewed post-explode join key: the vocab side must broadcast,
      // never shuffle (a shuffle join would hot-spot on the head word)
      val plan = SparkEntry.queries("t19_unigram_logprob")(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"vocab join is not a broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"t19 planned a shuffle join on the exploded word key:\n$plan")
    } finally df.unpersist()
  }
}
