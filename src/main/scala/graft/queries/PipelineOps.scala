package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFns
import graft.operators.Dedup

/** The composed training-data cleaning pipeline — the north-star
  * end-to-end: quality gate -> exact dedup (fingerprint) -> near-dup
  * removal (MinHash LSH + Jaccard) -> surviving-corpus stats. Every
  * stage is an operator proven individually elsewhere; this query
  * proves the COMPOSITION against a single DuckDB oracle.
  */
object PipelineOps extends QuerySet {

  /** ONE pipeline run serves BOTH gate entries. p04 is the pipeline in
    * its training-ready configuration and p03 is provably its
    * projection — CorpusPipelineSpec pins that dropping (rep, split)
    * recovers the split-free output bit-for-bit — so running the full
    * six/seven-stage pipeline separately for each entry bought nothing
    * but wall (the r13 suite paid the whole pipeline twice, ~20 s
    * each co-elapsed at sf0.1). The shared run is memoized per
    * (session, sf dir) and pinned through the bounded cache LRU; the
    * output is pack-limited (hundreds of rows at gate scale), so the
    * pin is tiny. Both entries remain independently hash-checked
    * against their own full oracles.
    */
  private val sharedSplitRun = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), org.apache.spark.sql.DataFrame]()

  /** Drop the shared run and its cache pin (spec/probe hygiene — e.g.
    * a harness that wants to price a FRESH pipeline per measurement
    * instead of the suite's warm-memo regime).
    */
  private[graft] def resetSharedRun(): Unit = {
    sharedSplitRun.values.forEach { df =>
      try df.unpersist() catch { case _: Throwable => }
    }
    sharedSplitRun.clear()
    // p05's memo is the same warm-regime device — a harness pricing a
    // fresh pipeline per measurement must drop BOTH, or p05 keeps
    // serving iteration 1's pinned output (and its cache pin survives)
    incrementalMemo.values.forEach { df =>
      try df.unpersist() catch { case _: Throwable => }
    }
    incrementalMemo.clear()
  }

  private def pipelineWithSplit(s: org.apache.spark.sql.SparkSession,
                                d: String): org.apache.spark.sql.DataFrame =
    sharedSplitRun.computeIfAbsent((s, d), { _ =>
      import s.implicits._
      val docs = Tables.load(s, d, "documents").select($"doc_id", $"text")
      // per-stratum budget = 60% of the distinct-text token mass / 4
      // strata (the probe's sizing rule: dedup removes the copy mass
      // before the pack, so sizing on RAW tokens would never bite)
      val budget = docs.dropDuplicates("text")
        .agg(sum(size(TextFns.tokens($"text")))).collect()(0)
        .getLong(0) * 6 / 10 / 4
      val out = graft.operators.CorpusPipeline.run(docs,
        benchPred = $"doc_id" % 101 === 0,
        budgetPerStratum = budget, nShards = 64,
        trainValSplit = Some(graft.operators.CorpusPipeline.SplitCfg())).out
      graft.operators.Caches.track(out)
    })

  val all: Seq[Q] = Seq(

    Q("p01_clean_corpus",
      (s, d) => {
        import s.implicits._
        val docs = Tables.load(s, d, "documents")
        val words = TextFns.tokens($"text")
        // stage 1: quality gate
        val graded = docs.select($"doc_id", $"source", $"text",
            size(words).cast("long").as("n_tok"))
          .filter($"n_tok" >= 20)
        // stage 2: exact dedup on normalized fingerprint (keep min id)
        val fp = graded.withColumn("fp", md5(TextFns.normalizeText($"text")))
        val wFp = Window.partitionBy($"fp").orderBy($"doc_id".asc)
        val exactDeduped = fp.withColumn("rn", row_number().over(wFp))
          .filter($"rn" === 1).drop("rn", "fp")
        // stage 3: near-dup removal — drop the HIGHER id of any
        // LSH-candidate pair with Jaccard >= 0.8 (computed on the FULL
        // corpus so the drop-set is stable regardless of stage order)
        val nearDupLosers = Dedup.jaccardPairs(docs, $"doc_id", $"text",
            shingleN = 3, k = 16, bands = 4, minSim = 0.8)
          .select($"doc_b".as("doc_id")).distinct()
        val clean = exactDeduped.join(nearDupLosers, Seq("doc_id"), "left_anti")
        // stage 4: surviving-corpus stats per source
        clean.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
               sum($"n_tok").as("total_tokens"),
               min($"doc_id").as("first_doc"))
      },
      Some("""WITH W AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |S AS (SELECT doc_id, CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
             |  ELSE list_transform(range(1, len(words)-1), i -> array_to_string(words[i:i+2], ' ')) END AS sh
             |  FROM W),
             |M AS (SELECT doc_id,
             |  list_transform(range(0,16), i -> list_min(list_transform(sh,
             |    s2 -> ((('0x' || substr(md5('perm:' || i::VARCHAR),1,8))::BIGINT % 1073741824 + 1)
             |           * ('0x' || substr(md5(s2),1,8))::BIGINT
             |           + ('0x' || substr(md5('perm:' || i::VARCHAR),9,8))::BIGINT) % 2147483647))) AS sig
             |  FROM S),
             |B AS (SELECT doc_id, b AS band_idx, md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS band_hash
             |  FROM M, (SELECT unnest(range(0,4)) AS b)),
             |C AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
             |  FROM B a JOIN B c ON a.band_idx = c.band_idx AND a.band_hash = c.band_hash
             |  AND a.doc_id < c.doc_id GROUP BY 1, 2),
             |losers AS (SELECT DISTINCT doc_b AS doc_id FROM C
             |  JOIN S sa ON sa.doc_id = doc_a JOIN S sb ON sb.doc_id = doc_b
             |  WHERE round(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh)))::DOUBLE
             |      / len(list_distinct(sa.sh || sb.sh))::DOUBLE, 6) >= 0.8),
             |graded AS (SELECT d.doc_id, d.source, d.text,
             |  CAST(len(w.words) AS BIGINT) AS n_tok
             |  FROM documents d JOIN W w ON w.doc_id = d.doc_id
             |  WHERE len(w.words) >= 20),
             |exact AS (SELECT doc_id, source, n_tok FROM (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             |    ORDER BY doc_id) AS rn FROM graded) WHERE rn = 1),
             |clean AS (SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM losers))
             |SELECT source, count(*) AS n_docs,
             |CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             |min(doc_id) AS first_doc
             |FROM clean GROUP BY source""".stripMargin)),

    // --- The pipeline with CLUSTER-representative near-dup removal
    // (p01 drops the higher id of each pair, which can over-drop across
    // a transitive chain a-b-c; clustering keeps exactly one doc — the
    // minimum id — per connected component). Quality gate -> CC over
    // the >=0.8 Jaccard graph ([[graft.operators.Dedup.clusters]]) ->
    // keep reps and unpaired docs -> per-source stats.
    Q("p02_clean_corpus_clustered",
      (s, d) => {
        import s.implicits._
        val docs = Tables.load(s, d, "documents")
        val words = TextFns.tokens($"text")
        val graded = docs.select($"doc_id", $"source",
            size(words).cast("long").as("n_tok"))
          .filter($"n_tok" >= 20)
        val pairs = Dedup.jaccardPairs(docs, $"doc_id", $"text",
          shingleN = 3, k = 16, bands = 4, minSim = 0.8)
        val losers = Dedup.clusters(pairs, $"doc_a", $"doc_b")
          .filter($"doc_id" =!= $"cluster_rep")
          .select($"doc_id")
        graded.join(losers, Seq("doc_id"), "left_anti")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
               sum($"n_tok").as("total_tokens"),
               min($"doc_id").as("first_doc"))
      },
      Some("""WITH RECURSIVE W AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |S AS (SELECT doc_id, CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
             |  ELSE list_transform(range(1, len(words)-1), i -> array_to_string(words[i:i+2], ' ')) END AS sh
             |  FROM W),
             |M AS (SELECT doc_id,
             |  list_transform(range(0,16), i -> list_min(list_transform(sh,
             |    s2 -> ((('0x' || substr(md5('perm:' || i::VARCHAR),1,8))::BIGINT % 1073741824 + 1)
             |           * ('0x' || substr(md5(s2),1,8))::BIGINT
             |           + ('0x' || substr(md5('perm:' || i::VARCHAR),9,8))::BIGINT) % 2147483647))) AS sig
             |  FROM S),
             |B AS (SELECT doc_id, b AS band_idx, md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS band_hash
             |  FROM M, (SELECT unnest(range(0,4)) AS b)),
             |C AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
             |  FROM B a JOIN B c ON a.band_idx = c.band_idx AND a.band_hash = c.band_hash
             |  AND a.doc_id < c.doc_id GROUP BY 1, 2),
             |P AS (SELECT doc_a, doc_b
             |  FROM C JOIN S sa ON sa.doc_id = doc_a JOIN S sb ON sb.doc_id = doc_b
             |  WHERE round(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh)))::DOUBLE
             |      / len(list_distinct(sa.sh || sb.sh))::DOUBLE, 6) >= 0.8),
             |E AS (SELECT doc_a AS src, doc_b AS dst FROM P
             |  UNION SELECT doc_b, doc_a FROM P),
             |reach(src, dst) AS (
             |  SELECT src, dst FROM E
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN E e ON r.dst = e.src),
             |losers AS (SELECT src AS doc_id FROM reach GROUP BY src
             |  HAVING least(src, min(dst)) <> src),
             |graded AS (SELECT d.doc_id, d.source,
             |  CAST(len(w.words) AS BIGINT) AS n_tok
             |  FROM documents d JOIN W w ON w.doc_id = d.doc_id
             |  WHERE len(w.words) >= 20)
             |SELECT source, count(*) AS n_docs,
             |CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             |min(doc_id) AS first_doc
             |FROM graded WHERE doc_id NOT IN (SELECT doc_id FROM losers)
             |GROUP BY source""".stripMargin)),

    // --- The FULL composed curation pipeline as one oracled query:
    // gopher gate (native GopherKeep) -> exact dedup -> near-dedup
    // clustering + benchmark decontamination (one shared shingle pass)
    // -> PII redaction -> token-budget pack -> shard assignment —
    // exactly [[graft.operators.CorpusPipeline.run]] in its fused
    // production configuration (Materialize.None, no stats), so the
    // correctness gate covers the plan users actually run. Every stage
    // is individually oracled elsewhere (t18 d01 d02/d04 d08 t17 t11
    // t21); this one DuckDB statement chains all of their
    // restatements CTE-for-CTE.
    Q("p03_full_pipeline",
      // derived from the SHARED p04 run (see [[pipelineWithSplit]]):
      // the split stage is annotation-only, so projecting rep/split
      // away IS the fused production pipeline's output, and the gate
      // pays the pipeline once for both entries
      (s, d) => pipelineWithSplit(s, d).drop("rep", "split"),
      Some(p03Oracle)),

    // --- The day-N form of p03 at the oracle gate: bootstrap the
    // curation state over the FIRST 60% of the corpus (by id), then
    // curate the remaining 40% as an incremental delta against the
    // persisted state (index-probed exact/near dedup, contracted-graph
    // cluster extension, stored-count contamination update,
    // affected-strata re-pack). The operator's contract is output ==
    // monolithic (IncrementalPipelineSpec pins it against
    // CorpusPipeline.run), so the oracle IS p03's oracle, verbatim —
    // DuckDB restates the monolithic pipeline and the incremental
    // composition must hash-match it.
    //
    // ONE incremental execution serves BOTH day-N entries (the same
    // device as the p03/p04 shared run): the state bootstraps WITH the
    // train/val split stage, p06 is the full annotated output gated
    // against p04's oracle verbatim, and p05 is provably its
    // projection — the split stage only ANNOTATES (rep, split), so
    // dropping the two columns recovers the split-free day-N output.
    Q("p05_incremental_pipeline",
      (s, d) => incrementalRun(s, d).drop("rep", "split"),
      Some(p03Oracle)),

    // --- p04's day-N form: incremental curation INCLUDING the
    // leakage-safe split annotation (cluster reps extended over the
    // contracted graph at the looser split threshold, cluster-atomic
    // assignment preserved across days). Oracle = p04's, verbatim.
    Q("p06_incremental_split",
      (s, d) => incrementalRun(s, d),
      Some(p04OracleSql)),

    Q("p04_pipeline_split",
      (s, d) => pipelineWithSplit(s, d),
      Some(p04OracleSql))
  )

  private lazy val p03Oracle: String =
    ("""WITH RECURSIVE W AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |E0 AS (SELECT doc_id, unnest(words) AS w FROM W),
             |C0 AS (SELECT doc_id, w, count(*) AS c FROM E0 GROUP BY 1, 2),
             |D0 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
             |  CAST(max(c) AS BIGINT) AS max_c,
             |  CAST(sum(c * length(w)) AS BIGINT) AS len_sum,
             |  CAST(sum(CASE WHEN w IN ('the','a','and','of','to','is')
             |           THEN c ELSE 0 END) AS BIGINT) AS stop_hits
             |  FROM C0 GROUP BY 1),
             |g AS (SELECT doc_id FROM D0 WHERE n_tok >= 10
             |  AND CAST(len_sum AS DOUBLE) / n_tok >= 2.0
             |  AND CAST(len_sum AS DOUBLE) / n_tok <= 8.0
             |  AND CAST(max_c AS DOUBLE) / n_tok <= 0.3
             |  AND stop_hits >= 1),
             |s2 AS (SELECT doc_id, text FROM (
             |  SELECT d2.doc_id, d2.text, row_number() OVER (
             |    PARTITION BY md5(d2.text) ORDER BY d2.doc_id) AS rn
             |  FROM documents d2 JOIN g ON g.doc_id = d2.doc_id) WHERE rn = 1),
             |S AS (SELECT w.doc_id, CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
             |  ELSE list_transform(range(1, len(words)-1), i -> array_to_string(words[i:i+2], ' ')) END AS sh
             |  FROM W w JOIN s2 ON s2.doc_id = w.doc_id),
             |M AS (SELECT doc_id,
             |  list_transform(range(0,16), i -> list_min(list_transform(sh,
             |    s3 -> ((('0x' || substr(md5('perm:' || i::VARCHAR),1,8))::BIGINT % 1073741824 + 1)
             |           * ('0x' || substr(md5(s3),1,8))::BIGINT
             |           + ('0x' || substr(md5('perm:' || i::VARCHAR),9,8))::BIGINT) % 2147483647))) AS sig
             |  FROM S),
             |B AS (SELECT doc_id, b AS band_idx, md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS band_hash
             |  FROM M, (SELECT unnest(range(0,4)) AS b)),
             |C AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
             |  FROM B a JOIN B c ON a.band_idx = c.band_idx AND a.band_hash = c.band_hash
             |  AND a.doc_id < c.doc_id GROUP BY 1, 2),
             |P AS (SELECT doc_a, doc_b
             |  FROM C JOIN S sa ON sa.doc_id = doc_a JOIN S sb ON sb.doc_id = doc_b
             |  WHERE round(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh)))::DOUBLE
             |      / len(list_distinct(sa.sh || sb.sh))::DOUBLE, 6) >= 0.8),
             |E AS (SELECT doc_a AS src, doc_b AS dst FROM P
             |  UNION SELECT doc_b, doc_a FROM P),
             |reach(src, dst) AS (
             |  SELECT src, dst FROM E
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN E e ON r.dst = e.src),
             |losers AS (SELECT src AS doc_id FROM reach GROUP BY src
             |  HAVING least(src, min(dst)) <> src),
             |keyed AS (SELECT DISTINCT doc_id, md5(u.sh1) AS k
             |  FROM S, unnest(S.sh) AS u(sh1)),
             |bl AS (SELECT DISTINCT k FROM keyed WHERE doc_id % 101 = 0),
             |contam AS (SELECT doc_id FROM keyed
             |  WHERE doc_id % 101 <> 0 AND k IN (SELECT k FROM bl)
             |  GROUP BY doc_id HAVING count(*) >= 20),
             |s4 AS (SELECT doc_id, text FROM s2
             |  WHERE doc_id NOT IN (SELECT doc_id FROM losers)
             |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
             |s5 AS (SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
             |    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
             |    '\b(\d{1,3}\.){3}\d{1,3}\b', '<IPV4>', 'g') AS rt
             |  FROM s4),
             |W5 AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(rt), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM s5),
             |f AS (SELECT doc_id, doc_id % 4 AS stratum,
             |  CAST(len(words) AS BIGINT) AS n_tok,
             |  round(least(1.0, CAST(len(words) AS DOUBLE) / 50.0) * 0.5 +
             |    (CAST(len(list_filter(words, w2 -> w2 IN ('the','a','and','of','to','is'))) AS DOUBLE)
             |     / CAST(len(words) AS DOUBLE)) * 0.5, 6) AS quality
             |  FROM W5),
             |bud AS (SELECT (CAST(sum(len(list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))) AS BIGINT)
             |    * 6) // 10 // 4 AS b
             |  FROM (SELECT DISTINCT text FROM documents)),
             |gp AS (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY stratum
             |  ORDER BY quality DESC, doc_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM f),
             |packed AS (SELECT doc_id, stratum, n_tok FROM gp
             |  WHERE cum <= (SELECT b FROM bud)),
             |H AS (SELECT doc_id, stratum, n_tok,
             |  md5('graft-shard:42:' || CAST(doc_id AS VARCHAR)) AS h FROM packed)
             |SELECT doc_id, stratum, n_tok,
             |  ('0x' || h[1:4])::BIGINT % 64 AS shard,
             |  CAST(row_number() OVER (PARTITION BY ('0x' || h[1:4])::BIGINT % 64
             |    ORDER BY h, doc_id) AS BIGINT) AS pos
             |FROM H""").stripMargin

    // --- p03 + the leakage-safe train/val stage: the pipeline in its
    // training-ready configuration. The split threshold (0.3) is
    // deliberately LOOSER than the near-dedup drop threshold (0.8):
    // documents at 0.3 <= sim < 0.8 survive dedup yet leak a rephrased
    // validation set under a per-document hash split, so assignment is
    // by the cluster representative over the looser pair graph —
    // computed on the post-exact corpus so transitive leakage THROUGH a
    // dropped intermediate still binds its endpoints to one side. The
    // oracle is p03's chain plus a second recursive-CC closure (P3/E3/
    // reach3 — same S/C band tables, mirroring the operator's memo
    // reuse) and the d10 hex-conv bucket rule on the representative.
  private lazy val p04OracleSql: String =
    ("""WITH RECURSIVE W AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |E0 AS (SELECT doc_id, unnest(words) AS w FROM W),
             |C0 AS (SELECT doc_id, w, count(*) AS c FROM E0 GROUP BY 1, 2),
             |D0 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
             |  CAST(max(c) AS BIGINT) AS max_c,
             |  CAST(sum(c * length(w)) AS BIGINT) AS len_sum,
             |  CAST(sum(CASE WHEN w IN ('the','a','and','of','to','is')
             |           THEN c ELSE 0 END) AS BIGINT) AS stop_hits
             |  FROM C0 GROUP BY 1),
             |g AS (SELECT doc_id FROM D0 WHERE n_tok >= 10
             |  AND CAST(len_sum AS DOUBLE) / n_tok >= 2.0
             |  AND CAST(len_sum AS DOUBLE) / n_tok <= 8.0
             |  AND CAST(max_c AS DOUBLE) / n_tok <= 0.3
             |  AND stop_hits >= 1),
             |s2 AS (SELECT doc_id, text FROM (
             |  SELECT d2.doc_id, d2.text, row_number() OVER (
             |    PARTITION BY md5(d2.text) ORDER BY d2.doc_id) AS rn
             |  FROM documents d2 JOIN g ON g.doc_id = d2.doc_id) WHERE rn = 1),
             |S AS (SELECT w.doc_id, CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
             |  ELSE list_transform(range(1, len(words)-1), i -> array_to_string(words[i:i+2], ' ')) END AS sh
             |  FROM W w JOIN s2 ON s2.doc_id = w.doc_id),
             |M AS (SELECT doc_id,
             |  list_transform(range(0,16), i -> list_min(list_transform(sh,
             |    s3 -> ((('0x' || substr(md5('perm:' || i::VARCHAR),1,8))::BIGINT % 1073741824 + 1)
             |           * ('0x' || substr(md5(s3),1,8))::BIGINT
             |           + ('0x' || substr(md5('perm:' || i::VARCHAR),9,8))::BIGINT) % 2147483647))) AS sig
             |  FROM S),
             |B AS (SELECT doc_id, b AS band_idx, md5(array_to_string(sig[b*4+1:b*4+4], ',')) AS band_hash
             |  FROM M, (SELECT unnest(range(0,4)) AS b)),
             |C AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b
             |  FROM B a JOIN B c ON a.band_idx = c.band_idx AND a.band_hash = c.band_hash
             |  AND a.doc_id < c.doc_id GROUP BY 1, 2),
             |JS AS (SELECT doc_a, doc_b,
             |  round(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh)))::DOUBLE
             |      / len(list_distinct(sa.sh || sb.sh))::DOUBLE, 6) AS jac
             |  FROM C JOIN S sa ON sa.doc_id = doc_a JOIN S sb ON sb.doc_id = doc_b),
             |P AS (SELECT doc_a, doc_b FROM JS WHERE jac >= 0.8),
             |E AS (SELECT doc_a AS src, doc_b AS dst FROM P
             |  UNION SELECT doc_b, doc_a FROM P),
             |reach(src, dst) AS (
             |  SELECT src, dst FROM E
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN E e ON r.dst = e.src),
             |losers AS (SELECT src AS doc_id FROM reach GROUP BY src
             |  HAVING least(src, min(dst)) <> src),
             |P3 AS (SELECT doc_a, doc_b FROM JS WHERE jac >= 0.3),
             |E3 AS (SELECT doc_a AS src, doc_b AS dst FROM P3
             |  UNION SELECT doc_b, doc_a FROM P3),
             |reach3(src, dst) AS (
             |  SELECT src, dst FROM E3
             |  UNION
             |  SELECT r.src, e.dst FROM reach3 r JOIN E3 e ON r.dst = e.src),
             |R3 AS (SELECT src AS doc_id, least(src, min(dst)) AS rep
             |  FROM reach3 GROUP BY src),
             |keyed AS (SELECT DISTINCT doc_id, md5(u.sh1) AS k
             |  FROM S, unnest(S.sh) AS u(sh1)),
             |bl AS (SELECT DISTINCT k FROM keyed WHERE doc_id % 101 = 0),
             |contam AS (SELECT doc_id FROM keyed
             |  WHERE doc_id % 101 <> 0 AND k IN (SELECT k FROM bl)
             |  GROUP BY doc_id HAVING count(*) >= 20),
             |s4 AS (SELECT doc_id, text FROM s2
             |  WHERE doc_id NOT IN (SELECT doc_id FROM losers)
             |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
             |s5 AS (SELECT doc_id,
             |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
             |    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
             |    '\b(\d{1,3}\.){3}\d{1,3}\b', '<IPV4>', 'g') AS rt
             |  FROM s4),
             |W5 AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(rt), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM s5),
             |f AS (SELECT doc_id, doc_id % 4 AS stratum,
             |  CAST(len(words) AS BIGINT) AS n_tok,
             |  round(least(1.0, CAST(len(words) AS DOUBLE) / 50.0) * 0.5 +
             |    (CAST(len(list_filter(words, w2 -> w2 IN ('the','a','and','of','to','is'))) AS DOUBLE)
             |     / CAST(len(words) AS DOUBLE)) * 0.5, 6) AS quality
             |  FROM W5),
             |bud AS (SELECT (CAST(sum(len(list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))) AS BIGINT)
             |    * 6) // 10 // 4 AS b
             |  FROM (SELECT DISTINCT text FROM documents)),
             |gp AS (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY stratum
             |  ORDER BY quality DESC, doc_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM f),
             |packed AS (SELECT doc_id, stratum, n_tok FROM gp
             |  WHERE cum <= (SELECT b FROM bud)),
             |H AS (SELECT doc_id, stratum, n_tok,
             |  md5('graft-shard:42:' || CAST(doc_id AS VARCHAR)) AS h FROM packed)
             |SELECT H.doc_id, stratum, n_tok,
             |  ('0x' || h[1:4])::BIGINT % 64 AS shard,
             |  CAST(row_number() OVER (PARTITION BY ('0x' || h[1:4])::BIGINT % 64
             |    ORDER BY h, H.doc_id) AS BIGINT) AS pos,
             |  COALESCE(R3.rep, H.doc_id) AS rep,
             |  CASE WHEN ('0x' || substr(md5('graft-split:42:' ||
             |      CAST(COALESCE(R3.rep, H.doc_id) AS VARCHAR)), 1, 2))::BIGINT < 230
             |    THEN 'train' ELSE 'val' END AS split
             |FROM H LEFT JOIN R3 ON R3.doc_id = H.doc_id""").stripMargin

  /** ONE bootstrap+incremental execution per (session, sf dir), like
    * [[pipelineWithSplit]]; state lands in a fresh temp directory. The
    * state bootstraps WITH the split stage so the single run serves
    * p06 directly and p05 as its (rep, split)-free projection.
    */
  private val incrementalMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String), org.apache.spark.sql.DataFrame]()

  private def incrementalRun(s: org.apache.spark.sql.SparkSession,
                             d: String): org.apache.spark.sql.DataFrame =
    incrementalMemo.computeIfAbsent((s, d), { _ =>
      import s.implicits._
      val docs = Tables.load(s, d, "documents").select($"doc_id", $"text")
      val budget = docs.dropDuplicates("text")
        .agg(sum(size(TextFns.tokens($"text")))).collect()(0)
        .getLong(0) * 6 / 10 / 4
      val cut = docs.agg(max($"doc_id")).collect()(0).getLong(0) * 3 / 5
      val bench = $"doc_id" % 101 === 0
      val dir = java.nio.file.Files.createTempDirectory("graft-incpipe")
        .toFile.getAbsolutePath
      graft.operators.IncrementalPipeline.bootstrap(dir,
        docs.filter($"doc_id" <= cut), bench,
        graft.operators.IncrementalPipeline.Params(budget,
          split = Some(graft.operators.CorpusPipeline.SplitCfg())))
      val out = graft.operators.IncrementalPipeline.runIncremental(dir,
        docs.filter($"doc_id" > cut), bench)
      graft.operators.Caches.track(out)
    })
}
