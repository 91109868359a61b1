package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.Dedup

/** Deduplication operators (north-star contract): exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine — implementations in
  * [[graft.operators.Dedup]], oracles restate the identical md5-based
  * hash families in DuckDB dialect (see [[graft.functions.TextFns]]
  * scaladoc for the portable-hashing convention).
  */
object DedupOps extends QuerySet {

  /** Shared oracle CTE prefix through the band table (W words,
    * S 3-gram shingles, M 16-perm minhash, B 4-band keys).
    */
  private val bandsCte =
    """WITH W AS (SELECT doc_id,
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
      |  FROM M, (SELECT unnest(range(0,4)) AS b))""".stripMargin

  /** bandsCte + C: corpus-wide candidate pairs (doc_a < doc_b). */
  private val shinglesCte = s"""$bandsCte,
    |C AS (SELECT a.doc_id AS doc_a, c.doc_id AS doc_b, count(*) AS n_shared_bands
    |  FROM B a JOIN B c ON a.band_idx = c.band_idx AND a.band_hash = c.band_hash
    |  AND a.doc_id < c.doc_id GROUP BY 1, 2)""".stripMargin

  /** d11/d13 share this oracle tail verbatim (same-cell cosine pairs
    * above τ, recursive-CC representatives, kept flag) — only the
    * assignment CTE prefix differs: d11's explicit dial over the whole
    * corpus vs d13's auto-dial slice.
    */
  private lazy val semDedupTail = """,
    |ev AS (SELECT e.vec_id, v, cell FROM e JOIN cassign USING (vec_id)),
    |P AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    |  round(list_sum(list_transform(range(1,65), i -> a.v[i]*b.v[i])) /
    |    (sqrt(list_sum(list_transform(a.v, x -> x*x))) *
    |     sqrt(list_sum(list_transform(b.v, x -> x*x)))), 6) AS cos
    |  FROM ev a JOIN ev b ON a.cell = b.cell AND a.vec_id < b.vec_id),
    |PF AS (SELECT id_a, id_b FROM P WHERE cos > 0.3),
    |EDG AS (SELECT id_a AS src, id_b AS dst FROM PF
    |  UNION SELECT id_b, id_a FROM PF),
    |reach(src, dst) AS (
    |  SELECT src, dst FROM EDG
    |  UNION
    |  SELECT r.src, g.dst FROM reach r JOIN EDG g ON r.dst = g.src),
    |comp AS (SELECT src AS vec_id, least(src, min(dst)) AS rep
    |  FROM reach GROUP BY src)
    |SELECT ev.vec_id, CAST(ev.cell AS BIGINT) AS cell,
    |  COALESCE(comp.rep, ev.vec_id) AS rep,
    |  (COALESCE(comp.rep, ev.vec_id) = ev.vec_id) AS kept
    |FROM ev LEFT JOIN comp USING (vec_id)""".stripMargin

  val all: Seq[Q] = Seq(

    // --- Exact dedup: keep the first record per key in (ts, id) order.
    Q("d01_exact_dedup",
      (s, d) => {
        import s.implicits._
        Dedup.exactFirst(Tables.load(s, d, "events"),
            Seq($"user_id", $"event_type"), Seq($"ts_ns".asc, $"event_id".asc))
          .select($"user_id", $"event_type", $"event_id".as("first_event_id"))
      },
      Some("""SELECT user_id, event_type, event_id AS first_event_id
             |FROM (SELECT user_id, event_type, event_id,
             |  row_number() OVER (PARTITION BY user_id, event_type
             |                     ORDER BY ts, event_id) AS rn
             |  FROM events) WHERE rn = 1""".stripMargin)),

    // --- MinHash+LSH candidate pairs (shingle 3-grams, k=16, 4 bands x
    // 4 rows). The join is equi on the band key — linear shuffle, no
    // cross product.
    Q("d02_minhash_lsh",
      (s, d) => {
        import s.implicits._
        Dedup.minhashCandidates(Tables.load(s, d, "documents"),
          $"doc_id", $"text", shingleN = 3, k = 16, bands = 4)
      },
      Some(s"""$shinglesCte
              |SELECT doc_a, doc_b, n_shared_bands FROM C""".stripMargin)),

    // --- SimHash 32-bit fingerprint per document.
    Q("d03_simhash",
      (s, d) => {
        import s.implicits._
        Dedup.simhash(Tables.load(s, d, "documents"), $"doc_id", $"text", bits = 32)
      },
      Some("""WITH W AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents)
             |SELECT doc_id, array_to_string(list_transform(range(1,33), j ->
             |  CASE WHEN list_sum(list_transform(words,
             |    w -> CASE WHEN substr(md5(w), j, 1) >= '8' THEN 1 ELSE -1 END)) > 0
             |  THEN '1' ELSE '0' END), '') AS simhash
             |FROM W""".stripMargin)),

    // --- LSH candidates refined by exact shingle-set Jaccard.
    Q("d04_ngram_jaccard",
      (s, d) => {
        import s.implicits._
        Dedup.jaccardPairs(Tables.load(s, d, "documents"),
          $"doc_id", $"text", shingleN = 3, k = 16, bands = 4, minSim = 0.3)
      },
      Some(s"""$shinglesCte
              |SELECT doc_a, doc_b,
              |round(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh)))::DOUBLE
              |    / len(list_distinct(sa.sh || sb.sh))::DOUBLE, 6) AS jaccard
              |FROM C JOIN S sa ON sa.doc_id = doc_a JOIN S sb ON sb.doc_id = doc_b
              |WHERE round(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh)))::DOUBLE
              |    / len(list_distinct(sa.sh || sb.sh))::DOUBLE, 6) >= 0.3""".stripMargin)),

    // --- Edit-distance refinement of LSH candidates: levenshtein over
    // normalized 80-char prefixes (bounded DP cost per pair; the
    // candidate set keeps the pair count linear).
    Q("d06_edit_distance",
      (s, d) => {
        import s.implicits._
        import graft.functions.TextFns
        val docs = Tables.load(s, d, "documents")
        val norm = docs.select($"doc_id",
          substring(TextFns.normalizeText($"text"), 1, 80).as("prefix"))
        Dedup.minhashCandidates(docs, $"doc_id", $"text")
          .join(norm.toDF("doc_a", "pref_a"), "doc_a")
          .join(norm.toDF("doc_b", "pref_b"), "doc_b")
          .select($"doc_a", $"doc_b",
            levenshtein($"pref_a", $"pref_b").cast("long").as("edit_dist"))
      },
      Some(s"""$shinglesCte,
              |N AS (SELECT doc_id,
              |  substr(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), 1, 80) AS prefix
              |  FROM documents)
              |SELECT doc_a, doc_b,
              |CAST(levenshtein(na.prefix, nb.prefix) AS BIGINT) AS edit_dist
              |FROM C JOIN N na ON na.doc_id = doc_a JOIN N nb ON nb.doc_id = doc_b""".stripMargin)),

    // --- Embedding near-dup within a blocking cell (label as the cell).
    Q("d05_embedding_neardup",
      (s, d) => {
        import s.implicits._
        Dedup.embeddingPairs(Tables.load(s, d, "embeddings"),
          $"vec_id", $"embedding", $"label", minCos = 0.3)
      },
      Some("""WITH e AS (SELECT vec_id, label,
             |  list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
             |p AS (SELECT a.label AS cell, a.vec_id AS id_a, b.vec_id AS id_b,
             |  round(list_sum(list_transform(range(1,65), i -> a.v[i]*b.v[i])) /
             |    (sqrt(list_sum(list_transform(a.v, x -> x*x))) *
             |     sqrt(list_sum(list_transform(b.v, x -> x*x)))), 6) AS cos
             |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
             |SELECT cell, id_a, id_b, cos FROM p WHERE cos > 0.3""".stripMargin)),

    // --- Cluster formation: connected components over the verified
    // Jaccard pair graph (d04's pairs at >= 0.3) — each doc mapped to
    // the minimum id of its component, the canonical representative.
    // Spark: iterative min-label propagation (one join + one agg per
    // round, rounds ~ diameter). Oracle: recursive-CTE transitive
    // closure + min — same fixpoint, stated declaratively.
    Q("d07_dedup_clusters",
      (s, d) => {
        import s.implicits._
        val pairs = Dedup.jaccardPairs(Tables.load(s, d, "documents"),
          $"doc_id", $"text", shingleN = 3, k = 16, bands = 4, minSim = 0.3)
        Dedup.clusters(pairs, $"doc_a", $"doc_b")
      },
      Some(s"""${shinglesCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
              |P AS (SELECT doc_a, doc_b
              |  FROM C JOIN S sa ON sa.doc_id = doc_a JOIN S sb ON sb.doc_id = doc_b
              |  WHERE round(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh)))::DOUBLE
              |      / len(list_distinct(sa.sh || sb.sh))::DOUBLE, 6) >= 0.3),
              |E AS (SELECT doc_a AS src, doc_b AS dst FROM P
              |  UNION SELECT doc_b, doc_a FROM P),
              |reach(src, dst) AS (
              |  SELECT src, dst FROM E
              |  UNION
              |  SELECT r.src, e.dst FROM reach r JOIN E e ON r.dst = e.src)
              |SELECT src AS doc_id, least(src, min(dst)) AS cluster_rep
              |FROM reach GROUP BY src""".stripMargin)),

    // --- Benchmark decontamination (the pre-training pass every LLM
    // corpus needs): the held-out "benchmark" is the doc_id % 29 == 0
    // slice; training docs sharing >= 5 distinct 3-gram shingles with
    // its shingle BLOCKLIST are flagged for dropping. Join key is
    // md5(shingle) on both engines — fixed-width keys, never raw n-gram
    // text on the shuffle.
    Q("d08_decontaminate",
      (s, d) => {
        import s.implicits._
        Dedup.decontaminate(Tables.load(s, d, "documents"),
          $"doc_id", $"text", isBench = $"doc_id" % 29 === 0,
          shingleN = 3, minHits = 5)
      },
      Some("""WITH W AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |S AS (SELECT doc_id, CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
             |  ELSE list_transform(range(1, len(words)-1), i -> array_to_string(words[i:i+2], ' ')) END AS sh
             |  FROM W),
             |E AS (SELECT doc_id, md5(unnest(list_distinct(sh))) AS k FROM S),
             |B AS (SELECT DISTINCT k FROM E WHERE doc_id % 29 = 0)
             |SELECT doc_id, count(*) AS n_hits
             |FROM E JOIN B USING (k)
             |WHERE doc_id % 29 <> 0
             |GROUP BY doc_id HAVING count(*) >= 5""".stripMargin)),

    // --- Incremental dedup: flag the DELTA slice (doc_id % 5 = 4)
    // against the BASE slice (the rest) — exact via md5 equi-join, near
    // via delta-bands x base-bands LSH + Jaccard refinement. The real
    // 100 TB shape: cost linear in the delta; the base band table is
    // the persisted index.
    Q("d09_incremental_dedup",
      (s, d) => {
        import s.implicits._
        val docs = Tables.load(s, d, "documents")
        Dedup.incrementalFlags(
          docs.filter($"doc_id" % 5 =!= 4),
          docs.filter($"doc_id" % 5 === 4),
          $"doc_id", $"text", shingleN = 3, k = 16, bands = 4, minSim = 0.3)
      },
      Some(s"""$bandsCte,
              |EX AS (SELECT d.doc_id AS doc_id, min(b.doc_id) AS match_id
              |  FROM documents d JOIN documents b ON md5(d.text) = md5(b.text)
              |  WHERE d.doc_id % 5 = 4 AND b.doc_id % 5 <> 4 GROUP BY 1),
              |CAND AS (SELECT DISTINCT a.doc_id AS doc_id, c.doc_id AS base_id
              |  FROM B a JOIN B c ON a.band_idx = c.band_idx AND a.band_hash = c.band_hash
              |  WHERE a.doc_id % 5 = 4 AND c.doc_id % 5 <> 4),
              |NEAR AS (SELECT cand.doc_id, min(cand.base_id) AS match_id
              |  FROM CAND cand JOIN S sa ON sa.doc_id = cand.doc_id
              |  JOIN S sb ON sb.doc_id = cand.base_id
              |  WHERE round(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh)))::DOUBLE
              |      / len(list_distinct(sa.sh || sb.sh))::DOUBLE, 6) >= 0.3
              |    AND cand.doc_id NOT IN (SELECT doc_id FROM EX)
              |  GROUP BY 1)
              |SELECT doc_id, 'exact' AS dup_kind, match_id FROM EX
              |UNION ALL SELECT doc_id, 'near' AS dup_kind, match_id FROM NEAR""".stripMargin)),

    // --- Leakage-safe train/val split: assignment by near-dup CLUSTER
    // (d07's representative; itself if unclustered), bucket = first
    // byte of md5(salt || rep) — so a cluster is atomic across the
    // split by construction, and a per-doc hash split's quiet "val is
    // a rephrased subset of train" failure cannot happen. Oracle:
    // d07's recursive-CC CTEs + the t21 hex-conv recipe.
    Q("d10_leakage_safe_split",
      (s, d) => {
        import s.implicits._
        graft.operators.Curation.leakageSafeSplit(
          Tables.load(s, d, "documents"), $"doc_id", $"text",
          shingleN = 3, k = 16, bands = 4, minSim = 0.3,
          trainBuckets = 230)
      },
      Some(s"""${shinglesCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
              |P AS (SELECT doc_a, doc_b
              |  FROM C JOIN S sa ON sa.doc_id = doc_a JOIN S sb ON sb.doc_id = doc_b
              |  WHERE round(len(list_intersect(list_distinct(sa.sh), list_distinct(sb.sh)))::DOUBLE
              |      / len(list_distinct(sa.sh || sb.sh))::DOUBLE, 6) >= 0.3),
              |E AS (SELECT doc_a AS src, doc_b AS dst FROM P
              |  UNION SELECT doc_b, doc_a FROM P),
              |reach(src, dst) AS (
              |  SELECT src, dst FROM E
              |  UNION
              |  SELECT r.src, e.dst FROM reach r JOIN E e ON r.dst = e.src),
              |R AS (SELECT src AS doc_id, least(src, min(dst)) AS rep
              |  FROM reach GROUP BY src)
              |SELECT d.doc_id, COALESCE(R.rep, d.doc_id) AS rep,
              |  CASE WHEN ('0x' || substr(md5('graft-split:42:' ||
              |      CAST(COALESCE(R.rep, d.doc_id) AS VARCHAR)), 1, 2))::BIGINT < 230
              |    THEN 'train' ELSE 'val' END AS split
              |FROM documents d LEFT JOIN R ON R.doc_id = d.doc_id""".stripMargin)),

    // --- SemDeDup (Abbas et al. 2023): embedding-space dedup — kmeans
    // cells (the deterministic IVF training of s04, restated CTE for
    // CTE by IvfSql.assignCtes), cosine pairs only WITHIN a cell,
    // connected components over the τ-similar pair graph, keep the
    // min-id representative per component. One row per vector with its
    // cell, representative, and kept flag. Oracle: shared IVF
    // assignment CTEs + d05's pair arithmetic + d07's recursive-CC
    // closure — every piece already proven in isolation.
    Q("d11_semdedup",
      (s, d) => {
        import s.implicits._
        Dedup.semDedup(Tables.load(s, d, "embeddings"),
          $"vec_id", $"embedding",
          nCells = 8, iters = 2, dim = 64, tau = 0.3,
          seedMode = "kcenter")
      },
      Some(IvfSql.assignCtes(nCells = 8, iters = 2, dim = 64)
        .replaceFirst("WITH ", "WITH RECURSIVE ") + semDedupTail)),

    // --- SemDeDup through the PRODUCTION dial: `nCells = 0` auto-dials
    // to ceil(sqrt(N)) in-plan (one count job — the 100 TB setting that
    // keeps the pair stage's Σ|cell|² ~N^1.5). The generated oracle
    // needs a compile-time k, so the query runs over a FIXED-SIZE slice
    // (vec_id < 500 — the full table at sf0.01/sf0.001, 500 rows at any
    // SF) and the oracle is generated at k = ceil(sqrt(500)) = 23 with
    // the same slice in `corpusWhere`: what the gate verifies is the
    // auto-dial path end-to-end — count, √N, k-center seeding at the
    // derived k, Lloyd, same-cell pairs, CC — not a pre-dialed twin.
    Q("d13_semdedup_auto",
      (s, d) => {
        import s.implicits._
        Dedup.semDedup(
          Tables.load(s, d, "embeddings").filter($"vec_id" < 500),
          $"vec_id", $"embedding",
          nCells = 0, iters = 2, dim = 64, tau = 0.3,
          seedMode = "kcenter")
      },
      Some(IvfSql.assignCtes(nCells = 23, iters = 2, dim = 64,
          corpusWhere = "vec_id < 500")
        .replaceFirst("WITH ", "WITH RECURSIVE ") + semDedupTail)),

    // --- Incremental SemDeDup: the DELTA slice (vec_id % 5 = 4)
    // flagged against the BASE in embedding space — d09's incremental
    // contract lifted to vectors. Centroids train on the BASE ONLY
    // (IvfSql.assignCtes(trainWhere=...): seeding + Lloyd see only
    // base rows, cassign still assigns everything), so the 100 TB
    // shape holds: a daily delta is assigned against the persisted
    // index's centroids and paired only with same-cell base vectors —
    // base×base is never re-paired.
    Q("d12_incremental_semdedup",
      (s, d) => {
        import s.implicits._
        val e = Tables.load(s, d, "embeddings")
        Dedup.semFlags(
          e.filter($"vec_id" % 5 =!= 4), e.filter($"vec_id" % 5 === 4),
          $"vec_id", $"embedding",
          nCells = 8, iters = 2, dim = 64, tau = 0.3,
          seedMode = "kcenter")
      },
      Some(IvfSql.assignCtes(nCells = 8, iters = 2, dim = 64,
          trainWhere = "vec_id % 5 <> 4") + """,
        |ev AS (SELECT e.vec_id, v, cell FROM e JOIN cassign USING (vec_id)),
        |P AS (SELECT dd.vec_id AS vec_id, db.vec_id AS base_id,
        |  round(list_sum(list_transform(range(1,65), i -> dd.v[i]*db.v[i])) /
        |    (sqrt(list_sum(list_transform(dd.v, x -> x*x))) *
        |     sqrt(list_sum(list_transform(db.v, x -> x*x)))), 6) AS cos
        |  FROM (SELECT * FROM ev WHERE vec_id % 5 = 4) dd
        |  JOIN (SELECT * FROM ev WHERE vec_id % 5 <> 4) db USING (cell))
        |SELECT vec_id, min(base_id) AS match_id,
        |  CAST(count(*) AS BIGINT) AS n_matches
        |FROM P WHERE cos > 0.3 GROUP BY vec_id""".stripMargin))
  )
}
