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
             |GROUP BY source""".stripMargin))
  )
}
