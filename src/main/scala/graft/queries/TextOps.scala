package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns

/** Text-analysis operators for the training-data pipeline (builder
  * contract §north-star): token counting, quality scoring, language ID,
  * fingerprinting — all whole-stage-codegen expressions over the
  * `documents` table, no UDFs.
  */
object TextOps extends QuerySet {

  private val stop = Seq("the", "a", "and", "of", "to", "is")

  /** t19 head/tail vocab split point, as a RELATIVE corpus share:
    * tokens with count >= share * total join BROADCAST, the residue
    * joins by shuffle. A relative cut (unlike an absolute min-count)
    * carries two scale-free guarantees at once:
    *   - head size <= 1/share rows by construction (at most 1/share
    *     tokens can each hold a >= share slice), so the broadcast
    *     build is bounded NO MATTER how large the corpus grows;
    *   - every residue key carries < share of all exploded rows, so
    *     the residue shuffle has a hard per-reducer skew ceiling.
    * Semantics are split-point-independent — every token lands in
    * exactly one side — so the value only tunes that trade. 0.002
    * (head <= 500 tokens) keeps BOTH paths exercised at every test
    * scale; a web deployment would run ~1e-6 (head <= 1M rows, a
    * tens-of-MB broadcast; residue keys <= a millionth of the corpus).
    */
  private[graft] val VocabHeadShare = 0.002

  val all: Seq[Q] = Seq(

    // --- Token & char counting (whitespace tokenizer). Regex kept to the
    // POSIX-compatible subset so Java regex (Spark) and RE2 (DuckDB)
    // agree.
    Q("t01_token_count",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .select(
            $"doc_id",
            size(split(trim($"text"), "\\s+")).cast("long").as("n_tok"),
            length($"text").cast("long").as("n_char"),
            round(length($"text") / size(split(trim($"text"), "\\s+")).cast("double"), 4)
              .as("chars_per_tok"))
      },
      Some("""SELECT doc_id,
             |CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
             |CAST(length(text) AS BIGINT) AS n_char,
             |round(length(text) / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE), 4) AS chars_per_tok
             |FROM documents""".stripMargin)),

    // --- Quality scoring: stopword ratio, mean token length, length
    // saturation, composite score. Heuristics follow common LLM-corpus
    // filters (C4-style length/stopword gates).
    Q("t02_quality_score",
      (s, d) => {
        import s.implicits._
        val words = TextFns.tokens($"text")
        val nTok = size(words).cast("double")
        val stopN = size(filter(words, w => w.isin(stop: _*))).cast("double")
        val meanLen = aggregate(words, lit(0), (acc, w) => acc + length(w)).cast("double") / nTok
        val lenSat = least(lit(1.0), nTok / lit(50.0))
        Tables.load(s, d, "documents")
          .select(
            $"doc_id",
            nTok.cast("long").as("n_tok"),
            round(stopN / nTok, 6).as("stop_ratio"),
            round(meanLen, 4).as("mean_tok_len"),
            round(lenSat * 0.5 + (stopN / nTok) * 0.5, 6).as("quality"))
      },
      Some("""WITH W AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |f AS (SELECT doc_id,
             |  CAST(len(words) AS DOUBLE) AS n_tok,
             |  CAST(len(list_filter(words, w -> w IN ('the','a','and','of','to','is'))) AS DOUBLE) AS stop_n,
             |  CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE) / CAST(len(words) AS DOUBLE) AS mean_len,
             |  least(1.0, CAST(len(words) AS DOUBLE) / 50.0) AS len_sat
             |  FROM W)
             |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
             |round(stop_n / n_tok, 6) AS stop_ratio,
             |round(mean_len, 4) AS mean_tok_len,
             |round(len_sat * 0.5 + (stop_n / n_tok) * 0.5, 6) AS quality
             |FROM f""".stripMargin)),

    // --- Language ID: stopword-marker voting (n-gram heuristic family).
    // Deterministic tie order: en > de > fr > es.
    Q("t03_langid",
      (s, d) => {
        import s.implicits._
        val words = TextFns.tokens($"text")
        def hits(ms: Seq[String]) =
          size(filter(words, w => w.isin(ms: _*))).cast("long")
        val en = hits(Seq("the", "and", "is", "of"))
        val de = hits(Seq("der", "und", "ist", "das"))
        val fr = hits(Seq("le", "et", "est", "la"))
        val es = hits(Seq("el", "y", "es", "los"))
        Tables.load(s, d, "documents")
          .select($"doc_id", $"lang".as("labeled_lang"),
            en.as("en_hits"), de.as("de_hits"), fr.as("fr_hits"), es.as("es_hits"),
            when(en >= greatest(de, fr, es), "en")
              .when(de >= greatest(fr, es), "de")
              .when(fr >= es, "fr")
              .otherwise("es").as("pred_lang"))
      },
      Some("""WITH W AS (SELECT doc_id, lang,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |h AS (SELECT doc_id, lang AS labeled_lang,
             |  CAST(len(list_filter(words, w -> w IN ('the','and','is','of'))) AS BIGINT) AS en_hits,
             |  CAST(len(list_filter(words, w -> w IN ('der','und','ist','das'))) AS BIGINT) AS de_hits,
             |  CAST(len(list_filter(words, w -> w IN ('le','et','est','la'))) AS BIGINT) AS fr_hits,
             |  CAST(len(list_filter(words, w -> w IN ('el','y','es','los'))) AS BIGINT) AS es_hits
             |  FROM W)
             |SELECT doc_id, labeled_lang, en_hits, de_hits, fr_hits, es_hits,
             |CASE WHEN en_hits >= greatest(de_hits, fr_hits, es_hits) THEN 'en'
             |     WHEN de_hits >= greatest(fr_hits, es_hits) THEN 'de'
             |     WHEN fr_hits >= es_hits THEN 'fr'
             |     ELSE 'es' END AS pred_lang
             |FROM h""".stripMargin)),

    // --- BPE-ish subword token counting: letter runs, digit runs, and
    // single non-alnum marks counted separately (the GPT-2 pretokenizer
    // family, reduced to a POSIX-portable regex both engines run
    // identically).
    Q("t05_bpe_token_count",
      (s, d) => {
        import s.implicits._
        val pat = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
        Tables.load(s, d, "documents")
          .select($"doc_id",
            size(regexp_extract_all(lower($"text"), lit(pat), lit(0)))
              .cast("long").as("n_subtok"),
            size(split(trim($"text"), "\\s+")).cast("long").as("n_wstok"))
      },
      Some("""SELECT doc_id,
             |CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_subtok,
             |CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_wstok
             |FROM documents""".stripMargin)),

    // --- Array-function coverage: sorted distinct vocabulary slice per
    // document (array_distinct/array_sort/slice/array_join vs DuckDB
    // list_distinct/list_sort/slice/array_to_string).
    Q("t07_vocab_fingerprint",
      (s, d) => {
        import s.implicits._
        val words = TextFns.tokens($"text")
        Tables.load(s, d, "documents")
          .select($"doc_id",
            size(array_distinct(words)).cast("long").as("vocab_size"),
            array_join(slice(array_sort(array_distinct(words)), 1, 5), " ")
              .as("first_vocab"))
      },
      Some("""WITH W AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents)
             |SELECT doc_id,
             |CAST(len(list_distinct(words)) AS BIGINT) AS vocab_size,
             |array_to_string(list_sort(list_distinct(words))[1:5], ' ') AS first_vocab
             |FROM W""".stripMargin)),

    // --- Rolling-hash winnowing fingerprint: the 3 smallest md5s over
    // all char 8-grams of the normalized text — robust to local edits
    // (winnowing-lite / k-min sketch of the rolling window family).
    Q("t08_winnow_fingerprint",
      (s, d) => {
        import s.implicits._
        // native one-pass kernel: the declarative chain (transform ->
        // md5-per-position -> array_sort -> slice) materializes one hex
        // string per CHARACTER and sorts it per row — sf1's worst query
        // (41 s) under full-row materialization. WinnowFp keeps only
        // the 3 smallest raw digests; NativeExprParitySpec pins
        // row-identity to the declarative form.
        Tables.load(s, d, "documents")
          .select($"doc_id",
            graft.expressions.NativeFns
              .winnow_fp(TextFns.normalizeText($"text"), 3, 8).as("winnow_fp"))
      },
      Some("""WITH N AS (SELECT doc_id,
             |  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
             |  FROM documents)
             |SELECT doc_id,
             |array_to_string(list_sort(list_transform(
             |  range(1, greatest(length(norm) - 7, 1) + 1),
             |  i -> md5(norm[i:i+7])))[1:3], ',') AS winnow_fp
             |FROM N""".stripMargin)),

    // --- Content fingerprinting: md5 of the normalized text + coarse
    // length bucket (the cheap exact-near-dup key).
    Q("t04_fingerprint",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .select($"doc_id",
            md5(TextFns.normalizeText($"text")).as("fingerprint"),
            floor(length($"text") / lit(100)).cast("long").as("len_bucket"))
      },
      Some("""SELECT doc_id,
             |md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
             |CAST(floor(length(text) / 100.0) AS BIGINT) AS len_bucket
             |FROM documents""".stripMargin)),

    // --- Heavy hitters: corpus-wide top word-bigrams — the frequent-
    // n-gram pass every training-data pipeline runs (boilerplate
    // detection, contamination screens). Explode via the native
    // WordShingles expression (codegen'd), hash-aggregate with map-side
    // partials, top-k with a unique tiebreak. Scale shape: the shuffle
    // carries (ngram, partial_count) — bigram cardinality, not corpus
    // size; the final TakeOrderedAndProject keeps k rows per partition.
    Q("t09_top_ngrams",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .select(explode(
            graft.expressions.NativeFns.word_shingles($"text", 2)).as("ngram"))
          .groupBy($"ngram")
          .agg(count(lit(1)).as("n"))
          .orderBy($"n".desc, $"ngram".asc)
          .limit(50)
      },
      Some("""SELECT ngram, CAST(count(*) AS BIGINT) AS n FROM (
             |  SELECT unnest(CASE WHEN len(toks) < 2
             |    THEN [array_to_string(toks, ' ')]
             |    ELSE list_transform(range(1, len(toks)),
             |           i -> toks[i] || ' ' || toks[i+1]) END) AS ngram
             |  FROM (SELECT list_filter(
             |    string_split_regex(lower(text), '[^a-z0-9]+'),
             |    x -> x <> '') AS toks FROM documents))
             |GROUP BY ngram ORDER BY n DESC, ngram ASC LIMIT 50""".stripMargin)),

    // --- Deterministic stratified sampling (domain-mix downsampling):
    // per-stratum keep rates via a HASH threshold, no RNG — the rule a
    // 100 TB pipeline needs (idempotent: any worker, any retry, any
    // rerun keeps exactly the same documents; pure per-row codegen
    // filter, no shuffle, nothing to coordinate). Cross-engine
    // exactness: both engines compare the same lowercase-hex md5 prefix
    // against literal hex thresholds — fixed-width lowercase hex
    // compares lexicographically exactly like the number it encodes
    // ('0'-'9' < 'a'-'f'), so rate r maps to the threshold
    // hex(floor(r * 2^32)).
    Q("t10_sample_stratified",
      (s, d) => {
        import s.implicits._
        val h = substring(md5($"doc_id".cast("string")), 1, 8)
        val thr = when($"doc_id" % 4 === 0, "20000000") // rate 1/8
          .when($"doc_id" % 4 === 1, "40000000")        // rate 1/4
          .when($"doc_id" % 4 === 2, "60000000")        // rate 3/8
          .otherwise("80000000")                        // rate 1/2
        Tables.load(s, d, "documents")
          .select($"doc_id", ($"doc_id" % 4).as("stratum"), h.as("h"))
          .filter($"h" < thr)
      },
      Some("""SELECT doc_id, doc_id % 4 AS stratum,
             |  substr(md5(doc_id::VARCHAR), 1, 8) AS h
             |FROM documents
             |WHERE substr(md5(doc_id::VARCHAR), 1, 8) <
             |  CASE doc_id % 4 WHEN 0 THEN '20000000' WHEN 1 THEN '40000000'
             |       WHEN 2 THEN '60000000' ELSE '80000000' END""".stripMargin)),

    // --- Token-budget packing (data-mix curation): per stratum, take
    // documents best-quality-first until the stratum's token budget is
    // spent — the selection step that turns quality scores into an
    // actual training mix. Runs through Curation.packByBudget: the
    // DISTRIBUTED per-stratum prefix sum (range-bucket the quality
    // order via one approxQuantile, broadcast per-(stratum,bucket)
    // token offsets, within-bucket window), so window parallelism is
    // |strata| x |buckets| — one hot stratum fans out across bucket
    // tasks instead of serializing into a single sort. Results are
    // bucket-count independent (CurationSpec), so the single-window SQL
    // oracle still matches bit-for-bit.
    Q("t11_token_budget_pack",
      (s, d) => {
        import s.implicits._
        val words = TextFns.tokens($"text")
        val nTok = size(words).cast("long")
        val stopN = size(filter(words, w => w.isin(stop: _*))).cast("double")
        val lenSat = least(lit(1.0), nTok.cast("double") / lit(50.0))
        val quality = round(lenSat * 0.5 + (stopN / nTok.cast("double")) * 0.5, 6)
        // the narrow scored projection feeds BOTH packByBudget passes
        // (offset totals + final window); tracked in the LRU registry so
        // the tokenize-and-score work runs once, same pattern as the
        // dedup family's shared shingle pass
        val base = graft.operators.Caches.track(Tables.load(s, d, "documents")
          .select($"doc_id", ($"doc_id" % 4).as("stratum"),
            nTok.as("n_tok"), quality.as("quality")))
        graft.operators.Curation.packByBudget(base, $"stratum", $"quality",
          Seq($"doc_id".asc), $"n_tok", 2000L,
          qualityBounds = Some((0.0, 1.0))) // composite score in [0,1] by construction
      },
      Some("""WITH W AS (SELECT doc_id, doc_id % 4 AS stratum,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |f AS (SELECT doc_id, stratum,
             |  CAST(len(words) AS BIGINT) AS n_tok,
             |  round(least(1.0, CAST(len(words) AS DOUBLE) / 50.0) * 0.5 +
             |    (CAST(len(list_filter(words, w -> w IN ('the','a','and','of','to','is'))) AS DOUBLE)
             |     / CAST(len(words) AS DOUBLE)) * 0.5, 6) AS quality
             |  FROM W),
             |g AS (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY stratum
             |  ORDER BY quality DESC, doc_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
             |  FROM f)
             |SELECT doc_id, stratum, n_tok, quality, cum_tok
             |FROM g WHERE cum_tok <= 2000""".stripMargin)),

    // --- Skew face of the same operator: 90% of the corpus lands in
    // ONE stratum (the shape of a real mix dominated by web crawl).
    // Identical packByBudget path — the probe (BENCH_sf10_curation
    // _probe) runs THIS query at 100x to prove the hot stratum fans
    // out across range buckets instead of serializing into one task.
    Q("t14_token_budget_pack_skew",
      (s, d) => {
        import s.implicits._
        val words = TextFns.tokens($"text")
        val nTok = size(words).cast("long")
        val stopN = size(filter(words, w => w.isin(stop: _*))).cast("double")
        val lenSat = least(lit(1.0), nTok.cast("double") / lit(50.0))
        val quality = round(lenSat * 0.5 + (stopN / nTok.cast("double")) * 0.5, 6)
        val stratum = when($"doc_id" % 10 < 9, lit(0L))
          .otherwise(($"doc_id" % 4) + 1)
        val base = graft.operators.Caches.track(Tables.load(s, d, "documents")
          .select($"doc_id", stratum.as("stratum"),
            nTok.as("n_tok"), quality.as("quality")))
        graft.operators.Curation.packByBudget(base, $"stratum", $"quality",
          Seq($"doc_id".asc), $"n_tok", 2000L,
          qualityBounds = Some((0.0, 1.0))) // composite score in [0,1] by construction
      },
      Some("""WITH W AS (SELECT doc_id,
             |  CASE WHEN doc_id % 10 < 9 THEN 0 ELSE doc_id % 4 + 1 END AS stratum,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |f AS (SELECT doc_id, stratum,
             |  CAST(len(words) AS BIGINT) AS n_tok,
             |  round(least(1.0, CAST(len(words) AS DOUBLE) / 50.0) * 0.5 +
             |    (CAST(len(list_filter(words, w -> w IN ('the','a','and','of','to','is'))) AS DOUBLE)
             |     / CAST(len(words) AS DOUBLE)) * 0.5, 6) AS quality
             |  FROM W),
             |g AS (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY stratum
             |  ORDER BY quality DESC, doc_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
             |  FROM f)
             |SELECT doc_id, stratum, n_tok, quality, cum_tok
             |FROM g WHERE cum_tok <= 2000""".stripMargin)),

    // --- Within-document repetition ratio (Gopher-style repetition
    // filter): fraction of a doc's 3-gram shingles that are repeats of
    // an earlier shingle in the same doc — the standard boilerplate /
    // TEMPLATE-spam signal exact dedup can't see (the doc is unique,
    // its CONTENT loops). Pure per-row expression work, no shuffle, no
    // join: the whole filter runs inside whole-stage codegen at any
    // corpus size.
    Q("t12_repetition_ratio",
      (s, d) => {
        import s.implicits._
        import graft.expressions.NativeFns.word_shingles
        val sh = word_shingles($"text", 3)
        val nSh = size(sh).cast("long")
        val nDist = size(array_distinct(sh)).cast("long")
        Tables.load(s, d, "documents")
          .select($"doc_id", nSh.as("n_sh"), nDist.as("n_distinct"),
            round(lit(1.0) - nDist.cast("double") / nSh.cast("double"), 6)
              .as("rep_ratio"))
          .withColumn("flagged", $"rep_ratio" > 0.05)
      },
      Some("""WITH W AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |S AS (SELECT doc_id, CASE WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
             |  ELSE list_transform(range(1, len(words)-1), i -> array_to_string(words[i:i+2], ' ')) END AS sh
             |  FROM W)
             |SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh,
             |  CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct,
             |  round(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE)
             |    / CAST(len(sh) AS DOUBLE), 6) AS rep_ratio,
             |  (round(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE)
             |    / CAST(len(sh) AS DOUBLE), 6) > 0.05) AS flagged
             |FROM S""".stripMargin)),

    // --- Segment-level duplication (the line-dedup pass of CCNet/
    // RefinedWeb-style pipelines, reformulated for unstructured text):
    // split each doc into NON-overlapping 8-word chunks, hash them, and
    // measure what fraction of a doc's distinct chunks also occur in
    // some OTHER doc — boilerplate detection below document
    // granularity, where whole-doc dedup sees nothing.
    //
    // Scale shape: one explode -> the shuffle carries md5 chunk keys
    // (fixed 16 bytes, never raw text — same rule as d08); the
    // duplicated-chunk set comes from a map-side-combinable
    // two-distinct-docs count; the join back to per-doc chunks is a
    // fixed-key equi-join. Linear in the corpus, never a self-join.
    Q("t15_segment_dedup",
      (s, d) => {
        import s.implicits._
        // native WordChunks(hashed): tokenize + chunk + md5 in one
        // pass — the interpreted transform/slice/array_join chain was
        // the remaining per-row hot path at sf1 (22 s). Token-less
        // docs yield an EMPTY array (the sequence(0,-1) phantom-chunk
        // guard, now inside the kernel); NativeExprParitySpec pins
        // chunk-level identity to the declarative form.
        val chunks = graft.expressions.NativeFns.word_chunks($"text", 8, hashed = true)
        val perDoc = Tables.load(s, d, "documents")
          .select($"doc_id", explode(array_distinct(chunks)).as("_h"))
        val dupChunks = perDoc
          .groupBy($"_h").agg(count(lit(1)).as("_nd"))
          .filter($"_nd" >= 2)
          .select($"_h")
        perDoc
          .join(dupChunks, Seq("_h"), "left_semi")
          .groupBy($"doc_id").agg(count(lit(1)).as("n_dup_chunks"))
          .join(perDoc.groupBy($"doc_id").agg(count(lit(1)).as("n_chunks")),
            Seq("doc_id"), "right")
          .select($"doc_id", $"n_chunks",
            coalesce($"n_dup_chunks", lit(0L)).as("n_dup_chunks"),
            round(coalesce($"n_dup_chunks", lit(0L)) / $"n_chunks".cast("double"), 6)
              .as("dup_frac"))
          .withColumn("flagged", $"dup_frac" > 0.5)
      },
      Some("""WITH W AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |C AS (SELECT doc_id, unnest(list_distinct(list_transform(
             |    range(0, CAST(ceil(len(words) / 8.0) AS INT)),
             |    i -> md5(array_to_string(words[i*8+1:i*8+8], ' '))))) AS h
             |  FROM W),
             |D AS (SELECT h FROM C GROUP BY h HAVING count(*) >= 2),
             |N AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks FROM C GROUP BY doc_id),
             |M AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_chunks
             |  FROM C WHERE h IN (SELECT h FROM D) GROUP BY doc_id)
             |SELECT N.doc_id, N.n_chunks,
             |  COALESCE(M.n_dup_chunks, 0) AS n_dup_chunks,
             |  round(COALESCE(M.n_dup_chunks, 0) / CAST(N.n_chunks AS DOUBLE), 6) AS dup_frac,
             |  (round(COALESCE(M.n_dup_chunks, 0) / CAST(N.n_chunks AS DOUBLE), 6) > 0.5) AS flagged
             |FROM N LEFT JOIN M ON N.doc_id = M.doc_id""".stripMargin)),

    // --- Domain-mix report (the table a curator reads before setting
    // sampling rates): per-source doc/token counts, mean quality, and
    // share of corpus tokens. The heavy part is per-row expression
    // work; the aggregate output is |sources| rows, and the share
    // window runs over THAT — cardinality-bounded, not data-bounded.
    Q("t16_domain_mix",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val words = TextFns.tokens($"text")
        val nTok = size(words).cast("long")
        val stopN = size(filter(words, w => w.isin(stop: _*))).cast("double")
        val lenSat = least(lit(1.0), nTok.cast("double") / lit(50.0))
        val quality = lenSat * 0.5 + (stopN / nTok.cast("double")) * 0.5
        val agg = Tables.load(s, d, "documents")
          .select($"source", nTok.as("n_tok"), quality.as("q"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"),
            round(avg($"q"), 6).as("mean_quality"))
        agg.withColumn("token_share",
            round($"n_tokens" / sum($"n_tokens").over(Window.partitionBy()), 6))
          .orderBy($"source")
      },
      Some("""WITH W AS (SELECT source,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |f AS (SELECT source, CAST(len(words) AS BIGINT) AS n_tok,
             |  least(1.0, CAST(len(words) AS DOUBLE) / 50.0) * 0.5 +
             |    (CAST(len(list_filter(words, w -> w IN ('the','a','and','of','to','is'))) AS DOUBLE)
             |     / CAST(len(words) AS DOUBLE)) * 0.5 AS q
             |  FROM W),
             |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS n_tokens, round(avg(q), 6) AS mean_quality
             |  FROM f GROUP BY source)
             |SELECT source, n_docs, n_tokens, mean_quality,
             |  round(n_tokens / CAST(sum(n_tokens) OVER () AS DOUBLE), 6) AS token_share
             |FROM a ORDER BY source""".stripMargin)),

    // --- Deterministic train/val/test corpus split (80/10/10): the
    // same fixed-width lowercase-hex-ordering trick as t10, but as a
    // three-way ASSIGNMENT — every doc gets a split label derived only
    // from its id, so the split is stable across reruns, workers and
    // engines, and a doc can never leak between splits. Per-row
    // codegen, zero shuffle.
    Q("t13_corpus_split",
      (s, d) => {
        import s.implicits._
        val h = substring(md5($"doc_id".cast("string")), 1, 8)
        Tables.load(s, d, "documents")
          .select($"doc_id", h.as("h"),
            when(h < "cccccccc", "train")
              .when(h < "e6666666", "val")
              .otherwise("test").as("split"))
      },
      Some("""SELECT doc_id, substr(md5(doc_id::VARCHAR), 1, 8) AS h,
             |  CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8) < 'cccccccc' THEN 'train'
             |       WHEN substr(md5(doc_id::VARCHAR), 1, 8) < 'e6666666' THEN 'val'
             |       ELSE 'test' END AS split
             |FROM documents""".stripMargin)),

    // --- PII scan + redaction (graft.operators.Redact). The corpus has
    // no digits, so PII-shaped spans are planted deterministically from
    // doc_id — IDENTICALLY on both engines — and the oracle pins the
    // per-rule counts AND the byte-exact redacted text (via md5).
    // Patterns are RE2-safe so java.util.regex and DuckDB's RE2 agree.
    Q("t17_pii_redact",
      (s, d) => {
        import s.implicits._
        import graft.operators.Redact
        val m = $"doc_id" % 4
        val planted = when(m === 0,
            concat($"text", lit(" reach me at user"), $"doc_id".cast("string"),
              lit("@mail.example.com today")))
          .when(m === 1,
            concat($"text", lit(" call 415-555-"),
              lpad(($"doc_id" % 10000).cast("string"), 4, "0"), lit(" now")))
          .when(m === 2,
            concat($"text", lit(" server at 10."), ($"doc_id" % 200).cast("string"),
              lit(".0."), ($"doc_id" % 250).cast("string"), lit(" port 8080")))
          .otherwise(
            concat($"text", lit(" id 123-45-"),
              lpad(($"doc_id" % 10000).cast("string"), 4, "0")))
        val enriched = Tables.load(s, d, "documents").select($"doc_id", planted.as("_t"))
        enriched.select(
          $"doc_id" +:
            Redact.counts($"_t").map { case (n, c) => c.as(s"n_$n") } :+
            md5(Redact.redact($"_t")).as("redacted_md5"): _*)
      },
      Some("""WITH E AS (SELECT doc_id, CASE doc_id % 4
             |  WHEN 0 THEN text || ' reach me at user' || doc_id::VARCHAR || '@mail.example.com today'
             |  WHEN 1 THEN text || ' call 415-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' now'
             |  WHEN 2 THEN text || ' server at 10.' || (doc_id % 200)::VARCHAR || '.0.' || (doc_id % 250)::VARCHAR || ' port 8080'
             |  ELSE text || ' id 123-45-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') END AS t
             |  FROM documents)
             |SELECT doc_id,
             |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
             |  len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b'))::BIGINT AS n_ssn,
             |  len(regexp_extract_all(t, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b'))::BIGINT AS n_phone,
             |  len(regexp_extract_all(t, '\b(\d{1,3}\.){3}\d{1,3}\b'))::BIGINT AS n_ipv4,
             |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
             |    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g'),
             |    '\b(\d{1,3}\.){3}\d{1,3}\b', '<IPV4>', 'g')) AS redacted_md5
             |FROM E""".stripMargin)),

    // --- Gopher-style document quality rules (Rae et al. 2021 §A1.1
    // family, thresholds fitted to this corpus): word-count bounds,
    // mean-word-length bounds, stopword presence, and top-word
    // repetition fraction, each surfaced as its own flag plus the
    // conjunction. One explode + two map-side-combinable hash
    // aggregations — the per-(doc,word) histogram never materializes a
    // per-doc list, so a pathological 1 GB document costs its word
    // count, not a single-task sort. At 100 TB this is the same plan:
    // shuffle keyed (doc_id, word) then doc_id, both combinable.
    Q("t18_gopher_filters",
      (s, d) => {
        import s.implicits._
        Tables.load(s, d, "documents")
          .select($"doc_id", explode(TextFns.tokens($"text")).as("w"))
          .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
          .groupBy($"doc_id")
          .agg(sum($"c").as("n_tok"),
               max($"c").as("max_c"),
               sum($"c" * length($"w")).as("len_sum"),
               sum(when($"w".isin(stop: _*), $"c").otherwise(0L)).as("stop_hits"))
          .select($"doc_id", $"n_tok",
            round($"len_sum".cast("double") / $"n_tok", 4).as("mean_tok_len"),
            round($"max_c".cast("double") / $"n_tok", 6).as("top_word_frac"),
            $"stop_hits",
            ($"n_tok" >= 20 && $"n_tok" <= 80).as("ok_len"),
            ($"len_sum".cast("double") / $"n_tok" >= 3.0 &&
             $"len_sum".cast("double") / $"n_tok" <= 5.0).as("ok_word_len"),
            ($"max_c".cast("double") / $"n_tok" <= 0.15).as("ok_rep"),
            ($"stop_hits" >= 1).as("ok_stop"))
          .withColumn("keep",
            $"ok_len" && $"ok_word_len" && $"ok_rep" && $"ok_stop")
      },
      Some("""WITH W AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |E AS (SELECT doc_id, unnest(words) AS w FROM W),
             |C AS (SELECT doc_id, w, count(*) AS c FROM E GROUP BY 1, 2),
             |D AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
             |  CAST(max(c) AS BIGINT) AS max_c,
             |  CAST(sum(c * length(w)) AS BIGINT) AS len_sum,
             |  CAST(sum(CASE WHEN w IN ('the','a','and','of','to','is')
             |           THEN c ELSE 0 END) AS BIGINT) AS stop_hits
             |  FROM C GROUP BY 1)
             |SELECT doc_id, n_tok,
             |  round(CAST(len_sum AS DOUBLE) / n_tok, 4) AS mean_tok_len,
             |  round(CAST(max_c AS DOUBLE) / n_tok, 6) AS top_word_frac,
             |  stop_hits,
             |  (n_tok >= 20 AND n_tok <= 80) AS ok_len,
             |  (CAST(len_sum AS DOUBLE) / n_tok >= 3.0 AND
             |   CAST(len_sum AS DOUBLE) / n_tok <= 5.0) AS ok_word_len,
             |  (CAST(max_c AS DOUBLE) / n_tok <= 0.15) AS ok_rep,
             |  (stop_hits >= 1) AS ok_stop,
             |  ((n_tok >= 20 AND n_tok <= 80) AND
             |   (CAST(len_sum AS DOUBLE) / n_tok >= 3.0 AND
             |    CAST(len_sum AS DOUBLE) / n_tok <= 5.0) AND
             |   (CAST(max_c AS DOUBLE) / n_tok <= 0.15) AND
             |   (stop_hits >= 1)) AS keep
             |FROM D""".stripMargin)),

    // --- CCNet-style self-trained unigram LM scoring (Wenzek et al.
    // 2020 §4.3 family, the perplexity stage with the corpus itself as
    // the LM): global word frequencies -> per-document mean token
    // log-probability -> fixed head/middle/tail cut.
    // == The vocab-join plan (the 100 TB shape) ==
    // Post-explode the join key is Zipf-skewed ("the" alone would
    // hot-spot a shuffle join), so the HOT side must join broadcast —
    // but a raw web-crawl vocab is billions of rows (UUID/typo tail)
    // and broadcasting it whole would OOM the driver. The split below
    // is the standard skew remedy, and it is EXACT, not approximate:
    //  - head  = tokens holding >= VocabHeadShare of all exploded
    //    rows. ALL the Zipf skew lives here by construction (a token
    //    can only be hot if its share is large), and the head is
    //    PROVABLY <= 1/share rows — broadcastable no matter the corpus
    //    size; skew lands on the replicated side where it costs
    //    nothing.
    //  - tail  = the residue. Every residue key carries < share of the
    //    rows (a hard per-reducer ceiling), and only the ex rows that
    //    missed the head (a broadcast LEFT ANTI, no shuffle of ex) are
    //    shuffled — the residue fraction of the corpus, not the corpus.
    // Every token lands in exactly one side, so head-join ∪ tail-join
    // partitions ex exactly and the scores are bit-identical to the
    // single-join form (QueriesSpec pins the plan: broadcast on the
    // head path, none on the unpruned vocab). The extra corpus
    // tokenization pass the split costs is the textbook price of skew
    // isolation; the vocab itself is built once (persisted via the
    // cache registry) and reused by both filters and the total.
    // Buckets cut on the 6dp-ROUNDED score so the classification the
    // row carries is exactly the one its emitted score implies on both
    // engines.
    Q("t19_unigram_logprob",
      (s, d) => {
        import s.implicits._
        val ex = Tables.load(s, d, "documents")
          .select($"doc_id", explode(TextFns.tokens($"text")).as("w"))
        val vocab = graft.operators.Caches.track(
          ex.groupBy($"w").agg(count(lit(1)).as("g")))
        val tot = vocab.agg(sum($"g").as("tot"))
        val vt = vocab.crossJoin(broadcast(tot))
        val cut = $"tot".cast("double") * lit(VocabHeadShare)
        val head = vt.filter($"g" >= cut)
        val headJoined = ex.join(broadcast(head), "w")
        val tailJoined = ex
          .join(broadcast(head.select($"w")), Seq("w"), "left_anti")
          .join(vt.filter($"g" < cut), "w")
        val scored = headJoined.unionByName(tailJoined)
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_tok"),
               round(sum(log($"g".cast("double") / $"tot")) / count(lit(1)), 6)
                 .as("logprob"))
        scored.withColumn("bucket",
          when($"logprob" >= -3.40, "head")
            .when($"logprob" >= -3.41, "middle")
            .otherwise("tail"))
      },
      Some("""WITH W AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |E AS (SELECT doc_id, unnest(words) AS w FROM W),
             |G AS (SELECT w, count(*) AS g FROM E GROUP BY 1),
             |T AS (SELECT CAST(sum(g) AS DOUBLE) AS tot FROM G),
             |D AS (SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
             |  round(sum(ln(CAST(g.g AS DOUBLE) / t.tot)) / count(*), 6) AS logprob
             |  FROM E e JOIN G g ON e.w = g.w CROSS JOIN T t GROUP BY 1)
             |SELECT doc_id, n_tok, logprob,
             |  CASE WHEN logprob >= -3.40 THEN 'head'
             |       WHEN logprob >= -3.41 THEN 'middle'
             |       ELSE 'tail' END AS bucket
             |FROM D""".stripMargin)),

    // --- Pairwise source-overlap matrix (corpus forensics: "how much
    // does source A duplicate source B" — the cross-source
    // contamination report run before mixing corpora). Shared distinct
    // 3-gram shingles per source pair, plus the shingle-set Jaccard
    // via inclusion-exclusion. Scale shape: the DISTINCT (source,
    // shingle) table bounds the self-join's key multiplicity by
    // |sources| — a shingle shared by every source fans out to
    // |sources|^2/2 pairs, never |docs|^2; the whole pass is two
    // map-side-combinable aggregations around one equi-join, linear in
    // corpus shingles. Like t15, the shuffle carries a fixed-width
    // md5-derived 60-bit key, never raw shingle text (collisions are
    // 2^-60-rare and DETERMINISTIC — both engines hash identically, so
    // the compare stays exact). The per-source totals join is a
    // |sources|-row broadcast.
    Q("t20_source_overlap",
      (s, d) => {
        import s.implicits._
        // native WordShingles: the declarative shingles(tokens(..))
        // chain is interpreted per shingle and dominated the 100x wall
        // (32.6 of 41 s attributed to shingle construction alone)
        // pinned: three consumers (the per-source count and BOTH sides
        // of the overlap self-join) would otherwise each re-run the
        // explode+md5+distinct corpus pass — the same single-pass
        // discipline as the dedup family's shingle memo
        val sh = graft.operators.Caches.track(Tables.load(s, d, "documents")
          .select($"source",
            explode(graft.expressions.NativeFns.word_shingles($"text", 3)).as("g"))
          .select($"source",
            conv(substring(md5($"g"), 1, 15), 16, 10).cast("long").as("sh"))
          .distinct())
        val cnt = sh.groupBy($"source").agg(count(lit(1)).as("n"))
        sh.toDF("src_a", "sh").join(sh.toDF("src_b", "sh"), "sh")
          .filter($"src_a" < $"src_b")
          .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("n_shared"))
          .join(broadcast(cnt.toDF("src_a", "na")), "src_a")
          .join(broadcast(cnt.toDF("src_b", "nb")), "src_b")
          .select($"src_a", $"src_b", $"n_shared",
            round($"n_shared".cast("double") /
              ($"na" + $"nb" - $"n_shared"), 6).as("jaccard"))
      },
      Some("""WITH W AS (SELECT source,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |S AS (SELECT source, unnest(CASE WHEN len(words) < 3
             |  THEN [array_to_string(words, ' ')]
             |  ELSE list_transform(range(1, len(words)-1),
             |         i -> array_to_string(words[i:i+2], ' ')) END) AS g
             |  FROM W),
             |D AS (SELECT DISTINCT source,
             |  ('0x' || substr(md5(g), 1, 15))::BIGINT AS sh FROM S),
             |C AS (SELECT source, count(*) AS n FROM D GROUP BY 1),
             |I AS (SELECT a.source AS src_a, b.source AS src_b,
             |  CAST(count(*) AS BIGINT) AS n_shared
             |  FROM D a JOIN D b ON a.sh = b.sh AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT src_a, src_b, n_shared,
             |  round(CAST(n_shared AS DOUBLE) / (ca.n + cb.n - n_shared), 6) AS jaccard
             |FROM I
             |JOIN C ca ON ca.source = I.src_a
             |JOIN C cb ON cb.source = I.src_b""".stripMargin)),

    // --- Deterministic seeded corpus shard + order: the training-data
    // "global shuffle". Every epoch-writer needs a stable, seeded,
    // rerun-reproducible permutation of the corpus into N shards with
    // a defined order inside each shard — NOT `orderBy(rand())`, whose
    // output changes per run and whose global sort is a single
    // total-order range shuffle. Here the permutation key is
    // md5(seed, doc_id): shard = first two hex digits (256 shards),
    // position = rank of the key within the shard.
    // Scale shape: shard assignment is pure per-row codegen (zero
    // shuffle); ordering is ONE hash-partition shuffle on the shard id
    // followed by independent in-partition sorts — embarrassingly
    // parallel, no global total order anywhere, and md5 uniformity
    // balances shard sizes to |corpus|/256 +- sqrt. At 100 TB you widen
    // the prefix (3 hex chars = 4096 shards, 4 = 65536) so one shard
    // fits an executor's sort buffer; the plan shape is unchanged.
    // Cross-engine exactness: both engines order by the same lowercase
    // hex string (fixed-width hex compares like the number it encodes)
    // and both parse the same 2-char prefix as the shard id — the t20
    // conv-vs-'0x'-cast pattern.
    // --- Boilerplate-chunk removal (C4/RefinedWeb family): strip every
    // 8-word chunk whose document frequency is >= 4 (headers, footers,
    // nav text — content shared across many documents), RECONSTRUCTING
    // the cleaned text from the surviving chunks in order. t15 FLAGS
    // documents by duplicate-chunk fraction; this is the stage that
    // actually edits them. Scale shape: chunk document-frequency is a
    // map-side-combinable hash agg keyed by the fixed-width md5 (never
    // raw chunk text on the shuffle beyond the doc-local explode); the
    // boilerplate set joins back LEFT ANTI on that key; reconstruction
    // is ONE shuffle keyed by doc_id with an in-group sort bounded by
    // the doc's own chunk count — no global sort, no pair blowup, and
    // a pathological mega-doc costs its own length. The final right
    // join restores fully-boilerplate (and token-less) docs with empty
    // clean_text, so output stays exactly |documents|.
    Q("t22_boilerplate_strip",
      (s, d) => {
        import s.implicits._
        // native WordChunks (chunk TEXTS — reconstruction needs them);
        // the per-chunk md5 below is the codegen'd builtin. Token-less
        // docs yield an empty array (the phantom-chunk guard, in the
        // kernel).
        val chunkArr = graft.expressions.NativeFns.word_chunks($"text", 8)
        val docs = Tables.load(s, d, "documents")
        val chunked = docs
          .select($"doc_id", posexplode(chunkArr).as(Seq("idx", "chunk")))
          .withColumn("h", md5($"chunk"))
        val boiler = chunked.select($"doc_id", $"h").distinct()
          .groupBy($"h").agg(count(lit(1)).as("df"))
          .filter($"df" >= 4).select($"h")
        val kept = chunked.join(boiler, Seq("h"), "left_anti")
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_kept"),
            array_join(transform(
              array_sort(collect_list(struct($"idx", $"chunk"))),
              c => c.getField("chunk")), " ").as("clean_text"))
        chunked.groupBy($"doc_id").agg(count(lit(1)).as("n_chunks"))
          .join(kept, Seq("doc_id"), "left")
          .join(docs.select($"doc_id"), Seq("doc_id"), "right")
          .select($"doc_id",
            coalesce($"n_chunks", lit(0L)).as("n_chunks"),
            coalesce($"n_kept", lit(0L)).as("n_kept"),
            coalesce($"clean_text", lit("")).as("clean_text"))
      },
      Some("""WITH W AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM documents),
             |C AS (SELECT doc_id, idx,
             |  array_to_string(words[idx*8+1:idx*8+8], ' ') AS chunk
             |  FROM (SELECT doc_id, words,
             |    unnest(range(0, CAST(ceil(len(words) / 8.0) AS INT))) AS idx
             |    FROM W)),
             |H AS (SELECT doc_id, idx, chunk, md5(chunk) AS h FROM C),
             |B AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM H)
             |  GROUP BY h HAVING count(*) >= 4),
             |K AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             |  array_to_string(list(chunk ORDER BY idx), ' ') AS clean_text
             |  FROM H WHERE h NOT IN (SELECT h FROM B) GROUP BY doc_id),
             |N AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
             |  FROM H GROUP BY doc_id)
             |SELECT d.doc_id,
             |  COALESCE(N.n_chunks, 0) AS n_chunks,
             |  COALESCE(K.n_kept, 0) AS n_kept,
             |  COALESCE(K.clean_text, '') AS clean_text
             |FROM documents d
             |LEFT JOIN N ON N.doc_id = d.doc_id
             |LEFT JOIN K ON K.doc_id = d.doc_id""".stripMargin)),

    Q("t21_shard_assign",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val h = md5(concat(lit("graft-shard:42:"), $"doc_id".cast("string")))
        Tables.load(s, d, "documents")
          .select($"doc_id", h.as("h"))
          .withColumn("shard", conv(substring($"h", 1, 2), 16, 10).cast("long"))
          .withColumn("pos", row_number().over(
            Window.partitionBy($"shard").orderBy($"h", $"doc_id")).cast("long"))
          .select($"doc_id", $"shard", $"pos")
      },
      Some("""WITH H AS (SELECT doc_id,
             |  md5('graft-shard:42:' || CAST(doc_id AS VARCHAR)) AS h
             |  FROM documents)
             |SELECT doc_id,
             |  ('0x' || h[1:2])::BIGINT AS shard,
             |  CAST(row_number() OVER (PARTITION BY h[1:2]
             |    ORDER BY h, doc_id) AS BIGINT) AS pos
             |FROM H""".stripMargin)),

    // --- Temperature-resampled training mix (mT5/XLM-R sampling rule):
    // per-lang targets ∝ (n_lang/N)^0.3 renormalized over a 300-doc
    // budget — alpha<1 upsamples tail languages, downsamples the head —
    // then each lang contributes its `target` lowest-md5(doc_id) docs
    // (the t10 deterministic sample). Selection rides
    // Curation.temperatureMix: tiny counts aggregate broadcast back +
    // ONE corpus pass through the distributed prefix sum, so no
    // single-stratum serial sort (the oracle's single window per lang
    // is the semantic statement, not the scale plan). The normalizer
    // sums DECIMAL(10,6) weights — exact, order-independent — so both
    // engines derive identical targets.
    Q("t23_temperature_mix",
      (s, d) => {
        import s.implicits._
        graft.operators.Curation.temperatureMix(
          Tables.load(s, d, "documents"), $"lang", $"doc_id",
          alpha = 0.3, budget = 300)
          .select($"id".as("doc_id"), $"stratum".as("lang"),
            $"n_stratum", $"target")
      },
      Some("""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_stratum
             |  FROM documents GROUP BY lang),
             |w AS (SELECT lang, n_stratum,
             |  CAST(round(pow(CAST(n_stratum AS DOUBLE) /
             |    CAST(sum(n_stratum) OVER () AS DOUBLE), 0.3), 6)
             |    AS DECIMAL(10,6)) AS wv
             |  FROM c),
             |t AS (SELECT lang, n_stratum,
             |  greatest(1, CAST(round(CAST(300 AS DOUBLE) * CAST(wv AS DOUBLE)
             |    / CAST(sum(wv) OVER () AS DOUBLE)) AS BIGINT)) AS target
             |  FROM w),
             |r AS (SELECT doc_id, lang,
             |  row_number() OVER (PARTITION BY lang
             |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
             |  FROM documents)
             |SELECT r.doc_id, r.lang, t.n_stratum, t.target
             |FROM r JOIN t USING (lang) WHERE r.rk <= t.target""".stripMargin)),

    // --- Intra-document dedup: strip repeated chunks WITHIN each doc,
    // keeping the first occurrence — the within-page cleaning pass
    // (navigation loops, repeated headers, template spam) that t22's
    // corpus-level boilerplate strip deliberately does not cover
    // (t22's doc-frequency gate counts each doc once, so a chunk
    // repeated 50× inside ONE page survives it). Same chunk kernel and
    // reconstruction as t22; first-occurrence selection is a
    // rank-filter windowed by (doc_id, chunk-hash) — group size = one
    // doc's copies of one chunk, so no task ever sorts beyond a doc's
    // own length, and a pathological mega-doc costs only itself. The
    // final right join keeps output exactly |documents| (token-less
    // docs: 0 chunks, empty clean_text).
    //
    // The synthetic corpus has no intra-doc repeats, which would leave
    // the oracle validating only chunking+reconstruction identity — so
    // BOTH engines derive a repeat-injected corpus from `documents`
    // first: each doc's words are truncated to a multiple of 8 (the
    // chunk width, so the injection lands on a chunk boundary) and its
    // first 8-word chunk is appended twice — template spam, literally.
    // Every ≥8-word doc then has n_kept < n_chunks and the strip path
    // itself is what the rows/schema/hash gate verifies; sub-8-word
    // docs pass through raw (≤1 chunk, nothing to strip).
    Q("t24_intradoc_dedup",
      (s, d) => {
        import s.implicits._
        val words = filter(
          split(lower($"text"), "[^a-z0-9]+"), w => w =!= lit(""))
        val derived = Tables.load(s, d, "documents")
          .withColumn("_ws", words)
          .withColumn("_k8", size($"_ws") - pmod(size($"_ws"), lit(8)))
          .select($"doc_id",
            when(size($"_ws") >= 8,
              array_join(concat(
                slice($"_ws", lit(1), $"_k8"),
                slice($"_ws", 1, 8), slice($"_ws", 1, 8)), " "))
              .otherwise($"text").as("text"))
        graft.operators.Curation.intraDocDedup(derived, $"doc_id", $"text")
      },
      Some("""WITH W0 AS (SELECT doc_id, text,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
             |  FROM documents),
             |D AS (SELECT doc_id,
             |  CASE WHEN len(ws) >= 8 THEN array_to_string(
             |    ws[1:(len(ws)//8)*8] || ws[1:8] || ws[1:8], ' ')
             |  ELSE text END AS text FROM W0),
             |W AS (SELECT doc_id,
             |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS words
             |  FROM D),
             |C AS (SELECT doc_id, idx,
             |  array_to_string(words[idx*8+1:idx*8+8], ' ') AS chunk
             |  FROM (SELECT doc_id, words,
             |    unnest(range(0, CAST(ceil(len(words) / 8.0) AS INT))) AS idx
             |    FROM W)),
             |H AS (SELECT doc_id, idx, chunk, md5(chunk) AS h FROM C),
             |F AS (SELECT doc_id, idx, chunk FROM (
             |  SELECT doc_id, idx, chunk,
             |    row_number() OVER (PARTITION BY doc_id, h ORDER BY idx) AS rn
             |  FROM H) WHERE rn = 1),
             |K AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             |  array_to_string(list(chunk ORDER BY idx), ' ') AS clean_text
             |  FROM F GROUP BY doc_id),
             |N AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
             |  FROM H GROUP BY doc_id)
             |SELECT d.doc_id,
             |  COALESCE(N.n_chunks, 0) AS n_chunks,
             |  COALESCE(K.n_kept, 0) AS n_kept,
             |  COALESCE(K.clean_text, '') AS clean_text
             |FROM documents d
             |LEFT JOIN N ON N.doc_id = d.doc_id
             |LEFT JOIN K ON K.doc_id = d.doc_id""".stripMargin)),

    // --- DSIR data selection (Xie et al. 2023): pick the raw docs
    // whose hashed-bigram distribution most resembles the target
    // domain (here: source = 'src1') via Laplace-smoothed importance
    // log-ratios over 4096 hash buckets — the standard
    // pretraining-data selection method, made deterministic (hash
    // buckets + rounded-weight ordering instead of Gumbel noise).
    // See Curation.dsirSelect for the scale shape.
    Q("t25_dsir_select",
      (s, d) => {
        import s.implicits._
        graft.operators.Curation.dsirSelect(
          Tables.load(s, d, "documents"), $"doc_id", $"text",
          $"source" === "src1", budget = 200)
          .select($"id".as("doc_id"), $"n_feat", $"weight")
      },
      Some(dsirOracle)),

    // --- The same DSIR contract through the PERSISTED feature table
    // ([[graft.operators.DsirIndex]]): featurize the corpus ONCE into
    // the reduced (id, bucket, n) occurrence table (once per session
    // per corpus — writeOnce, the build-once amortization t25's memo
    // hints at), then select against it with the target ids joined at
    // read time. Featurization is deterministic, so the result is
    // row-identical to t25 and shares its oracle — what this entry
    // adds to the gate is the write -> load -> join-target -> weigh ->
    // cut path a day-N production selection runs.
    Q("t26_dsir_indexed",
      (s, d) => {
        import s.implicits._
        val docs = Tables.load(s, d, "documents")
        val dir = graft.operators.DsirIndex.writeOnce(
          docs, $"doc_id", $"text")
        graft.operators.Curation.dsirSelectIndexed(s, dir,
          docs.filter($"source" === "src1").select($"doc_id"),
          budget = 200)
          .select($"id".as("doc_id"), $"n_feat", $"weight")
      },
      Some(dsirOracle)),

    // --- The DISTRIBUTED rank cut, oracle-gated (VERDICT r18 #3):
    // above [[graft.operators.Curation.DsirRankCutBudget]] the
    // budget cut switches from TakeOrderedAndProject (budget-sized
    // driver heap) to the PrefixSum running-total rank filter (driver
    // holds only per-partition bucket offsets) — the form a 1M-doc
    // budget needs. t25/t26 gate at budget=200 → TakeOrdered, so this
    // entry forces viaRank: the rows are identical by construction
    // (same (weight desc, id asc) total order, same top-200) and the
    // shared oracle now actually EXECUTES PrefixSum.runningTotal in a
    // CORRECTNESS row rather than only in CurationSpec.
    Q("t27_dsir_rankcut",
      (s, d) => {
        import s.implicits._
        graft.operators.Curation.dsirSelect(
          Tables.load(s, d, "documents"), $"doc_id", $"text",
          $"source" === "src1", budget = 200, viaRank = Some(true))
          .select($"id".as("doc_id"), $"n_feat", $"weight")
      },
      Some(dsirOracle))
  )

  // shared by t25 (inline) and t26 (persisted feature table): the two
  // plans are proven row-identical, so one restatement gates both
  private lazy val dsirOracle =
    """WITH W AS (SELECT doc_id, source,
      |  list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS ws
      |  FROM documents),
      |E AS (SELECT doc_id, source = 'src1' AS t,
      |  ('0x' || substr(md5(bg), 1, 8))::BIGINT % 4096 AS b
      |  FROM (SELECT doc_id, source,
      |    unnest(list_transform(range(2, len(ws) + 1),
      |      i -> ws[i - 1] || ' ' || ws[i])) AS bg FROM W)),
      |C AS (SELECT b, count(*) FILTER (WHERE t) AS ct,
      |  count(*) AS cr FROM E GROUP BY 1),
      |T AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM C),
      |L AS (SELECT b,
      |  ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + 4096 AS DOUBLE)) -
      |  ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + 4096 AS DOUBLE)) AS lw
      |  FROM C CROSS JOIN T),
      |R AS (SELECT doc_id, b, count(*) AS n FROM E GROUP BY 1, 2),
      |D AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_feat,
      |  round(sum(n * lw), 6) AS weight
      |  FROM R JOIN L USING (b) GROUP BY 1)
      |SELECT doc_id, n_feat, weight FROM D
      |ORDER BY weight DESC, doc_id LIMIT 200""".stripMargin
}
