package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Similarity-search operators over `embeddings.embedding:
  * array<float>`: brute-force cosine top-k (exact baseline) and the
  * IVF-style cell-partitioned variant (scale path). See
  * [[graft.operators.Similarity]].
  */
object SimilarityOps extends QuerySet {

  private val cosSql =
    """round(list_sum(list_transform(range(1,65), i -> qv[i]*cv[i])) /
      |  (sqrt(list_sum(list_transform(qv, x -> x*x))) *
      |   sqrt(list_sum(list_transform(cv, x -> x*x)))), 6)""".stripMargin

  // s04 and s05 share this oracle verbatim: the indexed search is
  // proven row-identical to the inline IVF (same training, same
  // probe ranking) — only the storage layout differs.
  private lazy val ivfOracle: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              |  FROM embeddings),
              |seeds AS (SELECT vec_id AS cell, v AS sv FROM e WHERE vec_id < 16),
              |snorm AS (SELECT cell, sv,
              |  sqrt(list_sum(list_transform(sv, x -> x*x))) AS nrm FROM seeds),
              |assign AS (
              |  SELECT vec_id, cell FROM (
              |    SELECT e.vec_id, s.cell,
              |      row_number() OVER (PARTITION BY e.vec_id
              |        ORDER BY (list_sum(list_transform(range(1,65),
              |          i -> v[i] * sv[i])) / nrm) DESC, s.cell ASC) AS rn
              |    FROM e CROSS JOIN snorm s) WHERE rn = 1),
              |dimsum AS (
              |  SELECT a.cell, dim,
              |    round(sum(v[CAST(dim AS INTEGER)]) / count(*), 6) AS m
              |  FROM assign a JOIN e USING (vec_id)
              |  CROSS JOIN (SELECT unnest(range(1,65)) AS dim)
              |  GROUP BY a.cell, dim),
              |means AS (SELECT cell, list(m ORDER BY dim) AS cv FROM dimsum GROUP BY cell),
              |cents AS (
              |  SELECT c.cell, coalesce(m.cv, s.sv) AS cv
              |  FROM (SELECT unnest(range(0,16)) AS cell) c
              |  LEFT JOIN means m USING (cell) JOIN seeds s USING (cell)),
              |cnorm AS (SELECT cell, cv,
              |  sqrt(list_sum(list_transform(cv, x -> x*x))) AS nrm FROM cents),
              |cassign AS (
              |  SELECT vec_id, cell FROM (
              |    SELECT e.vec_id, c.cell,
              |      row_number() OVER (PARTITION BY e.vec_id
              |        ORDER BY (list_sum(list_transform(range(1,65),
              |          i -> v[i] * cv[i])) / nrm) DESC, c.cell ASC) AS rn
              |    FROM e CROSS JOIN cnorm c) WHERE rn = 1),
              |ec AS (SELECT e.vec_id, v, cell FROM e JOIN cassign USING (vec_id)),
              |qp AS (
              |  SELECT query_id, qv, cell FROM (
              |    SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
              |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
              |        (list_sum(list_transform(range(1,65), i -> q.v[i] * fcv[i])) /
              |         (sqrt(list_sum(list_transform(q.v, x -> x*x))) *
              |          sqrt(list_sum(list_transform(fcv, x -> x*x))))) DESC,
              |        c.cell ASC) AS pr
              |    FROM (SELECT vec_id, v FROM e WHERE vec_id < 20) q
              |    CROSS JOIN (SELECT cell,
              |      list_transform(cv, x -> CAST(CAST(x AS REAL) AS DOUBLE)) AS fcv
              |      FROM cents) c) WHERE pr <= 3),
              |sc AS (SELECT query_id, ec.vec_id, ec.v AS cv, qv
              |  FROM qp JOIN ec USING (cell) WHERE ec.vec_id <> query_id),
              |r AS (SELECT query_id, vec_id, $cosSql AS cos FROM sc),
              |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
              |  ORDER BY cos DESC, vec_id ASC) AS rk FROM r)
              |SELECT query_id, rk, vec_id, cos FROM rk WHERE rk <= 10""".stripMargin

  val all: Seq[Q] = Seq(

    // --- Exact brute-force kNN: 5 query vectors vs the whole corpus;
    // query side broadcast, corpus scanned once, rank-filter top-k.
    Q("s01_knn_bruteforce",
      (s, d) => {
        import s.implicits._
        val e = Tables.load(s, d, "embeddings")
        Similarity.knnBruteForce(
          e.filter($"vec_id" < 5).select($"vec_id", $"embedding"),
          e.select($"vec_id", $"embedding"), k = 5)
      },
      Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              |  FROM embeddings),
              |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
              |sc AS (SELECT query_id, e.vec_id, e.v AS cv, qv FROM q JOIN e ON e.vec_id <> query_id),
              |r AS (SELECT query_id, vec_id, $cosSql AS cos FROM sc),
              |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
              |  ORDER BY cos DESC, vec_id ASC) AS rk FROM r)
              |SELECT query_id, rk, vec_id, cos FROM rk WHERE rk <= 5""".stripMargin)),

    // --- Cell-partitioned (IVF-style) kNN: the equi-join on the cell
    // bounds candidates to one cell's corpus per query.
    Q("s02_knn_by_cell",
      (s, d) => {
        import s.implicits._
        val e = Tables.load(s, d, "embeddings")
        Similarity.knnByCell(
          e.filter($"vec_id" < 20).select($"vec_id", $"embedding", $"label"),
          e.select($"vec_id", $"embedding", $"label"), k = 3)
      },
      Some(s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS v
              |  FROM embeddings),
              |q AS (SELECT vec_id AS query_id, label, v AS qv FROM e WHERE vec_id < 20),
              |sc AS (SELECT query_id, e.label, e.vec_id, e.v AS cv, qv
              |  FROM q JOIN e USING (label) WHERE e.vec_id <> query_id),
              |r AS (SELECT query_id, label AS cell, vec_id, $cosSql AS cos FROM sc),
              |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
              |  ORDER BY cos DESC, vec_id ASC) AS rk FROM r)
              |SELECT query_id, cell, rk, vec_id, cos FROM rk WHERE rk <= 3""".stripMargin)),

    // --- Trained-IVF ANN. With iters=1 the whole index build IS one
    // SQL statement, so the oracle restates it end to end: seed
    // centroids (16 lowest ids) -> cosine argmax assignment (ties to
    // the lowest cell, matching NearestCentroid) -> per-dim means
    // rounded to 6 (vector_avg parity; empty cells keep their seed) ->
    // nprobe=3 probe ranking against FLOAT-cast centroids (knnIvf casts
    // before probe scoring) -> in-cell cosine top-k.
    Q("s04_knn_ivf",
      (s, d) => {
        import s.implicits._
        val e = Tables.load(s, d, "embeddings")
        Similarity.knnIvf(
          e.filter($"vec_id" < 20).select($"vec_id", $"embedding"),
          e.select($"vec_id", $"embedding"),
          // one Lloyd iteration: recall measured flat vs iters=2 on
          // this corpus (0.885 vs 0.875 @ sf0.1), half the serial
          // training job chain
          k = 10, nCells = 16, iters = 1, dim = 64, nprobe = 3)
      },
      Some(ivfOracle)),

    // --- The same IVF contract through the PERSISTED index
    // ([[graft.operators.AnnIndex]]): train+write the cell-partitioned
    // layout (once per session per corpus — writeOnce, the build-once
    // amortization every ANN deployment relies on), load it back,
    // search with static partition pruning on the probe cells.
    // Training is deterministic, so the result is row-identical to s04
    // and shares its oracle — what this entry adds to the gate is the
    // write -> load -> pruned-scan -> search path.
    Q("s05_knn_ivf_indexed",
      (s, d) => {
        import s.implicits._
        val e = Tables.load(s, d, "embeddings")
        val dir = graft.operators.AnnIndex.writeOnce(
          e.select($"vec_id", $"embedding"),
          nCells = 16, iters = 1, dim = 64)
        graft.operators.AnnIndex.search(
          graft.operators.AnnIndex.loadOnce(s, dir),
          e.filter($"vec_id" < 20).select($"vec_id", $"embedding"),
          k = 10, nprobe = 3)
      },
      Some(ivfOracle)),

    // --- Sign-LSH ANN with Hamming-1 multi-probe (the scale path when
    // no natural cell exists). The hyperplanes are a pure function of
    // md5("plane:<p>:<j>") (no RNG — HyperplaneBucket scaladoc), so the
    // ENTIRE approximate index is restated in the oracle: hex->signed
    // int32 plane weights, per-plane sign bits -> bucket, Hamming-1
    // probe fan-out, in-bucket cosine top-k.
    Q("s03_knn_lsh",
      (s, d) => {
        import s.implicits._
        val e = Tables.load(s, d, "embeddings")
        Similarity.knnHyperplaneLSH(
          e.filter($"vec_id" < 20).select($"vec_id", $"embedding"),
          e.select($"vec_id", $"embedding"),
          k = 10, nPlanes = 4, dim = 64, multiProbe = true)
      },
      Some(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
              |  FROM embeddings),
              |hx AS (SELECT p, j, md5('plane:' || p || ':' || j) AS h
              |  FROM (SELECT unnest(range(0,4)) AS p)
              |  CROSS JOIN (SELECT unnest(range(0,64)) AS j)),
              |pw AS (SELECT p, j,
              |  CAST(list_sum(list_transform(range(1,9),
              |    pos -> (strpos('0123456789abcdef', substr(h, CAST(pos AS INTEGER), 1)) - 1)
              |           * power(16, 8 - pos))) AS BIGINT) AS raw FROM hx),
              |pl AS (SELECT p, list((CASE WHEN raw >= 2147483648
              |    THEN raw - 4294967296 ELSE raw END) / 2147483648.0
              |  ORDER BY j) AS wv FROM pw GROUP BY p),
              |dots AS (SELECT vec_id, p,
              |  list_sum(list_transform(range(1,65), i -> v[i] * wv[i])) AS dot
              |  FROM e CROSS JOIN pl),
              |cells AS (SELECT vec_id, CAST(sum(CASE WHEN dot >= 0
              |    THEN CAST(power(2, p) AS BIGINT) ELSE 0 END) AS INTEGER) AS cell
              |  FROM dots GROUP BY vec_id),
              |ec AS (SELECT e.vec_id, v, cell FROM e JOIN cells USING (vec_id)),
              |q AS (SELECT vec_id AS query_id, v AS qv, cell FROM ec WHERE vec_id < 20),
              |probes AS (SELECT query_id, qv, unnest([cell, xor(cell,1), xor(cell,2),
              |  xor(cell,4), xor(cell,8)]) AS cell FROM q),
              |sc AS (SELECT query_id, ec.vec_id, ec.v AS cv, qv
              |  FROM probes JOIN ec USING (cell) WHERE ec.vec_id <> query_id),
              |r AS (SELECT query_id, vec_id, $cosSql AS cos FROM sc),
              |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
              |  ORDER BY cos DESC, vec_id ASC) AS rk FROM r)
              |SELECT query_id, rk, vec_id, cos FROM rk WHERE rk <= 10""".stripMargin))
  )
}
