package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Generated-SQL restatement of the deterministic IVF build
  * ([[graft.operators.Similarity.trainIvfCentroids]]), shared by the
  * s04/s05 search oracle and d11's SemDeDup oracle: greedy k-center
  * seeding, `iters` Lloyd rounds, final cosine-argmax cell assignment.
  * The step-by-step derivation (why each stage replays bit-for-bit) is
  * documented at [[SimilarityOps]]'s oracle builder.
  */
private[queries] object IvfSql {

  /** Name of the final centroid CTE produced by [[assignCtes]]. */
  def finalCents(iters: Int): String = s"cents$iters"

  /** CTE chain `WITH e AS ... cassign` — NO trailing comma; callers
    * append their own CTEs and final SELECT. `e` carries (vec_id,
    * v: DOUBLE[]) for the whole corpus; `cassign` maps every vec_id to
    * its final cell (cosine argmax against the trained centroids, ties
    * to the lowest cell, matching NearestCentroid).
    *
    * `trainWhere` (optional predicate over `e`'s columns) restricts
    * the TRAINING population — seeding and the Lloyd assignment/means
    * — while `cassign` still assigns every corpus row: the
    * incremental shape where centroids come from the persisted base
    * index and the delta is only assigned (d12). Empty = train on
    * everything (s04/s05/d11), generating the exact original text.
    *
    * `corpusWhere` (optional predicate over the raw embeddings
    * columns) restricts the CORPUS itself — `e` carries only matching
    * rows, so training AND assignment see the slice. Used by d13,
    * whose Spark side runs the √N auto-dial over a fixed-size slice
    * (`vec_id < 500` — 500 rows at every SF) so the generated oracle's
    * compile-time k = ceil(sqrt(500)) is scale-independent.
    */
  def assignCtes(nCells: Int, iters: Int, dim: Int,
                 trainWhere: String = "", corpusWhere: String = ""): String = {
    val dr = s"range(1,${dim + 1})"
    def dotOver(a: String, b: String) =
      s"list_sum(list_transform($dr, i -> $a[i] * $b[i]))"
    val tw = if (trainWhere.isEmpty) "" else s" WHERE $trainWhere"
    val cw = if (corpusWhere.isEmpty) "" else s" WHERE $corpusWhere"
    val sb = new StringBuilder
    // MATERIALIZED: the seeding chain references e/vn once per seed —
    // without the hint DuckDB inlines the CTE and re-opens the parquet
    // for every reference (fd exhaustion at k=16 x ~3 refs each)
    sb ++= s"""WITH e AS MATERIALIZED (SELECT vec_id,
      | list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings$cw),
      |vn AS MATERIALIZED (SELECT vec_id, v, nrm FROM (
      | SELECT vec_id, v,
      |  sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM e$tw)
      | WHERE nrm > 0),
      |sd0 AS MATERIALIZED (SELECT vec_id, v, nrm FROM vn ORDER BY vec_id LIMIT 1),
      |mc1 AS MATERIALIZED (SELECT a.vec_id, a.v, a.nrm,
      | (${dotOver("a.v", "s.v")} / (a.nrm * s.nrm)) AS mc
      | FROM vn a CROSS JOIN sd0 s),
      |""".stripMargin
    // every mc/sd MATERIALIZED: each mc{i} is referenced twice (by
    // sd{i} and mc{i+1}) — inlined, the chain would expand 2^k-fold
    for (i <- 1 until nCells) {
      sb ++= s"sd$i AS MATERIALIZED (SELECT vec_id, v, nrm FROM mc$i" +
        " ORDER BY mc ASC, vec_id ASC LIMIT 1),\n"
      if (i < nCells - 1)
        sb ++= s"mc${i + 1} AS MATERIALIZED (SELECT a.vec_id, a.v, a.nrm,\n" +
          s" greatest(a.mc, (${dotOver("a.v", "s.v")} / (a.nrm * s.nrm))) AS mc\n" +
          s" FROM mc$i a CROSS JOIN sd$i s),\n"
    }
    sb ++= (0 until nCells)
      .map(i => s"SELECT $i AS cell, v AS cv FROM sd$i")
      .mkString("cents0 AS MATERIALIZED (", " UNION ALL ", "),\n")
    for (t <- 1 to iters) {
      sb ++= s"""cn${t - 1} AS (SELECT cell, cv,
        | sqrt(list_sum(list_transform(cv, x -> x*x))) AS nrm FROM cents${t - 1}),
        |asg$t AS (SELECT vec_id, cell FROM (
        | SELECT e.vec_id, c.cell,
        |  row_number() OVER (PARTITION BY e.vec_id
        |   ORDER BY (${dotOver("v", "cv")} / nrm) DESC, c.cell ASC) AS rn
        | FROM e CROSS JOIN cn${t - 1} c$tw) WHERE rn = 1),
        |ds$t AS (SELECT a.cell, dim,
        | round(sum(v[CAST(dim AS INTEGER)]) / count(*), 6) AS m
        | FROM asg$t a JOIN e USING (vec_id)
        | CROSS JOIN (SELECT unnest($dr) AS dim)
        | GROUP BY a.cell, dim),
        |mn$t AS (SELECT cell, list(m ORDER BY dim) AS cv FROM ds$t GROUP BY cell),
        |cents$t AS MATERIALIZED (SELECT c.cell, coalesce(m.cv, p.cv) AS cv
        | FROM (SELECT unnest(range(0,$nCells)) AS cell) c
        | LEFT JOIN mn$t m USING (cell) JOIN cents${t - 1} p USING (cell)),
        |""".stripMargin
    }
    val fin = finalCents(iters)
    sb ++= s"""cnorm AS (SELECT cell, cv,
      | sqrt(list_sum(list_transform(cv, x -> x*x))) AS nrm FROM $fin),
      |cassign AS (SELECT vec_id, cell FROM (
      | SELECT e.vec_id, c.cell,
      |  row_number() OVER (PARTITION BY e.vec_id
      |   ORDER BY (${dotOver("v", "cv")} / nrm) DESC, c.cell ASC) AS rn
      | FROM e CROSS JOIN cnorm c) WHERE rn = 1)""".stripMargin
    sb.toString
  }
}

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
  //
  // Generated CTE-for-CTE restatement of the ENTIRE deterministic IVF
  // build ([[graft.operators.Similarity]]):
  //   1. k-center seeding (Similarity.kcenterSeeds): sd0 = lowest-id
  //      vector; sd{i} = argmin over the corpus of max-cosine to the
  //      seeds so far (raw-double comparisons — both sides perform the
  //      same widen-then-strict-left-fold IEEE ops, so the argmin
  //      agrees bit-for-bit), ties to the lowest vec_id; mc{i} carries
  //      the running max-cosine forward so each step is one cross join
  //      against ONE new seed.
  //   2. `iters` Lloyd rounds: cosine argmax assignment (ties to the
  //      lowest cell, matching NearestCentroid) -> per-dim means
  //      rounded to 6 (vector_avg parity; empty cells keep the
  //      previous round's centroid).
  //   3. Search: final corpus assignment, nprobe probe ranking against
  //      FLOAT-cast centroids (knnIvf casts before probe scoring),
  //      in-cell cosine top-k.
  private def ivfOracleSql(nCells: Int, iters: Int, nprobe: Int,
                           k: Int, nQ: Int, dim: Int): String = {
    val dr = s"range(1,${dim + 1})"
    def dotOver(a: String, b: String) =
      s"list_sum(list_transform($dr, i -> $a[i] * $b[i]))"
    val fin = IvfSql.finalCents(iters)
    IvfSql.assignCtes(nCells, iters, dim) + s""",
      |ec AS (SELECT e.vec_id, v, cell FROM e JOIN cassign USING (vec_id)),
      |qp AS (SELECT query_id, qv, cell FROM (
      | SELECT q.vec_id AS query_id, q.v AS qv, c.cell,
      |  row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |   (${dotOver("q.v", "fcv")} /
      |    (sqrt(list_sum(list_transform(q.v, x -> x*x))) *
      |     sqrt(list_sum(list_transform(fcv, x -> x*x))))) DESC,
      |   c.cell ASC) AS pr
      | FROM (SELECT vec_id, v FROM e WHERE vec_id < $nQ) q
      | CROSS JOIN (SELECT cell,
      |  list_transform(cv, x -> CAST(CAST(x AS REAL) AS DOUBLE)) AS fcv
      |  FROM $fin) c) WHERE pr <= $nprobe),
      |sc AS (SELECT query_id, ec.vec_id, ec.v AS cv, qv
      | FROM qp JOIN ec USING (cell) WHERE ec.vec_id <> query_id),
      |r AS (SELECT query_id, vec_id, $cosSql AS cos FROM sc),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
      | ORDER BY cos DESC, vec_id ASC) AS rk FROM r)
      |SELECT query_id, rk, vec_id, cos FROM rk WHERE rk <= $k""".stripMargin
  }

  private lazy val ivfOracle: String =
    ivfOracleSql(nCells = 16, iters = 6, nprobe = 3, k = 10, nQ = 20, dim = 64)

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

    // --- Trained-IVF ANN. The whole deterministic index build —
    // greedy k-center seeding + two Lloyd rounds — is restated CTE for
    // CTE in the generated oracle ([[ivfOracleSql]]): no RNG anywhere,
    // so DuckDB replays seeding, both refinement rounds, the nprobe=3
    // probe ranking against FLOAT-cast centroids, and the in-cell
    // cosine top-k bit-for-bit. kcenter + iters=2 is the
    // recall-measured production dial (BENCH_ann_recall.json) vs the
    // legacy lowid/iters=1 training.
    Q("s04_knn_ivf",
      (s, d) => {
        import s.implicits._
        val e = Tables.load(s, d, "embeddings")
        Similarity.knnIvf(
          e.filter($"vec_id" < 20).select($"vec_id", $"embedding"),
          e.select($"vec_id", $"embedding"),
          k = 10, nCells = 16, iters = 6, dim = 64, nprobe = 3,
          seedMode = "kcenter")
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
          nCells = 16, iters = 6, dim = 64, seedMode = "kcenter")
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
              |SELECT query_id, rk, vec_id, cos FROM rk WHERE rk <= 10""".stripMargin)),

    // --- Sketch-prefilter + exact re-rank: the unstructured-corpus
    // serve path (see Similarity.knnSketchRerank). The seeded gaussian
    // projection matrix is embedded in the generated oracle as double
    // literals (Float#toDouble#toString round-trips exactly), the
    // FLOAT-cast of each sketch element is replayed with CAST(..AS
    // FLOAT), and both the sketch ranking (unrounded double cosine,
    // vec_id tie-break, top-m) and the exact 6-dp re-rank are restated
    // CTE for CTE.
    Q("s06_knn_sketch_rerank",
      (s, d) => {
        import s.implicits._
        // loadRaw: the operator spreads the NARROW sketch frame itself;
        // the load-time full-vector repartition would re-introduce the
        // exchange the sketch pass exists to avoid
        val e = Tables.loadRaw(s, d, "embeddings")
        Similarity.knnSketchRerank(
          e.filter($"vec_id" < 20).select($"vec_id", $"embedding"),
          e.select($"vec_id", $"embedding"),
          k = 10, m = 100)
      },
      Some(sketchOracle)),

    // --- The same sketch-rerank contract through the PERSISTED index
    // ([[graft.operators.AnnIndex.writeSketch]]): sketch every corpus
    // vector ONCE into a sibling `sketches` table (sketchDim/dim of
    // the vector bytes — the 100 TB full-corpus pass becomes a
    // quarter-size scan), then serve pass 1 from that table alone and
    // read full vectors only for the m survivors. Sketching is
    // deterministic and floats round-trip parquet exactly, so the
    // result is row-identical to s06 and shares its oracle — what this
    // entry adds to the gate is the write -> load -> sketch-scan ->
    // rerank path.
    Q("s07_knn_sketch_indexed",
      (s, d) => {
        import s.implicits._
        val e = Tables.loadRaw(s, d, "embeddings")
        val dir = graft.operators.AnnIndex.writeSketchOnce(
          e.select($"vec_id", $"embedding"))
        graft.operators.AnnIndex.searchSketch(s, dir,
          e.filter($"vec_id" < 20).select($"vec_id", $"embedding"),
          k = 10, m = 100)
      },
      Some(sketchOracle))
  )

  private lazy val sketchOracle: String =
    sketchOracleSql(k = 10, m = 100, nQ = 20, dim = 64,
      sketchDim = 16, seed = 20260814L)

  /** Generated DuckDB restatement of [[Similarity.knnSketchRerank]]. */
  private def sketchOracleSql(k: Int, m: Int, nQ: Int, dim: Int,
                              sketchDim: Int, seed: Long): String = {
    val r = Similarity.sketchMatrix(dim, sketchDim, seed)
    def lits(row: Array[Float]): String =
      row.map(f => f.toDouble.toString).mkString("[", ",", "]")
    val skElems = r.map(row =>
      s"CAST(list_sum(list_transform(range(1,${dim + 1}), i -> v[i] * ${lits(row)}[i])) AS FLOAT)")
      .mkString("[", ",\n", "]")
    s"""WITH e AS MATERIALIZED (SELECT vec_id,
       | list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |sk AS MATERIALIZED (SELECT vec_id, v,
       | list_transform($skElems, x -> x::DOUBLE) AS sd FROM e),
       |q AS MATERIALIZED (SELECT vec_id AS query_id, v AS qv, sd AS qs
       | FROM sk WHERE vec_id < $nQ),
       |ssc AS (SELECT query_id, c.vec_id, qv, c.v AS cv,
       | list_sum(list_transform(range(1,${sketchDim + 1}), i -> qs[i]*c.sd[i])) /
       |  (sqrt(list_sum(list_transform(qs, x -> x*x))) *
       |   sqrt(list_sum(list_transform(c.sd, x -> x*x)))) AS s
       | FROM q JOIN sk c ON c.vec_id <> query_id),
       |cand AS (SELECT query_id, vec_id, qv, cv FROM (
       | SELECT *, row_number() OVER (PARTITION BY query_id
       |  ORDER BY s DESC, vec_id ASC) AS srk FROM ssc) WHERE srk <= $m),
       |r AS (SELECT query_id, vec_id, $cosSql AS cos FROM cand),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       | ORDER BY cos DESC, vec_id ASC) AS rk FROM r)
       |SELECT query_id, rk, vec_id, cos FROM rk WHERE rk <= $k""".stripMargin
  }
}
