package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Similarity}

/** Persisted IVF index: the indexed search must be row-identical to
  * the inline IVF with the same parameters, the probe scan must
  * partition-prune to the probed cells, and appended vectors must be
  * searchable without retraining.
  */
class AnnIndexSpec extends SparkSpec {

  private def emb = Tables.load(spark, sf0001, "embeddings")
    .select(col("vec_id"), col("embedding"))

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("indexed search == inline knnIvf; the probe scan partition-prunes") {
    val dir = Files.createTempDirectory("graft-ann-ix").toString
    AnnIndex.write(dir, emb, nCells = 8, iters = 1, dim = 64)
    val ix = AnnIndex.load(spark, dir)
    assert(ix.meta == AnnIndex.Meta(8, 1, 64, "lowid", 1))

    val q = emb.filter(col("vec_id") < 5)
    val got = AnnIndex.search(ix, q, k = 5, nprobe = 2)
    val inline = Similarity.knnIvf(q, emb, k = 5, nCells = 8, iters = 1,
      dim = 64, nprobe = 2)

    val expected = rows(inline)
    assert(expected.nonEmpty)
    assert(rows(got) == expected)

    got.collect()
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell#"),
      s"indexed search must partition-prune the corpus scan on cell:\n$plan")
  }

  test("appendVectors: a duplicate vector lands in its cell and is found at cos 1.0") {
    val dir = Files.createTempDirectory("graft-ann-ix").toString
    AnnIndex.write(dir, emb, nCells = 8, iters = 1, dim = 64)

    // clone vec 0 under a fresh id: nearest_centroid is deterministic,
    // so the clone lands in vec 0's own cell — which is also vec 0's
    // top probe cell (both rankings maximize the same cosine)
    val clone = emb.filter(col("vec_id") === 0)
      .select(lit(777777L).as("vec_id"), col("embedding"))
    AnnIndex.appendVectors(dir, clone)

    val got = rows(AnnIndex.search(AnnIndex.load(spark, dir),
      emb.filter(col("vec_id") === 0), k = 5, nprobe = 2))
    assert(got.exists { case (qid, _, vid, cos) =>
      qid == 0L && vid == 777777L && cos == 1.0
    }, s"appended clone must surface as a cos-1.0 neighbor of vec 0: $got")
  }

  test("loadOnce never serves stale centroids after retrain-by-rewrite at the same path") {
    // The serve-path memo used to key on (session, path) alone: after a
    // retrain-by-rewrite — the maintenance write() itself recommends —
    // searches combined the OLD centroids with the NEW cell layout and
    // silently returned wrong neighbors. The memo now keys on on-disk
    // content (file lengths/mtimes) and writers invalidate eagerly.
    val dir = Files.createTempDirectory("graft-ann-ix").toString
    AnnIndex.write(dir, emb, nCells = 4, iters = 1, dim = 64)
    val first = AnnIndex.loadOnce(spark, dir)
    assert(first.meta.nCells == 4 && first.centroids.length == 4)

    AnnIndex.write(dir, emb, nCells = 8, iters = 1, dim = 64)
    val second = AnnIndex.loadOnce(spark, dir)
    assert(second.meta.nCells == 8 && second.centroids.length == 8,
      "loadOnce served the pre-rewrite index")
    // and the refreshed index actually serves: parity with inline IVF
    // on the new geometry
    val q = emb.filter(col("vec_id") < 3)
    assert(rows(AnnIndex.search(second, q, k = 3, nprobe = 2)) ==
      rows(Similarity.knnIvf(q, emb, k = 3, nCells = 8, iters = 1, dim = 64, nprobe = 2)))
  }

  test("loading a foreign format version fails loudly") {
    val dir = Files.createTempDirectory("graft-ann-ix").toString
    AnnIndex.write(dir, emb, nCells = 4, iters = 1, dim = 64)
    import spark.implicits._
    Seq((99, 4, 1, 64)).toDF("version", "n_cells", "iters", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val e = intercept[IllegalArgumentException](AnnIndex.load(spark, dir))
    assert(e.getMessage.contains("format version"))
  }

  test("sketch index: served search == inline knnSketchRerank; sketches are ~sketchDim/dim of the vector bytes") {
    val dir = Files.createTempDirectory("graft-sk-ix").toString
    AnnIndex.writeSketch(dir, emb, sketchDim = 16, dim = 64)
    assert(AnnIndex.loadSketchMeta(spark, dir) ==
      AnnIndex.SketchMeta(16, 64, 20260814L, hasQ8 = true))

    val q = emb.filter(col("vec_id") < 5)
    val got = AnnIndex.searchSketch(spark, dir, q, k = 5, m = 40)
    val inline = Similarity.knnSketchRerank(q, emb, k = 5, m = 40,
      sketchDim = 16, dim = 64)
    val expected = rows(inline)
    assert(expected.nonEmpty)
    assert(rows(got) == expected)

    // the byte claim that makes the index an index: pass 1's table is
    // a quarter-size scan (16/64 floats + shared id column/overheads
    // -> assert under a third)
    def bytes(sub: String): Long = {
      val d = new java.io.File(s"$dir/$sub")
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val (sk, vec) = (bytes("sketches"), bytes("vectors"))
    assert(sk > 0 && vec > 0)
    assert(sk.toDouble / vec < 1.0 / 3,
      s"sketches table must be ~sketchDim/dim of vector bytes: $sk vs $vec")
  }

  test("sketch index: appended vectors == full rebuild over the grown corpus") {
    val dir = Files.createTempDirectory("graft-sk-ix").toString
    val base = emb.filter(col("vec_id") % 2 === 0)
    val delta = emb.filter(col("vec_id") % 2 === 1)
    AnnIndex.writeSketch(dir, base, sketchDim = 16, dim = 64)
    AnnIndex.appendSketchVectors(dir, delta)

    val q = emb.filter(col("vec_id") < 5)
    val got = AnnIndex.searchSketch(spark, dir, q, k = 5, m = 40)
    // ground truth: the inline operator over the WHOLE corpus — the
    // append must be indistinguishable from having sketched everything
    val inline = Similarity.knnSketchRerank(q, emb, k = 5, m = 40,
      sketchDim = 16, dim = 64)
    val expected = rows(inline)
    assert(expected.nonEmpty)
    assert(rows(got) == expected)
    // and the delta actually landed: some odd vec_id serves as a hit
    assert(got.filter(col("vec_id") % 2 === 1).count() > 0)
  }

  test("sketch index: a torn append (vectors landed, sketches did not) self-heals on the next append") {
    val dir = Files.createTempDirectory("graft-sk-ix").toString
    val base = emb.filter(col("vec_id") % 3 === 0)
    AnnIndex.writeSketch(dir, base, sketchDim = 16, dim = 64)
    // simulate the torn append: the vectors write committed, the crash
    // hit before the sketches write — orphaned rows pass 1 can't see
    val orphan = emb.filter(col("vec_id") % 3 === 1)
    orphan.toDF("vec_id", "c_vec")
      .write.mode("append").parquet(s"$dir/vectors")
    // the tear is real: no orphaned id ever surfaces for any query
    // (pass 1 scans only the sketch table)
    val q = emb.filter(col("vec_id") < 5)
    val before = AnnIndex.searchSketch(spark, dir, q, k = 5, m = 40)
    assert(before.filter(col("vec_id") % 3 === 1).count() == 0,
      "planted tear must be invisible pre-repair, else the test is vacuous")
    // next append repairs the orphans before adding its own delta
    val delta = emb.filter(col("vec_id") % 3 === 2)
    AnnIndex.appendSketchVectors(dir, delta)
    // the healed index is indistinguishable from a full rebuild...
    val healed = AnnIndex.searchSketch(spark, dir, q, k = 5, m = 40)
    val inline = Similarity.knnSketchRerank(q, emb, k = 5, m = 40,
      sketchDim = 16, dim = 64)
    assert(rows(healed) == rows(inline))
    // ...and formerly-orphaned rows actually serve as hits
    assert(healed.filter(col("vec_id") % 3 === 1).count() > 0,
      "healed orphans must be servable")
  }

  test("int8 sketch knob: served q8 == inline quantize=true; scores stay exact cosines; bytes ~1/4 of float sketches") {
    val dir = Files.createTempDirectory("graft-sk-q8").toString
    AnnIndex.writeSketch(dir, emb, sketchDim = 16, dim = 64)
    val q = emb.filter(col("vec_id") < 5)
    // dequantized-scoring parity: the stored int8 sibling serves the
    // same rows as quantizing inline at query time
    val served = AnnIndex.searchSketch(spark, dir, q, k = 5, m = 40,
      quantized = true)
    val inline = Similarity.knnSketchRerank(q, emb, k = 5, m = 40,
      sketchDim = 16, dim = 64, quantize = true)
    val got = rows(served)
    assert(got.nonEmpty && got == rows(inline))
    // quantization perturbs only pass-1 candidate SELECTION — every
    // returned score must equal the exact 6-dp cosine of its pair
    // (pass 2 always re-ranks the full floats)
    import spark.implicits._
    val exact = served.toDF("query_id", "rk", "vec_id", "cos")
      .join(emb.toDF("vec_id", "c_vec"), "vec_id")
      .join(emb.toDF("query_id", "q_vec"), "query_id")
      .withColumn("cos_exact",
        round(graft.functions.VecFns.cosine(col("q_vec"), col("c_vec")), 6))
      .filter(col("cos") =!= col("cos_exact")).count()
    assert(exact == 0, "q8 output scores must be exact full-float cosines")
    // byte claim: int8 sibling ~1/4 of the float sketch table
    def bytes(sub: String): Long = {
      val d = new java.io.File(s"$dir/$sub")
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    assert(bytes("sketches_q8").toDouble / bytes("sketches") < 0.5,
      s"q8 table must be well under half the float sketches: " +
        s"${bytes("sketches_q8")} vs ${bytes("sketches")}")
  }

  test("int8 sketch knob: appends keep the q8 sibling in lockstep; v1 indexes refuse quantized search") {
    val dir = Files.createTempDirectory("graft-sk-q8").toString
    val base = emb.filter(col("vec_id") % 2 === 0)
    val delta = emb.filter(col("vec_id") % 2 === 1)
    AnnIndex.writeSketch(dir, base, sketchDim = 16, dim = 64)
    AnnIndex.appendSketchVectors(dir, delta)
    val q = emb.filter(col("vec_id") < 5)
    val got = AnnIndex.searchSketch(spark, dir, q, k = 5, m = 40,
      quantized = true)
    val inline = Similarity.knnSketchRerank(q, emb, k = 5, m = 40,
      sketchDim = 16, dim = 64, quantize = true)
    assert(rows(got) == rows(inline))
    assert(got.filter(col("vec_id") % 2 === 1).count() > 0,
      "appended rows must serve through the q8 sibling")
    // a v1 index (no q8 sibling) must refuse loudly, not silently scan
    import spark.implicits._
    Seq((1, 16, 64, 20260814L)).toDF("version", "sketch_dim", "dim", "seed")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/sketch_meta")
    val e = intercept[IllegalArgumentException](
      AnnIndex.searchSketch(spark, dir, q, k = 5, m = 40, quantized = true))
    assert(e.getMessage.contains("int8"))
    // float search over the v1 meta still serves
    assert(rows(AnnIndex.searchSketch(spark, dir, q, k = 5, m = 40)).nonEmpty)
  }

  test("sketch index: foreign format version fails loudly") {
    val dir = Files.createTempDirectory("graft-sk-ix").toString
    AnnIndex.writeSketch(dir, emb, sketchDim = 8, dim = 64)
    import spark.implicits._
    Seq((99, 8, 64, 20260814L)).toDF("version", "sketch_dim", "dim", "seed")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/sketch_meta")
    val e = intercept[IllegalArgumentException](
      AnnIndex.loadSketchMeta(spark, dir))
    assert(e.getMessage.contains("format version"))
  }

  test("a persisted v1 index still loads: seeding defaults to the exact v1 semantics") {
    val dir = Files.createTempDirectory("graft-ann-ix").toString
    // v1 trained with lowid/every=1 — the only semantics v1 had
    AnnIndex.write(dir, emb, nCells = 4, iters = 1, dim = 64,
      seedMode = "lowid", seedEvery = 1)
    import spark.implicits._
    // a v1 meta: no seed_mode / seed_every columns at all
    Seq((1, 4, 1, 64)).toDF("version", "n_cells", "iters", "dim")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    val ix = AnnIndex.load(spark, dir)
    assert(ix.meta == AnnIndex.Meta(4, 1, 64, "lowid", 1),
      "v1 load must default seed_mode=lowid, seed_every=1")
    assert(ix.centroids.length == 4)
    // and the loaded index still serves
    val q = emb.limit(3).toDF("q_id", "q_vec")
    assert(AnnIndex.search(ix, q, k = 5, nprobe = 2).count() > 0)
  }
}
