package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Compactor

/** Property-based bundling invariants (SURVEY §5 test plan): for
  * arbitrary (mtime, size) streams and targets,
  *  1. bundle ids are non-decreasing along the total order;
  *  2. every bundle's bytes stay under target + its largest record
  *     (the reference's overshoot-by-one bound);
  *  3. no records are lost or duplicated.
  * Raw ScalaCheck Gens sampled with fixed seeds (the scalatest bridge
  * artifact isn't in the offline cache); fully deterministic.
  */
class CompactorPropSpec extends SparkSpec {

  private val lakeGen: Gen[(List[Long], Long)] = for {
    n <- Gen.choose(1, 120)
    sizes <- Gen.listOfN(n, Gen.choose(0L, 400L))
    target <- Gen.choose(64L, 2048L)
  } yield (sizes, target)

  test("bundle assignment invariants hold for arbitrary lakes") {
    import spark.implicits._
    (1 to 15).foreach { trial =>
      val (sizes, target) = lakeGen(Gen.Parameters.default, Seed(trial.toLong))
        .getOrElse(fail(s"gen failed for trial $trial"))
      val rows = sizes.zipWithIndex.map { case (sz, i) =>
        (i.toLong, 1700000000L + (i % 37) * 10L, sz) // duplicate mtimes too
      }
      val df = rows.toDF("id", "mtime", "sz")
      val out = Compactor.withBundleId(df, $"mtime", Seq($"id"), $"sz", target, 5)
        .select($"id", $"mtime", col(Compactor.BundleCol).as("b"), $"record_bytes")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._2, t._1))
      // 3: nothing lost or duplicated
      assert(out.map(_._1).toSeq.sorted == rows.map(_._1).sorted, s"trial $trial")
      // 1: non-decreasing along (mtime, id)
      assert(out.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"trial $trial: bundle ids regress")
      // 2: per-bundle byte bound
      out.groupBy(_._3).values.foreach { g =>
        val bytes = g.map(_._4)
        assert(bytes.sum <= target + bytes.max,
          s"trial $trial: bundle over bound ${bytes.sum} vs $target+${bytes.max}")
      }
    }
  }
}
