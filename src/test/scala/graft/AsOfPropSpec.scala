package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.AsOf

/** Property-based as-of equivalence: for arbitrary keyed, tied,
  * lopsided datasets, all three implementations agree with an
  * in-memory reference fold —
  *  - [[AsOf.backward]] (cogroup two-pointer merge),
  *  - [[AsOf.backwardPlanned]] (custom AsOfJoinExec SparkPlan),
  *  - a literal per-left-row scan in plain Scala.
  * Edge cases the generator covers: duplicate times on both sides,
  * duplicate right (time, tiebreak) candidates, keys present on only
  * one side, empty-ish sides (n as low as 0 on the right).
  */
case class AsOfL(id: Long, k: Long, t: Long)
case class AsOfR(k: Long, t: Long, tie: Long, v: Long)

class AsOfPropSpec extends SparkSpec {

  private val dataGen: Gen[(List[(Long, Long)], List[(Long, Long)])] = for {
    nl <- Gen.choose(1, 60)
    nr <- Gen.choose(0, 60)
    ls <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 40L)))
    rs <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 40L)))
  } yield (ls, rs)

  test("cogroup merge, custom SparkPlan, and literal scan all agree") {
    import spark.implicits._
    (1 to 12).foreach { trial =>
      val (ls, rs) = dataGen(Gen.Parameters.default, Seed(100L + trial))
        .getOrElse(fail(s"gen failed for trial $trial"))
      val lRows = ls.zipWithIndex.map { case ((k, t), i) => AsOfL(i.toLong, k, t) }
      // tiebreak = unique row id: like every top-1 contract in this
      // engine, as-of requires a unique (time, tiebreak) per key — with
      // duplicates the winner is undefined in ANY implementation
      val rRows = rs.zipWithIndex.map { case ((k, t), i) =>
        AsOfR(k, t, i.toLong, i.toLong)
      }
      // literal semantics: greatest (t, tie) among right rows with same
      // key and t <= lt; None when no candidate
      val expected: Map[Long, Option[Long]] = lRows.map { l =>
        val cands = rRows.filter(r => r.k == l.k && r.t <= l.t)
        l.id -> (if (cands.isEmpty) None
                 else Some(cands.maxBy(r => (r.t, r.tie)).v))
      }.toMap

      val lDf = lRows.toDF("id", "k", "t")
      val rDf = rRows.toDF("k", "rt", "tie", "v")
      val viaCogroup = AsOf.backward(lDf, rDf, "k", "t", "rt", "tie")
        .select($"id", $"v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val viaPlanned = AsOf.backwardPlanned(
          lDf, rDf.withColumnRenamed("k", "rk"), "k", "rk", "t", "rt", "tie")
        .select($"id", $"v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      assert(viaCogroup == expected, s"cogroup diverged, trial $trial")
      assert(viaPlanned == expected, s"planned diverged, trial $trial")
    }
  }
}
