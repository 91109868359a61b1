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

  /** Null contract (ADVICE r2): null keys or times never match — and
    * never BLOCK. A null right time sorts first in the planned exec's
    * Ascending nulls-first ordering; before the fix it froze the merge
    * pointer and poisoned every valid right row behind it for that key.
    * The cogroup form previously threw on any null at all.
    */
  test("null keys/times never match and never block (both forms)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val lSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("k", LongType, nullable = true),
      StructField("t", LongType, nullable = true)))
    val rSchema = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("rt", LongType, nullable = true),
      StructField("tie", LongType, nullable = true),
      StructField("v", LongType, nullable = false)))
    val cellGen: Gen[Option[Long]] = Gen.frequency(
      4 -> Gen.choose(0L, 5L).map(Some(_)), 1 -> Gen.const(None))
    val timeGen: Gen[Option[Long]] = Gen.frequency(
      4 -> Gen.choose(0L, 40L).map(Some(_)), 1 -> Gen.const(None))
    val trialGen = for {
      nl <- Gen.choose(1, 50)
      nr <- Gen.choose(0, 50)
      ls <- Gen.listOfN(nl, Gen.zip(cellGen, timeGen))
      rs <- Gen.listOfN(nr, Gen.zip(cellGen, timeGen))
    } yield (ls, rs)

    (1 to 8).foreach { trial =>
      val (ls, rs) = trialGen(Gen.Parameters.default, Seed(900L + trial))
        .getOrElse(fail(s"gen failed for trial $trial"))
      val lRows = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      // tie: mostly unique, some null; at most one null-tie per (k, rt)
      // so the winner stays well-defined
      val seenNullTie = scala.collection.mutable.Set.empty[(Option[Long], Option[Long])]
      val rRows = rs.zipWithIndex.map { case ((k, t), i) =>
        val tie: Option[Long] = if (i % 5 == 0) None else Some(1000L + i)
        (k, t, tie, i.toLong)
      }.filter { case (k, t, tie, _) => tie.isDefined || seenNullTie.add((k, t)) }

      val expected: Map[Long, Option[Long]] = lRows.map { case (id, kOpt, tOpt) =>
        id -> (for {
          lk <- kOpt; lt <- tOpt
          best <- rRows.filter { case (rk, rt, _, _) =>
              rk.contains(lk) && rt.exists(_ <= lt) }
            .sortBy { case (_, rt, tie, _) =>
              (rt.get, tie.getOrElse(Long.MinValue)) }
            .lastOption
        } yield best._4)
      }.toMap

      val lDf = spark.createDataFrame(
        spark.sparkContext.parallelize(
          lRows.map { case (id, k, t) => Row(id, k.orNull, t.orNull) }, 4),
        lSchema)
      val rDf = spark.createDataFrame(
        spark.sparkContext.parallelize(
          rRows.map { case (k, t, tie, v) => Row(k.orNull, t.orNull, tie.orNull, v) }, 4),
        rSchema)
      def toMapOf(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
        df.select("id", "v").collect()
          .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
      val viaCogroup = toMapOf(AsOf.backward(lDf, rDf, "k", "t", "rt", "tie"))
      val viaPlanned = toMapOf(AsOf.backwardPlanned(
        lDf, rDf.withColumnRenamed("k", "rk"), "k", "rk", "t", "rt", "tie"))
      assert(viaCogroup == expected, s"cogroup diverged on nulls, trial $trial")
      assert(viaPlanned == expected, s"planned diverged on nulls, trial $trial")
    }
  }
}
