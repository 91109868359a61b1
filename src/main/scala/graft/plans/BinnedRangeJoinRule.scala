package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule: rewrite an inner join whose ONLY predicate is range
  * containment — `p >= lo AND p <= hi` with `p` from one side and
  * `lo`/`hi` from the other — into the binned equi-join of
  * [[graft.operators.RangeJoin]]. Without an equi key Spark plans a
  * broadcast-nested-loop for such joins (quadratic at scale); with the
  * rewrite it plans a shuffle join on the bin, with the original
  * BETWEEN kept as a residual filter.
  *
  * Rewrite (bin width W):
  * {{{
  *   Join(P, I, p >= lo && p <= hi)
  * =>
  *   Project(P.out ++ I.out,
  *     Join(
  *       Project(P.out :+ floor(p/W) AS _pbin, P),
  *       Generate(explode(sequence(floor(lo/W), floor(hi/W))) AS _ibin, I),
  *       _pbin = _ibin && p >= lo && p <= hi))
  * }}}
  *
  * Guards: integral p/lo/hi (floor-div via double, matching the
  * DataFrame operator), no other equi conjunct already present (an
  * equi key means Spark already avoids the nested loop), inner join
  * only. Runs post-analysis: injected via [[GraftExtensions]]
  * (`spark.sql.extensions`) or
  * `spark.experimental.extraOptimizations`.
  */
case class BinnedRangeJoinRule(binWidth: Long = 1024L) extends Rule[LogicalPlan] {
  require(binWidth >= 1)

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def floorBin(e: Expression): Expression =
    Floor(Divide(Cast(e, DoubleType), Cast(Literal(binWidth), DoubleType)))

  /** (point, lo, hi) if cond is exactly the containment conjunction. */
  private def asRange(cond: Expression): Option[(Expression, Expression, Expression)] =
    cond match {
      case And(GreaterThanOrEqual(p1, lo), LessThanOrEqual(p2, hi))
        if p1.semanticEquals(p2) => Some((p1, lo, hi))
      case And(LessThanOrEqual(p1, hi), GreaterThanOrEqual(p2, lo))
        if p1.semanticEquals(p2) => Some((p1, lo, hi))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      asRange(cond) match {
        case Some((p, lo, hi))
          if isIntegral(p) && isIntegral(lo) && isIntegral(hi) &&
             p.references.subsetOf(left.outputSet) &&
             (lo.references ++ hi.references).subsetOf(right.outputSet) &&
             lo.references.nonEmpty =>
          val pbin = Alias(floorBin(p), "_pbin")()
          val newLeft = Project(left.output :+ pbin, left)
          val ibinAttr = AttributeReference("_ibin", LongType, nullable = true)()
          val gen = Generate(
            // Sequence is TimeZoneAwareExpression: it stays UNRESOLVED
            // (even over longs) until timeZoneId is supplied
            Explode(Sequence(floorBin(lo), floorBin(hi), None,
              Some(conf.sessionLocalTimeZone))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(ibinAttr), child = right)
          val newCond = And(EqualTo(pbin.toAttribute, ibinAttr), cond)
          Project(left.output ++ right.output,
            Join(newLeft, gen, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — registers the
  * engine's optimizer rules on session build.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BinnedRangeJoinRule())
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
