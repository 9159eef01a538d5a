package graft.plans

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule that turns a plain interval join — an inner join whose
  * ONLY cross-side condition is `point >= lo AND point <= hi` (any mix of
  * strict/inclusive, either operand order) — into the bucketed equi join
  * `operators.RangeJoin` builds by hand.
  *
  * Without it, Catalyst has no equi key and plans a
  * BroadcastNestedLoopJoin: O(|points| x |intervals|) comparisons, a
  * driver-sized broadcast of one whole side, and no shuffle parallelism —
  * the exact shape that dies first at 100 TB. The rewrite makes the
  * DECLARATIVE form (`a.join(b, p.between(lo, hi))`) safe to write: time
  * is cut into `bucketWidthSec` cells, the interval side explodes into
  * one row per touched cell (`sequence(floor(lo/w), floor(hi/w))` — any
  * interval width is correct, wider intervals just explode into more
  * rows), the point side computes its single cell, and the join becomes
  * hash-partitioned equality on the cell with the ORIGINAL predicates
  * re-checked exactly. O(matches) work on a normal shuffle.
  *
  * Scope guards (anything else is left untouched):
  *   - inner joins only (outer variants need the unmatched sides the
  *     bucket join would have to resurrect);
  *   - point/lo/hi must be bare timestamp attributes, point on one side,
  *     both bounds on the other — precompute derived bounds into a
  *     column first (`withColumn("hi", ...)`);
  *   - a join that already has a cross-side equi conjunct keeps its
  *     native hash/merge plan (also what makes the rewrite fixpoint-safe:
  *     the emitted join carries a bucket-equality conjunct, so the rule
  *     never re-fires on its own output).
  *
  * Wire-up mirrors [[RollupRewrite]]: appended once to
  * `spark.experimental.extraOptimizations` (it runs after the main
  * optimizer batches), enabled per-scope via [[enable]]/[[disable]] so a
  * session-wide rule never rewrites a join behind an operator's back.
  * Child plans are reused as-is — original attribute ids survive, and the
  * final Project restores the original output, so parent operators never
  * see the bucket plumbing.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Bucket width (seconds). None = rule disabled (the common state). */
  private val width = new AtomicReference[Option[Long]](None)

  /** Sets the bucket width — size it to the TYPICAL interval length —
    * and appends this rule to the session's extraOptimizations exactly
    * once. Callers pair this with a `finally disable()`. */
  def enable(spark: SparkSession, bucketWidthSec: Long): Unit = {
    require(bucketWidthSec > 0, "bucket width must be positive")
    width.set(Some(bucketWidthSec))
    if (!spark.experimental.extraOptimizations.contains(this)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    }
  }

  def disable(): Unit = width.set(None)

  override def apply(plan: LogicalPlan): LogicalPlan = width.get() match {
    case None => plan
    case Some(w) => plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), _) =>
        rewrite(j, l, r, cond, w).getOrElse(j)
    }
  }

  private def isTs(a: Attribute): Boolean = a.dataType match {
    case TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** One comparison conjunct read as "p has a lower/upper bound b". A
    * single `a <= b` admits two readings (a bounded above by b, or b
    * bounded below by a); both are emitted and side-membership picks. */
  private case class Bound(p: AttributeReference, b: AttributeReference,
                           lower: Boolean)

  private def readings(e: Expression): Seq[Bound] = e match {
    case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference) =>
      Seq(Bound(a, b, lower = true), Bound(b, a, lower = false))
    case GreaterThan(a: AttributeReference, b: AttributeReference) =>
      Seq(Bound(a, b, lower = true), Bound(b, a, lower = false))
    case LessThanOrEqual(a: AttributeReference, b: AttributeReference) =>
      Seq(Bound(a, b, lower = false), Bound(b, a, lower = true))
    case LessThan(a: AttributeReference, b: AttributeReference) =>
      Seq(Bound(a, b, lower = false), Bound(b, a, lower = true))
    case _ => Seq.empty
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
                      cond: Expression, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def side(a: Attribute): Int =
      if (l.outputSet.contains(a)) 0 else if (r.outputSet.contains(a)) 1 else -1

    val hasCrossEqui = conjuncts.exists {
      case EqualTo(a: Attribute, b: Attribute) =>
        side(a) >= 0 && side(b) >= 0 && side(a) != side(b)
      case EqualNullSafe(a: Attribute, b: Attribute) =>
        side(a) >= 0 && side(b) >= 0 && side(a) != side(b)
      case _ => false
    }
    if (hasCrossEqui) return None

    // cross-side timestamp bounds, both readings of each comparison
    val bounds = conjuncts.flatMap(readings).filter { bd =>
      isTs(bd.p) && isTs(bd.b) &&
        side(bd.p) >= 0 && side(bd.b) >= 0 && side(bd.p) != side(bd.b)
    }
    // the point is an attribute bounded from BOTH directions
    val pick = bounds.groupBy(_.p).collectFirst {
      case (_, bs) if bs.exists(_.lower) && bs.exists(!_.lower) =>
        (bs.find(_.lower).get, bs.find(!_.lower).get)
    }
    pick.map { case (loB, hiB) =>
      val p = loB.p
      val (pointSide, intervalSide) = if (side(p) == 0) (l, r) else (r, l)

      val tz = Some(SQLConf.get.sessionLocalTimeZone)
      // epoch seconds via TIMESTAMP (NTZ can't cast straight to double;
      // the session zone is pinned UTC in this engine's entry points)
      def bucket(e: Expression): Expression =
        Floor(Divide(Cast(Cast(e, TimestampType, tz), DoubleType, tz),
          Literal(w.toDouble)))

      val gen = Explode(Sequence(bucket(loB.b), bucket(hiB.b), None, tz))
      val cellAttr = DataTypeUtils.toAttributes(gen.elementSchema).head
      val exploded = Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(cellAttr), child = intervalSide)

      val pCell = Alias(bucket(p), "__graft_cell")()
      val pointProj = Project(pointSide.output :+ pCell, pointSide)

      val newCond = And(EqualTo(cellAttr, pCell.toAttribute), cond)
      // the planner's size estimate for Generate ignores the explosion
      // factor, so it will happily broadcast the exploded side — a
      // driver OOM at scale (and a multi-second hash build locally).
      // Forbid hash-broadcasting THAT side; the point side stays
      // hintless so a genuinely small point set still broadcasts.
      val noBcast = Some(HintInfo(strategy = Some(NO_BROADCAST_HASH)))
      val (nl, nr, hint) =
        if (side(p) == 0) (pointProj, exploded, JoinHint(None, noBcast))
        else (exploded, pointProj, JoinHint(noBcast, None))
      Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
    }
  }
}
