package graft.delta

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Max, Min}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

/**
 * Dynamic (runtime) stats-based file re-pruning — the Spark analog of the
 * reference's join-derived dynamic filters that re-prune the delta file
 * list mid-query (delta_multi_file_list.cpp:989-1021,
 * test/sql/generated/file_skipping_dynamic.test:14-33). Spark's built-in
 * DPP covers only PARTITION columns; this covers DATA columns via the
 * per-file min/max stats.
 *
 * Mechanism: for an equi-join where one side scans a Graft delta table and
 * the other side is small (≤ autoBroadcastJoinThreshold) and filtered, the
 * rule re-wires the fact side's [[GraftFileIndex]] with a THUNK that — at
 * execution time, when `listFiles` first runs — computes min/max of the dim
 * join key with one bounded aggregate job and re-prunes the file list
 * against the per-file stats. The rule itself runs no jobs (it only rewires
 * the plan); registered once via `injectPreCBORule` so it sees the
 * optimized join tree exactly once.
 *
 * Soundness: a pruned file's [min,max] for the key is disjoint from the
 * dim keys' [min,max] envelope, so none of its rows can find a join
 * partner. Per join type, only sides whose unmatched rows are dropped are
 * pruned (inner: both; left-semi/right-outer: left; left-outer/left-anti:
 * right). A failed or empty bounds job degrades to no pruning.
 *
 * Scale: at 100 TB this is the difference between scanning every fact file
 * and scanning the handful whose key ranges intersect a filtered dim — the
 * one-extra-small-job trade the reference makes too. Gated by
 * `spark.graft.dynamicFilePruning` (default true).
 */
class DynamicFilePruning(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.dynamicFilePruning", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, jt, Some(cond), _) =>
        val (pruneLeft, pruneRight) = jt match {
          case _: InnerLike => (true, true)
          case LeftSemi => (true, true)
          case RightOuter => (true, false)
          case LeftOuter | LeftAnti => (false, true)
          case _ => (false, false)
        }
        if (!pruneLeft && !pruneRight) j
        else {
          var newLeft = left
          var newRight = right
          splitConjuncts(cond).foreach {
            case EqualTo(x: AttributeReference, y: AttributeReference) =>
              val (la, ra) =
                if (left.outputSet.contains(x) && right.outputSet.contains(y)) (Some(x), Some(y))
                else if (left.outputSet.contains(y) && right.outputSet.contains(x)) (Some(y), Some(x))
                else (None, None)
              for (l <- la; r <- ra) {
                if (pruneLeft) newLeft = maybePrune(newLeft, l, right, r)
                if (pruneRight) newRight = maybePrune(newRight, r, left, l)
              }
            case _ => ()
          }
          if ((newLeft eq left) && (newRight eq right)) j
          else j.copy(left = newLeft, right = newRight)
        }
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def supportedType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | DateType | TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Dim side worth a bounds job: CHEAP to recompute (strictly
    * Project/Filter over a leaf — an Aggregate/Join/Window subtree may
    * have small OUTPUT stats but arbitrary compute cost, and the bounds
    * job would re-run it), DETERMINISTIC to recompute (boundsFor re-executes
    * the dim plan at scan time; a rand()-based filter could yield a narrower
    * envelope there than in the join itself → unsound pruning), selective
    * (a Filter present), small, and a boundable key type. */
  private def dimQualifies(dim: LogicalPlan, key: AttributeReference): Boolean = {
    def cheapShape(p: LogicalPlan): Boolean = p.expressions.forall(_.deterministic) && (p match {
      case _: LogicalRelation => true
      case _: LocalRelation | _: Range | _: OneRowRelation => true
      case f: Filter => cheapShape(f.child)
      case pr: Project if pr.projectList.forall(_.collectFirst {
        case _: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression => ()
      }.isEmpty) => cheapShape(pr.child)
      case s: SubqueryAlias => cheapShape(s.child)
      case _ => false
    })
    supportedType(key.dataType) &&
      dim.exists { case _: Filter => true; case _ => false } &&
      cheapShape(dim) && {
        val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
        threshold > 0 && (try dim.stats.sizeInBytes <= threshold
        catch { case scala.util.control.NonFatal(_) => false })
      }
  }

  /** The bounds job (one small dim scan, ~0.1-1s) only pays for itself
    * when the fact scan it might shrink is genuinely large. */
  private def factQualifies(idx: GraftFileIndex): Boolean = {
    val minBytes = spark.conf
      .get("spark.graft.dynamicFilePruning.minFactBytes", (1L << 30).toString).toLong
    idx.sizeInBytes >= minBytes
  }

  private def maybePrune(fact: LogicalPlan, factAttr: AttributeReference,
      dim: LogicalPlan, dimAttr: AttributeReference): LogicalPlan = {
    if (!dimQualifies(dim, dimAttr)) return fact
    toScan(fact, factAttr) match {
      case Some((lr, hfs, idx, scanAttr)) if factQualifies(idx) =>
        val thunk: () => Seq[Expression] = () => boundsFor(scanAttr, dim, dimAttr)
        fact.transformUp {
          case l: LogicalRelation if l eq lr =>
            l.copy(relation = hfs.copy(location = idx.withDynamicThunk(thunk))(spark))
        }
      case _ => fact
    }
  }

  /** Resolve `attr` down through alias-preserving operators to the Graft
    * scan that produces it. Conservative: unknown operators stop the walk. */
  private def toScan(plan: LogicalPlan, attr: AttributeReference)
      : Option[(LogicalRelation, HadoopFsRelation, GraftFileIndex, AttributeReference)] =
    plan match {
      case lr: LogicalRelation =>
        lr.relation match {
          case hfs: HadoopFsRelation => hfs.location match {
            case idx: GraftFileIndex =>
              lr.output.find(_.exprId == attr.exprId)
                .map(a => (lr, hfs, idx, a.asInstanceOf[AttributeReference]))
            case _ => None
          }
          case _ => None
        }
      case p: Project =>
        p.projectList.find(_.exprId == attr.exprId).flatMap {
          case a: AttributeReference => toScan(p.child, a)
          case al: Alias => al.child match {
            case c: AttributeReference => toScan(p.child, c)
            case _ => None
          }
          case _ => None
        }
      case a: Aggregate =>
        a.aggregateExpressions.find(_.exprId == attr.exprId).flatMap {
          case ar: AttributeReference if a.groupingExpressions.exists(_.semanticEquals(ar)) =>
            toScan(a.child, ar)
          case al: Alias => al.child match {
            case c: AttributeReference if a.groupingExpressions.exists(_.semanticEquals(c)) =>
              toScan(a.child, c)
            case _ => None
          }
          case _ => None
        }
      case f: Filter => toScan(f.child, attr)
      case s: SubqueryAlias => toScan(s.child, attr)
      case j: Join =>
        if (j.left.outputSet.contains(attr)) toScan(j.left, attr)
        else if (j.right.outputSet.contains(attr)) toScan(j.right, attr)
        else None
      case _ => None
    }

  /** Runtime bounds: one min/max aggregate over the dim side (bounded by
    * the size gate), turned into stats-pruning range predicates on the
    * scan attribute. Empty dim → no synthesized bounds (sound, unpruned). */
  private def boundsFor(scanAttr: AttributeReference, dim: LogicalPlan,
      dimAttr: AttributeReference): Seq[Expression] = {
    val agg = Aggregate(Nil, Seq(
      Alias(Min(dimAttr).toAggregateExpression(), "mn")(),
      Alias(Max(dimAttr).toAggregateExpression(), "mx")()), dim)
    val row = GraftColumnBridge.ofRows(spark, agg).collect()(0)
    if (row.isNullAt(0) || row.isNullAt(1)) Nil
    else Seq(
      GreaterThanOrEqual(scanAttr, Literal.create(row.get(0), dimAttr.dataType)),
      LessThanOrEqual(scanAttr, Literal.create(row.get(1), dimAttr.dataType)))
  }
}
