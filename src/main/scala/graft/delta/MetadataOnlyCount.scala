package graft.delta

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/**
 * Metadata-only `count(*)` (delta-spark's OptimizeMetadataOnlyDeltaQuery
 * analog): an unfiltered `SELECT count(*) FROM <delta table>` is answered
 * from the log — Σ per-file numRecords minus Σ deletion-vector
 * cardinalities, both protocol-authoritative — instead of scanning data.
 * On a 100 TB table that is the difference between one log replay and a
 * full-corpus read.
 *
 * Deliberately narrow: global aggregation only, every aggregate a plain
 * unfiltered `count(1)`, child a bare (possibly column-pruned-to-nothing)
 * scan of a [[GraftFileIndex]]-backed relation with NO filters. Any file
 * missing numRecords stats (foreign writers may omit them) bails to the
 * real scan — a wrong fast count is worse than a slow right one.
 */
class MetadataOnlyCount(spark: SparkSession) extends Rule[LogicalPlan] {

  private def exactCount(plan: LogicalPlan): Option[Long] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case g: GraftFileIndex => g.snapshotExactRowCount
        case _ => None
      }
      case _ => None
    }
    // column pruning collapses count(*)'s required columns to none
    case p: Project if p.projectList.isEmpty => exactCount(p.child)
    // the DV row filter is METADATA (its cardinality is already subtracted
    // in exactRowCount) — a filter that is exactly `NOT DvRowDeleted(...)`
    // does not disqualify the rewrite; any other filter does
    case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
      f.condition match {
        case org.apache.spark.sql.catalyst.expressions.Not(_: DvRowDeleted) =>
          exactCount(f.child)
        case _ => None
      }
    case _ => None
  }

  private def isPlainCountStar(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(
        Count(Seq(Literal(1, _))), Complete, false, None, _), _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case a @ Aggregate(groups, aggs, child, _)
        if groups.isEmpty && aggs.nonEmpty && aggs.forall(isPlainCountStar) =>
      exactCount(child) match {
        case Some(n) =>
          LocalRelation(a.output.map(_.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute]),
            Seq(InternalRow(aggs.map(_ => n): _*)))
        case None => a
      }
  }
}
