package graft.delta

import org.apache.spark.sql.{Column, GraftColumnBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, MergeIntoTable, UpdateTable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.LongType

/**
 * SQL UPDATE / MERGE over graft catalog tables — the row-level DML the
 * reference's catalog rejects outright (src/storage/delta_catalog.cpp:
 * 102-117). DELETE/TRUNCATE already route through `SupportsDelete`;
 * UPDATE and MERGE arrive as analyzer plans (`UpdateTable`,
 * `MergeIntoTable`) that Spark only plans for `SupportsRowLevelOperations`
 * tables, so [[GraftCatalogResolution]] rewrites them into these command
 * nodes, which drive the existing DV-based [[DeltaUpdate]]/[[DeltaMerge]]
 * machinery (executor-built deletion bitmaps + re-append in one commit —
 * nothing driver-side scales with row count).
 *
 * Expressions are re-anchored BY NAME (resolved attribute refs →
 * unresolved columns) because the command re-reads the table through its
 * own scan; subqueries in conditions are refused loudly.
 */
object SqlDml {

  /** Re-anchor `e` for resolution against a fresh scan of the same table. */
  private def byName(e: Expression): Column = {
    e.foreach {
      case s: SubqueryExpression =>
        throw new UnsupportedOperationException(
          s"subqueries are not supported in graft UPDATE/MERGE conditions: $s")
      case _ => ()
    }
    GraftColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  }

  private def assignmentName(key: Expression): String = assignmentPath(key) match {
    case Seq(one) => one
    case other => throw new UnsupportedOperationException(
      s"only top-level columns can be SET here: ${other.mkString(".")}")
  }

  /** SET target as a field path: `c` or `info.c` (nested struct field). */
  private def assignmentPath(key: Expression): Seq[String] = key match {
    case a: AttributeReference => Seq(a.name)
    case u: UnresolvedAttribute => u.nameParts
    case org.apache.spark.sql.catalyst.expressions.GetStructField(child, _, Some(name)) =>
      assignmentPath(child) :+ name
    case other => throw new UnsupportedOperationException(
      s"unsupported SET target in graft UPDATE/MERGE: $other")
  }

  /** The graft table path when `plan` IS the bare table (alias wrappers
    * only) — NOT when it merely contains one. A view target wraps the
    * relation in its Project/Filter; rewriting through that would run the
    * DML against the base table with the view's predicate silently
    * dropped. Those targets fall through to Spark's own row-level
    * planning, which refuses them. */
  private[delta] def graftPath(plan: LogicalPlan): Option[String] = plan match {
    case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
      graftPath(s.child)
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      Some(r.table.asInstanceOf[GraftTable].path)
    case _ => None
  }

  /** `UpdateTable` → command, when the target is a graft table. */
  def rewriteUpdate(u: UpdateTable): Option[LogicalPlan] =
    graftPath(u.table).map { path =>
      UpdateGraftTableCommand(path,
        u.assignments.map(a => assignmentPath(a.key) -> byName(a.value)),
        u.condition.map(byName))
    }

  /**
   * `MergeIntoTable` → command for the canonical upsert shape:
   * equality join condition, `WHEN MATCHED THEN UPDATE` (SET * or explicit
   * assignments), optional `WHEN NOT MATCHED THEN INSERT` (* or aligned).
   * Anything beyond (not-matched-by-source clauses, additional conditions)
   * is refused loudly rather than half-executed.
   */
  def rewriteMerge(m: MergeIntoTable): Option[LogicalPlan] = {
    graftPath(m.targetTable).map { path =>
      import org.apache.spark.sql.catalyst.plans.logical._
      if (m.notMatchedBySourceActions.nonEmpty)
        throw new UnsupportedOperationException(
          "graft MERGE does not support WHEN NOT MATCHED BY SOURCE")
      // equality key pairs out of the merge condition (expr + its name)
      def keyPairs(e: Expression): Seq[((Expression, String), (Expression, String))] =
        e match {
          case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
            keyPairs(l) ++ keyPairs(r)
          case org.apache.spark.sql.catalyst.expressions.EqualTo(l, r) =>
            Seq(((l, attrName(l)), (r, attrName(r))))
          case other => throw new UnsupportedOperationException(
            s"graft MERGE condition must be a conjunction of equalities: $other")
        }
      def attrName(e: Expression): String = e match {
        case a: AttributeReference => a.name
        case u: UnresolvedAttribute => u.nameParts.last
        // analyzer-inserted widening cast around a key column
        case c: org.apache.spark.sql.catalyst.expressions.Cast => attrName(c.child)
        case other => throw new UnsupportedOperationException(
          s"graft MERGE condition must compare columns: $other")
      }
      // Orient each equality as (target, source). When the condition is
      // resolved, exprId set membership attributes each side EXACTLY; only
      // unresolved conditions fall back to name membership. The upsert
      // engine joins target and source BY THE SAME NAME, so `t.a = s.b`
      // with a ≠ b cannot be expressed — refuse it loudly rather than
      // silently joining on the wrong column.
      val targetAttrs = m.targetTable.outputSet
      val sourceAttrs = m.sourceTable.outputSet
      val targetCols = m.targetTable.output.map(_.name)
      def side(e: Expression): Option[Boolean] = e match { // Some(true)=target
        case a: AttributeReference if targetAttrs.contains(a) => Some(true)
        case a: AttributeReference if sourceAttrs.contains(a) => Some(false)
        case c: org.apache.spark.sql.catalyst.expressions.Cast => side(c.child)
        case _ => None
      }
      val pairs = keyPairs(m.mergeCondition).map { case ((lx, lName), (rx, rName)) =>
        val oriented = (side(lx), side(rx)) match {
          case (Some(true), Some(false)) => (lName, rName)
          case (Some(false), Some(true)) => (rName, lName)
          case (Some(a), Some(b)) if a == b =>
            throw new UnsupportedOperationException(
              s"graft MERGE condition must compare a target column with a " +
                s"source column, got same-side pair: $lx = $rx")
          case _ => // unresolved: name-membership fallback
            if (targetCols.exists(_.equalsIgnoreCase(lName))) (lName, rName)
            else (rName, lName)
        }
        if (!oriented._1.equalsIgnoreCase(oriented._2))
          throw new UnsupportedOperationException(
            s"graft MERGE join keys must share a name (t.X = s.X); got " +
              s"${oriented._1} = ${oriented._2}")
        oriented._1
      }
      val doInsert = m.notMatchedActions match {
        case Nil => false
        case Seq(InsertStarAction(None)) => true
        case Seq(InsertAction(None, assignments))
            if assignments.forall(a =>
              assignmentName(a.key).equalsIgnoreCase(attrName(a.value))) => true
        case other => throw new UnsupportedOperationException(
          s"graft MERGE supports only WHEN NOT MATCHED THEN INSERT (*-aligned): $other")
      }
      m.matchedActions match {
        case Seq(DeleteAction(None)) =>
          if (doInsert) throw new UnsupportedOperationException(
            "graft MERGE: WHEN MATCHED THEN DELETE cannot combine with INSERT")
          MergeDeleteGraftTableCommand(path, m.sourceTable, pairs)
        case Seq(UpdateStarAction(None)) =>
          MergeGraftTableCommand(path, m.sourceTable, pairs, doInsert)
        case Seq(UpdateAction(None, assignments, _))
            if assignments.forall(a =>
              assignmentName(a.key).equalsIgnoreCase(attrName(a.value))) =>
          MergeGraftTableCommand(path, m.sourceTable, pairs, doInsert)
        case other => throw new UnsupportedOperationException(
          s"graft MERGE supports only WHEN MATCHED THEN UPDATE SET * or DELETE: $other")
      }
    }
  }
}

/** UPDATE <graft table> SET ... [WHERE ...] — returns rows_updated.
  * Nested SET targets (`info.c = expr`) fold into a `withField` rebuild of
  * their top-level column, so [[DeltaUpdate]] stays a whole-column
  * assignment engine. */
case class UpdateGraftTableCommand(
    path: String,
    assignments: Seq[(Seq[String], Column)],
    condition: Option[Column]) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("rows_updated", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val log = DeltaLog.forPath(spark, path)
    val byTop = assignments.groupBy(_._1.head.toLowerCase)
    val asg = byTop.map { case (_, as) =>
      val top = as.head._1.head
      val merged = as.foldLeft(col(s"`$top`")) {
        case (_, (Seq(_), v)) => v // whole-column SET (last one wins)
        case (acc, (path, v)) => acc.withField(path.tail.mkString("."), v)
      }
      top -> merged
    }
    val n = DeltaUpdate.update(spark, log,
      condition.getOrElse(lit(true)), asg)
    Seq(Row(n))
  }
}

/** MERGE ... WHEN MATCHED THEN DELETE — returns rows_deleted. */
case class MergeDeleteGraftTableCommand(
    path: String,
    source: LogicalPlan,
    keyCols: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] =
    Seq(AttributeReference("rows_deleted", LongType, nullable = false)())
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val log = DeltaLog.forPath(spark, path)
    val n = DeltaMerge.mergeDelete(spark, log,
      GraftColumnBridge.ofRows(spark, source), keyCols)
    Seq(Row(n))
  }
}

/** MERGE (upsert shape) into a graft table — returns (updated, inserted). */
case class MergeGraftTableCommand(
    path: String,
    source: LogicalPlan,
    keyCols: Seq[String],
    insertNotMatched: Boolean) extends LeafRunnableCommand {
  override val output: Seq[AttributeReference] = Seq(
    AttributeReference("rows_updated", LongType, nullable = false)(),
    AttributeReference("rows_inserted", LongType, nullable = false)())
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val log = DeltaLog.forPath(spark, path)
    val sourceDf = GraftColumnBridge.ofRows(spark, source)
    val (up, ins) = DeltaMerge.upsert(spark, log, sourceDf, keyCols,
      insertNotMatched = insertNotMatched)
    Seq(Row(up, ins))
  }
}
