package graft.delta

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.BooleanType

/**
 * Execute-time logical node for the `delta_set_transaction_version(path,
 * appId, version[, expectedVersion])` SQL table function (reference
 * idempotency CAS, `idempotency_helpers.cpp:67-151`).
 *
 * Until r10 the table function committed at plan RESOLUTION, so EXPLAIN or
 * a view re-resolving the SQL text re-committed (and the 4-arg CAS form
 * then errored against its own earlier write). This node defers the side
 * effect to [[SetTxnVersionExec.doExecute]]: EXPLAIN plans but never
 * commits; the commit happens when the physical plan materializes its RDD.
 * `QueryExecution.toRdd` is a lazy val, so that is ONE commit per
 * DataFrame (a second `collect()` on the same DataFrame reuses the built
 * RDD without re-committing) and one per re-resolution of the SQL text —
 * each `spark.sql(...)` call is its own commit, matching
 * `CALL graft.set_transaction_version` issued twice (the CAS form then
 * fails loudly on the second, as a CAS should).
 */
case class SetTxnVersionPlan(path: String, appId: String, version: Long,
    expected: Option[Option[Long]],
    // passed through the constructor so transform/copy keeps exprIds stable
    // (a fresh-minted `val output` breaks parent references on makeCopy)
    output: Seq[Attribute] = SetTxnVersionPlan.freshOutput())
  extends org.apache.spark.sql.catalyst.plans.logical.LeafNode {
  // LeafNode's default computeStats() throws; joins/optimizer rules may ask
  // (the pre-r11 LocalRelation result had stats, keep that contract)
  override def computeStats(): org.apache.spark.sql.catalyst.plans.logical.Statistics =
    org.apache.spark.sql.catalyst.plans.logical.Statistics(sizeInBytes = 1, rowCount = Some(1))
}

object SetTxnVersionPlan {
  def freshOutput(): Seq[Attribute] =
    Seq(AttributeReference("success", BooleanType, nullable = false)())
}

case class SetTxnVersionExec(plan: SetTxnVersionPlan) extends LeafExecNode {
  override def output: Seq[Attribute] = plan.output
  override protected def doExecute(): RDD[InternalRow] = {
    // driver-side metadata commit, AT EXECUTION — a one-row log write, the
    // same path the DeltaTable API takes (CAS checked after conflict rebase)
    DeltaTable.forPath(session, plan.path)
      .setTransactionVersion(plan.appId, plan.version, plan.expected)
    val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
    val row = proj(InternalRow(true)).copy().asInstanceOf[InternalRow]
    sparkContext.parallelize(Seq(row), 1)
  }
}

/** Plans [[SetTxnVersionPlan]]; injected via `injectPlannerStrategy`. */
class GraftCommandStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: SetTxnVersionPlan => SetTxnVersionExec(p) :: Nil
    case _ => Nil
  }
}
