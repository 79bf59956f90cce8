package graft.delta

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.streaming.OutputMode

/**
 * Structured-Streaming SINK into a Delta table — the `writeStream
 * .format("graftdelta").start(path)` analog of delta-spark's DeltaSink
 * (beyond the reference, which has no streaming; the idempotent-commit
 * machinery it rebuilds is the reference's
 * src/functions/delta_transaction_utils/idempotency_helpers.cpp:41-145).
 *
 * Exactly-once: every Append-mode micro-batch commits with
 * `txnAppId = <streaming queryId>` and `txnVersion = batchId`. On
 * failure/restart the engine replays the last batch from the checkpoint;
 * the replayed commit sees `setTransactions(queryId) >= batchId` and
 * no-ops — end-to-end exactly-once with zero sink-side bookkeeping
 * beyond the table's own log. The queryId is stable across restarts (it
 * lives in the checkpoint), so the guarantee survives process death.
 *
 * Complete mode rewrites the full result every trigger via
 * [[DeltaWriter.overwrite]] — replays converge to the same table state,
 * idempotent by construction. Update mode is refused loudly: emitting
 * changed-only rows as appends would silently duplicate keys.
 *
 * Scale: addBatch re-wraps the micro-batch's ALREADY-planned RDD
 * ([[GraftColumnBridge.asBatch]]) — no second planning pass — and the
 * write path is the ordinary distributed parquet write + driver-side
 * metadata commit.
 */
final class DeltaStreamSink(
    spark: SparkSession,
    path: String,
    parameters: Map[String, String],
    partitionColumns: Seq[String],
    outputMode: OutputMode) extends Sink {

  private def txnAppId: String =
    parameters.getOrElse("txnAppId",
      Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
        .getOrElse(throw new IllegalStateException(
          "graftdelta sink cannot derive a transaction app id: the " +
            "sql.streaming.queryId local property is unset. A shared " +
            "fallback id would make two queries appending to the same " +
            "table treat each other's batch ids as replays and silently " +
            "skip data — pass .option(\"txnAppId\", <unique id>) instead")))

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = GraftColumnBridge.asBatch(data)
    outputMode match {
      case m if m == OutputMode.Append() =>
        DeltaWriter.append(spark, batch, path,
          partitionBy = partitionColumns,
          txnAppId = Some(txnAppId), txnVersion = Some(batchId),
          operation = "STREAMING UPDATE",
          mergeSchema = parameters.get("mergeSchema").exists(_.toBoolean))
      case m if m == OutputMode.Complete() =>
        DeltaWriter.overwrite(spark, batch, path,
          partitionBy = partitionColumns)
      case other =>
        throw new UnsupportedOperationException(
          s"graftdelta sink does not support OutputMode $other: Update-mode " +
            "rows are upserts, not appends — use foreachBatch + DeltaMerge " +
            "(StreamingOps.streamUpsertIntoDelta) for CDC-apply semantics")
    }
    ()
  }

  override def toString: String = s"DeltaStreamSink[$path]"
}
