package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.delta.DeltaWriter

/**
 * Structured-Streaming surface (beyond the reference, which has no
 * streaming — SURVEY.md §1.3): windowed aggregation with watermarks,
 * stateful sessionization, and an exactly-once streaming sink into our
 * Delta tables built from `foreachBatch` + idempotent txn versions
 * (the streaming analog of the reference's idempotent-write helpers,
 * src/functions/delta_transaction_utils/idempotency_helpers.cpp:41-145).
 */
object StreamingOps {

  /** Tumbling-window event counts with a watermark (late data bounded).
    * `ts` arriving as TIMESTAMP_NTZ (parquet isAdjustedToUTC=false) is
    * cast to TIMESTAMP first — watermarks reject NTZ event time, and the
    * session TZ is pinned UTC so the cast is lossless. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    (if (events.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
       events.withColumn("ts", col("ts").cast("timestamp"))
     else events)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))

  /**
   * Exactly-once streaming ingest into a Delta table: each micro-batch
   * commits with txnAppId=`appId`, txnVersion=batchId, so replayed
   * batches (failure/restart) dedupe to no-ops — end-to-end exactly-once
   * without any sink-side bookkeeping.
   */
  def streamIntoDelta(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      targetTable: String,
      appId: String = "graft-stream",
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        DeltaWriter.append(spark, batch.toDF(), targetTable,
          txnAppId = Some(appId), txnVersion = Some(batchId),
          operation = "STREAMING UPDATE")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /**
   * Streaming maintenance of the incremental-dedup window index
   * ([[graft.pipeline.IncrementalDedup]]): each micro-batch of newly
   * ingested documents is shingled ONCE and its distinct window-hash
   * rows appended to the index Delta table with txnVersion=batchId —
   * replayed batches are no-ops, so an at-least-once stream keeps the
   * index exactly-once. This is the daily-ingest shape at 100 TB: the
   * corpus index stays current commit-by-commit and dedup jobs only
   * ever read the index plus the new batch.
   */
  def streamIndexMaintenance(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      indexTable: String,
      appId: String = "graft-dedup-index-stream",
      window: Int = 8,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.pipeline.IncrementalDedup.appendToIndex(spark, indexTable,
          batch.toDF(), window = window,
          txnAppId = appId, txnVersion = batchId)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /**
   * Exactly-once streaming UPSERT (CDC-apply): each micro-batch MERGEs
   * into the Delta target on `keyCols` — later batches overwrite earlier
   * rows with the same key (the change-data-capture apply pattern), and
   * txnVersion=batchId makes replayed batches no-ops, so the sink state
   * equals "last batch wins per key" exactly once, end to end. Batches
   * carrying duplicate keys are refused by the MERGE precondition —
   * dedupe upstream (`dropDuplicates`) when the feed can repeat keys
   * within one batch.
   */
  def streamUpsertIntoDelta(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      targetTable: String,
      keyCols: Seq[String],
      appId: String = "graft-stream-upsert",
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val df = batch.toDF()
        if (!df.isEmpty) {
          val log = graft.delta.DeltaLog.forPath(spark, targetTable)
          if (!log.tableExists) {
            // the creating batch must honor the SAME dup-key precondition
            // MERGE enforces later — a dup-keyed plain append here would
            // permanently corrupt the target (every later batch touching
            // that key then fails MERGE's target check)
            val dup = df.groupBy(keyCols.map(col): _*).count()
              .where(col("count") > 1).limit(1).collect()
            if (dup.nonEmpty)
              throw new IllegalStateException(
                s"streaming upsert: creating batch $batchId carries " +
                  s"duplicate keys (${keyCols.mkString(",")}); dedupe " +
                  "upstream (dropDuplicates) when the feed can repeat " +
                  "keys within one batch")
            DeltaWriter.append(spark, df, targetTable,
              txnAppId = Some(appId), txnVersion = Some(batchId),
              operation = "STREAMING UPSERT")
          } else {
            graft.delta.DeltaMerge.upsert(spark, log, df, keyCols,
              txnAppId = Some(appId), txnVersion = Some(batchId))
          }
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /**
   * Exactly-once DEDUPLICATING ingest: `dropDuplicates(dedupCols)` holds
   * the seen-key set in the streaming state store, so a record arriving
   * again in a LATER micro-batch (at-least-once upstream delivery,
   * overlapping extracts) is dropped before it reaches the Delta sink;
   * the sink itself commits with txnVersion=batchId for replay-idempotence.
   * At 100 TB scale the state is partitioned by key across executors; a
   * production pipeline would bound it with
   * `dropDuplicatesWithinWatermark` once keys expire.
   */
  def streamDedupIntoDelta(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      targetTable: String,
      dedupCols: Seq[String],
      appId: String = "graft-stream-dedup",
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .dropDuplicates(dedupCols)
      .writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        DeltaWriter.append(spark, batch.toDF(), targetTable,
          txnAppId = Some(appId), txnVersion = Some(batchId),
          operation = "STREAMING DEDUP")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /**
   * BOUNDED-state deduplicating ingest: like [[streamDedupIntoDelta]] but
   * the seen-key state EXPIRES once event time passes `watermark` beyond a
   * key's arrival (`dropDuplicatesWithinWatermark`) — the production shape
   * for an unbounded 100 TB feed, where the plain dropDuplicates state
   * would grow without bound. Duplicates delivered within the watermark
   * window are dropped; a re-delivery later than the watermark is the
   * upstream's contract violation, not state the pipeline can afford to
   * keep. Sink commits stay exactly-once via txnVersion=batchId.
   */
  def streamDedupWithinWatermarkIntoDelta(
      spark: SparkSession,
      sourceDir: String,
      schema: StructType,
      targetTable: String,
      dedupCols: Seq[String],
      watermark: String = "1 hour",
      appId: String = "graft-stream-dedup-wm",
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
    val ts =
      if (src.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
        src.withColumn("ts", col("ts").cast("timestamp"))
      else src
    val deduped = ts.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(dedupCols)
    // restore the caller's ts type before the sink: the TIMESTAMP cast
    // above exists only for watermarking — letting it flow through would
    // silently create the target table with TIMESTAMP where the supplied
    // schema says TIMESTAMP_NTZ (wall-clock shift in non-UTC sessions)
    val restored =
      if (src.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
        deduped.withColumn("ts", col("ts").cast("timestamp_ntz"))
      else deduped
    restored.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        DeltaWriter.append(spark, batch.toDF(), targetTable,
          txnAppId = Some(appId), txnVersion = Some(batchId),
          operation = "STREAMING DEDUP WM")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Native session-window sessionization: per-user sessions that merge
    * events closer than `gap` (new session iff gap-to-previous >= gap —
    * the semantics the `q_session_window` oracle pins down). State is
    * partitioned by (user, window) in the state store across executors;
    * with a watermark the state is PRUNED as event time advances, so
    * long-running streams hold only open sessions — the property that
    * makes this viable on an unbounded 100 TB event stream. */
  def sessionWindowAgg(events: DataFrame, gap: String = "8 hours",
      watermark: Option[String] = None): DataFrame = {
    val src =
      if (events.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
        events.withColumn("ts", col("ts").cast("timestamp"))
      else events
    val wm = watermark.map(src.withWatermark("ts", _)).getOrElse(src)
    wm.groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("v"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("v"))
  }

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserSession(user_id: Long, events: Long, total_value: Double)

  /**
   * Stateful per-user aggregation via mapGroupsWithState — the custom-state
   * primitive for sessionization at scale (state lives in the state store,
   * partitioned by key across executors).
   */
  def sessionize(events: Dataset[UserEvent]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserSession, UserSession](GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[UserSession]) =>
          val prev = state.getOption.getOrElse(UserSession(user, 0L, 0.0))
          var n = prev.events
          var v = prev.total_value
          it.foreach { e => n += 1; v += e.value }
          // state keeps the UNROUNDED running sum — storing the rounded
          // value back would compound rounding error across micro-batches
          // (a per-event value below half a cent would vanish forever);
          // only the EMITTED value rounds
          state.update(UserSession(user, n, v))
          UserSession(user, n, math.rint(v * 100) / 100)
      }
  }
}
