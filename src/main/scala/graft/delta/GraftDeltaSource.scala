package graft.delta

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.streaming.{Sink => StreamSink, Source => StreamSource}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/**
 * Pluggable data-source registration — the `delta_scan('path', ...)` API
 * analog (reference src/functions/delta_scan/delta_scan.cpp:83-121):
 *
 *   spark.read.format("graftdelta")
 *     .option("versionAsOf", 3)      // AT (VERSION => 3)
 *     .load(path)
 *
 * the batch write (delta-spark `df.write.format("delta")` analog):
 *
 *   df.write.format("graftdelta").mode("append")        // or overwrite/
 *     .partitionBy("p").save(path)                      // ignore/error
 *
 * and the streaming read/write (beyond the reference — see
 * [[DeltaStreamSource]] / [[DeltaStreamSink]]):
 *
 *   spark.readStream.format("graftdelta")
 *     .option("startingVersion", 0).load(path)
 *   df.writeStream.format("graftdelta")
 *     .option("checkpointLocation", ckpt).start(path)
 *
 * Registered via META-INF/services (DataSourceRegister), so the short
 * name works in any session without extra configuration.
 */
class GraftDeltaSource extends RelationProvider with CreatableRelationProvider
    with StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "graftdelta"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("graftdelta requires a path"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse {
      val table =
        DeltaLog.forPath(sqlContext.sparkSession, pathOf(parameters)).update().schema
      if (parameters.get("readChangeFeed").exists(_.toBoolean))
        DeltaStreamSource.cdfSchema(table)
      else table
    })

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): StreamSource =
    new DeltaStreamSource(sqlContext.sparkSession,
      DeltaLog.forPath(sqlContext.sparkSession, pathOf(parameters)), parameters)

  override def createRelation(
      sqlContext0: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val sqlContext = sqlContext0
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graftdelta requires a path"))
    val spark = sqlContext.sparkSession
    val log = DeltaLog.forPath(spark, path)
    // logTail is a plain-scan option; combining it with the CDF read would
    // silently drop the tail commit's changes (the CDF branch returns
    // before the logTail handling) — refuse loudly instead
    require(!(parameters.contains("logTail") &&
        parameters.get("readChangeFeed").exists(_.toBoolean)),
      "graftdelta: logTail is not supported with readChangeFeed")
    // batch CDF read: spark.read.format("graftdelta")
    //   .option("readChangeFeed","true").option("startingVersion"/-Timestamp, …)
    //   [.option("endingVersion"/-Timestamp, …)] — delta-spark's surface
    if (parameters.get("readChangeFeed").exists(_.toBoolean)) {
      def millisOf(ts: String): Long = DeltaLog.parseTimestampMillis(spark, ts)
      require(!(parameters.contains("startingVersion") &&
          parameters.contains("startingTimestamp")),
        "graftdelta CDF: startingVersion and startingTimestamp are mutually exclusive")
      val start = parameters.get("startingVersion").map(_.toLong)
        .orElse(parameters.get("startingTimestamp")
          .map(ts => log.firstVersionAtOrAfter(millisOf(ts))))
        .getOrElse(throw new IllegalArgumentException(
          "graftdelta CDF: startingVersion or startingTimestamp is required"))
      val end = parameters.get("endingVersion").map(_.toLong)
        .orElse(parameters.get("endingTimestamp")
          .map(ts => log.versionAtTimestamp(millisOf(ts))))
        .getOrElse(log.update().version)
      val df = DeltaTable.forPath(spark, path).changes(start, end)
      return new BaseRelation with org.apache.spark.sql.sources.TableScan {
        override def sqlContext: SQLContext = sqlContext0
        override def schema: StructType = df.schema
        override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
          df.rdd
      }
    }
    require(!(parameters.contains("versionAsOf") && parameters.contains("timestampAsOf")),
      "graftdelta: versionAsOf and timestampAsOf are mutually exclusive")
    require(!(parameters.contains("logTail") &&
        (parameters.contains("versionAsOf") || parameters.contains("timestampAsOf"))),
      "graftdelta: logTail cannot be combined with versionAsOf/timestampAsOf " +
        "(the tail defines the newest state)")
    val snapshot = (parameters.get("versionAsOf"), parameters.get("timestampAsOf"),
        parameters.get("logTail")) match {
      case (Some(v), _, _) => log.snapshotAt(v.toLong)
      case (_, Some(ts), _) =>
        log.snapshotAt(log.versionAtTimestamp(
          DeltaLog.parseTimestampMillis(spark, ts)))
      case (_, _, Some(tail)) =>
        // comma-separated commit-JSON paths — the reference's `log_tail`
        // option (delta_extension.cpp:55-57): not-yet-committed commits
        // folded into snapshot construction
        log.snapshotWithLogTail(tail.split(',').toSeq.map(_.trim)
          .filter(_.nonEmpty).map(new org.apache.hadoop.fs.Path(_)))
      case _ => log.update()
    }
    // reference mode matrix (delta_scan.cpp:14-44): none / all /
    // constant_only / dynamic_only; boolean strings kept for back-compat
    val opts = parameters.get("pushdownFilters")
      .map(ScanOptions.parse).getOrElse(ScanOptions())
    snapshot.asRelation(opts)
  }

  /** `.partitionBy(...)` on a V1 writer arrives JSON-encoded under this
    * key (Spark's DataFrameWriter/DataStreamWriter contract for
    * non-file-format sources). */
  private def partitionColsOf(parameters: Map[String, String]): Seq[String] =
    parameters.get("__partition_columns").map { json =>
      val node = ActionJson.mapper.readTree(json)
      (0 until node.size()).map(node.get(_).asText())
    }.getOrElse(Nil)

  /** Batch write: `df.write.format("graftdelta").mode(...).save(path)`.
    * Supports `partitionBy`, `mergeSchema` (append) and `replaceWhere`
    * (overwrite). Returns the freshly-written table's relation. */
  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val path = pathOf(parameters)
    val spark = sqlContext.sparkSession
    val partCols = partitionColsOf(parameters)
    val exists = DeltaLog.forPath(spark, path).tableExists
    mode match {
      case SaveMode.Append =>
        DeltaWriter.append(spark, data, path, partitionBy = partCols,
          mergeSchema = parameters.get("mergeSchema").exists(_.toBoolean))
      case SaveMode.Overwrite =>
        DeltaWriter.overwrite(spark, data, path,
          replaceWhere = parameters.get("replaceWhere")
            .map(org.apache.spark.sql.functions.expr),
          partitionBy = partCols,
          // delta-spark's dynamic partition overwrite: replace only the
          // partitions present in the incoming data
          dynamicPartitions = parameters.get("partitionOverwriteMode")
            .exists(_.equalsIgnoreCase("dynamic")))
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(
          s"graftdelta: table already exists at $path (mode ErrorIfExists)")
      case SaveMode.ErrorIfExists =>
        DeltaWriter.append(spark, data, path, partitionBy = partCols)
      case SaveMode.Ignore =>
        if (!exists) DeltaWriter.append(spark, data, path, partitionBy = partCols)
    }
    createRelation(sqlContext, parameters)
  }

  /** Streaming write: `df.writeStream.format("graftdelta").start(path)` —
    * exactly-once Append (txnVersion=batchId) and idempotent Complete;
    * see [[DeltaStreamSink]]. */
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): StreamSink =
    new DeltaStreamSink(sqlContext.sparkSession, pathOf(parameters),
      parameters, partitionColumns, outputMode)
}
