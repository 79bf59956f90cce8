package graft.delta

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.{Source => StreamSource}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/**
 * Pluggable data-source registration — the `delta_scan('path', ...)` API
 * analog (reference src/functions/delta_scan/delta_scan.cpp:83-121):
 *
 *   spark.read.format("graftdelta")
 *     .option("versionAsOf", 3)      // AT (VERSION => 3)
 *     .load(path)
 *
 * and the streaming read (beyond the reference — see
 * [[DeltaStreamSource]]):
 *
 *   spark.readStream.format("graftdelta")
 *     .option("startingVersion", 0).load(path)
 *
 * Registered via META-INF/services (DataSourceRegister), so the short
 * name works in any session without extra configuration.
 */
class GraftDeltaSource extends RelationProvider with StreamSourceProvider
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
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graftdelta requires a path"))
    val spark = sqlContext.sparkSession
    val log = DeltaLog.forPath(spark, path)
    require(!(parameters.contains("versionAsOf") && parameters.contains("timestampAsOf")),
      "graftdelta: versionAsOf and timestampAsOf are mutually exclusive")
    val snapshot = (parameters.get("versionAsOf"), parameters.get("timestampAsOf")) match {
      case (Some(v), _) => log.snapshotAt(v.toLong)
      case (_, Some(ts)) =>
        // millis since epoch, or any timestamp string Spark can cast
        val millis = ts.toLongOption.getOrElse(
          java.sql.Timestamp.valueOf(ts.replace("T", " ")).getTime)
        log.snapshotAt(log.versionAtTimestamp(millis))
      case _ => log.update()
    }
    val opts = ScanOptions(pushdownFilters =
      parameters.get("pushdownFilters").forall(_.toBoolean))
    snapshot.asRelation(opts)
  }
}
