package graft.delta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/**
 * Structured-Streaming SOURCE over a Delta table (the `readStream
 * .format("graftdelta")` analog of delta-spark's flagship streaming read
 * — beyond the reference, which has no streaming at all).
 *
 * Offsets are TABLE VERSIONS: batch (start, end] delivers the rows of
 * every `dataChange` add committed in versions start+1..end, so each
 * append becomes exactly one incremental slice and checkpoint recovery
 * replays version ranges idempotently (the log is immutable history —
 * the natural exactly-once source). First batch starts at
 * `startingVersion` (default 0 = the whole table).
 *
 * Non-append commits (DELETE/UPDATE: a `dataChange` remove, or DV
 * growth) are REFUSED loudly — silently treating a delete-carrying
 * version as pure inserts under-reports change, the same fail-closed
 * choice as [[DeltaTable.changes]]. `ignoreChanges=true` opts into
 * streaming just the adds of such commits (delta-spark's contract).
 * OPTIMIZE rewrites (`dataChange=false`) are skipped: not a change.
 *
 * Options: `startingVersion`, `maxVersionsPerTrigger` (rate limit),
 * `ignoreChanges`.
 *
 * Scale: getOffset is one log listing; getBatch plans a bounded file
 * list (the range's adds) into an ordinary parquet scan — no state
 * beyond the engine's offset checkpoint.
 *
 * Admission control: implements [[SupportsTriggerAvailableNow]] (v1
 * `Source` mixing in the connector interface, the same shape delta-spark
 * uses), so `Trigger.AvailableNow` processes exactly the versions present
 * at stream start — rate-limited into multiple micro-batches by
 * `maxVersionsPerTrigger` — then stops, instead of falling back to one
 * unbounded batch.
 */
final class DeltaStreamSource(
    spark: SparkSession,
    log: DeltaLog,
    parameters: Map[String, String]) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  require(!(parameters.contains("startingVersion") &&
      parameters.contains("startingTimestamp")),
    "startingVersion and startingTimestamp are mutually exclusive")
  private val startingVersion = parameters.get("startingVersion").map(_.toLong)
    .orElse(parameters.get("startingTimestamp").map { ts =>
      // first commit at-or-after the timestamp (CDF boundary semantics,
      // same rule as the batch readChangeFeed path)
      val millis = ts.toLongOption.getOrElse(
        java.sql.Timestamp.valueOf(ts.replace("T", " ")).getTime)
      log.firstVersionAtOrAfter(millis)
    })
    .getOrElse(0L)
  private val maxVersionsPerTrigger = parameters.get("maxVersionsPerTrigger").map(_.toLong)
  private val ignoreChanges = parameters.get("ignoreChanges").exists(_.toBoolean)
  private val readChangeFeed = parameters.get("readChangeFeed").exists(_.toBoolean)

  // schema is fixed at stream start (latest snapshot); files from older
  // versions null-fill columns added since (same rule as the batch scan).
  // CDF mode appends the protocol's three change columns.
  override val schema: StructType =
    if (readChangeFeed) DeltaStreamSource.cdfSchema(log.update().schema)
    else log.update().schema

  private case class VersionOffset(version: Long) extends OffsetV1 {
    override def json: String = s"""{"version":$version}"""
  }

  private def versionOf(o: OffsetV1): Long = o match {
    case VersionOffset(v) => v
    // checkpoint restore hands back a SerializedOffset (raw json)
    case other => ActionJson.mapper.readTree(other.json).get("version").asLong()
  }

  override def getOffset: Option[OffsetV1] = {
    val latest = log.update().version
    if (latest < startingVersion) None
    else Some(VersionOffset(maxVersionsPerTrigger match {
      // rate limit counts from the last planned end (engine passes it
      // back as getBatch's start; we only see it there, so cap against
      // the committed floor we know: startingVersion or the last batch)
      case Some(max) => math.min(latest, lastPlannedEnd.getOrElse(startingVersion - 1) + max)
      case None => latest
    }))
  }

  @volatile private var lastPlannedEnd: Option[Long] = None

  // ---- admission control (engine calls latestOffset, not getOffset,
  //      when a source implements SupportsAdmissionControl) ----

  /** Under Trigger.AvailableNow: the table version present at stream
    * start — the fixed end the stream must drain to and then stop at,
    * even if the table keeps growing underneath. */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(log.update().version)

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val latest = availableNowCap.getOrElse(log.update().version)
    val floor = Option(start) match {
      case Some(o: OffsetV1) => versionOf(o)
      case Some(other) =>
        ActionJson.mapper.readTree(other.json).get("version").asLong()
      case None => startingVersion - 1
    }
    val end = maxVersionsPerTrigger match {
      case Some(max) => math.min(latest, floor + max)
      case None => latest
    }
    if (end <= floor) null else VersionOffset(end)
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endV = versionOf(end)
    val fromV = start.map(versionOf(_) + 1).getOrElse(startingVersion)
    lastPlannedEnd = Some(endV)
    val have = log.listCommitVersions().toSet
    val versions = (fromV to endV).filter(have.contains)
    if (readChangeFeed) return getChangeBatch(versions)
    val partitioned = log.update().metadata.partitionColumns.nonEmpty
    val adds = versions.flatMap { v =>
      val acts = log.readCommit(v)
      val removes = acts.flatMap(_.remove).filter(_.dataChange)
      val dvGrowth = acts.flatMap(_.add).exists(a =>
        a.deletionVector.isDefined && a.dataChange)
      if ((removes.nonEmpty || dvGrowth) && !ignoreChanges)
        throw new IllegalStateException(
          s"graftdelta stream: version $v of ${log.tablePath} contains " +
            "row deletions (DELETE/UPDATE/MERGE); a plain stream would " +
            "under-report change. Set ignoreChanges=true to stream only " +
            "its added rows, or consume DeltaTable.changes for a full feed")
      acts.flatMap(_.add).filter(a => a.dataChange && a.deletionVector.isEmpty)
    }
    val batch = if (adds.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else {
      val paths = adds.map { a =>
        val d = java.net.URLDecoder.decode(a.path, java.nio.charset.StandardCharsets.UTF_8)
        if (d.startsWith("/") || d.contains("://")) d
        else new org.apache.hadoop.fs.Path(log.tablePath, d).toString
      }
      val r = spark.read.schema(schema)
      val df = (if (partitioned) r.option("basePath", log.tablePath.toString) else r)
        .parquet(paths: _*)
      df.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }
    org.apache.spark.sql.GraftColumnBridge.asStreamingBatch(batch)
  }

  /** CDF micro-batch: the version range's row-level change feed via
    * [[DeltaTable.changes]] (DV-diff aware, cdc-file aware, fail-closed
    * on underivable commits), stamped with the protocol's change
    * columns. Versions with no dataChange actions contribute nothing. */
  private def getChangeBatch(versions: Seq[Long]): DataFrame = {
    val changed = versions.filter { v =>
      val acts = log.readCommit(v)
      log.readCommitCdcPaths(v).nonEmpty ||
        acts.flatMap(_.add).exists(_.dataChange) ||
        acts.flatMap(_.remove).exists(_.dataChange)
    }
    val batch =
      if (changed.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else
        DeltaTable.forPath(spark, log.tablePath.toString)
          .changes(changed.min, changed.max)
    org.apache.spark.sql.GraftColumnBridge.asStreamingBatch(
      batch.select(schema.fieldNames.map(col).toIndexedSeq: _*))
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"DeltaStreamSource[${log.tablePath}]"
}

object DeltaStreamSource {
  /** Table schema + the CDF columns `changes` stamps. */
  def cdfSchema(table: StructType): StructType = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField}
    StructType(table.fields.toIndexedSeq ++ Seq(
      StructField("_change_type", StringType, nullable = true),
      StructField("_commit_version", LongType, nullable = false),
      StructField("_commit_timestamp", LongType, nullable = false)))
  }
}
