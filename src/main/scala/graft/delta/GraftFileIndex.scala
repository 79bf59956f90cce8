package graft.delta

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/**
 * Custom `FileIndex` over a Delta snapshot — the integration point where
 * Catalyst's pushed-down filters meet the log-derived file list, exactly as
 * the reference's `ComplexFilterPushdown`/partition info meet
 * `DeltaMultiFileList` (src/functions/delta_scan/delta_multi_file_list.cpp:
 * 856-886; partition handling delta_multi_file_reader.cpp:120-160).
 *
 * - `partitionFilters` → per-file partition-value pruning (file-level
 *   partition pruning; Spark never reads partition columns from parquet,
 *   they are injected as constants from `PartitionDirectory.values`).
 * - `dataFilters` → stats-based file skipping (FileSkipping).
 * - No filesystem listing happens here at all: the file list, sizes and
 *   modification times come from the log. At 100 TB this is the difference
 *   between one log replay and millions of object-store LIST/HEAD calls.
 */
/** Scan pushdown mode — the `pushdown_filters` option of `delta_scan`
  * (reference delta_scan.cpp:14-44): `none` / `all` / `constant_only` /
  * `dynamic_only`, toggling the constant (WHERE-clause stats skipping +
  * generated-column derivation) and dynamic (join-derived re-prune) paths
  * independently. Stats skipping is redundant with the row-level filters
  * Spark keeps in the plan, so no mode changes results, only how many
  * files are scheduled. (The reference's `pushdown_partition_info` has no
  * safe Spark analog: a FileIndex MUST honor partition filters because
  * Spark prunes them from row filtering.) */
final case class ScanOptions(pushdownMode: String = ScanOptions.All) {
  require(ScanOptions.Modes.contains(pushdownMode),
    s"pushdown_filters mode must be one of ${ScanOptions.Modes.mkString(", ")}: $pushdownMode")
  def constantEnabled: Boolean =
    pushdownMode == ScanOptions.All || pushdownMode == ScanOptions.ConstantOnly
  def dynamicEnabled: Boolean =
    pushdownMode == ScanOptions.All || pushdownMode == ScanOptions.DynamicOnly
  /** Back-compat boolean view (true = any pushdown enabled). */
  def pushdownFilters: Boolean = pushdownMode != ScanOptions.NoneMode
}

object ScanOptions {
  val NoneMode = "none"
  val All = "all"
  val ConstantOnly = "constant_only"
  val DynamicOnly = "dynamic_only"
  val Modes: Set[String] = Set(NoneMode, All, ConstantOnly, DynamicOnly)
  /** Back-compat constructor: the pre-r11 boolean toggle. */
  def apply(pushdownFilters: Boolean): ScanOptions =
    new ScanOptions(if (pushdownFilters) All else NoneMode)
  /** Parse a user-facing option value: boolean strings map to all/none,
    * otherwise the value must be a mode name (reference delta_scan.cpp:14-28
    * errors on unknown modes the same way). */
  def parse(value: String): ScanOptions = value.trim.toLowerCase match {
    case "true" => new ScanOptions(All)
    case "false" => new ScanOptions(NoneMode)
    case m => new ScanOptions(m)
  }
}

class GraftFileIndex(spark: SparkSession, snapshot: Snapshot,
    options: ScanOptions = ScanOptions(),
    logicalNames: Boolean = false,
    /** Runtime (join-derived) filter thunks, evaluated lazily at the first
      * listFiles call — by then subordinate jobs are legal, making this the
      * Spark analog of the reference's dynamic filter re-prune
      * (delta_multi_file_list.cpp:989-1021). */
    dynamicThunks: Seq[() => Seq[Expression]] = Nil) extends FileIndex {

  def withDynamicThunk(t: () => Seq[Expression]): GraftFileIndex =
    new GraftFileIndex(spark, snapshot, options, logicalNames, dynamicThunks :+ t)

  /** Exact live row count from log metadata (DV-aware) — the
    * [[MetadataOnlyCount]] rewrite's input; None bails to a real scan. */
  def snapshotExactRowCount: Option[Long] = snapshot.exactRowCount

  /** For the metadata-only MIN/MAX/COUNT(col) rewrite: the snapshot, and
    * whether this relation's column names are LOGICAL (mapped-table
    * format) or the log's physical names — the rewrite must resolve its
    * attributes in the same namespace the relation exposes. */
  private[delta] def snapshotRef: Snapshot = snapshot
  private[delta] def exposesLogicalNames: Boolean = logicalNames

  /** Evaluated once; a failing thunk degrades to no dynamic pruning. */
  @transient private lazy val dynamicFilters: Seq[Expression] =
    dynamicThunks.flatMap(t =>
      try t() catch { case scala.util.control.NonFatal(_) => Nil })

  override def rootPaths: Seq[Path] = Seq(snapshot.log.tablePath)
  // the log's partitionValues and stats keys are PHYSICAL; `logicalNames`
  // relations (GraftParquetFileFormat) expose logical names instead and
  // incoming filters are rewritten physical before stats lookups
  override def partitionSchema: StructType =
    if (logicalNames) snapshot.partitionSchema else snapshot.physicalPartitionSchema
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = snapshot.sizeInBytes
  override def inputFiles: Array[String] =
    snapshot.allFiles.map(f => snapshot.absolutePath(f).toString).toArray

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    if (sys.env.contains("GRAFT_DEBUG_FILTERS"))
      dataFilters.foreach(f => System.err.println("[graft-debug] dataFilter:\n" + f.treeString))
    // 1. stats-based skipping on data filters (physical attr/stats names;
    //    logical-name relations get their attributes rewritten first)
    val statsFilters =
      if (!logicalNames) dataFilters
      else {
        val phys = snapshot.dataSchema.fields
          .map(f => f.name -> snapshot.physicalName(f)).toMap
        dataFilters.map(_.transform {
          case a: AttributeReference if phys.contains(a.name) =>
            a.withName(phys(a.name))
        })
      }
    val statsKeeper =
      if (options.constantEnabled)
        FileSkipping.keeper(snapshot.physicalDataSchema, statsFilters)
      else None
    // 1b. generated-column partition pruning: filters on the BASE column
    //     of a monotonic generation expression imply partition filters
    //     (delta-spark OptimizeGeneratedColumn analog) — `WHERE ts >= L`
    //     prunes `PARTITIONED BY (year(ts))` partitions. Derived from
    //     CONSTANT filters, so it follows the constant toggle.
    val derivedPartFilters =
      if (!options.constantEnabled) Nil
      else GeneratedPruning.derive(spark, snapshot, logicalNames, dataFilters)
    if (derivedPartFilters.nonEmpty)
      GraftMetrics.record(PushdownEvent(
        snapshot.log.tablePath.toString, "generated",
        derivedPartFilters.map(_.sql).mkString(" AND "),
        snapshot.fileCount.toInt, -1))
    val allPartFilters = partitionFilters ++ derivedPartFilters
    // 2. partition predicate, bound POSITIONALLY against the partition
    //    schema (row construction looks values up by the LOG's physical
    //    keys, so logical exposure stays consistent)
    val partitionBound: Option[Expression] =
      if (allPartFilters.isEmpty || partitionSchema.isEmpty) None
      else {
        val partAttrs: Seq[Attribute] = partitionSchema.fields.toSeq.map(f =>
          AttributeReference(f.name, f.dataType, f.nullable)())
        Some(allPartFilters.reduce(And).transform {
          case a: AttributeReference =>
            val idx = partAttrs.indexWhere(p => p.name.equalsIgnoreCase(a.name))
            if (idx >= 0) BoundReference(idx, partAttrs(idx).dataType, partAttrs(idx).nullable)
            else a
        })
      }
    // one pass over the snapshot's state — in-memory filter for regular
    // snapshots, executor-side Dataset filter + survivor collect for
    // checkpoint-backed LazySnapshots (10⁶+ adds never hit the driver)
    val afterPartition = snapshot.scanCandidates(statsKeeper, partitionBound)
    // event typing mirrors the reference's log (file_skipping_params.test):
    // `constant` only when the constant path is ENABLED and had filters to
    // push; a disabled-or-filterless listing records `none` (observability
    // of files scheduled — the reference logs nothing here, and specs that
    // port its per-mode assertions filter on constant/dynamic types)
    GraftMetrics.record(PushdownEvent(
      snapshot.log.tablePath.toString,
      if (options.constantEnabled && dataFilters.nonEmpty) "constant" else "none",
      (dataFilters ++ partitionFilters).map(_.sql).mkString(" AND "),
      snapshot.fileCount.toInt, afterPartition.size))
    // 3. dynamic (join-derived) stats re-prune — bounds computed at runtime
    val afterDynamic =
      if (dynamicThunks.isEmpty || !options.dynamicEnabled) afterPartition
      else {
        val dyn =
          if (!logicalNames) dynamicFilters
          else {
            val phys = snapshot.dataSchema.fields
              .map(f => f.name -> snapshot.physicalName(f)).toMap
            dynamicFilters.map(_.transform {
              case a: AttributeReference if phys.contains(a.name) =>
                a.withName(phys(a.name))
            })
          }
        if (dyn.isEmpty) afterPartition
        else {
          val pruned = FileSkipping.prune(afterPartition, snapshot.physicalDataSchema, dyn)
          GraftMetrics.record(PushdownEvent(
            snapshot.log.tablePath.toString, "dynamic",
            dyn.map(_.sql).mkString(" AND "),
            afterPartition.size, pruned.size))
          pruned
        }
      }
    // 4. group by partition values → PartitionDirectory
    afterDynamic
      .groupBy(_.partitionValues)
      .map { case (pv, files) =>
        PartitionDirectory(
          PartitionUtil.internalRow(pv, snapshot.physicalPartitionSchema),
          files.map(fileStatus).toArray)
      }.toSeq
  }

  private def fileStatus(f: AddFile): FileStatus =
    new FileStatus(f.size, false, 1, 128L * 1024 * 1024, f.modificationTime,
      snapshot.absolutePath(f))
}

/** One pushdown/skipping event — analog of the reference's structured
  * `delta.FilterPushdown` log + EXPLAIN "Scanning Files: x/y"
  * (delta_multi_file_list.cpp:888-987). */
final case class PushdownEvent(
    path: String, filterType: String, filters: String,
    filesBefore: Int, filesAfter: Int)

/** Process-wide pushdown observability, queryable as a DataFrame — the
  * Spark analog of `delta_filter_pushdown_log()` (src/delta_macros.cpp:14-97). */
object GraftMetrics {
  private val events = new ConcurrentLinkedQueue[PushdownEvent]()
  def record(e: PushdownEvent): Unit = events.add(e)
  def clear(): Unit = events.clear()
  def pushdownLog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    events.asScala.toSeq.toDF()
  }
}
