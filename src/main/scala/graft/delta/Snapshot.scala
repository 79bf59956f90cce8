package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

object Snapshot {
  /** THE canonical decoded-path → absolute-Path rule (absolute paths pass
    * through; relative ones resolve against the table root). A pure
    * function of strings so executor-side closures can use it without
    * capturing a Snapshot; every site that renders file-list paths for
    * matching against `_metadata.file_path` MUST go through this — a
    * second copy that drifts makes DV registry keys silently stop
    * matching and deleted rows resurface. */
  private[delta] def absolutePathOf(tablePath: String, decodedPath: String): Path = {
    val p = new Path(decodedPath)
    if (p.isAbsolute) p else new Path(new Path(tablePath), p)
  }

  /** True when `a` and `b` agree on every (nested) field NAME — i.e. no
    * physical rename applies anywhere inside the type. Metadata and
    * nullability are ignored: only a NAME difference needs a restoring
    * cast on read / a renaming cast on write. */
  private[delta] def sameFieldNames(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, MapType}
    (a, b) match {
      case (x: StructType, y: StructType) =>
        x.length == y.length && x.fields.zip(y.fields).forall { case (f, g) =>
          f.name == g.name && sameFieldNames(f.dataType, g.dataType)
        }
      case (ArrayType(x, _), ArrayType(y, _)) => sameFieldNames(x, y)
      case (MapType(xk, xv, _), MapType(yk, yv, _)) =>
        sameFieldNames(xk, yk) && sameFieldNames(xv, yv)
      case _ => true
    }
  }
}

/**
 * Immutable table state at one log version — the analog of the reference's
 * resolved `DeltaMultiFileList` (snapshot version, schema, file list with
 * per-file metadata; reference
 * src/include/functions/delta_scan/delta_multi_file_list.hpp:56-166).
 */
class Snapshot(
    @transient val log: DeltaLog,
    val version: Long,
    val protocol: Protocol,
    val metadata: Metadata,
    filesEager: Seq[AddFile],
    val setTransactions: Map[String, Long],
    val domainMetadata: Seq[DomainMetadata],
    /** Remove tombstones still in replay scope (latest action per path is
      * a remove). Carried so checkpoints retain them within
      * `delta.deletedFileRetentionDuration` — foreign engines (and VACUUM)
      * must still see recent deletions once older commit JSONs are cleaned
      * up, per protocol. [[LazySnapshot]] carries its JSON-tail removes
      * plus the base checkpoint's UNexpired tombstones (bounded by the
      * retention window), so its next checkpoint keeps the contract too. */
    val tombstones: Seq[RemoveFile] = Nil) {

  /** Full reconciled file list. [[LazySnapshot]] (checkpoint-backed, 10⁶+
    * adds) materializes this only for maintenance operations — scans go
    * through [[scanCandidates]], which prunes BEFORE collecting. */
  def allFiles: Seq[AddFile] = filesEager

  def fileCount: Long = allFiles.size

  /** Typed Dataset over the full file list — the DISTRIBUTED surface for
    * passes that must not funnel O(#table-files) through the driver (the
    * DML path's per-file facts join). Eager snapshots wrap their
    * in-memory list; [[LazySnapshot]] overrides with its checkpoint-backed
    * Dataset so the list never materializes driver-side. */
  private[delta] def filesDataset: org.apache.spark.sql.Dataset[AddFile] =
    log.spark.createDataset(allFiles)(
      org.apache.spark.sql.Encoders.product[AddFile])

  /** (decodedPath, deletionVector) projection of the file list — the DV
    * registry's input. Eager snapshots read the in-memory list;
    * [[LazySnapshot]] collects the projection distributed so DV-table
    * scans never materialize stats-bearing AddFiles on the driver. */
  private[delta] def dvRegistryPairs: Seq[(String, Option[DeletionVectorDescriptor])] =
    allFiles.map(f => (f.decodedPath, f.deletionVector))

  /** Scan-time candidate files after stats skipping + partition pruning.
    * `statsKeeper` is [[FileSkipping.keeper]]'s serializable per-file
    * decision; `partitionBound` is the partition predicate bound
    * POSITIONALLY against [[physicalPartitionSchema]]. The base
    * implementation filters the in-memory list (fork-join parallel above
    * the FileSkipping threshold); LazySnapshot ships both closures to
    * executors and collects only the survivors. */
  private[graft] def scanCandidates(
      statsKeeper: Option[AddFile => Boolean],
      partitionBound: Option[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[AddFile] = {
    val afterStats = statsKeeper match {
      case Some(k) => FileSkipping.filterWith(allFiles, k)
      case None => allFiles
    }
    partitionBound match {
      case Some(b) =>
        val pred = org.apache.spark.sql.catalyst.expressions.Predicate.createInterpreted(b)
        afterStats.filter(f => pred.eval(
          PartitionUtil.internalRow(f.partitionValues, physicalPartitionSchema)))
      case None => afterStats
    }
  }

  def schema: StructType = metadata.schema
  def partitionSchema: StructType = metadata.partitionSchema
  def dataSchema: StructType = metadata.dataSchema

  // ---- column mapping (name + id mode; reference delta_utils.hpp:300-311) --

  def columnMappingMode: String =
    metadata.configuration.getOrElse("delta.columnMapping.mode", "none")

  /** Physical (parquet) name of a logical field. */
  def physicalName(f: org.apache.spark.sql.types.StructField): String =
    if (columnMappingMode == "none") f.name
    else if (f.metadata.contains("delta.columnMapping.physicalName"))
      f.metadata.getString("delta.columnMapping.physicalName")
    else f.name

  /** Physical rendition of a logical field: physical name, plus — in id
    * mode — `parquet.field.id` metadata so Spark's parquet reader resolves
    * the column by field id (reference reads parquet field ids the same
    * way, delta_utils.hpp:300-311). Recurses through struct/array/map —
    * the column-mapping protocol renames every NESTED struct field too
    * (fields without minted metadata keep their logical names). */
  private[delta] def physicalField(
      f: org.apache.spark.sql.types.StructField): org.apache.spark.sql.types.StructField = {
    val renamed = f.copy(name = physicalName(f), dataType = physicalType(f.dataType))
    if (columnMappingMode == "id" && f.metadata.contains("delta.columnMapping.id")) {
      val m = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(renamed.metadata)
        .putLong("parquet.field.id", f.metadata.getLong("delta.columnMapping.id"))
        .build()
      renamed.copy(metadata = m)
    } else renamed
  }

  /** [[physicalField]] applied to every nested struct field of a type. */
  private[delta] def physicalType(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types.{ArrayType, MapType}
    dt match {
      case st: StructType => StructType(st.fields.map(physicalField))
      case ArrayType(e, n) => ArrayType(physicalType(e), n)
      case MapType(k, v, n) => MapType(physicalType(k), physicalType(v), n)
      case other => other
    }
  }

  /** Column expression restoring a physically-named column back to its
    * LOGICAL rendition: top-level alias, plus a positional struct cast
    * when any NESTED field was physically renamed (cast-free otherwise —
    * flat mapped tables keep their plans unchanged). */
  private[delta] def logicalColumn(f: org.apache.spark.sql.types.StructField)
      : org.apache.spark.sql.Column = {
    val c = col(s"`${physicalName(f)}`")
    val restored =
      if (Snapshot.sameFieldNames(physicalType(f.dataType), f.dataType)) c
      else c.cast(f.dataType)
    restored.as(f.name)
  }

  /** Data/partition schemas under physical names (what parquet + the log's
    * partitionValues/stats are keyed by). */
  private[delta] def physicalDataSchema: StructType =
    StructType(dataSchema.fields.map(physicalField))
  private[delta] def physicalPartitionSchema: StructType =
    StructType(partitionSchema.fields.map(physicalField))

  def absolutePath(f: AddFile): Path =
    Snapshot.absolutePathOf(log.tablePath.toString, f.decodedPath)

  def sizeInBytes: Long = allFiles.map(_.size).sum

  /** Optimizer row estimate = Σ per-file numRecords, as the reference's
    * GetCardinality (delta_multi_file_list.cpp:1046-1071). None if any file
    * lacks stats. */
  lazy val numRecordsEstimate: Option[Long] = {
    val counts = allFiles.map(f => f.parsedStats.flatMap(_.numRecords))
    if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
  }

  def hasDeletionVectors: Boolean = allFiles.exists(_.deletionVector.isDefined)

  /** EXACT live row count from metadata alone: Σ per-file numRecords minus
    * Σ deletion-vector cardinalities — both protocol-authoritative. None
    * if any file lacks numRecords (foreign writers may omit stats).
    * Powers the metadata-only `count(*)` rewrite ([[MetadataOnlyCount]]). */
  lazy val exactRowCount: Option[Long] =
    numRecordsEstimate.map(total =>
      total - allFiles.map(_.deletionVector.map(_.cardinality).getOrElse(0L)).sum)

  /** EXACT (nonNullCount, min, max) for one column from metadata alone —
    * per-file stats for data columns, typed partitionValues for partition
    * columns. None unless EVERY file proves its contribution and no file
    * carries a deletion vector (a DV could remove the extreme or the
    * non-null rows). Values are Catalyst-internal. Powers the
    * metadata-only MIN/MAX/COUNT(col) rewrite ([[MetadataOnlyCount]]). */
  private[delta] def exactColumnFacts(key: String, isPartition: Boolean,
      dt: org.apache.spark.sql.types.DataType,
      needExtremes: Boolean): Option[(Long, Any, Any)] = {
    val fn = ColumnFacts.fileFacts(key, isPartition, dt, needExtremes) _
    val fold = new ColumnFacts.Fold(dt)
    val it = allFiles.iterator
    while (it.hasNext && !fold.bailed) fold.add(fn(it.next()))
    fold.result
  }

  /** EXACT live row counts per partition-value tuple for `keys` (physical
    * partition column names): Σ(numRecords − DV cardinality) grouped by
    * the files' raw partitionValues. DV-SAFE at file granularity — every
    * row of a file shares its partition tuple, and the DV cardinality is
    * protocol-exact, so group liveness needs no stats beyond numRecords.
    * None when any file misses a key or its numRecords. Powers the
    * GROUP-BY-partition metadata rewrite ([[MetadataOnlyCount]]); result
    * size is O(#distinct partition tuples), never O(#files). */
  private[delta] def partitionLiveFacts(keys: Seq[String])
      : Option[Seq[(Seq[String], Long)]] = {
    val acc = new scala.collection.mutable.LinkedHashMap[Seq[String], Long]
    val it = allFiles.iterator
    while (it.hasNext) {
      val f = it.next()
      ColumnFacts.partitionLiveRow(keys)(f) match {
        case None => return None
        case Some((vals, live)) =>
          acc.update(vals, acc.getOrElse(vals, 0L) + live)
      }
    }
    Some(acc.toSeq)
  }

  /** DV registry broadcast, built + shipped ONCE per snapshot (the registry
    * eagerly reads every deletion vector on the driver — repeated reads of
    * a DV table must not re-read them or accumulate broadcasts). */
  @transient private[delta] lazy val dvRegistryBroadcast
      : Option[org.apache.spark.broadcast.Broadcast[Map[String, DvHandle]]] =
    if (hasDeletionVectors)
      Some(log.spark.sparkContext.broadcast(DeletionVectors.registry(this)))
    else None

  /**
   * The scan surface: a DataFrame over a custom FileIndex, so Catalyst gets
   * predicate/projection pushdown, partition pruning, and our stats-based
   * file skipping for free (the Spark-side equivalent of delta_scan's
   * injected MultiFileReader, reference delta_scan.cpp:83-121).
   */
  def toDF: DataFrame = toDF(ScanOptions())

  def toDF(options: ScanOptions): DataFrame = {
    val spark = log.spark
    val df = relationDF(options)
    val base =
      if (hasDeletionVectors) DeletionVectors.filterDeleted(spark, this, df)
      else df
    // restore logical column order; alias physical → logical names
    // (incl. nested struct fields via logicalColumn's positional cast)
    base.select(schema.fields.map(logicalColumn).toIndexedSeq: _*)
  }

  /** V1 BaseRelation for `spark.read.format("graftdelta")`, full-fidelity:
    * LOGICAL column names are exposed; deletion vectors and column mapping
    * (name + id mode) are applied INSIDE the reader by
    * [[GraftParquetFileFormat]], mirroring the reference's in-scan
    * multi-file reader (delta_multi_file_reader.cpp:24-48,162-230). Column
    * order is data-columns-then-partition-columns, per HadoopFsRelation
    * convention. */
  def asRelation: org.apache.spark.sql.sources.BaseRelation = asRelation(ScanOptions())

  def asRelation(options: ScanOptions): org.apache.spark.sql.sources.BaseRelation = {
    val spark = log.spark
    val logicalToPhysical = dataSchema.fields.map(f => f.name -> physicalField(f)).toMap
    val dvBc = dvRegistryBroadcast
    HadoopFsRelation(
      location = new GraftFileIndex(spark, this, options, logicalNames = true),
      partitionSchema = partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new GraftParquetFileFormat(logicalToPhysical, dvBc,
        fieldIdMode = columnMappingMode == "id"),
      options = Map.empty)(spark)
  }

  /** Raw relation DataFrame: no DV filtering, `_metadata` still reachable.
    * Used by the DV write path to locate physical rows. */
  private[delta] def relationDF: DataFrame = relationDF(ScanOptions())

  /** [[relationDF]] under LOGICAL column names (plus `_metadata` carried
    * through explicitly): the row-level DML surface — user predicates and
    * assignments are logical, files are physical. */
  private[delta] def dmlDF: DataFrame = dmlDF(Nil)

  /** [[dmlDF]] widened with extra physical pass-through columns (the
    * materialized row-id columns a row-tracked DML must preserve). */
  private[delta] def dmlDF(
      extraDataCols: Seq[org.apache.spark.sql.types.StructField]): DataFrame = {
    val df = relationDF(ScanOptions(), extraDataCols)
    if (columnMappingMode == "none") df
    else df.select((schema.fields.map(logicalColumn) ++
      extraDataCols.map(f => org.apache.spark.sql.functions.col(s"`${f.name}`")) :+
      org.apache.spark.sql.functions.col("_metadata")).toIndexedSeq: _*)
  }

  private[delta] def relationDF(options: ScanOptions): DataFrame =
    relationDF(options, Nil)

  /** As [[relationDF]], optionally widening the read schema with extra
    * physical columns (nullable; files lacking them read as null) — the
    * row-tracking rewrite path reads previously-materialized row ids
    * this way. */
  private[delta] def relationDF(options: ScanOptions,
      extraDataCols: Seq[org.apache.spark.sql.types.StructField]): DataFrame = {
    val spark = log.spark
    // id-mode physical schemas carry `parquet.field.id` metadata; field-id
    // resolution is enabled per-scan in the reader's hadoopConf (no
    // session-wide conf mutation) by GraftParquetFileFormat
    val format =
      if (columnMappingMode == "id")
        new GraftParquetFileFormat(Map.empty, None, fieldIdMode = true)
      else new ParquetFileFormat()
    val index = new GraftFileIndex(spark, this, options)
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = physicalPartitionSchema,
      dataSchema = StructType(physicalDataSchema.fields ++ extraDataCols),
      bucketSpec = None,
      fileFormat = format,
      options = Map.empty)(spark)
    spark.baseRelationToDataFrame(relation)
  }
}
