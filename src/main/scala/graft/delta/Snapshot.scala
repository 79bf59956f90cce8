package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

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
    val allFiles: Seq[AddFile],
    val setTransactions: Map[String, Long],
    val domainMetadata: Seq[DomainMetadata]) {

  def schema: StructType = metadata.schema
  def partitionSchema: StructType = metadata.partitionSchema
  def dataSchema: StructType = metadata.dataSchema

  def absolutePath(f: AddFile): Path = {
    val p = new Path(f.decodedPath)
    if (p.isAbsolute) p else new Path(log.tablePath, p)
  }

  def sizeInBytes: Long = allFiles.map(_.size).sum

  /** Optimizer row estimate = Σ per-file numRecords, as the reference's
    * GetCardinality (delta_multi_file_list.cpp:1046-1071). None if any file
    * lacks stats. */
  lazy val numRecordsEstimate: Option[Long] = {
    val counts = allFiles.map(f => f.parsedStats.flatMap(_.numRecords))
    if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
  }

  def hasDeletionVectors: Boolean = allFiles.exists(_.deletionVector.isDefined)

  /**
   * The scan surface: a DataFrame over a custom FileIndex, so Catalyst gets
   * predicate/projection pushdown, partition pruning, and our stats-based
   * file skipping for free (the Spark-side equivalent of delta_scan's
   * injected MultiFileReader, reference delta_scan.cpp:83-121).
   */
  def toDF: DataFrame = {
    val spark = log.spark
    val index = new GraftFileIndex(spark, this)
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
    val df = spark.baseRelationToDataFrame(relation)
    val base =
      if (hasDeletionVectors) DeletionVectors.filterDeleted(spark, this, df)
      else df
    // HadoopFsRelation appends partition columns last; restore logical order.
    base.select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }
}
