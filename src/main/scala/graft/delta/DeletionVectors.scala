package graft.delta

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Deletion-vector application on read (reference: DeltaDeleteFilter,
 * src/functions/delta_scan/delta_multi_file_reader.cpp:24-48; DV fetch
 * delta_multi_file_list.cpp:448-462).
 *
 * Placeholder for round-1 milestone 5: decode the protocol DV bitmap
 * (RoaringBitmap, on Spark's classpath) and filter on
 * `_metadata.row_index`.
 */
object DeletionVectors {
  def filterDeleted(spark: SparkSession, snapshot: Snapshot, df: DataFrame): DataFrame =
    throw new UnsupportedOperationException(
      "deletion vector read support lands in a later milestone")
}
