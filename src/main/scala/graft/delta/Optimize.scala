package graft.delta

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/**
 * OPTIMIZE: bin-pack small files and purge deletion vectors by rewriting —
 * beyond the reference's own surface, but the maintenance operation that
 * keeps a 100 TB table scannable (small-file problem: every file is a task
 * + an object-store request; DVs tax every scan with bitmap probes).
 *
 * Semantics: per partition, files smaller than `smallFileThreshold` or
 * carrying a DV are rewritten into `targetFileCount`-sized files; the
 * commit removes the originals and adds the compacted files with
 * dataChange=false (readers of any version see identical rows — time
 * travel across the OPTIMIZE is preserved).
 */
object Optimize {

  final case class Result(version: Long, filesRemoved: Int, filesAdded: Int)

  def compact(
      spark: SparkSession,
      log: DeltaLog,
      smallFileThreshold: Long = 32L * 1024 * 1024,
      maxRowsPerFile: Long = 8L * 1024 * 1024): Result = {
    val snap = log.update()
    // writeFiles emits parquet with LOGICAL column names; a column-mapped
    // table's readers resolve PHYSICAL names — rewriting here would produce
    // files that read back all-null. Guard like append/update/merge.
    require(snap.columnMappingMode == "none",
      "OPTIMIZE not supported on column-mapped tables")

    val candidates = snap.allFiles.filter(f =>
      f.size < smallFileThreshold || f.deletionVector.isDefined)
    // nothing to do: one clean small file per partition is already optimal
    val byPartition = candidates.groupBy(_.partitionValues)
      .filter { case (_, fs) => fs.size > 1 || fs.exists(_.deletionVector.isDefined) }
    if (byPartition.isEmpty) return Result(snap.version, 0, 0)
    val toRewrite = byPartition.values.flatten.toSeq
    val rewriteSet = toRewrite.map(_.decodedPath).toSet

    // scoped snapshot over just the files being rewritten: same scan path
    // as toDF (DV filtering, partition values, logical order)
    val scoped = new Snapshot(log, snap.version, snap.protocol, snap.metadata,
      toRewrite, snap.setTransactions, snap.domainMetadata)
    val rows = scoped.toDF
    val numFiles = math.max(1L,
      toRewrite.map(f => f.parsedStats.flatMap(_.numRecords).getOrElse(0L)).sum
        / maxRowsPerFile + 1).toInt
    val partCols = snap.metadata.partitionColumns
    val repacked =
      if (partCols.nonEmpty) rows.repartition(numFiles, partCols.map(col): _*)
      else rows.repartition(numFiles)

    val moved = ArrayBuffer.empty[Path]
    try {
      val adds = DeltaWriter.writeFiles(spark, log, repacked, snap.schema,
        partCols, moved)
      val actions =
        Seq(Action(CommitInfo(System.currentTimeMillis(), "OPTIMIZE",
          Map("filesRemoved" -> toRewrite.size.toString,
            "filesAdded" -> adds.size.toString)))) ++
        toRewrite.map(f => Action(RemoveFile(f.path,
          Some(System.currentTimeMillis()), dataChange = false, f.deletionVector))) ++
        adds.map(a => Action(a.copy(dataChange = false)))
      // OPTIMIZE reads the table: conflicts are errors, no blind retry
      LogStore.write(log.fs, log.commitFile(snap.version + 1),
        actions.map(ActionJson.toJson).mkString("", "\n", "\n"))
      log.invalidateCache()
      Result(snap.version + 1, toRewrite.size, adds.size)
    } catch {
      case t: Throwable =>
        moved.foreach(p => try log.fs.delete(p, false) catch { case _: Exception => () })
        throw t
    }
  }
}
