package graft.delta

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * User-facing table handle — the Spark analog of the reference's
 * `ATTACH ... (TYPE delta)` catalog surface plus its metadata table
 * functions (src/delta_extension.cpp:21-93; src/storage/delta_catalog.cpp;
 * src/functions/delta_metadata_scan.cpp; src/functions/delta_domain_metadata.cpp).
 *
 * - `toDF()` / `toDF(versionAsOf)` ≈ `delta_scan(path)` / `AT (VERSION => n)`
 * - `attach(name)` ≈ ATTACH: registers a temp view
 * - `pin()` ≈ PIN_SNAPSHOT: a handle fixed at the current version
 * - `listFiles` ≈ `delta_list_files` / `delta_metadata`
 * - `domainMetadata` ≈ `delta_domain_metadata`
 * - `getTransactionVersion` ≈ `delta_get_transaction_version`
 */
class DeltaTable private (val spark: SparkSession, val log: DeltaLog,
    pinnedVersion: Option[Long] = None,
    scanOptions: ScanOptions = ScanOptions()) {

  def snapshot: Snapshot =
    pinnedVersion.map(log.snapshotAt).getOrElse(log.update())

  def version: Long = snapshot.version

  def toDF: DataFrame = snapshot.toDF(scanOptions)

  /** Time travel (`AT (VERSION => n)` / `versionAsOf`). */
  def toDF(versionAsOf: Long): DataFrame =
    log.snapshotAt(versionAsOf).toDF(scanOptions)

  /** `pushdown_filters` toggle analog (reference delta_scan.cpp:14-44). */
  def withScanOptions(options: ScanOptions): DeltaTable =
    new DeltaTable(spark, log, pinnedVersion, options)

  /** Virtual-columns scan (reference §2.1 #9: `filename`,
    * `file_row_number`, `delta_file_number`): the file ordinal comes from
    * the snapshot's file list as a literal map (codegen'd `element_at`,
    * no join). */
  def toDFWithVirtualColumns: DataFrame = {
    import org.apache.spark.sql.functions._
    val snap = snapshot
    require(snap.columnMappingMode == "none",
      "virtual-column scan not supported on column-mapped tables")
    val mapArgs = snap.allFiles.zipWithIndex.flatMap { case (f, i) =>
      val p = snap.absolutePath(f)
      Seq(p.toString -> i, p.toUri.getPath -> i)
    }.distinctBy(_._1).flatMap { case (p, i) => Seq(lit(p), lit(i)) }
    val base0 = snap.relationDF
    val base =
      if (snap.hasDeletionVectors) DeletionVectors.filterDeleted(spark, snap, base0)
      else base0
    base.select(
      (snap.schema.fieldNames.map(col) ++ Seq(
        col("_metadata.file_path").as("filename"),
        col("_metadata.row_index").as("file_row_number"),
        element_at(map(mapArgs.toIndexedSeq: _*), col("_metadata.file_path"))
          .as("delta_file_number"))).toIndexedSeq: _*)
  }

  /** ATTACH analog: register as a temp view (optionally pinned). */
  def attach(name: String, pinSnapshot: Boolean = false): DeltaTable = {
    val t = if (pinSnapshot) pin() else this
    t.toDF.createOrReplaceTempView(name)
    t
  }

  /** PIN_SNAPSHOT analog: handle frozen at the current (or given) version. */
  def pin(): DeltaTable = new DeltaTable(spark, log, Some(snapshot.version), scanOptions)
  def at(version: Long): DeltaTable = new DeltaTable(spark, log, Some(version), scanOptions)

  /** `delta_list_files`/`delta_metadata` analog: one row per live data file
    * (schema mirrors delta_metadata_scan.cpp:17-148). */
  def listFiles(version: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val s = version.map(log.snapshotAt).getOrElse(snapshot)
    s.allFiles.map { f =>
      (f.decodedPath, f.parsedStats.flatMap(_.numRecords),
        f.partitionValues.map { case (k, v) => (k, Option(v)) },
        f.deletionVector.isDefined,
        f.deletionVector.map(_.cardinality).getOrElse(0L))
    }.toDF("data_file", "cardinality", "partitions", "have_deletes", "delete_count")
  }

  /** `delta_domain_metadata` analog. */
  def domainMetadata(version: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val s = version.map(log.snapshotAt).getOrElse(snapshot)
    s.domainMetadata.map(d => (d.domain, d.configuration))
      .toDF("domain", "configuration")
  }

  /** `delta_get_transaction_version` analog. */
  def getTransactionVersion(appId: String): Option[Long] =
    snapshot.setTransactions.get(appId)

  /** Commit history from commitInfo actions (small helper; not in the
    * reference surface but free given the log). */
  def history(): DataFrame = {
    import spark.implicits._
    log.listCommitVersions().flatMap { v =>
      log.readCommit(v).flatMap(_.commitInfo).map(ci =>
        (v, ci.timestamp, ci.operation, ci.engineInfo))
    }.toDF("version", "timestamp", "operation", "engineInfo")
  }

  def append(df: DataFrame, partitionBy: Seq[String] = Nil,
      txnAppId: Option[String] = None, txnVersion: Option[Long] = None): Long =
    DeltaWriter.append(spark, df, log.tablePath.toString, partitionBy,
      txnAppId = txnAppId, txnVersion = txnVersion)

  /** `CHECKPOINT tbl` analog. */
  def checkpoint(): Long = Checkpoints.checkpoint(log)

  /** DELETE via deletion vectors (beyond the reference's own surface,
    * which rejects DELETE — src/storage/delta_catalog.cpp:102-117). */
  def delete(condition: org.apache.spark.sql.Column): Long =
    DeltaDelete.delete(spark, log, condition)

  /** OPTIMIZE: bin-pack small files + purge deletion vectors by rewrite. */
  def optimize(smallFileThreshold: Long = 32L * 1024 * 1024): Optimize.Result =
    Optimize.compact(spark, log, smallFileThreshold)

  /** UPDATE: soft-delete matched rows (DV) + re-append updated images in
    * one commit (beyond the reference's surface). */
  def update(condition: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column]): Long =
    DeltaUpdate.update(spark, log, condition, assignments)

  /** MERGE-style upsert on key columns: source replaces matched rows,
    * inserts the rest. Returns (rowsUpdated, rowsInserted). */
  def upsert(source: DataFrame, keyCols: Seq[String]): (Long, Long) =
    DeltaMerge.upsert(spark, log, source, keyCols)

  /** Record/overwrite a domainMetadata entry (write side of
    * `delta_domain_metadata`). */
  def setDomainMetadata(domain: String, configuration: String,
      removed: Boolean = false): Long = {
    val snap = log.update()
    val actions = Seq(
      Action(CommitInfo(System.currentTimeMillis(), "SET DOMAIN METADATA",
        Map("domain" -> domain))),
      Action(DomainMetadata(domain, configuration, removed)))
    LogStore.write(log.fs, log.commitFile(snap.version + 1),
      actions.map(ActionJson.toJson).mkString("", "\n", "\n"))
    log.invalidateCache()
    snap.version + 1
  }
}

object DeltaTable {
  def forPath(spark: SparkSession, path: String): DeltaTable =
    new DeltaTable(spark, DeltaLog.forPath(spark, path))
}
