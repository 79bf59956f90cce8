package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Encoders, SaveMode}

/**
 * Checkpointing: consolidate the reconciled snapshot state into a single
 * `NNNNNNNNNNNNNNNNNNNN.checkpoint.parquet` plus the `_last_checkpoint`
 * pointer, idempotently — the analog of `CHECKPOINT tbl`
 * (reference src/storage/delta_transaction_manager.cpp:54-74; test
 * test/sql/main/writing/checkpoint.test:28-56).
 */
object Checkpoints {

  /** Write a checkpoint at the snapshot's version. Idempotent: re-running
    * at the same version overwrites the same content. */
  def checkpoint(log: DeltaLog): Long = {
    val snap = log.update()
    writeCheckpoint(log, snap)
    snap.version
  }

  def writeCheckpoint(log: DeltaLog, snap: Snapshot): Unit = {
    val spark = log.spark
    val actions: Seq[Action] =
      Seq(Action(snap.protocol), Action(snap.metadata)) ++
        snap.setTransactions.map { case (app, v) =>
          Action(SetTransaction(app, v, None)) }.toSeq ++
        snap.domainMetadata.map(Action(_)) ++
        snap.allFiles.map(Action(_))

    val target = log.checkpointFile(snap.version)
    val tmpDir = new Path(log.logPath, s".cptmp-${java.util.UUID.randomUUID}")
    val ds = spark.createDataset(actions)(Encoders.product[Action])
    // single file: checkpoint state is O(#files) metadata, written once
    ds.repartition(1).write.mode(SaveMode.Overwrite).parquet(tmpDir.toString)
    val fs = log.fs
    val part = fs.listStatus(tmpDir).map(_.getPath)
      .find(p => p.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"No checkpoint part file in $tmpDir"))
    fs.delete(target, false)
    if (!fs.rename(part, target))
      throw new IllegalStateException(s"Failed to move checkpoint to $target")
    fs.delete(tmpDir, true)
    LogStore.overwrite(fs, new Path(log.logPath, "_last_checkpoint"),
      s"""{"version":${snap.version},"size":${actions.size}}""")
  }
}
