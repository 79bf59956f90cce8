package graft.delta

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate}
import org.apache.spark.sql.functions.{col, lit, sum}

/**
 * Checkpoint-backed snapshot for VERY large tables (10⁶-10⁷ add actions —
 * the shape of a real 100 TB table): the file list stays in the checkpoint
 * parquet as a typed Dataset and is never fully materialized on the driver
 * for scans. Planning ships the stats-skipping keeper and the partition
 * predicate to executors and collects only the surviving AddFiles — the
 * driver's memory is O(#matching files), not O(#table files).
 *
 * The small post-checkpoint JSON tail is reconciled driver-side exactly
 * like the eager path: a tail add SHADOWS the checkpoint entry for its
 * path, a tail remove deletes it.
 *
 * Maintenance operations (OPTIMIZE, VACUUM, listFiles, DV registry) still
 * use [[allFiles]], which materializes lazily — they are O(#files) by
 * nature. `delta-kernel`-style engines make the same split: scans stream
 * the checkpoint, maintenance reads it whole.
 */
/** (decodedPath, descriptor) projection row for the distributed DV
  * registry collect. */
private[delta] final case class DvRegPair(
    p: String, dv: Option[DeletionVectorDescriptor])

private[graft] class LazySnapshot(
    log: DeltaLog,
    version: Long,
    protocol: Protocol,
    metadata: Metadata,
    checkpointPaths: Seq[Path],
    tailAdds: Seq[AddFile],
    tailRemovedPaths: Set[String],
    setTransactions: Map[String, Long],
    domainMetadata: Seq[DomainMetadata],
    tailRemoves: Seq[RemoveFile] = Nil)
  extends Snapshot(log, version, protocol, metadata, Nil,
    setTransactions, domainMetadata, tailRemoves) {

  @transient private lazy val addEncoder = Encoders.product[AddFile]

  /** This lazy snapshot with extra commits folded on top (in order) — the
    * `log_tail` read path for checkpoint-backed tables. Keeps the file
    * list in the checkpoint Dataset: only the (small) extra-tail file
    * actions reconcile driver-side, exactly like the JSON tail at build
    * time. A `LogReplay.fromSnapshot` here would instead call [[allFiles]]
    * and materialize 10⁶+ adds on the driver — the exact scenario
    * `log_tail` exists for (catalog-served commits on large tables). */
  private[delta] def withExtraTail(newVersion: Long,
      commits: Seq[Seq[Action]]): LazySnapshot = {
    import scala.collection.mutable
    val replay = new LogReplay
    replay.protocol = protocol
    replay.metadata = metadata
    replay.txns ++= setTransactions
    domainMetadata.foreach(d => replay.domains.put(d.domain, d))
    val adds = new mutable.LinkedHashMap[String, AddFile]
    tailAdds.foreach(f => adds.put(f.decodedPath, f))
    val shadowed = mutable.Set.empty[String] ++ tailRemovedPaths
    val removes = new mutable.LinkedHashMap[String, RemoveFile]
    tombstones.foreach(r => removes.put(r.decodedPath, r))
    commits.flatten.foreach { a =>
      a.add.foreach { f =>
        adds.put(f.decodedPath, f); shadowed += f.decodedPath
        removes.remove(f.decodedPath) // re-add resurrects
      }
      a.remove.foreach { r =>
        adds.remove(r.decodedPath); shadowed += r.decodedPath
        removes.put(r.decodedPath, r)
      }
      replay.apply(a.copy(add = None, remove = None))
    }
    ProtocolGate.validate(replay.protocol, log.tablePath.toString)
    new LazySnapshot(log, newVersion, replay.protocol, replay.metadata,
      checkpointPaths, adds.values.toSeq, shadowed.toSet,
      replay.txns.toMap, replay.domains.values.toVector,
      removes.values.toVector)
  }

  /** Typed adds Dataset: checkpoint adds (columns aligned to the AddFile
    * encoder, absent optionals null-filled) minus tail-shadowed paths,
    * plus the tail's own adds. */
  @transient private[graft] lazy val addsDataset: Dataset[AddFile] = {
    val spark = log.spark
    val df0 = spark.read.parquet(checkpointPaths.map(_.toString): _*)
      .where(col("add").isNotNull).select("add.*")
    // foreign struct-form stats (writeStatsAsStruct, JSON form absent):
    // render back to the JSON string so file skipping keeps pruning —
    // same restoration DeltaLog.restoreParsedStructs does on the eager path
    val df1 =
      if (!df0.columns.contains("stats_parsed")) df0
      else {
        val rendered = org.apache.spark.sql.functions.to_json(col("stats_parsed"))
        if (df0.columns.contains("stats"))
          df0.withColumn("stats", org.apache.spark.sql.functions.coalesce(col("stats"), rendered))
        else df0.withColumn("stats", rendered)
      }
    // ... and the partitionValues_parsed struct form likewise (a foreign
    // struct-stats checkpoint may carry partition values ONLY as the typed
    // struct; null-filling them would break constant injection + pruning)
    val df =
      if (!df1.columns.contains("partitionValues_parsed")) df1
      else {
        import org.apache.spark.sql.functions.{coalesce, from_json, to_json}
        import org.apache.spark.sql.types.{MapType, StringType}
        val rendered = from_json(
          to_json(col("partitionValues_parsed"), Map("ignoreNullFields" -> "false")),
          MapType(StringType, StringType))
        if (df1.columns.contains("partitionValues"))
          df1.withColumn("partitionValues", coalesce(col("partitionValues"), rendered))
        else df1.withColumn("partitionValues", rendered)
      }
    val aligned = df.select(addEncoder.schema.fields.toIndexedSeq.map { f =>
      if (df.columns.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    val removed = tailRemovedPaths // small; serialized into the closure
    val base = aligned.as[AddFile](addEncoder)
      .filter((f: AddFile) => !removed.contains(f.decodedPath))
    if (tailAdds.isEmpty) base
    else base.union(spark.createDataset(tailAdds)(addEncoder))
  }

  /** Diagnostics: whether a full driver-side materialization ever happened
    * (scans should never trigger one). */
  @volatile private[graft] var materializedFull: Boolean = false

  /** DML's per-file facts come straight from the checkpoint-backed
    * Dataset — a DELETE on a 10⁶-file table never collects the list. */
  override private[delta] def filesDataset: Dataset[AddFile] = addsDataset

  /** DV registry input as a distributed projection collect: descriptor
    * pairs only, never the stats-bearing AddFiles. */
  override private[delta] def dvRegistryPairs
      : Seq[(String, Option[DeletionVectorDescriptor])] =
    addsDataset.mapPartitions(
      _.map(f => DvRegPair(f.decodedPath, f.deletionVector)))(
      Encoders.product[DvRegPair]).collect().toSeq.map(e => (e.p, e.dv))

  override lazy val allFiles: Seq[AddFile] = {
    materializedFull = true
    addsDataset.collect().toSeq
  }

  override lazy val fileCount: Long = addsDataset.count()

  override lazy val sizeInBytes: Long =
    addsDataset.agg(sum(col("size"))).collect()(0).getLong(0)

  /** Distributed Σ numRecords: (sum, files-without-stats) per partition. */
  override lazy val numRecordsEstimate: Option[Long] = {
    val (total, missing) = addsDataset
      .mapPartitions { it =>
        var s = 0L; var miss = 0L
        it.foreach(f => f.parsedStats.flatMap(_.numRecords) match {
          case Some(n) => s += n
          case None => miss += 1
        })
        Iterator((s, miss))
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .collect().foldLeft((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b + d) }
    if (missing == 0) Some(total) else None
  }

  override lazy val hasDeletionVectors: Boolean =
    !addsDataset.filter((f: AddFile) => f.deletionVector.isDefined).isEmpty

  /** Distributed grouped live counts: executor-side partial sums keyed by
    * the escaped partition tuple, merged on the driver — partials are
    * O(#distinct tuples), never the file list. */
  override private[delta] def partitionLiveFacts(keys: Seq[String])
      : Option[Seq[(Seq[String], Long)]] = {
    val fn = ColumnFacts.partitionLiveRow(keys) _
    val partials = addsDataset.mapPartitions { it =>
      var bail = false
      val acc = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      // short-circuit on bail: no point decoding the rest of a 10⁶-add
      // checkpoint partition just to emit the sentinel
      while (it.hasNext && !bail) {
        fn(it.next()) match {
          case None => bail = true
          case Some((vals, live)) =>
            val k = ColumnFacts.encodeKey(vals)
            acc.update(k, acc.getOrElse(k, 0L) + live)
        }
      }
      if (bail) Iterator((null: String, 0L))
      else acc.iterator.map { case (k, v) => (k, v) }
    }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong)).collect()
    if (partials.exists(_._1 == null)) return None
    val acc = scala.collection.mutable.LinkedHashMap.empty[Seq[String], Long]
    partials.foreach { case (k, v) =>
      val vals = ColumnFacts.decodeKey(k)
      acc.update(vals, acc.getOrElse(vals, 0L) + v)
    }
    Some(acc.toSeq)
  }

  /** Distributed per-partition fold of the metadata MIN/MAX/COUNT(col)
    * contributions; partial extremes cross the wire as round-trip strings
    * (one small job instead of an O(#files) driver materialization). */
  override private[delta] def exactColumnFacts(key: String, isPartition: Boolean,
      dt: org.apache.spark.sql.types.DataType,
      needExtremes: Boolean): Option[(Long, Any, Any)] = {
    val fn = ColumnFacts.fileFacts(key, isPartition, dt, needExtremes) _
    val partials = addsDataset.mapPartitions { it =>
      val fold = new ColumnFacts.Fold(dt)
      while (it.hasNext && !fold.bailed) fold.add(fn(it.next()))
      Iterator(fold.result match {
        case None => (1L, 0L, null: String, null: String)
        case Some((c, mn, mx)) =>
          (0L, c, ColumnFacts.encode(dt, mn), ColumnFacts.encode(dt, mx))
      })
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.STRING, Encoders.STRING)).collect()
    val fold = new ColumnFacts.Fold(dt)
    partials.foreach { case (bail, c, mn, mx) =>
      fold.add(if (bail != 0L) None
        else Some((c, ColumnFacts.decode(dt, mn), ColumnFacts.decode(dt, mx))))
    }
    fold.result
  }

  override lazy val exactRowCount: Option[Long] = {
    val (total, missing) = addsDataset
      .mapPartitions { it =>
        var s = 0L; var miss = 0L
        it.foreach { f =>
          f.parsedStats.flatMap(_.numRecords) match {
            case Some(n) => s += n - f.deletionVector.map(_.cardinality).getOrElse(0L)
            case None => miss += 1
          }
        }
        Iterator((s, miss))
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .collect().foldLeft((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b + d) }
    if (missing == 0) Some(total) else None
  }

  override private[graft] def scanCandidates(
      statsKeeper: Option[AddFile => Boolean],
      partitionBound: Option[Expression]): Seq[AddFile] = {
    if (statsKeeper.isEmpty && partitionBound.isEmpty)
      // unfiltered scan: the full list is needed for PartitionDirectory
      // construction either way — same cost every FileIndex pays
      return allFiles
    val pSchema = physicalPartitionSchema // local copies: never capture `this`
    val keep = statsKeeper
    val bound = partitionBound
    addsDataset.mapPartitions { it =>
      val pred = bound.map(Predicate.createInterpreted)
      it.filter { f =>
        keep.forall(_(f)) &&
          pred.forall(_.eval(PartitionUtil.internalRow(f.partitionValues, pSchema)))
      }
    }(addEncoder).collect().toSeq
  }
}
