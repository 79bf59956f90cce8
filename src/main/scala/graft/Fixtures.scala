package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.delta.{Checkpoints, DeltaLog, DeltaWriter}

/**
 * Deterministic Delta-table fixtures derived from the driver's parquet
 * testdata (TESTDATA.md), mirroring the reference's generated-table corpus
 * (reference scripts/data_generator/generate_test_data.py): plain,
 * multi-commit (+checkpoint), and partitioned variants. The original
 * parquet stays the correctness oracle — the DAT delta-vs-parquet pattern
 * (reference test/sql/dat/all.test:13-287).
 *
 * Fixtures are cached under /tmp keyed by (generation, sf dir, table,
 * variant); creation is idempotent and guarded by a marker file.
 */
object Fixtures {
  /** Bump when the writer's on-disk output changes shape. */
  private val GEN = "g6" // g6: core-floor on fixture file count (CPU-dense text)

  sealed trait Variant { def name: String }
  /** Single commit, 4 range-partitioned files (stats-skipping friendly). */
  case object Plain extends Variant { val name = "plain" }
  /** Three commits split by `splitCol % 3` with idempotent txn ids,
    * checkpoint after commit 1. */
  case object Multi extends Variant { val name = "multi" }
  /** Hive-partitioned by the table's partition column. */
  case object Part extends Variant { val name = "part" }
  /** Plain + DELETE of `splitCol % 10 = 7` via deletion vectors. */
  case object Dv extends Variant { val name = "dv" }
  /** Two commits; the second adds column `bonus = splitCol % 7`
    * via mergeSchema (old files read as null). */
  case object Evolve extends Variant { val name = "evolve" }
  /** Column mapping (name mode): physical parquet names differ from the
    * logical schema. Read-only per the reference. */
  case object Mapped extends Variant { val name = "mapped" }
  /** Column mapping (id mode): parquet columns carry `parquet.field.id`s
    * and their NAMES differ from the mapped physicalName, so only field-id
    * resolution reads them correctly (reference
    * test/sql/generated/column_mapping_id_mode.test). Read-only. */
  case object MappedId extends Variant { val name = "mappedid" }
  /** 40 append commits (checkpoint at 20) — snapshot-replay stress, the
    * analog of the reference's tpch_sf1_90commits micro-benchmark
    * (benchmark/micro/snapshot_performance). */
  case object Many extends Variant { val name = "many40" }

  /** The reference's snapshot_performance table shape
    * (benchmark/micro/snapshot_performance/ benchmarks, built over
    * `tpch_sf1_90commits/lineitem`): 90 plain JSON commits, NO
    * checkpoint — the log-replay cost IS what the micro measures. Each
    * commit carries the `splitCol % 90 == i` slice, so the commits
    * partition the source exactly and count(*) equals the base table. */
  case object Many90 extends Variant { val name = "many90" }
  /** Type widening (reference test/sql/generated/schema_evolution.test:11-37):
    * first commit writes the split column as INT32; a mergeSchema append
    * widens it to LONG — old files must read under the widened schema. */
  case object Widen extends Variant { val name = "widen" }
  /** VARIANT column STORED in the table (reference
    * test/sql/inlined/variant/basic.test:16-43, delta_utils.cpp:707-716):
    * `payload` is a parsed-JSON variant column written to parquet. */
  case object VariantV extends Variant { val name = "variant" }
  /** Change-data-feed table (reference test/sql/dat/all.test:197-206):
    * `delta.enableChangeDataFeed` set, a `_change_data/` dir with a change
    * parquet, and a `cdc` log action — plain reads ignore both. */
  case object Cdf extends Variant { val name = "cdf" }
  /** Plain-shaped clone DEDICATED to the DML bench row (`delta_dv_delete`):
    * each invocation RESTOREs it to version 0 and re-deletes, so no other
    * query may share it. Auto-checkpointing off — repeated restore/delete
    * pairs must not pay a checkpoint mid-measurement. */
  case object DmlArena extends Variant { val name = "dmlarena" }

  private case class Spec(splitCol: String, rangeCol: String, partCol: String)
  private val specs: Map[String, Spec] = Map(
    "lineitem" -> Spec("l_orderkey", "l_orderkey", "l_returnflag"),
    "orders" -> Spec("o_orderkey", "o_orderkey", "o_orderpriority"),
    "customer" -> Spec("c_custkey", "c_custkey", "c_mktsegment"),
    "documents" -> Spec("doc_id", "doc_id", "lang"),
    "embeddings" -> Spec("vec_id", "vec_id", "label"),
    "events" -> Spec("event_id", "event_id", "event_type"),
    "part" -> Spec("p_partkey", "p_partkey", "p_brand"),
    "supplier" -> Spec("s_suppkey", "s_suppkey", "s_nationkey"),
    "nation" -> Spec("n_nationkey", "n_nationkey", "n_regionkey"),
    "region" -> Spec("r_regionkey", "r_regionkey", "r_name"))

  def parquetPath(sfDir: String, table: String): String =
    s"${sfDir.stripSuffix("/")}/$table.parquet"

  def readParquet(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(parquetPath(sfDir, table))

  /** Source read with engine-side normalization: `events.ts` is parquet
    * TIMESTAMP(NANOS) which Spark cannot represent — read as long
    * (nanosAsLong) and convert to a micros timestamp losslessly (the
    * testdata carries micro precision only). */
  def readNormalized(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Exception => () }
    val df = readParquet(spark, sfDir, table)
    if (table == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Parquet isAdjustedToUTC=false surfaces as TIMESTAMP_NTZ, which
        // watermarks/windows reject. Session TZ is pinned to UTC
        // everywhere in this project, so the cast is lossless.
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
    else df
  }

  private def fixtureRoot: String =
    sys.props.getOrElse("graft.fixture.dir", "/tmp/graft-fixtures")

  private def dirFor(sfDir: String, table: String, variant: Variant): String = {
    val sfKey = sfDir.stripSuffix("/").replaceAll("[^A-Za-z0-9.]", "_")
    s"$fixtureRoot/$GEN/$sfKey/${table}_${variant.name}"
  }

  /** Path to the Delta fixture, building it on first use. */
  def delta(spark: SparkSession, sfDir: String, table: String,
      variant: Variant = Plain): String = synchronized {
    val dir = dirFor(sfDir, table, variant)
    val marker = Paths.get(dir, "_GRAFT_READY")
    if (Files.exists(marker)) {
      if (variant == DmlArena) maybeCompactArenaLog(spark, dir)
      return dir
    }
    // wipe partial builds
    val dirPath = Paths.get(dir)
    if (Files.exists(dirPath)) {
      import scala.jdk.CollectionConverters._
      Files.walk(dirPath).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
    DeltaLog.clearCache()
    val spec = specs.getOrElse(table,
      throw new IllegalArgumentException(s"No fixture spec for table $table"))
    val src = readNormalized(spark, sfDir, table)
    // File count must scale with data: a fixed 4 files means a 100 MB+
    // table scans as ~4 tasks and 28 of 32 cores idle (the x10 bench
    // measured exactly this). Two floors compose:
    //  - one file per ~24 MB of source, so big tables never under-split;
    //  - once a table carries real data (≥256 KB/core), at least one file
    //    per core. Bytes-on-disk underestimates CPU density — snappy text
    //    (documents/events) expands ~5-10× and pays regex/char-scan work
    //    per row, so a 17 MB corpus capped at 4 files ran 7 tasks on 32
    //    cores while DuckDB used all 32 threads (x30 bench, r6's
    //    "superlinear" text row was partly this starvation + stragglers).
    // A real 100 TB table would target 128 MB-1 GB files the same way —
    // there file count never caps parallelism; only this small-fixture
    // regime needs the core floor.
    def nFiles: Int = {
      import scala.jdk.CollectionConverters._
      val bytes = try {
        val p = Paths.get(parquetPath(sfDir, table))
        if (Files.isDirectory(p))
          Files.list(p).iterator().asScala.map(f => Files.size(f)).sum
        else Files.size(p)
      } catch { case _: Exception => 0L }
      val cores = spark.sparkContext.defaultParallelism
      val coreFloor = math.min(cores, (bytes / (256L << 10)).toInt + 1)
      val sizeFloor = math.min(64, (bytes / (24L << 20)).toInt + 1)
      math.max(4, math.max(coreFloor, sizeFloor))
    }
    variant match {
      case Plain =>
        DeltaWriter.append(spark, src.repartitionByRange(nFiles, col(spec.rangeCol)), dir)
      case DmlArena =>
        DeltaWriter.append(spark,
          src.repartitionByRange(nFiles, col(spec.rangeCol)), dir,
          configuration = Map("delta.checkpointInterval" -> "0"))
      case Multi =>
        for (i <- 0 to 2) {
          val slice = src.filter(col(spec.splitCol) % 3 === i)
            .repartitionByRange(2, col(spec.rangeCol))
          DeltaWriter.append(spark, slice, dir,
            txnAppId = Some("fixture-loader"), txnVersion = Some(i.toLong))
          if (i == 1) Checkpoints.checkpoint(DeltaLog.forPath(spark, dir))
        }
      case Part =>
        DeltaWriter.append(spark, src, dir, partitionBy = Seq(spec.partCol))
      case Dv =>
        DeltaWriter.append(spark, src.repartitionByRange(4, col(spec.rangeCol)), dir)
        graft.delta.DeltaTable.forPath(spark, dir)
          .delete(col(spec.splitCol) % 10 === 7)
      case Evolve =>
        DeltaWriter.append(spark, src.filter(col(spec.splitCol) % 2 === 0), dir)
        DeltaWriter.append(spark,
          src.filter(col(spec.splitCol) % 2 === 1)
            .withColumn("bonus", col(spec.splitCol) % 7),
          dir, mergeSchema = true)
      case Mapped => buildMapped(spark, src, dir)
      case MappedId => buildMappedId(spark, src, dir)
      case Widen =>
        DeltaWriter.append(spark,
          src.filter(col(spec.splitCol) % 2 === 0)
            .withColumn(spec.splitCol, col(spec.splitCol).cast("int"))
            .repartitionByRange(2, col(spec.rangeCol)), dir)
        DeltaWriter.append(spark,
          src.filter(col(spec.splitCol) % 2 === 1)
            .repartitionByRange(2, col(spec.rangeCol)),
          dir, mergeSchema = true)
      case VariantV =>
        val v = src.select(col("doc_id"),
          expr("parse_json(to_json(struct(lang, n_chars)))").as("payload"))
        DeltaWriter.append(spark, v.repartitionByRange(2, col("doc_id")), dir)
      case Cdf => buildCdf(spark, src, dir, spec)
      case Many =>
        for (i <- 0 until 40) {
          // auto-checkpointing off: this fixture's POINT is a long JSON
          // tail after one manual checkpoint (full-replay oracle)
          DeltaWriter.append(spark, src.coalesce(1), dir,
            configuration =
              if (i == 0) Map("delta.checkpointInterval" -> "0") else Map.empty)
          if (i == 19) Checkpoints.checkpoint(DeltaLog.forPath(spark, dir))
        }
      case Many90 =>
        for (i <- 0 until 90) {
          DeltaWriter.append(spark,
            src.filter(col(spec.splitCol) % 90 === i).coalesce(1), dir,
            configuration =
              if (i == 0) Map("delta.checkpointInterval" -> "0") else Map.empty)
        }
    }
    Files.createFile(marker)
    dir
  }

  /** Bound the DML arena's log replay: every `delta_dv_delete` invocation
    * appends restore+delete commits with auto-checkpointing OFF, so a
    * long-lived cached arena would otherwise replay an ever-growing JSON
    * tail INSIDE the timed row — monotonic drift the bench's evidence pass
    * would misread as a plan regression. A manual checkpoint every ~24
    * commits keeps latest-snapshot builds bounded, runs on fixture
    * ACQUISITION (usually the warm pass; min-of-rounds absorbs a stray
    * timed hit), and leaves the young pre-checkpoint JSONs in place so
    * `restore(0)` keeps replaying v0 directly. */
  private def maybeCompactArenaLog(spark: SparkSession, dir: String): Unit =
    try {
      val log = DeltaLog.forPath(spark, dir)
      val v = log.update().version
      if (v - log.lastCheckpointVersion().getOrElse(0L) > 24)
        Checkpoints.checkpoint(log)
    } catch { case e: Exception =>
      // visible, not fatal: a persistently failing compaction re-enables
      // the unbounded-JSON-tail drift inside the timed delta_dv_delete row
      System.err.println(
        s"[fixtures] arena log compaction failed for $dir: ${e.getMessage}")
    }

  /** CDF table: enableChangeDataFeed property, then a fabricated
    * UPDATE-style commit carrying a `cdc` action pointing into
    * `_change_data/` — exactly what a CDF writer leaves behind. Snapshot
    * replay must ignore the cdc action and never list change files. */
  private def buildCdf(spark: SparkSession, src: DataFrame, dir: String,
      spec: Spec): Unit = {
    DeltaWriter.append(spark, src.filter(col(spec.splitCol) % 2 === 0), dir,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    DeltaWriter.append(spark, src.filter(col(spec.splitCol) % 2 === 1), dir)
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    val cdDir = new org.apache.hadoop.fs.Path(dir, "_change_data")
    src.limit(3).withColumn("_change_type", lit("update_postimage"))
      .coalesce(1).write.mode("overwrite").parquet(cdDir.toString)
    val cdcFile = log.fs.listStatus(cdDir).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val cdcLine =
      s"""{"cdc":{"path":"_change_data/${cdcFile.getName}","partitionValues":{},""" +
        s""""size":${log.fs.getFileStatus(cdcFile).getLen},"dataChange":false}}"""
    val ci = graft.delta.ActionJson.toJson(graft.delta.Action(
      graft.delta.CommitInfo(System.currentTimeMillis(), "UPDATE")))
    graft.delta.LogStore.write(log.fs, log.commitFile(snap.version + 1),
      ci + "\n" + cdcLine + "\n")
    log.invalidateCache()
  }

  /** Column-mapped table: data written under physical names, then a
    * metaData commit maps them to the logical schema (name mode). */
  private def buildMapped(spark: SparkSession, src: DataFrame, dir: String): Unit = {
    import org.apache.spark.sql.types._
    val logicalFields = src.schema.fields
    val physNames = logicalFields.indices.map(i => s"col-${i}-phys")
    val physical = src.toDF(physNames: _*)
    DeltaWriter.append(spark, physical, dir)
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    val mappedSchema = StructType(logicalFields.zipWithIndex.map { case (f, i) =>
      f.copy(name = f.name, metadata = new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", physNames(i))
        .putLong("delta.columnMapping.id", i + 1L).build())
    })
    val actions = Seq(
      graft.delta.Action(graft.delta.CommitInfo(
        System.currentTimeMillis(), "UPGRADE COLUMN MAPPING")),
      graft.delta.Action(snap.metadata.copy(
        schemaString = mappedSchema.json,
        configuration = snap.metadata.configuration +
          ("delta.columnMapping.mode" -> "name"))))
    graft.delta.LogStore.write(log.fs, log.commitFile(snap.version + 1),
      actions.map(graft.delta.ActionJson.toJson).mkString("", "\n", "\n"))
    log.invalidateCache()
  }

  /** Id-mode column-mapped table: parquet written with `parquet.field.id`s
    * under names that do NOT match the mapped physicalName — reads succeed
    * only through field-id resolution, never name matching. */
  private def buildMappedId(spark: SparkSession, src: DataFrame, dir: String): Unit = {
    import org.apache.spark.sql.types._
    val logicalFields = src.schema.fields
    val pqNames = logicalFields.indices.map(i => s"pq_$i")
    val withIds = src.select(logicalFields.zipWithIndex.map { case (f, i) =>
      col(s"`${f.name}`").as(pqNames(i), new MetadataBuilder()
        .putLong("parquet.field.id", i + 1L).build())
    }.toIndexedSeq: _*)
    // this fixture write predates the mapping commit (the table isn't
    // id-mode yet), so the writer can't know to stamp field ids — enable
    // the conf for just this write and restore the previous value
    val fieldIdKey = "spark.sql.parquet.fieldId.write.enabled"
    val prev = spark.conf.getOption(fieldIdKey)
    spark.conf.set(fieldIdKey, "true")
    try DeltaWriter.append(spark, withIds, dir)
    finally prev match {
      case Some(v) => spark.conf.set(fieldIdKey, v)
      case None => spark.conf.unset(fieldIdKey)
    }
    val log = DeltaLog.forPath(spark, dir)
    val snap = log.update()
    val mappedSchema = StructType(logicalFields.zipWithIndex.map { case (f, i) =>
      f.copy(metadata = new MetadataBuilder()
        .putString("delta.columnMapping.physicalName", s"col-$i-phys")
        .putLong("delta.columnMapping.id", i + 1L).build())
    })
    val actions = Seq(
      graft.delta.Action(graft.delta.CommitInfo(
        System.currentTimeMillis(), "UPGRADE COLUMN MAPPING")),
      graft.delta.Action(snap.metadata.copy(
        schemaString = mappedSchema.json,
        configuration = snap.metadata.configuration +
          ("delta.columnMapping.mode" -> "id"))))
    graft.delta.LogStore.write(log.fs, log.commitFile(snap.version + 1),
      actions.map(graft.delta.ActionJson.toJson).mkString("", "\n", "\n"))
    log.invalidateCache()
  }
}
