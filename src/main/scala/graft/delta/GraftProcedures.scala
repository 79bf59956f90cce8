package graft.delta

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * SQL `CALL` surface for table maintenance — the Spark-4 ProcedureCatalog
 * SPI (the idiomatic DSv2 path; delta-spark exposes the same operations
 * through a custom parser instead). SQL-only users run
 *
 * {{{
 *   CALL graft.optimize(`table` => '/path/or/name')
 *   CALL graft.zorder('/p', 'colA,colB')
 *   CALL graft.vacuum('/p', retention_ms => 0, force => true)
 *   CALL graft.restore('/p', 3)
 *   CALL graft.clone('/src', '/dst')
 *   CALL graft.checkpoint('/p')
 * }}}
 *
 * Each call returns a one-row result set describing what the commit did.
 * `table` accepts an attached name ([[GraftCatalog.attach]]) or a path —
 * the same resolution as `graft.<name>` table references.
 */
private[delta] object GraftProcedures {

  /** (procedure name → factory); the factory gets the owning session and a
    * name→path resolver. */
  def load(name: String, spark: => SparkSession,
      resolve: String => String): Option[UnboundProcedure] = {
    def log(t: String): DeltaLog = DeltaLog.forPath(spark, resolve(t))
    val resultSchema = StructType(Seq(
      StructField("version", LongType),
      StructField("files_removed", IntegerType),
      StructField("files_added", IntegerType)))
    def resultRow(r: Optimize.Result): InternalRow =
      new GenericInternalRow(Array[Any](r.version, r.filesRemoved, r.filesAdded))

    name.toLowerCase match {
      case "optimize" => Some(proc("optimize",
        "Bin-pack small files and purge deletion vectors " +
          "(optional `where` partition predicate bounds the rewrite)",
        Seq(in("table", StringType),
          in("small_file_threshold", LongType, Some((32L * 1024 * 1024).toString)),
          // default must PARSE as a SQL expression ('' is an empty
          // statement → analyzer error on every call that omits it)
          in("where", StringType, Some("NULL"))),
        resultSchema,
        args => {
          val whereStr = Option(args.getStringOrNull(2)).getOrElse("")
          resultRow(Optimize.compact(spark, log(args.getString(0)),
            smallFileThreshold = args.getLong(1),
            where = Option(whereStr).map(_.trim).filter(_.nonEmpty)
              .map(org.apache.spark.sql.functions.expr)))
        }))
      case "zorder" => Some(proc("zorder",
        "Rewrite the table clustered on the Morton interleave of `columns`",
        Seq(in("table", StringType), in("columns", StringType)),
        resultSchema,
        args => resultRow(Optimize.zorder(spark, log(args.getString(0)),
          args.getString(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq))))
      case "set_transaction_version" => Some(proc("set_transaction_version",
        "Record an application's transaction version (idempotency CAS): " +
          "with expected_version set (or expected_none => true), errors " +
          "unless the table currently records exactly that",
        Seq(in("table", StringType), in("app_id", StringType),
          in("version", LongType),
          in("expected_version", LongType, Some("NULL")),
          in("expected_none", BooleanType, Some("false"))),
        StructType(Seq(StructField("commit_version", LongType))),
        args => {
          val expected: Option[Option[Long]] =
            if (args.getBoolean(4)) Some(None)
            else args.getLongOrNull(3).map(v => Some(v))
          val l = log(args.getString(0))
          new GenericInternalRow(Array[Any](
            DeltaTable.forPath(spark, l.tablePath.toString)
              .setTransactionVersion(args.getString(1), args.getLong(2), expected)))
        }))
      case "cluster_by" => Some(proc("cluster_by",
        "ALTER TABLE ... CLUSTER BY: record liquid-clustering columns " +
          "(empty string = CLUSTER BY NONE)",
        Seq(in("table", StringType), in("columns", StringType)),
        StructType(Seq(StructField("version", LongType))),
        args => new GenericInternalRow(Array[Any](
          Clustering.clusterBy(spark, log(args.getString(0)),
            args.getString(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq)))))
      case "optimize_cluster" => Some(proc("optimize_cluster",
        "Rewrite data files clustered on the table's recorded clustering columns",
        Seq(in("table", StringType)),
        resultSchema,
        args => resultRow(Clustering.optimize(spark, log(args.getString(0))))))
      case "vacuum" => Some(proc("vacuum",
        "Delete unreferenced data files older than the retention window " +
          "(dry_run => true lists reclaimable counts without deleting)",
        Seq(in("table", StringType),
          in("retention_ms", LongType, Some(Optimize.MinRetentionMs.toString)),
          in("force", BooleanType, Some("false")),
          in("dry_run", BooleanType, Some("false"))),
        StructType(Seq(StructField("files_deleted", IntegerType),
          StructField("bytes_reclaimed", LongType))),
        args => {
          val r = Optimize.vacuum(spark, log(args.getString(0)),
            retentionMs = args.getLong(1), force = args.getBoolean(2),
            dryRun = args.getBoolean(3))
          new GenericInternalRow(Array[Any](r.filesDeleted, r.bytesReclaimed))
        }))
      case "restore" => Some(proc("restore",
        "Roll the table back to an earlier version's exact state",
        Seq(in("table", StringType), in("version", LongType)),
        resultSchema,
        args => resultRow(Optimize.restore(spark, log(args.getString(0)),
          args.getLong(1)))))
      case "clone" => Some(proc("clone",
        "Shallow-clone the table to `target` (zero data copied)",
        Seq(in("table", StringType), in("target", StringType)),
        resultSchema,
        args => resultRow(Optimize.shallowClone(spark, log(args.getString(0)),
          args.getString(1)))))
      case "checkpoint" => Some(proc("checkpoint",
        "Write a checkpoint parquet for the current version",
        Seq(in("table", StringType)),
        StructType(Seq(StructField("version", LongType))),
        args => new GenericInternalRow(
          Array[Any](Checkpoints.checkpoint(log(args.getString(0)))))))
      case "generate" => Some(proc("generate",
        "GENERATE symlink_format_manifest analog for external readers",
        Seq(in("table", StringType)),
        StructType(Seq(StructField("manifests_written", IntegerType))),
        args => new GenericInternalRow(Array[Any](
          DeltaTable.forPath(spark, log(args.getString(0)).tablePath.toString)
            .generateSymlinkManifest()))))
      case "detail" => Some(procRows("detail",
        "Table-level facts (DESCRIBE DETAIL analog): layout, size, protocol",
        Seq(in("table", StringType)),
        StructType(Seq(
          StructField("location", StringType),
          StructField("version", LongType),
          StructField("num_files", LongType),
          StructField("size_in_bytes", LongType),
          StructField("partition_columns", StringType),
          StructField("min_reader_version", IntegerType),
          StructField("min_writer_version", IntegerType))),
        args => {
          val l = log(args.getString(0))
          val s = l.update()
          val files = s.allFiles
          Array[InternalRow](new GenericInternalRow(Array[Any](
            UTF8String.fromString(l.tablePath.toString),
            s.version, files.size.toLong, files.map(_.size).sum,
            UTF8String.fromString(s.metadata.partitionColumns.mkString(",")),
            s.protocol.minReaderVersion, s.protocol.minWriterVersion)))
        }))
      case "history" => Some(procRows("history",
        "Commit history (DESCRIBE HISTORY analog): one row per commit",
        Seq(in("table", StringType)),
        StructType(Seq(
          StructField("version", LongType),
          StructField("timestamp", LongType),
          StructField("operation", StringType),
          StructField("engine_info", StringType),
          StructField("operation_metrics", StringType))),
        args => log(args.getString(0)).commitHistory().map {
          case (v, ts, op, engine, metrics) =>
            val mj = ActionJson.mapper.createObjectNode()
            metrics.toSeq.sortBy(_._1).foreach { case (k, x) => mj.put(k, x) }
            new GenericInternalRow(Array[Any](v, ts,
              UTF8String.fromString(op),
              UTF8String.fromString(engine),
              UTF8String.fromString(
                ActionJson.mapper.writeValueAsString(mj)))): InternalRow
        }.toArray))
      // the reference's test utilities (util_functions.cpp:12-43 write_blob,
      // delta_macros.cpp FILE_COPY_MACRO copy_dir) — here through Hadoop FS,
      // so unlike the reference's LocalFileSystem TODO they work against any
      // configured object store. They give any SQL caller arbitrary
      // filesystem write/overwrite, so — like the reference, which loads
      // its macros only in the test harness — they resolve only when the
      // JVM itself was launched with -Dgraft.testUtilities=true.
      case "write_blob" if testUtilities => Some(proc("write_blob",
        "Write a binary blob to a file (parent dirs created); test utility",
        Seq(in("path", StringType), in("content", BinaryType)),
        StructType(Seq(StructField("success", BooleanType))),
        args => {
          val p = new org.apache.hadoop.fs.Path(args.getString(0))
          val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
          val out = fs.create(p, true)
          try out.write(args.getBinary(1)) finally out.close()
          new GenericInternalRow(Array[Any](true))
        }))
      case "copy_dir" if testUtilities => Some(proc("copy_dir",
        "Recursively copy a directory (test utility backing fixture clones)",
        Seq(in("src", StringType), in("dst", StringType)),
        StructType(Seq(StructField("files_copied", IntegerType))),
        args => {
          val src = new org.apache.hadoop.fs.Path(args.getString(0))
          val dst = new org.apache.hadoop.fs.Path(args.getString(1))
          val conf = spark.sessionState.newHadoopConf()
          val sfs = src.getFileSystem(conf)
          val dfs = dst.getFileSystem(conf)
          // count BEFORE copying — the count must not see files the copy
          // itself creates; FileUtil.copy recurses directories and refuses
          // a dst inside src (checkDependencies), which a hand-rolled walk
          // would loop on
          def files(p: org.apache.hadoop.fs.Path): Int = {
            val st = sfs.getFileStatus(p)
            if (st.isDirectory) sfs.listStatus(p).map(c => files(c.getPath)).sum
            else 1
          }
          val n = files(src)
          org.apache.hadoop.fs.FileUtil.copy(sfs, src, dfs, dst, false, conf)
          new GenericInternalRow(Array[Any](n))
        }))
      case _ => None
    }
  }

  /** Filesystem-write test utilities resolve only when the JVM itself was
    * launched with -Dgraft.testUtilities=true. The gate is a SYSTEM
    * property, not a session conf, because any SQL caller can flip a
    * session conf with `SET ...` before `CALL` — a boundary, to hold
    * against SQL, must live somewhere SQL cannot write. */
  private def testUtilities: Boolean =
    java.lang.Boolean.getBoolean("graft.testUtilities")

  def names(spark: SparkSession): Seq[String] =
    Seq("optimize", "zorder", "cluster_by", "optimize_cluster", "vacuum",
      "restore", "clone", "checkpoint", "generate", "history", "detail",
      "set_transaction_version") ++
      (if (testUtilities) Seq("write_blob", "copy_dir") else Nil)

  private def in(n: String, dt: DataType,
      default: Option[String] = None): ProcedureParameter = {
    val b = ProcedureParameter.in(n, dt)
    default.foreach(b.defaultValue)
    b.build()
  }

  /** One-row-result procedure: `body` runs ON CALL (driver-side commit —
    * these are metadata operations; any heavy lifting inside them is
    * already distributed Spark jobs) and the row ships back via LocalScan. */
  private def proc(procName: String, desc: String,
      params: Seq[ProcedureParameter], schema: StructType,
      body: ArgsRow => InternalRow): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = params.toArray
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): JIterator[Scan] = {
        val row = body(new ArgsRow(input, params))
        Collections.singletonList[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = Array(row)
          override def readSchema(): StructType = schema
        }).iterator()
      }
    }

  /** Multi-row-result procedure — same contract as [[proc]]. */
  private def procRows(procName: String, desc: String,
      params: Seq[ProcedureParameter], schema: StructType,
      body: ArgsRow => Array[InternalRow]): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = params.toArray
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): JIterator[Scan] = {
        val out = body(new ArgsRow(input, params))
        Collections.singletonList[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = out
          override def readSchema(): StructType = schema
        }).iterator()
      }
    }

  /** Typed accessor over the bound-args row (strings arrive as UTF8String). */
  private final class ArgsRow(row: InternalRow, params: Seq[ProcedureParameter]) {
    def getString(i: Int): String =
      row.get(i, StringType).asInstanceOf[UTF8String].toString
    def getLong(i: Int): Long = row.get(i, LongType) match {
      case l: java.lang.Long => l
      case i2: java.lang.Integer => i2.longValue()
    }
    def getBoolean(i: Int): Boolean =
      row.get(i, BooleanType).asInstanceOf[java.lang.Boolean]
    def getStringOrNull(i: Int): String =
      if (row.isNullAt(i)) null
      else row.get(i, StringType).asInstanceOf[UTF8String].toString
    def getLongOrNull(i: Int): Option[Long] =
      if (row.isNullAt(i)) None else Some(getLong(i))
    def getBinary(i: Int): Array[Byte] =
      row.get(i, BinaryType).asInstanceOf[Array[Byte]]
  }
}
