package graft.delta

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{coalesce, count, expr, lit, when}
import org.apache.spark.sql.types.{StructField, StructType}

/**
 * ALTER TABLE surface (delta-spark DDL analog, beyond the reference's
 * read-only catalog): schema and property evolution as pure metadata
 * commits — no data is rewritten, so every operation is O(1) in table
 * size. Old files simply lack added columns (read as null, the same
 * add-column evolution path mergeSchema appends use).
 *
 * ADD CONSTRAINT scans once to prove existing data satisfies the new
 * predicate (delta-spark does the same) — one distributed count, the only
 * operation here that reads data.
 *
 * Rename/drop column are NOT offered: both require column-mapping writes
 * (physical names diverging from logical), which this engine's writer
 * rejects end-to-end — offering a rename that breaks subsequent appends
 * would be a trap.
 */
object Alter {

  /** Append nullable columns to the table schema (ALTER TABLE ADD COLUMNS).
    * Existing files read them as null. */
  def addColumns(spark: SparkSession, log: DeltaLog,
      cols: Seq[StructField]): Long =
    addColumnsAt(spark, log, cols.map(f => (Nil: Seq[String], f)))

  /** ADD COLUMNS with nested targets: each entry is (parentPath, field)
    * where parentPath names a struct (possibly deep: `a.b`). Existing
    * files read the added field as NULL (nested add-column evolution —
    * the reference's generated corpus, schema_evolution.test:24-37). */
  def addColumnsAt(spark: SparkSession, log: DeltaLog,
      cols: Seq[(Seq[String], StructField)]): Long = {
    val snap = log.update()
    ProtocolGate.validateWrite(snap, "ADD COLUMNS")
    require(cols.nonEmpty, "no columns to add")
    require(cols.forall(_._2.nullable),
      "added columns must be nullable (existing files have no values for them)")

    // column-mapped tables: mint a fresh physical name + column id per
    // added field (delta-spark's col-<uuid> convention) and advance
    // delta.columnMapping.maxColumnId — the logical name never reaches
    // the files
    var maxId: Long = {
      import org.apache.spark.sql.types.{ArrayType, MapType}
      def ids(dt: org.apache.spark.sql.types.DataType): Seq[Long] = dt match {
        case st: StructType => st.fields.toSeq.flatMap { f =>
          (if (f.metadata.contains("delta.columnMapping.id"))
            Seq(f.metadata.getLong("delta.columnMapping.id")) else Nil) ++ ids(f.dataType)
        }
        case ArrayType(e, _) => ids(e)
        case MapType(k, v, _) => ids(k) ++ ids(v)
        case _ => Nil
      }
      (snap.metadata.configuration.get("delta.columnMapping.maxColumnId")
        .map(_.toLong).toSeq ++ ids(snap.schema) :+ 0L).max
    }
    // mint RECURSIVELY: the column-mapping protocol requires every nested
    // struct field (incl. inside array/map elements) to carry its own
    // physical name + id, or conforming readers refuse the whole table
    def mint(f: org.apache.spark.sql.types.StructField)
        : org.apache.spark.sql.types.StructField = {
      import org.apache.spark.sql.types.{ArrayType, MapType}
      def mintType(dt: org.apache.spark.sql.types.DataType)
          : org.apache.spark.sql.types.DataType = dt match {
        case st: StructType => StructType(st.fields.map(mint))
        case ArrayType(e, n) => ArrayType(mintType(e), n)
        case MapType(k, v, n) => MapType(mintType(k), mintType(v), n)
        case other => other
      }
      maxId += 1
      // capture this field's id BEFORE recursing: mintType advances maxId
      // for nested descendants, and copy() evaluates dataType first
      val myId = maxId
      f.copy(
        dataType = mintType(f.dataType),
        metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
          .putString("delta.columnMapping.physicalName",
            s"col-${java.util.UUID.randomUUID()}")
          .putLong("delta.columnMapping.id", myId).build())
    }
    val mintedCols =
      if (snap.columnMappingMode == "none") cols
      else cols.map { case (parent, f) => (parent, mint(f)) }
    val newConfig =
      if (snap.columnMappingMode == "none") snap.metadata.configuration
      else snap.metadata.configuration +
        ("delta.columnMapping.maxColumnId" -> maxId.toString)

    def insertAt(schema: StructType, parent: Seq[String],
        field: StructField, fullPath: String): StructType =
      parent match {
        case Nil =>
          require(!schema.fields.exists(_.name.equalsIgnoreCase(field.name)),
            s"column already exists: $fullPath")
          StructType(schema.fields :+ field)
        case head +: rest =>
          val idx = schema.fields.indexWhere(_.name.equalsIgnoreCase(head))
          require(idx >= 0, s"no such column: $head (adding $fullPath)")
          val updated = schema.fields(idx).dataType match {
            case st: StructType => insertAt(st, rest, field, fullPath)
            case other => throw new IllegalArgumentException(
              s"cannot add nested column $fullPath: $head is ${other.sql}, not a struct")
          }
          StructType(schema.fields.updated(idx,
            schema.fields(idx).copy(dataType = updated)))
      }

    val newSchema = mintedCols.foldLeft(snap.schema) { case (sch, (parent, f)) =>
      insertAt(sch, parent, f, (parent :+ f.name).mkString("."))
    }
    commitMetadata(log, snap, "ADD COLUMNS",
      snap.metadata.copy(schemaString = newSchema.json, configuration = newConfig))
  }

  /** SET TBLPROPERTIES: merge `props` into the table configuration.
    * Protocol-relevant keys (delta.appendOnly, delta.constraints.*, …)
    * take effect on the NEXT write, exactly like delta-spark. */
  def setProperties(spark: SparkSession, log: DeltaLog,
      props: Map[String, String]): Long = {
    val snap = log.update()
    ProtocolGate.validateWrite(snap, "SET TBLPROPERTIES")
    require(props.nonEmpty, "no properties to set")
    commitMetadata(log, snap, "SET TBLPROPERTIES",
      snap.metadata.copy(configuration = snap.metadata.configuration ++ props))
  }

  /** UNSET TBLPROPERTIES (missing keys are ignored, like delta-spark's
    * IF EXISTS form). */
  def unsetProperties(spark: SparkSession, log: DeltaLog,
      keys: Seq[String]): Long = {
    val snap = log.update()
    ProtocolGate.validateWrite(snap, "UNSET TBLPROPERTIES")
    commitMetadata(log, snap, "UNSET TBLPROPERTIES",
      snap.metadata.copy(configuration = snap.metadata.configuration -- keys))
  }

  /** ADD CONSTRAINT name CHECK (sql): verifies EXISTING rows satisfy the
    * predicate (one distributed aggregate over the live table — null
    * predicate results pass, SQL CHECK semantics), then commits
    * `delta.constraints.<name>`. Subsequent writes enforce it in the write
    * pass (DeltaWriter.withWriteChecks). */
  def addCheckConstraint(spark: SparkSession, log: DeltaLog,
      name: String, sql: String): Long = {
    val snap = log.update()
    ProtocolGate.validateWrite(snap, "ADD CONSTRAINT")
    require(name.nonEmpty && name.matches("[A-Za-z0-9_]+"),
      s"constraint name must be alphanumeric: $name")
    val key = s"delta.constraints.$name"
    require(!snap.metadata.configuration.contains(key),
      s"constraint $name already exists")
    val violations = snap.toDF
      .agg(count(when(!coalesce(expr(sql), lit(true)), 1)).as("v"))
      .collect()(0).getLong(0)
    if (violations > 0)
      throw new IllegalStateException(
        s"cannot add CHECK constraint $name: $violations existing row(s) violate ($sql)")
    // constraint enforcement is a writer-feature contract: make sure the
    // protocol advertises it so foreign writers that can't honor it refuse
    val p = snap.protocol
    val upgraded =
      if (p.minWriterVersion >= 7 &&
          !p.writerFeatures.getOrElse(Nil).contains("checkConstraints"))
        Some(p.copy(writerFeatures = Some(
          (p.writerFeatures.getOrElse(Nil) :+ "checkConstraints").distinct)))
      else if (p.minWriterVersion < 3) Some(p.copy(minWriterVersion = 3))
      else None
    commitMetadata(log, snap, "ADD CONSTRAINT",
      snap.metadata.copy(configuration = snap.metadata.configuration + (key -> sql)),
      upgraded)
  }

  /** DROP CONSTRAINT (missing name is an error, matching delta-spark
    * without IF EXISTS). */
  def dropCheckConstraint(spark: SparkSession, log: DeltaLog,
      name: String): Long = {
    val snap = log.update()
    ProtocolGate.validateWrite(snap, "DROP CONSTRAINT")
    val key = s"delta.constraints.$name"
    require(snap.metadata.configuration.contains(key),
      s"no such constraint: $name")
    commitMetadata(log, snap, "DROP CONSTRAINT",
      snap.metadata.copy(configuration = snap.metadata.configuration - key))
  }

  private def commitMetadata(log: DeltaLog, snap: Snapshot, op: String,
      md: Metadata, protocol: Option[Protocol] = None): Long = {
    val actions =
      Seq(Action(CommitInfo(System.currentTimeMillis(), op))) ++
      protocol.map(Action(_)) ++ Seq(Action(md))
    // metadata changes read current state: conflicts are errors, no retry
    LogStore.write(log.fs, log.commitFile(snap.version + 1),
      actions.map(ActionJson.toJson).mkString("", "\n", "\n"))
    log.invalidateCache()
    snap.version + 1
  }
}
