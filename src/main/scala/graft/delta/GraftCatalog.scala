package graft.delta

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * Spark `TableCatalog` plugin — real ATTACH parity with the reference's
 * catalog (`src/delta_extension.cpp:21-93`, `src/storage/delta_catalog.cpp`):
 * SQL-only users query Delta tables as `graft.<name>` (attached) or
 * ``graft.`/abs/path` `` (by path), with `VERSION AS OF n` time travel —
 * no Scala-side view registration.
 *
 * Configure `spark.sql.catalog.graft = graft.delta.GraftCatalog` (runtime
 * conf; catalogs load lazily). Name → path bindings come from
 * [[GraftCatalog.attach]] (the `ATTACH '<path>' AS <name>` analog) or
 * catalog options `spark.sql.catalog.graft.table.<name> = <path>`.
 *
 * The returned [[GraftTable]] is a thin descriptor; [[GraftCatalogResolution]]
 * (injected via GraftExtensions) swaps its `DataSourceV2Relation` for the
 * full-fidelity V1 relation (GraftFileIndex pushdown + stats skipping, DVs,
 * column mapping) during analysis — the same v2-identifier/v1-execution
 * pattern production Delta connectors use, so the SQL path loses none of
 * the scan machinery.
 */
class GraftCatalog extends TableCatalog with SupportsNamespaces with ProcedureCatalog {
  private var catalogName: String = "graft"
  private val optionTables = new ConcurrentHashMap[String, String]()
  // The owning session: catalog plugin instances are per-SparkSession
  // (loaded by that session's CatalogManager), so the session active at
  // initialize time IS the owner. Captured here and plumbed into every
  // GraftTable so schema resolution never consults `SparkSession.active`
  // later, when another session may be active on the thread.
  @transient private var session: SparkSession = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    session = SparkSession.active
    options.entrySet().asScala.foreach { e =>
      val k = e.getKey
      if (k.startsWith("table.")) optionTables.put(k.stripPrefix("table."), e.getValue)
    }
  }

  private def owner(): SparkSession =
    Option(session).getOrElse(SparkSession.active)
  override def name(): String = catalogName

  private def pathFor(ident: Identifier): String = {
    val n = ident.name()
    if (n.contains("/")) n
    else Option(GraftCatalog.registry.get(n))
      .orElse(Option(optionTables.get(n)))
      .getOrElse(throw new NoSuchTableException(ident))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    (GraftCatalog.registry.keySet.asScala ++ optionTables.keySet.asScala)
      .toSeq.sorted.map(Identifier.of(namespace, _)).toArray

  override def loadTable(ident: Identifier): Table =
    GraftTable(pathFor(ident), None)(owner())

  /** `VERSION AS OF n` (reference `AT (VERSION => n)`). */
  override def loadTable(ident: Identifier, version: String): Table =
    GraftTable(pathFor(ident), Some(version.toLong))(owner())

  /** `TIMESTAMP AS OF ts` — the DSv2 contract passes MICROseconds;
    * resolved to the latest version committed at or before it. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = pathFor(ident)
    val spark = owner()
    val v = DeltaLog.forPath(spark, path).versionAtTimestamp(timestamp / 1000)
    GraftTable(path, Some(v))(spark)
  }

  override def tableExists(ident: Identifier): Boolean =
    try { pathFor(ident); true } catch { case _: NoSuchTableException => false }

  /** CREATE TABLE graft.name (cols) LOCATION '/path' [PARTITIONED BY ...]
    * — commits version 0 (protocol+metadata, no files) at the location and
    * attaches the name; CTAS then writes through [[GraftTable]]'s
    * InsertableRelation. A path identifier needs no LOCATION. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val spark = owner()
    val path =
      if (ident.name().contains("/")) ident.name()
      else Option(properties.get(TableCatalog.PROP_LOCATION)).getOrElse(
        throw new IllegalArgumentException(
          s"CREATE TABLE ${ident.name()} needs LOCATION '<path>' (or a path identifier)"))
    require(!DeltaLog.forPath(spark, path).tableExists,
      s"table already exists at $path")
    val partCols = partitions.toSeq.map { t =>
      require(t.name == "identity" && t.references.length == 1,
        s"only identity partition transforms are supported, got $t")
      t.references()(0).fieldNames().mkString(".")
    }
    val config = properties.asScala.toMap -
      (TableCatalog.PROP_LOCATION, TableCatalog.PROP_PROVIDER,
        TableCatalog.PROP_OWNER, TableCatalog.PROP_COMMENT, "option.path")
    DeltaWriter.append(spark,
      spark.createDataFrame(new util.ArrayList[org.apache.spark.sql.Row](), schema),
      path, partitionBy = partCols, configuration = config,
      operation = "CREATE TABLE")
    if (!ident.name().contains("/")) GraftCatalog.attach(ident.name(), path)
    GraftTable(path, None)(spark)
  }
  /** SQL ALTER TABLE: ADD COLUMNS, RENAME COLUMN, DROP COLUMN, SET/UNSET
    * TBLPROPERTIES — mapped onto the metadata-commit ops in [[Alter]]
    * (rename/drop require column mapping and refuse with the upgrade hint
    * otherwise); anything else (type changes, reorders) is refused
    * loudly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val spark = owner()
    val log = DeltaLog.forPath(spark, pathFor(ident))
    val unsupported = changes.filterNot(c =>
      c.isInstanceOf[TableChange.AddColumn] ||
      c.isInstanceOf[TableChange.RenameColumn] ||
      c.isInstanceOf[TableChange.DeleteColumn] ||
      c.isInstanceOf[TableChange.SetProperty] ||
      c.isInstanceOf[TableChange.RemoveProperty])
    if (unsupported.nonEmpty)
      throw new UnsupportedOperationException(
        s"ALTER TABLE change not supported: ${unsupported.head}")
    val addCols = changes.collect { case a: TableChange.AddColumn =>
      (a.fieldNames.init.toSeq,
        org.apache.spark.sql.types.StructField(a.fieldNames.last, a.dataType, a.isNullable))
    }
    val setProps = changes.collect {
      case s: TableChange.SetProperty => s.property -> s.value }.toMap
    val unsetProps = changes.collect {
      case r: TableChange.RemoveProperty => r.property }
    if (addCols.nonEmpty) Alter.addColumnsAt(spark, log, addCols)
    changes.foreach {
      case r: TableChange.RenameColumn =>
        Alter.renameColumn(spark, log, r.fieldNames.toSeq, r.newName)
      case d: TableChange.DeleteColumn =>
        try Alter.dropColumn(spark, log, d.fieldNames.toSeq)
        catch { case e: IllegalArgumentException
            if d.ifExists && e.getMessage.contains("no such column") => () }
      case _ => ()
    }
    if (setProps.nonEmpty) Alter.setProperties(spark, log, setProps)
    if (unsetProps.nonEmpty) Alter.unsetProperties(spark, log, unsetProps)
    loadTable(ident)
  }
  override def dropTable(ident: Identifier): Boolean =
    GraftCatalog.registry.remove(ident.name()) != null
  /** ALTER TABLE RENAME TO: the attached NAME moves; the table's path and
    * log are untouched (names here are registry bindings, not storage). */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val path = Option(GraftCatalog.registry.get(oldIdent.name())).getOrElse(
      throw new NoSuchTableException(oldIdent))
    require(!GraftCatalog.registry.containsKey(newIdent.name()),
      s"table ${newIdent.name()} already exists")
    GraftCatalog.attach(newIdent.name(), path)
    GraftCatalog.registry.remove(oldIdent.name())
  }

  // -- ProcedureCatalog: CALL graft.optimize/zorder/vacuum/restore/clone/
  //    checkpoint('<path-or-name>', ...) — SQL-only maintenance
  //    ([[GraftProcedures]]); `table` args resolve like table identifiers --
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident.name(), owner(),
        n => if (n.contains("/")) n
          else Option(GraftCatalog.registry.get(n))
            .orElse(Option(optionTables.get(n)))
            .getOrElse(n))
      .getOrElse(throw new NoSuchTableException(ident))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.names(owner()).map(Identifier.of(namespace, _)).toArray

  // -- SupportsNamespaces (flat: only the default namespace) --
  override def listNamespaces(): Array[Array[String]] = Array(Array.empty)
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) Array.empty else throw new NoSuchNamespaceException(namespace)
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (namespace.isEmpty) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("namespaces not supported")
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespaces not supported")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("namespaces not supported")
}

object GraftTable {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit}
  import org.apache.spark.sql.sources._

  /** V1 overwrite filters → replaceWhere condition. `AlwaysTrue`/empty =
    * full overwrite (None); untranslatable filters are refused — silently
    * widening the overwrite scope would destroy data. */
  private[delta] def filtersToCondition(filters: Array[Filter]): Option[Column] = {
    def tr(f: Filter): Column = f match {
      case EqualTo(a, v) => col(a) === lit(v)
      case EqualNullSafe(a, v) => col(a) <=> lit(v)
      case GreaterThan(a, v) => col(a) > lit(v)
      case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
      case LessThan(a, v) => col(a) < lit(v)
      case LessThanOrEqual(a, v) => col(a) <= lit(v)
      case In(a, vs) => col(a).isin(vs.toIndexedSeq: _*)
      case IsNull(a) => col(a).isNull
      case IsNotNull(a) => col(a).isNotNull
      case And(l, r) => tr(l) && tr(r)
      case Or(l, r) => tr(l) || tr(r)
      case Not(c) => !tr(c)
      case other => throw new UnsupportedOperationException(
        s"cannot express overwrite filter as replaceWhere: $other")
    }
    val real = filters.filterNot(_.isInstanceOf[AlwaysTrue])
    if (real.isEmpty) None else Some(real.map(tr).reduce(_ && _))
  }
}

object GraftCatalog {
  private[delta] val registry = new ConcurrentHashMap[String, String]()

  /** `ATTACH '<path>' AS <name>` analog: bind a Delta table path to a name
    * resolvable as `graft.<name>` in SQL. */
  def attach(name: String, path: String): Unit = registry.put(name, path)
  def detach(name: String): Unit = registry.remove(name)
}

/** Thin table descriptor: identity + schema only; execution is re-routed to
  * the V1 relation by [[GraftCatalogResolution]]. The owning session rides
  * in a second (equality-excluded) parameter list — never resolved from
  * `SparkSession.active`, which is thread-sensitive under multi-session use. */
final case class GraftTable(path: String, versionAsOf: Option[Long])(
    @transient private val owner: SparkSession) extends Table
    with org.apache.spark.sql.connector.catalog.SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  /** Identity-only ScanBuilder: DELETE planning pushes a scan over the
    * target relation (V2ScanRelationPushDown requires SupportsRead) but
    * never executes it — actual reads are swapped to the V1 delta scan
    * during analysis ([[GraftCatalogResolution]]). Executing this scan
    * (Scan.toBatch's default) throws, so a path that dodges the swap fails
    * loudly instead of returning empty. */
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    () => new org.apache.spark.sql.connector.read.Scan {
      override def readSchema(): StructType = schema()
      override def description(): String = s"graft-identity-scan ${name()}"
    }

  /** SQL `DELETE FROM graft.t WHERE <pushable predicate>` → the DV-based
    * DELETE path; predicates Spark can't push as V1 filters are refused by
    * `canDeleteWhere` (loud AnalysisException, never a wrong delete).
    * `TRUNCATE TABLE` rides the default (delete-all) implementation. */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    versionAsOf.isEmpty &&
      (try { GraftTable.filtersToCondition(filters); true }
       catch { case _: UnsupportedOperationException => false })
  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    require(versionAsOf.isEmpty, s"cannot delete from a time-travel relation: ${name()}")
    val cond = GraftTable.filtersToCondition(filters)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    DeltaDelete.delete(owner, DeltaLog.forPath(owner, path), cond)
  }
  override def name(): String =
    versionAsOf.fold(path)(v => s"$path@v$v")

  @transient private lazy val snapshot: Snapshot = {
    val log = DeltaLog.forPath(owner, path)
    versionAsOf.fold(log.update())(log.snapshotAt)
  }
  override def schema(): StructType = snapshot.schema
  override def partitioning(): Array[Transform] =
    snapshot.metadata.partitionColumns
      .map(org.apache.spark.sql.connector.expressions.Expressions.identity)
      .toArray
  /** `SHOW TBLPROPERTIES graft.t` — the table's live configuration. */
  override def properties(): util.Map[String, String] = {
    import scala.jdk.CollectionConverters._
    snapshot.metadata.configuration.asJava
  }
  override def capabilities(): util.Set[TableCapability] =
    util.Set.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER)

  /** SQL INSERT INTO / INSERT OVERWRITE [PARTITION] / CTAS land here via
    * the V1-write bridge: append, full overwrite, or replaceWhere from the
    * translated overwrite filters — the same transactional paths as the
    * Scala API. Time-travel relations refuse writes. */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(versionAsOf.isEmpty, s"cannot write to a time-travel relation: ${name()}")
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate
        with org.apache.spark.sql.connector.write.SupportsOverwrite {
      // None = append; Some(None) = full overwrite; Some(Some(c)) = replaceWhere
      private var mode: Option[Option[org.apache.spark.sql.Column]] = None
      override def truncate(): this.type = { mode = Some(None); this }
      override def overwrite(
          filters: Array[org.apache.spark.sql.sources.Filter]): this.type = {
        mode = Some(GraftTable.filtersToCondition(filters))
        this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: org.apache.spark.sql.DataFrame, overwriteFlag: Boolean) => {
              val spark = data.sparkSession
              // INSERT resolves by position: rename to the table schema
              val tableCols = DeltaLog.forPath(spark, path).update().schema.fieldNames
              require(data.columns.length == tableCols.length,
                s"INSERT column count ${data.columns.length} != table ${tableCols.length}")
              val aligned = data.toDF(tableCols.toIndexedSeq: _*)
              mode match {
                case Some(rw) =>
                  DeltaWriter.overwrite(spark, aligned, path, replaceWhere = rw)
                case None if overwriteFlag =>
                  DeltaWriter.overwrite(spark, aligned, path)
                case None =>
                  DeltaWriter.append(spark, aligned, path)
              }
              ()
            }
        }
    }
  }

  /** The analyzed full-fidelity V1 plan (logical column names). */
  private[delta] def v1Plan(spark: SparkSession): LogicalPlan = {
    val t = DeltaTable.forPath(spark, path)
    versionAsOf.fold(t.toDF)(t.toDF(_)).queryExecution.analyzed
  }
}

/** Analyzer rule: `DataSourceV2Relation(GraftTable)` → the V1 delta scan,
  * with output attributes re-aliased onto the v2 relation's exprIds so any
  * already-resolved parents keep their references. */
class GraftCatalogResolution(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  /** Top-down with an explicit stop: a DeleteFromTable target must stay a
    * DataSourceV2Relation for DataSourceV2Strategy to plan the delete
    * (only its condition-side subqueries may be rewritten); reads anywhere
    * else swap to the full-fidelity V1 scan. (V2WriteCommands hold their
    * target in a non-child field, so appends never reach this case.) */
  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable => d
    // SQL UPDATE / MERGE: Spark only plans these for
    // SupportsRowLevelOperations tables — intercept them (before the
    // target scan is swapped to v1, which would hide the GraftTable) and
    // run the DV-based DeltaUpdate/DeltaMerge machinery instead.
    case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable =>
      SqlDml.rewriteUpdate(u).getOrElse(u)
    case m: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
      SqlDml.rewriteMerge(m) match {
        case Some(cmd) => cmd
        // non-graft target: leave as-is; graft SOURCE reads still need the
        // v1 swap, which mapChildren below would skip on the target side
        case None => m.copy(sourceTable = rewrite(m.sourceTable))
      }
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      val v1 = r.table.asInstanceOf[GraftTable].v1Plan(spark)
      Project(r.output.map { o =>
        val src = v1.output.find(_.name.equalsIgnoreCase(o.name)).getOrElse(
          throw new IllegalStateException(s"column ${o.name} missing in delta scan"))
        Alias(src, o.name)(exprId = o.exprId)
      }, v1)
    case other => other.mapChildren(rewrite)
  }
}
