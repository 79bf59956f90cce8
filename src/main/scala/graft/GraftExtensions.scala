package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{RollingFingerprint, SimHash64}

/**
 * SparkSessionExtensions entry point: registers the native expressions for
 * SQL use (`SELECT simhash64(...)`, `rolling_fingerprint(...)`) and the
 * dynamic file-pruning optimizer rule.
 *
 * Usage: SparkSession.builder().withExtensions(new GraftExtensions) or
 * spark.sql.extensions=graft.GraftExtensions.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // join-derived runtime file re-pruning (data columns; DPP covers
    // partitions) — preCBO so it sees the optimized join tree exactly once
    e.injectPreCBORule(s => new graft.delta.DynamicFilePruning(s))
    // unfiltered count(*) answered from the log (DV-aware) — no scan
    e.injectPreCBORule(s => new graft.delta.MetadataOnlyCount(s))
    // columnar partial aggregation over parquet scans (narrow surface:
    // attribute keys + double Sum/Average + Count(1)) — closes the
    // measured per-row HashAggregate constant; kill-switch
    // spark.graft.columnar.partialAgg=false
    e.injectColumnar(s => graft.plans.GraftColumnarRule(s))
    // graft catalog identifiers → full-fidelity V1 delta scan
    e.injectResolutionRule(s => new graft.delta.GraftCatalogResolution(s))
    // the reference's flagship SQL surface: `SELECT … FROM
    // delta_scan('path' [, version | 'timestamp'])` as a genuine table
    // function (reference src/functions/delta_scan/delta_scan.cpp:83-121).
    // A STRING second argument is a time-travel timestamp (epoch millis or
    // 'yyyy-MM-dd HH:mm:ss[.fff]') — parity with the format read's
    // timestampAsOf; an integer is a version.
    e.injectTableFunction((
      new FunctionIdentifier("delta_scan"),
      new ExpressionInfo("graft.delta.DeltaTable", "delta_scan"),
      (args: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        require(args.nonEmpty && args.size <= 2,
          "delta_scan(path[, version | timestamp]) takes 1-2 literal arguments")
        val path = GraftExtensions.literalString(args.head, "delta_scan path")
        val t = graft.delta.DeltaTable.forPath(spark, path)
        val df = args.lift(1) match {
          case Some(org.apache.spark.sql.catalyst.expressions.Literal(s,
              org.apache.spark.sql.types.StringType)) if s != null =>
            t.toDFAtTimestamp(
              graft.delta.DeltaLog.parseTimestampMillis(spark, s.toString))
          case Some(v) => t.toDF(GraftExtensions.literalLong(v, "delta_scan version"))
          case None => t.toDF
        }
        df.queryExecution.logical
      }))
    // `table_changes` by path: the CDF read surface as a table function
    e.injectTableFunction((
      new FunctionIdentifier("delta_changes"),
      new ExpressionInfo("graft.delta.DeltaTable", "delta_changes"),
      (args: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        require(args.size == 3,
          "delta_changes(path, startVersion, endVersion) takes 3 literal arguments")
        val path = GraftExtensions.literalString(args.head, "delta_changes path")
        graft.delta.DeltaTable.forPath(spark, path)
          .changes(GraftExtensions.literalLong(args(1), "startVersion"),
            GraftExtensions.literalLong(args(2), "endVersion"))
          .queryExecution.logical
      }))
    // metadata table functions, the reference's delta_list_files /
    // delta_domain_metadata UX (delta_metadata_scan.cpp:17-148,
    // delta_domain_metadata.cpp:11-77); optional trailing version arg
    e.injectTableFunction((
      new FunctionIdentifier("delta_list_files"),
      new ExpressionInfo("graft.delta.DeltaTable", "delta_list_files"),
      (args: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        require(args.nonEmpty && args.size <= 2,
          "delta_list_files(path[, version]) takes 1-2 literal arguments")
        graft.delta.DeltaTable
          .forPath(spark, GraftExtensions.literalString(args.head, "path"))
          .listFiles(args.lift(1).map(GraftExtensions.literalLong(_, "version")))
          .queryExecution.logical
      }))
    e.injectTableFunction((
      new FunctionIdentifier("delta_domain_metadata"),
      new ExpressionInfo("graft.delta.DeltaTable", "delta_domain_metadata"),
      (args: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        require(args.nonEmpty && args.size <= 2,
          "delta_domain_metadata(path[, version]) takes 1-2 literal arguments")
        graft.delta.DeltaTable
          .forPath(spark, GraftExtensions.literalString(args.head, "path"))
          .domainMetadata(args.lift(1).map(GraftExtensions.literalLong(_, "version")))
          .queryExecution.logical
      }))
    // scalar: the reference's delta_get_transaction_version(path, appId)
    // (idempotency_helpers.cpp:41-145); resolves at analysis time from
    // literal args — NULL when the app has no recorded version
    e.injectFunction((
      new FunctionIdentifier("delta_get_transaction_version"),
      new ExpressionInfo("graft.delta.DeltaTable", "delta_get_transaction_version"),
      (args: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        require(args.size == 2,
          "delta_get_transaction_version(path, appId) takes 2 literal arguments")
        val v = graft.delta.DeltaTable
          .forPath(spark, GraftExtensions.literalString(args.head, "path"))
          .getTransactionVersion(GraftExtensions.literalString(args(1), "appId"))
        org.apache.spark.sql.catalyst.expressions.Literal(
          v.map(Long.box).orNull, org.apache.spark.sql.types.LongType)
      }))
    // the reference's delta_set_transaction_version(path, appId, version
    // [, expectedVersion]) idempotency CAS (idempotency_helpers.cpp:67-151):
    // 4-arg form verifies the CURRENTLY recorded version first (NULL =
    // must record nothing yet) and errors on mismatch; 3-arg form sets
    // unconditionally. Literal args, but the COMMIT is deferred to
    // execution via SetTxnVersionPlan/-Exec (planned by the injected
    // GraftCommandStrategy) — EXPLAIN or view re-resolution never commits;
    // each execution commits exactly once. Returns (success).
    e.injectPlannerStrategy(s => new graft.delta.GraftCommandStrategy(s))
    e.injectTableFunction((
      new FunctionIdentifier("delta_set_transaction_version"),
      new ExpressionInfo("graft.delta.DeltaTable", "delta_set_transaction_version"),
      (args: Seq[Expression]) => {
        require(args.size == 3 || args.size == 4,
          "delta_set_transaction_version(path, appId, version[, expectedVersion]) " +
            "takes 3-4 literal arguments")
        val expected: Option[Option[Long]] = args.lift(3).map {
          case org.apache.spark.sql.catalyst.expressions.Literal(null, _) => None
          case e => Some(GraftExtensions.literalLong(e, "expectedVersion"))
        }
        graft.delta.SetTxnVersionPlan(
          GraftExtensions.literalString(args.head, "path"),
          GraftExtensions.literalString(args(1), "appId"),
          GraftExtensions.literalLong(args(2), "version"), expected)
      }))
    // the reference's `get_delta_test_expression()` analog
    // (expression_functions.cpp:30-55: render the kernel's canned test
    // expression through the engine's expression visitor — the
    // type-translation round-trip sanity). Here the translation layer is
    // PartitionUtil (serialized protocol value ⇄ Catalyst internal), so the
    // canned expression is one literal of EVERY supported partition type,
    // parsed and rendered back: (type, raw, rendered_literal) rows.
    e.injectTableFunction((
      new FunctionIdentifier("delta_test_expression"),
      new ExpressionInfo("graft.delta.PartitionUtil", "delta_test_expression"),
      (args: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        require(args.isEmpty, "delta_test_expression() takes no arguments")
        import org.apache.spark.sql.types._
        val canned: Seq[(String, String, DataType)] = Seq(
          ("string", "graft", StringType), ("byte", "42", ByteType),
          ("short", "1024", ShortType), ("integer", "123456", IntegerType),
          ("long", "9876543210", LongType), ("float", "1.5", FloatType),
          ("double", "2.25", DoubleType), ("boolean", "true", BooleanType),
          ("decimal(10,3)", "1234.567", DecimalType(10, 3)),
          ("date", "2024-02-29", DateType),
          ("timestamp", "2024-02-29 12:34:56.789012", TimestampType),
          ("timestamp_ntz", "2024-02-29 12:34:56.789012", TimestampNTZType),
          ("binary", "bin", BinaryType),
          ("null", null, LongType))
        import spark.implicits._
        canned.map { case (tn, raw, dt) =>
          val lit = org.apache.spark.sql.catalyst.expressions.Literal(
            graft.delta.PartitionUtil.toInternal(raw, dt), dt)
          (tn, raw, lit.sql)
        }.toDF("type", "raw", "rendered").queryExecution.logical
      }))
    // the reference's pushdown-observability table macro
    // (delta_macros.cpp:14-30 `delta_filter_pushdown_log()`): one row per
    // pushdown event — (path, filter_type, filters, files_before,
    // files_after); optional literal arg filters by path substring
    e.injectTableFunction((
      new FunctionIdentifier("delta_filter_pushdown_log"),
      new ExpressionInfo("graft.delta.GraftMetrics", "delta_filter_pushdown_log"),
      (args: Seq[Expression]) => {
        val spark = org.apache.spark.sql.SparkSession.active
        require(args.size <= 1,
          "delta_filter_pushdown_log([path_substring]) takes 0-1 literal arguments")
        val df0 = graft.delta.GraftMetrics.pushdownLog(spark)
          .withColumnRenamed("filterType", "filter_type")
          .withColumnRenamed("filesBefore", "files_before")
          .withColumnRenamed("filesAfter", "files_after")
        val df = args.headOption.map(a =>
          df0.where(org.apache.spark.sql.functions.col("path")
            .contains(GraftExtensions.literalString(a, "path_substring"))))
          .getOrElse(df0)
        df.queryExecution.logical
      }))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => SimHash64(c)
        case _ => throw new IllegalArgumentException(
          "simhash64(array<string>) takes exactly one argument")
      }))
    e.injectFunction((
      new FunctionIdentifier("rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fingerprint"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => RollingFingerprint(c, 16)
        case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(k, _)) =>
          RollingFingerprint(c, k.toString.toInt)
        case _ => throw new IllegalArgumentException(
          "rolling_fingerprint(text[, k])")
      }))
  }
}

object GraftExtensions {
  private def literalString(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
      v.toString
    case other =>
      throw new IllegalArgumentException(s"$what must be a string literal, got $other")
  }
  private def literalLong(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null =>
      v.toString.toLong
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }
}
