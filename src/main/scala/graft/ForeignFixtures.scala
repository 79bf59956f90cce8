package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * FOREIGN-writer interop fixtures — Delta logs this engine's own writer
 * did NOT produce, hand-authored line by line the way the reference's
 * inlined test tables are (reference data/inlined/simple_table/,
 * test/sql/dat/all.test:13-287). Every fixture read here exercises shapes
 * our own serialization never emits:
 *
 *  - `inline`: URL-encoded file names, an ABSOLUTE-path add action, adds
 *    with partial stats (minValues only), adds with NO stats, unknown
 *    stats fields (`tightBounds`), unknown metaData configuration keys
 *    (check-constraint / generated-column style, reference
 *    all.test:208-249), unknown future actions and `cdc` lines that
 *    replay must skip, and an add→remove→re-add reconciliation chain.
 *  - `checkpointed`: a checkpoint parquet in a foreign column layout
 *    (missing optional nested fields, extra `checksum` column, different
 *    field order) whose typed decode cannot resolve — exercising the
 *    JSON-fallback decode path (DeltaLog.readCheckpoint) — with the
 *    early JSON commit deleted so the checkpoint is the only source of
 *    v0 state.
 *
 * The original parquet tables remain the oracle (DAT pattern).
 */
object ForeignFixtures {

  /** Bump when fixture content changes shape. */
  private val GEN = "fg2" // fg2: bare-plus file name (URI vs form decoding)

  private def root: String =
    sys.props.getOrElse("graft.fixture.dir", "/tmp/graft-fixtures") + s"/foreign-$GEN"

  private def dirFor(sfDir: String, name: String): String = {
    val sfKey = sfDir.stripSuffix("/").replaceAll("[^A-Za-z0-9.]", "_")
    s"$root/$sfKey/$name"
  }

  private val mapper = graft.delta.ActionJson.mapper

  private def jstr(s: String): String = mapper.writeValueAsString(s)

  /** Write `df` as exactly ONE parquet file at `target` (absolute path). */
  private def writeOneFile(df: DataFrame, target: String): Unit = {
    val tmp = Files.createTempDirectory("graft-foreign-part").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no parquet part in $tmp"))
    Files.createDirectories(Paths.get(target).getParent)
    Files.move(part.toPath, Paths.get(target), StandardCopyOption.REPLACE_EXISTING)
  }

  /** Hand-computed Delta stats JSON for a nation slice. */
  private def nationStats(df: DataFrame, partial: Boolean): String = {
    val r = df.agg(count(lit(1)), min("n_nationkey"), max("n_nationkey"),
      min("n_regionkey"), max("n_regionkey")).collect()(0)
    if (partial)
      // minValues only, no maxValues/nullCount, plus an unknown field —
      // skipping must treat absent bounds as unbounded
      s"""{"numRecords":${r.getLong(0)},"minValues":{"n_nationkey":${r.getInt(1)}},"tightBounds":true}"""
    else
      s"""{"numRecords":${r.getLong(0)},"minValues":{"n_nationkey":${r.getInt(1)},"n_regionkey":${r.getInt(3)}},"maxValues":{"n_nationkey":${r.getInt(2)},"n_regionkey":${r.getInt(4)}},"nullCount":{"n_nationkey":0,"n_regionkey":0}}"""
  }

  private def writeLines(path: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path),
      (lines.mkString("\n") + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /**
   * Foreign inlined log over `nation`. Final state = the full table:
   * v0 adds fileA (full stats + unknown field), "file b.parquet"
   * (URL-encoded name, PARTIAL stats), and c0 (subset, later removed);
   * v1 removes c0 and re-adds the full slice from an ABSOLUTE path with
   * NO stats. Unknown actions and config keys sprinkled throughout.
   */
  def inline(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = dirFor(sfDir, "nation_inline")
    val marker = Paths.get(dir, "_GRAFT_READY")
    if (Files.exists(marker)) return dir
    val src = Fixtures.readNormalized(spark, sfDir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")

    val sliceA = src.filter(col("n_nationkey") % 3 === 0)
    val sliceB = src.filter(col("n_nationkey") % 3 === 1)
    val sliceC = src.filter(col("n_nationkey") % 3 === 2)
    val sliceC0 = sliceC.filter(col("n_nationkey") < 10)

    writeOneFile(sliceA, s"$dir/file+a.parquet") // literal '+': legal
    // un-encoded in a URI path; foreign logs reference it BARE, and form
    // decoding (URLDecoder) would corrupt it to "file a.parquet"
    writeOneFile(sliceB, s"$dir/file b.parquet") // space → URL-encoded in log
    writeOneFile(sliceC0, s"$dir/file-c0.parquet")
    val absC = s"$dir/abs/file-c.parquet" // referenced ABSOLUTELY in the log
    writeOneFile(sliceC, absC)

    val schemaJson = jstr(src.schema.json)
    writeLines(s"$dir/_delta_log/00000000000000000000.json", Seq(
      // foreign commitInfo with fields our writer never emits
      """{"commitInfo":{"timestamp":1700000000000,"operation":"CREATE TABLE AS SELECT","operationParameters":{"mode":"ErrorIfExists"},"isolationLevel":"Serializable","isBlindAppend":true,"operationMetrics":{"numFiles":"3"},"engineInfo":"foreign-writer/9.9.9","txnId":"11111111-2222-3333-4444-555555555555"}}""",
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      // unknown configuration keys: check constraints, generated columns,
      // and a wholly custom namespace — replay must carry them inertly
      s"""{"metaData":{"id":"f0e1d2c3-0000-0000-0000-000000000001","format":{"provider":"parquet","options":{}},"schemaString":$schemaJson,"partitionColumns":[],"configuration":{"delta.constraints.key_is_positive":"n_nationkey >= 0","delta.generatedColumns.marker":"true","foreign.writer.custom":"yes","delta.appendOnly":"false"},"createdTime":1700000000000}}""",
      s"""{"add":{"path":"file+a.parquet","partitionValues":{},"size":${new java.io.File(s"$dir/file+a.parquet").length},"modificationTime":1700000000001,"dataChange":true,"stats":${jstr(nationStats(sliceA, partial = false))},"tags":{"INSERTION_TIME":"1700000000001000"}}}""",
      s"""{"add":{"path":"file%20b.parquet","partitionValues":{},"size":${new java.io.File(s"$dir/file b.parquet").length},"modificationTime":1700000000002,"dataChange":true,"stats":${jstr(nationStats(sliceB, partial = true))}}}""",
      s"""{"add":{"path":"file-c0.parquet","partitionValues":{},"size":${new java.io.File(s"$dir/file-c0.parquet").length},"modificationTime":1700000000003,"dataChange":true}}""",
      // a future action kind: must be skipped, not fail replay
      """{"someFutureAction":{"version":42,"payload":"opaque"}}"""))
    val absPathJson = jstr(absC)
    writeLines(s"$dir/_delta_log/00000000000000000001.json", Seq(
      """{"commitInfo":{"timestamp":1700000001000,"operation":"WRITE","engineInfo":"foreign-writer/9.9.9"}}""",
      // cdc action (CDF writers emit these): plain reads ignore
      """{"cdc":{"path":"_change_data/cdc-000.parquet","partitionValues":{},"size":1234,"dataChange":false}}""",
      """{"remove":{"path":"file-c0.parquet","deletionTimestamp":1700000001000,"dataChange":true}}""",
      // ABSOLUTE path, NO stats: must never be stats-pruned
      s"""{"add":{"path":$absPathJson,"partitionValues":{},"size":${new java.io.File(absC).length},"modificationTime":1700000001001,"dataChange":true}}"""))

    Files.createFile(marker)
    graft.delta.DeltaLog.clearCache()
    dir
  }

  /**
   * In-commit-timestamp table (writer feature `inCommitTimestamp`): three
   * commits whose authoritative times live in
   * `commitInfo.inCommitTimestamp` and deliberately DISAGREE with both
   * `commitInfo.timestamp` (set far in the future) and the files' real
   * modification times (now) — timestamp time travel is only correct if
   * it reads the ICT field.
   */
  def inCommitTimestamps(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = dirFor(sfDir, "nation_ict")
    val marker = Paths.get(dir, "_GRAFT_READY")
    if (Files.exists(marker)) return dir
    val src = Fixtures.readNormalized(spark, sfDir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    val sliceA = src.filter(col("n_nationkey") % 2 === 0)
    val sliceB = src.filter(col("n_nationkey") % 2 === 1)
    writeOneFile(sliceA, s"$dir/ict-a.parquet")
    writeOneFile(sliceB, s"$dir/ict-b.parquet")

    val schemaJson = jstr(src.schema.json)
    // decoy timestamp field 1000 days after each ICT
    val decoy = 86400000L * 1000
    writeLines(s"$dir/_delta_log/00000000000000000000.json", Seq(
      s"""{"commitInfo":{"timestamp":${1600000000000L + decoy},"inCommitTimestamp":1600000000000,"operation":"CREATE TABLE","engineInfo":"foreign-writer/9.9.9"}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":[],"writerFeatures":["inCommitTimestamp"]}}""",
      s"""{"metaData":{"id":"f0e1d2c3-0000-0000-0000-00000000001c","format":{"provider":"parquet","options":{}},"schemaString":$schemaJson,"partitionColumns":[],"configuration":{"delta.enableInCommitTimestamps":"true","delta.inCommitTimestampEnablementVersion":"0","delta.inCommitTimestampEnablementTimestamp":"1600000000000"},"createdTime":1600000000000}}""",
      s"""{"add":{"path":"ict-a.parquet","partitionValues":{},"size":${new java.io.File(s"$dir/ict-a.parquet").length},"modificationTime":1600000000001,"dataChange":true,"stats":${jstr(nationStats(sliceA, partial = false))}}}"""))
    writeLines(s"$dir/_delta_log/00000000000000000001.json", Seq(
      s"""{"commitInfo":{"timestamp":${1600000600000L + decoy},"inCommitTimestamp":1600000600000,"operation":"WRITE","engineInfo":"foreign-writer/9.9.9"}}""",
      s"""{"add":{"path":"ict-b.parquet","partitionValues":{},"size":${new java.io.File(s"$dir/ict-b.parquet").length},"modificationTime":1600000600001,"dataChange":true,"stats":${jstr(nationStats(sliceB, partial = false))}}}"""))
    writeLines(s"$dir/_delta_log/00000000000000000002.json", Seq(
      s"""{"commitInfo":{"timestamp":${1600001200000L + decoy},"inCommitTimestamp":1600001200000,"operation":"WRITE","engineInfo":"foreign-writer/9.9.9"}}"""))

    Files.createFile(marker)
    graft.delta.DeltaLog.clearCache()
    dir
  }

  /**
   * Foreign-checkpoint table over `supplier`: two hand-written commits,
   * then a checkpoint parquet in a layout our writer never produces —
   * optional nested fields missing (no add.tags/deletionVector, no
   * protocol.readerFeatures), an extra foreign `checksum` column, action
   * columns in a different order — plus a `_last_checkpoint` carrying
   * foreign extras. v0's JSON is deleted, so reading v1 MUST decode the
   * foreign checkpoint (typed decode fails → JSON fallback).
   */
  def checkpointed(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = dirFor(sfDir, "supplier_foreigncp")
    val marker = Paths.get(dir, "_GRAFT_READY")
    if (Files.exists(marker)) return dir
    val src = Fixtures.readNormalized(spark, sfDir, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")

    val slice0 = src.filter(col("s_suppkey") % 2 === 0)
    val slice1 = src.filter(col("s_suppkey") % 2 === 1)
    writeOneFile(slice0, s"$dir/even.parquet")
    writeOneFile(slice1, s"$dir/odd.parquet")

    val schemaJson = jstr(src.schema.json)
    val metaLine =
      s"""{"metaData":{"id":"f0e1d2c3-0000-0000-0000-000000000002","format":{"provider":"parquet","options":{}},"schemaString":$schemaJson,"partitionColumns":[],"configuration":{},"createdTime":1700000000000}}"""
    writeLines(s"$dir/_delta_log/00000000000000000000.json", Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine,
      s"""{"add":{"path":"even.parquet","partitionValues":{},"size":${new java.io.File(s"$dir/even.parquet").length},"modificationTime":1700000000001,"dataChange":true}}"""))
    writeLines(s"$dir/_delta_log/00000000000000000001.json", Seq(
      """{"commitInfo":{"timestamp":1700000001000,"operation":"WRITE"}}""",
      s"""{"add":{"path":"odd.parquet","partitionValues":{},"size":${new java.io.File(s"$dir/odd.parquet").length},"modificationTime":1700000001001,"dataChange":true}}"""))

    // foreign checkpoint layout: different field order, missing optional
    // nested fields, extra top-level `checksum` column
    val cpSchema = StructType(Seq(
      StructField("checksum", StringType),
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType)),
        StructField("createdTime", LongType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType))))))
    val rows = Seq(
      Row("c0ffee00", Row(1, 2), null, null),
      Row("c0ffee01", null,
        Row("f0e1d2c3-0000-0000-0000-000000000002", src.schema.json,
          Seq.empty[String], Map.empty[String, String], 1700000000000L), null),
      Row("c0ffee02", null, null,
        Row("even.parquet", Map.empty[String, String],
          new java.io.File(s"$dir/even.parquet").length, 1700000000001L, true)),
      Row("c0ffee03", null, null,
        Row("odd.parquet", Map.empty[String, String],
          new java.io.File(s"$dir/odd.parquet").length, 1700000001001L, true)))
    val cpDf = spark.createDataFrame(rows.asJavaList, cpSchema)
    writeOneFile(cpDf, s"$dir/_delta_log/00000000000000000001.checkpoint.parquet")
    writeLines(s"$dir/_delta_log/_last_checkpoint", Seq(
      """{"version":1,"size":4,"parts":null,"checksum":"c0ffee","checkpointSchema":{"ignored":true},"numOfAddFiles":2}"""))
    // force checkpoint use for v0 state
    Files.delete(Paths.get(dir, "_delta_log", "00000000000000000000.json"))

    Files.createFile(marker)
    graft.delta.DeltaLog.clearCache()
    dir
  }

  /**
   * V2-checkpoint table over `part` — a table ONLY a v2-capable reader can
   * load: protocol requires readerFeatures=["v2Checkpoint"], the v0 JSON is
   * deleted, and the only complete state source is a uuid-named parquet
   * manifest whose file actions live in two `_sidecars/` parquet files
   * (one with stats + a stale remove tombstone to reconcile away).
   * The manifest/sidecar column layouts are foreign (missing optional
   * nested fields), so typed decode falls back to the JSON path.
   */
  def v2checkpointed(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = dirFor(sfDir, "part_v2cp")
    val marker = Paths.get(dir, "_GRAFT_READY")
    if (Files.exists(marker)) return dir
    val src = Fixtures.readNormalized(spark, sfDir, "part")
      .select("p_partkey", "p_brand", "p_size", "p_retailprice")

    val sliceA = src.filter(col("p_partkey") % 3 === 0)
    val sliceB = src.filter(col("p_partkey") % 3 === 1)
    val sliceC = src.filter(col("p_partkey") % 3 === 2)
    writeOneFile(sliceA, s"$dir/file-a.parquet")
    writeOneFile(sliceB, s"$dir/file-b.parquet")
    writeOneFile(sliceC, s"$dir/file-c.parquet")
    def sz(n: String) = new java.io.File(s"$dir/$n").length

    val schemaJson = src.schema.json
    val protoLine =
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}"""
    val metaLine =
      s"""{"metaData":{"id":"f0e1d2c3-0000-0000-0000-000000000003","format":{"provider":"parquet","options":{}},"schemaString":${jstr(schemaJson)},"partitionColumns":[],"configuration":{},"createdTime":1700000000000}}"""
    writeLines(s"$dir/_delta_log/00000000000000000000.json", Seq(
      protoLine, metaLine,
      s"""{"add":{"path":"file-a.parquet","partitionValues":{},"size":${sz("file-a.parquet")},"modificationTime":1700000000001,"dataChange":true}}""",
      s"""{"add":{"path":"file-b.parquet","partitionValues":{},"size":${sz("file-b.parquet")},"modificationTime":1700000000002,"dataChange":true}}"""))
    writeLines(s"$dir/_delta_log/00000000000000000001.json", Seq(
      """{"commitInfo":{"timestamp":1700000001000,"operation":"WRITE","engineInfo":"foreign-writer/9.9.9"}}""",
      s"""{"add":{"path":"file-c.parquet","partitionValues":{},"size":${sz("file-c.parquet")},"modificationTime":1700000001001,"dataChange":true}}"""))

    // ---- sidecar parquet files (foreign layout: optional fields absent) ----
    val statsA = {
      val r = sliceA.agg(count(lit(1)), min("p_partkey"), max("p_partkey")).collect()(0)
      s"""{"numRecords":${r.getLong(0)},"minValues":{"p_partkey":${r.getLong(1)}},"maxValues":{"p_partkey":${r.getLong(2)}}}"""
    }
    val sidecarSchema = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        StructField("stats", StringType)))),
      StructField("remove", StructType(Seq(
        StructField("path", StringType),
        StructField("deletionTimestamp", LongType),
        StructField("dataChange", BooleanType))))))
    val emptyPv = Map.empty[String, String]
    val sc1Rows = Seq(
      Row(Row("file-a.parquet", emptyPv, sz("file-a.parquet"), 1700000000001L, true, statsA), null),
      Row(Row("file-b.parquet", emptyPv, sz("file-b.parquet"), 1700000000002L, true, null), null))
    val sc2Rows = Seq(
      Row(Row("file-c.parquet", emptyPv, sz("file-c.parquet"), 1700000001001L, true, null), null),
      // stale tombstone from an earlier compaction — reconciles to nothing
      Row(null, Row("gone-long-ago.parquet", 1699999999000L, false)))
    val sc1 = "11111111-aaaa-bbbb-cccc-000000000001.parquet"
    val sc2 = "11111111-aaaa-bbbb-cccc-000000000002.parquet"
    writeOneFile(spark.createDataFrame(sc1Rows.asJavaList, sidecarSchema),
      s"$dir/_delta_log/_sidecars/$sc1")
    writeOneFile(spark.createDataFrame(sc2Rows.asJavaList, sidecarSchema),
      s"$dir/_delta_log/_sidecars/$sc2")

    // ---- uuid-named manifest: checkpointMetadata + sidecar pointers +
    //      protocol/metaData (foreign layout, field order scrambled) ----
    val manifestSchema = StructType(Seq(
      StructField("checkpointMetadata", StructType(Seq(
        StructField("version", LongType),
        StructField("tags", MapType(StringType, StringType))))),
      StructField("sidecar", StructType(Seq(
        StructField("path", StringType),
        StructField("sizeInBytes", LongType),
        StructField("modificationTime", LongType)))),
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType)),
        StructField("writerFeatures", ArrayType(StringType))))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType)),
        StructField("createdTime", LongType))))))
    def scSize(n: String) = new java.io.File(s"$dir/_delta_log/_sidecars/$n").length
    val manifestRows = Seq(
      Row(Row(1L, Map("writer" -> "foreign-writer/9.9.9")), null, null, null),
      Row(null, Row(sc1, scSize(sc1), 1700000002001L), null, null),
      Row(null, Row(sc2, scSize(sc2), 1700000002002L), null, null),
      Row(null, null, Row(3, 7, Seq("v2Checkpoint"), Seq("v2Checkpoint")), null),
      Row(null, null, null,
        Row("f0e1d2c3-0000-0000-0000-000000000003", schemaJson,
          Seq.empty[String], Map.empty[String, String], 1700000000000L)))
    val manifestUuid = "22222222-dddd-eeee-ffff-333333333333"
    writeOneFile(spark.createDataFrame(manifestRows.asJavaList, manifestSchema),
      s"$dir/_delta_log/00000000000000000001.checkpoint.$manifestUuid.parquet")
    writeLines(s"$dir/_delta_log/_last_checkpoint", Seq(
      s"""{"version":1,"sizeInBytes":9999,"v2Checkpoint":{"path":"00000000000000000001.checkpoint.$manifestUuid.parquet"},"checksum":"feedface"}"""))
    // v0 JSON gone: only a v2-capable reader can reconstruct the table
    Files.delete(Paths.get(dir, "_delta_log", "00000000000000000000.json"))

    Files.createFile(marker)
    graft.delta.DeltaLog.clearCache()
    dir
  }

  /**
   * V2 checkpoint in its JSON-manifest form over `region`: the manifest is
   * `N.checkpoint.<uuid>.json` (one action per line, like a commit), with
   * one sidecar referenced RELATIVELY and one by ABSOLUTE path — the two
   * resolution branches of DeltaLog.resolveSidecarPath. v0 JSON deleted.
   */
  def v2jsonManifest(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = dirFor(sfDir, "region_v2json")
    val marker = Paths.get(dir, "_GRAFT_READY")
    if (Files.exists(marker)) return dir
    val src = Fixtures.readNormalized(spark, sfDir, "region")
      .select("r_regionkey", "r_name")

    val sliceA = src.filter(col("r_regionkey") % 2 === 0)
    val sliceB = src.filter(col("r_regionkey") % 2 === 1)
    writeOneFile(sliceA, s"$dir/even.parquet")
    writeOneFile(sliceB, s"$dir/odd.parquet")
    def sz(n: String) = new java.io.File(s"$dir/$n").length

    val schemaJson = src.schema.json
    writeLines(s"$dir/_delta_log/00000000000000000000.json", Seq(
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
      s"""{"metaData":{"id":"f0e1d2c3-0000-0000-0000-000000000004","format":{"provider":"parquet","options":{}},"schemaString":${jstr(schemaJson)},"partitionColumns":[],"configuration":{},"createdTime":1700000000000}}""",
      s"""{"add":{"path":"even.parquet","partitionValues":{},"size":${sz("even.parquet")},"modificationTime":1700000000001,"dataChange":true}}""",
      s"""{"add":{"path":"odd.parquet","partitionValues":{},"size":${sz("odd.parquet")},"modificationTime":1700000000002,"dataChange":true}}"""))

    // sidecar 1 (relative, in _sidecars/): the even file
    val sidecarSchema = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues", MapType(StringType, StringType)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType))))))
    val sc1 = "33333333-aaaa-bbbb-cccc-000000000001.parquet"
    writeOneFile(spark.createDataFrame(Seq(
      Row(Row("even.parquet", Map.empty[String, String], sz("even.parquet"),
        1700000000001L, true))).asJavaList, sidecarSchema),
      s"$dir/_delta_log/_sidecars/$sc1")
    // sidecar 2 (ABSOLUTE path outside _sidecars/): the odd file
    val absSc = s"$dir/aux/sidecar-odd.parquet"
    writeOneFile(spark.createDataFrame(Seq(
      Row(Row("odd.parquet", Map.empty[String, String], sz("odd.parquet"),
        1700000000002L, true))).asJavaList, sidecarSchema), absSc)

    val manifestUuid = "44444444-dddd-eeee-ffff-555555555555"
    writeLines(s"$dir/_delta_log/00000000000000000000.checkpoint.$manifestUuid.json", Seq(
      """{"checkpointMetadata":{"version":0,"tags":{"writer":"foreign-writer/9.9.9"}}}""",
      s"""{"sidecar":{"path":"$sc1","sizeInBytes":${new java.io.File(s"$dir/_delta_log/_sidecars/$sc1").length},"modificationTime":1700000003001}}""",
      s"""{"sidecar":{"path":${jstr(absSc)},"sizeInBytes":${new java.io.File(absSc).length},"modificationTime":1700000003002}}""",
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}""",
      s"""{"metaData":{"id":"f0e1d2c3-0000-0000-0000-000000000004","format":{"provider":"parquet","options":{}},"schemaString":${jstr(schemaJson)},"partitionColumns":[],"configuration":{},"createdTime":1700000000000}}"""))
    writeLines(s"$dir/_delta_log/_last_checkpoint", Seq(
      s"""{"version":0,"v2Checkpoint":{"path":"00000000000000000000.checkpoint.$manifestUuid.json"}}"""))
    Files.delete(Paths.get(dir, "_delta_log", "00000000000000000000.json"))
    // a v1 commit keeps the log listable with v0's JSON gone
    writeLines(s"$dir/_delta_log/00000000000000000001.json", Seq(
      """{"commitInfo":{"timestamp":1700000004000,"operation":"NOOP","engineInfo":"foreign-writer/9.9.9"}}"""))

    Files.createFile(marker)
    graft.delta.DeltaLog.clearCache()
    dir
  }

  /**
   * Foreign table whose STRUCT gained a field between commits (the
   * reference's generated evolution corpus,
   * test/sql/generated/schema_evolution.test:24-37): v0's schema is
   * `id, info STRUCT<a,b>` with the even-nationkey file; v1 re-emits
   * metaData with `info STRUCT<a,b,c>` and adds the odd-nationkey file
   * carrying c. Reading the table must null-fill `info.c` for v0's file —
   * the nested analog of top-level add-column evolution.
   */
  def structEvolution(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = dirFor(sfDir, "nation_struct_evo")
    val marker = Paths.get(dir, "_GRAFT_READY")
    if (Files.exists(marker)) return dir
    val src = Fixtures.readNormalized(spark, sfDir, "nation")

    val oldRows = src.filter(col("n_nationkey") % 2 === 0)
      .select(col("n_nationkey").as("id"),
        struct(col("n_name").as("a"), col("n_regionkey").as("b")).as("info"))
    val newRows = src.filter(col("n_nationkey") % 2 === 1)
      .select(col("n_nationkey").as("id"),
        struct(col("n_name").as("a"), col("n_regionkey").as("b"),
          upper(col("n_name")).as("c")).as("info"))

    writeOneFile(oldRows, s"$dir/old.parquet")
    writeOneFile(newRows, s"$dir/new.parquet")
    def sz(n: String) = new java.io.File(s"$dir/$n").length

    writeLines(s"$dir/_delta_log/00000000000000000000.json", Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"f0e1d2c3-0000-0000-0000-000000000007","format":{"provider":"parquet","options":{}},"schemaString":${jstr(oldRows.schema.json)},"partitionColumns":[],"configuration":{},"createdTime":1700000000000}}""",
      s"""{"add":{"path":"old.parquet","partitionValues":{},"size":${sz("old.parquet")},"modificationTime":1700000000001,"dataChange":true}}"""))
    writeLines(s"$dir/_delta_log/00000000000000000001.json", Seq(
      """{"commitInfo":{"timestamp":1700000001000,"operation":"ADD COLUMNS","engineInfo":"foreign-writer/9.9.9"}}""",
      s"""{"metaData":{"id":"f0e1d2c3-0000-0000-0000-000000000007","format":{"provider":"parquet","options":{}},"schemaString":${jstr(newRows.schema.json)},"partitionColumns":[],"configuration":{},"createdTime":1700000000000}}""",
      s"""{"add":{"path":"new.parquet","partitionValues":{},"size":${sz("new.parquet")},"modificationTime":1700000001001,"dataChange":true}}"""))

    Files.createFile(marker)
    graft.delta.DeltaLog.clearCache()
    dir
  }

  /**
   * Checkpoint carrying file metadata ONLY in struct form — the shape
   * `delta.checkpoint.writeStatsAsStruct=true, writeStatsAsJson=false`
   * writers emit (reference DAT `stats_as_struct`, test/sql/dat/all.test):
   * `add.stats_parsed` / `add.partitionValues_parsed` structs, with NO
   * JSON `stats` string and NO `partitionValues` string map. The table is
   * `customer` partitioned by c_mktsegment, two files per segment split at
   * the segment's median c_custkey, so BOTH partition pruning (from the
   * restored string map) and min/max file skipping (from the restored JSON
   * stats) are exercisable. v0's JSON is deleted — the checkpoint is the
   * only source of its state.
   */
  def statsAsStruct(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = dirFor(sfDir, "customer_statsstruct")
    val marker = Paths.get(dir, "_GRAFT_READY")
    if (Files.exists(marker)) return dir
    val src = Fixtures.readNormalized(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val segs = src.select("c_mktsegment").distinct()
      .collect().map(_.getString(0)).sorted.toSeq

    // (path, segment, numRecords, minKey, maxKey, size)
    val files = segs.flatMap { seg =>
      val part = src.filter(col("c_mktsegment") === seg)
      val mid = part.agg(expr("percentile(c_custkey, 0.5)")).collect()(0).getDouble(0)
      Seq("lo" -> part.filter(col("c_custkey") <= mid),
          "hi" -> part.filter(col("c_custkey") > mid)).map { case (half, slice) =>
        val rel = s"c_mktsegment=$seg/$half.parquet"
        writeOneFile(slice.drop("c_mktsegment"), s"$dir/$rel")
        val st = slice.agg(count(lit(1)), min("c_custkey"), max("c_custkey")).collect()(0)
        (rel, seg, st.getLong(0), st.getLong(1), st.getLong(2),
          new java.io.File(s"$dir/$rel").length)
      }
    }

    val metaLine =
      s"""{"metaData":{"id":"f0e1d2c3-0000-0000-0000-000000000008","format":{"provider":"parquet","options":{}},"schemaString":${jstr(src.schema.json)},"partitionColumns":["c_mktsegment"],"configuration":{},"createdTime":1700000000000}}"""
    val (headFiles, tailFiles) = files.splitAt(files.size / 2)
    def addLine(f: (String, String, Long, Long, Long, Long)): String =
      s"""{"add":{"path":"${f._1}","partitionValues":{"c_mktsegment":"${f._2}"},"size":${f._6},"modificationTime":1700000000001,"dataChange":true}}"""
    writeLines(s"$dir/_delta_log/00000000000000000000.json",
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""", metaLine) ++
        headFiles.map(addLine))
    writeLines(s"$dir/_delta_log/00000000000000000001.json",
      Seq("""{"commitInfo":{"timestamp":1700000001000,"operation":"WRITE","engineInfo":"foreign-writer/9.9.9"}}""") ++
        tailFiles.map(addLine))

    // checkpoint at v1: struct-form stats/partitionValues ONLY
    val cpSchema = StructType(Seq(
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType)),
        StructField("createdTime", LongType)))),
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        StructField("partitionValues_parsed", StructType(Seq(
          StructField("c_mktsegment", StringType)))),
        StructField("stats_parsed", StructType(Seq(
          StructField("numRecords", LongType),
          StructField("minValues", StructType(Seq(
            StructField("c_custkey", LongType)))),
          StructField("maxValues", StructType(Seq(
            StructField("c_custkey", LongType)))),
          StructField("nullCount", StructType(Seq(
            StructField("c_custkey", LongType))))))))))))
    val cpRows =
      Seq(Row(Row(1, 2), null, null),
        Row(null, Row("f0e1d2c3-0000-0000-0000-000000000008", src.schema.json,
          Seq("c_mktsegment"), Map.empty[String, String], 1700000000000L), null)) ++
        files.map { case (rel, seg, n, lo, hi, size) =>
          Row(null, null,
            Row(rel, size, 1700000000001L, true, Row(seg),
              Row(n, Row(lo), Row(hi), Row(0L))))
        }
    val cpDf = spark.createDataFrame(cpRows.asJavaList, cpSchema)
    writeOneFile(cpDf, s"$dir/_delta_log/00000000000000000001.checkpoint.parquet")
    writeLines(s"$dir/_delta_log/_last_checkpoint", Seq(
      s"""{"version":1,"size":${2 + files.size}}"""))
    Files.delete(Paths.get(dir, "_delta_log", "00000000000000000000.json"))

    Files.createFile(marker)
    graft.delta.DeltaLog.clearCache()
    dir
  }

  private implicit class SeqRows(rows: Seq[Row]) {
    def asJavaList: java.util.List[Row] = {
      val out = new java.util.ArrayList[Row](rows.size)
      rows.foreach(out.add)
      out
    }
  }
}
