package graft.delta

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/**
 * Shredded-variant WRITE behind `delta.enableVariantShredding`: the table
 * property (not a session conf) makes appends write variant columns in the
 * parquet variant-shredding layout (typed_value subtree), stamps
 * `variantShredding-preview` on both protocol sides in the same commit,
 * and the scan reconstructs values exactly. Read side was proven in r8
 * (`delta_shredded_variant_scan` + DAT unshredded interop).
 */
class VariantShreddingSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft-shred").toString + "/t"

  private def physicalSchema(snap: Snapshot): String = {
    val file = snap.absolutePath(snap.allFiles.head)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        file, spark.sessionState.newHadoopConf()))
    try r.getFooter.getFileMetaData.getSchema.toString finally r.close()
  }

  private def variantRows(n: Int) = spark.sql(
    s"""SELECT id, parse_json(format_string('{"k": %s, "t": "v%s"}', id, id)) AS v
       |FROM range(0, $n)""".stripMargin)

  test("create-time property shreds physically and stamps the feature") {
    val path = tmpTable()
    val prevConf = spark.conf.getOption("spark.sql.variant.writeShredding.enabled")
    DeltaWriter.append(spark, variantRows(50), path,
      configuration = Map("delta.enableVariantShredding" -> "true"))
    val snap = DeltaLog.forPath(spark, path).update()
    assert(snap.protocol.readerFeatures.exists(_.contains("variantShredding-preview")))
    assert(snap.protocol.writerFeatures.exists(_.contains("variantShredding-preview")))
    assert(snap.protocol.readerFeatures.exists(_.contains("variantType")))
    assert(physicalSchema(snap).contains("typed_value"), "parquet not shredded")
    // values reconstruct exactly through the scan
    val got = DeltaTable.forPath(spark, path).toDF
      .select(col("id"), expr("variant_get(v, '$.k', 'long')").as("k"),
        expr("variant_get(v, '$.t', 'string')").as("t"))
      .orderBy(col("id")).collect()
    assert(got.length == 50)
    got.foreach(r => assert(r.getLong(1) == r.getLong(0) &&
      r.getString(2) == s"v${r.getLong(0)}"))
    // the session conf was restored (the property governs the TABLE);
    // Spark 4.1 defaults this conf true, so compare against the pre-write
    // value rather than asserting absence
    assert(spark.conf.getOption("spark.sql.variant.writeShredding.enabled") == prevConf)
  }

  test("without the property, writes stay unshredded") {
    val path = tmpTable()
    DeltaWriter.append(spark, variantRows(10), path)
    val snap = DeltaLog.forPath(spark, path).update()
    assert(!physicalSchema(snap).contains("typed_value"))
    assert(!snap.protocol.readerFeatures.exists(_.contains("variantShredding-preview")))
  }

  test("mid-history SET TBLPROPERTIES stamps both sides; later appends shred") {
    val path = tmpTable()
    DeltaWriter.append(spark, variantRows(20), path) // v0 unshredded
    val log = DeltaLog.forPath(spark, path)
    Alter.setProperties(spark, log, Map("delta.enableVariantShredding" -> "true"))
    val afterProp = log.update()
    assert(afterProp.protocol.readerFeatures.exists(_.contains("variantShredding-preview")),
      s"property commit did not stamp the reader feature: ${afterProp.protocol}")
    assert(afterProp.protocol.writerFeatures.exists(_.contains("variantShredding-preview")))
    // feature upgrade keeps variantType advertised (merge, not replace)
    assert(afterProp.protocol.readerFeatures.exists(_.contains("variantType")))
    DeltaWriter.append(spark, variantRows(20)
      .withColumn("id", col("id") + 100)
      .withColumn("v", expr("parse_json(format_string('{\"k\": %s, \"t\": \"v%s\"}', id, id))")),
      path) // v2 shredded
    val snap = log.update()
    // MIXED table: old unshredded + new shredded files both reconstruct
    assert(DeltaTable.forPath(spark, path).toDF
      .select(expr("variant_get(v, '$.k', 'long')").as("k"))
      .agg(sum(col("k"))).collect()(0).getLong(0) ==
      (0 until 20).map(_.toLong).sum + (100 until 120).map(_.toLong).sum)
    // the file added by the LAST commit (mtime could tie across appends)
    val newFile = log.readCommit(snap.version).flatMap(_.add).head
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        snap.absolutePath(newFile), spark.sessionState.newHadoopConf()))
    val phys = try r.getFooter.getFileMetaData.getSchema.toString finally r.close()
    assert(phys.contains("typed_value"), "post-property append not shredded")
  }

  test("property set BEFORE any variant column: the evolving append that " +
      "brings the first variant column stamps the feature in the same commit") {
    val path = tmpTable()
    // create with the property but no variant column — nothing to stamp yet
    DeltaWriter.append(spark,
      spark.range(0, 10).select(col("id")), path,
      configuration = Map("delta.enableVariantShredding" -> "true"))
    val log = DeltaLog.forPath(spark, path)
    assert(!log.update().protocol.readerFeatures.exists(
      _.contains("variantShredding-preview")))
    // schema evolution adds the variant column; its files ARE shredded, so
    // variantShredding-preview must ride this exact commit
    DeltaWriter.append(spark, variantRows(10).withColumn("id", col("id") + 10),
      path, mergeSchema = true)
    val snap = log.update()
    assert(snap.protocol.readerFeatures.exists(_.contains("variantShredding-preview")),
      s"evolution commit did not stamp the reader feature: ${snap.protocol}")
    assert(snap.protocol.writerFeatures.exists(_.contains("variantShredding-preview")))
    assert(snap.protocol.readerFeatures.exists(_.contains("variantType")))
    val newFile = log.readCommit(snap.version).flatMap(_.add).head
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        snap.absolutePath(newFile), spark.sessionState.newHadoopConf()))
    val phys = try r.getFooter.getFileMetaData.getSchema.toString finally r.close()
    assert(phys.contains("typed_value"), "evolving append not shredded")
  }

  test("ADD COLUMNS of a variant column on a shredding-enabled table " +
      "stamps the feature") {
    val path = tmpTable()
    DeltaWriter.append(spark,
      spark.range(0, 5).select(col("id")), path,
      configuration = Map("delta.enableVariantShredding" -> "true"))
    val log = DeltaLog.forPath(spark, path)
    Alter.addColumns(spark, log, Seq(org.apache.spark.sql.types.StructField(
      "v", org.apache.spark.sql.types.VariantType, nullable = true)))
    val snap = log.update()
    assert(snap.protocol.readerFeatures.exists(_.contains("variantShredding-preview")),
      s"ADD COLUMNS did not stamp the reader feature: ${snap.protocol}")
    assert(snap.protocol.writerFeatures.exists(_.contains("variantShredding-preview")))
  }
}
