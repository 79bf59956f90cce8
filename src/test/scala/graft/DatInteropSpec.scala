package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.delta._

/** True foreign-writer interop gate: the reference SHIPS real Delta tables
  * written by delta-rs and delta-spark (reference data/inlined, exercised
  * by its DAT oracle test/sql/dat/all.test:13-287 and
  * test/sql/issues/partition_equality_filter__issue_303.test). Unlike
  * ForeignFixtures (synthesized by our own code), nothing here was produced
  * by this repo — so an encode/decode symmetry bias cannot hide.
  *
  * All reads are in-place against the read-only reference mount; the mount
  * itself guarantees we cannot accidentally write. Expected values are
  * hard-coded from independent inspection (DuckDB read_parquet over the
  * live data files and the reference's own test expectations).
  */
class DatInteropSpec extends AnyFunSuite {
  import TestSpark._

  private val base = "/root/reference/data/inlined"

  test("DAT simple_table: delta-spark NDJSON log, full content vs parquet-direct") {
    val p = s"$base/simple_table/delta_lake"
    val got = DeltaTable.forPath(spark, p).toDF
    val want = spark.read.parquet(s"$p/part-00000.snappy.parquet")
    assert(got.schema.fieldNames.toSeq == Seq("i"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() == 10)
  }

  test("DAT null_constraints_lists: pretty-printed multi-line log parses; " +
       "non-null list-of-struct column survives") {
    val p = s"$base/null_constraints_lists/delta_lake"
    val t = DeltaTable.forPath(spark, p)
    // v1 is a SET TBLPROPERTIES commit re-emitting metaData only — replay
    // must accept a metaData-without-protocol commit.
    assert(t.snapshot.version == 1L)
    val got = t.toDF
    assert(got.schema("i").nullable == false)
    val want = spark.read.parquet(
      s"$p/part-00000-6033f0dd-d8f9-4c14-a1cf-63e4d7cd99d6-c000.snappy.parquet")
    assert(got.count() == 10)
    val flat = got.select(col("i"), element_at(col("list_of_struct"), 1).getField("value").as("v"))
    val wantFlat = want.select(col("i"), element_at(col("list_of_struct"), 1).getField("value").as("v"))
    assert(flat.exceptAll(wantFlat).isEmpty && wantFlat.exceptAll(flat).isEmpty)
  }

  test("DAT null_constraints_structs: pretty-printed log, nested struct content") {
    val p = s"$base/null_constraints_structs/delta_lake"
    val got = DeltaTable.forPath(spark, p).toDF
    assert(got.count() == 10)
    val sums = got.agg(
      sum("i").as("si"),
      sum(col("struct").getField("value")).as("sv"),
      sum(col("nested_struct").getField("value").getField("a")).as("sa"),
      sum(col("nested_struct").getField("value").getField("b")).as("sb")).collect()(0)
    assert(sums.getLong(0) == 45 && sums.getLong(1) == 45 &&
      sums.getLong(2) == 45 && sums.getLong(3) == 45)
  }

  test("DAT issue_303: delta-rs log + delta-rs classic checkpoint replay; " +
       "partition equality filter must not prune everything") {
    val p = s"$base/issue_303_partitioned/delta_lake"
    val t = DeltaTable.forPath(spark, p)
    assert(t.snapshot.version == 11L)
    val df = t.toDF
    // reference test expectations (partition_equality_filter__issue_303.test)
    assert(df.count() == 16)
    assert(df.filter(col("part") === 42).count() == 16)
    assert(df.filter(col("part").isin(42)).count() == 16)
    assert(df.filter(col("part").isin(31, 42)).count() == 16)
    assert(df.filter(col("part") > 40).count() == 16)
    assert(df.agg(sum("i")).collect()(0).getLong(0) == 65)
    // time travel below the checkpoint still replays from JSON commits
    val v0 = DeltaTable.forPath(spark, p).toDF(0L)
    assert(v0.count() == 5)
  }

  test("DAT variant/basic: variantType reader feature; orphan data files not read") {
    val p = s"$base/variant/basic"
    val got = DeltaTable.forPath(spark, p).toDF
    // dir holds 3 parquet files; only 1 is referenced by an add — the other
    // two must NOT leak into the scan (reference inlined/variant/basic.test
    // expects exactly one row before its own insert)
    val rows = got.select(col("id"), to_json(col("data")).as("j")).collect()
    assert(rows.length == 1)
    assert(rows(0).getInt(0) == 21)
    val j = rows(0).getString(1)
    assert(j.contains("\"a\":\"test\"") && j.contains("{\"c\":42}"), s"variant json: $j")
  }

  test("DAT unshredded-variant: foreign classic checkpoint + variant nested in " +
       "array/struct/map") {
    val p = s"$base/unshredded-variant"
    val t = DeltaTable.forPath(spark, p)
    assert(t.snapshot.version == 2L)
    val df = t.toDF
    assert(df.count() == 102)
    // ids 0..99 from CTAS plus one extra row each for id 0 and 1
    val dup = df.groupBy("id").count().filter(col("count") === 2)
    assert(dup.select("id").collect().map(_.getLong(0)).toSet == Set(0L, 1L))
    // variant payloads decode through every nesting the table exercises
    val one = df.filter(col("id") === 7)
      .select(
        to_json(col("v")).as("v"),
        to_json(element_at(col("array_of_variants"), 1)).as("av"),
        to_json(col("struct_of_variants").getField("v")).as("sv"),
        to_json(element_at(col("map_of_variants"), "7")).as("mv"))
      .collect()(0)
    assert(one.getString(0) == """{"key":7}""", s"v = ${one.getString(0)}")
    (1 to 3).foreach(i => assert(one.getString(i) != null && one.getString(i).nonEmpty))
  }

  private def copyTable(src: String): String = {
    val dst = java.nio.file.Files.createTempDirectory("graft-dat-copy").toString + "/t"
    val srcPath = java.nio.file.Paths.get(src)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(srcPath).iterator().asScala.foreach { p =>
      val rel = srcPath.relativize(p).toString
      val target = java.nio.file.Paths.get(dst, rel)
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(target)
      else {
        java.nio.file.Files.createDirectories(target.getParent)
        java.nio.file.Files.copy(p, target)
      }
    }
    dst
  }

  test("DAT write-interop: append to a copied foreign table; all-NULL stats " +
       "omit min/max (reference issue 297)") {
    val p = copyTable(s"$base/simple_table/delta_lake")
    DeltaWriter.append(spark, spark.sql("SELECT CAST(42 AS BIGINT) AS i"), p)
    DeltaWriter.append(spark, spark.sql("SELECT CAST(NULL AS BIGINT) AS i"), p)
    val t = DeltaTable.forPath(spark, p)
    assert(t.toDF.count() == 12)
    assert(t.toDF.filter(col("i").isNull || col("i") === 42).count() == 2)
    val byVersion = DeltaLog.forPath(spark, p).update().allFiles
      .flatMap(f => f.stats.map(s => ActionJson.mapper.readTree(s)))
    // v1 (42): min=max=42, nullCount 0; v2 (NULL): min/max ABSENT, nullCount 1
    val s42 = byVersion.find(n => Option(n.get("minValues"))
      .exists(m => Option(m.get("i")).exists(_.asLong(-1) == 42L)))
    assert(s42.isDefined, byVersion.mkString(";"))
    val sNull = byVersion.find(n =>
      Option(n.get("nullCount")).exists(m => Option(m.get("i")).exists(_.asLong(0) == 1L)))
    assert(sNull.isDefined, byVersion.mkString(";"))
    sNull.foreach { n =>
      assert(!Option(n.get("minValues")).exists(_.has("i")),
        s"all-NULL column must omit minValues: $n")
      assert(!Option(n.get("maxValues")).exists(_.has("i")),
        s"all-NULL column must omit maxValues: $n")
    }
  }

  test("DAT write-interop: append to the foreign variant table; no variant stats " +
       "(reference write_stats_no_variant_stats)") {
    val p = copyTable(s"$base/variant/basic")
    val two = spark.sql(
      "SELECT CAST(100 AS INT) AS id, parse_json('{\"x\":1}') AS data " +
      "UNION ALL SELECT CAST(200 AS INT), CAST(NULL AS VARIANT)")
    DeltaWriter.append(spark, two, p)
    val got = DeltaTable.forPath(spark, p).toDF
    assert(got.count() == 3)
    assert(got.filter(col("id") === 100)
      .select(to_json(col("data"))).collect()(0).getString(0) == """{"x":1}""")
    // the new add's stats must not mention the variant column in ANY field
    val snap = DeltaLog.forPath(spark, p).update()
    val newAdd = snap.allFiles.filter(_.path.contains("part-")).sortBy(_.modificationTime).last
    newAdd.stats.foreach { s =>
      val n = ActionJson.mapper.readTree(s)
      Seq("minValues", "maxValues", "nullCount").foreach { f =>
        assert(!Option(n.get(f)).exists(_.has("data")),
          s"variant column leaked into stats.$f: $s")
      }
    }
  }

  test("shredded variant: writeShredding parquet round-trips through the delta scan") {
    // property-gated since r10: the WRITER toggles Spark's shredding
    // parquet writer per table (session confs, which default TRUE in
    // Spark 4.1, no longer leak shredded files into plain variant tables
    // — VariantShreddingSpec pins both directions)
    val dir = java.nio.file.Files.createTempDirectory("graft-shred").toString + "/t"
    val df = spark.sql(
      """SELECT id, parse_json(format_string('{"key": %s}', id)) AS v
        |FROM range(0, 100)""".stripMargin)
    DeltaWriter.append(spark, df, dir,
      configuration = Map("delta.enableVariantShredding" -> "true"))
    // prove the files are PHYSICALLY shredded: the parquet footer's
    // variant group must carry a typed_value field, not just value/metadata
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
      spark.sparkContext.hadoopConfiguration,
      new org.apache.hadoop.fs.Path(part.getAbsolutePath))
    val vGroup = footer.getFileMetaData.getSchema
      .getType(Seq("v"): _*).asGroupType()
    assert(vGroup.getFields.toString.contains("typed_value"),
      s"variant not shredded: $vGroup")
    // and our scan reconstructs the logical variant exactly
    val got = DeltaTable.forPath(spark, dir).toDF
      .select(col("id"), to_json(col("v")).as("j")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 100)
    (0L until 100L).foreach(i => assert(got(i) == s"""{"key":$i}""", s"id $i: ${got(i)}"))
    // file skipping on the sibling scalar column still applies
    assert(DeltaTable.forPath(spark, dir).toDF.filter(col("id") === 7).count() == 1)
  }

  test("DAT file skipping still sound on foreign stats (issue_303 i-bounds)") {
    val p = s"$base/issue_303_partitioned/delta_lake"
    val df = DeltaTable.forPath(spark, p).toDF
    // every live file has numRecords/min/max stats from delta-rs; a
    // selective predicate must return exact results (skipping is a bonus,
    // soundness is the assertion)
    assert(df.filter(col("i") === 4).count() ==
      spark.read.parquet(s"$p/part=42").filter(col("i") === 4).count())
  }
}
