package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.delta.{DeltaLog, DeltaTable, DeltaWriter, GraftMetrics}

/**
 * End-to-end file-skipping matrix over every stats-supported scalar type —
 * the analog of the reference's generated
 * `test/sql/generated/file_skipping_all_types.test:13-60,100-334`, which
 * asserts `Scanning Files: 1/5` for value filters and `4/5` for partition
 * filters per type (timestamp excluded by the reference,
 * src/delta_utils.cpp:1064-1065 — included HERE as a superset, our stats
 * engine skips on it). The "Scanning Files" observable is
 * [[GraftMetrics.pushdownLog]]'s (filesBefore, filesAfter).
 */
class AllTypesSkippingSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  /** (type name, value expression over id, equality literal for id=2). */
  private val cases: Seq[(String, String, String)] = Seq(
    ("tinyint", "CAST(id AS TINYINT)", "CAST(2 AS TINYINT)"),
    ("smallint", "CAST(id AS SMALLINT)", "CAST(2 AS SMALLINT)"),
    ("int", "CAST(id AS INT)", "CAST(2 AS INT)"),
    ("bigint", "id", "CAST(2 AS BIGINT)"),
    ("float", "CAST(id + 0.5 AS FLOAT)", "CAST(2.5 AS FLOAT)"),
    ("double", "CAST(id + 0.25 AS DOUBLE)", "CAST(2.25 AS DOUBLE)"),
    ("varchar", "format_string('val-%s', id)", "'val-2'"),
    ("date", "DATE'1992-01-01' + CAST(id AS INT)", "DATE'1992-01-03'"),
    ("decimal", "CAST(id * 1.5 AS DECIMAL(12,2))", "CAST(3.00 AS DECIMAL(12,2))"),
    // superset vs the reference: our interval engine skips on timestamps
    ("timestamp", "TIMESTAMP'2020-01-01 00:00:00' + make_interval(0,0,0,CAST(id AS INT))",
      "TIMESTAMP'2020-01-03 00:00:00'"))

  /** 5 one-row commits → 5 files, one distinct `k` value each. */
  private def build(path: String, valueExpr: String): Unit =
    (0 until 5).foreach { i =>
      DeltaWriter.append(spark,
        spark.sql(s"SELECT id, $valueExpr AS k FROM range($i, ${i + 1})")
          .coalesce(1), path)
    }

  private def lastConstantEvent(path: String) = {
    val ev = GraftMetrics.pushdownLog(spark).collect()
      .filter(r => r.getAs[String]("path") == path &&
        r.getAs[String]("filterType") == "constant")
    assert(ev.nonEmpty, s"no constant-pushdown event recorded for $path")
    ev.last
  }

  test("value filters schedule 1/5 files for every stats-supported type") {
    cases.foreach { case (name, valueExpr, lit2) =>
      val path = tmpTable(s"graft-skip-$name")
      build(path, valueExpr)
      GraftMetrics.clear()
      val n = DeltaTable.forPath(spark, path).toDF
        .where(expr(s"k = $lit2")).count()
      assert(n == 1, s"[$name] expected exactly one matching row, got $n")
      val e = lastConstantEvent(path)
      assert(e.getAs[Int]("filesBefore") == 5 && e.getAs[Int]("filesAfter") == 1,
        s"[$name] expected Scanning Files 1/5, got " +
          s"${e.getAs[Int]("filesAfter")}/${e.getAs[Int]("filesBefore")}")
    }
  }

  test("boolean value filter schedules 1/2 files (two-valued domain)") {
    val path = tmpTable("graft-skip-bool")
    Seq(true, false).foreach { v =>
      DeltaWriter.append(spark,
        spark.sql(s"SELECT id, $v AS k FROM range(0, 3)").coalesce(1), path)
    }
    GraftMetrics.clear()
    assert(DeltaTable.forPath(spark, path).toDF.where(col("k") === true).count() == 3)
    val e = lastConstantEvent(path)
    assert(e.getAs[Int]("filesBefore") == 2 && e.getAs[Int]("filesAfter") == 1,
      s"[bool] expected 1/2, got ${e.getAs[Int]("filesAfter")}/${e.getAs[Int]("filesBefore")}")
  }

  test("partition filters prune 5 -> 4 files for typed partition columns") {
    // reference asserts 4/5 when filtering OUT one partition value
    Seq(
      ("int", "CAST(id AS INT)", "CAST(2 AS INT)"),
      ("varchar", "format_string('val-%s', id)", "'val-2'"),
      ("date", "DATE'1992-01-01' + CAST(id AS INT)", "DATE'1992-01-03'")
    ).foreach { case (name, valueExpr, lit2) =>
      val path = tmpTable(s"graft-skippart-$name")
      DeltaWriter.append(spark,
        spark.sql(s"SELECT id, $valueExpr AS k FROM range(0, 5)"),
        path, partitionBy = Seq("k"))
      val snap = DeltaLog.forPath(spark, path).update()
      assert(snap.fileCount == 5, s"[$name] expected 5 partition files")
      GraftMetrics.clear()
      val n = DeltaTable.forPath(spark, path).toDF
        .where(expr(s"k <> $lit2")).count()
      assert(n == 4, s"[$name] expected 4 surviving rows, got $n")
      val ev = GraftMetrics.pushdownLog(spark).collect()
        .filter(_.getAs[String]("path") == path)
      assert(ev.nonEmpty, s"[$name] no pushdown event")
      val e = ev.last
      assert(e.getAs[Int]("filesAfter") == 4,
        s"[$name] expected Scanning Files 4/5, got " +
          s"${e.getAs[Int]("filesAfter")}/${e.getAs[Int]("filesBefore")}")
    }
  }
}
