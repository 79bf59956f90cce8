package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.delta._

/** Commit-protocol behavior under contention: version collisions must be
  * detected atomically; blind appends retry; nothing is lost or doubled
  * (reference conflict semantics: delta_transaction.cpp:464-488). */
class ConcurrencySpec extends AnyFunSuite {
  import TestSpark._

  test("LogStore PUT-if-absent: second writer of a version loses") {
    val dir = java.nio.file.Files.createTempDirectory("logstore").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val target = new org.apache.hadoop.fs.Path(dir, "00000000000000000001.json")
    LogStore.write(fs, target, "first\n")
    intercept[CommitConflictException] {
      LogStore.write(fs, target, "second\n")
    }
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "00000000000000000001.json")))
    assert(content == "first\n")
  }

  test("concurrent blind appends all land via retry; no rows lost") {
    val src = Fixtures.readParquet(spark, sfDir, "region").cache()
    src.count()
    val path = java.nio.file.Files.createTempDirectory("conc").toString + "/t"
    DeltaWriter.append(spark, src, path) // create
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = (1 to 4).map { _ =>
        Future(DeltaWriter.append(spark, src, path))
      }
      val versions = Await.result(Future.sequence(futures), 5.minutes)
      assert(versions.toSet.size == 4, s"versions not distinct: $versions")
      val t = DeltaTable.forPath(spark, path)
      assert(t.toDF.count() == 5 * src.count())
      assert(t.version == 4L)
    } finally pool.shutdown()
  }
}
