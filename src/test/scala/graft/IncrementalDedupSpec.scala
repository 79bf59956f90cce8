package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.delta.DeltaTable
import graft.pipeline.{Dedup, IncrementalDedup}

/** Cross-snapshot dedup: the persisted Delta window index must stand in
  * for the corpus exactly, maintenance must be idempotent under replay,
  * and a new ingest commit must extend dedup coverage without ever
  * re-shingling the standing corpus. */
class IncrementalDedupSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpIndex(): String =
    java.nio.file.Files.createTempDirectory("graft-incdedup").toString + "/idx"

  private lazy val docs = Fixtures.readParquet(spark, sfDir, "documents")
  private lazy val corpus = docs.where(IncrementalDedup.corpusFilter)
  private lazy val batch = docs.where(IncrementalDedup.batchFilter)

  test("index-based dedup == direct recompute against corpus windows") {
    val path = tmpIndex()
    IncrementalDedup.appendToIndex(spark, path, corpus, txnVersion = 1L)
    val viaIndex = IncrementalDedup
      .dedupAgainstIndex(batch, DeltaTable.forPath(spark, path).toDF)
      .collect().map(_.toString)
    val direct = IncrementalDedup
      .dedupAgainstIndex(batch, IncrementalDedup.windowIndex(corpus))
      .collect().map(_.toString)
    assert(viaIndex.nonEmpty && viaIndex.sameElements(direct))
  }

  test("index maintenance is idempotent under txn replay (CAS)") {
    val path = tmpIndex()
    val half = corpus.where(col("doc_id") % 10 < 4)
    val v1 = IncrementalDedup.appendToIndex(spark, path, half, txnVersion = 1L)
    val n1 = DeltaTable.forPath(spark, path).toDF.count()
    // an at-least-once scheduler replays the same (appId, version): no-op
    val v2 = IncrementalDedup.appendToIndex(spark, path, half, txnVersion = 1L)
    assert(v2 == v1)
    assert(DeltaTable.forPath(spark, path).toDF.count() == n1)
    // the NEXT version lands normally
    val v3 = IncrementalDedup.appendToIndex(spark, path,
      corpus.where(col("doc_id") % 10 >= 4), txnVersion = 2L)
    assert(v3 > v1)
    assert(DeltaTable.forPath(spark, path).toDF.count() > n1)
  }

  test("a new ingest commit extends coverage without re-shingling the corpus") {
    val path = tmpIndex()
    val half = corpus.where(col("doc_id") % 10 < 4)
    IncrementalDedup.appendToIndex(spark, path, half, txnVersion = 1L)
    val before = IncrementalDedup
      .dedupAgainstIndex(batch, DeltaTable.forPath(spark, path).toDF)
      .agg(sum(col("dup_windows"))).collect()(0).getLong(0)
    IncrementalDedup.appendToIndex(spark, path,
      corpus.where(col("doc_id") % 10 >= 4), txnVersion = 2L)
    val after = IncrementalDedup
      .dedupAgainstIndex(batch, DeltaTable.forPath(spark, path).toDF)
      .agg(sum(col("dup_windows"))).collect()(0).getLong(0)
    // more corpus in the index can only find more (or equal) duplication
    assert(after >= before)
    // and the full two-commit index equals the one-shot full-corpus index
    val full = IncrementalDedup
      .dedupAgainstIndex(batch, IncrementalDedup.windowIndex(corpus))
      .agg(sum(col("dup_windows"))).collect()(0).getLong(0)
    assert(after == full)
  }

  test("streaming sink maintains the index exactly-once") {
    val src = java.nio.file.Files.createTempDirectory("graft-incdedup-src").toString
    val path = tmpIndex()
    // two source files → two micro-batches at maxFilesPerTrigger=1
    corpus.where(col("doc_id") % 10 < 4).coalesce(1)
      .write.mode("append").parquet(src)
    corpus.where(col("doc_id") % 10 >= 4).coalesce(1)
      .write.mode("append").parquet(src)
    val schema = corpus.schema
    val q = graft.streaming.StreamingOps.streamIndexMaintenance(
      spark, src, schema, path)
    q.awaitTermination(120000)
    val viaStream = DeltaTable.forPath(spark, path).toDF
    val direct = IncrementalDedup.windowIndex(corpus)
    assert(viaStream.count() == direct.count())
    assert(viaStream.except(direct).isEmpty && direct.except(viaStream).isEmpty)
    // replay: a fresh run over the same source re-issues batchIds 0..1;
    // the txn CAS must make them no-ops (no double rows)
    val q2 = graft.streaming.StreamingOps.streamIndexMaintenance(
      spark, src, schema, path)
    q2.awaitTermination(120000)
    assert(DeltaTable.forPath(spark, path).toDF.count() == direct.count())
  }

  test("dup_windows is bounded by total_windows and zero-window docs survive") {
    val path = tmpIndex()
    IncrementalDedup.appendToIndex(spark, path, corpus, txnVersion = 1L)
    val res = IncrementalDedup
      .dedupAgainstIndex(batch, DeltaTable.forPath(spark, path).toDF)
    assert(res.where(col("dup_windows") > col("total_windows")).count() == 0)
    assert(res.count() == batch.count()) // every batch doc appears
    assert(res.where(col("shared_windows") > 0 && col("best_match").isNull)
      .count() == 0)
  }
}
