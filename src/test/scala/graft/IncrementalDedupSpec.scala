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

  test("releaseBatchCaches unpersists the per-batch join cache") {
    // a long-running driver processes many batches; each dedupAgainstIndex
    // persists one batch-sized intermediate that must be releasable after
    // the batch result is materialized (ADVICE r19: blocks otherwise
    // accumulate until LRU eviction)
    // Track the SPECIFIC new cached-RDD ids rather than the global count:
    // Spark's ContextCleaner asynchronously unpersists stale caches left
    // by earlier suites, so a count-delta assertion races against it
    // (observed flaky in a full serial run; ids can't be confused by
    // concurrent drops of unrelated entries).
    def rddIds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def settle(pred: => Boolean): Boolean = {
      var waited = 0
      while (!pred && waited < 10000) { Thread.sleep(100); waited += 100 }
      pred
    }
    IncrementalDedup.releaseBatchCaches() // drain anything left by other tests
    val path = tmpIndex()
    IncrementalDedup.appendToIndex(spark, path, corpus, txnVersion = 1L)
    val before = rddIds
    val out = IncrementalDedup
      .dedupAgainstIndex(batch, DeltaTable.forPath(spark, path).toDF)
    out.collect() // materialize the batch (populates the cache)
    def fresh: Set[Int] = rddIds -- before
    assert(settle(fresh.nonEmpty),
      "the batch join should be persisted while the batch is in flight")
    val created = fresh
    IncrementalDedup.releaseBatchCaches()
    assert(settle((rddIds & created).isEmpty),
      "releaseBatchCaches must unpersist the per-batch intermediates")
    // the released DataFrame is still usable (recomputes, same rows)
    assert(out.collect().nonEmpty)
  }

  test("the index is aggregated once and scanned at most twice per batch") {
    // the r17 shape read the index three times (distinct membership, df
    // groupBy, attribution join); the one-pass shape aggregates it once
    // (df serves membership AND the cold-slice cut) and scans it once
    // more for attribution — at a TB-scale index the saved pass is real
    val path = tmpIndex()
    IncrementalDedup.appendToIndex(spark, path, corpus, txnVersion = 1L)
    val df = IncrementalDedup
      .dedupAgainstIndex(batch, DeltaTable.forPath(spark, path).toDF)
    df.collect()
    val plan = df.queryExecution.optimizedPlan
    def indexLeaves(p: org.apache.spark.sql.catalyst.plans.QueryPlan[_]): Int =
      p.collectLeaves().count {
        // an InMemoryRelation leaf prints its cached child plan, which
        // legitimately contains the index path — don't count it as a scan.
        // The index scan itself is a LogicalRelation over the graftdelta
        // file index (its relation string carries the path).
        case _: org.apache.spark.sql.execution.columnar.InMemoryRelation => false
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.exists(_.toString.contains("incdedup"))
            case o => o.toString.contains("incdedup")
          }
        case l => l.toString.contains("incdedup")
      }
    // the persisted batch⋈stats join shows up as an InMemoryRelation; the
    // ONE index aggregation lives inside its cached plan
    val cached = plan.collect {
      case imr: org.apache.spark.sql.execution.columnar.InMemoryRelation => imr
    }
    assert(cached.nonEmpty, s"expected the persisted batch-side join:\n$plan")
    // both references (per-doc stats + attribution) share ONE cache entry
    assert(cached.map(_.cacheBuilder.cachedPlan).distinct.length == 1,
      "expected a single shared cache entry for the batch-side join")
    // inside that one cached plan: exactly one index scan feeding exactly
    // one count aggregation keyed on s
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan) = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case o => o
    }
    val cacheStr = unwrap(cached.head.cachedPlan).toString
    def occurrences(hay: String, needle: String): Int =
      hay.sliding(needle.length).count(_ == needle)
    assert(occurrences(cacheStr, "graft-incdedup") == 1,
      s"expected 1 index scan inside the cached plan:\n$cacheStr")
    assert(occurrences(cacheStr, "functions=[count(1)]") == 1,
      s"expected exactly one index count aggregation:\n$cacheStr")
    val outside = indexLeaves(plan)
    assert(outside == 1,
      s"expected 1 index scan outside the cache (attribution), got $outside:\n$plan")
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

  test("index lifecycle at daily cadence: stream → OPTIMIZE → CHECKPOINT → O(checkpoint) replay") {
    // streaming maintenance accretes one commit (and one small file) per
    // micro-batch forever; the daily-cadence lifecycle is compact +:
    // checkpoint, after which (a) snapshot replay is checkpoint + tail
    // only — pre-checkpoint JSON commits are not needed at all, (b) the
    // SetTransaction CAS state survives, so replayed batches stay no-ops,
    // and (c) the index still equals the direct corpus recompute.
    val src = java.nio.file.Files.createTempDirectory("graft-incdedup-src").toString
    val path = tmpIndex()
    (0 to 3).foreach { i =>
      corpus.where(col("doc_id") % 4 === i).coalesce(1)
        .write.mode("append").parquet(src)
    }
    val schema = corpus.schema
    val q = graft.streaming.StreamingOps.streamIndexMaintenance(
      spark, src, schema, path)
    q.awaitTermination(120000)
    val direct = IncrementalDedup.windowIndex(corpus)
    val log = graft.delta.DeltaLog.forPath(spark, path)
    val filesBefore = log.update().allFiles.size
    assert(filesBefore >= 4, s"expected one file per micro-batch, got $filesBefore")

    // OPTIMIZE: repack the accreted small files; content must not move
    graft.delta.Optimize.compact(spark, log)
    val filesAfter = log.update().allFiles.size
    assert(filesAfter < filesBefore, s"compact $filesBefore -> $filesAfter")
    val afterCompact = DeltaTable.forPath(spark, path).toDF
    assert(afterCompact.count() == direct.count())
    assert(afterCompact.except(direct).isEmpty && direct.except(afterCompact).isEmpty)

    // CHECKPOINT, then prove replay is O(checkpoint): every JSON commit
    // BELOW the checkpoint version is moved away — a fresh log replay
    // must load from the checkpoint alone (+ the tail, here just v_cp)
    val cpV = graft.delta.Checkpoints.checkpoint(log)
    assert(log.lastCheckpointVersion().contains(cpV))
    val logDir = java.nio.file.Paths.get(path, "_delta_log")
    val moved = java.nio.file.Files.createTempDirectory("graft-incdedup-moved")
    java.nio.file.Files.list(logDir).iterator().forEachRemaining { p =>
      val n = p.getFileName.toString
      if (n.endsWith(".json") && n.takeWhile(_ != '.').toLongOption.exists(_ < cpV))
        java.nio.file.Files.move(p, moved.resolve(n))
    }
    graft.delta.DeltaLog.clearCache()
    val replayed = DeltaTable.forPath(spark, path).toDF
    assert(replayed.count() == direct.count())
    assert(replayed.except(direct).isEmpty && direct.except(replayed).isEmpty)

    // the CAS state survived compact + checkpoint + log truncation: a
    // full stream replay (fresh stream checkpoint → batchIds 0..3 again)
    // must be a no-op commit-for-commit
    val q2 = graft.streaming.StreamingOps.streamIndexMaintenance(
      spark, src, schema, path)
    q2.awaitTermination(120000)
    assert(DeltaTable.forPath(spark, path).toDF.count() == direct.count())

    // ... and the next daily batch still lands normally
    IncrementalDedup.appendToIndex(spark, path, batch, txnVersion = 10L)
    val full = IncrementalDedup.windowIndex(docs.where(
      IncrementalDedup.corpusFilter || IncrementalDedup.batchFilter))
    val finalIdx = DeltaTable.forPath(spark, path).toDF
    assert(finalIdx.count() == full.count())
    assert(finalIdx.except(full).isEmpty && full.except(finalIdx).isEmpty)
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
