package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.delta._

/** Foreign-writer interop: hand-authored logs (DAT analog) read correctly —
  * the shapes our own writer never emits. */
class ForeignInteropSpec extends AnyFunSuite {
  import TestSpark._

  test("foreign inlined log: absolute paths, URL-encoded names, reconciliation") {
    val p = ForeignFixtures.inline(spark, sfDir)
    val got = DeltaTable.forPath(spark, p).toDF
    val want = Fixtures.readNormalized(spark, sfDir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // unknown configuration keys ride along inertly
    val conf = DeltaTable.forPath(spark, p).snapshot.metadata.configuration
    assert(conf.contains("delta.constraints.key_is_positive"))
    assert(conf.get("foreign.writer.custom").contains("yes"))
  }

  test("foreign stats shapes: partial/absent stats never mis-prune") {
    val p = ForeignFixtures.inline(spark, sfDir)
    // n_nationkey >= 10 hits all three files; B has minValues-only stats
    // and C has none — both MUST survive pruning
    val got = DeltaTable.forPath(spark, p).toDF
      .filter(col("n_nationkey") >= 10)
    val want = Fixtures.readNormalized(spark, sfDir, "nation")
      .filter(col("n_nationkey") >= 10)
      .select("n_nationkey", "n_name", "n_regionkey")
    assert(got.count() == want.count())
    // ...while a fully-stats'd predicate still skips: keys %3==0 live only
    // in file-a, whose full stats allow skipping the others where bounds
    // are present (prune soundness is the assertion; skipping is bonus)
    val zero = DeltaTable.forPath(spark, p).toDF.filter(col("n_nationkey") === 0)
    assert(zero.count() == 1)
  }

  test("foreign checkpoint layout decodes via fallback; v0 json deleted") {
    val p = ForeignFixtures.checkpointed(spark, sfDir)
    assert(!new java.io.File(p, "_delta_log/00000000000000000000.json").exists())
    val got = DeltaTable.forPath(spark, p).toDF
    val want = Fixtures.readNormalized(spark, sfDir, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
