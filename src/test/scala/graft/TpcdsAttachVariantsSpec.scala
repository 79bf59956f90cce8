package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference benches TPC-DS in three access-path variants — plain
  * `delta_scan` views, `delta_attach` (catalog ATTACH), and
  * `delta_attach_pin` (ATTACH + PIN_SNAPSHOT) — asserting identical
  * results across them (benchmark/benchmark.Makefile:43-58). This spec is
  * the analog: one representative verbatim TPC-DS body (q86: web_sales rollup
  * with grouping()-ranked hierarchy — non-empty at the spec's sf0.001) runs over (a) the oracle-gated
  * DeltaTable views, (b) views through GraftCatalog-attached `graft.*`
  * names, and (c) views over pinned snapshots, and all three result sets
  * must be byte-identical. The access path must never change answers.
  */
class TpcdsAttachVariantsSpec extends AnyFunSuite {
  import TestSpark._

  private val body = TpcdsQueries.sql("tpcds_q86")
  // q86's derivation reads lineitem+orders (web_sales/date_dim) and part
  // (item); the two delta-backed ones are the access paths under test
  private val deltaBacked = Seq("lineitem", "orders")

  private def run(): Array[String] =
    spark.sql(body).collect().map(_.toString).sorted

  test("tpcds_q86 is identical over view, catalog-attach, and pinned-snapshot paths") {
    // (a) baseline: the gate's own views
    RelationalQueries.ensureViews(spark, sfDir)
    val viaViews = run()
    assert(viaViews.nonEmpty)

    // (b) catalog attach: graft.<name> tables re-exposed under the view
    // names the body references (ATTACH analog)
    spark.conf.set("spark.sql.catalog.graft", "graft.delta.GraftCatalog")
    deltaBacked.foreach { t =>
      graft.delta.GraftCatalog.attach(s"tpcds_av_$t", Fixtures.delta(spark, sfDir, t, Fixtures.Plain))
      spark.sql(s"CREATE OR REPLACE TEMP VIEW $t AS SELECT * FROM graft.tpcds_av_$t")
    }
    val viaAttach = run()

    // (c) pinned snapshots (PIN_SNAPSHOT analog)
    deltaBacked.foreach { t =>
      val p = Fixtures.delta(spark, sfDir, t, Fixtures.Plain)
      delta.DeltaTable.forPath(spark, p).pin().toDF.createOrReplaceTempView(t)
    }
    val viaPin = run()

    // restore the shared views for later suites before asserting (the
    // ensureViews cache still thinks they're registered, so re-register
    // the two we overwrote exactly as it would)
    deltaBacked.foreach { t =>
      val p = Fixtures.delta(spark, sfDir, t, Fixtures.Plain)
      delta.DeltaTable.forPath(spark, p).toDF.createOrReplaceTempView(t)
    }

    assert(viaAttach.sameElements(viaViews), "catalog-attach path diverged")
    assert(viaPin.sameElements(viaViews), "pinned-snapshot path diverged")
  }
}
