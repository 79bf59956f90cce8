package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference benches TPC-DS in three access-path variants — plain
  * `delta_scan` views, `delta_attach` (catalog ATTACH), and
  * `delta_attach_pin` (ATTACH + PIN_SNAPSHOT) — asserting identical
  * results across them (benchmark/benchmark.Makefile:43-58). This spec is
  * the analog over the shapes most likely to diverge across access paths:
  * q86 (web_sales rollup with grouping()-ranked hierarchy — non-empty at
  * the spec's sf0.001), q14 (INTERSECT + rollup over a cross-channel
  * scalar), q36 (GROUPING() rank partition), q70 (GROUPING() rank
  * partition over store hierarchy), q67 (top-k per group over a rollup),
  * q23 (multi-CTE frequent-items). Each body runs over (a) the
  * oracle-gated DeltaTable views, (b) views through GraftCatalog-attached
  * `graft.*` names, and (c) views over pinned snapshots, and all three
  * result sets must be byte-identical. The access path must never change
  * answers.
  *
  * Cleanup is unconditional (try/finally): the variant runs overwrite the
  * shared `lineitem`/`orders`/`customer` temp views, and a failure
  * mid-variant must not leave later suites reading test-local views.
  */
class TpcdsAttachVariantsSpec extends AnyFunSuite {
  import TestSpark._

  // Delta-backed base tables the TPC-DS derivations read; re-pointing
  // these re-points every derived tpcds view (the dims stay parquet)
  private val deltaBacked = Seq("lineitem", "orders", "customer")

  private def run(body: String): Array[String] =
    spark.sql(body).collect().map(_.toString).sorted

  private def restoreViews(): Unit = deltaBacked.foreach { t =>
    val p = Fixtures.delta(spark, sfDir, t, Fixtures.Plain)
    delta.DeltaTable.forPath(spark, p).toDF.createOrReplaceTempView(t)
  }

  private def threePathIdentity(name: String, mustBeNonEmpty: Boolean): Unit = {
    val body = TpcdsQueries.sql(name)

    // (a) baseline: the gate's own views
    RelationalQueries.ensureViews(spark, sfDir)
    restoreViews() // a prior test may have left variant views behind
    val viaViews = run(body)
    if (mustBeNonEmpty) assert(viaViews.nonEmpty, s"$name empty at spec sf")

    try {
      // (b) catalog attach: graft.<name> tables re-exposed under the view
      // names the derivations reference (ATTACH analog)
      spark.conf.set("spark.sql.catalog.graft", "graft.delta.GraftCatalog")
      deltaBacked.foreach { t =>
        graft.delta.GraftCatalog.attach(
          s"tpcds_av_$t", Fixtures.delta(spark, sfDir, t, Fixtures.Plain))
        spark.sql(s"CREATE OR REPLACE TEMP VIEW $t AS SELECT * FROM graft.tpcds_av_$t")
      }
      val viaAttach = run(body)

      // (c) pinned snapshots (PIN_SNAPSHOT analog)
      deltaBacked.foreach { t =>
        val p = Fixtures.delta(spark, sfDir, t, Fixtures.Plain)
        delta.DeltaTable.forPath(spark, p).pin().toDF.createOrReplaceTempView(t)
      }
      val viaPin = run(body)

      assert(viaAttach.sameElements(viaViews), s"$name: catalog-attach path diverged")
      assert(viaPin.sameElements(viaViews), s"$name: pinned-snapshot path diverged")
    } finally {
      restoreViews()
      deltaBacked.foreach(t => graft.delta.GraftCatalog.detach(s"tpcds_av_$t"))
    }
  }

  test("tpcds_q86 is identical over view, catalog-attach, and pinned-snapshot paths") {
    threePathIdentity("tpcds_q86", mustBeNonEmpty = true)
  }
  test("tpcds_q14 (INTERSECT + rollup scalar) is access-path invariant") {
    threePathIdentity("tpcds_q14", mustBeNonEmpty = false)
  }
  test("tpcds_q36 (GROUPING() rank partition) is access-path invariant") {
    threePathIdentity("tpcds_q36", mustBeNonEmpty = false)
  }
  test("tpcds_q70 (GROUPING() rank over store hierarchy) is access-path invariant") {
    threePathIdentity("tpcds_q70", mustBeNonEmpty = false)
  }
  test("tpcds_q67 (top-k per rollup group) is access-path invariant") {
    threePathIdentity("tpcds_q67", mustBeNonEmpty = false)
  }
  test("tpcds_q23 (multi-CTE frequent-items) is access-path invariant") {
    threePathIdentity("tpcds_q23", mustBeNonEmpty = false)
  }
}
