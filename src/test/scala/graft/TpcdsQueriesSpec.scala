package graft

import org.scalatest.funsuite.AnyFunSuite

/** Verbatim TPC-DS q01–q99 (TpcdsQueries): the value-level gate is the
  * driver's DuckDB oracle (tpcds_q* rows in CORRECTNESS), so this spec
  * guards the two things the oracle can't see until a full Verify
  * cycle: (1) the registry is complete — all 99 canonical bodies, no
  * gaps; (2) every body still ANALYZES over the derivation layer
  * (column renames or CTE drift in `derivations` break name resolution
  * here, at test time, instead of mid-gate). Analysis-only on purpose:
  * executing 99 star-schema derivations would dominate suite wall
  * time for coverage the sf0.01 oracle pass already owns.
  */
class TpcdsQueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("all 99 canonical TPC-DS queries are registered, q1..q99 with no gaps") {
    val names = TpcdsQueries.sql.keySet
    val expected = (1 to 99).map(n => s"tpcds_q$n").toSet
    assert(names === expected,
      s"missing: ${(expected -- names).toSeq.sorted.mkString(",")}; " +
        s"extra: ${(names -- expected).toSeq.sorted.mkString(",")}")
  }

  TpcdsQueries.sql.toSeq.sortBy(_._1).foreach { case (name, q) =>
    test(s"$name analyzes over the derivation layer") {
      RelationalQueries.ensureViews(spark, sfDir)
      // Resolution + type-checking only; no job runs.
      spark.sql(q).queryExecution.analyzed
    }
  }
}
