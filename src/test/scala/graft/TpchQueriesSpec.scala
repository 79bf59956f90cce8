package graft

import org.scalatest.funsuite.AnyFunSuite

/** Verbatim TPC-H q01–q22 (TpchQueries): every body must analyze and
  * execute over the derivation layer; the value-level gate is the
  * driver's DuckDB oracle (tpch_q* rows in CORRECTNESS). Non-emptiness
  * is asserted for the queries whose predicates are dense enough to
  * survive sf0.001's tiny dims (200 parts / 10 suppliers); the sparse
  * ones (q17's 1-in-1000 part filter and friends) are asserted
  * non-empty by the oracle gate at sf0.01+, where their expected
  * cardinalities are comfortably positive.
  */
class TpchQueriesSpec extends AnyFunSuite {
  import TestSpark._

  private val nonEmptyAtTinySf = Set(
    "tpch_q01", "tpch_q03", "tpch_q04", "tpch_q05", "tpch_q06", "tpch_q09",
    "tpch_q10", "tpch_q12", "tpch_q13", "tpch_q16", "tpch_q18")

  // scalar-aggregate bodies: always exactly one row (possibly NULL-valued)
  private val scalarRow = Set("tpch_q06", "tpch_q14", "tpch_q17", "tpch_q19")

  TpchQueries.sql.toSeq.sortBy(_._1).foreach { case (name, q) =>
    test(s"$name executes over the derivation layer") {
      TpchQueries.ensureViews(spark, sfDir)
      val rows = spark.sql(q).collect()
      if (scalarRow.contains(name)) assert(rows.length === 1)
      if (nonEmptyAtTinySf.contains(name))
        assert(rows.nonEmpty, s"$name unexpectedly empty at sf0.001")
    }
  }

  test("derivation yields dyadic discounts/taxes and integer prices (exact-sum invariant)") {
    TpchQueries.ensureViews(spark, sfDir)
    // l_discount is k/64, l_tax is k/128, money is integer-valued: every
    // product the bodies form is exactly representable, so SUMs are
    // order-independent and the DuckDB compare cannot flake on ties.
    val bad = spark.sql(
      s"""WITH ${TpchQueries.sparkDeriv}
         |SELECT count(*) AS n FROM lineitem
         |WHERE l_discount * 64 <> floor(l_discount * 64)
         |   OR l_tax * 128 <> floor(l_tax * 128)
         |   OR l_extendedprice <> floor(l_extendedprice)""".stripMargin)
      .collect()(0).getLong(0)
    assert(bad === 0L)
  }
}
