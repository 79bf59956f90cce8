package graft

/**
 * Verbatim TPC-DS texture over the TPC-DS schema (reference:
 * benchmark/tpcds/sf1/local/delta/q01..q99.benchmark runs the real 99
 * queries over store_sales etc.). The repo's ds_* rows are TPC-DS-
 * *shaped* analogs over the TPC-H/events schema; the rows here close the
 * gap for the most plan-diverse of the real queries — q64 (the
 * 18-relation snowflake self-join), q67 (rollup + rank window), q72
 * (10-way join with two LEFT OUTERs and a date-offset predicate), q78
 * (three channel CTEs full-outer-composed), q88 (eight scalar-subquery
 * cross join), q95 (CTE self-join + double IN-subquery) — with their
 * ORIGINAL query bodies.
 *
 * The TPC-DS tables are a DERIVATION LAYER: dialect-common SQL CTEs that
 * build the star schema deterministically from the driver's testdata
 * views (lineitem/orders/customer/part/supplier) with pure key
 * arithmetic — every sk is a modulus of a base key, every monetary
 * column an integer floor, every date `DATE '1998-01-01' + day_sk` —
 * so Spark (delta-backed views) and the DuckDB oracle (raw parquet)
 * derive bit-identical tables and the SAME full query text runs on
 * both engines. Money is integer-valued (floor at derivation) so every
 * verbatim sum() compares exactly across engines with no rounding
 * epsilon.
 *
 * Dialect adjustments to the canonical bodies, each forced by a real
 * cross-engine difference and none changing the plan shape:
 *  - integer-typed `sum(...)` outputs carry `CAST(... AS BIGINT)`
 *    (q4's double sums excepted) — DuckDB promotes integer sums to
 *    int128 while Spark stays 64-bit (the repo's oracle-parity rule),
 *  - q11/q21/q78: decimal ratio idioms (`x*1.0000 / y`, decimal-literal
 *    bounds) → `CAST(x AS DOUBLE) / y` (decimal precision/scale
 *    propagation differs between engines near compare boundaries; IEEE
 *    double division is bit-identical),
 *  - q78: the `round(ratio, 2)` output is an integer-scaled
 *    `CAST(floor(x*100.0/y) AS BIGINT)` — round-half behavior on .xx5
 *    ties differs between Spark (BigDecimal shortest-repr HALF_UP) and
 *    DuckDB (binary half-away-from-zero), so rounding a ratio is a
 *    latent flake even when the current data dodges the tie; floor of
 *    an identical IEEE division is bit-identical by construction,
 *  - q38/q87: the bare `count(*)` output gains an alias (Spark's
 *    parquet writer rejects parens in column names),
 *  - q95: output aliases `"order count"` → `order_count` etc. (Spark's
 *    parquet writer rejects spaces in column names, and the driver
 *    compares by column name),
 *  - q95: the template's `cast(... AS date) + 60 days` is pre-resolved
 *    to the literal date (template macro syntax, not SQL),
 *  - q47: ORDER BY extended from (deviation, s_store_name) to the
 *    deviation plus output ordinals 1..10 — the canonical sort is not
 *    total, and a LIMIT 100 under a non-total order is nondeterministic
 *    across engines (DuckDB's own tpcds extension ships this same
 *    ordinal-extended form),
 *  - q3/q33/q52/q55/q75: ORDER BY extended with remaining group-key
 *    columns for the same reason (sums can tie under LIMIT),
 *  - q5/q80: the ROLLUP output sort carries explicit NULLS FIRST
 *    (Spark defaults ASC NULLS FIRST, DuckDB NULLS LAST — under
 *    LIMIT that difference selects different rows; q67 precedent),
 *  - q12/q20/q98: the revenue-ratio `sum(x)*100/sum(sum(x)) over (…)`
 *    computes through CAST(… AS DOUBLE) on both operands (the decimal
 *    idiom difference, q11/q78 precedent; the division is exact-over-
 *    exact so the DOUBLE output is bit-identical cross-engine),
 *  - q23/q42/q13/q45/q61/q85/q96: unaliased aggregate/substr outputs
 *    gain aliases (Spark's parquet writer rejects parens in column
 *    names and the driver compares columns by name), and q23's two
 *    unaliased derived tables gain aliases (Spark requires them),
 *  - q18: the `avg(cast(x AS decimal(12,2)))` idiom computes through
 *    CAST(… AS DOUBLE) (decimal precision/scale propagation differs;
 *    avg of exact integer sums is bit-identical in DOUBLE),
 *  - q61: the promotions/total ratio computes through CAST(… AS
 *    DOUBLE) and is aliased (same decimal-idiom class),
 *  - q27/q18: rollup sorts carry NULLS FIRST (the q5/q80 rule),
 *  - q79: ORDER BY extended with ss_ticket_number (ties under LIMIT),
 *  - q54: the canonical `cast((revenue/50) as int)` becomes
 *    `CAST(floor(revenue / 50) AS INT)` — DuckDB's CAST-to-int rounds
 *    half away while Spark truncates (the r13 derivation rule, now in
 *    a query body),
 *  - date windows: the template macro `+ N days` is written as the
 *    dialect-common `(CAST('…' AS date) + N)` (q95 precedent),
 *  - q17/q39: `stddev_samp(x)` expands to the exact-sum formula
 *    `sqrt((n*sum(x*x) - sum(x)^2) / NULLIF(n*(n-1), 0))` over
 *    CAST(… AS DOUBLE) operands — both engines stream variance with
 *    different merge orders, so the aggregate itself is not
 *    bit-reproducible cross-engine, while the formula over exact
 *    integer sums (< 2^53) is; NULLIF keeps the n=1 case NULL on both
 *    (DuckDB yields NULL for 0/0, Spark NaN); q39's `*1.000` decimal
 *    idiom is dropped in the same rewrite,
 *  - q2: the seven `round(x/y, 2)` weekday ratios are integer-scaled
 *    `CAST(floor(CAST(x AS DOUBLE)*100 / y) AS BIGINT)` (the q78
 *    round-half rule) and the unaliased seventh gains alias r7,
 *  - q62/q99: the five latency-bucket outputs `"30 days"` … `">120
 *    days"` become days_30 … days_over_120 (parquet rejects spaces),
 *    with the q12 BIGINT cast,
 *  - q44: ORDER BY extended with the two product-name outputs (rank
 *    ties under LIMIT; q47 rule),
 *  - q49/q90: `cast(… as decimal(15,4))` ratio casts → CAST(… AS
 *    DOUBLE) (the q11/q78 decimal-idiom rule),
 *  - q83: the `*1.0000 / … / 3.0000` decimal ladder computes through
 *    CAST(… AS DOUBLE) (same rule).
 *
 * Scale notes (100 TB lens): the facts derive from lineitem⋈orders on
 * the orderkey — Catalyst plans that join before every query, the same
 * single shuffle the underlying star tables would have been bucketed by;
 * the dims all derive via DISTINCT over ≤500-row domains, so every
 * dim join in the bodies broadcasts (AQE sizes them post-derivation).
 */
object TpcdsQueries {

  /** The star-schema derivation CTEs (dialect-common; see object doc).
    * Naming constraint: in DuckDB every CTE in a WITH clause shadows a
    * same-named base table for the WHOLE clause (even references in
    * earlier CTEs), and self-reference is a circular-CTE error — so the
    * `customer` CTE derives from orders' DISTINCT custkeys, and NOTHING
    * here reads the base customer view; the demographic/address/income
    * dims derive their dense 0..N-1 sk domains from part's dense keys. */
  private val derivations: String =
    """date_dim AS (
      |  SELECT d_date_sk, d_date, year(d_date) AS d_year, month(d_date) AS d_moy,
      |         CAST((d_date_sk + 4) % 7 AS BIGINT) AS d_dow,
      |         CASE CAST((d_date_sk + 4) % 7 AS BIGINT)
      |              WHEN 0 THEN 'Sunday' WHEN 1 THEN 'Monday'
      |              WHEN 2 THEN 'Tuesday' WHEN 3 THEN 'Wednesday'
      |              WHEN 4 THEN 'Thursday' WHEN 5 THEN 'Friday'
      |              ELSE 'Saturday' END AS d_day_name,
      |         quarter(d_date) AS d_qoy, dayofmonth(d_date) AS d_dom,
      |         (year(d_date) - 1900) * 12 + month(d_date) - 1 AS d_month_seq,
      |         CAST(floor(d_date_sk / 7) AS BIGINT) AS d_week_seq,
      |         concat(year(d_date), 'Q', quarter(d_date)) AS d_quarter_name
      |  FROM (SELECT dd AS d_date_sk, DATE '1998-01-01' + CAST(dd AS INT) AS d_date
      |        FROM (SELECT DISTINCT o_orderkey % 1826 AS dd FROM orders) dk) db),
      |time_dim AS (
      |  SELECT t_time_sk, t_time_sk AS t_time, t_hour,
      |         CAST(floor((t_time_sk % 3600) / 60) AS BIGINT) AS t_minute,
      |         CASE WHEN t_hour BETWEEN 6 AND 8 THEN 'breakfast'
      |              WHEN t_hour BETWEEN 17 AND 19 THEN 'dinner'
      |              ELSE NULL END AS t_meal_time
      |  FROM (SELECT t_time_sk, CAST(floor(t_time_sk / 3600) AS BIGINT) AS t_hour
      |        FROM (SELECT DISTINCT (l_orderkey * 100 + l_linenumber) % 86400 AS t_time_sk
      |              FROM lineitem) tk0) tk),
      |item AS (
      |  SELECT p_partkey AS i_item_sk, concat('I', p_partkey) AS i_item_id,
      |         p_name AS i_product_name,
      |         p_name AS i_item_desc,
      |         -- the 10 canonical TPC-DS categories: q12/q20/q98 need
      |         -- Sports+Books+Home, q33 Electronics, q54 Women, q56 all,
      |         -- q60 Music, q61 Jewelry, q75 Books
      |         CASE p_partkey % 10 WHEN 0 THEN 'Books' WHEN 1 THEN 'Children'
      |              WHEN 2 THEN 'Electronics' WHEN 3 THEN 'Home'
      |              WHEN 4 THEN 'Jewelry' WHEN 5 THEN 'Men'
      |              WHEN 6 THEN 'Music' WHEN 7 THEN 'Shoes'
      |              WHEN 8 THEN 'Sports' ELSE 'Women' END AS i_category,
      |         -- maternity spans two of the seven residues: q54's cohort
      |         -- (Women+maternity bought in one month) must be wide enough
      |         -- that its 3-month store-revenue follow-up window hits the
      |         -- two-visit-dates-per-customer ticket model at the gate sf
      |         CASE (p_partkey * 11) % 7 WHEN 0 THEN 'maternity'
      |              WHEN 1 THEN 'maternity' WHEN 2 THEN 'classical'
      |              WHEN 3 THEN 'fiction' WHEN 4 THEN 'wireless'
      |              WHEN 5 THEN 'dresses' ELSE 'pants' END AS i_class,
      |         -- TPC-DS brand vocabulary (q53/q63 name 8 brands across two
      |         -- (category x class) arms; the other 4 round out a 12-name
      |         -- domain so brand grouping stays non-trivial)
      |         CASE (p_partkey * 7) % 12
      |              WHEN 0 THEN 'scholaramalgamalg #14'
      |              WHEN 1 THEN 'scholaramalgamalg #7'
      |              WHEN 2 THEN 'exportiunivamalg #9'
      |              WHEN 3 THEN 'scholaramalgamalg #9'
      |              WHEN 4 THEN 'amalgimporto #1'
      |              WHEN 5 THEN 'edu packscholar #1'
      |              WHEN 6 THEN 'exportiimporto #1'
      |              WHEN 7 THEN 'importoamalg #1'
      |              WHEN 8 THEN 'exportischolar #1'
      |              WHEN 9 THEN 'corpnameless #2'
      |              WHEN 10 THEN 'amalgamalg #5'
      |              ELSE 'univunivamalg #8' END AS i_brand,
      |         CAST(1 + p_partkey % 11 AS INT) AS i_brand_id,
      |         CAST(1 + p_partkey % 17 AS INT) AS i_class_id,
      |         CAST(1 + p_partkey % 5 AS INT) AS i_category_id,
      |         -- 7p mod 400: each mod-5 category class owns 80 of the 400
      |         -- manufact ids, so q33's IN-subquery filter is selective;
      |         -- a 16% hot override maps onto q37's four validation ids
      |         -- (677/940/694/808 all exceed 400) so that query's
      |         -- manufact+price+inventory conjunction is populated at the
      |         -- sf0.01 gate scale
      |         CAST(CASE p_partkey % 25 WHEN 0 THEN 677 WHEN 1 THEN 940
      |              WHEN 2 THEN 694 WHEN 3 THEN 808 WHEN 4 THEN 977
      |              WHEN 5 THEN 821 WHEN 6 THEN 938 WHEN 7 THEN 350
      |              WHEN 19 THEN 738 + (p_partkey * 3) % 40
      |              ELSE 1 + (p_partkey * 7) % 400 END AS INT) AS i_manufact_id,
      |         CAST(1 + (p_partkey * 13) % 100 AS INT) AS i_manager_id,
      |         CAST(p_partkey % 100 AS DOUBLE) AS i_current_price,
      |         CASE p_partkey % 12 WHEN 0 THEN 'purple' WHEN 1 THEN 'burlywood'
      |              WHEN 2 THEN 'indian' WHEN 3 THEN 'spring' WHEN 4 THEN 'floral'
      |              WHEN 5 THEN 'medium' WHEN 6 THEN 'snow' WHEN 7 THEN 'slate'
      |              WHEN 8 THEN 'blanched' WHEN 9 THEN 'burnished'
      |              WHEN 10 THEN 'peach' ELSE 'papaya' END AS i_color,
      |         -- sizes/units from the canonical q41 OR-arm vocabulary so the
      |         -- (category, color, units, size) conjunctions have members
      |         -- size keys off floor(p/12), decorrelated from the small
      |         -- moduli driving category/color/units: q41 conjoins all four
      |         CASE CAST(floor(p_partkey / 12) AS BIGINT) % 6 WHEN 0 THEN 'medium'
      |              WHEN 1 THEN 'extra large' WHEN 2 THEN 'N/A'
      |              WHEN 3 THEN 'small' WHEN 4 THEN 'petite'
      |              ELSE 'large' END AS i_size,
      |         CASE (p_partkey * 3) % 10 WHEN 0 THEN 'Ounce' WHEN 1 THEN 'Oz'
      |              WHEN 2 THEN 'Bunch' WHEN 3 THEN 'Ton' WHEN 4 THEN 'Each'
      |              WHEN 5 THEN 'Dozen' WHEN 6 THEN 'Gross' WHEN 7 THEN 'Cup'
      |              WHEN 8 THEN 'N/A' ELSE 'Pallet' END AS i_units,
      |         concat('manufact',
      |           CASE p_partkey % 25 WHEN 0 THEN 677 WHEN 1 THEN 940
      |                WHEN 2 THEN 694 WHEN 3 THEN 808 WHEN 4 THEN 977
      |                WHEN 5 THEN 821 WHEN 6 THEN 938 WHEN 7 THEN 350
      |                WHEN 19 THEN 738 + (p_partkey * 3) % 40
      |                ELSE 1 + (p_partkey * 7) % 400 END) AS i_manufact,
      |         CAST((p_partkey * 7) % 80 AS DOUBLE) AS i_wholesale_cost
      |  FROM part),
      |store AS (
      |  SELECT sk AS s_store_sk, concat('ST', sk) AS s_store_id,
      |         CASE WHEN sk % 2 = 0 THEN 'ese' ELSE 'able' END AS s_store_name,
      |         concat('CO', sk % 3) AS s_company_name,
      |         'Williamson County' AS s_county,
      |         CASE sk % 5 WHEN 0 THEN 'TN' WHEN 1 THEN 'TX' WHEN 2 THEN 'CA'
      |              WHEN 3 THEN 'IL' ELSE 'NY' END AS s_state,
      |         -- store zips are drawn from customer_address's canonical
      |         -- zip domain: q24 equi-joins ca_zip = s_zip and q8 matches
      |         -- on the 2-char prefix
      |         CASE sk % 4 WHEN 0 THEN '24128' WHEN 1 THEN '76232'
      |              WHEN 2 THEN '65084' ELSE '87816' END AS s_zip,
      |         CAST(1 + sk % 10 AS BIGINT) AS s_market_id,
      |         CASE WHEN sk % 2 = 0 THEN 'Midway' ELSE 'Fairview' END AS s_city,
      |         CAST(sk % 3 AS BIGINT) AS s_company_id,
      |         concat('', 100 + sk) AS s_street_number,
      |         'Main' AS s_street_name, 'St' AS s_street_type,
      |         concat('Suite ', sk) AS s_suite_number,
      |         CAST(200 + sk * 7 AS BIGINT) AS s_number_employees,
      |         CAST(-5 AS DOUBLE) AS s_gmt_offset
      |  FROM (SELECT DISTINCT s_suppkey % 10 AS sk FROM supplier) sks),
      |catalog_page AS (
      |  SELECT cpk AS cp_catalog_page_sk, concat('CP', cpk) AS cp_catalog_page_id
      |  FROM (SELECT DISTINCT p_partkey % 15 AS cpk FROM part) cpks),
      |reason AS (
      |  -- rk=3 carries the validation-parameter description 'reason 28'
      |  SELECT rk AS r_reason_sk,
      |         CASE rk WHEN 3 THEN 'reason 28'
      |              ELSE concat('reason ', rk) END AS r_reason_desc
      |  FROM (SELECT DISTINCT s_suppkey % 8 AS rk FROM supplier) rks),
      |warehouse AS (
      |  SELECT wk AS w_warehouse_sk, concat('WH', wk) AS w_warehouse_name,
      |         CAST(1000 * (1 + wk) AS BIGINT) AS w_warehouse_sq_ft,
      |         CASE WHEN wk % 2 = 0 THEN 'Midway' ELSE 'Fairview' END AS w_city,
      |         'Williamson County' AS w_county,
      |         CASE wk % 5 WHEN 0 THEN 'TN' WHEN 1 THEN 'TX' WHEN 2 THEN 'CA'
      |              WHEN 3 THEN 'IL' ELSE 'NY' END AS w_state,
      |         'United States' AS w_country
      |  FROM (SELECT DISTINCT s_suppkey % 5 AS wk FROM supplier) wks),
      |ship_mode AS (
      |  -- carriers cover q66's ('DHL','BARIAN') filter; sm_type is the
      |  -- canonical five-value domain (q62/q99 group by it)
      |  SELECT smk AS sm_ship_mode_sk,
      |         CASE smk % 5 WHEN 0 THEN 'EXPRESS' WHEN 1 THEN 'NEXT DAY'
      |              WHEN 2 THEN 'OVERNIGHT' WHEN 3 THEN 'REGULAR'
      |              ELSE 'LIBRARY' END AS sm_type,
      |         CASE smk % 4 WHEN 0 THEN 'DHL' WHEN 1 THEN 'BARIAN'
      |              WHEN 2 THEN 'UPS' ELSE 'AIRBORNE' END AS sm_carrier
      |  FROM (SELECT DISTINCT s_suppkey % 20 AS smk FROM supplier) smks),
      |web_site AS (
      |  SELECT wk AS web_site_sk, concat('WS', wk) AS web_site_id,
      |         CASE WHEN wk % 2 = 0 THEN 'pri' ELSE 'sec' END AS web_company_name,
      |         concat('site_', wk) AS web_name
      |  FROM (SELECT DISTINCT s_suppkey % 5 AS wk FROM supplier) wsks),
      |call_center AS (
      |  -- q16 keeps only 'Williamson County' centers, so all centers
      |  -- carry it (the canonical IN-list repeats that one county 5x)
      |  SELECT cck AS cc_call_center_sk, concat('CC', cck) AS cc_call_center_id,
      |         'Williamson County' AS cc_county,
      |         CASE cck % 4 WHEN 0 THEN 'NY Metro' WHEN 1 THEN 'Mid Atlantic'
      |              WHEN 2 THEN 'North Midwest' ELSE 'California' END AS cc_name,
      |         concat('Manager', cck) AS cc_manager
      |  FROM (SELECT DISTINCT s_suppkey % 4 AS cck FROM supplier) ccks),
      |web_page AS (
      |  SELECT wpk AS wp_web_page_sk, concat('WP', wpk) AS wp_web_page_id,
      |         CAST(4000 + wpk * 150 AS BIGINT) AS wp_char_count
      |  FROM (SELECT DISTINCT p_partkey % 12 AS wpk FROM part) wpks),
      |income_band AS (
      |  -- contiguous 10k bands: q84's [38128, 88128] bound filter keeps
      |  -- bands 4..7 (lower >= 38128 and upper <= 88128)
      |  SELECT ibk AS ib_income_band_sk,
      |         CAST(ibk * 10000 AS BIGINT) AS ib_lower_bound,
      |         CAST(ibk * 10000 + 9999 AS BIGINT) AS ib_upper_bound
      |  FROM (SELECT DISTINCT p_partkey % 10 AS ibk FROM part) ibks),
      |promotion AS (
      |  SELECT p_promo_sk,
      |         CASE WHEN p_promo_sk % 4 = 0 THEN 'Y' ELSE 'N' END AS p_channel_tv,
      |         CASE WHEN (p_promo_sk * 3) % 5 = 0 THEN 'Y' ELSE 'N' END AS p_channel_dmail,
      |         CASE WHEN (p_promo_sk * 7) % 4 = 0 THEN 'Y' ELSE 'N' END AS p_channel_email,
      |         CASE WHEN (p_promo_sk * 11) % 3 = 0 THEN 'Y' ELSE 'N' END AS p_channel_event
      |  FROM (SELECT DISTINCT p_partkey % 20 AS p_promo_sk FROM part) pks),
      |customer_demographics AS (
      |  -- gender draws from ck/4 so every (marital, gender) pair exists;
      |  -- education from 3k mod 7 so every (marital, gender, education)
      |  -- triple q7/q13/q18/q27 names has a demo_sk in 0..99
      |  SELECT ck AS cd_demo_sk,
      |         CASE ck % 4 WHEN 0 THEN 'D' WHEN 1 THEN 'M' WHEN 2 THEN 'S'
      |              ELSE 'W' END AS cd_marital_status,
      |         CASE WHEN CAST(floor(ck / 4) AS BIGINT) % 2 = 0 THEN 'M'
      |              ELSE 'F' END AS cd_gender,
      |         CASE (ck * 3) % 7 WHEN 0 THEN 'Primary' WHEN 1 THEN 'Secondary'
      |              WHEN 2 THEN 'College' WHEN 3 THEN '2 yr Degree'
      |              WHEN 4 THEN '4 yr Degree' WHEN 5 THEN 'Advanced Degree'
      |              ELSE 'Unknown' END AS cd_education_status,
      |         CAST(500 * (1 + ck % 20) AS BIGINT) AS cd_purchase_estimate,
      |         CASE (ck * 7) % 4 WHEN 0 THEN 'Good' WHEN 1 THEN 'High Risk'
      |              WHEN 2 THEN 'Low Risk' ELSE 'Unknown' END AS cd_credit_rating,
      |         CAST(ck % 7 AS BIGINT) AS cd_dep_count,
      |         CAST((ck * 3) % 5 AS BIGINT) AS cd_dep_employed_count,
      |         CAST((ck * 7) % 3 AS BIGINT) AS cd_dep_college_count
      |  FROM (SELECT DISTINCT p_partkey % 100 AS ck FROM part) cks),
      |household_demographics AS (
      |  SELECT hk AS hd_demo_sk, hk % 10 AS hd_income_band_sk,
      |         -- '>10000' feeds q34/q72/q73's filters; 'Unknown' feeds
      |         -- q91's LIKE 'Unknown%' (keyed hk%7=3 so it reaches hk=17,
      |         -- the one hd residue q91's cd-class customers can carry)
      |         CASE WHEN hk % 3 = 0 THEN '>10000'
      |              WHEN hk % 7 = 3 THEN 'Unknown'
      |              ELSE '5001-10000' END AS hd_buy_potential,
      |         CAST(hk % 10 AS BIGINT) AS hd_dep_count,
      |         -- 1..3 (never 0): q34's dep/vehicle > 1.2 ratio filter must
      |         -- keep a workable share of households (~1/3 of hk values)
      |         CAST(1 + hk % 3 AS BIGINT) AS hd_vehicle_count
      |  FROM (SELECT DISTINCT p_partkey % 50 AS hk FROM part) hks),
      |customer_address AS (
      |  SELECT ak AS ca_address_sk, concat('', ak % 1000) AS ca_street_number,
      |         concat('Street ', ak % 20) AS ca_street_name,
      |         CASE ak % 5 WHEN 0 THEN 'St' WHEN 1 THEN 'Ave' WHEN 2 THEN 'Blvd'
      |              WHEN 3 THEN 'Ln' ELSE 'Way' END AS ca_street_type,
      |         concat('Suite ', ak % 10) AS ca_suite_number,
      |         CASE ak % 3 WHEN 0 THEN 'apartment' WHEN 1 THEN 'condo'
      |              ELSE 'single family' END AS ca_location_type,
      |         -- 'Edgewood' anchors q84's city filter; the rest keep the
      |         -- generated-city spread for q46/q68's city <> city compare
      |         -- Edgewood sits at residue 6: its customers (c with
      |         -- (13c+7)%500 = 6 mod 30) then all carry hd income band 4,
      |         -- inside q84's [38128, 88128] bound window
      |         CASE ak % 30 WHEN 6 THEN 'Edgewood' WHEN 1 THEN 'Fairview'
      |              WHEN 2 THEN 'Midway' ELSE concat('City', ak % 30) END AS ca_city,
      |         -- 25 canonical zips: the first 21 sit in q8's 400-zip list,
      |         -- the last 4 in q15/q45's 9-zip list; the first 4 double as
      |         -- the store zips (q24 joins ca_zip = s_zip)
      |         CASE ak % 25 WHEN 0 THEN '24128' WHEN 1 THEN '76232'
      |              WHEN 2 THEN '65084' WHEN 3 THEN '87816' WHEN 4 THEN '83926'
      |              WHEN 5 THEN '77556' WHEN 6 THEN '20548' WHEN 7 THEN '26231'
      |              WHEN 8 THEN '43848' WHEN 9 THEN '15126' WHEN 10 THEN '91137'
      |              WHEN 11 THEN '61265' WHEN 12 THEN '98294' WHEN 13 THEN '25782'
      |              WHEN 14 THEN '17920' WHEN 15 THEN '18426' WHEN 16 THEN '98235'
      |              WHEN 17 THEN '40081' WHEN 18 THEN '84093' WHEN 19 THEN '28577'
      |              WHEN 20 THEN '55565' WHEN 21 THEN '85669' WHEN 22 THEN '86197'
      |              WHEN 23 THEN '88274' ELSE '83405' END AS ca_zip,
      |         -- every address in a STORE state (TN/TX/CA/IL/NY) sits in
      |         -- Williamson County — the county-state correlation makes
      |         -- q54's ca_county = s_county AND ca_state = s_state match
      |         -- deterministic for ~30% of customers instead of hanging
      |         -- on a 7-customer cohort x 6% coincidence; other states
      |         -- draw counties from the tens digit (q18's rollup grid)
      |         CASE WHEN ak % 20 IN (18, 4, 19, 1, 0, 2) THEN 'Williamson County'
      |              ELSE CASE CAST(floor(ak / 10) AS BIGINT) % 10
      |                   WHEN 3 THEN 'Rush County' WHEN 4 THEN 'Toole County'
      |                   WHEN 5 THEN 'Jefferson County'
      |                   WHEN 6 THEN 'Dona Ana County'
      |                   WHEN 7 THEN 'La Porte County'
      |                   WHEN 8 THEN 'Franklin Parish' WHEN 9 THEN 'Luce County'
      |                   ELSE 'Williamson County' END END AS ca_county,
      |         -- keyed mod 5 (not mod 4): q91's cd-class customers all
      |         -- carry odd ak, and a mod-4 key would leave -7 unreachable
      |         -- for them; -5 doubles up because q33/q56/q60/q61's
      |         -- cohorts all filter on it
      |         CAST(CASE ak % 5 WHEN 0 THEN -7 WHEN 1 THEN -5
      |              WHEN 2 THEN -5 WHEN 3 THEN -6 ELSE -8 END AS DOUBLE) AS ca_gmt_offset,
      |         CASE ak % 20 WHEN 0 THEN 'IL' WHEN 1 THEN 'CA' WHEN 2 THEN 'NY'
      |              WHEN 3 THEN 'GA' WHEN 4 THEN 'TX' WHEN 5 THEN 'IN'
      |              WHEN 6 THEN 'OH' WHEN 7 THEN 'NJ' WHEN 8 THEN 'WI'
      |              WHEN 9 THEN 'CT' WHEN 10 THEN 'KY' WHEN 11 THEN 'LA'
      |              WHEN 12 THEN 'IA' WHEN 13 THEN 'AR' WHEN 14 THEN 'MS'
      |              WHEN 15 THEN 'OR' WHEN 16 THEN 'NM' WHEN 17 THEN 'VA'
      |              WHEN 18 THEN 'TN' ELSE 'TX' END AS ca_state,
      |         'United States' AS ca_country
      |  FROM (SELECT DISTINCT p_partkey % 500 AS ak FROM part) aks),
      |customer AS (
      |  SELECT o_custkey AS c_customer_sk,
      |         concat('CUST', o_custkey) AS c_customer_id,
      |         concat('F', o_custkey % 7) AS c_first_name,
      |         concat('L', o_custkey % 13) AS c_last_name,
      |         CASE o_custkey % 6 WHEN 0 THEN 'Mr.' WHEN 1 THEN 'Mrs.'
      |              WHEN 2 THEN 'Ms.' WHEN 3 THEN 'Dr.' WHEN 4 THEN 'Miss'
      |              ELSE 'Sir' END AS c_salutation,
      |         CASE WHEN o_custkey % 2 = 0 THEN 'Y' ELSE 'N' END
      |           AS c_preferred_cust_flag,
      |         concat('BC', o_custkey % 11) AS c_birth_country,
      |         concat('log', o_custkey) AS c_login,
      |         concat('e', o_custkey, '@example.com') AS c_email_address,
      |         (o_custkey * 7 + 3) % 100 AS c_current_cdemo_sk,
      |         (o_custkey * 11 + 1) % 50 AS c_current_hdemo_sk,
      |         (o_custkey * 13 + 7) % 500 AS c_current_addr_sk,
      |         CAST(1 + (o_custkey * 23) % 12 AS BIGINT) AS c_birth_month,
      |         CAST(1 + (o_custkey * 37) % 28 AS BIGINT) AS c_birth_day,
      |         CAST(1924 + (o_custkey * 31) % 69 AS BIGINT) AS c_birth_year,
      |         (o_custkey * 29 + 11) % 1826 AS c_last_review_date_sk,
      |         (o_custkey * 17) % 1826 AS c_first_sales_date_sk,
      |         (o_custkey * 19 + 30) % 1826 AS c_first_shipto_date_sk
      |  FROM (SELECT DISTINCT o_custkey FROM orders) ck),
      |store_sales AS (
      |  -- Ticket/date model (q23/q34 reachability): a ticket is one
      |  -- customer VISIT — two visit windows per customer, ticket =
      |  -- o_custkey*2+win, and the whole visit shares ONE sold date
      |  -- derived from (customer, window), so per-ticket line counts
      |  -- reach q34's 15..20 band and date filters keep whole tickets.
      |  -- A 20% "hot" slice ((l_orderkey*7+l_linenumber)%5=0) instead
      |  -- concentrates item+date into a 40x60 promo grid (~5 rows per
      |  -- (item,date) cell) so q23's HAVING count(*) > 4 has members.
      |  -- balanced-week slice ((o+p)%29=0, ln%6=0, ~0.6% of rows): the
      |  -- row lands in the week of 2000-01-03 (sks 728..734) with the
      |  -- SAME date and ext price in all three channels, so q58's
      |  -- per-item cross-channel +-10% revenue test has members
      |  SELECT CASE WHEN (l_orderkey + l_partkey) % 29 = 0
      |                   AND l_linenumber % 6 = 0
      |              THEN 728 + l_orderkey % 7
      |              WHEN (l_orderkey * 7 + l_linenumber) % 5 = 0
      |              THEN ((l_partkey % 40) * 45 + o_orderkey % 60) % 1826
      |              ELSE (o_custkey * 389
      |                    + CAST(floor((o_orderkey % 1826) / 913) AS BIGINT) * 457
      |                    + 17) % 1826 END AS ss_sold_date_sk,
      |         (l_orderkey * 100 + l_linenumber) % 86400 AS ss_sold_time_sk,
      |         CASE WHEN (l_orderkey * 7 + l_linenumber) % 5 = 0
      |              THEN l_partkey % 40 ELSE l_partkey END AS ss_item_sk,
      |         o_custkey AS ss_customer_sk,
      |         o_custkey % 100 AS ss_cdemo_sk,
      |         -- 7c+3, NOT c: cdemo and hdemo both key off the customer,
      |         -- and with both ≡ c the parity of a marital-status residue
      |         -- fixes the parity of hd_dep_count — q13's (S, dep=1)
      |         -- branch would be structurally unsatisfiable
      |         (o_custkey * 7 + 3) % 50 AS ss_hdemo_sk,
      |         -- rare NULL slices (coprime residues, ~2-3% of rows):
      |         -- q44's benchmark scalar needs store-4 rows with NULL addr,
      |         -- q76's store arm counts sales with NULL store
      |         CASE WHEN (l_orderkey * 5 + l_linenumber) % 37 = 0
      |              THEN CAST(NULL AS BIGINT)
      |              ELSE o_custkey % 500 END AS ss_addr_sk,
      |         CASE WHEN (l_orderkey * 3 + l_linenumber) % 41 = 0
      |              THEN CAST(NULL AS BIGINT)
      |              ELSE l_suppkey % 10 END AS ss_store_sk,
      |         l_partkey % 20 AS ss_promo_sk,
      |         o_custkey * 2 + CAST(floor((o_orderkey % 1826) / 913) AS BIGINT)
      |           AS ss_ticket_number,
      |         CAST(l_quantity AS BIGINT) AS ss_quantity,
      |         CAST(floor(l_extendedprice * 0.7) AS BIGINT) AS ss_wholesale_cost,
      |         CAST(floor(l_extendedprice) AS BIGINT) AS ss_list_price,
      |         -- sales_price / net_profit are PER-UNIT scale (canonical
      |         -- TPC-DS band predicates — q13's 50..200, q85's 50..300 —
      |         -- name per-unit dollars; the ext_* columns keep line totals)
      |         CAST(floor(l_extendedprice * (1 - l_discount) / (l_quantity * 10)) AS BIGINT) AS ss_sales_price,
      |         CAST(floor(l_extendedprice * l_discount) AS BIGINT) AS ss_coupon_amt,
      |         CAST(floor(l_extendedprice * 1.05) AS BIGINT) AS ss_ext_list_price,
      |         CAST(floor(l_extendedprice * 0.7) AS BIGINT) AS ss_ext_wholesale_cost,
      |         CAST(floor(l_extendedprice * l_discount) AS BIGINT) AS ss_ext_discount_amt,
      |         CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT) AS ss_ext_sales_price,
      |         CAST(floor(l_extendedprice * 0.08 / l_quantity) AS BIGINT) AS ss_net_profit,
      |         CAST(floor(l_extendedprice * 0.06) AS BIGINT) AS ss_ext_tax,
      |         CAST(floor(l_extendedprice * (1 - l_discount) * 0.98) AS BIGINT) AS ss_net_paid
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |store_returns AS (
      |  -- item/ticket expressions MIRROR store_sales (returns must
      |  -- reference the sale's hot-mapped item and merged ticket)
      |  SELECT CASE WHEN (l_orderkey * 7 + l_linenumber) % 5 = 0
      |              THEN l_partkey % 40 ELSE l_partkey END AS sr_item_sk,
      |         o_custkey * 2 + CAST(floor((o_orderkey % 1826) / 913) AS BIGINT)
      |           AS sr_ticket_number,
      |         -- returned = the SALE's date (mirroring store_sales' CASE)
      |         -- plus a 1..120-day lag: q25/q29/q50 chain sale month ->
      |         -- return window -> catalog window, which an independent
      |         -- return date reduces to a triple coincidence
      |         (CASE WHEN (l_orderkey * 7 + l_linenumber) % 5 = 0
      |               THEN ((l_partkey % 40) * 45 + o_orderkey % 60) % 1826
      |               ELSE (o_custkey * 389
      |                     + CAST(floor((o_orderkey % 1826) / 913) AS BIGINT) * 457
      |                     + 17) % 1826 END
      |          + 1 + l_orderkey % 120) % 1826 AS sr_returned_date_sk,
      |         o_custkey AS sr_customer_sk, l_suppkey % 10 AS sr_store_sk,
      |         -- mirrors the customer's c_current_cdemo_sk (7c+3 mod 100)
      |         -- so q84's sr_cdemo = cd_demo = c_current_cdemo triple holds
      |         (o_custkey * 7 + 3) % 100 AS sr_cdemo_sk,
      |         (l_orderkey + l_partkey) % 8 AS sr_reason_sk,
      |         CAST(floor(l_quantity / 2) AS BIGINT) AS sr_return_quantity,
      |         CAST(floor(l_extendedprice * 0.4) AS BIGINT) AS sr_return_amt,
      |         CAST(floor(l_extendedprice * 0.15) AS BIGINT) AS sr_net_loss
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R'),
      |catalog_sales AS (
      |  -- hot slice mirrors store_sales' promo grid (items % 40) and
      |  -- lands its sold dates in a Jan-Apr 2000 window so q23's
      |  -- best-customer x frequent-item probe month is populated
      |  SELECT CASE WHEN (l_orderkey + l_partkey) % 29 = 0
      |                   AND l_linenumber % 6 = 0
      |              THEN 728 + l_orderkey % 7
      |              WHEN (l_orderkey * 7 + l_linenumber) % 5 = 0
      |              THEN 730 + (l_partkey * 3 + o_orderkey) % 120
      |              ELSE (o_orderkey * 3 + 1) % 1826 END AS cs_sold_date_sk,
      |         (o_orderkey * 3 + 11) % 1826 AS cs_ship_date_sk,
      |         o_custkey AS cs_bill_customer_sk,
      |         o_custkey AS cs_ship_customer_sk,
      |         (l_orderkey * 100 + l_linenumber) % 86400 AS cs_sold_time_sk,
      |         o_custkey % 100 AS cs_bill_cdemo_sk,
      |         o_custkey % 50 AS cs_bill_hdemo_sk,
      |         (o_custkey * 13 + 7) % 500 AS cs_bill_addr_sk,
      |         -- rare NULL slice: q76's catalog arm counts NULL-ship-addr
      |         CASE WHEN (l_orderkey * 7 + l_linenumber) % 47 = 0
      |              THEN CAST(NULL AS BIGINT)
      |              ELSE (o_custkey * 11 + 3) % 500 END AS cs_ship_addr_sk,
      |         o_custkey % 4 AS cs_call_center_sk,
      |         (l_orderkey + l_linenumber * 7) % 20 AS cs_ship_mode_sk,
      |         l_suppkey % 5 AS cs_warehouse_sk,
      |         l_partkey % 15 AS cs_catalog_page_sk,
      |         CASE WHEN (l_orderkey * 7 + l_linenumber) % 5 = 0
      |              THEN l_partkey % 40 ELSE l_partkey END AS cs_item_sk,
      |         l_partkey % 25 AS cs_promo_sk,
      |         l_orderkey AS cs_order_number,
      |         CAST(l_quantity AS BIGINT) AS cs_quantity,
      |         CAST(floor(l_extendedprice * 1.08) AS BIGINT) AS cs_list_price,
      |         CAST(floor(l_extendedprice * 0.6) AS BIGINT) AS cs_wholesale_cost,
      |         CAST(floor(l_extendedprice * (1 - l_discount) / (l_quantity * 10)) AS BIGINT) AS cs_sales_price,
      |         CAST(floor(l_extendedprice * 1.1) AS BIGINT) AS cs_ext_list_price,
      |         CAST(floor(l_extendedprice * 0.55) AS BIGINT) AS cs_ext_wholesale_cost,
      |         CAST(floor(l_extendedprice * l_discount * 0.9) AS BIGINT) AS cs_ext_discount_amt,
      |         -- balanced-week rows carry the store-channel ext price so
      |         -- q58's per-item cross-channel +-10% revenue test can hold
      |         CASE WHEN (l_orderkey + l_partkey) % 29 = 0
      |                   AND l_linenumber % 6 = 0
      |              THEN CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT)
      |              ELSE CAST(floor(l_extendedprice * (1 - l_discount) * 0.95) AS BIGINT)
      |              END AS cs_ext_sales_price,
      |         CAST(floor(l_extendedprice * l_discount * 0.85) AS BIGINT) AS cs_coupon_amt,
      |         CAST(floor(l_extendedprice * 0.03) AS BIGINT) AS cs_ext_ship_cost,
      |         CAST(floor(l_extendedprice * 0.07 / l_quantity) AS BIGINT) AS cs_net_profit,
      |         CAST(floor(l_extendedprice * (1 - l_discount) * 0.93) AS BIGINT) AS cs_net_paid,
      |         CAST(floor(l_extendedprice * (1 - l_discount) * 0.93) +
      |              floor(l_extendedprice * 0.06) AS BIGINT) AS cs_net_paid_inc_tax
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_linenumber % 2 = 0),
      |catalog_returns AS (
      |  SELECT CASE WHEN (l_orderkey * 7 + l_linenumber) % 5 = 0
      |              THEN l_partkey % 40 ELSE l_partkey END AS cr_item_sk,
      |         l_orderkey AS cr_order_number,
      |         -- l_orderkey stands in for o_orderkey inside the date
      |         -- expression (they are equal on the orders join, kept
      |         -- verbatim from the pre-join derivation)
      |         -- an l%9 slice lands in Nov 1998 (sks 304..333): q91's
      |         -- month filter intersects a ~1% customer cohort, and a
      |         -- uniform return date would starve it at the gate sf
      |         CASE WHEN l_orderkey % 9 = 0
      |              THEN 304 + (l_orderkey * 5 + l_partkey) % 30
      |              ELSE (CASE WHEN (l_orderkey * 7 + l_linenumber) % 5 = 0
      |                    THEN 730 + (l_partkey * 3 + l_orderkey) % 120
      |                    ELSE (l_orderkey * 3 + 1) % 1826 END
      |               + 1 + l_orderkey % 120) % 1826 END AS cr_returned_date_sk,
      |         l_partkey % 15 AS cr_catalog_page_sk,
      |         -- returning customer/addr/call-center mirror catalog_sales'
      |         -- bill columns (q81 chains return -> state -> customer via
      |         -- the customer's own current address; q91 joins the center)
      |         o_custkey AS cr_returning_customer_sk,
      |         (o_custkey * 13 + 7) % 500 AS cr_returning_addr_sk,
      |         o_custkey % 4 AS cr_call_center_sk,
      |         CAST(floor(l_quantity / 2) AS BIGINT) AS cr_return_quantity,
      |         CAST(floor(l_extendedprice * 0.3) AS BIGINT) AS cr_refunded_cash,
      |         CAST(floor(l_extendedprice * 0.1) AS BIGINT) AS cr_reversed_charge,
      |         CAST(floor(l_extendedprice * 0.05) AS BIGINT) AS cr_store_credit,
      |         CAST(floor(l_extendedprice * 0.35) AS BIGINT) AS cr_return_amount,
      |         CAST(floor(l_extendedprice * 0.38) AS BIGINT) AS cr_return_amt_inc_tax,
      |         CAST(floor(l_extendedprice * 0.12) AS BIGINT) AS cr_net_loss
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R' AND l_linenumber % 2 = 0),
      |web_sales AS (
      |  -- the o%11 slice concentrates ~9% of web sales into Q2-Q3 2000:
      |  -- q31 compares per-county web vs store quarter-over-quarter
      |  -- growth, and with both channels date-uniform every county's
      |  -- ratios sit at 1.0 +- noise and the strict inequalities never
      |  -- hold; a real web growth phase gives the comparison members
      |  SELECT CASE WHEN (l_orderkey + l_partkey) % 29 = 0
      |                   AND l_linenumber % 6 = 0
      |              THEN 728 + l_orderkey % 7
      |              WHEN (l_orderkey * 7 + l_linenumber) % 5 = 0
      |                   AND o_orderkey % 4 = 0
      |              THEN 730 + (l_partkey * 5 + o_orderkey) % 120
      |              WHEN o_orderkey % 6 = 0
      |              THEN 821 + (o_orderkey * 3) % 183
      |              ELSE (o_orderkey * 7 + 3) % 1826 END AS ws_sold_date_sk,
      |         (o_orderkey * 7 + 40) % 1826 AS ws_ship_date_sk,
      |         CASE WHEN (l_orderkey * 7 + l_linenumber) % 5 = 0
      |              THEN l_partkey % 40 ELSE l_partkey END AS ws_item_sk,
      |         o_custkey AS ws_bill_customer_sk,
      |         -- rare NULL slice: q76's web arm counts NULL-ship-customer
      |         CASE WHEN (l_orderkey + l_linenumber) % 43 = 0
      |              THEN CAST(NULL AS BIGINT)
      |              ELSE o_custkey END AS ws_ship_customer_sk,
      |         (o_custkey * 13 + 7) % 500 AS ws_bill_addr_sk,
      |         (o_custkey * 3 + 11) % 500 AS ws_ship_addr_sk,
      |         (o_custkey * 3 + 1) % 50 AS ws_ship_hdemo_sk,
      |         (l_orderkey * 3 + l_linenumber) % 20 AS ws_ship_mode_sk,
      |         l_suppkey % 5 AS ws_web_site_sk, l_suppkey % 5 AS ws_warehouse_sk,
      |         l_partkey % 20 AS ws_promo_sk,
      |         l_partkey % 12 AS ws_web_page_sk,
      |         (l_orderkey * 100 + l_linenumber) % 86400 AS ws_sold_time_sk,
      |         l_orderkey AS ws_order_number,
      |         CAST(l_quantity AS BIGINT) AS ws_quantity,
      |         CAST(floor(l_extendedprice * 1.04) AS BIGINT) AS ws_list_price,
      |         CAST(floor(l_extendedprice * 0.5) AS BIGINT) AS ws_wholesale_cost,
      |         CAST(floor(l_extendedprice * (1 - l_discount) / (l_quantity * 10)) AS BIGINT) AS ws_sales_price,
      |         CAST(floor(l_extendedprice * 0.02) AS BIGINT) AS ws_ext_ship_cost,
      |         CAST(floor(l_extendedprice * 0.08 / l_quantity) AS BIGINT) AS ws_net_profit,
      |         CAST(floor(l_extendedprice * 1.02) AS BIGINT) AS ws_ext_list_price,
      |         CAST(floor(l_extendedprice * 0.45) AS BIGINT) AS ws_ext_wholesale_cost,
      |         CAST(floor(l_extendedprice * l_discount * 0.8) AS BIGINT) AS ws_ext_discount_amt,
      |         -- balanced-week override, mirroring catalog (q58)
      |         CASE WHEN (l_orderkey + l_partkey) % 29 = 0
      |                   AND l_linenumber % 6 = 0
      |              THEN CAST(floor(l_extendedprice * (1 - l_discount)) AS BIGINT)
      |              ELSE CAST(floor(l_extendedprice * (1 - l_discount) * 0.9) AS BIGINT)
      |              END AS ws_ext_sales_price,
      |         CAST(floor(l_extendedprice * (1 - l_discount) * 0.88) AS BIGINT) AS ws_net_paid
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_linenumber % 3 = 0),
      |web_returns AS (
      |  SELECT l_orderkey AS wr_order_number,
      |         CASE WHEN (l_orderkey * 7 + l_linenumber) % 5 = 0
      |              THEN l_partkey % 40 ELSE l_partkey END AS wr_item_sk,
      |         (CASE WHEN (l_orderkey * 7 + l_linenumber) % 5 = 0
      |               THEN 730 + (l_partkey * 5 + l_orderkey) % 120
      |               ELSE (l_orderkey * 7 + 3) % 1826 END
      |          + 1 + l_orderkey % 120) % 1826 AS wr_returned_date_sk,
      |         -- refunded = returning: q85's cd1/cd2 equality predicates
      |         -- (same marital, same education across the two roles) are
      |         -- structurally unreachable if the two sks are independent
      |         (l_orderkey * 3 + l_partkey) % 100 AS wr_refunded_cdemo_sk,
      |         (l_orderkey * 3 + l_partkey) % 100 AS wr_returning_cdemo_sk,
      |         (l_orderkey * 13 + 7) % 500 AS wr_refunded_addr_sk,
      |         -- returning customer/addr mirror the customer's own keys
      |         -- (q30 chains return -> state -> customer via the
      |         -- customer's current address, like q81's catalog analog)
      |         o_custkey AS wr_returning_customer_sk,
      |         (o_custkey * 13 + 7) % 500 AS wr_returning_addr_sk,
      |         l_partkey % 12 AS wr_web_page_sk,
      |         (l_orderkey + l_partkey) % 8 AS wr_reason_sk,
      |         CAST(floor(l_extendedprice * 0.25) AS BIGINT) AS wr_refunded_cash,
      |         CAST(floor(l_extendedprice * 0.02) AS BIGINT) AS wr_fee,
      |         CAST(floor(l_quantity / 3) AS BIGINT) AS wr_return_quantity,
      |         CAST(floor(l_extendedprice * 0.3) AS BIGINT) AS wr_return_amt,
      |         CAST(floor(l_extendedprice * 0.1) AS BIGINT) AS wr_net_loss
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_returnflag = 'R' AND l_linenumber % 3 = 0),
      |inventory AS (
      |  -- each (item, warehouse) carries a 23-date cluster (9-day steps,
      |  -- ~198-day span): q21's before/after-boundary split needs BOTH
      |  -- sides of 2000-03-11 populated inside its 60-day window, and
      |  -- q37's 60-day window must hit items pinned to a partkey residue
      |  -- class mod 100 (price+manufact filters), so the per-item base
      |  -- must step densely across each residue class (337*100 mod 1826
      |  -- = 832) AND each cluster must span wider than the windows
      |  SELECT DISTINCT l_partkey AS inv_item_sk,
      |         l_suppkey % 5 AS inv_warehouse_sk,
      |         (l_partkey * 337 + l_suppkey % 5 + (l_orderkey % 23) * 9) % 1826
      |           AS inv_date_sk,
      |         -- bimodal: 1/3 small (0..19, keeps q72's inv < cs_quantity
      |         -- join populated), 2/3 big (100..599, gives q37's
      |         -- BETWEEN 100 AND 500 filter members)
      |         CAST(CASE WHEN (l_partkey + l_suppkey) % 3 = 0
      |              THEN (l_partkey + l_suppkey % 5 + (l_orderkey % 7) * 3) % 20
      |              ELSE 100 + (l_partkey * 3 + l_suppkey % 5 + (l_orderkey % 7) * 7) % 500
      |              END AS BIGINT) AS inv_quantity_on_hand
      |  FROM lineitem)""".stripMargin

  /** Prefix `body` with the derivation CTEs. A body that opens with its
    * own WITH merges into the single clause (SQL allows one WITH). */
  private def wrap(body: String): String = {
    val b = body.trim.stripSuffix(";")
    if (b.toUpperCase.startsWith("WITH "))
      s"WITH $derivations,\n${b.drop(5)}"
    else
      s"WITH $derivations\n$b"
  }

  /** name → full SQL, identical text on Spark and DuckDB. */
  val sql: Map[String, String] = Map(
    // q64: the 18-relation snowflake — store_sales⋈store_returns⋈cs_ui
    // (HAVING over catalog refunds) ⋈ 3 date_dims, 2 cdemo/hdemo/addr
    // roles, income bands, then cross_sales self-joined year-over-year
    "tpcds_q64" -> wrap(
      """WITH cs_ui AS
        |  (SELECT cs_item_sk,
        |          sum(cs_ext_list_price) AS sale,
        |          sum(cr_refunded_cash+cr_reversed_charge+cr_store_credit) AS refund
        |   FROM catalog_sales,
        |        catalog_returns
        |   WHERE cs_item_sk = cr_item_sk
        |     AND cs_order_number = cr_order_number
        |   GROUP BY cs_item_sk
        |   HAVING sum(cs_ext_list_price)>2*sum(cr_refunded_cash+cr_reversed_charge+cr_store_credit)),
        |     cross_sales AS
        |  (SELECT i_product_name product_name,
        |          i_item_sk item_sk,
        |          s_store_name store_name,
        |          s_zip store_zip,
        |          ad1.ca_street_number b_street_number,
        |          ad1.ca_street_name b_street_name,
        |          ad1.ca_city b_city,
        |          ad1.ca_zip b_zip,
        |          ad2.ca_street_number c_street_number,
        |          ad2.ca_street_name c_street_name,
        |          ad2.ca_city c_city,
        |          ad2.ca_zip c_zip,
        |          d1.d_year AS syear,
        |          d2.d_year AS fsyear,
        |          d3.d_year s2year,
        |          count(*) cnt,
        |          CAST(sum(ss_wholesale_cost) AS BIGINT) s1,
        |          CAST(sum(ss_list_price) AS BIGINT) s2,
        |          CAST(sum(ss_coupon_amt) AS BIGINT) s3
        |   FROM store_sales,
        |        store_returns,
        |        cs_ui,
        |        date_dim d1,
        |        date_dim d2,
        |        date_dim d3,
        |        store,
        |        customer,
        |        customer_demographics cd1,
        |        customer_demographics cd2,
        |        promotion,
        |        household_demographics hd1,
        |        household_demographics hd2,
        |        customer_address ad1,
        |        customer_address ad2,
        |        income_band ib1,
        |        income_band ib2,
        |        item
        |   WHERE ss_store_sk = s_store_sk
        |     AND ss_sold_date_sk = d1.d_date_sk
        |     AND ss_customer_sk = c_customer_sk
        |     AND ss_cdemo_sk= cd1.cd_demo_sk
        |     AND ss_hdemo_sk = hd1.hd_demo_sk
        |     AND ss_addr_sk = ad1.ca_address_sk
        |     AND ss_item_sk = i_item_sk
        |     AND ss_item_sk = sr_item_sk
        |     AND ss_ticket_number = sr_ticket_number
        |     AND ss_item_sk = cs_ui.cs_item_sk
        |     AND c_current_cdemo_sk = cd2.cd_demo_sk
        |     AND c_current_hdemo_sk = hd2.hd_demo_sk
        |     AND c_current_addr_sk = ad2.ca_address_sk
        |     AND c_first_sales_date_sk = d2.d_date_sk
        |     AND c_first_shipto_date_sk = d3.d_date_sk
        |     AND ss_promo_sk = p_promo_sk
        |     AND hd1.hd_income_band_sk = ib1.ib_income_band_sk
        |     AND hd2.hd_income_band_sk = ib2.ib_income_band_sk
        |     AND cd1.cd_marital_status <> cd2.cd_marital_status
        |     AND i_color IN ('purple',
        |                     'burlywood',
        |                     'indian',
        |                     'spring',
        |                     'floral',
        |                     'medium')
        |     AND i_current_price BETWEEN 64 AND 64 + 10
        |     AND i_current_price BETWEEN 64 + 1 AND 64 + 15
        |   GROUP BY i_product_name,
        |            i_item_sk,
        |            s_store_name,
        |            s_zip,
        |            ad1.ca_street_number,
        |            ad1.ca_street_name,
        |            ad1.ca_city,
        |            ad1.ca_zip,
        |            ad2.ca_street_number,
        |            ad2.ca_street_name,
        |            ad2.ca_city,
        |            ad2.ca_zip,
        |            d1.d_year,
        |            d2.d_year,
        |            d3.d_year)
        |SELECT cs1.product_name,
        |       cs1.store_name,
        |       cs1.store_zip,
        |       cs1.b_street_number,
        |       cs1.b_street_name,
        |       cs1.b_city,
        |       cs1.b_zip,
        |       cs1.c_street_number,
        |       cs1.c_street_name,
        |       cs1.c_city,
        |       cs1.c_zip,
        |       cs1.syear cs1syear,
        |       cs1.cnt cs1cnt,
        |       cs1.s1 AS s11,
        |       cs1.s2 AS s21,
        |       cs1.s3 AS s31,
        |       cs2.s1 AS s12,
        |       cs2.s2 AS s22,
        |       cs2.s3 AS s32,
        |       cs2.syear,
        |       cs2.cnt
        |FROM cross_sales cs1,
        |     cross_sales cs2
        |WHERE cs1.item_sk=cs2.item_sk
        |  AND cs1.syear = 1999
        |  AND cs2.syear = 1999 + 1
        |  AND cs2.cnt <= cs1.cnt
        |  AND cs1.store_name = cs2.store_name
        |  AND cs1.store_zip = cs2.store_zip
        |ORDER BY cs1.product_name,
        |         cs1.store_name,
        |         cs2.cnt,
        |         cs1.s1,
        |         cs2.s1""".stripMargin),

    // q1: per-store return-average correlated scalar subquery
    "tpcds_q1" -> wrap(
      """WITH customer_total_return AS
        |  (SELECT sr_customer_sk AS ctr_customer_sk,
        |          sr_store_sk AS ctr_store_sk,
        |          sum(sr_return_amt) AS ctr_total_return
        |   FROM store_returns,
        |        date_dim
        |   WHERE sr_returned_date_sk = d_date_sk
        |     AND d_year = 2000
        |   GROUP BY sr_customer_sk,
        |            sr_store_sk)
        |SELECT c_customer_id
        |FROM customer_total_return ctr1,
        |     store,
        |     customer
        |WHERE ctr1.ctr_total_return >
        |    (SELECT avg(ctr_total_return)*1.2
        |     FROM customer_total_return ctr2
        |     WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
        |  AND s_store_sk = ctr1.ctr_store_sk
        |  AND s_state = 'TN'
        |  AND ctr1.ctr_customer_sk = c_customer_sk
        |ORDER BY c_customer_id
        |LIMIT 100""".stripMargin),

    // q11: q4's two-channel sibling (ratio cast to double — see the
    // dialect-adjustment list)
    "tpcds_q11" -> wrap(
      """WITH year_total AS
        |  (SELECT c_customer_id customer_id,
        |          c_first_name customer_first_name,
        |          c_last_name customer_last_name,
        |          c_preferred_cust_flag customer_preferred_cust_flag,
        |          c_birth_country customer_birth_country,
        |          c_login customer_login,
        |          c_email_address customer_email_address,
        |          d_year dyear,
        |          sum(ss_ext_list_price-ss_ext_discount_amt) year_total,
        |          's' sale_type
        |   FROM customer,
        |        store_sales,
        |        date_dim
        |   WHERE c_customer_sk = ss_customer_sk
        |     AND ss_sold_date_sk = d_date_sk
        |   GROUP BY c_customer_id,
        |            c_first_name,
        |            c_last_name,
        |            c_preferred_cust_flag,
        |            c_birth_country,
        |            c_login,
        |            c_email_address,
        |            d_year
        |   UNION ALL SELECT c_customer_id customer_id,
        |                    c_first_name customer_first_name,
        |                    c_last_name customer_last_name,
        |                    c_preferred_cust_flag customer_preferred_cust_flag,
        |                    c_birth_country customer_birth_country,
        |                    c_login customer_login,
        |                    c_email_address customer_email_address,
        |                    d_year dyear,
        |                    sum(ws_ext_list_price-ws_ext_discount_amt) year_total,
        |                    'w' sale_type
        |   FROM customer,
        |        web_sales,
        |        date_dim
        |   WHERE c_customer_sk = ws_bill_customer_sk
        |     AND ws_sold_date_sk = d_date_sk
        |   GROUP BY c_customer_id,
        |            c_first_name,
        |            c_last_name,
        |            c_preferred_cust_flag,
        |            c_birth_country,
        |            c_login,
        |            c_email_address,
        |            d_year)
        |SELECT t_s_secyear.customer_id,
        |       t_s_secyear.customer_first_name,
        |       t_s_secyear.customer_last_name,
        |       t_s_secyear.customer_preferred_cust_flag
        |FROM year_total t_s_firstyear,
        |     year_total t_s_secyear,
        |     year_total t_w_firstyear,
        |     year_total t_w_secyear
        |WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
        |  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
        |  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
        |  AND t_s_firstyear.sale_type = 's'
        |  AND t_w_firstyear.sale_type = 'w'
        |  AND t_s_secyear.sale_type = 's'
        |  AND t_w_secyear.sale_type = 'w'
        |  AND t_s_firstyear.dyear = 2001
        |  AND t_s_secyear.dyear = 2001+1
        |  AND t_w_firstyear.dyear = 2001
        |  AND t_w_secyear.dyear = 2001+1
        |  AND t_s_firstyear.year_total > 0
        |  AND t_w_firstyear.year_total > 0
        |  AND CASE
        |          WHEN t_w_firstyear.year_total > 0 THEN CAST(t_w_secyear.year_total AS DOUBLE) / t_w_firstyear.year_total
        |          ELSE 0.0
        |      END > CASE
        |                WHEN t_s_firstyear.year_total > 0 THEN CAST(t_s_secyear.year_total AS DOUBLE) / t_s_firstyear.year_total
        |                ELSE 0.0
        |            END
        |ORDER BY t_s_secyear.customer_id NULLS FIRST,
        |         t_s_secyear.customer_first_name NULLS FIRST,
        |         t_s_secyear.customer_last_name NULLS FIRST,
        |         t_s_secyear.customer_preferred_cust_flag NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q21: inventory before/after a date boundary per warehouse/item
    // (ratio + bounds cast to double — see the dialect-adjustment list)
    "tpcds_q21" -> wrap(
      """SELECT *
        |FROM
        |  (SELECT w_warehouse_name,
        |          i_item_id,
        |          CAST(sum(CASE
        |                  WHEN (cast(d_date AS date) < CAST ('2000-03-11' AS date)) THEN inv_quantity_on_hand
        |                  ELSE 0
        |              END) AS BIGINT) AS inv_before,
        |          CAST(sum(CASE
        |                  WHEN (cast(d_date AS date) >= CAST ('2000-03-11' AS date)) THEN inv_quantity_on_hand
        |                  ELSE 0
        |              END) AS BIGINT) AS inv_after
        |   FROM inventory,
        |        warehouse,
        |        item,
        |        date_dim
        |   WHERE i_current_price BETWEEN 0.99 AND 1.49
        |     AND i_item_sk = inv_item_sk
        |     AND inv_warehouse_sk = w_warehouse_sk
        |     AND inv_date_sk = d_date_sk
        |     AND d_date BETWEEN CAST ('2000-02-10' AS date) AND CAST ('2000-04-10' AS date)
        |   GROUP BY w_warehouse_name,
        |            i_item_id) x
        |WHERE (CASE
        |           WHEN inv_before > 0 THEN CAST(inv_after AS DOUBLE) / inv_before
        |           ELSE NULL
        |       END) BETWEEN CAST(2.0 AS DOUBLE)/3.0 AND CAST(3.0 AS DOUBLE)/2.0
        |ORDER BY w_warehouse_name NULLS FIRST,
        |         i_item_id NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q38: three-channel INTERSECT of (last, first, date) — the set-op
    // texture the ds_* analogs only approximate
    "tpcds_q38" -> wrap(
      """SELECT count(*) AS hot_cust_count
        |FROM
        |  (SELECT DISTINCT c_last_name,
        |                   c_first_name,
        |                   d_date
        |   FROM store_sales,
        |        date_dim,
        |        customer
        |   WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |     AND store_sales.ss_customer_sk = customer.c_customer_sk
        |     AND d_month_seq BETWEEN 1200 AND 1200 + 11 INTERSECT
        |     SELECT DISTINCT c_last_name,
        |                     c_first_name,
        |                     d_date
        |     FROM catalog_sales,
        |          date_dim,
        |          customer WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
        |     AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
        |     AND d_month_seq BETWEEN 1200 AND 1200 + 11 INTERSECT
        |     SELECT DISTINCT c_last_name,
        |                     c_first_name,
        |                     d_date
        |     FROM web_sales,
        |          date_dim,
        |          customer WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
        |     AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
        |     AND d_month_seq BETWEEN 1200 AND 1200 + 11 ) hot_cust
        |LIMIT 100""".stripMargin),

    // q87: the EXCEPT complement of q38's INTERSECT
    "tpcds_q87" -> wrap(
      """SELECT count(*) AS cool_cust_count
        |FROM ((SELECT DISTINCT c_last_name,
        |                         c_first_name,
        |                         d_date
        |         FROM store_sales,
        |              date_dim,
        |              customer
        |         WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |           AND store_sales.ss_customer_sk = customer.c_customer_sk
        |           AND d_month_seq BETWEEN 1200 AND 1200+11)
        |      EXCEPT
        |        (SELECT DISTINCT c_last_name,
        |                         c_first_name,
        |                         d_date
        |         FROM catalog_sales,
        |              date_dim,
        |              customer
        |         WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
        |           AND catalog_sales.cs_bill_customer_sk = customer.c_customer_sk
        |           AND d_month_seq BETWEEN 1200 AND 1200+11)
        |      EXCEPT
        |        (SELECT DISTINCT c_last_name,
        |                         c_first_name,
        |                         d_date
        |         FROM web_sales,
        |              date_dim,
        |              customer
        |         WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
        |           AND web_sales.ws_bill_customer_sk = customer.c_customer_sk
        |           AND d_month_seq BETWEEN 1200 AND 1200+11)) cool_cust""".stripMargin),

    // q4: the year-over-year growth query — one 3-channel UNION ALL CTE
    // self-joined SIX ways, the canonical "same CTE many roles" stress
    "tpcds_q4" -> wrap(
      """WITH year_total AS
        |  (SELECT c_customer_id customer_id,
        |          c_first_name customer_first_name,
        |          c_last_name customer_last_name,
        |          c_preferred_cust_flag customer_preferred_cust_flag,
        |          c_birth_country customer_birth_country,
        |          c_login customer_login,
        |          c_email_address customer_email_address,
        |          d_year dyear,
        |          sum(((ss_ext_list_price-ss_ext_wholesale_cost-ss_ext_discount_amt)+ss_ext_sales_price)/2) year_total,
        |          's' sale_type
        |   FROM customer,
        |        store_sales,
        |        date_dim
        |   WHERE c_customer_sk = ss_customer_sk
        |     AND ss_sold_date_sk = d_date_sk
        |   GROUP BY c_customer_id,
        |            c_first_name,
        |            c_last_name,
        |            c_preferred_cust_flag,
        |            c_birth_country,
        |            c_login,
        |            c_email_address,
        |            d_year
        |   UNION ALL SELECT c_customer_id customer_id,
        |                    c_first_name customer_first_name,
        |                    c_last_name customer_last_name,
        |                    c_preferred_cust_flag customer_preferred_cust_flag,
        |                    c_birth_country customer_birth_country,
        |                    c_login customer_login,
        |                    c_email_address customer_email_address,
        |                    d_year dyear,
        |                    sum((((cs_ext_list_price-cs_ext_wholesale_cost-cs_ext_discount_amt)+cs_ext_sales_price)/2)) year_total,
        |                    'c' sale_type
        |   FROM customer,
        |        catalog_sales,
        |        date_dim
        |   WHERE c_customer_sk = cs_bill_customer_sk
        |     AND cs_sold_date_sk = d_date_sk
        |   GROUP BY c_customer_id,
        |            c_first_name,
        |            c_last_name,
        |            c_preferred_cust_flag,
        |            c_birth_country,
        |            c_login,
        |            c_email_address,
        |            d_year
        |   UNION ALL SELECT c_customer_id customer_id,
        |                    c_first_name customer_first_name,
        |                    c_last_name customer_last_name,
        |                    c_preferred_cust_flag customer_preferred_cust_flag,
        |                    c_birth_country customer_birth_country,
        |                    c_login customer_login,
        |                    c_email_address customer_email_address,
        |                    d_year dyear,
        |                    sum((((ws_ext_list_price-ws_ext_wholesale_cost-ws_ext_discount_amt)+ws_ext_sales_price)/2)) year_total,
        |                    'w' sale_type
        |   FROM customer,
        |        web_sales,
        |        date_dim
        |   WHERE c_customer_sk = ws_bill_customer_sk
        |     AND ws_sold_date_sk = d_date_sk
        |   GROUP BY c_customer_id,
        |            c_first_name,
        |            c_last_name,
        |            c_preferred_cust_flag,
        |            c_birth_country,
        |            c_login,
        |            c_email_address,
        |            d_year)
        |SELECT t_s_secyear.customer_id,
        |       t_s_secyear.customer_first_name,
        |       t_s_secyear.customer_last_name,
        |       t_s_secyear.customer_preferred_cust_flag
        |FROM year_total t_s_firstyear,
        |     year_total t_s_secyear,
        |     year_total t_c_firstyear,
        |     year_total t_c_secyear,
        |     year_total t_w_firstyear,
        |     year_total t_w_secyear
        |WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
        |  AND t_s_firstyear.customer_id = t_c_secyear.customer_id
        |  AND t_s_firstyear.customer_id = t_c_firstyear.customer_id
        |  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
        |  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
        |  AND t_s_firstyear.sale_type = 's'
        |  AND t_c_firstyear.sale_type = 'c'
        |  AND t_w_firstyear.sale_type = 'w'
        |  AND t_s_secyear.sale_type = 's'
        |  AND t_c_secyear.sale_type = 'c'
        |  AND t_w_secyear.sale_type = 'w'
        |  AND t_s_firstyear.dyear = 2001
        |  AND t_s_secyear.dyear = 2001+1
        |  AND t_c_firstyear.dyear = 2001
        |  AND t_c_secyear.dyear = 2001+1
        |  AND t_w_firstyear.dyear = 2001
        |  AND t_w_secyear.dyear = 2001+1
        |  AND t_s_firstyear.year_total > 0
        |  AND t_c_firstyear.year_total > 0
        |  AND t_w_firstyear.year_total > 0
        |  AND CASE
        |          WHEN t_c_firstyear.year_total > 0 THEN t_c_secyear.year_total / t_c_firstyear.year_total
        |          ELSE NULL
        |      END > CASE
        |                WHEN t_s_firstyear.year_total > 0 THEN t_s_secyear.year_total / t_s_firstyear.year_total
        |                ELSE NULL
        |            END
        |  AND CASE
        |          WHEN t_c_firstyear.year_total > 0 THEN t_c_secyear.year_total / t_c_firstyear.year_total
        |          ELSE NULL
        |      END > CASE
        |                WHEN t_w_firstyear.year_total > 0 THEN t_w_secyear.year_total / t_w_firstyear.year_total
        |                ELSE NULL
        |            END
        |ORDER BY t_s_secyear.customer_id NULLS FIRST,
        |         t_s_secyear.customer_first_name NULLS FIRST,
        |         t_s_secyear.customer_last_name NULLS FIRST,
        |         t_s_secyear.customer_preferred_cust_flag NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q47: monthly category sales with a windowed average-vs-actual
    // deviation, then a lag/lead self-join on the rank ordinal
    "tpcds_q47" -> wrap(
      """WITH v1 AS
        |  (SELECT i_category,
        |          i_brand,
        |          s_store_name,
        |          s_company_name,
        |          d_year,
        |          d_moy,
        |          CAST(sum(ss_sales_price) AS BIGINT) sum_sales,
        |          avg(sum(ss_sales_price)) OVER (PARTITION BY i_category,
        |                                                      i_brand,
        |                                                      s_store_name,
        |                                                      s_company_name,
        |                                                      d_year) avg_monthly_sales,
        |                                        rank() OVER (PARTITION BY i_category,
        |                                                                  i_brand,
        |                                                                  s_store_name,
        |                                                                  s_company_name
        |                                                     ORDER BY d_year,
        |                                                              d_moy) rn
        |   FROM item,
        |        store_sales,
        |        date_dim,
        |        store
        |   WHERE ss_item_sk = i_item_sk
        |     AND ss_sold_date_sk = d_date_sk
        |     AND ss_store_sk = s_store_sk
        |     AND (d_year = 1999
        |          OR (d_year = 1999-1
        |              AND d_moy =12)
        |          OR (d_year = 1999+1
        |              AND d_moy =1))
        |   GROUP BY i_category,
        |            i_brand,
        |            s_store_name,
        |            s_company_name,
        |            d_year,
        |            d_moy),
        |     v2 AS
        |  (SELECT v1.i_category,
        |          v1.i_brand,
        |          v1.s_store_name,
        |          v1.s_company_name,
        |          v1.d_year,
        |          v1.d_moy,
        |          v1.avg_monthly_sales,
        |          v1.sum_sales,
        |          v1_lag.sum_sales psum,
        |          v1_lead.sum_sales nsum
        |   FROM v1,
        |        v1 v1_lag,
        |        v1 v1_lead
        |   WHERE v1.i_category = v1_lag.i_category
        |     AND v1.i_category = v1_lead.i_category
        |     AND v1.i_brand = v1_lag.i_brand
        |     AND v1.i_brand = v1_lead.i_brand
        |     AND v1.s_store_name = v1_lag.s_store_name
        |     AND v1.s_store_name = v1_lead.s_store_name
        |     AND v1.s_company_name = v1_lag.s_company_name
        |     AND v1.s_company_name = v1_lead.s_company_name
        |     AND v1.rn = v1_lag.rn + 1
        |     AND v1.rn = v1_lead.rn - 1)
        |SELECT *
        |FROM v2
        |WHERE d_year = 1999
        |  AND avg_monthly_sales > 0
        |  AND CASE
        |          WHEN avg_monthly_sales > 0 THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
        |          ELSE NULL
        |      END > 0.1
        |ORDER BY sum_sales - avg_monthly_sales, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10
        |LIMIT 100""".stripMargin),

    // q67: rollup over 8 dims + rank() partitioned by category
    "tpcds_q67" -> wrap(
      """SELECT *
        |FROM
        |  (SELECT i_category,
        |          i_class,
        |          i_brand,
        |          i_product_name,
        |          d_year,
        |          d_qoy,
        |          d_moy,
        |          s_store_id,
        |          sumsales,
        |          rank() OVER (PARTITION BY i_category
        |                       ORDER BY sumsales DESC) rk
        |   FROM
        |     (SELECT i_category,
        |             i_class,
        |             i_brand,
        |             i_product_name,
        |             d_year,
        |             d_qoy,
        |             d_moy,
        |             s_store_id,
        |             CAST(sum(coalesce(ss_sales_price*ss_quantity,0)) AS BIGINT) sumsales
        |      FROM store_sales,
        |           date_dim,
        |           store,
        |           item
        |      WHERE ss_sold_date_sk=d_date_sk
        |        AND ss_item_sk=i_item_sk
        |        AND ss_store_sk = s_store_sk
        |        AND d_month_seq BETWEEN 1200 AND 1200+11
        |      GROUP BY rollup(i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy,s_store_id))dw1) dw2
        |WHERE rk <= 100
        |ORDER BY i_category NULLS FIRST,
        |         i_class NULLS FIRST,
        |         i_brand NULLS FIRST,
        |         i_product_name NULLS FIRST,
        |         d_year NULLS FIRST,
        |         d_qoy NULLS FIRST,
        |         d_moy NULLS FIRST,
        |         s_store_id NULLS FIRST,
        |         sumsales NULLS FIRST,
        |         rk NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q72: 10-way join, two LEFT OUTERs, cross-date-role week match and
    // the d_date + 5 day-offset predicate
    "tpcds_q72" -> wrap(
      """SELECT i_item_desc,
        |       w_warehouse_name,
        |       d1.d_week_seq,
        |       CAST(sum(CASE
        |               WHEN p_promo_sk IS NULL THEN 1
        |               ELSE 0
        |           END) AS BIGINT) no_promo,
        |       CAST(sum(CASE
        |               WHEN p_promo_sk IS NOT NULL THEN 1
        |               ELSE 0
        |           END) AS BIGINT) promo,
        |       count(*) total_cnt
        |FROM catalog_sales
        |JOIN inventory ON (cs_item_sk = inv_item_sk)
        |JOIN warehouse ON (w_warehouse_sk=inv_warehouse_sk)
        |JOIN item ON (i_item_sk = cs_item_sk)
        |JOIN customer_demographics ON (cs_bill_cdemo_sk = cd_demo_sk)
        |JOIN household_demographics ON (cs_bill_hdemo_sk = hd_demo_sk)
        |JOIN date_dim d1 ON (cs_sold_date_sk = d1.d_date_sk)
        |JOIN date_dim d2 ON (inv_date_sk = d2.d_date_sk)
        |JOIN date_dim d3 ON (cs_ship_date_sk = d3.d_date_sk)
        |LEFT OUTER JOIN promotion ON (cs_promo_sk=p_promo_sk)
        |LEFT OUTER JOIN catalog_returns ON (cr_item_sk = cs_item_sk
        |                                    AND cr_order_number = cs_order_number)
        |WHERE d1.d_week_seq = d2.d_week_seq
        |  AND inv_quantity_on_hand < cs_quantity
        |  AND d3.d_date > d1.d_date + 5
        |  AND hd_buy_potential = '>10000'
        |  AND d1.d_year = 1999
        |  AND cd_marital_status = 'D'
        |GROUP BY i_item_desc,
        |         w_warehouse_name,
        |         d1.d_week_seq
        |ORDER BY total_cnt DESC NULLS FIRST,
        |         i_item_desc NULLS FIRST,
        |         w_warehouse_name NULLS FIRST,
        |         d1.d_week_seq NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q78: per-channel return-free CTEs (ss/ws/cs) left-composed,
    // cross-channel quantity ratio
    "tpcds_q78" -> wrap(
      """WITH ws AS
        |  (SELECT d_year AS ws_sold_year,
        |          ws_item_sk,
        |          ws_bill_customer_sk ws_customer_sk,
        |          CAST(sum(ws_quantity) AS BIGINT) ws_qty,
        |          CAST(sum(ws_wholesale_cost) AS BIGINT) ws_wc,
        |          CAST(sum(ws_sales_price) AS BIGINT) ws_sp
        |   FROM web_sales
        |   LEFT JOIN web_returns ON wr_order_number=ws_order_number
        |   AND ws_item_sk=wr_item_sk
        |   JOIN date_dim ON ws_sold_date_sk = d_date_sk
        |   WHERE wr_order_number IS NULL
        |   GROUP BY d_year,
        |            ws_item_sk,
        |            ws_bill_customer_sk ),
        |     cs AS
        |  (SELECT d_year AS cs_sold_year,
        |          cs_item_sk,
        |          cs_bill_customer_sk cs_customer_sk,
        |          CAST(sum(cs_quantity) AS BIGINT) cs_qty,
        |          CAST(sum(cs_wholesale_cost) AS BIGINT) cs_wc,
        |          CAST(sum(cs_sales_price) AS BIGINT) cs_sp
        |   FROM catalog_sales
        |   LEFT JOIN catalog_returns ON cr_order_number=cs_order_number
        |   AND cs_item_sk=cr_item_sk
        |   JOIN date_dim ON cs_sold_date_sk = d_date_sk
        |   WHERE cr_order_number IS NULL
        |   GROUP BY d_year,
        |            cs_item_sk,
        |            cs_bill_customer_sk ),
        |     ss AS
        |  (SELECT d_year AS ss_sold_year,
        |          ss_item_sk,
        |          ss_customer_sk,
        |          CAST(sum(ss_quantity) AS BIGINT) ss_qty,
        |          CAST(sum(ss_wholesale_cost) AS BIGINT) ss_wc,
        |          CAST(sum(ss_sales_price) AS BIGINT) ss_sp
        |   FROM store_sales
        |   LEFT JOIN store_returns ON sr_ticket_number=ss_ticket_number
        |   AND ss_item_sk=sr_item_sk
        |   JOIN date_dim ON ss_sold_date_sk = d_date_sk
        |   WHERE sr_ticket_number IS NULL
        |   GROUP BY d_year,
        |            ss_item_sk,
        |            ss_customer_sk )
        |SELECT ss_sold_year,
        |       ss_item_sk,
        |       ss_customer_sk,
        |       CAST(floor(CAST(ss_qty AS DOUBLE)*100.0/(coalesce(ws_qty,0)+coalesce(cs_qty,0))) AS BIGINT) ratio,
        |       ss_qty store_qty,
        |       ss_wc store_wholesale_cost,
        |       ss_sp store_sales_price,
        |       coalesce(ws_qty,0)+coalesce(cs_qty,0) other_chan_qty,
        |       coalesce(ws_wc,0)+coalesce(cs_wc,0) other_chan_wholesale_cost,
        |       coalesce(ws_sp,0)+coalesce(cs_sp,0) other_chan_sales_price
        |FROM ss
        |LEFT JOIN ws ON (ws_sold_year=ss_sold_year
        |                 AND ws_item_sk=ss_item_sk
        |                 AND ws_customer_sk=ss_customer_sk)
        |LEFT JOIN cs ON (cs_sold_year=ss_sold_year
        |                 AND cs_item_sk=ss_item_sk
        |                 AND cs_customer_sk=ss_customer_sk)
        |WHERE (coalesce(ws_qty,0)>0
        |       OR coalesce(cs_qty, 0)>0)
        |  AND ss_sold_year=2000
        |ORDER BY ss_sold_year,
        |         ss_item_sk,
        |         ss_customer_sk,
        |         ss_qty DESC,
        |         ss_wc DESC,
        |         ss_sp DESC,
        |         other_chan_qty,
        |         other_chan_wholesale_cost,
        |         other_chan_sales_price,
        |         ratio
        |LIMIT 100""".stripMargin),

    // q88: eight half-hour-window count(*) scalar subqueries cross-joined
    // q3: date x item brand agg (ORDER extended with brand: sums can
    // tie across brands sharing a brand_id under LIMIT)
    "tpcds_q3" -> wrap(
      """SELECT dt.d_year,
        |       item.i_brand_id brand_id,
        |       item.i_brand brand,
        |       CAST(sum(ss_ext_sales_price) AS BIGINT) sum_agg
        |FROM date_dim dt,
        |     store_sales,
        |     item
        |WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
        |  AND store_sales.ss_item_sk = item.i_item_sk
        |  AND item.i_manufact_id = 128
        |  AND dt.d_moy = 11
        |GROUP BY dt.d_year,
        |         item.i_brand_id,
        |         item.i_brand
        |ORDER BY dt.d_year,
        |         sum_agg DESC,
        |         brand_id,
        |         brand
        |LIMIT 100""".stripMargin),

    // q5: three-channel sales/returns rollup over per-channel union
    // CTEs (NULLS FIRST on the rollup sort, q67 precedent)
    "tpcds_q5" -> wrap(
      """WITH ssr AS
        | (SELECT s_store_id,
        |         sum(sales_price) AS sales,
        |         sum(profit) AS profit,
        |         sum(return_amt) AS returns,
        |         sum(net_loss) AS profit_loss
        |  FROM
        |    (SELECT ss_store_sk AS store_sk,
        |            ss_sold_date_sk AS date_sk,
        |            ss_ext_sales_price AS sales_price,
        |            ss_net_profit AS profit,
        |            CAST(0 AS BIGINT) AS return_amt,
        |            CAST(0 AS BIGINT) AS net_loss
        |     FROM store_sales
        |     UNION ALL
        |     SELECT sr_store_sk AS store_sk,
        |            sr_returned_date_sk AS date_sk,
        |            CAST(0 AS BIGINT) AS sales_price,
        |            CAST(0 AS BIGINT) AS profit,
        |            sr_return_amt AS return_amt,
        |            sr_net_loss AS net_loss
        |     FROM store_returns) salesreturns,
        |       date_dim,
        |       store
        |  WHERE date_sk = d_date_sk
        |    AND d_date BETWEEN CAST('2000-08-23' AS date) AND (CAST('2000-08-23' AS date) + 14)
        |    AND store_sk = s_store_sk
        |  GROUP BY s_store_id),
        | csr AS
        | (SELECT cp_catalog_page_id,
        |         sum(sales_price) AS sales,
        |         sum(profit) AS profit,
        |         sum(return_amt) AS returns,
        |         sum(net_loss) AS profit_loss
        |  FROM
        |    (SELECT cs_catalog_page_sk AS page_sk,
        |            cs_sold_date_sk AS date_sk,
        |            cs_ext_sales_price AS sales_price,
        |            cs_net_profit AS profit,
        |            CAST(0 AS BIGINT) AS return_amt,
        |            CAST(0 AS BIGINT) AS net_loss
        |     FROM catalog_sales
        |     UNION ALL
        |     SELECT cr_catalog_page_sk AS page_sk,
        |            cr_returned_date_sk AS date_sk,
        |            CAST(0 AS BIGINT) AS sales_price,
        |            CAST(0 AS BIGINT) AS profit,
        |            cr_return_amount AS return_amt,
        |            cr_net_loss AS net_loss
        |     FROM catalog_returns) salesreturns,
        |       date_dim,
        |       catalog_page
        |  WHERE date_sk = d_date_sk
        |    AND d_date BETWEEN CAST('2000-08-23' AS date) AND (CAST('2000-08-23' AS date) + 14)
        |    AND page_sk = cp_catalog_page_sk
        |  GROUP BY cp_catalog_page_id),
        | wsr AS
        | (SELECT web_site_id,
        |         sum(sales_price) AS sales,
        |         sum(profit) AS profit,
        |         sum(return_amt) AS returns,
        |         sum(net_loss) AS profit_loss
        |  FROM
        |    (SELECT ws_web_site_sk AS wsr_web_site_sk,
        |            ws_sold_date_sk AS date_sk,
        |            ws_ext_sales_price AS sales_price,
        |            ws_net_profit AS profit,
        |            CAST(0 AS BIGINT) AS return_amt,
        |            CAST(0 AS BIGINT) AS net_loss
        |     FROM web_sales
        |     UNION ALL
        |     SELECT ws_web_site_sk AS wsr_web_site_sk,
        |            wr_returned_date_sk AS date_sk,
        |            CAST(0 AS BIGINT) AS sales_price,
        |            CAST(0 AS BIGINT) AS profit,
        |            wr_return_amt AS return_amt,
        |            wr_net_loss AS net_loss
        |     FROM web_returns
        |     LEFT OUTER JOIN web_sales ON (wr_item_sk = ws_item_sk
        |                                   AND wr_order_number = ws_order_number)) salesreturns,
        |       date_dim,
        |       web_site
        |  WHERE date_sk = d_date_sk
        |    AND d_date BETWEEN CAST('2000-08-23' AS date) AND (CAST('2000-08-23' AS date) + 14)
        |    AND wsr_web_site_sk = web_site_sk
        |  GROUP BY web_site_id)
        |SELECT channel,
        |       id,
        |       CAST(sum(sales) AS BIGINT) AS sales,
        |       CAST(sum(returns) AS BIGINT) AS returns,
        |       CAST(sum(profit) AS BIGINT) AS profit
        |FROM
        |  (SELECT 'store channel' AS channel,
        |          'store' || s_store_id AS id,
        |          sales,
        |          returns,
        |          (profit - profit_loss) AS profit
        |   FROM ssr
        |   UNION ALL
        |   SELECT 'catalog channel' AS channel,
        |          'catalog_page' || cp_catalog_page_id AS id,
        |          sales,
        |          returns,
        |          (profit - profit_loss) AS profit
        |   FROM csr
        |   UNION ALL
        |   SELECT 'web channel' AS channel,
        |          'web_site' || web_site_id AS id,
        |          sales,
        |          returns,
        |          (profit - profit_loss) AS profit
        |   FROM wsr) x
        |GROUP BY ROLLUP (channel, id)
        |ORDER BY channel NULLS FIRST,
        |         id NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q12: web revenue-share-within-class window over a 30-day window
    // (ratio via DOUBLE casts, q11/q78 precedent; order total by item_id)
    "tpcds_q12" -> wrap(
      """SELECT i_item_id,
        |       i_item_desc,
        |       i_category,
        |       i_class,
        |       i_current_price,
        |       CAST(sum(ws_ext_sales_price) AS BIGINT) AS itemrevenue,
        |       CAST(sum(ws_ext_sales_price) AS DOUBLE) * 100 /
        |         sum(CAST(sum(ws_ext_sales_price) AS DOUBLE)) OVER (PARTITION BY i_class) AS revenueratio
        |FROM web_sales,
        |     item,
        |     date_dim
        |WHERE ws_item_sk = i_item_sk
        |  AND i_category IN ('Sports', 'Books', 'Home')
        |  AND ws_sold_date_sk = d_date_sk
        |  AND d_date BETWEEN CAST('1999-02-22' AS date) AND (CAST('1999-02-22' AS date) + 30)
        |GROUP BY i_item_id,
        |         i_item_desc,
        |         i_category,
        |         i_class,
        |         i_current_price
        |ORDER BY i_category,
        |         i_class,
        |         i_item_id,
        |         i_item_desc,
        |         revenueratio
        |LIMIT 100""".stripMargin),

    // q16: catalog ship-window EXISTS/NOT EXISTS (q94's catalog sibling;
    // distinct-count + shipping/profit rollup, call_center dim)
    "tpcds_q16" -> wrap(
      """SELECT count(DISTINCT cs_order_number) AS order_count,
        |       CAST(sum(cs_ext_ship_cost) AS BIGINT) AS total_shipping_cost,
        |       CAST(sum(cs_net_profit) AS BIGINT) AS total_net_profit
        |FROM catalog_sales cs1,
        |     date_dim,
        |     customer_address,
        |     call_center
        |WHERE d_date BETWEEN '2002-02-01' AND (CAST('2002-02-01' AS date) + 60)
        |  AND cs1.cs_ship_date_sk = d_date_sk
        |  AND cs1.cs_ship_addr_sk = ca_address_sk
        |  AND ca_state = 'GA'
        |  AND cs1.cs_call_center_sk = cc_call_center_sk
        |  AND cc_county IN ('Williamson County', 'Williamson County', 'Williamson County', 'Williamson County', 'Williamson County')
        |  AND EXISTS
        |    (SELECT *
        |     FROM catalog_sales cs2
        |     WHERE cs1.cs_order_number = cs2.cs_order_number
        |       AND cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
        |  AND NOT EXISTS
        |    (SELECT *
        |     FROM catalog_returns cr1
        |     WHERE cs1.cs_order_number = cr1.cr_order_number)
        |ORDER BY count(DISTINCT cs_order_number)
        |LIMIT 100""".stripMargin),

    // q20: catalog analog of q12 (revenue share within class)
    "tpcds_q20" -> wrap(
      """SELECT i_item_id,
        |       i_item_desc,
        |       i_category,
        |       i_class,
        |       i_current_price,
        |       CAST(sum(cs_ext_sales_price) AS BIGINT) AS itemrevenue,
        |       CAST(sum(cs_ext_sales_price) AS DOUBLE) * 100 /
        |         sum(CAST(sum(cs_ext_sales_price) AS DOUBLE)) OVER (PARTITION BY i_class) AS revenueratio
        |FROM catalog_sales,
        |     item,
        |     date_dim
        |WHERE cs_item_sk = i_item_sk
        |  AND i_category IN ('Sports', 'Books', 'Home')
        |  AND cs_sold_date_sk = d_date_sk
        |  AND d_date BETWEEN CAST('1999-02-22' AS date) AND (CAST('1999-02-22' AS date) + 30)
        |GROUP BY i_item_id,
        |         i_item_desc,
        |         i_category,
        |         i_class,
        |         i_current_price
        |ORDER BY i_category,
        |         i_class,
        |         i_item_id,
        |         i_item_desc,
        |         revenueratio
        |LIMIT 100""".stripMargin),

    // q23: frequent items x best customers x probe month (the CTE pair
    // the r13 round skipped as unreachable; the ticket/date model plus
    // the hot item+date promo grid make both HAVING bands populated)
    "tpcds_q23" -> wrap(
      """WITH frequent_ss_items AS
        | (SELECT substr(i_item_desc, 1, 30) itemdesc,
        |         i_item_sk item_sk,
        |         d_date solddate,
        |         count(*) cnt
        |  FROM store_sales,
        |       date_dim,
        |       item
        |  WHERE ss_sold_date_sk = d_date_sk
        |    AND ss_item_sk = i_item_sk
        |    AND d_year IN (2000, 2000 + 1, 2000 + 2, 2000 + 3)
        |  GROUP BY substr(i_item_desc, 1, 30),
        |           i_item_sk,
        |           d_date
        |  HAVING count(*) > 4),
        | max_store_sales AS
        | (SELECT max(csales) tpcds_cmax
        |  FROM
        |    (SELECT c_customer_sk,
        |            sum(ss_quantity * ss_sales_price) csales
        |     FROM store_sales,
        |          customer,
        |          date_dim
        |     WHERE ss_customer_sk = c_customer_sk
        |       AND ss_sold_date_sk = d_date_sk
        |       AND d_year IN (2000, 2000 + 1, 2000 + 2, 2000 + 3)
        |     GROUP BY c_customer_sk) csales_by_cust),
        | best_ss_customer AS
        | (SELECT c_customer_sk,
        |         sum(ss_quantity * ss_sales_price) ssales
        |  FROM store_sales,
        |       customer
        |  WHERE ss_customer_sk = c_customer_sk
        |  GROUP BY c_customer_sk
        |  HAVING sum(ss_quantity * ss_sales_price) > (50 / 100.0) *
        |    (SELECT *
        |     FROM max_store_sales))
        |SELECT CAST(sum(sales) AS BIGINT) AS sum_sales
        |FROM
        |  (SELECT cs_quantity * cs_list_price sales
        |   FROM catalog_sales,
        |        date_dim
        |   WHERE d_year = 2000
        |     AND d_moy = 2
        |     AND cs_sold_date_sk = d_date_sk
        |     AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        |     AND cs_bill_customer_sk IN (SELECT c_customer_sk FROM best_ss_customer)
        |   UNION ALL
        |   SELECT ws_quantity * ws_list_price sales
        |   FROM web_sales,
        |        date_dim
        |   WHERE d_year = 2000
        |     AND d_moy = 2
        |     AND ws_sold_date_sk = d_date_sk
        |     AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        |     AND ws_bill_customer_sk IN (SELECT c_customer_sk FROM best_ss_customer)) all_sales
        |LIMIT 100""".stripMargin),

    // q33: per-manufact three-channel sales for one category's manufact
    // ids (IN-subquery on item; ORDER extended with i_manufact_id)
    "tpcds_q33" -> wrap(
      """WITH ss AS
        | (SELECT i_manufact_id,
        |         sum(ss_ext_sales_price) total_sales
        |  FROM store_sales,
        |       date_dim,
        |       customer_address,
        |       item
        |  WHERE i_manufact_id IN
        |      (SELECT i_manufact_id
        |       FROM item
        |       WHERE i_category IN ('Electronics'))
        |    AND ss_item_sk = i_item_sk
        |    AND ss_sold_date_sk = d_date_sk
        |    AND d_year = 1998
        |    AND d_moy = 5
        |    AND ss_addr_sk = ca_address_sk
        |    AND ca_gmt_offset = -5
        |  GROUP BY i_manufact_id),
        | cs AS
        | (SELECT i_manufact_id,
        |         sum(cs_ext_sales_price) total_sales
        |  FROM catalog_sales,
        |       date_dim,
        |       customer_address,
        |       item
        |  WHERE i_manufact_id IN
        |      (SELECT i_manufact_id
        |       FROM item
        |       WHERE i_category IN ('Electronics'))
        |    AND cs_item_sk = i_item_sk
        |    AND cs_sold_date_sk = d_date_sk
        |    AND d_year = 1998
        |    AND d_moy = 5
        |    AND cs_bill_addr_sk = ca_address_sk
        |    AND ca_gmt_offset = -5
        |  GROUP BY i_manufact_id),
        | ws AS
        | (SELECT i_manufact_id,
        |         sum(ws_ext_sales_price) total_sales
        |  FROM web_sales,
        |       date_dim,
        |       customer_address,
        |       item
        |  WHERE i_manufact_id IN
        |      (SELECT i_manufact_id
        |       FROM item
        |       WHERE i_category IN ('Electronics'))
        |    AND ws_item_sk = i_item_sk
        |    AND ws_sold_date_sk = d_date_sk
        |    AND d_year = 1998
        |    AND d_moy = 5
        |    AND ws_bill_addr_sk = ca_address_sk
        |    AND ca_gmt_offset = -5
        |  GROUP BY i_manufact_id)
        |SELECT i_manufact_id,
        |       CAST(sum(total_sales) AS BIGINT) total_sales
        |FROM
        |  (SELECT *
        |   FROM ss
        |   UNION ALL SELECT *
        |   FROM cs
        |   UNION ALL SELECT *
        |   FROM ws) tmp1
        |GROUP BY i_manufact_id
        |ORDER BY total_sales,
        |         i_manufact_id
        |LIMIT 100""".stripMargin),

    // q34: 15..20-line tickets by dom/demographic bands (the other r13
    // skip; per-ticket line counts now reach the band by construction)
    "tpcds_q34" -> wrap(
      """SELECT c_last_name,
        |       c_first_name,
        |       c_salutation,
        |       c_preferred_cust_flag,
        |       ss_ticket_number,
        |       cnt
        |FROM
        |  (SELECT ss_ticket_number,
        |          ss_customer_sk,
        |          count(*) cnt
        |   FROM store_sales,
        |        date_dim,
        |        store,
        |        household_demographics
        |   WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |     AND store_sales.ss_store_sk = store.s_store_sk
        |     AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        |     AND (date_dim.d_dom BETWEEN 1 AND 3
        |          OR date_dim.d_dom BETWEEN 25 AND 28)
        |     AND (household_demographics.hd_buy_potential = '>10000'
        |          OR household_demographics.hd_buy_potential = 'unknown')
        |     AND household_demographics.hd_vehicle_count > 0
        |     AND (CASE WHEN household_demographics.hd_vehicle_count > 0 THEN household_demographics.hd_dep_count / household_demographics.hd_vehicle_count ELSE NULL END) > 1.2
        |     AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        |     AND store.s_county IN ('Williamson County', 'Williamson County', 'Williamson County', 'Williamson County', 'Williamson County', 'Williamson County', 'Williamson County', 'Williamson County')
        |   GROUP BY ss_ticket_number,
        |            ss_customer_sk) dn,
        |     customer
        |WHERE ss_customer_sk = c_customer_sk
        |  AND cnt BETWEEN 15 AND 20
        |ORDER BY c_last_name,
        |         c_first_name,
        |         c_salutation,
        |         c_preferred_cust_flag DESC,
        |         ss_ticket_number""".stripMargin),

    // q37: item x inventory-window x catalog existence (manufact ids
    // 677/940/694/808 land on the hot 16% manufact override)
    "tpcds_q37" -> wrap(
      """SELECT i_item_id,
        |       i_item_desc,
        |       i_current_price
        |FROM item,
        |     inventory,
        |     date_dim,
        |     catalog_sales
        |WHERE i_current_price BETWEEN 68 AND 68 + 30
        |  AND inv_item_sk = i_item_sk
        |  AND d_date_sk = inv_date_sk
        |  AND d_date BETWEEN CAST('2000-02-01' AS date) AND (CAST('2000-02-01' AS date) + 60)
        |  AND i_manufact_id IN (677, 940, 694, 808)
        |  AND inv_quantity_on_hand BETWEEN 100 AND 500
        |  AND cs_item_sk = i_item_sk
        |GROUP BY i_item_id,
        |         i_item_desc,
        |         i_current_price
        |ORDER BY i_item_id
        |LIMIT 100""".stripMargin),

    // q42: category sales for one manager's items (sum aliased, q38
    // precedent)
    "tpcds_q42" -> wrap(
      """SELECT dt.d_year,
        |       item.i_category_id,
        |       item.i_category,
        |       CAST(sum(ss_ext_sales_price) AS BIGINT) AS total_sales
        |FROM date_dim dt,
        |     store_sales,
        |     item
        |WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
        |  AND store_sales.ss_item_sk = item.i_item_sk
        |  AND item.i_manager_id = 1
        |  AND dt.d_moy = 11
        |  AND dt.d_year = 2000
        |GROUP BY dt.d_year,
        |         item.i_category_id,
        |         item.i_category
        |ORDER BY total_sales DESC,
        |         dt.d_year,
        |         item.i_category_id,
        |         item.i_category
        |LIMIT 100""".stripMargin),

    // q52: brand sales for one manager's items (ORDER extended with
    // brand, same tie class as q3)
    "tpcds_q52" -> wrap(
      """SELECT dt.d_year,
        |       item.i_brand_id brand_id,
        |       item.i_brand brand,
        |       CAST(sum(ss_ext_sales_price) AS BIGINT) ext_price
        |FROM date_dim dt,
        |     store_sales,
        |     item
        |WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
        |  AND store_sales.ss_item_sk = item.i_item_sk
        |  AND item.i_manager_id = 1
        |  AND dt.d_moy = 11
        |  AND dt.d_year = 2000
        |GROUP BY dt.d_year,
        |         item.i_brand,
        |         item.i_brand_id
        |ORDER BY dt.d_year,
        |         ext_price DESC,
        |         brand_id,
        |         brand
        |LIMIT 100""".stripMargin),

    // q54: cross-channel cohort -> store revenue segments (floor before
    // the INT cast: DuckDB CAST rounds where Spark truncates, r13 rule)
    "tpcds_q54" -> wrap(
      """WITH my_customers AS
        | (SELECT DISTINCT c_customer_sk,
        |         c_current_addr_sk
        |  FROM
        |    (SELECT cs_sold_date_sk sold_date_sk,
        |            cs_bill_customer_sk customer_sk,
        |            cs_item_sk item_sk
        |     FROM catalog_sales
        |     UNION ALL
        |     SELECT ws_sold_date_sk sold_date_sk,
        |            ws_bill_customer_sk customer_sk,
        |            ws_item_sk item_sk
        |     FROM web_sales) cs_or_ws_sales,
        |       item,
        |       date_dim,
        |       customer
        |  WHERE sold_date_sk = d_date_sk
        |    AND item_sk = i_item_sk
        |    AND i_category = 'Women'
        |    AND i_class = 'maternity'
        |    AND c_customer_sk = cs_or_ws_sales.customer_sk
        |    AND d_moy = 12
        |    AND d_year = 1998),
        | my_revenue AS
        | (SELECT c_customer_sk,
        |         sum(ss_ext_sales_price) AS revenue
        |  FROM my_customers,
        |       store_sales,
        |       customer_address,
        |       store,
        |       date_dim
        |  WHERE c_current_addr_sk = ca_address_sk
        |    AND ca_county = s_county
        |    AND ca_state = s_state
        |    AND ss_customer_sk = c_customer_sk
        |    AND ss_sold_date_sk = d_date_sk
        |    AND d_month_seq BETWEEN
        |      (SELECT DISTINCT d_month_seq + 1
        |       FROM date_dim
        |       WHERE d_year = 1998
        |         AND d_moy = 12)
        |      AND
        |      (SELECT DISTINCT d_month_seq + 3
        |       FROM date_dim
        |       WHERE d_year = 1998
        |         AND d_moy = 12)
        |  GROUP BY c_customer_sk),
        | segments AS
        | (SELECT CAST(floor(revenue / 50) AS INT) AS segment
        |  FROM my_revenue)
        |SELECT segment,
        |       count(*) AS num_customers,
        |       segment * 50 AS segment_base
        |FROM segments
        |GROUP BY segment
        |ORDER BY segment,
        |         num_customers
        |LIMIT 100""".stripMargin),

    // q55: brand sales, manager 28 (ORDER extended with brand)
    "tpcds_q55" -> wrap(
      """SELECT i_brand_id brand_id,
        |       i_brand brand,
        |       CAST(sum(ss_ext_sales_price) AS BIGINT) ext_price
        |FROM date_dim,
        |     store_sales,
        |     item
        |WHERE d_date_sk = ss_sold_date_sk
        |  AND ss_item_sk = i_item_sk
        |  AND i_manager_id = 28
        |  AND d_moy = 11
        |  AND d_year = 1999
        |GROUP BY i_brand,
        |         i_brand_id
        |ORDER BY ext_price DESC,
        |         brand_id,
        |         brand
        |LIMIT 100""".stripMargin),

    // q60: per-item three-channel sales for category Music (q33's
    // item_id-keyed sibling)
    "tpcds_q60" -> wrap(
      """WITH ss AS
        | (SELECT i_item_id,
        |         sum(ss_ext_sales_price) total_sales
        |  FROM store_sales,
        |       date_dim,
        |       customer_address,
        |       item
        |  WHERE i_item_id IN
        |      (SELECT i_item_id
        |       FROM item
        |       WHERE i_category IN ('Music'))
        |    AND ss_item_sk = i_item_sk
        |    AND ss_sold_date_sk = d_date_sk
        |    AND d_year = 1998
        |    AND d_moy = 9
        |    AND ss_addr_sk = ca_address_sk
        |    AND ca_gmt_offset = -5
        |  GROUP BY i_item_id),
        | cs AS
        | (SELECT i_item_id,
        |         sum(cs_ext_sales_price) total_sales
        |  FROM catalog_sales,
        |       date_dim,
        |       customer_address,
        |       item
        |  WHERE i_item_id IN
        |      (SELECT i_item_id
        |       FROM item
        |       WHERE i_category IN ('Music'))
        |    AND cs_item_sk = i_item_sk
        |    AND cs_sold_date_sk = d_date_sk
        |    AND d_year = 1998
        |    AND d_moy = 9
        |    AND cs_bill_addr_sk = ca_address_sk
        |    AND ca_gmt_offset = -5
        |  GROUP BY i_item_id),
        | ws AS
        | (SELECT i_item_id,
        |         sum(ws_ext_sales_price) total_sales
        |  FROM web_sales,
        |       date_dim,
        |       customer_address,
        |       item
        |  WHERE i_item_id IN
        |      (SELECT i_item_id
        |       FROM item
        |       WHERE i_category IN ('Music'))
        |    AND ws_item_sk = i_item_sk
        |    AND ws_sold_date_sk = d_date_sk
        |    AND d_year = 1998
        |    AND d_moy = 9
        |    AND ws_bill_addr_sk = ca_address_sk
        |    AND ca_gmt_offset = -5
        |  GROUP BY i_item_id)
        |SELECT i_item_id,
        |       CAST(sum(total_sales) AS BIGINT) total_sales
        |FROM
        |  (SELECT *
        |   FROM ss
        |   UNION ALL SELECT *
        |   FROM cs
        |   UNION ALL SELECT *
        |   FROM ws) tmp1
        |GROUP BY i_item_id
        |ORDER BY i_item_id,
        |         total_sales
        |LIMIT 100""".stripMargin),

    // q73: 1..5-line tickets (q34's band sibling; populated by hot-grid
    // rows whose per-row dates detach from their ticket's shared date)
    "tpcds_q73" -> wrap(
      """SELECT c_last_name,
        |       c_first_name,
        |       c_salutation,
        |       c_preferred_cust_flag,
        |       ss_ticket_number,
        |       cnt
        |FROM
        |  (SELECT ss_ticket_number,
        |          ss_customer_sk,
        |          count(*) cnt
        |   FROM store_sales,
        |        date_dim,
        |        store,
        |        household_demographics
        |   WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |     AND store_sales.ss_store_sk = store.s_store_sk
        |     AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        |     AND date_dim.d_dom BETWEEN 1 AND 2
        |     AND (household_demographics.hd_buy_potential = '>10000'
        |          OR household_demographics.hd_buy_potential = 'unknown')
        |     AND household_demographics.hd_vehicle_count > 0
        |     AND CASE WHEN household_demographics.hd_vehicle_count > 0 THEN household_demographics.hd_dep_count / household_demographics.hd_vehicle_count ELSE NULL END > 1
        |     AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        |     AND store.s_county IN ('Williamson County', 'Franklin Parish', 'Bronx County', 'Orange County')
        |   GROUP BY ss_ticket_number,
        |            ss_customer_sk) dj,
        |     customer
        |WHERE ss_customer_sk = c_customer_sk
        |  AND cnt BETWEEN 1 AND 5
        |ORDER BY cnt DESC,
        |         c_last_name ASC""".stripMargin),

    // q75: three-channel UNION with returns netting, year-over-year
    // sales-count contraction < 0.9 (ratio via DOUBLE casts; ORDER
    // extended with the four ids)
    "tpcds_q75" -> wrap(
      """WITH all_sales AS
        | (SELECT d_year,
        |         i_brand_id,
        |         i_class_id,
        |         i_category_id,
        |         i_manufact_id,
        |         SUM(sales_cnt) AS sales_cnt,
        |         SUM(sales_amt) AS sales_amt
        |  FROM
        |    (SELECT d_year,
        |            i_brand_id,
        |            i_class_id,
        |            i_category_id,
        |            i_manufact_id,
        |            cs_quantity - COALESCE(cr_return_quantity, 0) AS sales_cnt,
        |            cs_ext_sales_price - COALESCE(cr_return_amount, 0) AS sales_amt
        |     FROM catalog_sales
        |     JOIN item ON i_item_sk = cs_item_sk
        |     JOIN date_dim ON d_date_sk = cs_sold_date_sk
        |     LEFT JOIN catalog_returns ON (cs_order_number = cr_order_number
        |                                   AND cs_item_sk = cr_item_sk)
        |     WHERE i_category = 'Books'
        |     UNION
        |     SELECT d_year,
        |            i_brand_id,
        |            i_class_id,
        |            i_category_id,
        |            i_manufact_id,
        |            ss_quantity - COALESCE(sr_return_quantity, 0) AS sales_cnt,
        |            ss_ext_sales_price - COALESCE(sr_return_amt, 0) AS sales_amt
        |     FROM store_sales
        |     JOIN item ON i_item_sk = ss_item_sk
        |     JOIN date_dim ON d_date_sk = ss_sold_date_sk
        |     LEFT JOIN store_returns ON (ss_ticket_number = sr_ticket_number
        |                                 AND ss_item_sk = sr_item_sk)
        |     WHERE i_category = 'Books'
        |     UNION
        |     SELECT d_year,
        |            i_brand_id,
        |            i_class_id,
        |            i_category_id,
        |            i_manufact_id,
        |            ws_quantity - COALESCE(wr_return_quantity, 0) AS sales_cnt,
        |            ws_ext_sales_price - COALESCE(wr_return_amt, 0) AS sales_amt
        |     FROM web_sales
        |     JOIN item ON i_item_sk = ws_item_sk
        |     JOIN date_dim ON d_date_sk = ws_sold_date_sk
        |     LEFT JOIN web_returns ON (ws_order_number = wr_order_number
        |                               AND ws_item_sk = wr_item_sk)
        |     WHERE i_category = 'Books') sales_detail
        |  GROUP BY d_year,
        |           i_brand_id,
        |           i_class_id,
        |           i_category_id,
        |           i_manufact_id)
        |SELECT prev_yr.d_year AS prev_year,
        |       curr_yr.d_year AS year,
        |       curr_yr.i_brand_id,
        |       curr_yr.i_class_id,
        |       curr_yr.i_category_id,
        |       curr_yr.i_manufact_id,
        |       CAST(prev_yr.sales_cnt AS BIGINT) AS prev_yr_cnt,
        |       CAST(curr_yr.sales_cnt AS BIGINT) AS curr_yr_cnt,
        |       CAST(curr_yr.sales_cnt - prev_yr.sales_cnt AS BIGINT) AS sales_cnt_diff,
        |       CAST(curr_yr.sales_amt - prev_yr.sales_amt AS BIGINT) AS sales_amt_diff
        |FROM all_sales curr_yr,
        |     all_sales prev_yr
        |WHERE curr_yr.i_brand_id = prev_yr.i_brand_id
        |  AND curr_yr.i_class_id = prev_yr.i_class_id
        |  AND curr_yr.i_category_id = prev_yr.i_category_id
        |  AND curr_yr.i_manufact_id = prev_yr.i_manufact_id
        |  AND curr_yr.d_year = 2002
        |  AND prev_yr.d_year = 2002 - 1
        |  AND CAST(curr_yr.sales_cnt AS DOUBLE) / CAST(prev_yr.sales_cnt AS DOUBLE) < 0.9
        |ORDER BY sales_cnt_diff,
        |         sales_amt_diff,
        |         curr_yr.i_brand_id,
        |         curr_yr.i_class_id,
        |         curr_yr.i_category_id,
        |         curr_yr.i_manufact_id
        |LIMIT 100""".stripMargin),

    // q80: three-channel returns rollup gated on promotion channel and
    // price (NULLS FIRST on the rollup sort, q67 precedent)
    "tpcds_q80" -> wrap(
      """WITH ssr AS
        | (SELECT s_store_id AS store_id,
        |         sum(ss_ext_sales_price) AS sales,
        |         sum(COALESCE(sr_return_amt, 0)) AS returns,
        |         sum(ss_net_profit - COALESCE(sr_net_loss, 0)) AS profit
        |  FROM store_sales
        |  LEFT OUTER JOIN store_returns ON (ss_item_sk = sr_item_sk
        |                                    AND ss_ticket_number = sr_ticket_number),
        |       date_dim,
        |       store,
        |       item,
        |       promotion
        |  WHERE ss_sold_date_sk = d_date_sk
        |    AND d_date BETWEEN CAST('2000-08-23' AS date) AND (CAST('2000-08-23' AS date) + 30)
        |    AND ss_store_sk = s_store_sk
        |    AND ss_item_sk = i_item_sk
        |    AND i_current_price > 50
        |    AND ss_promo_sk = p_promo_sk
        |    AND p_channel_tv = 'N'
        |  GROUP BY s_store_id),
        | csr AS
        | (SELECT cp_catalog_page_id AS catalog_page_id,
        |         sum(cs_ext_sales_price) AS sales,
        |         sum(COALESCE(cr_return_amount, 0)) AS returns,
        |         sum(cs_net_profit - COALESCE(cr_net_loss, 0)) AS profit
        |  FROM catalog_sales
        |  LEFT OUTER JOIN catalog_returns ON (cs_item_sk = cr_item_sk
        |                                      AND cs_order_number = cr_order_number),
        |       date_dim,
        |       catalog_page,
        |       item,
        |       promotion
        |  WHERE cs_sold_date_sk = d_date_sk
        |    AND d_date BETWEEN CAST('2000-08-23' AS date) AND (CAST('2000-08-23' AS date) + 30)
        |    AND cs_catalog_page_sk = cp_catalog_page_sk
        |    AND cs_item_sk = i_item_sk
        |    AND i_current_price > 50
        |    AND cs_promo_sk = p_promo_sk
        |    AND p_channel_tv = 'N'
        |  GROUP BY cp_catalog_page_id),
        | wsr AS
        | (SELECT web_site_id,
        |         sum(ws_ext_sales_price) AS sales,
        |         sum(COALESCE(wr_return_amt, 0)) AS returns,
        |         sum(ws_net_profit - COALESCE(wr_net_loss, 0)) AS profit
        |  FROM web_sales
        |  LEFT OUTER JOIN web_returns ON (ws_item_sk = wr_item_sk
        |                                  AND ws_order_number = wr_order_number),
        |       date_dim,
        |       web_site,
        |       item,
        |       promotion
        |  WHERE ws_sold_date_sk = d_date_sk
        |    AND d_date BETWEEN CAST('2000-08-23' AS date) AND (CAST('2000-08-23' AS date) + 30)
        |    AND ws_web_site_sk = web_site_sk
        |    AND ws_item_sk = i_item_sk
        |    AND i_current_price > 50
        |    AND ws_promo_sk = p_promo_sk
        |    AND p_channel_tv = 'N'
        |  GROUP BY web_site_id)
        |SELECT channel,
        |       id,
        |       CAST(sum(sales) AS BIGINT) AS sales,
        |       CAST(sum(returns) AS BIGINT) AS returns,
        |       CAST(sum(profit) AS BIGINT) AS profit
        |FROM
        |  (SELECT 'store channel' AS channel,
        |          'store' || store_id AS id,
        |          sales,
        |          returns,
        |          profit
        |   FROM ssr
        |   UNION ALL
        |   SELECT 'catalog channel' AS channel,
        |          'catalog_page' || catalog_page_id AS id,
        |          sales,
        |          returns,
        |          profit
        |   FROM csr
        |   UNION ALL
        |   SELECT 'web channel' AS channel,
        |          'web_site' || web_site_id AS id,
        |          sales,
        |          returns,
        |          profit
        |   FROM wsr) x
        |GROUP BY ROLLUP (channel, id)
        |ORDER BY channel NULLS FIRST,
        |         id NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q93: returned-quantity-netted sales by customer for one reason
    // (the LEFT JOIN is made inner by the canonical WHERE on reason)
    "tpcds_q93" -> wrap(
      """SELECT ss_customer_sk,
        |       CAST(sum(act_sales) AS BIGINT) sumsales
        |FROM
        |  (SELECT ss_item_sk,
        |          ss_ticket_number,
        |          ss_customer_sk,
        |          CASE WHEN sr_return_quantity IS NOT NULL THEN (ss_quantity - sr_return_quantity) * ss_sales_price ELSE (ss_quantity * ss_sales_price) END act_sales
        |   FROM store_sales
        |   LEFT OUTER JOIN store_returns ON (sr_item_sk = ss_item_sk
        |                                     AND sr_ticket_number = ss_ticket_number),
        |        reason
        |   WHERE sr_reason_sk = r_reason_sk
        |     AND r_reason_desc = 'reason 28') t
        |GROUP BY ss_customer_sk
        |ORDER BY sumsales,
        |         ss_customer_sk
        |LIMIT 100""".stripMargin),

    // q97: store/catalog customer-item overlap via FULL OUTER JOIN
    "tpcds_q97" -> wrap(
      """WITH ssci AS
        | (SELECT ss_customer_sk customer_sk,
        |         ss_item_sk item_sk
        |  FROM store_sales,
        |       date_dim
        |  WHERE ss_sold_date_sk = d_date_sk
        |    AND d_month_seq BETWEEN 1200 AND 1200 + 11
        |  GROUP BY ss_customer_sk,
        |           ss_item_sk),
        | csci AS
        | (SELECT cs_bill_customer_sk customer_sk,
        |         cs_item_sk item_sk
        |  FROM catalog_sales,
        |       date_dim
        |  WHERE cs_sold_date_sk = d_date_sk
        |    AND d_month_seq BETWEEN 1200 AND 1200 + 11
        |  GROUP BY cs_bill_customer_sk,
        |           cs_item_sk)
        |SELECT CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL
        |                     AND csci.customer_sk IS NULL THEN 1 ELSE 0 END) AS BIGINT) store_only,
        |       CAST(sum(CASE WHEN ssci.customer_sk IS NULL
        |                     AND csci.customer_sk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) catalog_only,
        |       CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL
        |                     AND csci.customer_sk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) store_and_catalog
        |FROM ssci
        |FULL OUTER JOIN csci ON (ssci.customer_sk = csci.customer_sk
        |                         AND ssci.item_sk = csci.item_sk)
        |LIMIT 100""".stripMargin),

    // q98: store analog of q12 (no LIMIT in the canonical body)
    "tpcds_q98" -> wrap(
      """SELECT i_item_id,
        |       i_item_desc,
        |       i_category,
        |       i_class,
        |       i_current_price,
        |       CAST(sum(ss_ext_sales_price) AS BIGINT) AS itemrevenue,
        |       CAST(sum(ss_ext_sales_price) AS DOUBLE) * 100 /
        |         sum(CAST(sum(ss_ext_sales_price) AS DOUBLE)) OVER (PARTITION BY i_class) AS revenueratio
        |FROM store_sales,
        |     item,
        |     date_dim
        |WHERE ss_item_sk = i_item_sk
        |  AND i_category IN ('Sports', 'Books', 'Home')
        |  AND ss_sold_date_sk = d_date_sk
        |  AND d_date BETWEEN CAST('1999-02-22' AS date) AND (CAST('1999-02-22' AS date) + 30)
        |GROUP BY i_item_id,
        |         i_item_desc,
        |         i_category,
        |         i_class,
        |         i_current_price
        |ORDER BY i_category,
        |         i_class,
        |         i_item_id,
        |         i_item_desc,
        |         revenueratio""".stripMargin),

    // q7: per-item demographic averages gated on promotion channels
    // (avg of exact integer sums: bit-identical DOUBLE cross-engine)
    "tpcds_q7" -> wrap(
      """SELECT i_item_id,
        |       avg(ss_quantity) agg1,
        |       avg(ss_list_price) agg2,
        |       avg(ss_coupon_amt) agg3,
        |       avg(ss_sales_price) agg4
        |FROM store_sales,
        |     customer_demographics,
        |     date_dim,
        |     item,
        |     promotion
        |WHERE ss_sold_date_sk = d_date_sk
        |  AND ss_item_sk = i_item_sk
        |  AND ss_cdemo_sk = cd_demo_sk
        |  AND ss_promo_sk = p_promo_sk
        |  AND cd_gender = 'M'
        |  AND cd_marital_status = 'S'
        |  AND cd_education_status = 'College'
        |  AND (p_channel_email = 'N'
        |       OR p_channel_event = 'N')
        |  AND d_year = 2000
        |GROUP BY i_item_id
        |ORDER BY i_item_id
        |LIMIT 100""".stripMargin),

    // q13: one-row averages over OR-of-band demographic x address
    // branches (the per-unit sales_price/net_profit scale and the
    // decoupled hdemo key exist for this query's bands)
    "tpcds_q13" -> wrap(
      """SELECT avg(ss_quantity) agg1,
        |       avg(ss_ext_sales_price) agg2,
        |       avg(ss_ext_wholesale_cost) agg3,
        |       CAST(sum(ss_ext_wholesale_cost) AS BIGINT) agg4
        |FROM store_sales,
        |     store,
        |     customer_demographics,
        |     household_demographics,
        |     customer_address,
        |     date_dim
        |WHERE s_store_sk = ss_store_sk
        |  AND ss_sold_date_sk = d_date_sk
        |  AND d_year = 2001
        |  AND ((ss_hdemo_sk = hd_demo_sk
        |        AND cd_demo_sk = ss_cdemo_sk
        |        AND cd_marital_status = 'M'
        |        AND cd_education_status = 'Advanced Degree'
        |        AND ss_sales_price BETWEEN 100.00 AND 150.00
        |        AND hd_dep_count = 3)
        |       OR (ss_hdemo_sk = hd_demo_sk
        |           AND cd_demo_sk = ss_cdemo_sk
        |           AND cd_marital_status = 'S'
        |           AND cd_education_status = 'College'
        |           AND ss_sales_price BETWEEN 50.00 AND 100.00
        |           AND hd_dep_count = 1)
        |       OR (ss_hdemo_sk = hd_demo_sk
        |           AND cd_demo_sk = ss_cdemo_sk
        |           AND cd_marital_status = 'W'
        |           AND cd_education_status = '2 yr Degree'
        |           AND ss_sales_price BETWEEN 150.00 AND 200.00
        |           AND hd_dep_count = 1))
        |  AND ((ss_addr_sk = ca_address_sk
        |        AND ca_country = 'United States'
        |        AND ca_state IN ('TX', 'OH', 'TX')
        |        AND ss_net_profit BETWEEN 100 AND 200)
        |       OR (ss_addr_sk = ca_address_sk
        |           AND ca_country = 'United States'
        |           AND ca_state IN ('OR', 'NM', 'KY')
        |           AND ss_net_profit BETWEEN 150 AND 300)
        |       OR (ss_addr_sk = ca_address_sk
        |           AND ca_country = 'United States'
        |           AND ca_state IN ('VA', 'TX', 'MS')
        |           AND ss_net_profit BETWEEN 50 AND 250))""".stripMargin),

    // q18: catalog demographics rollup over country/state/county
    // (decimal avg casts -> DOUBLE, NULLS FIRST on the rollup sort)
    "tpcds_q18" -> wrap(
      """SELECT i_item_id,
        |       ca_country,
        |       ca_state,
        |       ca_county,
        |       avg(CAST(cs_quantity AS DOUBLE)) agg1,
        |       avg(CAST(cs_list_price AS DOUBLE)) agg2,
        |       avg(CAST(cs_coupon_amt AS DOUBLE)) agg3,
        |       avg(CAST(cs_sales_price AS DOUBLE)) agg4,
        |       avg(CAST(cs_net_profit AS DOUBLE)) agg5,
        |       avg(CAST(c_birth_year AS DOUBLE)) agg6,
        |       avg(CAST(cd1.cd_dep_count AS DOUBLE)) agg7
        |FROM catalog_sales,
        |     customer_demographics cd1,
        |     customer_demographics cd2,
        |     customer,
        |     customer_address,
        |     date_dim,
        |     item
        |WHERE cs_sold_date_sk = d_date_sk
        |  AND cs_item_sk = i_item_sk
        |  AND cs_bill_cdemo_sk = cd1.cd_demo_sk
        |  AND cs_bill_customer_sk = c_customer_sk
        |  AND cd1.cd_gender = 'F'
        |  AND cd1.cd_education_status = 'Unknown'
        |  AND c_current_cdemo_sk = cd2.cd_demo_sk
        |  AND c_current_addr_sk = ca_address_sk
        |  AND c_birth_month IN (1, 6, 8, 9, 12, 2)
        |  AND d_year = 1998
        |  AND ca_state IN ('MS', 'IN', 'ND', 'OK', 'NM', 'VA', 'MS')
        |GROUP BY ROLLUP (i_item_id, ca_country, ca_state, ca_county)
        |ORDER BY ca_country NULLS FIRST,
        |         ca_state NULLS FIRST,
        |         ca_county NULLS FIRST,
        |         i_item_id NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q19: brand/manufact agg with the customer-vs-store zip-prefix
    // mismatch predicate
    "tpcds_q19" -> wrap(
      """SELECT i_brand_id brand_id,
        |       i_brand brand,
        |       i_manufact_id,
        |       i_manufact,
        |       CAST(sum(ss_ext_sales_price) AS BIGINT) ext_price
        |FROM date_dim,
        |     store_sales,
        |     item,
        |     customer,
        |     customer_address,
        |     store
        |WHERE d_date_sk = ss_sold_date_sk
        |  AND ss_item_sk = i_item_sk
        |  AND i_manager_id = 8
        |  AND d_moy = 11
        |  AND d_year = 1998
        |  AND ss_customer_sk = c_customer_sk
        |  AND c_current_addr_sk = ca_address_sk
        |  AND substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
        |  AND ss_store_sk = s_store_sk
        |GROUP BY i_brand,
        |         i_brand_id,
        |         i_manufact_id,
        |         i_manufact
        |ORDER BY ext_price DESC,
        |         i_brand,
        |         i_brand_id,
        |         i_manufact_id,
        |         i_manufact
        |LIMIT 100""".stripMargin),

    // q26: catalog sibling of q7
    "tpcds_q26" -> wrap(
      """SELECT i_item_id,
        |       avg(cs_quantity) agg1,
        |       avg(cs_list_price) agg2,
        |       avg(cs_coupon_amt) agg3,
        |       avg(cs_sales_price) agg4
        |FROM catalog_sales,
        |     customer_demographics,
        |     date_dim,
        |     item,
        |     promotion
        |WHERE cs_sold_date_sk = d_date_sk
        |  AND cs_item_sk = i_item_sk
        |  AND cs_bill_cdemo_sk = cd_demo_sk
        |  AND cs_promo_sk = p_promo_sk
        |  AND cd_gender = 'M'
        |  AND cd_marital_status = 'S'
        |  AND cd_education_status = 'College'
        |  AND (p_channel_email = 'N'
        |       OR p_channel_event = 'N')
        |  AND d_year = 2000
        |GROUP BY i_item_id
        |ORDER BY i_item_id
        |LIMIT 100""".stripMargin),

    // q27: store demographic averages under ROLLUP(item, state) with
    // grouping() (NULLS FIRST under LIMIT)
    "tpcds_q27" -> wrap(
      """SELECT i_item_id,
        |       s_state,
        |       grouping(s_state) g_state,
        |       avg(ss_quantity) agg1,
        |       avg(ss_list_price) agg2,
        |       avg(ss_coupon_amt) agg3,
        |       avg(ss_sales_price) agg4
        |FROM store_sales,
        |     customer_demographics,
        |     date_dim,
        |     store,
        |     item
        |WHERE ss_sold_date_sk = d_date_sk
        |  AND ss_item_sk = i_item_sk
        |  AND ss_store_sk = s_store_sk
        |  AND ss_cdemo_sk = cd_demo_sk
        |  AND cd_gender = 'F'
        |  AND cd_marital_status = 'W'
        |  AND cd_education_status = 'Primary'
        |  AND d_year = 1998
        |  AND s_state IN ('TN', 'TN', 'TN', 'TN', 'TN', 'TN')
        |GROUP BY ROLLUP (i_item_id, s_state)
        |ORDER BY i_item_id NULLS FIRST,
        |         s_state NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q45: web sales by zip/city; zip IN-list OR item IN-subquery
    // (the canonical zips never match the synthetic domain; the item
    // branch carries the result, as in the canonical answer shape)
    "tpcds_q45" -> wrap(
      """SELECT ca_zip,
        |       ca_city,
        |       CAST(sum(ws_sales_price) AS BIGINT) AS sum_sales
        |FROM web_sales,
        |     customer,
        |     customer_address,
        |     date_dim,
        |     item
        |WHERE ws_bill_customer_sk = c_customer_sk
        |  AND c_current_addr_sk = ca_address_sk
        |  AND ws_item_sk = i_item_sk
        |  AND (substr(ca_zip, 1, 5) IN ('85669', '86197', '88274', '83405', '86475', '85392', '85460', '80348', '81792')
        |       OR i_item_id IN
        |         (SELECT i_item_id
        |          FROM item
        |          WHERE i_item_sk IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)))
        |  AND ws_sold_date_sk = d_date_sk
        |  AND d_qoy = 2
        |  AND d_year = 2001
        |GROUP BY ca_zip,
        |         ca_city
        |ORDER BY ca_zip,
        |         ca_city
        |LIMIT 100""".stripMargin),

    // q56: three-channel sales for three item colors (the q33/q60
    // family's color-keyed sibling; ORDER extended with i_item_id)
    "tpcds_q56" -> wrap(
      """WITH ss AS
        | (SELECT i_item_id,
        |         sum(ss_ext_sales_price) total_sales
        |  FROM store_sales,
        |       date_dim,
        |       customer_address,
        |       item
        |  WHERE i_item_id IN
        |      (SELECT i_item_id
        |       FROM item
        |       WHERE i_color IN ('slate', 'blanched', 'burnished'))
        |    AND ss_item_sk = i_item_sk
        |    AND ss_sold_date_sk = d_date_sk
        |    AND d_year = 2001
        |    AND d_moy = 2
        |    AND ss_addr_sk = ca_address_sk
        |    AND ca_gmt_offset = -5
        |  GROUP BY i_item_id),
        | cs AS
        | (SELECT i_item_id,
        |         sum(cs_ext_sales_price) total_sales
        |  FROM catalog_sales,
        |       date_dim,
        |       customer_address,
        |       item
        |  WHERE i_item_id IN
        |      (SELECT i_item_id
        |       FROM item
        |       WHERE i_color IN ('slate', 'blanched', 'burnished'))
        |    AND cs_item_sk = i_item_sk
        |    AND cs_sold_date_sk = d_date_sk
        |    AND d_year = 2001
        |    AND d_moy = 2
        |    AND cs_bill_addr_sk = ca_address_sk
        |    AND ca_gmt_offset = -5
        |  GROUP BY i_item_id),
        | ws AS
        | (SELECT i_item_id,
        |         sum(ws_ext_sales_price) total_sales
        |  FROM web_sales,
        |       date_dim,
        |       customer_address,
        |       item
        |  WHERE i_item_id IN
        |      (SELECT i_item_id
        |       FROM item
        |       WHERE i_color IN ('slate', 'blanched', 'burnished'))
        |    AND ws_item_sk = i_item_sk
        |    AND ws_sold_date_sk = d_date_sk
        |    AND d_year = 2001
        |    AND d_moy = 2
        |    AND ws_bill_addr_sk = ca_address_sk
        |    AND ca_gmt_offset = -5
        |  GROUP BY i_item_id)
        |SELECT i_item_id,
        |       CAST(sum(total_sales) AS BIGINT) total_sales
        |FROM
        |  (SELECT *
        |   FROM ss
        |   UNION ALL SELECT *
        |   FROM cs
        |   UNION ALL SELECT *
        |   FROM ws) tmp1
        |GROUP BY i_item_id
        |ORDER BY total_sales,
        |         i_item_id
        |LIMIT 100""".stripMargin),

    // q61: promotional-vs-total single-row ratio (ratio via DOUBLE
    // casts, aliased; needs dmail/email/tv channels + s_gmt_offset)
    "tpcds_q61" -> wrap(
      """SELECT CAST(promotions AS BIGINT) AS promotions,
        |       CAST(total AS BIGINT) AS total,
        |       CAST(promotions AS DOUBLE) / CAST(total AS DOUBLE) * 100 AS promo_pct
        |FROM
        |  (SELECT sum(ss_ext_sales_price) promotions
        |   FROM store_sales,
        |        store,
        |        promotion,
        |        date_dim,
        |        customer,
        |        customer_address,
        |        item
        |   WHERE ss_sold_date_sk = d_date_sk
        |     AND ss_store_sk = s_store_sk
        |     AND ss_promo_sk = p_promo_sk
        |     AND ss_customer_sk = c_customer_sk
        |     AND ca_address_sk = c_current_addr_sk
        |     AND ss_item_sk = i_item_sk
        |     AND ca_gmt_offset = -5
        |     AND i_category = 'Jewelry'
        |     AND (p_channel_dmail = 'Y'
        |          OR p_channel_email = 'Y'
        |          OR p_channel_tv = 'Y')
        |     AND s_gmt_offset = -5
        |     AND d_year = 1998
        |     AND d_moy = 11) promotional_sales,
        |  (SELECT sum(ss_ext_sales_price) total
        |   FROM store_sales,
        |        store,
        |        date_dim,
        |        customer,
        |        customer_address,
        |        item
        |   WHERE ss_sold_date_sk = d_date_sk
        |     AND ss_store_sk = s_store_sk
        |     AND ss_customer_sk = c_customer_sk
        |     AND ca_address_sk = c_current_addr_sk
        |     AND ss_item_sk = i_item_sk
        |     AND ca_gmt_offset = -5
        |     AND i_category = 'Jewelry'
        |     AND s_gmt_offset = -5
        |     AND d_year = 1998
        |     AND d_moy = 11) all_sales
        |ORDER BY promotions,
        |         total
        |LIMIT 100""".stripMargin),

    // q68: per-ticket extended price/tax/list sums where the bought
    // city differs from the customer's current city
    "tpcds_q68" -> wrap(
      """SELECT c_last_name,
        |       c_first_name,
        |       ca_city,
        |       bought_city,
        |       ss_ticket_number,
        |       extended_price,
        |       extended_tax,
        |       list_price
        |FROM
        |  (SELECT ss_ticket_number,
        |          ss_customer_sk,
        |          ca_city bought_city,
        |          CAST(sum(ss_ext_sales_price) AS BIGINT) extended_price,
        |          CAST(sum(ss_ext_list_price) AS BIGINT) list_price,
        |          CAST(sum(ss_ext_tax) AS BIGINT) extended_tax
        |   FROM store_sales,
        |        date_dim,
        |        store,
        |        household_demographics,
        |        customer_address
        |   WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |     AND store_sales.ss_store_sk = store.s_store_sk
        |     AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        |     AND store_sales.ss_addr_sk = customer_address.ca_address_sk
        |     AND date_dim.d_dom BETWEEN 1 AND 2
        |     AND (household_demographics.hd_dep_count = 4
        |          OR household_demographics.hd_vehicle_count = 3)
        |     AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        |     AND store.s_city IN ('Midway', 'Fairview')
        |   GROUP BY ss_ticket_number,
        |            ss_customer_sk,
        |            ss_addr_sk,
        |            ca_city) dn,
        |     customer,
        |     customer_address current_addr
        |WHERE ss_customer_sk = c_customer_sk
        |  AND customer.c_current_addr_sk = current_addr.ca_address_sk
        |  AND current_addr.ca_city <> bought_city
        |ORDER BY c_last_name,
        |         ss_ticket_number
        |LIMIT 100""".stripMargin),

    // q79: per-ticket coupon/profit by store city on one weekday
    // (engine-portable d_dow; ORDER extended with ticket number)
    "tpcds_q79" -> wrap(
      """SELECT c_last_name,
        |       c_first_name,
        |       substr(s_city, 1, 30) AS s_city_pre,
        |       ss_ticket_number,
        |       amt,
        |       profit
        |FROM
        |  (SELECT ss_ticket_number,
        |          ss_customer_sk,
        |          store.s_city,
        |          CAST(sum(ss_coupon_amt) AS BIGINT) amt,
        |          CAST(sum(ss_net_profit) AS BIGINT) profit
        |   FROM store_sales,
        |        date_dim,
        |        store,
        |        household_demographics
        |   WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |     AND store_sales.ss_store_sk = store.s_store_sk
        |     AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        |     AND (household_demographics.hd_dep_count = 6
        |          OR household_demographics.hd_vehicle_count > 2)
        |     AND date_dim.d_dow = 1
        |     AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        |     AND store.s_number_employees BETWEEN 200 AND 295
        |   GROUP BY ss_ticket_number,
        |            ss_customer_sk,
        |            ss_addr_sk,
        |            store.s_city) ms,
        |     customer
        |WHERE ss_customer_sk = c_customer_sk
        |ORDER BY c_last_name,
        |         c_first_name,
        |         s_city_pre,
        |         profit,
        |         ss_ticket_number
        |LIMIT 100""".stripMargin),

    // q85: web returns by reason under paired-demographic equality and
    // state/profit bands (wr returning = refunded cdemo by derivation
    // or the equality branches are unreachable)
    "tpcds_q85" -> wrap(
      """SELECT substr(r_reason_desc, 1, 20) AS reason_pre,
        |       avg(ws_quantity) agg1,
        |       avg(wr_refunded_cash) agg2,
        |       avg(wr_fee) agg3
        |FROM web_sales,
        |     web_returns,
        |     web_page,
        |     customer_demographics cd1,
        |     customer_demographics cd2,
        |     customer_address,
        |     date_dim,
        |     reason
        |WHERE ws_web_page_sk = wp_web_page_sk
        |  AND ws_item_sk = wr_item_sk
        |  AND ws_order_number = wr_order_number
        |  AND ws_sold_date_sk = d_date_sk
        |  AND d_year = 2000
        |  AND cd1.cd_demo_sk = wr_refunded_cdemo_sk
        |  AND cd2.cd_demo_sk = wr_returning_cdemo_sk
        |  AND ca_address_sk = wr_refunded_addr_sk
        |  AND r_reason_sk = wr_reason_sk
        |  AND ((cd1.cd_marital_status = 'M'
        |        AND cd1.cd_marital_status = cd2.cd_marital_status
        |        AND cd1.cd_education_status = 'Advanced Degree'
        |        AND cd1.cd_education_status = cd2.cd_education_status
        |        AND ws_sales_price BETWEEN 100.00 AND 150.00)
        |       OR (cd1.cd_marital_status = 'S'
        |           AND cd1.cd_marital_status = cd2.cd_marital_status
        |           AND cd1.cd_education_status = 'College'
        |           AND cd1.cd_education_status = cd2.cd_education_status
        |           AND ws_sales_price BETWEEN 50.00 AND 100.00)
        |       OR (cd1.cd_marital_status = 'W'
        |           AND cd1.cd_marital_status = cd2.cd_marital_status
        |           AND cd1.cd_education_status = '2 yr Degree'
        |           AND cd1.cd_education_status = cd2.cd_education_status
        |           AND ws_sales_price BETWEEN 150.00 AND 200.00))
        |  AND ((ca_country = 'United States'
        |        AND ca_state IN ('IN', 'OH', 'NJ')
        |        AND ws_net_profit BETWEEN 100 AND 200)
        |       OR (ca_country = 'United States'
        |           AND ca_state IN ('WI', 'CT', 'KY')
        |           AND ws_net_profit BETWEEN 150 AND 300)
        |       OR (ca_country = 'United States'
        |           AND ca_state IN ('LA', 'IA', 'AR')
        |           AND ws_net_profit BETWEEN 50 AND 250))
        |GROUP BY r_reason_desc
        |ORDER BY reason_pre,
        |         agg1,
        |         agg2,
        |         agg3
        |LIMIT 100""".stripMargin),

    // q96: single count through time/demographic/store dims (count(*)
    // aliased)
    "tpcds_q96" -> wrap(
      """SELECT count(*) AS cnt
        |FROM store_sales,
        |     household_demographics,
        |     time_dim,
        |     store
        |WHERE ss_sold_time_sk = time_dim.t_time_sk
        |  AND ss_hdemo_sk = household_demographics.hd_demo_sk
        |  AND ss_store_sk = s_store_sk
        |  AND time_dim.t_hour = 20
        |  AND time_dim.t_minute >= 30
        |  AND household_demographics.hd_dep_count = 7
        |  AND store.s_store_name = 'ese'
        |ORDER BY count(*)
        |LIMIT 100""".stripMargin),

    // q6: states whose customers buy items priced 1.2x over their
    // category average (correlated scalar AVG subquery; ORDER extended
    // with the state)
    "tpcds_q6" -> wrap(
      """SELECT a.ca_state AS state,
        |       count(*) AS cnt
        |FROM customer_address a,
        |     customer c,
        |     store_sales s,
        |     date_dim d,
        |     item i
        |WHERE a.ca_address_sk = c.c_current_addr_sk
        |  AND c.c_customer_sk = s.ss_customer_sk
        |  AND s.ss_sold_date_sk = d.d_date_sk
        |  AND s.ss_item_sk = i.i_item_sk
        |  AND d.d_month_seq =
        |    (SELECT DISTINCT (d_month_seq)
        |     FROM date_dim
        |     WHERE d_year = 2001
        |       AND d_moy = 1)
        |  AND i.i_current_price > 1.2 *
        |    (SELECT avg(j.i_current_price)
        |     FROM item j
        |     WHERE j.i_category = i.i_category)
        |GROUP BY a.ca_state
        |HAVING count(*) >= 10
        |ORDER BY cnt,
        |         a.ca_state
        |LIMIT 100""".stripMargin),

    // q10: demographic counts for county cohorts active in a quarter
    // (EXISTS store AND (EXISTS web OR catalog); q10's county list is
    // the derivation's non-store-state county pool)
    "tpcds_q10" -> wrap(
      """SELECT cd_gender,
        |       cd_marital_status,
        |       cd_education_status,
        |       count(*) cnt1,
        |       cd_purchase_estimate,
        |       count(*) cnt2,
        |       cd_credit_rating,
        |       count(*) cnt3,
        |       cd_dep_count,
        |       count(*) cnt4,
        |       cd_dep_employed_count,
        |       count(*) cnt5,
        |       cd_dep_college_count,
        |       count(*) cnt6
        |FROM customer c,
        |     customer_address ca,
        |     customer_demographics
        |WHERE c.c_current_addr_sk = ca.ca_address_sk
        |  AND ca_county IN ('Rush County', 'Toole County', 'Jefferson County', 'Dona Ana County', 'La Porte County')
        |  AND cd_demo_sk = c.c_current_cdemo_sk
        |  AND EXISTS
        |    (SELECT *
        |     FROM store_sales,
        |          date_dim
        |     WHERE c.c_customer_sk = ss_customer_sk
        |       AND ss_sold_date_sk = d_date_sk
        |       AND d_year = 2002
        |       AND d_moy BETWEEN 1 AND 1 + 3)
        |  AND (EXISTS
        |         (SELECT *
        |          FROM web_sales,
        |               date_dim
        |          WHERE c.c_customer_sk = ws_bill_customer_sk
        |            AND ws_sold_date_sk = d_date_sk
        |            AND d_year = 2002
        |            AND d_moy BETWEEN 1 AND 1 + 3)
        |       OR EXISTS
        |         (SELECT *
        |          FROM catalog_sales,
        |               date_dim
        |          WHERE c.c_customer_sk = cs_ship_customer_sk
        |            AND cs_sold_date_sk = d_date_sk
        |            AND d_year = 2002
        |            AND d_moy BETWEEN 1 AND 1 + 3))
        |GROUP BY cd_gender,
        |         cd_marital_status,
        |         cd_education_status,
        |         cd_purchase_estimate,
        |         cd_credit_rating,
        |         cd_dep_count,
        |         cd_dep_employed_count,
        |         cd_dep_college_count
        |ORDER BY cd_gender,
        |         cd_marital_status,
        |         cd_education_status,
        |         cd_purchase_estimate,
        |         cd_credit_rating,
        |         cd_dep_count,
        |         cd_dep_employed_count,
        |         cd_dep_college_count
        |LIMIT 100""".stripMargin),

    // q15: catalog sales by zip (zip-list OR state OR price floor)
    "tpcds_q15" -> wrap(
      """SELECT ca_zip,
        |       CAST(sum(cs_sales_price) AS BIGINT) AS sum_sales
        |FROM catalog_sales,
        |     customer,
        |     customer_address,
        |     date_dim
        |WHERE cs_bill_customer_sk = c_customer_sk
        |  AND c_current_addr_sk = ca_address_sk
        |  AND (substr(ca_zip, 1, 5) IN ('85669', '86197', '88274', '83405', '86475', '85392', '85460', '80348', '81792')
        |       OR ca_state IN ('CA', 'WA', 'GA')
        |       OR cs_sales_price > 500)
        |  AND cs_sold_date_sk = d_date_sk
        |  AND d_qoy = 2
        |  AND d_year = 2001
        |GROUP BY ca_zip
        |ORDER BY ca_zip
        |LIMIT 100""".stripMargin),

    // q22: inventory quantity-on-hand rollup over the item hierarchy
    // (avg of exact integer sums; NULLS FIRST under LIMIT)
    "tpcds_q22" -> wrap(
      """SELECT i_product_name,
        |       i_brand,
        |       i_class,
        |       i_category,
        |       avg(inv_quantity_on_hand) qoh
        |FROM inventory,
        |     date_dim,
        |     item
        |WHERE inv_date_sk = d_date_sk
        |  AND inv_item_sk = i_item_sk
        |  AND d_month_seq BETWEEN 1200 AND 1200 + 11
        |GROUP BY ROLLUP (i_product_name, i_brand, i_class, i_category)
        |ORDER BY qoh,
        |         i_product_name NULLS FIRST,
        |         i_brand NULLS FIRST,
        |         i_class NULLS FIRST,
        |         i_category NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q25: store sale -> store return -> catalog repurchase profit
    // chain (the returned-date = sale-date + lag model exists for this
    // family's triple date window)
    "tpcds_q25" -> wrap(
      """SELECT i_item_id,
        |       i_item_desc,
        |       s_store_id,
        |       s_store_name,
        |       CAST(sum(ss_net_profit) AS BIGINT) AS store_sales_profit,
        |       CAST(sum(sr_net_loss) AS BIGINT) AS store_returns_loss,
        |       CAST(sum(cs_net_profit) AS BIGINT) AS catalog_sales_profit
        |FROM store_sales,
        |     store_returns,
        |     catalog_sales,
        |     date_dim d1,
        |     date_dim d2,
        |     date_dim d3,
        |     store,
        |     item
        |WHERE d1.d_moy = 4
        |  AND d1.d_year = 2001
        |  AND d1.d_date_sk = ss_sold_date_sk
        |  AND i_item_sk = ss_item_sk
        |  AND s_store_sk = ss_store_sk
        |  AND ss_customer_sk = sr_customer_sk
        |  AND ss_item_sk = sr_item_sk
        |  AND ss_ticket_number = sr_ticket_number
        |  AND sr_returned_date_sk = d2.d_date_sk
        |  AND d2.d_moy BETWEEN 4 AND 10
        |  AND d2.d_year = 2001
        |  AND sr_customer_sk = cs_bill_customer_sk
        |  AND sr_item_sk = cs_item_sk
        |  AND cs_sold_date_sk = d3.d_date_sk
        |  AND d3.d_moy BETWEEN 4 AND 10
        |  AND d3.d_year = 2001
        |GROUP BY i_item_id,
        |         i_item_desc,
        |         s_store_id,
        |         s_store_name
        |ORDER BY i_item_id,
        |         i_item_desc,
        |         s_store_id,
        |         s_store_name
        |LIMIT 100""".stripMargin),

    // q29: q25's quantity sibling (different windows)
    "tpcds_q29" -> wrap(
      """SELECT i_item_id,
        |       i_item_desc,
        |       s_store_id,
        |       s_store_name,
        |       CAST(sum(ss_quantity) AS BIGINT) AS store_sales_quantity,
        |       CAST(sum(sr_return_quantity) AS BIGINT) AS store_returns_quantity,
        |       CAST(sum(cs_quantity) AS BIGINT) AS catalog_sales_quantity
        |FROM store_sales,
        |     store_returns,
        |     catalog_sales,
        |     date_dim d1,
        |     date_dim d2,
        |     date_dim d3,
        |     store,
        |     item
        |WHERE d1.d_moy = 9
        |  AND d1.d_year = 1999
        |  AND d1.d_date_sk = ss_sold_date_sk
        |  AND i_item_sk = ss_item_sk
        |  AND s_store_sk = ss_store_sk
        |  AND ss_customer_sk = sr_customer_sk
        |  AND ss_item_sk = sr_item_sk
        |  AND ss_ticket_number = sr_ticket_number
        |  AND sr_returned_date_sk = d2.d_date_sk
        |  AND d2.d_moy BETWEEN 9 AND 9 + 3
        |  AND d2.d_year = 1999
        |  AND sr_customer_sk = cs_bill_customer_sk
        |  AND sr_item_sk = cs_item_sk
        |  AND cs_sold_date_sk = d3.d_date_sk
        |  AND d3.d_year IN (1999, 1999 + 1, 1999 + 2)
        |GROUP BY i_item_id,
        |         i_item_desc,
        |         s_store_id,
        |         s_store_name
        |ORDER BY i_item_id,
        |         i_item_desc,
        |         s_store_id,
        |         s_store_name
        |LIMIT 100""".stripMargin),

    // q31: counties where web outgrew store quarter-over-quarter
    // (ratios via DOUBLE casts; the web Q2-Q3 2000 growth slice in the
    // derivation gives the strict inequalities members)
    "tpcds_q31" -> wrap(
      """WITH ss AS
        | (SELECT ca_county,
        |         d_qoy,
        |         d_year,
        |         sum(ss_ext_sales_price) AS store_sales
        |  FROM store_sales,
        |       date_dim,
        |       customer_address
        |  WHERE ss_sold_date_sk = d_date_sk
        |    AND ss_addr_sk = ca_address_sk
        |  GROUP BY ca_county,
        |           d_qoy,
        |           d_year),
        | ws AS
        | (SELECT ca_county,
        |         d_qoy,
        |         d_year,
        |         sum(ws_ext_sales_price) AS web_sales
        |  FROM web_sales,
        |       date_dim,
        |       customer_address
        |  WHERE ws_sold_date_sk = d_date_sk
        |    AND ws_bill_addr_sk = ca_address_sk
        |  GROUP BY ca_county,
        |           d_qoy,
        |           d_year)
        |SELECT ss1.ca_county,
        |       ss1.d_year,
        |       CAST(ws2.web_sales AS DOUBLE) / ws1.web_sales web_q1_q2_increase,
        |       CAST(ss2.store_sales AS DOUBLE) / ss1.store_sales store_q1_q2_increase,
        |       CAST(ws3.web_sales AS DOUBLE) / ws2.web_sales web_q2_q3_increase,
        |       CAST(ss3.store_sales AS DOUBLE) / ss2.store_sales store_q2_q3_increase
        |FROM ss ss1,
        |     ss ss2,
        |     ss ss3,
        |     ws ws1,
        |     ws ws2,
        |     ws ws3
        |WHERE ss1.d_qoy = 1
        |  AND ss1.d_year = 2000
        |  AND ss1.ca_county = ss2.ca_county
        |  AND ss2.d_qoy = 2
        |  AND ss2.d_year = 2000
        |  AND ss2.ca_county = ss3.ca_county
        |  AND ss3.d_qoy = 3
        |  AND ss3.d_year = 2000
        |  AND ss1.ca_county = ws1.ca_county
        |  AND ws1.d_qoy = 1
        |  AND ws1.d_year = 2000
        |  AND ws1.ca_county = ws2.ca_county
        |  AND ws2.d_qoy = 2
        |  AND ws2.d_year = 2000
        |  AND ws1.ca_county = ws3.ca_county
        |  AND ws3.d_qoy = 3
        |  AND ws3.d_year = 2000
        |  AND CASE WHEN ws1.web_sales > 0 THEN CAST(ws2.web_sales AS DOUBLE) / ws1.web_sales ELSE NULL END > CASE WHEN ss1.store_sales > 0 THEN CAST(ss2.store_sales AS DOUBLE) / ss1.store_sales ELSE NULL END
        |  AND CASE WHEN ws2.web_sales > 0 THEN CAST(ws3.web_sales AS DOUBLE) / ws2.web_sales ELSE NULL END > CASE WHEN ss2.store_sales > 0 THEN CAST(ss3.store_sales AS DOUBLE) / ss2.store_sales ELSE NULL END
        |ORDER BY ss1.ca_county""".stripMargin),

    // q32: catalog discounts 1.3x over the per-item window average
    // (correlated scalar subquery; manufact 977 via the hot override)
    "tpcds_q32" -> wrap(
      """SELECT CAST(sum(cs_ext_discount_amt) AS BIGINT) AS excess_discount_amount
        |FROM catalog_sales,
        |     item,
        |     date_dim
        |WHERE i_manufact_id = 977
        |  AND i_item_sk = cs_item_sk
        |  AND d_date BETWEEN '2000-01-27' AND (CAST('2000-01-27' AS date) + 90)
        |  AND d_date_sk = cs_sold_date_sk
        |  AND cs_ext_discount_amt >
        |    (SELECT 1.3 * avg(cs_ext_discount_amt)
        |     FROM catalog_sales,
        |          date_dim
        |     WHERE cs_item_sk = i_item_sk
        |       AND d_date BETWEEN '2000-01-27' AND (CAST('2000-01-27' AS date) + 90)
        |       AND d_date_sk = cs_sold_date_sk)
        |LIMIT 100""".stripMargin),

    // q35: q10's state-level sibling with dep-count aggregate trios
    // (avg/max/sum aliased, sums cast)
    "tpcds_q35" -> wrap(
      """SELECT ca_state,
        |       cd_gender,
        |       cd_marital_status,
        |       cd_dep_count,
        |       count(*) cnt1,
        |       avg(cd_dep_count) avg1,
        |       max(cd_dep_count) max1,
        |       CAST(sum(cd_dep_count) AS BIGINT) sum1,
        |       cd_dep_employed_count,
        |       count(*) cnt2,
        |       avg(cd_dep_employed_count) avg2,
        |       max(cd_dep_employed_count) max2,
        |       CAST(sum(cd_dep_employed_count) AS BIGINT) sum2,
        |       cd_dep_college_count,
        |       count(*) cnt3,
        |       avg(cd_dep_college_count) avg3,
        |       max(cd_dep_college_count) max3,
        |       CAST(sum(cd_dep_college_count) AS BIGINT) sum3
        |FROM customer c,
        |     customer_address ca,
        |     customer_demographics
        |WHERE c.c_current_addr_sk = ca.ca_address_sk
        |  AND cd_demo_sk = c.c_current_cdemo_sk
        |  AND EXISTS
        |    (SELECT *
        |     FROM store_sales,
        |          date_dim
        |     WHERE c.c_customer_sk = ss_customer_sk
        |       AND ss_sold_date_sk = d_date_sk
        |       AND d_year = 2002
        |       AND d_qoy < 4)
        |  AND (EXISTS
        |         (SELECT *
        |          FROM web_sales,
        |               date_dim
        |          WHERE c.c_customer_sk = ws_bill_customer_sk
        |            AND ws_sold_date_sk = d_date_sk
        |            AND d_year = 2002
        |            AND d_qoy < 4)
        |       OR EXISTS
        |         (SELECT *
        |          FROM catalog_sales,
        |               date_dim
        |          WHERE c.c_customer_sk = cs_ship_customer_sk
        |            AND cs_sold_date_sk = d_date_sk
        |            AND d_year = 2002
        |            AND d_qoy < 4))
        |GROUP BY ca_state,
        |         cd_gender,
        |         cd_marital_status,
        |         cd_dep_count,
        |         cd_dep_employed_count,
        |         cd_dep_college_count
        |ORDER BY ca_state,
        |         cd_gender,
        |         cd_marital_status,
        |         cd_dep_count,
        |         cd_dep_employed_count,
        |         cd_dep_college_count
        |LIMIT 100""".stripMargin),

    // q36: gross-margin hierarchy rank over ROLLUP(category, class)
    // (grouping()-keyed rank partition; margin via DOUBLE casts;
    // ORDER extended with the rollup keys NULLS FIRST)
    "tpcds_q36" -> wrap(
      """SELECT CAST(sum(ss_net_profit) AS DOUBLE) / sum(ss_ext_sales_price) AS gross_margin,
        |       i_category,
        |       i_class,
        |       grouping(i_category) + grouping(i_class) AS lochierarchy,
        |       rank() OVER (PARTITION BY grouping(i_category) + grouping(i_class),
        |                    CASE WHEN grouping(i_class) = 0 THEN i_category END
        |                    ORDER BY CAST(sum(ss_net_profit) AS DOUBLE) / sum(ss_ext_sales_price) ASC) AS rank_within_parent
        |FROM store_sales,
        |     date_dim d1,
        |     item,
        |     store
        |WHERE d1.d_year = 2001
        |  AND d1.d_date_sk = ss_sold_date_sk
        |  AND i_item_sk = ss_item_sk
        |  AND s_store_sk = ss_store_sk
        |  AND s_state IN ('TN', 'TN', 'TN', 'TN', 'TN', 'TN', 'TN', 'TN')
        |GROUP BY ROLLUP (i_category, i_class)
        |ORDER BY lochierarchy DESC,
        |         CASE WHEN lochierarchy = 0 THEN i_category END NULLS FIRST,
        |         rank_within_parent,
        |         i_category NULLS FIRST,
        |         i_class NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q43: per-store day-of-week sales pivot (engine-portable
    // d_day_name off the arithmetic d_dow)
    "tpcds_q43" -> wrap(
      """SELECT s_store_name,
        |       s_store_id,
        |       CAST(sum(CASE WHEN (d_day_name = 'Sunday') THEN ss_sales_price ELSE NULL END) AS BIGINT) sun_sales,
        |       CAST(sum(CASE WHEN (d_day_name = 'Monday') THEN ss_sales_price ELSE NULL END) AS BIGINT) mon_sales,
        |       CAST(sum(CASE WHEN (d_day_name = 'Tuesday') THEN ss_sales_price ELSE NULL END) AS BIGINT) tue_sales,
        |       CAST(sum(CASE WHEN (d_day_name = 'Wednesday') THEN ss_sales_price ELSE NULL END) AS BIGINT) wed_sales,
        |       CAST(sum(CASE WHEN (d_day_name = 'Thursday') THEN ss_sales_price ELSE NULL END) AS BIGINT) thu_sales,
        |       CAST(sum(CASE WHEN (d_day_name = 'Friday') THEN ss_sales_price ELSE NULL END) AS BIGINT) fri_sales,
        |       CAST(sum(CASE WHEN (d_day_name = 'Saturday') THEN ss_sales_price ELSE NULL END) AS BIGINT) sat_sales
        |FROM date_dim,
        |     store_sales,
        |     store
        |WHERE d_date_sk = ss_sold_date_sk
        |  AND s_store_sk = ss_store_sk
        |  AND s_gmt_offset = -5
        |  AND d_year = 2000
        |GROUP BY s_store_name,
        |         s_store_id
        |ORDER BY s_store_name,
        |         s_store_id,
        |         sun_sales,
        |         mon_sales,
        |         tue_sales,
        |         wed_sales,
        |         thu_sales,
        |         fri_sales,
        |         sat_sales
        |LIMIT 100""".stripMargin),

    // q46: q68's weekend sibling (dow IN (6,0), city pair output)
    "tpcds_q46" -> wrap(
      """SELECT c_last_name,
        |       c_first_name,
        |       ca_city,
        |       bought_city,
        |       ss_ticket_number,
        |       amt,
        |       profit
        |FROM
        |  (SELECT ss_ticket_number,
        |          ss_customer_sk,
        |          ca_city bought_city,
        |          CAST(sum(ss_coupon_amt) AS BIGINT) amt,
        |          CAST(sum(ss_net_profit) AS BIGINT) profit
        |   FROM store_sales,
        |        date_dim,
        |        store,
        |        household_demographics,
        |        customer_address
        |   WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        |     AND store_sales.ss_store_sk = store.s_store_sk
        |     AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        |     AND store_sales.ss_addr_sk = customer_address.ca_address_sk
        |     AND (household_demographics.hd_dep_count = 4
        |          OR household_demographics.hd_vehicle_count = 3)
        |     AND date_dim.d_dow IN (6, 0)
        |     AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        |     AND store.s_city IN ('Fairview', 'Midway', 'Fairview', 'Fairview', 'Fairview')
        |   GROUP BY ss_ticket_number,
        |            ss_customer_sk,
        |            ss_addr_sk,
        |            ca_city) dn,
        |     customer,
        |     customer_address current_addr
        |WHERE ss_customer_sk = c_customer_sk
        |  AND customer.c_current_addr_sk = current_addr.ca_address_sk
        |  AND current_addr.ca_city <> bought_city
        |ORDER BY c_last_name,
        |         c_first_name,
        |         ca_city,
        |         bought_city,
        |         ss_ticket_number
        |LIMIT 100""".stripMargin),

    // q48: single quantity sum under demographic x address band ORs
    // (same per-unit band family as q13)
    "tpcds_q48" -> wrap(
      """SELECT CAST(sum(ss_quantity) AS BIGINT) AS sum_qty
        |FROM store_sales,
        |     store,
        |     customer_demographics,
        |     customer_address,
        |     date_dim
        |WHERE s_store_sk = ss_store_sk
        |  AND ss_sold_date_sk = d_date_sk
        |  AND d_year = 2000
        |  AND ((cd_demo_sk = ss_cdemo_sk
        |        AND cd_marital_status = 'M'
        |        AND cd_education_status = '4 yr Degree'
        |        AND ss_sales_price BETWEEN 100.00 AND 150.00)
        |       OR (cd_demo_sk = ss_cdemo_sk
        |           AND cd_marital_status = 'D'
        |           AND cd_education_status = '2 yr Degree'
        |           AND ss_sales_price BETWEEN 50.00 AND 100.00)
        |       OR (cd_demo_sk = ss_cdemo_sk
        |           AND cd_marital_status = 'S'
        |           AND cd_education_status = 'College'
        |           AND ss_sales_price BETWEEN 150.00 AND 200.00))
        |  AND ((ss_addr_sk = ca_address_sk
        |        AND ca_country = 'United States'
        |        AND ca_state IN ('CO', 'OH', 'TX')
        |        AND ss_net_profit BETWEEN 0 AND 2000)
        |       OR (ss_addr_sk = ca_address_sk
        |           AND ca_country = 'United States'
        |           AND ca_state IN ('OR', 'MN', 'KY')
        |           AND ss_net_profit BETWEEN 150 AND 3000)
        |       OR (ss_addr_sk = ca_address_sk
        |           AND ca_country = 'United States'
        |           AND ca_state IN ('VA', 'CA', 'MS')
        |           AND ss_net_profit BETWEEN 50 AND 25000))
        |LIMIT 100""".stripMargin),

    // q50: sale->return latency buckets per store (the lag model makes
    // every bucket reachable; bucket aliases, q95 naming precedent)
    "tpcds_q50" -> wrap(
      """SELECT s_store_name,
        |       s_company_id,
        |       s_street_number,
        |       s_street_name,
        |       s_street_type,
        |       s_suite_number,
        |       s_city,
        |       s_county,
        |       s_state,
        |       s_zip,
        |       CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk <= 30) THEN 1 ELSE 0 END) AS BIGINT) AS days_30,
        |       CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 30)
        |                      AND (sr_returned_date_sk - ss_sold_date_sk <= 60) THEN 1 ELSE 0 END) AS BIGINT) AS days_31_60,
        |       CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 60)
        |                      AND (sr_returned_date_sk - ss_sold_date_sk <= 90) THEN 1 ELSE 0 END) AS BIGINT) AS days_61_90,
        |       CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 90)
        |                      AND (sr_returned_date_sk - ss_sold_date_sk <= 120) THEN 1 ELSE 0 END) AS BIGINT) AS days_91_120,
        |       CAST(sum(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 120) THEN 1 ELSE 0 END) AS BIGINT) AS days_over_120
        |FROM store_sales,
        |     store_returns,
        |     store,
        |     date_dim d1,
        |     date_dim d2
        |WHERE d2.d_year = 2001
        |  AND d2.d_moy = 8
        |  AND ss_ticket_number = sr_ticket_number
        |  AND ss_item_sk = sr_item_sk
        |  AND ss_sold_date_sk = d1.d_date_sk
        |  AND sr_returned_date_sk = d2.d_date_sk
        |  AND ss_customer_sk = sr_customer_sk
        |  AND ss_store_sk = s_store_sk
        |GROUP BY s_store_name,
        |         s_company_id,
        |         s_street_number,
        |         s_street_name,
        |         s_street_type,
        |         s_suite_number,
        |         s_city,
        |         s_county,
        |         s_state,
        |         s_zip
        |ORDER BY s_store_name,
        |         s_company_id,
        |         s_street_number,
        |         s_street_name,
        |         s_street_type,
        |         s_suite_number,
        |         s_city,
        |         s_county,
        |         s_state,
        |         s_zip
        |LIMIT 100""".stripMargin),

    // q59: week-over-week per-store day-name ratios across two years
    // (ratio aliases; week join duplicates rows per canonical shape)
    "tpcds_q59" -> wrap(
      """WITH wss AS
        | (SELECT d_week_seq,
        |         ss_store_sk,
        |         sum(CASE WHEN (d_day_name = 'Sunday') THEN ss_sales_price ELSE NULL END) sun_sales,
        |         sum(CASE WHEN (d_day_name = 'Monday') THEN ss_sales_price ELSE NULL END) mon_sales,
        |         sum(CASE WHEN (d_day_name = 'Tuesday') THEN ss_sales_price ELSE NULL END) tue_sales,
        |         sum(CASE WHEN (d_day_name = 'Wednesday') THEN ss_sales_price ELSE NULL END) wed_sales,
        |         sum(CASE WHEN (d_day_name = 'Thursday') THEN ss_sales_price ELSE NULL END) thu_sales,
        |         sum(CASE WHEN (d_day_name = 'Friday') THEN ss_sales_price ELSE NULL END) fri_sales,
        |         sum(CASE WHEN (d_day_name = 'Saturday') THEN ss_sales_price ELSE NULL END) sat_sales
        |  FROM store_sales,
        |       date_dim
        |  WHERE d_date_sk = ss_sold_date_sk
        |  GROUP BY d_week_seq,
        |           ss_store_sk)
        |SELECT s_store_name1,
        |       s_store_id1,
        |       d_week_seq1,
        |       CAST(sun_sales1 AS DOUBLE) / sun_sales2 AS sun_ratio,
        |       CAST(mon_sales1 AS DOUBLE) / mon_sales2 AS mon_ratio,
        |       CAST(tue_sales1 AS DOUBLE) / tue_sales2 AS tue_ratio,
        |       CAST(wed_sales1 AS DOUBLE) / wed_sales2 AS wed_ratio,
        |       CAST(thu_sales1 AS DOUBLE) / thu_sales2 AS thu_ratio,
        |       CAST(fri_sales1 AS DOUBLE) / fri_sales2 AS fri_ratio,
        |       CAST(sat_sales1 AS DOUBLE) / sat_sales2 AS sat_ratio
        |FROM
        |  (SELECT s_store_name s_store_name1,
        |          wss.d_week_seq d_week_seq1,
        |          s_store_id s_store_id1,
        |          sun_sales sun_sales1,
        |          mon_sales mon_sales1,
        |          tue_sales tue_sales1,
        |          wed_sales wed_sales1,
        |          thu_sales thu_sales1,
        |          fri_sales fri_sales1,
        |          sat_sales sat_sales1
        |   FROM wss,
        |        store,
        |        date_dim d
        |   WHERE d.d_week_seq = wss.d_week_seq
        |     AND ss_store_sk = s_store_sk
        |     AND d_month_seq BETWEEN 1212 AND 1212 + 11) y,
        |  (SELECT s_store_name s_store_name2,
        |          wss.d_week_seq d_week_seq2,
        |          s_store_id s_store_id2,
        |          sun_sales sun_sales2,
        |          mon_sales mon_sales2,
        |          tue_sales tue_sales2,
        |          wed_sales wed_sales2,
        |          thu_sales thu_sales2,
        |          fri_sales fri_sales2,
        |          sat_sales sat_sales2
        |   FROM wss,
        |        store,
        |        date_dim d
        |   WHERE d.d_week_seq = wss.d_week_seq
        |     AND ss_store_sk = s_store_sk
        |     AND d_month_seq BETWEEN 1212 + 12 AND 1212 + 23) x
        |WHERE s_store_id1 = s_store_id2
        |  AND d_week_seq1 = d_week_seq2 - 52
        |ORDER BY s_store_name1,
        |         s_store_id1,
        |         d_week_seq1
        |LIMIT 100""".stripMargin),

    // q65: items earning under 0.1x their store's average item revenue
    // (nested per-store/item revenue aggregates; ORDER extended)
    "tpcds_q65" -> wrap(
      """SELECT s_store_name,
        |       i_item_desc,
        |       CAST(sc.revenue AS BIGINT) AS revenue,
        |       i_current_price,
        |       i_wholesale_cost,
        |       i_brand
        |FROM store,
        |     item,
        |     (SELECT ss_store_sk,
        |             avg(revenue) AS ave
        |      FROM
        |        (SELECT ss_store_sk,
        |                ss_item_sk,
        |                sum(ss_sales_price) AS revenue
        |         FROM store_sales,
        |              date_dim
        |         WHERE ss_sold_date_sk = d_date_sk
        |           AND d_month_seq BETWEEN 1176 AND 1176 + 11
        |         GROUP BY ss_store_sk,
        |                  ss_item_sk) sa
        |      GROUP BY ss_store_sk) sb,
        |     (SELECT ss_store_sk,
        |             ss_item_sk,
        |             sum(ss_sales_price) AS revenue
        |      FROM store_sales,
        |           date_dim
        |      WHERE ss_sold_date_sk = d_date_sk
        |        AND d_month_seq BETWEEN 1176 AND 1176 + 11
        |      GROUP BY ss_store_sk,
        |               ss_item_sk) sc
        |WHERE sb.ss_store_sk = sc.ss_store_sk
        |  AND sc.revenue <= 0.1 * sb.ave
        |  AND s_store_sk = sc.ss_store_sk
        |  AND i_item_sk = sc.ss_item_sk
        |ORDER BY s_store_name,
        |         i_item_desc,
        |         revenue,
        |         i_brand,
        |         i_current_price
        |LIMIT 100""".stripMargin),

    // q69: q35's NOT-EXISTS sibling (store buyers absent from web and
    // catalog in the window)
    "tpcds_q69" -> wrap(
      """SELECT cd_gender,
        |       cd_marital_status,
        |       cd_education_status,
        |       count(*) cnt1,
        |       cd_purchase_estimate,
        |       count(*) cnt2,
        |       cd_credit_rating,
        |       count(*) cnt3
        |FROM customer c,
        |     customer_address ca,
        |     customer_demographics
        |WHERE c.c_current_addr_sk = ca.ca_address_sk
        |  AND ca_state IN ('KY', 'GA', 'NM')
        |  AND cd_demo_sk = c.c_current_cdemo_sk
        |  AND EXISTS
        |    (SELECT *
        |     FROM store_sales,
        |          date_dim
        |     WHERE c.c_customer_sk = ss_customer_sk
        |       AND ss_sold_date_sk = d_date_sk
        |       AND d_year = 2001
        |       AND d_moy BETWEEN 4 AND 4 + 2)
        |  AND (NOT EXISTS
        |         (SELECT *
        |          FROM web_sales,
        |               date_dim
        |          WHERE c.c_customer_sk = ws_bill_customer_sk
        |            AND ws_sold_date_sk = d_date_sk
        |            AND d_year = 2001
        |            AND d_moy BETWEEN 4 AND 4 + 2)
        |       AND NOT EXISTS
        |         (SELECT *
        |          FROM catalog_sales,
        |               date_dim
        |          WHERE c.c_customer_sk = cs_ship_customer_sk
        |            AND cs_sold_date_sk = d_date_sk
        |            AND d_year = 2001
        |            AND d_moy BETWEEN 4 AND 4 + 2))
        |GROUP BY cd_gender,
        |         cd_marital_status,
        |         cd_education_status,
        |         cd_purchase_estimate,
        |         cd_credit_rating
        |ORDER BY cd_gender,
        |         cd_marital_status,
        |         cd_education_status,
        |         cd_purchase_estimate,
        |         cd_credit_rating
        |LIMIT 100""".stripMargin),

    // q70: state/county profit rollup ranked within hierarchy, top-5
    // states by a windowed rank subquery (ORDER extended NULLS FIRST)
    "tpcds_q70" -> wrap(
      """SELECT CAST(sum(ss_net_profit) AS BIGINT) AS total_sum,
        |       s_state,
        |       s_county,
        |       grouping(s_state) + grouping(s_county) AS lochierarchy,
        |       rank() OVER (PARTITION BY grouping(s_state) + grouping(s_county),
        |                    CASE WHEN grouping(s_county) = 0 THEN s_state END
        |                    ORDER BY sum(ss_net_profit) DESC) AS rank_within_parent
        |FROM store_sales,
        |     date_dim d1,
        |     store
        |WHERE d1.d_month_seq BETWEEN 1200 AND 1200 + 11
        |  AND d1.d_date_sk = ss_sold_date_sk
        |  AND s_store_sk = ss_store_sk
        |  AND s_state IN
        |    (SELECT s_state
        |     FROM
        |       (SELECT s_state AS s_state,
        |               rank() OVER (PARTITION BY s_state ORDER BY sum(ss_net_profit) DESC) AS ranking
        |        FROM store_sales,
        |             store,
        |             date_dim
        |        WHERE d_month_seq BETWEEN 1200 AND 1200 + 11
        |          AND d_date_sk = ss_sold_date_sk
        |          AND s_store_sk = ss_store_sk
        |        GROUP BY s_state) tmp1
        |     WHERE ranking <= 5)
        |GROUP BY ROLLUP (s_state, s_county)
        |ORDER BY lochierarchy DESC,
        |         CASE WHEN lochierarchy = 0 THEN s_state END NULLS FIRST,
        |         rank_within_parent,
        |         s_state NULLS FIRST,
        |         s_county NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q71: brand revenue by breakfast/dinner half-hours across all
    // three channels (t_meal_time; ORDER extended with brand)
    "tpcds_q71" -> wrap(
      """SELECT i_brand_id brand_id,
        |       i_brand brand,
        |       t_hour,
        |       t_minute,
        |       CAST(sum(ext_price) AS BIGINT) ext_price
        |FROM item,
        |     (SELECT ws_ext_sales_price AS ext_price,
        |             ws_sold_date_sk AS sold_date_sk,
        |             ws_item_sk AS sold_item_sk,
        |             ws_sold_time_sk AS time_sk
        |      FROM web_sales,
        |           date_dim
        |      WHERE d_date_sk = ws_sold_date_sk
        |        AND d_moy = 11
        |        AND d_year = 1999
        |      UNION ALL
        |      SELECT cs_ext_sales_price AS ext_price,
        |             cs_sold_date_sk AS sold_date_sk,
        |             cs_item_sk AS sold_item_sk,
        |             cs_sold_time_sk AS time_sk
        |      FROM catalog_sales,
        |           date_dim
        |      WHERE d_date_sk = cs_sold_date_sk
        |        AND d_moy = 11
        |        AND d_year = 1999
        |      UNION ALL
        |      SELECT ss_ext_sales_price AS ext_price,
        |             ss_sold_date_sk AS sold_date_sk,
        |             ss_item_sk AS sold_item_sk,
        |             ss_sold_time_sk AS time_sk
        |      FROM store_sales,
        |           date_dim
        |      WHERE d_date_sk = ss_sold_date_sk
        |        AND d_moy = 11
        |        AND d_year = 1999) tmp,
        |     time_dim
        |WHERE sold_item_sk = i_item_sk
        |  AND i_manager_id = 1
        |  AND time_sk = t_time_sk
        |  AND (t_meal_time = 'breakfast'
        |       OR t_meal_time = 'dinner')
        |GROUP BY i_brand,
        |         i_brand_id,
        |         t_hour,
        |         t_minute
        |ORDER BY ext_price DESC,
        |         i_brand_id,
        |         brand,
        |         t_hour,
        |         t_minute""".stripMargin),

    // q82: q37's store sibling (manufact ids 821/938 via the hot
    // override, 270 via the base formula)
    "tpcds_q82" -> wrap(
      """SELECT i_item_id,
        |       i_item_desc,
        |       i_current_price
        |FROM item,
        |     inventory,
        |     date_dim,
        |     store_sales
        |WHERE i_current_price BETWEEN 62 AND 62 + 30
        |  AND inv_item_sk = i_item_sk
        |  AND d_date_sk = inv_date_sk
        |  AND d_date BETWEEN CAST('2000-05-25' AS date) AND (CAST('2000-05-25' AS date) + 60)
        |  AND i_manufact_id IN (129, 270, 821, 938)
        |  AND inv_quantity_on_hand BETWEEN 100 AND 500
        |  AND ss_item_sk = i_item_sk
        |GROUP BY i_item_id,
        |         i_item_desc,
        |         i_current_price
        |ORDER BY i_item_id
        |LIMIT 100""".stripMargin),

    // q92: q32's web sibling (manufact 350 via the hot override so the
    // per-item window groups are wide enough to exceed 1.3x avg)
    "tpcds_q92" -> wrap(
      """SELECT CAST(sum(ws_ext_discount_amt) AS BIGINT) AS excess_discount_amount
        |FROM web_sales,
        |     item,
        |     date_dim
        |WHERE i_manufact_id = 350
        |  AND i_item_sk = ws_item_sk
        |  AND d_date BETWEEN '2000-01-27' AND (CAST('2000-01-27' AS date) + 90)
        |  AND d_date_sk = ws_sold_date_sk
        |  AND ws_ext_discount_amt >
        |    (SELECT 1.3 * avg(ws_ext_discount_amt)
        |     FROM web_sales,
        |          date_dim
        |     WHERE ws_item_sk = i_item_sk
        |       AND d_date BETWEEN '2000-01-27' AND (CAST('2000-01-27' AS date) + 90)
        |       AND d_date_sk = ws_sold_date_sk)
        |ORDER BY excess_discount_amount
        |LIMIT 100""".stripMargin),

    "tpcds_q88" -> wrap(q88Body),

    // q94: q95's correlated sibling — EXISTS (semi) + NOT EXISTS (anti)
    // instead of the CTE + IN-subquery formulation
    "tpcds_q94" -> wrap(
      """SELECT count(DISTINCT ws_order_number) AS order_count ,
        |       CAST(sum(ws_ext_ship_cost) AS BIGINT) AS total_shipping_cost ,
        |       CAST(sum(ws_net_profit) AS BIGINT) AS total_net_profit
        |FROM web_sales ws1 ,
        |     date_dim ,
        |     customer_address ,
        |     web_site
        |WHERE d_date BETWEEN '1999-02-01' AND cast('1999-04-02' AS date)
        |  AND ws1.ws_ship_date_sk = d_date_sk
        |  AND ws1.ws_ship_addr_sk = ca_address_sk
        |  AND ca_state = 'IL'
        |  AND ws1.ws_web_site_sk = web_site_sk
        |  AND web_company_name = 'pri'
        |  AND EXISTS
        |    (SELECT *
        |     FROM web_sales ws2
        |     WHERE ws1.ws_order_number = ws2.ws_order_number
        |       AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
        |  AND NOT exists
        |    (SELECT *
        |     FROM web_returns wr1
        |     WHERE ws1.ws_order_number = wr1.wr_order_number)
        |ORDER BY count(DISTINCT ws_order_number)
        |LIMIT 100""".stripMargin),

    // q95: warehouse-pair CTE self-joined through two IN subqueries
    "tpcds_q95" -> wrap(
      """WITH ws_wh AS
        |  (SELECT ws1.ws_order_number,
        |          ws1.ws_warehouse_sk wh1,
        |          ws2.ws_warehouse_sk wh2
        |   FROM web_sales ws1,
        |        web_sales ws2
        |   WHERE ws1.ws_order_number = ws2.ws_order_number
        |     AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
        |SELECT count(DISTINCT ws_order_number) AS order_count ,
        |       CAST(sum(ws_ext_ship_cost) AS BIGINT) AS total_shipping_cost ,
        |       CAST(sum(ws_net_profit) AS BIGINT) AS total_net_profit
        |FROM web_sales ws1 ,
        |     date_dim ,
        |     customer_address ,
        |     web_site
        |WHERE d_date BETWEEN '1999-02-01' AND cast('1999-04-02' AS date)
        |  AND ws1.ws_ship_date_sk = d_date_sk
        |  AND ws1.ws_ship_addr_sk = ca_address_sk
        |  AND ca_state = 'IL'
        |  AND ws1.ws_web_site_sk = web_site_sk
        |  AND web_company_name = 'pri'
        |  AND ws1.ws_order_number IN
        |    (SELECT ws_order_number
        |     FROM ws_wh)
        |  AND ws1.ws_order_number IN
        |    (SELECT wr_order_number
        |     FROM web_returns,
        |          ws_wh
        |     WHERE wr_order_number = ws_wh.ws_order_number)
        |ORDER BY count(DISTINCT ws_order_number)
        |LIMIT 100""".stripMargin),

    // q2: week-over-week weekday revenue ratios across web+catalog (floor-scaled r1..r7, q78 rounding rule)
    "tpcds_q2" -> wrap(
      """WITH wscs AS
        |  (SELECT sold_date_sk,
        |          sales_price
        |   FROM
        |     (SELECT ws_sold_date_sk sold_date_sk,
        |             ws_ext_sales_price sales_price
        |      FROM web_sales
        |      UNION ALL SELECT cs_sold_date_sk sold_date_sk,
        |                       cs_ext_sales_price sales_price
        |      FROM catalog_sales) sq1),
        |     wswscs AS
        |  (SELECT d_week_seq,
        |          sum(CASE
        |                  WHEN (d_day_name='Sunday') THEN sales_price
        |                  ELSE NULL
        |              END) sun_sales,
        |          sum(CASE
        |                  WHEN (d_day_name='Monday') THEN sales_price
        |                  ELSE NULL
        |              END) mon_sales,
        |          sum(CASE
        |                  WHEN (d_day_name='Tuesday') THEN sales_price
        |                  ELSE NULL
        |              END) tue_sales,
        |          sum(CASE
        |                  WHEN (d_day_name='Wednesday') THEN sales_price
        |                  ELSE NULL
        |              END) wed_sales,
        |          sum(CASE
        |                  WHEN (d_day_name='Thursday') THEN sales_price
        |                  ELSE NULL
        |              END) thu_sales,
        |          sum(CASE
        |                  WHEN (d_day_name='Friday') THEN sales_price
        |                  ELSE NULL
        |              END) fri_sales,
        |          sum(CASE
        |                  WHEN (d_day_name='Saturday') THEN sales_price
        |                  ELSE NULL
        |              END) sat_sales
        |   FROM wscs,
        |        date_dim
        |   WHERE d_date_sk = sold_date_sk
        |   GROUP BY d_week_seq)
        |SELECT d_week_seq1,
        |       CAST(floor(CAST(sun_sales1 AS DOUBLE) * 100 / sun_sales2) AS BIGINT) r1,
        |       CAST(floor(CAST(mon_sales1 AS DOUBLE) * 100 / mon_sales2) AS BIGINT) r2,
        |       CAST(floor(CAST(tue_sales1 AS DOUBLE) * 100 / tue_sales2) AS BIGINT) r3,
        |       CAST(floor(CAST(wed_sales1 AS DOUBLE) * 100 / wed_sales2) AS BIGINT) r4,
        |       CAST(floor(CAST(thu_sales1 AS DOUBLE) * 100 / thu_sales2) AS BIGINT) r5,
        |       CAST(floor(CAST(fri_sales1 AS DOUBLE) * 100 / fri_sales2) AS BIGINT) r6,
        |       CAST(floor(CAST(sat_sales1 AS DOUBLE) * 100 / sat_sales2) AS BIGINT) r7
        |FROM
        |  (SELECT wswscs.d_week_seq d_week_seq1,
        |          sun_sales sun_sales1,
        |          mon_sales mon_sales1,
        |          tue_sales tue_sales1,
        |          wed_sales wed_sales1,
        |          thu_sales thu_sales1,
        |          fri_sales fri_sales1,
        |          sat_sales sat_sales1
        |   FROM wswscs,
        |        date_dim
        |   WHERE date_dim.d_week_seq = wswscs.d_week_seq
        |     AND d_year = 2001) y,
        |  (SELECT wswscs.d_week_seq d_week_seq2,
        |          sun_sales sun_sales2,
        |          mon_sales mon_sales2,
        |          tue_sales tue_sales2,
        |          wed_sales wed_sales2,
        |          thu_sales thu_sales2,
        |          fri_sales fri_sales2,
        |          sat_sales sat_sales2
        |   FROM wswscs,
        |        date_dim
        |   WHERE date_dim.d_week_seq = wswscs.d_week_seq
        |     AND d_year = 2001+1) z
        |WHERE d_week_seq1 = d_week_seq2-53
        |ORDER BY d_week_seq1 NULLS FIRST""".stripMargin),

    // q8: store net profit for preferred-customer zip neighborhoods (canonical 400-zip list; sum aliased+cast)
    "tpcds_q8" -> wrap(
      """SELECT s_store_name,
        |       CAST(sum(ss_net_profit) AS BIGINT) AS net_profit
        |FROM store_sales,
        |     date_dim,
        |     store,
        |  (SELECT ca_zip
        |   FROM
        |     (SELECT SUBSTRING(ca_zip, 1, 5) ca_zip
        |      FROM customer_address
        |      WHERE SUBSTRING(ca_zip, 1, 5) IN ('24128',
        |                                     '76232',
        |                                     '65084',
        |                                     '87816',
        |                                     '83926',
        |                                     '77556',
        |                                     '20548',
        |                                     '26231',
        |                                     '43848',
        |                                     '15126',
        |                                     '91137',
        |                                     '61265',
        |                                     '98294',
        |                                     '25782',
        |                                     '17920',
        |                                     '18426',
        |                                     '98235',
        |                                     '40081',
        |                                     '84093',
        |                                     '28577',
        |                                     '55565',
        |                                     '17183',
        |                                     '54601',
        |                                     '67897',
        |                                     '22752',
        |                                     '86284',
        |                                     '18376',
        |                                     '38607',
        |                                     '45200',
        |                                     '21756',
        |                                     '29741',
        |                                     '96765',
        |                                     '23932',
        |                                     '89360',
        |                                     '29839',
        |                                     '25989',
        |                                     '28898',
        |                                     '91068',
        |                                     '72550',
        |                                     '10390',
        |                                     '18845',
        |                                     '47770',
        |                                     '82636',
        |                                     '41367',
        |                                     '76638',
        |                                     '86198',
        |                                     '81312',
        |                                     '37126',
        |                                     '39192',
        |                                     '88424',
        |                                     '72175',
        |                                     '81426',
        |                                     '53672',
        |                                     '10445',
        |                                     '42666',
        |                                     '66864',
        |                                     '66708',
        |                                     '41248',
        |                                     '48583',
        |                                     '82276',
        |                                     '18842',
        |                                     '78890',
        |                                     '49448',
        |                                     '14089',
        |                                     '38122',
        |                                     '34425',
        |                                     '79077',
        |                                     '19849',
        |                                     '43285',
        |                                     '39861',
        |                                     '66162',
        |                                     '77610',
        |                                     '13695',
        |                                     '99543',
        |                                     '83444',
        |                                     '83041',
        |                                     '12305',
        |                                     '57665',
        |                                     '68341',
        |                                     '25003',
        |                                     '57834',
        |                                     '62878',
        |                                     '49130',
        |                                     '81096',
        |                                     '18840',
        |                                     '27700',
        |                                     '23470',
        |                                     '50412',
        |                                     '21195',
        |                                     '16021',
        |                                     '76107',
        |                                     '71954',
        |                                     '68309',
        |                                     '18119',
        |                                     '98359',
        |                                     '64544',
        |                                     '10336',
        |                                     '86379',
        |                                     '27068',
        |                                     '39736',
        |                                     '98569',
        |                                     '28915',
        |                                     '24206',
        |                                     '56529',
        |                                     '57647',
        |                                     '54917',
        |                                     '42961',
        |                                     '91110',
        |                                     '63981',
        |                                     '14922',
        |                                     '36420',
        |                                     '23006',
        |                                     '67467',
        |                                     '32754',
        |                                     '30903',
        |                                     '20260',
        |                                     '31671',
        |                                     '51798',
        |                                     '72325',
        |                                     '85816',
        |                                     '68621',
        |                                     '13955',
        |                                     '36446',
        |                                     '41766',
        |                                     '68806',
        |                                     '16725',
        |                                     '15146',
        |                                     '22744',
        |                                     '35850',
        |                                     '88086',
        |                                     '51649',
        |                                     '18270',
        |                                     '52867',
        |                                     '39972',
        |                                     '96976',
        |                                     '63792',
        |                                     '11376',
        |                                     '94898',
        |                                     '13595',
        |                                     '10516',
        |                                     '90225',
        |                                     '58943',
        |                                     '39371',
        |                                     '94945',
        |                                     '28587',
        |                                     '96576',
        |                                     '57855',
        |                                     '28488',
        |                                     '26105',
        |                                     '83933',
        |                                     '25858',
        |                                     '34322',
        |                                     '44438',
        |                                     '73171',
        |                                     '30122',
        |                                     '34102',
        |                                     '22685',
        |                                     '71256',
        |                                     '78451',
        |                                     '54364',
        |                                     '13354',
        |                                     '45375',
        |                                     '40558',
        |                                     '56458',
        |                                     '28286',
        |                                     '45266',
        |                                     '47305',
        |                                     '69399',
        |                                     '83921',
        |                                     '26233',
        |                                     '11101',
        |                                     '15371',
        |                                     '69913',
        |                                     '35942',
        |                                     '15882',
        |                                     '25631',
        |                                     '24610',
        |                                     '44165',
        |                                     '99076',
        |                                     '33786',
        |                                     '70738',
        |                                     '26653',
        |                                     '14328',
        |                                     '72305',
        |                                     '62496',
        |                                     '22152',
        |                                     '10144',
        |                                     '64147',
        |                                     '48425',
        |                                     '14663',
        |                                     '21076',
        |                                     '18799',
        |                                     '30450',
        |                                     '63089',
        |                                     '81019',
        |                                     '68893',
        |                                     '24996',
        |                                     '51200',
        |                                     '51211',
        |                                     '45692',
        |                                     '92712',
        |                                     '70466',
        |                                     '79994',
        |                                     '22437',
        |                                     '25280',
        |                                     '38935',
        |                                     '71791',
        |                                     '73134',
        |                                     '56571',
        |                                     '14060',
        |                                     '19505',
        |                                     '72425',
        |                                     '56575',
        |                                     '74351',
        |                                     '68786',
        |                                     '51650',
        |                                     '20004',
        |                                     '18383',
        |                                     '76614',
        |                                     '11634',
        |                                     '18906',
        |                                     '15765',
        |                                     '41368',
        |                                     '73241',
        |                                     '76698',
        |                                     '78567',
        |                                     '97189',
        |                                     '28545',
        |                                     '76231',
        |                                     '75691',
        |                                     '22246',
        |                                     '51061',
        |                                     '90578',
        |                                     '56691',
        |                                     '68014',
        |                                     '51103',
        |                                     '94167',
        |                                     '57047',
        |                                     '14867',
        |                                     '73520',
        |                                     '15734',
        |                                     '63435',
        |                                     '25733',
        |                                     '35474',
        |                                     '24676',
        |                                     '94627',
        |                                     '53535',
        |                                     '17879',
        |                                     '15559',
        |                                     '53268',
        |                                     '59166',
        |                                     '11928',
        |                                     '59402',
        |                                     '33282',
        |                                     '45721',
        |                                     '43933',
        |                                     '68101',
        |                                     '33515',
        |                                     '36634',
        |                                     '71286',
        |                                     '19736',
        |                                     '58058',
        |                                     '55253',
        |                                     '67473',
        |                                     '41918',
        |                                     '19515',
        |                                     '36495',
        |                                     '19430',
        |                                     '22351',
        |                                     '77191',
        |                                     '91393',
        |                                     '49156',
        |                                     '50298',
        |                                     '87501',
        |                                     '18652',
        |                                     '53179',
        |                                     '18767',
        |                                     '63193',
        |                                     '23968',
        |                                     '65164',
        |                                     '68880',
        |                                     '21286',
        |                                     '72823',
        |                                     '58470',
        |                                     '67301',
        |                                     '13394',
        |                                     '31016',
        |                                     '70372',
        |                                     '67030',
        |                                     '40604',
        |                                     '24317',
        |                                     '45748',
        |                                     '39127',
        |                                     '26065',
        |                                     '77721',
        |                                     '31029',
        |                                     '31880',
        |                                     '60576',
        |                                     '24671',
        |                                     '45549',
        |                                     '13376',
        |                                     '50016',
        |                                     '33123',
        |                                     '19769',
        |                                     '22927',
        |                                     '97789',
        |                                     '46081',
        |                                     '72151',
        |                                     '15723',
        |                                     '46136',
        |                                     '51949',
        |                                     '68100',
        |                                     '96888',
        |                                     '64528',
        |                                     '14171',
        |                                     '79777',
        |                                     '28709',
        |                                     '11489',
        |                                     '25103',
        |                                     '32213',
        |                                     '78668',
        |                                     '22245',
        |                                     '15798',
        |                                     '27156',
        |                                     '37930',
        |                                     '62971',
        |                                     '21337',
        |                                     '51622',
        |                                     '67853',
        |                                     '10567',
        |                                     '38415',
        |                                     '15455',
        |                                     '58263',
        |                                     '42029',
        |                                     '60279',
        |                                     '37125',
        |                                     '56240',
        |                                     '88190',
        |                                     '50308',
        |                                     '26859',
        |                                     '64457',
        |                                     '89091',
        |                                     '82136',
        |                                     '62377',
        |                                     '36233',
        |                                     '63837',
        |                                     '58078',
        |                                     '17043',
        |                                     '30010',
        |                                     '60099',
        |                                     '28810',
        |                                     '98025',
        |                                     '29178',
        |                                     '87343',
        |                                     '73273',
        |                                     '30469',
        |                                     '64034',
        |                                     '39516',
        |                                     '86057',
        |                                     '21309',
        |                                     '90257',
        |                                     '67875',
        |                                     '40162',
        |                                     '11356',
        |                                     '73650',
        |                                     '61810',
        |                                     '72013',
        |                                     '30431',
        |                                     '22461',
        |                                     '19512',
        |                                     '13375',
        |                                     '55307',
        |                                     '30625',
        |                                     '83849',
        |                                     '68908',
        |                                     '26689',
        |                                     '96451',
        |                                     '38193',
        |                                     '46820',
        |                                     '88885',
        |                                     '84935',
        |                                     '69035',
        |                                     '83144',
        |                                     '47537',
        |                                     '56616',
        |                                     '94983',
        |                                     '48033',
        |                                     '69952',
        |                                     '25486',
        |                                     '61547',
        |                                     '27385',
        |                                     '61860',
        |                                     '58048',
        |                                     '56910',
        |                                     '16807',
        |                                     '17871',
        |                                     '35258',
        |                                     '31387',
        |                                     '35458',
        |                                     '35576') INTERSECT
        |        SELECT ca_zip
        |        FROM
        |          (SELECT SUBSTRING(ca_zip, 1, 5) ca_zip,
        |                  count(*) cnt
        |           FROM customer_address,
        |                customer
        |           WHERE ca_address_sk = c_current_addr_sk
        |             AND c_preferred_cust_flag='Y'
        |           GROUP BY ca_zip
        |           HAVING count(*) > 10)A1)A2) V1
        |WHERE ss_store_sk = s_store_sk
        |  AND ss_sold_date_sk = d_date_sk
        |  AND d_qoy = 2
        |  AND d_year = 1998
        |  AND (SUBSTRING(s_zip, 1, 2) = SUBSTRING(V1.ca_zip, 1, 2))
        |GROUP BY s_store_name
        |ORDER BY s_store_name
        |LIMIT 100""".stripMargin),

    // q9: five ss_quantity bucket stats via scalar subqueries from reason (verbatim)
    "tpcds_q9" -> wrap(
      """SELECT CASE
        |           WHEN
        |                  (SELECT count(*)
        |                   FROM store_sales
        |                   WHERE ss_quantity BETWEEN 1 AND 20) > 74129 THEN
        |                  (SELECT avg(ss_ext_discount_amt)
        |                   FROM store_sales
        |                   WHERE ss_quantity BETWEEN 1 AND 20)
        |           ELSE
        |                  (SELECT avg(ss_net_paid)
        |                   FROM store_sales
        |                   WHERE ss_quantity BETWEEN 1 AND 20)
        |       END bucket1,
        |       CASE
        |           WHEN
        |                  (SELECT count(*)
        |                   FROM store_sales
        |                   WHERE ss_quantity BETWEEN 21 AND 40) > 122840 THEN
        |                  (SELECT avg(ss_ext_discount_amt)
        |                   FROM store_sales
        |                   WHERE ss_quantity BETWEEN 21 AND 40)
        |           ELSE
        |                  (SELECT avg(ss_net_paid)
        |                   FROM store_sales
        |                   WHERE ss_quantity BETWEEN 21 AND 40)
        |       END bucket2,
        |       CASE
        |           WHEN
        |                  (SELECT count(*)
        |                   FROM store_sales
        |                   WHERE ss_quantity BETWEEN 41 AND 60) > 56580 THEN
        |                  (SELECT avg(ss_ext_discount_amt)
        |                   FROM store_sales
        |                   WHERE ss_quantity BETWEEN 41 AND 60)
        |           ELSE
        |                  (SELECT avg(ss_net_paid)
        |                   FROM store_sales
        |                   WHERE ss_quantity BETWEEN 41 AND 60)
        |       END bucket3,
        |       CASE
        |           WHEN
        |                  (SELECT count(*)
        |                   FROM store_sales
        |                   WHERE ss_quantity BETWEEN 61 AND 80) > 10097 THEN
        |                  (SELECT avg(ss_ext_discount_amt)
        |                   FROM store_sales
        |                   WHERE ss_quantity BETWEEN 61 AND 80)
        |           ELSE
        |                  (SELECT avg(ss_net_paid)
        |                   FROM store_sales
        |                   WHERE ss_quantity BETWEEN 61 AND 80)
        |       END bucket4,
        |       CASE
        |           WHEN
        |                  (SELECT count(*)
        |                   FROM store_sales
        |                   WHERE ss_quantity BETWEEN 81 AND 100) > 165306 THEN
        |                  (SELECT avg(ss_ext_discount_amt)
        |                   FROM store_sales
        |                   WHERE ss_quantity BETWEEN 81 AND 100)
        |           ELSE
        |                  (SELECT avg(ss_net_paid)
        |                   FROM store_sales
        |                   WHERE ss_quantity BETWEEN 81 AND 100)
        |       END bucket5
        |FROM reason
        |WHERE r_reason_sk = 1""".stripMargin),

    // q14: cross-channel items via INTERSECT + rollup vs avg-sales gate (part 1 of the two-part template; sums cast)
    "tpcds_q14" -> wrap(
      """WITH cross_items AS
        |  (SELECT i_item_sk ss_item_sk
        |   FROM item,
        |     (SELECT iss.i_brand_id brand_id,
        |             iss.i_class_id class_id,
        |             iss.i_category_id category_id
        |      FROM store_sales,
        |           item iss,
        |           date_dim d1
        |      WHERE ss_item_sk = iss.i_item_sk
        |        AND ss_sold_date_sk = d1.d_date_sk
        |        AND d1.d_year BETWEEN 1999 AND 1999 + 2 INTERSECT
        |        SELECT ics.i_brand_id,
        |               ics.i_class_id,
        |               ics.i_category_id
        |        FROM catalog_sales,
        |             item ics,
        |             date_dim d2 WHERE cs_item_sk = ics.i_item_sk
        |        AND cs_sold_date_sk = d2.d_date_sk
        |        AND d2.d_year BETWEEN 1999 AND 1999 + 2 INTERSECT
        |        SELECT iws.i_brand_id,
        |               iws.i_class_id,
        |               iws.i_category_id
        |        FROM web_sales,
        |             item iws,
        |             date_dim d3 WHERE ws_item_sk = iws.i_item_sk
        |        AND ws_sold_date_sk = d3.d_date_sk
        |        AND d3.d_year BETWEEN 1999 AND 1999 + 2) sq1
        |   WHERE i_brand_id = brand_id
        |     AND i_class_id = class_id
        |     AND i_category_id = category_id ),
        |     avg_sales AS
        |  (SELECT avg(quantity*list_price) average_sales
        |   FROM
        |     (SELECT ss_quantity quantity,
        |             ss_list_price list_price
        |      FROM store_sales,
        |           date_dim
        |      WHERE ss_sold_date_sk = d_date_sk
        |        AND d_year BETWEEN 1999 AND 1999 + 2
        |      UNION ALL SELECT cs_quantity quantity,
        |                       cs_list_price list_price
        |      FROM catalog_sales,
        |           date_dim
        |      WHERE cs_sold_date_sk = d_date_sk
        |        AND d_year BETWEEN 1999 AND 1999 + 2
        |      UNION ALL SELECT ws_quantity quantity,
        |                       ws_list_price list_price
        |      FROM web_sales,
        |           date_dim
        |      WHERE ws_sold_date_sk = d_date_sk
        |        AND d_year BETWEEN 1999 AND 1999 + 2) sq2)
        |SELECT channel,
        |       i_brand_id,
        |       i_class_id,
        |       i_category_id,
        |       CAST(sum(sales) AS BIGINT) AS sum_sales,
        |       CAST(sum(number_sales) AS BIGINT) AS sum_number_sales
        |FROM
        |  (SELECT 'store' channel,
        |                  i_brand_id,
        |                  i_class_id,
        |                  i_category_id,
        |                  sum(ss_quantity*ss_list_price) sales,
        |                  count(*) number_sales
        |   FROM store_sales,
        |        item,
        |        date_dim
        |   WHERE ss_item_sk IN
        |       (SELECT ss_item_sk
        |        FROM cross_items)
        |     AND ss_item_sk = i_item_sk
        |     AND ss_sold_date_sk = d_date_sk
        |     AND d_year = 1999+2
        |     AND d_moy = 11
        |   GROUP BY i_brand_id,
        |            i_class_id,
        |            i_category_id
        |   HAVING sum(ss_quantity*ss_list_price) >
        |     (SELECT average_sales
        |      FROM avg_sales)
        |   UNION ALL SELECT 'catalog' channel,
        |                              i_brand_id,
        |                              i_class_id,
        |                              i_category_id,
        |                              sum(cs_quantity*cs_list_price) sales,
        |                              count(*) number_sales
        |   FROM catalog_sales,
        |        item,
        |        date_dim
        |   WHERE cs_item_sk IN
        |       (SELECT ss_item_sk
        |        FROM cross_items)
        |     AND cs_item_sk = i_item_sk
        |     AND cs_sold_date_sk = d_date_sk
        |     AND d_year = 1999+2
        |     AND d_moy = 11
        |   GROUP BY i_brand_id,
        |            i_class_id,
        |            i_category_id
        |   HAVING sum(cs_quantity*cs_list_price) >
        |     (SELECT average_sales
        |      FROM avg_sales)
        |   UNION ALL SELECT 'web' channel,
        |                          i_brand_id,
        |                          i_class_id,
        |                          i_category_id,
        |                          sum(ws_quantity*ws_list_price) sales,
        |                          count(*) number_sales
        |   FROM web_sales,
        |        item,
        |        date_dim
        |   WHERE ws_item_sk IN
        |       (SELECT ss_item_sk
        |        FROM cross_items)
        |     AND ws_item_sk = i_item_sk
        |     AND ws_sold_date_sk = d_date_sk
        |     AND d_year = 1999+2
        |     AND d_moy = 11
        |   GROUP BY i_brand_id,
        |            i_class_id,
        |            i_category_id
        |   HAVING sum(ws_quantity*ws_list_price) >
        |     (SELECT average_sales
        |      FROM avg_sales)) y
        |GROUP BY ROLLUP (channel,
        |                 i_brand_id,
        |                 i_class_id,
        |                 i_category_id)
        |ORDER BY channel NULLS FIRST,
        |         i_brand_id NULLS FIRST,
        |         i_class_id NULLS FIRST,
        |         i_category_id NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q17: quarterly store/returns/catalog quantity stats (stddev_samp expanded to the exact-sum formula; see object doc)
    "tpcds_q17" -> wrap(
      """SELECT i_item_id,
        |       i_item_desc,
        |       s_state,
        |       count(ss_quantity) AS store_sales_quantitycount,
        |       avg(ss_quantity) AS store_sales_quantityave,
        |       sqrt((CAST(count(ss_quantity) AS DOUBLE) * CAST(sum(ss_quantity*ss_quantity) AS DOUBLE) - CAST(sum(ss_quantity) AS DOUBLE) * CAST(sum(ss_quantity) AS DOUBLE)) / NULLIF(CAST(count(ss_quantity) AS DOUBLE) * CAST(count(ss_quantity) - 1 AS DOUBLE), 0)) AS store_sales_quantitystdev,
        |       sqrt((CAST(count(ss_quantity) AS DOUBLE) * CAST(sum(ss_quantity*ss_quantity) AS DOUBLE) - CAST(sum(ss_quantity) AS DOUBLE) * CAST(sum(ss_quantity) AS DOUBLE)) / NULLIF(CAST(count(ss_quantity) AS DOUBLE) * CAST(count(ss_quantity) - 1 AS DOUBLE), 0))/avg(ss_quantity) AS store_sales_quantitycov,
        |       count(sr_return_quantity) AS store_returns_quantitycount,
        |       avg(sr_return_quantity) AS store_returns_quantityave,
        |       sqrt((CAST(count(sr_return_quantity) AS DOUBLE) * CAST(sum(sr_return_quantity*sr_return_quantity) AS DOUBLE) - CAST(sum(sr_return_quantity) AS DOUBLE) * CAST(sum(sr_return_quantity) AS DOUBLE)) / NULLIF(CAST(count(sr_return_quantity) AS DOUBLE) * CAST(count(sr_return_quantity) - 1 AS DOUBLE), 0)) AS store_returns_quantitystdev,
        |       sqrt((CAST(count(sr_return_quantity) AS DOUBLE) * CAST(sum(sr_return_quantity*sr_return_quantity) AS DOUBLE) - CAST(sum(sr_return_quantity) AS DOUBLE) * CAST(sum(sr_return_quantity) AS DOUBLE)) / NULLIF(CAST(count(sr_return_quantity) AS DOUBLE) * CAST(count(sr_return_quantity) - 1 AS DOUBLE), 0))/avg(sr_return_quantity) AS store_returns_quantitycov,
        |       count(cs_quantity) AS catalog_sales_quantitycount,
        |       avg(cs_quantity) AS catalog_sales_quantityave,
        |       sqrt((CAST(count(cs_quantity) AS DOUBLE) * CAST(sum(cs_quantity*cs_quantity) AS DOUBLE) - CAST(sum(cs_quantity) AS DOUBLE) * CAST(sum(cs_quantity) AS DOUBLE)) / NULLIF(CAST(count(cs_quantity) AS DOUBLE) * CAST(count(cs_quantity) - 1 AS DOUBLE), 0)) AS catalog_sales_quantitystdev,
        |       sqrt((CAST(count(cs_quantity) AS DOUBLE) * CAST(sum(cs_quantity*cs_quantity) AS DOUBLE) - CAST(sum(cs_quantity) AS DOUBLE) * CAST(sum(cs_quantity) AS DOUBLE)) / NULLIF(CAST(count(cs_quantity) AS DOUBLE) * CAST(count(cs_quantity) - 1 AS DOUBLE), 0))/avg(cs_quantity) AS catalog_sales_quantitycov
        |FROM store_sales,
        |     store_returns,
        |     catalog_sales,
        |     date_dim d1,
        |     date_dim d2,
        |     date_dim d3,
        |     store,
        |     item
        |WHERE d1.d_quarter_name = '2001Q1'
        |  AND d1.d_date_sk = ss_sold_date_sk
        |  AND i_item_sk = ss_item_sk
        |  AND s_store_sk = ss_store_sk
        |  AND ss_customer_sk = sr_customer_sk
        |  AND ss_item_sk = sr_item_sk
        |  AND ss_ticket_number = sr_ticket_number
        |  AND sr_returned_date_sk = d2.d_date_sk
        |  AND d2.d_quarter_name IN ('2001Q1',
        |                            '2001Q2',
        |                            '2001Q3')
        |  AND sr_customer_sk = cs_bill_customer_sk
        |  AND sr_item_sk = cs_item_sk
        |  AND cs_sold_date_sk = d3.d_date_sk
        |  AND d3.d_quarter_name IN ('2001Q1',
        |                            '2001Q2',
        |                            '2001Q3')
        |GROUP BY i_item_id,
        |         i_item_desc,
        |         s_state
        |ORDER BY i_item_id NULLS FIRST,
        |         i_item_desc NULLS FIRST,
        |         s_state NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q24: peach-color net paid by customer x store, zip-joined (HAVING 0.05*avg; sum cast)
    "tpcds_q24" -> wrap(
      """WITH ssales AS
        |  (SELECT c_last_name,
        |          c_first_name,
        |          s_store_name,
        |          ca_state,
        |          s_state,
        |          i_color,
        |          i_current_price,
        |          i_manager_id,
        |          i_units,
        |          i_size,
        |          sum(ss_net_paid) netpaid
        |   FROM store_sales,
        |        store_returns,
        |        store,
        |        item,
        |        customer,
        |        customer_address
        |   WHERE ss_ticket_number = sr_ticket_number
        |     AND ss_item_sk = sr_item_sk
        |     AND ss_customer_sk = c_customer_sk
        |     AND ss_item_sk = i_item_sk
        |     AND ss_store_sk = s_store_sk
        |     AND c_current_addr_sk = ca_address_sk
        |     AND c_birth_country <> upper(ca_country)
        |     AND s_zip = ca_zip
        |     AND s_market_id=8
        |   GROUP BY c_last_name,
        |            c_first_name,
        |            s_store_name,
        |            ca_state,
        |            s_state,
        |            i_color,
        |            i_current_price,
        |            i_manager_id,
        |            i_units,
        |            i_size)
        |SELECT c_last_name,
        |       c_first_name,
        |       s_store_name,
        |       CAST(sum(netpaid) AS BIGINT) paid
        |FROM ssales
        |WHERE i_color = 'peach'
        |GROUP BY c_last_name,
        |         c_first_name,
        |         s_store_name
        |HAVING sum(netpaid) >
        |  (SELECT 0.05*avg(netpaid)
        |   FROM ssales)
        |ORDER BY c_last_name,
        |         c_first_name,
        |         s_store_name""".stripMargin),

    // q28: six list-price bucket averages with distinct counts (verbatim)
    "tpcds_q28" -> wrap(
      """SELECT *
        |FROM
        |  (SELECT avg(ss_list_price) B1_LP,
        |          count(ss_list_price) B1_CNT,
        |          count(DISTINCT ss_list_price) B1_CNTD
        |   FROM store_sales
        |   WHERE ss_quantity BETWEEN 0 AND 5
        |     AND (ss_list_price BETWEEN 8 AND 8+10
        |          OR ss_coupon_amt BETWEEN 459 AND 459+1000
        |          OR ss_wholesale_cost BETWEEN 57 AND 57+20)) B1,
        |  (SELECT avg(ss_list_price) B2_LP,
        |          count(ss_list_price) B2_CNT,
        |          count(DISTINCT ss_list_price) B2_CNTD
        |   FROM store_sales
        |   WHERE ss_quantity BETWEEN 6 AND 10
        |     AND (ss_list_price BETWEEN 90 AND 90+10
        |          OR ss_coupon_amt BETWEEN 2323 AND 2323+1000
        |          OR ss_wholesale_cost BETWEEN 31 AND 31+20)) B2,
        |  (SELECT avg(ss_list_price) B3_LP,
        |          count(ss_list_price) B3_CNT,
        |          count(DISTINCT ss_list_price) B3_CNTD
        |   FROM store_sales
        |   WHERE ss_quantity BETWEEN 11 AND 15
        |     AND (ss_list_price BETWEEN 142 AND 142+10
        |          OR ss_coupon_amt BETWEEN 12214 AND 12214+1000
        |          OR ss_wholesale_cost BETWEEN 79 AND 79+20)) B3,
        |  (SELECT avg(ss_list_price) B4_LP,
        |          count(ss_list_price) B4_CNT,
        |          count(DISTINCT ss_list_price) B4_CNTD
        |   FROM store_sales
        |   WHERE ss_quantity BETWEEN 16 AND 20
        |     AND (ss_list_price BETWEEN 135 AND 135+10
        |          OR ss_coupon_amt BETWEEN 6071 AND 6071+1000
        |          OR ss_wholesale_cost BETWEEN 38 AND 38+20)) B4,
        |  (SELECT avg(ss_list_price) B5_LP,
        |          count(ss_list_price) B5_CNT,
        |          count(DISTINCT ss_list_price) B5_CNTD
        |   FROM store_sales
        |   WHERE ss_quantity BETWEEN 21 AND 25
        |     AND (ss_list_price BETWEEN 122 AND 122+10
        |          OR ss_coupon_amt BETWEEN 836 AND 836+1000
        |          OR ss_wholesale_cost BETWEEN 17 AND 17+20)) B5,
        |  (SELECT avg(ss_list_price) B6_LP,
        |          count(ss_list_price) B6_CNT,
        |          count(DISTINCT ss_list_price) B6_CNTD
        |   FROM store_sales
        |   WHERE ss_quantity BETWEEN 26 AND 30
        |     AND (ss_list_price BETWEEN 154 AND 154+10
        |          OR ss_coupon_amt BETWEEN 7326 AND 7326+1000
        |          OR ss_wholesale_cost BETWEEN 7 AND 7+20)) B6
        |LIMIT 100""".stripMargin),

    // q30: web-returns customers above 1.2x state average (CTE sum cast)
    "tpcds_q30" -> wrap(
      """WITH customer_total_return AS
        |  (SELECT wr_returning_customer_sk AS ctr_customer_sk,
        |          ca_state AS ctr_state,
        |          CAST(sum(wr_return_amt) AS BIGINT) AS ctr_total_return
        |   FROM web_returns,
        |        date_dim,
        |        customer_address
        |   WHERE wr_returned_date_sk = d_date_sk
        |     AND d_year = 2002
        |     AND wr_returning_addr_sk = ca_address_sk
        |   GROUP BY wr_returning_customer_sk,
        |            ca_state)
        |SELECT c_customer_id,
        |       c_salutation,
        |       c_first_name,
        |       c_last_name,
        |       c_preferred_cust_flag,
        |       c_birth_day,
        |       c_birth_month,
        |       c_birth_year,
        |       c_birth_country,
        |       c_login,
        |       c_email_address,
        |       c_last_review_date_sk,
        |       ctr_total_return
        |FROM customer_total_return ctr1,
        |     customer_address,
        |     customer
        |WHERE ctr1.ctr_total_return >
        |    (SELECT avg(ctr_total_return)*1.2
        |     FROM customer_total_return ctr2
        |     WHERE ctr1.ctr_state = ctr2.ctr_state)
        |  AND ca_address_sk = c_current_addr_sk
        |  AND ca_state = 'GA'
        |  AND ctr1.ctr_customer_sk = c_customer_sk
        |ORDER BY c_customer_id NULLS FIRST,
        |         c_salutation NULLS FIRST,
        |         c_first_name NULLS FIRST,
        |         c_last_name NULLS FIRST,
        |         c_preferred_cust_flag NULLS FIRST,
        |         c_birth_day NULLS FIRST,
        |         c_birth_month NULLS FIRST,
        |         c_birth_year NULLS FIRST,
        |         c_birth_country NULLS FIRST,
        |         c_login NULLS FIRST,
        |         c_email_address NULLS FIRST,
        |         c_last_review_date_sk NULLS FIRST,
        |         ctr_total_return NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q39: inventory monthly cov > 1, month-pair self-join (stddev expanded to the exact-sum formula; *1.000 idiom dropped)
    "tpcds_q39" -> wrap(
      """WITH inv AS
        |  (SELECT w_warehouse_name,
        |          w_warehouse_sk,
        |          i_item_sk,
        |          d_moy,
        |          stdev,
        |          mean,
        |          CASE mean
        |              WHEN 0 THEN NULL
        |              ELSE stdev/mean
        |          END cov
        |   FROM
        |     (SELECT w_warehouse_name,
        |             w_warehouse_sk,
        |             i_item_sk,
        |             d_moy,
        |             sqrt((CAST(count(inv_quantity_on_hand) AS DOUBLE) * CAST(sum(inv_quantity_on_hand*inv_quantity_on_hand) AS DOUBLE) - CAST(sum(inv_quantity_on_hand) AS DOUBLE) * CAST(sum(inv_quantity_on_hand) AS DOUBLE)) / NULLIF(CAST(count(inv_quantity_on_hand) AS DOUBLE) * CAST(count(inv_quantity_on_hand) - 1 AS DOUBLE), 0)) stdev,
        |             avg(inv_quantity_on_hand) mean
        |      FROM inventory,
        |           item,
        |           warehouse,
        |           date_dim
        |      WHERE inv_item_sk = i_item_sk
        |        AND inv_warehouse_sk = w_warehouse_sk
        |        AND inv_date_sk = d_date_sk
        |        AND d_year =2001
        |      GROUP BY w_warehouse_name,
        |               w_warehouse_sk,
        |               i_item_sk,
        |               d_moy) foo
        |   WHERE CASE mean
        |             WHEN 0 THEN 0
        |             ELSE stdev/mean
        |         END > 1)
        |SELECT inv1.w_warehouse_sk wsk1,
        |       inv1.i_item_sk isk1,
        |       inv1.d_moy dmoy1,
        |       inv1.mean mean1,
        |       inv1.cov cov1,
        |       inv2.w_warehouse_sk,
        |       inv2.i_item_sk,
        |       inv2.d_moy,
        |       inv2.mean,
        |       inv2.cov
        |FROM inv inv1,
        |     inv inv2
        |WHERE inv1.i_item_sk = inv2.i_item_sk
        |  AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
        |  AND inv1.d_moy=1
        |  AND inv2.d_moy=1+1
        |ORDER BY inv1.w_warehouse_sk NULLS FIRST,
        |         inv1.i_item_sk NULLS FIRST,
        |         inv1.d_moy NULLS FIRST,
        |         inv1.mean NULLS FIRST,
        |         inv1.cov NULLS FIRST,
        |         inv2.d_moy NULLS FIRST,
        |         inv2.mean NULLS FIRST,
        |         inv2.cov NULLS FIRST""".stripMargin),

    // q40: warehouse sales before/after 2000-03-11 price-band window (sums cast)
    "tpcds_q40" -> wrap(
      """SELECT w_state,
        |       i_item_id,
        |       CAST(sum(CASE
        |               WHEN (cast(d_date AS date) < CAST ('2000-03-11' AS date)) THEN cs_sales_price - coalesce(cr_refunded_cash,0)
        |               ELSE 0
        |           END) AS BIGINT) AS sales_before,
        |       CAST(sum(CASE
        |               WHEN (cast(d_date AS date) >= CAST ('2000-03-11' AS date)) THEN cs_sales_price - coalesce(cr_refunded_cash,0)
        |               ELSE 0
        |           END) AS BIGINT) AS sales_after
        |FROM catalog_sales
        |LEFT OUTER JOIN catalog_returns ON (cs_order_number = cr_order_number
        |                                    AND cs_item_sk = cr_item_sk) ,warehouse,
        |                                                                  item,
        |                                                                  date_dim
        |WHERE i_current_price BETWEEN 0.99 AND 1.49
        |  AND i_item_sk = cs_item_sk
        |  AND cs_warehouse_sk = w_warehouse_sk
        |  AND cs_sold_date_sk = d_date_sk
        |  AND d_date BETWEEN CAST ('2000-02-10' AS date) AND CAST ('2000-04-10' AS date)
        |GROUP BY w_state,
        |         i_item_id
        |ORDER BY w_state,
        |         i_item_id
        |LIMIT 100""".stripMargin),

    // q41: manufact 738..778 attribute-combination probe (verbatim)
    "tpcds_q41" -> wrap(
      """SELECT distinct(i_product_name)
        |FROM item i1
        |WHERE i_manufact_id BETWEEN 738 AND 738+40
        |  AND
        |    (SELECT count(*) AS item_cnt
        |     FROM item
        |     WHERE (i_manufact = i1.i_manufact
        |            AND ((i_category = 'Women'
        |                  AND (i_color = 'powder'
        |                       OR i_color = 'khaki')
        |                  AND (i_units = 'Ounce'
        |                       OR i_units = 'Oz')
        |                  AND (i_size = 'medium'
        |                       OR i_size = 'extra large'))
        |                 OR (i_category = 'Women'
        |                     AND (i_color = 'brown'
        |                          OR i_color = 'honeydew')
        |                     AND (i_units = 'Bunch'
        |                          OR i_units = 'Ton')
        |                     AND (i_size = 'N/A'
        |                          OR i_size = 'small'))
        |                 OR (i_category = 'Men'
        |                     AND (i_color = 'floral'
        |                          OR i_color = 'deep')
        |                     AND (i_units = 'N/A'
        |                          OR i_units = 'Dozen')
        |                     AND (i_size = 'petite'
        |                          OR i_size = 'petite'))
        |                 OR (i_category = 'Men'
        |                     AND (i_color = 'light'
        |                          OR i_color = 'cornflower')
        |                     AND (i_units = 'Box'
        |                          OR i_units = 'Pound')
        |                     AND (i_size = 'medium'
        |                          OR i_size = 'extra large'))))
        |       OR (i_manufact = i1.i_manufact
        |           AND ((i_category = 'Women'
        |                 AND (i_color = 'midnight'
        |                      OR i_color = 'snow')
        |                 AND (i_units = 'Pallet'
        |                      OR i_units = 'Gross')
        |                 AND (i_size = 'medium'
        |                      OR i_size = 'extra large'))
        |                OR (i_category = 'Women'
        |                    AND (i_color = 'cyan'
        |                         OR i_color = 'papaya')
        |                    AND (i_units = 'Cup'
        |                         OR i_units = 'Dram')
        |                    AND (i_size = 'N/A'
        |                         OR i_size = 'small'))
        |                OR (i_category = 'Men'
        |                    AND (i_color = 'orange'
        |                         OR i_color = 'frosted')
        |                    AND (i_units = 'Each'
        |                         OR i_units = 'Tbl')
        |                    AND (i_size = 'petite'
        |                         OR i_size = 'petite'))
        |                OR (i_category = 'Men'
        |                    AND (i_color = 'forest'
        |                         OR i_color = 'ghost')
        |                    AND (i_units = 'Lb'
        |                         OR i_units = 'Bundle')
        |                    AND (i_size = 'medium'
        |                         OR i_size = 'extra large'))))) > 0
        |ORDER BY i_product_name
        |LIMIT 100""".stripMargin),

    // q44: best/worst item by store-4 avg net profit vs NULL-addr benchmark (ORDER extended for totality)
    "tpcds_q44" -> wrap(
      """SELECT asceding.rnk,
        |       i1.i_product_name best_performing,
        |       i2.i_product_name worst_performing
        |FROM
        |  (SELECT *
        |   FROM
        |     (SELECT item_sk,
        |             rank() OVER (
        |                          ORDER BY rank_col ASC) rnk
        |      FROM
        |        (SELECT ss_item_sk item_sk,
        |                avg(ss_net_profit) rank_col
        |         FROM store_sales ss1
        |         WHERE ss_store_sk = 4
        |         GROUP BY ss_item_sk
        |         HAVING avg(ss_net_profit) > 0.9*
        |           (SELECT avg(ss_net_profit) rank_col
        |            FROM store_sales
        |            WHERE ss_store_sk = 4
        |              AND ss_addr_sk IS NULL
        |            GROUP BY ss_store_sk))V1)V11
        |   WHERE rnk < 11) asceding,
        |  (SELECT *
        |   FROM
        |     (SELECT item_sk,
        |             rank() OVER (
        |                          ORDER BY rank_col DESC) rnk
        |      FROM
        |        (SELECT ss_item_sk item_sk,
        |                avg(ss_net_profit) rank_col
        |         FROM store_sales ss1
        |         WHERE ss_store_sk = 4
        |         GROUP BY ss_item_sk
        |         HAVING avg(ss_net_profit) > 0.9*
        |           (SELECT avg(ss_net_profit) rank_col
        |            FROM store_sales
        |            WHERE ss_store_sk = 4
        |              AND ss_addr_sk IS NULL
        |            GROUP BY ss_store_sk))V2)V21
        |   WHERE rnk < 11) descending,
        |     item i1,
        |     item i2
        |WHERE asceding.rnk = descending.rnk
        |  AND i1.i_item_sk=asceding.item_sk
        |  AND i2.i_item_sk=descending.item_sk
        |ORDER BY asceding.rnk,
        |         best_performing,
        |         worst_performing
        |LIMIT 100""".stripMargin),

    // q49: worst return ratios per channel, double ranks (dec(15,4) casts -> DOUBLE)
    "tpcds_q49" -> wrap(
      """SELECT channel,
        |       item,
        |       return_ratio,
        |       return_rank,
        |       currency_rank
        |FROM
        |  (SELECT 'web' AS channel,
        |          web.item,
        |          web.return_ratio,
        |          web.return_rank,
        |          web.currency_rank
        |   FROM
        |     (SELECT item,
        |             return_ratio,
        |             currency_ratio,
        |             rank() OVER (
        |                          ORDER BY return_ratio) AS return_rank,
        |                         rank() OVER (
        |                                      ORDER BY currency_ratio) AS currency_rank
        |      FROM
        |        (SELECT ws.ws_item_sk AS item,
        |                (cast(sum(coalesce(wr.wr_return_quantity,0)) AS DOUBLE)/ cast(sum(coalesce(ws.ws_quantity,0)) AS DOUBLE)) AS return_ratio,
        |                (cast(sum(coalesce(wr.wr_return_amt,0)) AS DOUBLE)/ cast(sum(coalesce(ws.ws_net_paid,0)) AS DOUBLE)) AS currency_ratio
        |         FROM web_sales ws
        |         LEFT OUTER JOIN web_returns wr ON (ws.ws_order_number = wr.wr_order_number
        |                                            AND ws.ws_item_sk = wr.wr_item_sk) ,date_dim
        |         WHERE wr.wr_return_amt > 10000
        |           AND ws.ws_net_profit > 1
        |           AND ws.ws_net_paid > 0
        |           AND ws.ws_quantity > 0
        |           AND ws_sold_date_sk = d_date_sk
        |           AND d_year = 2001
        |           AND d_moy = 12
        |         GROUP BY ws.ws_item_sk) in_web) web
        |   WHERE (web.return_rank <= 10
        |          OR web.currency_rank <= 10)
        |   UNION SELECT 'catalog' AS channel,
        |                catalog.item,
        |                catalog.return_ratio,
        |                catalog.return_rank,
        |                catalog.currency_rank
        |   FROM
        |     (SELECT item,
        |             return_ratio,
        |             currency_ratio,
        |             rank() OVER (
        |                          ORDER BY return_ratio) AS return_rank,
        |                         rank() OVER (
        |                                      ORDER BY currency_ratio) AS currency_rank
        |      FROM
        |        (SELECT cs.cs_item_sk AS item,
        |                (cast(sum(coalesce(cr.cr_return_quantity,0)) AS DOUBLE)/ cast(sum(coalesce(cs.cs_quantity,0)) AS DOUBLE)) AS return_ratio,
        |                (cast(sum(coalesce(cr.cr_return_amount,0)) AS DOUBLE)/ cast(sum(coalesce(cs.cs_net_paid,0)) AS DOUBLE)) AS currency_ratio
        |         FROM catalog_sales cs
        |         LEFT OUTER JOIN catalog_returns cr ON (cs.cs_order_number = cr.cr_order_number
        |                                                AND cs.cs_item_sk = cr.cr_item_sk) ,date_dim
        |         WHERE cr.cr_return_amount > 10000
        |           AND cs.cs_net_profit > 1
        |           AND cs.cs_net_paid > 0
        |           AND cs.cs_quantity > 0
        |           AND cs_sold_date_sk = d_date_sk
        |           AND d_year = 2001
        |           AND d_moy = 12
        |         GROUP BY cs.cs_item_sk) in_cat) CATALOG
        |   WHERE (catalog.return_rank <= 10
        |          OR catalog.currency_rank <=10)
        |   UNION SELECT 'store' AS channel,
        |                store.item,
        |                store.return_ratio,
        |                store.return_rank,
        |                store.currency_rank
        |   FROM
        |     (SELECT item,
        |             return_ratio,
        |             currency_ratio,
        |             rank() OVER (
        |                          ORDER BY return_ratio) AS return_rank,
        |                         rank() OVER (
        |                                      ORDER BY currency_ratio) AS currency_rank
        |      FROM
        |        (SELECT sts.ss_item_sk AS item,
        |                (cast(sum(coalesce(sr.sr_return_quantity,0)) AS DOUBLE)/cast(sum(coalesce(sts.ss_quantity,0)) AS DOUBLE)) AS return_ratio,
        |                (cast(sum(coalesce(sr.sr_return_amt,0)) AS DOUBLE)/cast(sum(coalesce(sts.ss_net_paid,0)) AS DOUBLE)) AS currency_ratio
        |         FROM store_sales sts
        |         LEFT OUTER JOIN store_returns sr ON (sts.ss_ticket_number = sr.sr_ticket_number
        |                                              AND sts.ss_item_sk = sr.sr_item_sk) ,date_dim
        |         WHERE sr.sr_return_amt > 10000
        |           AND sts.ss_net_profit > 1
        |           AND sts.ss_net_paid > 0
        |           AND sts.ss_quantity > 0
        |           AND ss_sold_date_sk = d_date_sk
        |           AND d_year = 2001
        |           AND d_moy = 12
        |         GROUP BY sts.ss_item_sk) in_store) store
        |   WHERE (store.return_rank <= 10
        |          OR store.currency_rank <= 10) ) sq1
        |ORDER BY 1 NULLS FIRST,
        |         4 NULLS FIRST,
        |         5 NULLS FIRST,
        |         2 NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q51: web-vs-store cumulative sales crossover, windowed full outer (window sums cast)
    "tpcds_q51" -> wrap(
      """WITH web_v1 AS
        |  (SELECT ws_item_sk item_sk,
        |          d_date,
        |          CAST(sum(sum(ws_sales_price)) OVER (PARTITION BY ws_item_sk
        |                                         ORDER BY d_date ROWS BETWEEN unbounded preceding AND CURRENT ROW) AS BIGINT) cume_sales
        |   FROM web_sales,
        |        date_dim
        |   WHERE ws_sold_date_sk=d_date_sk
        |     AND d_month_seq BETWEEN 1200 AND 1200+11
        |     AND ws_item_sk IS NOT NULL
        |   GROUP BY ws_item_sk,
        |            d_date),
        |     store_v1 AS
        |  (SELECT ss_item_sk item_sk,
        |          d_date,
        |          CAST(sum(sum(ss_sales_price)) OVER (PARTITION BY ss_item_sk
        |                                         ORDER BY d_date ROWS BETWEEN unbounded preceding AND CURRENT ROW) AS BIGINT) cume_sales
        |   FROM store_sales,
        |        date_dim
        |   WHERE ss_sold_date_sk=d_date_sk
        |     AND d_month_seq BETWEEN 1200 AND 1200+11
        |     AND ss_item_sk IS NOT NULL
        |   GROUP BY ss_item_sk,
        |            d_date)
        |SELECT *
        |FROM
        |  (SELECT item_sk,
        |          d_date,
        |          web_sales,
        |          store_sales,
        |          max(web_sales) OVER (PARTITION BY item_sk
        |                               ORDER BY d_date ROWS BETWEEN unbounded preceding AND CURRENT ROW) web_cumulative,
        |                              max(store_sales) OVER (PARTITION BY item_sk
        |                                                     ORDER BY d_date ROWS BETWEEN unbounded preceding AND CURRENT ROW) store_cumulative
        |   FROM
        |     (SELECT CASE
        |                 WHEN web.item_sk IS NOT NULL THEN web.item_sk
        |                 ELSE store.item_sk
        |             END item_sk,
        |             CASE
        |                 WHEN web.d_date IS NOT NULL THEN web.d_date
        |                 ELSE store.d_date
        |             END d_date,
        |             web.cume_sales web_sales,
        |             store.cume_sales store_sales
        |      FROM web_v1 web
        |      FULL OUTER JOIN store_v1 store ON (web.item_sk = store.item_sk
        |                                         AND web.d_date = store.d_date))x)y
        |WHERE web_cumulative > store_cumulative
        |ORDER BY item_sk NULLS FIRST,
        |         d_date NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q53: manufact quarterly sales vs average (sum cast)
    "tpcds_q53" -> wrap(
      """SELECT *
        |FROM
        |  (SELECT i_manufact_id,
        |          CAST(sum(ss_sales_price) AS BIGINT) sum_sales,
        |          avg(sum(ss_sales_price)) OVER (PARTITION BY i_manufact_id) avg_quarterly_sales
        |   FROM item,
        |        store_sales,
        |        date_dim,
        |        store
        |   WHERE ss_item_sk = i_item_sk
        |     AND ss_sold_date_sk = d_date_sk
        |     AND ss_store_sk = s_store_sk
        |     AND d_month_seq IN (1200,
        |                         1200+1,
        |                         1200+2,
        |                         1200+3,
        |                         1200+4,
        |                         1200+5,
        |                         1200+6,
        |                         1200+7,
        |                         1200+8,
        |                         1200+9,
        |                         1200+10,
        |                         1200+11)
        |     AND ((i_category IN ('Books',
        |                          'Children',
        |                          'Electronics')
        |           AND i_class IN ('personal',
        |                           'portable',
        |                           'reference',
        |                           'self-help')
        |           AND i_brand IN ('scholaramalgamalg #14',
        |                           'scholaramalgamalg #7',
        |                           'exportiunivamalg #9',
        |                           'scholaramalgamalg #9')) or(i_category IN ('Women','Music','Men')
        |                                                       AND i_class IN ('accessories','classical','fragrances','pants')
        |                                                       AND i_brand IN ('amalgimporto #1','edu packscholar #1','exportiimporto #1', 'importoamalg #1')))
        |   GROUP BY i_manufact_id,
        |            d_qoy) tmp1
        |WHERE CASE
        |          WHEN avg_quarterly_sales > 0 THEN ABS (sum_sales - avg_quarterly_sales)/ avg_quarterly_sales
        |          ELSE NULL
        |      END > 0.1
        |ORDER BY avg_quarterly_sales,
        |         sum_sales,
        |         i_manufact_id
        |LIMIT 100""".stripMargin),

    // q57: call-center monthly deviation with lag/lead self-joins (v1 sum cast)
    "tpcds_q57" -> wrap(
      """WITH v1 AS
        |  (SELECT i_category,
        |          i_brand,
        |          cc_name,
        |          d_year,
        |          d_moy,
        |          CAST(sum(cs_sales_price) AS BIGINT) sum_sales,
        |          avg(sum(cs_sales_price)) OVER (PARTITION BY i_category,
        |                                                      i_brand,
        |                                                      cc_name,
        |                                                      d_year) avg_monthly_sales,
        |                                        rank() OVER (PARTITION BY i_category,
        |                                                                  i_brand,
        |                                                                  cc_name
        |                                                     ORDER BY d_year,
        |                                                              d_moy) rn
        |   FROM item,
        |        catalog_sales,
        |        date_dim,
        |        call_center
        |   WHERE cs_item_sk = i_item_sk
        |     AND cs_sold_date_sk = d_date_sk
        |     AND cc_call_center_sk= cs_call_center_sk
        |     AND (d_year = 1999
        |          OR (d_year = 1999-1
        |              AND d_moy =12)
        |          OR (d_year = 1999+1
        |              AND d_moy =1))
        |   GROUP BY i_category,
        |            i_brand,
        |            cc_name,
        |            d_year,
        |            d_moy),
        |     v2 AS
        |  (SELECT v1.i_category,
        |          v1.i_brand,
        |          v1.cc_name,
        |          v1.d_year,
        |          v1.d_moy,
        |          v1.avg_monthly_sales,
        |          v1.sum_sales,
        |          v1_lag.sum_sales psum,
        |          v1_lead.sum_sales nsum
        |   FROM v1,
        |        v1 v1_lag,
        |        v1 v1_lead
        |   WHERE v1.i_category = v1_lag.i_category
        |     AND v1.i_category = v1_lead.i_category
        |     AND v1.i_brand = v1_lag.i_brand
        |     AND v1.i_brand = v1_lead.i_brand
        |     AND v1. cc_name = v1_lag. cc_name
        |     AND v1. cc_name = v1_lead. cc_name
        |     AND v1.rn = v1_lag.rn + 1
        |     AND v1.rn = v1_lead.rn - 1)
        |SELECT *
        |FROM v2
        |WHERE d_year = 1999
        |  AND avg_monthly_sales > 0
        |  AND CASE
        |          WHEN avg_monthly_sales > 0 THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
        |          ELSE NULL
        |      END > 0.1
        |ORDER BY sum_sales - avg_monthly_sales NULLS FIRST, 1, 2, 3, 4, 5, 6, 7, 8, 9
        |LIMIT 100""".stripMargin),

    // q58: cross-channel item revenue parity for one week (CTE sums cast; balanced-week slice in derivation)
    "tpcds_q58" -> wrap(
      """WITH ss_items AS
        |  (SELECT i_item_id item_id,
        |          CAST(sum(ss_ext_sales_price) AS BIGINT) ss_item_rev
        |   FROM store_sales,
        |        item,
        |        date_dim
        |   WHERE ss_item_sk = i_item_sk
        |     AND d_date IN
        |       (SELECT d_date
        |        FROM date_dim
        |        WHERE d_week_seq =
        |            (SELECT d_week_seq
        |             FROM date_dim
        |             WHERE d_date = '2000-01-03'))
        |     AND ss_sold_date_sk = d_date_sk
        |   GROUP BY i_item_id),
        |     cs_items AS
        |  (SELECT i_item_id item_id,
        |          CAST(sum(cs_ext_sales_price) AS BIGINT) cs_item_rev
        |   FROM catalog_sales,
        |        item,
        |        date_dim
        |   WHERE cs_item_sk = i_item_sk
        |     AND d_date IN
        |       (SELECT d_date
        |        FROM date_dim
        |        WHERE d_week_seq =
        |            (SELECT d_week_seq
        |             FROM date_dim
        |             WHERE d_date = '2000-01-03'))
        |     AND cs_sold_date_sk = d_date_sk
        |   GROUP BY i_item_id),
        |     ws_items AS
        |  (SELECT i_item_id item_id,
        |          CAST(sum(ws_ext_sales_price) AS BIGINT) ws_item_rev
        |   FROM web_sales,
        |        item,
        |        date_dim
        |   WHERE ws_item_sk = i_item_sk
        |     AND d_date IN
        |       (SELECT d_date
        |        FROM date_dim
        |        WHERE d_week_seq =
        |            (SELECT d_week_seq
        |             FROM date_dim
        |             WHERE d_date = '2000-01-03'))
        |     AND ws_sold_date_sk = d_date_sk
        |   GROUP BY i_item_id)
        |SELECT ss_items.item_id,
        |       ss_item_rev,
        |       ss_item_rev/((ss_item_rev+cs_item_rev+ws_item_rev)/3) * 100 ss_dev,
        |       cs_item_rev,
        |       cs_item_rev/((ss_item_rev+cs_item_rev+ws_item_rev)/3) * 100 cs_dev,
        |       ws_item_rev,
        |       ws_item_rev/((ss_item_rev+cs_item_rev+ws_item_rev)/3) * 100 ws_dev,
        |       (ss_item_rev+cs_item_rev+ws_item_rev)/3 average
        |FROM ss_items,
        |     cs_items,
        |     ws_items
        |WHERE ss_items.item_id=cs_items.item_id
        |  AND ss_items.item_id=ws_items.item_id
        |  AND ss_item_rev BETWEEN 0.9 * cs_item_rev AND 1.1 * cs_item_rev
        |  AND ss_item_rev BETWEEN 0.9 * ws_item_rev AND 1.1 * ws_item_rev
        |  AND cs_item_rev BETWEEN 0.9 * ss_item_rev AND 1.1 * ss_item_rev
        |  AND cs_item_rev BETWEEN 0.9 * ws_item_rev AND 1.1 * ws_item_rev
        |  AND ws_item_rev BETWEEN 0.9 * ss_item_rev AND 1.1 * ss_item_rev
        |  AND ws_item_rev BETWEEN 0.9 * cs_item_rev AND 1.1 * cs_item_rev
        |ORDER BY ss_items.item_id NULLS FIRST,
        |         ss_item_rev NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q62: web ship-latency day buckets by warehouse/mode/site (space aliases -> parquet-safe, sums cast)
    "tpcds_q62" -> wrap(
      """SELECT w_substr,
        |       sm_type,
        |       web_name,
        |       CAST(sum(CASE
        |               WHEN (ws_ship_date_sk - ws_sold_date_sk <= 30) THEN 1
        |               ELSE 0
        |           END) AS BIGINT) AS days_30,
        |       CAST(sum(CASE
        |               WHEN (ws_ship_date_sk - ws_sold_date_sk > 30)
        |                    AND (ws_ship_date_sk - ws_sold_date_sk <= 60) THEN 1
        |               ELSE 0
        |           END) AS BIGINT) AS days_31_60,
        |       CAST(sum(CASE
        |               WHEN (ws_ship_date_sk - ws_sold_date_sk > 60)
        |                    AND (ws_ship_date_sk - ws_sold_date_sk <= 90) THEN 1
        |               ELSE 0
        |           END) AS BIGINT) AS days_61_90,
        |       CAST(sum(CASE
        |               WHEN (ws_ship_date_sk - ws_sold_date_sk > 90)
        |                    AND (ws_ship_date_sk - ws_sold_date_sk <= 120) THEN 1
        |               ELSE 0
        |           END) AS BIGINT) AS days_91_120,
        |       CAST(sum(CASE
        |               WHEN (ws_ship_date_sk - ws_sold_date_sk > 120) THEN 1
        |               ELSE 0
        |           END) AS BIGINT) AS days_over_120
        |FROM web_sales,
        |  (SELECT SUBSTRING(w_warehouse_name,1,20) w_substr,
        |          *
        |   FROM warehouse) sq1,
        |     ship_mode,
        |     web_site,
        |     date_dim
        |WHERE d_month_seq BETWEEN 1200 AND 1200 + 11
        |  AND ws_ship_date_sk = d_date_sk
        |  AND ws_warehouse_sk = w_warehouse_sk
        |  AND ws_ship_mode_sk = sm_ship_mode_sk
        |  AND ws_web_site_sk = web_site_sk
        |GROUP BY w_substr,
        |         sm_type,
        |         web_name
        |ORDER BY 1 NULLS FIRST,
        |         2 NULLS FIRST,
        |         3 NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q63: manager monthly sales vs average (sum cast)
    "tpcds_q63" -> wrap(
      """SELECT *
        |FROM
        |  (SELECT i_manager_id,
        |          CAST(sum(ss_sales_price) AS BIGINT) sum_sales,
        |          avg(sum(ss_sales_price)) OVER (PARTITION BY i_manager_id) avg_monthly_sales
        |   FROM item,
        |        store_sales,
        |        date_dim,
        |        store
        |   WHERE ss_item_sk = i_item_sk
        |     AND ss_sold_date_sk = d_date_sk
        |     AND ss_store_sk = s_store_sk
        |     AND d_month_seq IN (1200,
        |                         1200+1,
        |                         1200+2,
        |                         1200+3,
        |                         1200+4,
        |                         1200+5,
        |                         1200+6,
        |                         1200+7,
        |                         1200+8,
        |                         1200+9,
        |                         1200+10,
        |                         1200+11)
        |     AND ((i_category IN ('Books',
        |                          'Children',
        |                          'Electronics')
        |           AND i_class IN ('personal',
        |                           'portable',
        |                           'reference',
        |                           'self-help')
        |           AND i_brand IN ('scholaramalgamalg #14',
        |                           'scholaramalgamalg #7',
        |                           'exportiunivamalg #9',
        |                           'scholaramalgamalg #9')) or(i_category IN ('Women','Music','Men')
        |                                                       AND i_class IN ('accessories','classical','fragrances','pants')
        |                                                       AND i_brand IN ('amalgimporto #1','edu packscholar #1','exportiimporto #1', 'importoamalg #1')))
        |   GROUP BY i_manager_id,
        |            d_moy) tmp1
        |WHERE CASE
        |          WHEN avg_monthly_sales > 0 THEN ABS (sum_sales - avg_monthly_sales) / avg_monthly_sales
        |          ELSE NULL
        |      END > 0.1
        |ORDER BY i_manager_id,
        |         avg_monthly_sales,
        |         sum_sales
        |LIMIT 100""".stripMargin),

    // q66: warehouse 12-month sales/net grids across web+catalog (integer sums cast; per-sqft stay DOUBLE)
    "tpcds_q66" -> wrap(
      """select
        |         w_warehouse_name
        |  ,w_warehouse_sq_ft
        |  ,w_city
        |  ,w_county
        |  ,w_state
        |  ,w_country
        |        ,ship_carriers
        |        ,year_
        |  ,CAST(sum(jan_sales) AS BIGINT) as jan_sales
        |  ,CAST(sum(feb_sales) AS BIGINT) as feb_sales
        |  ,CAST(sum(mar_sales) AS BIGINT) as mar_sales
        |  ,CAST(sum(apr_sales) AS BIGINT) as apr_sales
        |  ,CAST(sum(may_sales) AS BIGINT) as may_sales
        |  ,CAST(sum(jun_sales) AS BIGINT) as jun_sales
        |  ,CAST(sum(jul_sales) AS BIGINT) as jul_sales
        |  ,CAST(sum(aug_sales) AS BIGINT) as aug_sales
        |  ,CAST(sum(sep_sales) AS BIGINT) as sep_sales
        |  ,CAST(sum(oct_sales) AS BIGINT) as oct_sales
        |  ,CAST(sum(nov_sales) AS BIGINT) as nov_sales
        |  ,CAST(sum(dec_sales) AS BIGINT) as dec_sales
        |  ,sum(jan_sales/w_warehouse_sq_ft) as jan_sales_per_sq_foot
        |  ,sum(feb_sales/w_warehouse_sq_ft) as feb_sales_per_sq_foot
        |  ,sum(mar_sales/w_warehouse_sq_ft) as mar_sales_per_sq_foot
        |  ,sum(apr_sales/w_warehouse_sq_ft) as apr_sales_per_sq_foot
        |  ,sum(may_sales/w_warehouse_sq_ft) as may_sales_per_sq_foot
        |  ,sum(jun_sales/w_warehouse_sq_ft) as jun_sales_per_sq_foot
        |  ,sum(jul_sales/w_warehouse_sq_ft) as jul_sales_per_sq_foot
        |  ,sum(aug_sales/w_warehouse_sq_ft) as aug_sales_per_sq_foot
        |  ,sum(sep_sales/w_warehouse_sq_ft) as sep_sales_per_sq_foot
        |  ,sum(oct_sales/w_warehouse_sq_ft) as oct_sales_per_sq_foot
        |  ,sum(nov_sales/w_warehouse_sq_ft) as nov_sales_per_sq_foot
        |  ,sum(dec_sales/w_warehouse_sq_ft) as dec_sales_per_sq_foot
        |  ,CAST(sum(jan_net) AS BIGINT) as jan_net
        |  ,CAST(sum(feb_net) AS BIGINT) as feb_net
        |  ,CAST(sum(mar_net) AS BIGINT) as mar_net
        |  ,CAST(sum(apr_net) AS BIGINT) as apr_net
        |  ,CAST(sum(may_net) AS BIGINT) as may_net
        |  ,CAST(sum(jun_net) AS BIGINT) as jun_net
        |  ,CAST(sum(jul_net) AS BIGINT) as jul_net
        |  ,CAST(sum(aug_net) AS BIGINT) as aug_net
        |  ,CAST(sum(sep_net) AS BIGINT) as sep_net
        |  ,CAST(sum(oct_net) AS BIGINT) as oct_net
        |  ,CAST(sum(nov_net) AS BIGINT) as nov_net
        |  ,CAST(sum(dec_net) AS BIGINT) as dec_net
        | from (
        |     select
        |  w_warehouse_name
        |  ,w_warehouse_sq_ft
        |  ,w_city
        |  ,w_county
        |  ,w_state
        |  ,w_country
        |  ,'DHL,BARIAN' as ship_carriers
        |       ,d_year as year_
        |  ,CAST(sum(case when d_moy = 1
        |    then ws_ext_sales_price* ws_quantity else 0 end) AS BIGINT) as jan_sales
        |  ,CAST(sum(case when d_moy = 2
        |    then ws_ext_sales_price* ws_quantity else 0 end) AS BIGINT) as feb_sales
        |  ,CAST(sum(case when d_moy = 3
        |    then ws_ext_sales_price* ws_quantity else 0 end) AS BIGINT) as mar_sales
        |  ,CAST(sum(case when d_moy = 4
        |    then ws_ext_sales_price* ws_quantity else 0 end) AS BIGINT) as apr_sales
        |  ,CAST(sum(case when d_moy = 5
        |    then ws_ext_sales_price* ws_quantity else 0 end) AS BIGINT) as may_sales
        |  ,CAST(sum(case when d_moy = 6
        |    then ws_ext_sales_price* ws_quantity else 0 end) AS BIGINT) as jun_sales
        |  ,CAST(sum(case when d_moy = 7
        |    then ws_ext_sales_price* ws_quantity else 0 end) AS BIGINT) as jul_sales
        |  ,CAST(sum(case when d_moy = 8
        |    then ws_ext_sales_price* ws_quantity else 0 end) AS BIGINT) as aug_sales
        |  ,CAST(sum(case when d_moy = 9
        |    then ws_ext_sales_price* ws_quantity else 0 end) AS BIGINT) as sep_sales
        |  ,CAST(sum(case when d_moy = 10
        |    then ws_ext_sales_price* ws_quantity else 0 end) AS BIGINT) as oct_sales
        |  ,CAST(sum(case when d_moy = 11
        |    then ws_ext_sales_price* ws_quantity else 0 end) AS BIGINT) as nov_sales
        |  ,CAST(sum(case when d_moy = 12
        |    then ws_ext_sales_price* ws_quantity else 0 end) AS BIGINT) as dec_sales
        |  ,CAST(sum(case when d_moy = 1
        |    then ws_net_paid * ws_quantity else 0 end) AS BIGINT) as jan_net
        |  ,CAST(sum(case when d_moy = 2
        |    then ws_net_paid * ws_quantity else 0 end) AS BIGINT) as feb_net
        |  ,CAST(sum(case when d_moy = 3
        |    then ws_net_paid * ws_quantity else 0 end) AS BIGINT) as mar_net
        |  ,CAST(sum(case when d_moy = 4
        |    then ws_net_paid * ws_quantity else 0 end) AS BIGINT) as apr_net
        |  ,CAST(sum(case when d_moy = 5
        |    then ws_net_paid * ws_quantity else 0 end) AS BIGINT) as may_net
        |  ,CAST(sum(case when d_moy = 6
        |    then ws_net_paid * ws_quantity else 0 end) AS BIGINT) as jun_net
        |  ,CAST(sum(case when d_moy = 7
        |    then ws_net_paid * ws_quantity else 0 end) AS BIGINT) as jul_net
        |  ,CAST(sum(case when d_moy = 8
        |    then ws_net_paid * ws_quantity else 0 end) AS BIGINT) as aug_net
        |  ,CAST(sum(case when d_moy = 9
        |    then ws_net_paid * ws_quantity else 0 end) AS BIGINT) as sep_net
        |  ,CAST(sum(case when d_moy = 10
        |    then ws_net_paid * ws_quantity else 0 end) AS BIGINT) as oct_net
        |  ,CAST(sum(case when d_moy = 11
        |    then ws_net_paid * ws_quantity else 0 end) AS BIGINT) as nov_net
        |  ,CAST(sum(case when d_moy = 12
        |    then ws_net_paid * ws_quantity else 0 end) AS BIGINT) as dec_net
        |     from
        |          web_sales
        |         ,warehouse
        |         ,date_dim
        |         ,time_dim
        |    ,ship_mode
        |     where
        |            ws_warehouse_sk =  w_warehouse_sk
        |        and ws_sold_date_sk = d_date_sk
        |        and ws_sold_time_sk = t_time_sk
        |  and ws_ship_mode_sk = sm_ship_mode_sk
        |        and d_year = 2001
        |  and t_time between 30838 and 30838+28800
        |  and sm_carrier in ('DHL','BARIAN')
        |     group by
        |        w_warehouse_name
        |  ,w_warehouse_sq_ft
        |  ,w_city
        |  ,w_county
        |  ,w_state
        |  ,w_country
        |       ,d_year
        | union all
        |     select
        |  w_warehouse_name
        |  ,w_warehouse_sq_ft
        |  ,w_city
        |  ,w_county
        |  ,w_state
        |  ,w_country
        |  ,'DHL,BARIAN' as ship_carriers
        |       ,d_year as year_
        |  ,CAST(sum(case when d_moy = 1
        |    then cs_sales_price* cs_quantity else 0 end) AS BIGINT) as jan_sales
        |  ,CAST(sum(case when d_moy = 2
        |    then cs_sales_price* cs_quantity else 0 end) AS BIGINT) as feb_sales
        |  ,CAST(sum(case when d_moy = 3
        |    then cs_sales_price* cs_quantity else 0 end) AS BIGINT) as mar_sales
        |  ,CAST(sum(case when d_moy = 4
        |    then cs_sales_price* cs_quantity else 0 end) AS BIGINT) as apr_sales
        |  ,CAST(sum(case when d_moy = 5
        |    then cs_sales_price* cs_quantity else 0 end) AS BIGINT) as may_sales
        |  ,CAST(sum(case when d_moy = 6
        |    then cs_sales_price* cs_quantity else 0 end) AS BIGINT) as jun_sales
        |  ,CAST(sum(case when d_moy = 7
        |    then cs_sales_price* cs_quantity else 0 end) AS BIGINT) as jul_sales
        |  ,CAST(sum(case when d_moy = 8
        |    then cs_sales_price* cs_quantity else 0 end) AS BIGINT) as aug_sales
        |  ,CAST(sum(case when d_moy = 9
        |    then cs_sales_price* cs_quantity else 0 end) AS BIGINT) as sep_sales
        |  ,CAST(sum(case when d_moy = 10
        |    then cs_sales_price* cs_quantity else 0 end) AS BIGINT) as oct_sales
        |  ,CAST(sum(case when d_moy = 11
        |    then cs_sales_price* cs_quantity else 0 end) AS BIGINT) as nov_sales
        |  ,CAST(sum(case when d_moy = 12
        |    then cs_sales_price* cs_quantity else 0 end) AS BIGINT) as dec_sales
        |  ,CAST(sum(case when d_moy = 1
        |    then cs_net_paid_inc_tax * cs_quantity else 0 end) AS BIGINT) as jan_net
        |  ,CAST(sum(case when d_moy = 2
        |    then cs_net_paid_inc_tax * cs_quantity else 0 end) AS BIGINT) as feb_net
        |  ,CAST(sum(case when d_moy = 3
        |    then cs_net_paid_inc_tax * cs_quantity else 0 end) AS BIGINT) as mar_net
        |  ,CAST(sum(case when d_moy = 4
        |    then cs_net_paid_inc_tax * cs_quantity else 0 end) AS BIGINT) as apr_net
        |  ,CAST(sum(case when d_moy = 5
        |    then cs_net_paid_inc_tax * cs_quantity else 0 end) AS BIGINT) as may_net
        |  ,CAST(sum(case when d_moy = 6
        |    then cs_net_paid_inc_tax * cs_quantity else 0 end) AS BIGINT) as jun_net
        |  ,CAST(sum(case when d_moy = 7
        |    then cs_net_paid_inc_tax * cs_quantity else 0 end) AS BIGINT) as jul_net
        |  ,CAST(sum(case when d_moy = 8
        |    then cs_net_paid_inc_tax * cs_quantity else 0 end) AS BIGINT) as aug_net
        |  ,CAST(sum(case when d_moy = 9
        |    then cs_net_paid_inc_tax * cs_quantity else 0 end) AS BIGINT) as sep_net
        |  ,CAST(sum(case when d_moy = 10
        |    then cs_net_paid_inc_tax * cs_quantity else 0 end) AS BIGINT) as oct_net
        |  ,CAST(sum(case when d_moy = 11
        |    then cs_net_paid_inc_tax * cs_quantity else 0 end) AS BIGINT) as nov_net
        |  ,CAST(sum(case when d_moy = 12
        |    then cs_net_paid_inc_tax * cs_quantity else 0 end) AS BIGINT) as dec_net
        |     from
        |          catalog_sales
        |         ,warehouse
        |         ,date_dim
        |         ,time_dim
        |   ,ship_mode
        |     where
        |            cs_warehouse_sk =  w_warehouse_sk
        |        and cs_sold_date_sk = d_date_sk
        |        and cs_sold_time_sk = t_time_sk
        |  and cs_ship_mode_sk = sm_ship_mode_sk
        |        and d_year = 2001
        |  and t_time between 30838 AND 30838+28800
        |  and sm_carrier in ('DHL','BARIAN')
        |     group by
        |        w_warehouse_name
        |  ,w_warehouse_sq_ft
        |  ,w_city
        |  ,w_county
        |  ,w_state
        |  ,w_country
        |       ,d_year
        | ) x
        | group by
        |        w_warehouse_name
        |  ,w_warehouse_sq_ft
        |  ,w_city
        |  ,w_county
        |  ,w_state
        |  ,w_country
        |  ,ship_carriers
        |       ,year_
        | order by w_warehouse_name NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q74: year-over-year net-paid growth, store vs web (verbatim)
    "tpcds_q74" -> wrap(
      """WITH year_total AS
        |  (SELECT c_customer_id customer_id,
        |          c_first_name customer_first_name,
        |          c_last_name customer_last_name,
        |          d_year AS year_,
        |          sum(ss_net_paid) year_total,
        |          's' sale_type
        |   FROM customer,
        |        store_sales,
        |        date_dim
        |   WHERE c_customer_sk = ss_customer_sk
        |     AND ss_sold_date_sk = d_date_sk
        |     AND d_year IN (2001,
        |                    2001+1)
        |   GROUP BY c_customer_id,
        |            c_first_name,
        |            c_last_name,
        |            d_year
        |   UNION ALL SELECT c_customer_id customer_id,
        |                    c_first_name customer_first_name,
        |                    c_last_name customer_last_name,
        |                    d_year AS year_,
        |                    sum(ws_net_paid) year_total,
        |                    'w' sale_type
        |   FROM customer,
        |        web_sales,
        |        date_dim
        |   WHERE c_customer_sk = ws_bill_customer_sk
        |     AND ws_sold_date_sk = d_date_sk
        |     AND d_year IN (2001,
        |                    2001+1)
        |   GROUP BY c_customer_id,
        |            c_first_name,
        |            c_last_name,
        |            d_year)
        |SELECT t_s_secyear.customer_id,
        |       t_s_secyear.customer_first_name,
        |       t_s_secyear.customer_last_name
        |FROM year_total t_s_firstyear,
        |     year_total t_s_secyear,
        |     year_total t_w_firstyear,
        |     year_total t_w_secyear
        |WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
        |  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
        |  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
        |  AND t_s_firstyear.sale_type = 's'
        |  AND t_w_firstyear.sale_type = 'w'
        |  AND t_s_secyear.sale_type = 's'
        |  AND t_w_secyear.sale_type = 'w'
        |  AND t_s_firstyear.year_ = 2001
        |  AND t_s_secyear.year_ = 2001+1
        |  AND t_w_firstyear.year_ = 2001
        |  AND t_w_secyear.year_ = 2001+1
        |  AND t_s_firstyear.year_total > 0
        |  AND t_w_firstyear.year_total > 0
        |  AND CASE
        |          WHEN t_w_firstyear.year_total > 0 THEN t_w_secyear.year_total / t_w_firstyear.year_total
        |          ELSE NULL
        |      END > CASE
        |                WHEN t_s_firstyear.year_total > 0 THEN t_s_secyear.year_total / t_s_firstyear.year_total
        |                ELSE NULL
        |            END
        |ORDER BY 1 NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q76: sales with NULL fks per channel (verbatim; NULL slices in derivation)
    "tpcds_q76" -> wrap(
      """SELECT channel,
        |       col_name,
        |       d_year,
        |       d_qoy,
        |       i_category,
        |       COUNT(*) sales_cnt,
        |       CAST(SUM(ext_sales_price) AS BIGINT) sales_amt
        |FROM
        |  ( SELECT 'store' AS channel,
        |           'ss_store_sk' col_name,
        |                         d_year,
        |                         d_qoy,
        |                         i_category,
        |                         ss_ext_sales_price ext_sales_price
        |   FROM store_sales,
        |        item,
        |        date_dim
        |   WHERE ss_store_sk IS NULL
        |     AND ss_sold_date_sk=d_date_sk
        |     AND ss_item_sk=i_item_sk
        |   UNION ALL SELECT 'web' AS channel,
        |                    'ws_ship_customer_sk' col_name,
        |                                          d_year,
        |                                          d_qoy,
        |                                          i_category,
        |                                          ws_ext_sales_price ext_sales_price
        |   FROM web_sales,
        |        item,
        |        date_dim
        |   WHERE ws_ship_customer_sk IS NULL
        |     AND ws_sold_date_sk=d_date_sk
        |     AND ws_item_sk=i_item_sk
        |   UNION ALL SELECT 'catalog' AS channel,
        |                    'cs_ship_addr_sk' col_name,
        |                                      d_year,
        |                                      d_qoy,
        |                                      i_category,
        |                                      cs_ext_sales_price ext_sales_price
        |   FROM catalog_sales,
        |        item,
        |        date_dim
        |   WHERE cs_ship_addr_sk IS NULL
        |     AND cs_sold_date_sk=d_date_sk
        |     AND cs_item_sk=i_item_sk) foo
        |GROUP BY channel,
        |         col_name,
        |         d_year,
        |         d_qoy,
        |         i_category
        |ORDER BY channel NULLS FIRST,
        |         col_name NULLS FIRST,
        |         d_year NULLS FIRST,
        |         d_qoy NULLS FIRST,
        |         i_category NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q77: per-channel sales/returns/profit rollup (outer sums cast)
    "tpcds_q77" -> wrap(
      """WITH ss AS
        |  (SELECT s_store_sk,
        |          sum(ss_ext_sales_price) AS sales,
        |          sum(ss_net_profit) AS profit
        |   FROM store_sales,
        |        date_dim,
        |        store
        |   WHERE ss_sold_date_sk = d_date_sk
        |     AND d_date BETWEEN cast('2000-08-23' AS date) AND cast('2000-09-22' AS date)
        |     AND ss_store_sk = s_store_sk
        |   GROUP BY s_store_sk) ,
        |     sr AS
        |  (SELECT s_store_sk,
        |          sum(sr_return_amt) AS returns_,
        |          sum(sr_net_loss) AS profit_loss
        |   FROM store_returns,
        |        date_dim,
        |        store
        |   WHERE sr_returned_date_sk = d_date_sk
        |     AND d_date BETWEEN cast('2000-08-23' AS date) AND cast('2000-09-22' AS date)
        |     AND sr_store_sk = s_store_sk
        |   GROUP BY s_store_sk),
        |     cs AS
        |  (SELECT cs_call_center_sk,
        |          sum(cs_ext_sales_price) AS sales,
        |          sum(cs_net_profit) AS profit
        |   FROM catalog_sales,
        |        date_dim
        |   WHERE cs_sold_date_sk = d_date_sk
        |     AND d_date BETWEEN cast('2000-08-23' AS date) AND cast('2000-09-22' AS date)
        |   GROUP BY cs_call_center_sk),
        |     cr AS
        |  (SELECT cr_call_center_sk,
        |          sum(cr_return_amount) AS returns_,
        |          sum(cr_net_loss) AS profit_loss
        |   FROM catalog_returns,
        |        date_dim
        |   WHERE cr_returned_date_sk = d_date_sk
        |     AND d_date BETWEEN cast('2000-08-23' AS date) AND cast('2000-09-22' AS date)
        |   GROUP BY cr_call_center_sk ),
        |     ws AS
        |  (SELECT wp_web_page_sk,
        |          sum(ws_ext_sales_price) AS sales,
        |          sum(ws_net_profit) AS profit
        |   FROM web_sales,
        |        date_dim,
        |        web_page
        |   WHERE ws_sold_date_sk = d_date_sk
        |     AND d_date BETWEEN cast('2000-08-23' AS date) AND cast('2000-09-22' AS date)
        |     AND ws_web_page_sk = wp_web_page_sk
        |   GROUP BY wp_web_page_sk),
        |     wr AS
        |  (SELECT wp_web_page_sk,
        |          sum(wr_return_amt) AS returns_,
        |          sum(wr_net_loss) AS profit_loss
        |   FROM web_returns,
        |        date_dim,
        |        web_page
        |   WHERE wr_returned_date_sk = d_date_sk
        |     AND d_date BETWEEN cast('2000-08-23' AS date) AND cast('2000-09-22' AS date)
        |     AND wr_web_page_sk = wp_web_page_sk
        |   GROUP BY wp_web_page_sk)
        |SELECT channel ,
        |       id ,
        |       CAST(sum(sales) AS BIGINT) AS sales ,
        |       CAST(sum(returns_) AS BIGINT) AS returns_ ,
        |       CAST(sum(profit) AS BIGINT) AS profit
        |FROM
        |  (SELECT 'store channel' AS channel ,
        |          ss.s_store_sk AS id ,
        |          sales ,
        |          coalesce(returns_, 0) AS returns_ ,
        |          (profit - coalesce(profit_loss,0)) AS profit
        |   FROM ss
        |   LEFT JOIN sr ON ss.s_store_sk = sr.s_store_sk
        |   UNION ALL SELECT 'catalog channel' AS channel ,
        |                    cs_call_center_sk AS id ,
        |                    sales ,
        |                    returns_ ,
        |                    (profit - profit_loss) AS profit
        |   FROM cs ,
        |        cr
        |   UNION ALL SELECT 'web channel' AS channel ,
        |                    ws.wp_web_page_sk AS id ,
        |                    sales ,
        |                    coalesce(returns_, 0) returns_ ,
        |                    (profit - coalesce(profit_loss,0)) AS profit
        |   FROM ws
        |   LEFT JOIN wr ON ws.wp_web_page_sk = wr.wp_web_page_sk ) x
        |GROUP BY ROLLUP (channel,
        |                 id)
        |ORDER BY channel NULLS FIRST,
        |         id NULLS FIRST,
        |         returns_ DESC
        |LIMIT 100""".stripMargin),

    // q81: catalog-returns customers above 1.2x state average, full address echo (CTE sum cast)
    "tpcds_q81" -> wrap(
      """WITH customer_total_return AS
        |  (SELECT cr_returning_customer_sk AS ctr_customer_sk ,
        |          ca_state AS ctr_state,
        |          CAST(sum(cr_return_amt_inc_tax) AS BIGINT) AS ctr_total_return
        |   FROM catalog_returns ,
        |        date_dim ,
        |        customer_address
        |   WHERE cr_returned_date_sk = d_date_sk
        |     AND d_year = 2000
        |     AND cr_returning_addr_sk = ca_address_sk
        |   GROUP BY cr_returning_customer_sk ,
        |            ca_state)
        |SELECT c_customer_id,
        |       c_salutation,
        |       c_first_name,
        |       c_last_name,
        |       ca_street_number,
        |       ca_street_name ,
        |       ca_street_type,
        |       ca_suite_number,
        |       ca_city,
        |       ca_county,
        |       ca_state,
        |       ca_zip,
        |       ca_country,
        |       ca_gmt_offset ,
        |       ca_location_type,
        |       ctr_total_return
        |FROM customer_total_return ctr1 ,
        |     customer_address ,
        |     customer
        |WHERE ctr1.ctr_total_return >
        |    (SELECT avg(ctr_total_return)*1.2
        |     FROM customer_total_return ctr2
        |     WHERE ctr1.ctr_state = ctr2.ctr_state)
        |  AND ca_address_sk = c_current_addr_sk
        |  AND ca_state = 'GA'
        |  AND ctr1.ctr_customer_sk = c_customer_sk
        |ORDER BY c_customer_id,
        |         c_salutation,
        |         c_first_name,
        |         c_last_name,
        |         ca_street_number,
        |         ca_street_name ,
        |         ca_street_type,
        |         ca_suite_number,
        |         ca_city,
        |         ca_county,
        |         ca_state,
        |         ca_zip,
        |         ca_country,
        |         ca_gmt_offset ,
        |         ca_location_type,
        |         ctr_total_return
        |LIMIT 100""".stripMargin),

    // q83: three-channel item return quantities for three weeks (sums cast, *1.0000 idiom -> CAST DOUBLE)
    "tpcds_q83" -> wrap(
      """WITH sr_items AS
        |  (SELECT i_item_id item_id,
        |          CAST(sum(sr_return_quantity) AS BIGINT) sr_item_qty
        |   FROM store_returns,
        |        item,
        |        date_dim
        |   WHERE sr_item_sk = i_item_sk
        |     AND d_date IN
        |       (SELECT d_date
        |        FROM date_dim
        |        WHERE d_week_seq IN
        |            (SELECT d_week_seq
        |             FROM date_dim
        |             WHERE d_date IN ('2000-06-30',
        |                              '2000-09-27',
        |                              '2000-11-17')))
        |     AND sr_returned_date_sk = d_date_sk
        |   GROUP BY i_item_id),
        |     cr_items AS
        |  (SELECT i_item_id item_id,
        |          CAST(sum(cr_return_quantity) AS BIGINT) cr_item_qty
        |   FROM catalog_returns,
        |        item,
        |        date_dim
        |   WHERE cr_item_sk = i_item_sk
        |     AND d_date IN
        |       (SELECT d_date
        |        FROM date_dim
        |        WHERE d_week_seq IN
        |            (SELECT d_week_seq
        |             FROM date_dim
        |             WHERE d_date IN ('2000-06-30',
        |                              '2000-09-27',
        |                              '2000-11-17')))
        |     AND cr_returned_date_sk = d_date_sk
        |   GROUP BY i_item_id),
        |     wr_items AS
        |  (SELECT i_item_id item_id,
        |          CAST(sum(wr_return_quantity) AS BIGINT) wr_item_qty
        |   FROM web_returns,
        |        item,
        |        date_dim
        |   WHERE wr_item_sk = i_item_sk
        |     AND d_date IN
        |       (SELECT d_date
        |        FROM date_dim
        |        WHERE d_week_seq IN
        |            (SELECT d_week_seq
        |             FROM date_dim
        |             WHERE d_date IN ('2000-06-30',
        |                              '2000-09-27',
        |                              '2000-11-17')))
        |     AND wr_returned_date_sk = d_date_sk
        |   GROUP BY i_item_id)
        |SELECT sr_items.item_id ,
        |       sr_item_qty ,
        |       CAST(sr_item_qty AS DOUBLE)/(sr_item_qty+cr_item_qty+wr_item_qty)/3.0 * 100 sr_dev ,
        |       cr_item_qty ,
        |       CAST(cr_item_qty AS DOUBLE)/(sr_item_qty+cr_item_qty+wr_item_qty)/3.0 * 100 cr_dev ,
        |       wr_item_qty ,
        |       CAST(wr_item_qty AS DOUBLE)/(sr_item_qty+cr_item_qty+wr_item_qty)/3.0 * 100 wr_dev ,
        |       CAST(sr_item_qty+cr_item_qty+wr_item_qty AS DOUBLE)/3.0 average
        |FROM sr_items ,
        |     cr_items ,
        |     wr_items
        |WHERE sr_items.item_id=cr_items.item_id
        |  AND sr_items.item_id=wr_items.item_id
        |ORDER BY sr_items.item_id NULLS FIRST,
        |         sr_item_qty NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q84: Edgewood income-band customers with store returns (verbatim)
    "tpcds_q84" -> wrap(
      """SELECT c_customer_id AS customer_id ,
        |       concat(concat(coalesce(c_last_name, '') , ', '), coalesce(c_first_name, '')) AS customername
        |FROM customer ,
        |     customer_address ,
        |     customer_demographics ,
        |     household_demographics ,
        |     income_band ,
        |     store_returns
        |WHERE ca_city = 'Edgewood'
        |  AND c_current_addr_sk = ca_address_sk
        |  AND ib_lower_bound >= 38128
        |  AND ib_upper_bound <= 38128 + 50000
        |  AND ib_income_band_sk = hd_income_band_sk
        |  AND cd_demo_sk = c_current_cdemo_sk
        |  AND hd_demo_sk = c_current_hdemo_sk
        |  AND sr_cdemo_sk = cd_demo_sk
        |ORDER BY c_customer_id NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q86: web rollup with grouping()-ranked hierarchy (total_sum cast)
    "tpcds_q86" -> wrap(
      """SELECT CAST(sum(ws_net_paid) AS BIGINT) AS total_sum ,
        |       i_category ,
        |       i_class ,
        |       grouping(i_category)+grouping(i_class) AS lochierarchy ,
        |       rank() OVER ( PARTITION BY grouping(i_category)+grouping(i_class),
        |                                  CASE
        |                                      WHEN grouping(i_class) = 0 THEN i_category
        |                                  END
        |                    ORDER BY sum(ws_net_paid) DESC) AS rank_within_parent
        |FROM web_sales ,
        |     date_dim d1 ,
        |     item
        |WHERE d1.d_month_seq BETWEEN 1200 AND 1200+11
        |  AND d1.d_date_sk = ws_sold_date_sk
        |  AND i_item_sk = ws_item_sk
        |GROUP BY rollup(i_category,i_class)
        |ORDER BY lochierarchy DESC NULLS FIRST,
        |         CASE
        |             WHEN grouping(i_category)+grouping(i_class) = 0 THEN i_category
        |         END NULLS FIRST,
        |         rank_within_parent NULLS FIRST
        |LIMIT 100""".stripMargin),

    // q89: in-category class deviations from monthly average (sum cast)
    "tpcds_q89" -> wrap(
      """SELECT * from
        |  (SELECT i_category, i_class, i_brand, s_store_name, s_company_name, d_moy, CAST(sum(ss_sales_price) AS BIGINT) sum_sales, avg(sum(ss_sales_price)) OVER (PARTITION BY i_category, i_brand, s_store_name, s_company_name) avg_monthly_sales
        |   FROM item, store_sales, date_dim, store
        |   WHERE ss_item_sk = i_item_sk
        |     AND ss_sold_date_sk = d_date_sk
        |     AND ss_store_sk = s_store_sk
        |     AND d_year = 1999
        |     AND ((i_category IN ('Books','Electronics','Sports')
        |           AND i_class IN ('computers','stereo','football') )
        |          OR (i_category IN ('Men','Jewelry','Women')
        |              AND i_class IN ('shirts','birdal','dresses')))
        |   GROUP BY i_category, i_class, i_brand, s_store_name, s_company_name, d_moy) tmp1
        |WHERE CASE
        |          WHEN (avg_monthly_sales <> 0) THEN (abs(sum_sales - avg_monthly_sales) / avg_monthly_sales)
        |          ELSE NULL
        |      END > 0.1
        |ORDER BY sum_sales - avg_monthly_sales,
        |         s_store_name, 1, 2, 3, 5, 6, 7, 8
        |LIMIT 100""".stripMargin),

    // q90: morning/evening web sales ratio (dec casts -> DOUBLE)
    "tpcds_q90" -> wrap(
      """SELECT case when pmc=0 then null else cast(amc AS DOUBLE)/cast(pmc AS DOUBLE) end am_pm_ratio
        |FROM
        |  (SELECT count(*) amc
        |   FROM web_sales,
        |        household_demographics,
        |        time_dim,
        |        web_page
        |   WHERE ws_sold_time_sk = time_dim.t_time_sk
        |     AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
        |     AND ws_web_page_sk = web_page.wp_web_page_sk
        |     AND time_dim.t_hour BETWEEN 8 AND 8+1
        |     AND household_demographics.hd_dep_count = 6
        |     AND web_page.wp_char_count BETWEEN 5000 AND 5200) AT,
        |  (SELECT count(*) pmc
        |   FROM web_sales,
        |        household_demographics,
        |        time_dim,
        |        web_page
        |   WHERE ws_sold_time_sk = time_dim.t_time_sk
        |     AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
        |     AND ws_web_page_sk = web_page.wp_web_page_sk
        |     AND time_dim.t_hour BETWEEN 19 AND 19+1
        |     AND household_demographics.hd_dep_count = 6
        |     AND web_page.wp_char_count BETWEEN 5000 AND 5200) pt
        |ORDER BY am_pm_ratio
        |LIMIT 100""".stripMargin),

    // q91: call-center catalog-return losses for M/Unknown + W/Advanced cohorts (sum cast)
    "tpcds_q91" -> wrap(
      """SELECT cc_call_center_id Call_Center,
        |       cc_name Call_Center_Name,
        |       cc_manager Manager,
        |       CAST(sum(cr_net_loss) AS BIGINT) Returns_Loss
        |FROM call_center,
        |     catalog_returns,
        |     date_dim,
        |     customer,
        |     customer_address,
        |     customer_demographics,
        |     household_demographics
        |WHERE cr_call_center_sk = cc_call_center_sk
        |  AND cr_returned_date_sk = d_date_sk
        |  AND cr_returning_customer_sk= c_customer_sk
        |  AND cd_demo_sk = c_current_cdemo_sk
        |  AND hd_demo_sk = c_current_hdemo_sk
        |  AND ca_address_sk = c_current_addr_sk
        |  AND d_year = 1998
        |  AND d_moy = 11
        |  AND ((cd_marital_status = 'M'
        |        AND cd_education_status = 'Unknown') or(cd_marital_status = 'W'
        |                                                AND cd_education_status = 'Advanced Degree'))
        |  AND hd_buy_potential LIKE 'Unknown%'
        |  AND ca_gmt_offset = -7
        |GROUP BY cc_call_center_id,
        |         cc_name,
        |         cc_manager,
        |         cd_marital_status,
        |         cd_education_status
        |ORDER BY sum(cr_net_loss) DESC""".stripMargin),

    // q99: catalog ship-latency day buckets by warehouse/mode/center (space aliases, sums cast)
    "tpcds_q99" -> wrap(
      """SELECT w_substr ,
        |       sm_type ,
        |       LOWER(cc_name) cc_name_lower ,
        |       CAST(sum(CASE
        |               WHEN (cs_ship_date_sk - cs_sold_date_sk <= 30) THEN 1
        |               ELSE 0
        |           END) AS BIGINT) AS days_30,
        |       CAST(sum(CASE
        |               WHEN (cs_ship_date_sk - cs_sold_date_sk > 30)
        |                    AND (cs_ship_date_sk - cs_sold_date_sk <= 60) THEN 1
        |               ELSE 0
        |           END) AS BIGINT) AS days_31_60,
        |       CAST(sum(CASE
        |               WHEN (cs_ship_date_sk - cs_sold_date_sk > 60)
        |                    AND (cs_ship_date_sk - cs_sold_date_sk <= 90) THEN 1
        |               ELSE 0
        |           END) AS BIGINT) AS days_61_90,
        |       CAST(sum(CASE
        |               WHEN (cs_ship_date_sk - cs_sold_date_sk > 90)
        |                    AND (cs_ship_date_sk - cs_sold_date_sk <= 120) THEN 1
        |               ELSE 0
        |           END) AS BIGINT) AS days_91_120,
        |       CAST(sum(CASE
        |               WHEN (cs_ship_date_sk - cs_sold_date_sk > 120) THEN 1
        |               ELSE 0
        |           END) AS BIGINT) AS days_over_120
        |FROM catalog_sales ,
        |  (SELECT SUBSTRING(w_warehouse_name,1,20) w_substr, *
        |   FROM warehouse) AS sq1 ,
        |     ship_mode ,
        |     call_center ,
        |     date_dim
        |WHERE d_month_seq BETWEEN 1200 AND 1200 + 11
        |  AND cs_ship_date_sk = d_date_sk
        |  AND cs_warehouse_sk = w_warehouse_sk
        |  AND cs_ship_mode_sk = sm_ship_mode_sk
        |  AND cs_call_center_sk = cc_call_center_sk
        |GROUP BY w_substr ,
        |         sm_type ,
        |         cc_name
        |ORDER BY w_substr  NULLS FIRST,
        |         sm_type  NULLS FIRST,
        |        cc_name_lower NULLS FIRST
        |LIMIT 100""".stripMargin))

  /** q88's body is mechanical: eight identical count(*) subqueries over
    * consecutive half-hour windows, exactly the canonical text's shape. */
  private def q88Body: String = {
    val windows = Seq(
      ("h8_30_to_9", "time_dim.t_hour = 8\n     AND time_dim.t_minute >= 30"),
      ("h9_to_9_30", "time_dim.t_hour = 9\n     AND time_dim.t_minute < 30"),
      ("h9_30_to_10", "time_dim.t_hour = 9\n     AND time_dim.t_minute >= 30"),
      ("h10_to_10_30", "time_dim.t_hour = 10\n     AND time_dim.t_minute < 30"),
      ("h10_30_to_11", "time_dim.t_hour = 10\n     AND time_dim.t_minute >= 30"),
      ("h11_to_11_30", "time_dim.t_hour = 11\n     AND time_dim.t_minute < 30"),
      ("h11_30_to_12", "time_dim.t_hour = 11\n     AND time_dim.t_minute >= 30"),
      ("h12_to_12_30", "time_dim.t_hour = 12\n     AND time_dim.t_minute < 30"))
    val subs = windows.zipWithIndex.map { case ((alias, pred), i) =>
      s"""  (SELECT count(*) $alias
         |   FROM store_sales,
         |        household_demographics,
         |        time_dim,
         |        store
         |   WHERE ss_sold_time_sk = time_dim.t_time_sk
         |     AND ss_hdemo_sk = household_demographics.hd_demo_sk
         |     AND ss_store_sk = s_store_sk
         |     AND $pred
         |     AND ((household_demographics.hd_dep_count = 4
         |           AND household_demographics.hd_vehicle_count<=4+2)
         |          OR (household_demographics.hd_dep_count = 2
         |              AND household_demographics.hd_vehicle_count<=2+2)
         |          OR (household_demographics.hd_dep_count = 0
         |              AND household_demographics.hd_vehicle_count<=0+2))
         |     AND store.s_store_name = 'ese') s${i + 1}""".stripMargin
    }
    "SELECT *\nFROM\n" + subs.mkString(",\n")
  }
}
