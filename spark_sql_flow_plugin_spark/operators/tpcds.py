"""Executable TPC-DS slice with bit-exact DuckDB oracles (VERDICT r5 #1).

The reference's main test corpus is 103 TPC-DS queries
(``TPCDSFlowTestSuite.scala:22-36``, SQL texts under
``tpcds-flow-tests/inputs/*.sql``); this repo lineage-checks all 103
(``tests/test_tpcds_lineage.py``) and — as of round 8 — EXECUTES all
103 against data with bit-exact DuckDB oracles. The slice grew 20
(round 6) -> 56 -> 74 (round 7) -> 103 (round 8, adding the mega-join
shapes q14a/b, q64, q75, q78 plus the remaining star/returns/inventory
variants). Representative shapes: date-dim stars
(q3), correlated dim subqueries (q6), demographic stars (q7), WITH-heavy
year-over-year self-joins (q11), inventory date-window pivots (q21),
group-count bucket joins (q34), cumulative-window FULL OUTER comparisons
(q51), weekly pivot self-joins across years (q59), multi-channel ROLLUP
rollups (q77), multi-scalar-subquery cross joins (q88), returns CTEs
under correlated scalar averages (q1), cross-geography dim inequalities
(q19), three-fact sale/return/re-purchase chains (q25), IN+EXISTS-OR-
EXISTS decorrelation (q35), OR-of-AND predicate stacks (q48), under-
average item hunts via twice-evaluated revenue subqueries (q65),
per-ticket rollups (q79), time-dim selectivity counts (q96), channel-
overlap FULL OUTER cohorts (q97), and ratio-to-class windows over
aggregates (q98).

Data: rather than shipping a second dataset, the 17 TPC-DS tables these
queries touch are DERIVED deterministically from the driver's TPC-H-ish
parquet via a SQL "shim" layer of CTEs (store/catalog/web sales =
lineitem x orders sliced by ``l_linenumber % 3``; date_dim = the date
domain of orders+shipments; item/customer/dims = pure functions of the
base keys). The same SQL text runs on Spark and DuckDB modulo a tiny
dialect table, so the oracle is bit-exact by construction and row volume
scales with the driver's SF.

Documented adaptations from the reference texts (the shape is preserved;
constants and money types are retuned to the derived data):

- money columns are exact integer CENTS (``*_cents`` BIGINT) — cross-
  engine float SUM order-dependence is the one thing that cannot be made
  bit-exact, integer sums can (``floor(price * 100)`` on the identical
  IEEE double is unambiguous); averages/ratios are emitted as single
  IEEE divisions of those exact sums.
- the TPC-DS ``customer`` table is named ``customer_dim`` (the CTE would
  otherwise shadow the TPC-H ``customer`` view it derives from).
- filter constants (years, price bands, county/store names, count
  buckets) target the derived data's domains so every query returns rows
  at sf0.01+.

Scale posture: the shim is pure CTE SQL — Catalyst inlines it, pushes
the date/dim predicates into the parquet scans, and broadcasts the
derived dims (they come from the kB-sized part/supplier/customer
tables); DuckDB materializes the fact CTEs once per query
(``AS MATERIALIZED``) to dodge exponential CTE re-inlining.
"""

from __future__ import annotations

from ..registry import register
from ..sources.tables import register_views

# ---------------------------------------------------------------------------
# dialect table
# ---------------------------------------------------------------------------

_DIALECT = {
    "spark": {
        "MAT": "",
        "VSTR": "STRING",
        # epoch days of a timestamp/date expression (BIGINT in both engines)
        "D_ORDER": "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)",
        "D_SHIP": "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01') AS BIGINT)",
        "DDATE_DAYS": "CAST(datediff(d_date, DATE '1970-01-01') AS BIGINT)",
        # day-of-week normalized to 0=Sunday
        "DOW": "(dayofweek(d_date) - 1)",
    },
    "duck": {
        "MAT": "MATERIALIZED",
        "VSTR": "VARCHAR",
        "D_ORDER": "CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT)",
        "D_SHIP": "CAST((CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS BIGINT)",
        "DDATE_DAYS": "CAST((d_date - DATE '1970-01-01') AS BIGINT)",
        "DOW": "dayofweek(d_date)",
    },
}

# exact-cents money expressions (identical IEEE ops in both engines)
_PRICE = "CAST(floor(l_extendedprice * 100) AS BIGINT)"
_LIST = "CAST(floor(l_extendedprice * 110) AS BIGINT)"
_SALESP = "CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
_COUPON = "CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)"
_PROFIT = (
    "CAST(floor(l_extendedprice * (1 - l_discount) * 100)"
    " - floor(l_extendedprice * 90) AS BIGINT)"
)
_TIME_SK = "CAST((o_orderkey * 7919 + l_linenumber * 677) % 86400 AS BIGINT)"

_LI_ORD = "lineitem JOIN orders ON l_orderkey = o_orderkey"


def _sales(prefix: str, channel: int, cust: str, loc: str, ordno: str,
           extra_cols: str = "") -> str:
    """One channel's sales fact CTE body (store=0, catalog=1, web=2).

    Ship-side columns (added for the round-6 batch-2 queries): ship date =
    the lineitem's l_shipdate, ship mode/warehouse/web-site sks are pure key
    functions, and ship_customer/ship_addr carry a sparse deterministic NULL
    (~2% of rows, ``% 53 = 0`` / ``% 59 = 0``) — TPC-DS facts have nullable
    FKs and q76-family queries exist precisely to count them.
    """
    p = prefix
    return f"""(
  SELECT {{D_ORDER}} AS {p}_sold_date_sk,
         {_TIME_SK} AS {p}_sold_time_sk,
         {{D_SHIP}} AS {p}_ship_date_sk,
         l_partkey AS {p}_item_sk,
         o_custkey AS {cust},
         1 + o_custkey % 100 AS {p}_cdemo_sk,
         1 + (o_custkey + l_partkey) % 50 AS {p}_hdemo_sk,
         1 + (o_custkey * 3 + l_partkey) % 50 AS {p}_ship_hdemo_sk,
         CASE WHEN (o_orderkey * 17 + l_partkey) % 47 = 0 THEN NULL
              WHEN (o_orderkey + l_partkey) % 7 = 0 THEN 1 + l_suppkey
              ELSE o_custkey END AS {p}_addr_sk,
         1 + l_partkey % 20 AS {p}_catalog_page_sk,
         CASE WHEN (o_orderkey + l_partkey) % 53 = 0 THEN NULL
              ELSE o_custkey END AS {p}_ship_customer_sk,
         CASE WHEN (o_orderkey * 31 + l_partkey) % 59 = 0 THEN NULL
              ELSE o_custkey END AS {p}_ship_addr_sk,
         1 + (l_orderkey + l_suppkey) % 5 AS {p}_ship_mode_sk,
         1 + l_suppkey % 5 AS {p}_warehouse_sk,
         1 + l_suppkey % 6 AS {p}_web_site_sk,
         1 + l_partkey % 30 AS {p}_promo_sk,
         {loc},
         o_orderkey AS {ordno},
         CAST(l_quantity AS INT) AS {p}_quantity,
         {_PRICE} AS {p}_ext_sales_price_cents,
         {_LIST} AS {p}_list_price_cents,
         {_SALESP} AS {p}_sales_price_cents,
         {_COUPON} AS {p}_coupon_amt_cents,
         {_COUPON} AS {p}_ext_discount_amt_cents,
         CAST(floor(l_extendedprice * 55) AS BIGINT)
             AS {p}_ext_wholesale_cost_cents,
         CAST(floor(l_extendedprice * 5) AS BIGINT)
             AS {p}_ext_ship_cost_cents,
         {_SALESP} AS {p}_net_paid_cents,
         {_PROFIT} AS {p}_net_profit_cents,
         CAST(floor(l_extendedprice * 115) AS BIGINT)
             AS {p}_ext_list_price_cents,
         CAST(floor(l_extendedprice * (1 - l_discount) * l_tax * 100)
             AS BIGINT) AS {p}_ext_tax_cents{extra_cols}
  FROM {_LI_ORD}
  WHERE l_linenumber % 3 = {channel})"""


def _returns(prefix: str, channel: int, loc: str, amt: str,
             ordno: str | None = None) -> str:
    p = prefix
    ordno = ordno or f"{p}_order_number"
    return f"""(
  SELECT {{D_SHIP}} + 14 AS {p}_returned_date_sk,
         l_partkey AS {p}_item_sk,
         o_custkey AS {p}_customer_sk,
         {loc},
         1 + l_partkey % 20 AS {p}_catalog_page_sk,
         o_orderkey AS {ordno},
         1 + (o_orderkey + l_partkey) % 10 AS {p}_reason_sk,
         CAST(ceil(l_quantity / 2.0) AS INT) AS {p}_return_quantity,
         {_SALESP} AS {amt},
         CAST(floor(l_extendedprice * 10) AS BIGINT) AS {p}_net_loss_cents,
         CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
             AS BIGINT) AS {p}_return_amt_inc_tax_cents,
         CAST(floor(l_extendedprice * (1 - l_discount) * 60) AS BIGINT)
             AS {p}_refunded_cash_cents,
         CAST(floor(l_extendedprice * (1 - l_discount) * 25) AS BIGINT)
             AS {p}_reversed_charge_cents,
         CAST(floor(l_extendedprice * (1 - l_discount) * 15) AS BIGINT)
             AS {p}_store_credit_cents,
         CAST(floor(l_extendedprice * 2) AS BIGINT) AS {p}_fee_cents,
         o_custkey AS {p}_returning_customer_sk,
         1 + o_custkey % 100 AS {p}_refunded_cdemo_sk,
         1 + o_custkey % 100 AS {p}_cdemo_sk,
         1 + (o_custkey + l_partkey) % 100 AS {p}_returning_cdemo_sk,
         o_custkey AS {p}_refunded_addr_sk,
         o_custkey AS {p}_returning_addr_sk
  FROM {_LI_ORD}
  WHERE l_linenumber % 3 = {channel} AND l_returnflag = 'R')"""


#: shim table name -> CTE body template (dialect placeholders unexpanded)
_SHIM: dict[str, str] = {
    "date_dim": """(
  SELECT d_date_sk, d_date,
         year(d_date) AS d_year,
         month(d_date) AS d_moy,
         day(d_date) AS d_dom,
         1 + CAST(floor((month(d_date) - 1) / 3.0) AS INT) AS d_qoy,
         year(d_date) * 12 + (month(d_date) - 1) AS d_month_seq,
         CAST(floor(d_date_sk / 7.0) AS BIGINT) AS d_week_seq,
         {DOW} AS d_dow,
         CASE {DOW} WHEN 0 THEN 'Sunday' WHEN 1 THEN 'Monday'
              WHEN 2 THEN 'Tuesday' WHEN 3 THEN 'Wednesday'
              WHEN 4 THEN 'Thursday' WHEN 5 THEN 'Friday'
              ELSE 'Saturday' END AS d_day_name,
         concat(CAST(year(d_date) AS {VSTR}), 'Q',
                CAST(1 + CAST(floor((month(d_date) - 1) / 3.0) AS INT)
                     AS {VSTR})) AS d_quarter_name
  FROM (SELECT DISTINCT {DDATE_DAYS} AS d_date_sk, d_date
        FROM (SELECT CAST(o_orderdate AS DATE) AS d_date FROM orders
              UNION
              SELECT CAST(l_shipdate AS DATE) AS d_date FROM lineitem
              UNION
              SELECT CAST(l_shipdate AS DATE) + 14 AS d_date FROM lineitem
             ) raw_dates) days)""",
    "store_sales": _sales("ss", 0, "ss_customer_sk",
                          "CASE WHEN (o_orderkey * 31 + l_partkey) % 53 = 0 "
                          "THEN NULL ELSE 1 + l_suppkey % 8 END AS ss_store_sk",
                          "ss_ticket_number"),
    "catalog_sales": _sales("cs", 1, "cs_bill_customer_sk",
                            "1 + l_suppkey % 4 AS cs_call_center_sk",
                            "cs_order_number",
                            extra_cols=""",
         1 + o_custkey % 100 AS cs_bill_cdemo_sk,
         1 + (o_custkey + l_partkey) % 50 AS cs_bill_hdemo_sk,
         CASE WHEN (o_orderkey * 17 + l_partkey) % 47 = 0 THEN NULL
              WHEN (o_orderkey + l_partkey) % 7 = 0 THEN 1 + l_suppkey
              ELSE o_custkey END AS cs_bill_addr_sk"""),
    "web_sales": _sales("ws", 2, "ws_bill_customer_sk",
                        "1 + l_suppkey % 10 AS ws_web_page_sk",
                        "ws_order_number",
                        extra_cols=""",
         CASE WHEN (o_orderkey * 17 + l_partkey) % 47 = 0 THEN NULL
              WHEN (o_orderkey + l_partkey) % 7 = 0 THEN 1 + l_suppkey
              ELSE o_custkey END AS ws_bill_addr_sk"""),
    "store_returns": _returns("sr", 0, "1 + l_suppkey % 8 AS sr_store_sk",
                              "sr_return_amt_cents", "sr_ticket_number"),
    "catalog_returns": _returns("cr", 1,
                                "1 + l_suppkey % 4 AS cr_call_center_sk",
                                "cr_return_amount_cents"),
    "web_returns": _returns("wr", 2, "1 + l_suppkey % 10 AS wr_web_page_sk",
                            "wr_return_amt_cents"),
    "item": """(
  SELECT p_partkey AS i_item_sk,
         concat('ITEM', lpad(CAST(p_partkey AS {VSTR}), 8, '0')) AS i_item_id,
         p_name AS i_item_desc,
         p_name AS i_product_name,
         p_brand AS i_brand,
         CAST(substr(p_brand, 7) AS INT) AS i_brand_id,
         p_type AS i_category,
         CAST(length(p_type) * 31 + ascii(substr(p_type, 1, 1)) AS INT)
             AS i_category_id,
         concat('class_', CAST(p_size % 5 AS {VSTR})) AS i_class,
         1 + p_partkey % 50 AS i_manufact_id,
         concat('manufact_', CAST(1 + p_partkey % 50 AS {VSTR})) AS i_manufact,
         1 + p_partkey % 20 AS i_manager_id,
         CAST(floor(p_retailprice * 100) AS BIGINT) AS i_current_price_cents,
         CAST(floor(p_retailprice * 60) AS BIGINT) AS i_wholesale_cost_cents,
         CAST(p_size % 5 AS INT) AS i_class_id,
         split_part(p_name, ' ', 1) AS i_color,
         CASE p_size % 6 WHEN 0 THEN 'small' WHEN 1 THEN 'medium'
              WHEN 2 THEN 'large' WHEN 3 THEN 'extra large'
              WHEN 4 THEN 'economy' ELSE 'petite' END AS i_size,
         CASE p_partkey % 5 WHEN 0 THEN 'Each' WHEN 1 THEN 'Dozen'
              WHEN 2 THEN 'Case' WHEN 3 THEN 'Pallet'
              ELSE 'Unknown' END AS i_units
  FROM part)""",
    "customer_dim": """(
  SELECT c_custkey AS c_customer_sk,
         c_name AS c_customer_id,
         1 + c_custkey % 100 AS c_current_cdemo_sk,
         1 + c_custkey % 50 AS c_current_hdemo_sk,
         c_custkey AS c_current_addr_sk,
         'Customer' AS c_first_name,
         substr(c_name, 10) AS c_last_name,
         CASE WHEN c_custkey % 2 = 0 THEN 'Y' ELSE 'N' END
             AS c_preferred_cust_flag,
         CASE WHEN c_custkey % 4 = 1 THEN 'UNITED STATES'
              ELSE concat('country_', CAST(c_nationkey AS {VSTR})) END
             AS c_birth_country,
         concat('login_', CAST(c_custkey AS {VSTR})) AS c_login,
         concat('cust', CAST(c_custkey AS {VSTR}), '@example.com')
             AS c_email_address,
         CASE c_custkey % 6 WHEN 0 THEN 'Mr.' WHEN 1 THEN 'Mrs.'
              WHEN 2 THEN 'Ms.' WHEN 3 THEN 'Dr.' WHEN 4 THEN 'Miss'
              ELSE 'Sir' END AS c_salutation,
         1 + c_custkey % 28 AS c_birth_day,
         1 + c_custkey % 12 AS c_birth_month,
         1924 + c_custkey % 68 AS c_birth_year,
         CAST(2450000 + c_custkey % 1000 AS {VSTR}) AS c_last_review_date,
         f.c_first_sales_date_sk,
         f.c_first_shipto_date_sk
  FROM customer LEFT JOIN (
    SELECT o_custkey,
           MIN({D_ORDER}) AS c_first_sales_date_sk,
           MIN({D_SHIP}) AS c_first_shipto_date_sk
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_custkey) f ON c_custkey = f.o_custkey)""",
    "customer_address": """(
  SELECT c_custkey AS ca_address_sk,
         concat('S', lpad(CAST(c_nationkey AS {VSTR}), 2, '0')) AS ca_state,
         concat('county_', CAST(c_nationkey % 8 AS {VSTR})) AS ca_county,
         concat('city_', CAST(c_custkey % 40 AS {VSTR})) AS ca_city,
         CASE WHEN c_custkey % 11 = 7
              THEN lpad(CAST(10000 + (1 + c_custkey % 8) * 1111 AS {VSTR}),
                        5, '0')
              ELSE lpad(CAST(10000 + (c_custkey * 37) % 90000 AS {VSTR}),
                        5, '0') END AS ca_zip,
         CASE WHEN c_nationkey % 2 = 0 THEN -5 ELSE -6 END AS ca_gmt_offset,
         CAST(100 + c_custkey % 900 AS {VSTR}) AS ca_street_number,
         concat('street_', CAST(c_custkey % 30 AS {VSTR})) AS ca_street_name,
         CASE WHEN c_custkey % 2 = 0 THEN 'Ave' ELSE 'Blvd' END
             AS ca_street_type,
         concat('Suite ', CAST((c_custkey * 7) % 100 AS {VSTR}))
             AS ca_suite_number,
         'United States' AS ca_country,
         CASE c_custkey % 3 WHEN 0 THEN 'apartment' WHEN 1 THEN 'condo'
              ELSE 'single family' END AS ca_location_type
  FROM customer)""",
    "customer_demographics": """(
  SELECT cd_demo_sk,
         CASE WHEN cd_demo_sk % 2 = 0 THEN 'M' ELSE 'F' END AS cd_gender,
         CASE cd_demo_sk % 5 WHEN 0 THEN 'M' WHEN 1 THEN 'S' WHEN 2 THEN 'D'
              WHEN 3 THEN 'W' ELSE 'U' END AS cd_marital_status,
         CASE cd_demo_sk % 4 WHEN 0 THEN 'Primary' WHEN 1 THEN 'Secondary'
              WHEN 2 THEN 'College' ELSE 'Advanced Degree' END
             AS cd_education_status,
         500 * (1 + cd_demo_sk % 20) AS cd_purchase_estimate,
         cd_demo_sk % 7 AS cd_dep_count,
         (cd_demo_sk * 3) % 6 AS cd_dep_employed_count,
         (cd_demo_sk * 7) % 4 AS cd_dep_college_count,
         CASE cd_demo_sk % 4 WHEN 0 THEN 'Good' WHEN 1 THEN 'High Risk'
              WHEN 2 THEN 'Low Risk' ELSE 'Unknown' END AS cd_credit_rating
  FROM (SELECT DISTINCT 1 + c_custkey % 100 AS cd_demo_sk FROM customer) d)""",
    "household_demographics": """(
  SELECT hd_demo_sk,
         CASE hd_demo_sk % 6 WHEN 0 THEN '>10000' WHEN 1 THEN '5001-10000'
              WHEN 2 THEN '1001-5000' WHEN 3 THEN '501-1000'
              WHEN 4 THEN '101-500' ELSE 'Unknown' END AS hd_buy_potential,
         hd_demo_sk % 10 AS hd_dep_count,
         hd_demo_sk % 5 AS hd_vehicle_count,
         1 + hd_demo_sk % 20 AS hd_income_band_sk
  FROM (SELECT DISTINCT 1 + c_custkey % 50 AS hd_demo_sk FROM customer) h)""",
    "income_band": """(
  SELECT ib_income_band_sk,
         (ib_income_band_sk - 1) * 10000 AS ib_lower_bound,
         ib_income_band_sk * 10000 - 1 AS ib_upper_bound
  FROM (SELECT DISTINCT 1 + (1 + c_custkey % 50) % 20 AS ib_income_band_sk
        FROM customer) b)""",
    "store": """(
  SELECT s_store_sk,
         concat('STORE', lpad(CAST(s_store_sk AS {VSTR}), 4, '0')) AS s_store_id,
         concat('store_', CAST(s_store_sk AS {VSTR})) AS s_store_name,
         concat('company_', CAST(s_store_sk % 3 AS {VSTR}))
             AS s_company_name,
         concat('county_', CAST(s_store_sk % 4 AS {VSTR})) AS s_county,
         concat('city_', CAST(s_store_sk % 3 AS {VSTR})) AS s_city,
         concat('S', lpad(CAST(s_store_sk % 5 AS {VSTR}), 2, '0')) AS s_state,
         100 + CAST(s_store_sk AS INT) * 25 AS s_number_employees,
         CAST(s_store_sk % 3 AS INT) AS s_company_id,
         CAST(100 + s_store_sk * 7 AS {VSTR}) AS s_street_number,
         concat('street_', CAST(s_store_sk % 6 AS {VSTR})) AS s_street_name,
         CASE WHEN s_store_sk % 2 = 0 THEN 'Ave' ELSE 'Blvd' END
             AS s_street_type,
         concat('Suite ', CAST(s_store_sk * 10 AS {VSTR})) AS s_suite_number,
         lpad(CAST(10000 + s_store_sk * 1111 AS {VSTR}), 5, '0') AS s_zip,
         CASE WHEN s_store_sk % 2 = 0 THEN -5 ELSE -6 END AS s_gmt_offset,
         CAST(1 + s_store_sk % 10 AS INT) AS s_market_id
  FROM (SELECT DISTINCT 1 + s_suppkey % 8 AS s_store_sk FROM supplier) s)""",
    "call_center": """(
  SELECT cc_call_center_sk,
         concat('CC', lpad(CAST(cc_call_center_sk AS {VSTR}), 4, '0'))
             AS cc_call_center_id,
         concat('cc_', CAST(cc_call_center_sk AS {VSTR})) AS cc_name,
         concat('manager_', CAST(cc_call_center_sk % 7 AS {VSTR}))
             AS cc_manager,
         concat('county_', CAST(cc_call_center_sk % 4 AS {VSTR}))
             AS cc_county
  FROM (SELECT DISTINCT 1 + s_suppkey % 4 AS cc_call_center_sk
        FROM supplier) c)""",
    "catalog_page": """(
  SELECT cp_catalog_page_sk,
         concat('PAGE', lpad(CAST(cp_catalog_page_sk AS {VSTR}), 4, '0'))
             AS cp_catalog_page_id
  FROM (SELECT DISTINCT 1 + p_partkey % 20 AS cp_catalog_page_sk
        FROM part) p)""",
    "web_page": """(
  SELECT wp_web_page_sk,
         concat('page_', CAST(wp_web_page_sk AS {VSTR})) AS wp_url,
         CAST(5000 + wp_web_page_sk * 25 AS INT) AS wp_char_count
  FROM (SELECT DISTINCT 1 + s_suppkey % 10 AS wp_web_page_sk
        FROM supplier) w)""",
    "promotion": """(
  SELECT p_promo_sk,
         concat('promo_', CAST(p_promo_sk AS {VSTR})) AS p_promo_name,
         CASE WHEN p_promo_sk % 3 = 0 THEN 'Y' ELSE 'N' END AS p_channel_email,
         CASE WHEN p_promo_sk % 4 = 0 THEN 'Y' ELSE 'N' END AS p_channel_event,
         CASE WHEN p_promo_sk % 2 = 0 THEN 'Y' ELSE 'N' END AS p_channel_dmail,
         CASE WHEN p_promo_sk % 5 = 0 THEN 'Y' ELSE 'N' END AS p_channel_tv
  FROM (SELECT DISTINCT 1 + p_partkey % 30 AS p_promo_sk FROM part) p)""",
    "warehouse": """(
  SELECT w_warehouse_sk,
         concat('warehouse_', CAST(w_warehouse_sk AS {VSTR}))
             AS w_warehouse_name,
         1000 * CAST(w_warehouse_sk AS INT) AS w_warehouse_sq_ft,
         concat('city_', CAST(w_warehouse_sk % 3 AS {VSTR})) AS w_city,
         concat('county_', CAST(w_warehouse_sk % 4 AS {VSTR})) AS w_county,
         concat('S', lpad(CAST(w_warehouse_sk % 5 AS {VSTR}), 2, '0'))
             AS w_state,
         'UNITED STATES' AS w_country
  FROM (SELECT DISTINCT 1 + s_suppkey % 5 AS w_warehouse_sk
        FROM supplier) w)""",
    "ship_mode": """(
  SELECT sm_ship_mode_sk,
         CASE sm_ship_mode_sk WHEN 1 THEN 'EXPRESS' WHEN 2 THEN 'OVERNIGHT'
              WHEN 3 THEN 'REGULAR' WHEN 4 THEN 'TWO DAY'
              ELSE 'LIBRARY' END AS sm_type,
         concat('carrier_', CAST(sm_ship_mode_sk AS {VSTR})) AS sm_carrier
  FROM (SELECT DISTINCT 1 + (l_orderkey + l_suppkey) % 5 AS sm_ship_mode_sk
        FROM lineitem) m)""",
    "web_site": """(
  SELECT web_site_sk,
         concat('site_', CAST(web_site_sk AS {VSTR})) AS web_name,
         concat('WEB', lpad(CAST(web_site_sk AS {VSTR}), 4, '0'))
             AS web_site_id,
         CASE WHEN web_site_sk % 2 = 0 THEN 'pri' ELSE 'able' END
             AS web_company_name
  FROM (SELECT DISTINCT 1 + s_suppkey % 6 AS web_site_sk FROM supplier) w)""",
    "reason": """(
  SELECT r_reason_sk,
         concat('reason ', CAST(r_reason_sk AS {VSTR})) AS r_reason_desc
  FROM (SELECT DISTINCT 1 + (o_orderkey + l_partkey) % 10 AS r_reason_sk
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey) r)""",
    "inventory": """(
  SELECT {D_SHIP} AS inv_date_sk,
         l_partkey AS inv_item_sk,
         1 + l_suppkey % 5 AS inv_warehouse_sk,
         CAST(l_quantity AS INT) * 10 AS inv_quantity_on_hand
  FROM lineitem)""",
    "time_dim": f"""(
  SELECT t_time_sk,
         t_time_sk AS t_time,
         CAST(floor(t_time_sk / 3600.0) AS INT) AS t_hour,
         CAST(floor((t_time_sk % 3600) / 60.0) AS INT) AS t_minute,
         CASE WHEN floor(t_time_sk / 3600.0) BETWEEN 6 AND 8
              THEN 'breakfast'
              WHEN floor(t_time_sk / 3600.0) BETWEEN 17 AND 19
              THEN 'dinner' END AS t_meal_time
  FROM (SELECT DISTINCT {_TIME_SK} AS t_time_sk FROM {_LI_ORD}) t)""",
}

#: base TPC-H views each shim table reads
_BASE = ("lineitem", "orders", "part", "customer", "supplier")

#: shim tables derived from the BIG base tables (lineitem/orders scans).
#: On Spark these are materialized to temp parquet ONCE per
#: (application, sf_dir) instead of being re-inlined as CTEs per
#: reference — q23a references store_sales three times and would
#: otherwise recompute the lineitem x orders join three times in one
#: query (and every query re-derives date_dim's three scans). At a real
#: SF the shim derivation IS an ETL step; parquet materialization keeps
#: predicate pushdown + column pruning on the derived facts, which a
#: cached-view approach would lose. Small dims (from part/customer/
#: supplier, kB-sized) stay inline CTEs — they broadcast anyway.
_MATERIALIZED = frozenset({
    "store_sales", "catalog_sales", "web_sales",
    "store_returns", "catalog_returns", "web_returns",
    "inventory", "date_dim", "time_dim", "reason", "ship_mode",
    # customer_dim carries first-sale/first-ship date sks (min over the
    # customer's lineitem x orders rows) since round 7 — big derivation
    "customer_dim",
})

#: (applicationId, abs sf_dir) -> (shared SparkSession, set of
#: shim tables already materialized+registered in it)
_SHIM_STATE: dict = {}


def _repo_root() -> str:
    import os

    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _shim_session(spark, sf_dir):
    """Shared child session per (app, sf_dir) holding the TPC-H base
    views and any already-materialized shim tables."""
    import os

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    st = _SHIM_STATE.get(key)
    if st is None:
        s = spark.newSession()  # isolated temp-view catalog (engine-traps)
        register_views(s, sf_dir, *_BASE)
        st = (s, set())
        _SHIM_STATE[key] = st
    return st


_ORPHAN_GRACE_SEC = 3600.0  # markerless dirs are reapable only by age


def _proc_start_time(pid: int):
    """Kernel start-time of a live pid (clock ticks; /proc/<pid>/stat
    field 22), or None. Lets the reaper distinguish a pid-reuse
    impostor from the process that actually wrote an OWNER marker."""
    try:
        with open("/proc/%d/stat" % pid, "rb") as f:
            data = f.read()
        # comm (field 2) may contain spaces/parens; real fields resume
        # after the LAST ')' — starttime is the 20th of those.
        return int(data.rsplit(b")", 1)[1].split()[19])
    except (OSError, IndexError, ValueError):
        return None


def _owner_alive(appdir: str) -> bool:
    """Liveness of the application that owns a shim app-dir.

    Ownership is an explicit ``OWNER`` marker (``<pid> <starttime>``)
    written by the dir's creator — never parsed out of the dir name,
    so pid-reuse (marker pid now belongs to an unrelated process with
    a different /proc start-time) and foreign dir-name formats (e.g.
    standalone ``app-...-0001``) cannot pin a dead app's data forever.
    A dir with no readable marker (mid-creation by a sibling, or
    legacy layout) is protected only while younger than the orphan
    grace period."""
    import os
    import time

    try:
        with open(os.path.join(appdir, "OWNER")) as f:
            parts = f.read().split()
        pid = int(parts[0])
        start = parts[1] if len(parts) > 1 else "?"
    except (OSError, ValueError, IndexError):
        try:
            age = time.time() - os.path.getmtime(appdir)
        except OSError:
            return True  # vanished mid-scan: a concurrent reaper won
        return age < _ORPHAN_GRACE_SEC
    if not _pid_alive(pid):
        return False
    if start != "?":
        cur = _proc_start_time(pid)
        if cur is not None and str(cur) != start:
            return False  # pid reused by an unrelated live process
    return True


def _pid_alive(pid: int) -> bool:
    """True if a process with this pid exists (EPERM counts as alive).
    Non-positive pids address process groups, not a process — reject."""
    import os

    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    except (OverflowError, ValueError):
        return False
    return True


def _ensure_materialized(s, done: set, sf_dir: str, tables: list) -> None:
    """Write each not-yet-done shim table to temp parquet under the repo
    (.tpcds_shim/<appId>-<pid>/<sf>/<table>) and register it as a temp
    view.

    Concurrency contract (round-8 fix for the cross-application rmtree
    race, hardened round 9): each application writes ONLY under its own
    ``<applicationId>-<pid>`` directory and stamps it with an ``OWNER``
    marker (``<pid> <starttime>``); stale-dir reaping consults the
    marker — never the dir name — and skips any sibling whose marker
    names a live process with a matching /proc start-time. A concurrent
    Spark application (pytest + bench, driver + builder, CI shards) on
    the same checkout is never touched while its process exists; dead
    apps' leftovers are reclaimed even under pid reuse, and markerless
    dirs fall back to age-based reaping (see ``_owner_alive``). A table
    is also re-materialized if its parquet dir vanished out from under
    us (the in-memory ``done`` set is not trusted over the filesystem:
    we require the writer's _SUCCESS marker)."""
    import os
    import shutil

    base = os.path.join(_repo_root(), ".tpcds_shim")
    os.makedirs(base, exist_ok=True)
    app = s.sparkContext.applicationId
    mine = "%s-%d" % (app, os.getpid())
    root = os.path.join(base, mine,
                        os.path.basename(os.path.abspath(sf_dir)))
    todo = [
        t for t in tables
        if t not in done
        or not os.path.isfile(os.path.join(root, t, "_SUCCESS"))
    ]
    if not todo:
        return
    owner_dir = os.path.join(base, mine)
    os.makedirs(owner_dir, exist_ok=True)
    marker = os.path.join(owner_dir, "OWNER")
    if not os.path.isfile(marker):
        st = _proc_start_time(os.getpid())
        tmp = "%s.tmp.%d" % (marker, os.getpid())
        with open(tmp, "w") as f:
            f.write("%d %s" % (os.getpid(), "?" if st is None else st))
        os.replace(tmp, marker)
    for old in os.listdir(base):
        if old == mine:
            continue
        old_path = os.path.join(base, old)
        if not os.path.isdir(old_path):
            # stray plain file (crashed writer's tmp, manual debris):
            # rmtree would fail-and-swallow on it forever; remove directly
            try:
                os.remove(old_path)
            except OSError:
                pass
            continue
        if _owner_alive(old_path):
            continue  # a live application's data — never delete it
        shutil.rmtree(old_path, ignore_errors=True)
    d = _DIALECT["spark"]
    for t in todo:
        path = os.path.join(root, t)
        df = s.sql("SELECT * FROM " + _SHIM[t].format(**d))
        df.write.mode("overwrite").parquet(path)
        s.read.parquet(path).createOrReplaceTempView(t)
        done.add(t)


def _with_clause(tables: list[str], engine: str, extra: str = "") -> str:
    """WITH clause containing the given shim tables (dialect-expanded),
    plus optional query-local CTEs appended verbatim (already expanded)."""
    d = _DIALECT[engine]
    parts = [
        f"{t} AS {d['MAT']} {_SHIM[t].format(**d)}" for t in tables
    ]
    if extra:
        parts.append(extra.format(**d))
    if not parts:
        return ""
    return "WITH " + ",\n".join(parts) + "\n"


# ---------------------------------------------------------------------------
# Fidelity tiers (round-9 verdict item): how close each executable query is
# to the reference's corpus text (src/test/resources/tpcds-flow-tests/inputs).
# Machine-readable; _tpcds refuses to register an unclassified query and
# stamps the tier as a "fidelity:<tier>" registry tag.
#
# - verbatim-dialect: join graph, predicate shape, grain and selectivity
#   roles unchanged. Only cross-engine dialect normalizations (exact-cents
#   arithmetic, CAST-to-BIGINT HUGEINT pins, INTERVAL endpoints folded to
#   literal dates, spelled-out avg/stddev, alias hygiene, deterministic
#   sort tiebreaks/COALESCE) and 1:1 relabels of categorical literals into
#   the derived domains (state/category/store/manager/reason codes, year
#   shifts into the derived 1996-1998 calendar) that keep the same role.
# - param-retuned: at least one NUMERIC threshold, band, window, gate or
#   anchor was re-chosen because the reference value is degenerate on the
#   derived data (empty or select-all) — predicate and join shapes kept.
# - structure-adapted: a join edge, grain, or clause was structurally
#   replaced because the reference form is unsatisfiable in the derived
#   schema (each docstring carries the exact substitution).
_FIDELITY_TIERS = ("verbatim-dialect", "param-retuned", "structure-adapted")

FIDELITY: dict[str, str] = {
    # --- verbatim-dialect ---------------------------------------------
    **{n: "verbatim-dialect" for n in [
        "tpcds_q1", "tpcds_q2", "tpcds_q3", "tpcds_q4", "tpcds_q5",
        "tpcds_q7", "tpcds_q10", "tpcds_q11", "tpcds_q12", "tpcds_q16",
        "tpcds_q18", "tpcds_q20", "tpcds_q22", "tpcds_q26", "tpcds_q27",
        "tpcds_q30", "tpcds_q31", "tpcds_q32", "tpcds_q33", "tpcds_q35",
        "tpcds_q36", "tpcds_q38", "tpcds_q41", "tpcds_q42", "tpcds_q43",
        "tpcds_q44", "tpcds_q45", "tpcds_q46", "tpcds_q47", "tpcds_q49",
        "tpcds_q50", "tpcds_q51", "tpcds_q52", "tpcds_q53", "tpcds_q54",
        "tpcds_q55", "tpcds_q56", "tpcds_q57", "tpcds_q60", "tpcds_q61",
        "tpcds_q62", "tpcds_q63", "tpcds_q66", "tpcds_q67", "tpcds_q68",
        "tpcds_q69", "tpcds_q70", "tpcds_q71", "tpcds_q73", "tpcds_q74",
        "tpcds_q76", "tpcds_q77", "tpcds_q79", "tpcds_q81", "tpcds_q86",
        "tpcds_q87", "tpcds_q88", "tpcds_q89", "tpcds_q90", "tpcds_q91",
        "tpcds_q92", "tpcds_q93", "tpcds_q95", "tpcds_q96", "tpcds_q97",
        "tpcds_q98", "tpcds_q99", "tpcds_q14a", "tpcds_q19",
        "tpcds_q59",
        # r16 promotions (reference numeric literals restored and
        # re-probed non-degenerate at all 3 SFs; see docstrings):
        "tpcds_q65", "tpcds_q84",
    ]},
    # --- param-retuned -------------------------------------------------
    # (numeric thresholds/bands/windows/gates re-chosen for the derived
    # data's density or cents domain; see each docstring for the values)
    **{n: "param-retuned" for n in [
        "tpcds_q6", "tpcds_q8", "tpcds_q9", "tpcds_q13", "tpcds_q14b",
        "tpcds_q15", "tpcds_q17", "tpcds_q21", "tpcds_q23a", "tpcds_q23b",
        "tpcds_q24a", "tpcds_q24b",
        "tpcds_q25", "tpcds_q28", "tpcds_q29", "tpcds_q34", "tpcds_q37",
        "tpcds_q39a", "tpcds_q39b", "tpcds_q40", "tpcds_q48", "tpcds_q58",
        "tpcds_q72", "tpcds_q75", "tpcds_q80", "tpcds_q82",
        "tpcds_q83", "tpcds_q85", "tpcds_q94",
    ]},
    # --- structure-adapted ----------------------------------------------
    # q64: cd1<>cd2 marital -> '='; HAVING sale>2*refund -> sale>refund;
    #      18-relation FROM decomposed into layered CTEs
    # q78: grain coarsened item x customer x year -> customer x year
    # (q24a/b were here through round 8; the round-9 birth-country
    # mirror + zip co-grid shim columns let the reference's join edges
    # run verbatim — only the color literal remains retuned. q19 and
    # q59 left in round 10: the zip co-grid satisfies q19's
    # substr-zip-prefix edge verbatim, and q59's duplicate-row fan-out
    # is multiset-deterministic as-is, so the GROUP BY normalization
    # was dropped.)
    **{n: "structure-adapted" for n in [
        "tpcds_q64", "tpcds_q78",
    ]},
}


#: r16 promotion-pass ledger (r15 verdict item #3): every param-retuned
#: query was re-probed against the REFERENCE numeric literal at all
#: three SFs (DuckDB side; counts are sf0.001/sf0.01/sf0.1 rows).
#: "domain" = the reference value lies outside the derived value domain
#: (cents bands, derived id/category/color spaces), so no reference
#: value exists to promote; "degenerate" = the reference value re-ran
#: and still yields empty/NULL results at the oracle-gated SFs.
FIDELITY_NOTES: dict[str, str] = {
    "tpcds_q65": "PROMOTED r16 — reference 0.1 threshold: 17/100/100",
    "tpcds_q84": "PROMOTED r16 — reference 38128 floor: 22/100/100",
    "tpcds_q6": "degenerate — ref 1.2x mult: 0/0/0 (derived price band "
                "mean*1.2 > band max); ref HAVING 10: 0/0/15",
    "tpcds_q8": "gate (>10 preferred) IS the reference's; the 2-char "
                "zip-prefix cohort unit is the derived-domain adaptation",
    "tpcds_q9": "degenerate — reference row-count gates target SF100 "
                "cardinalities (rigged 0/10^15 so both branches run)",
    "tpcds_q13": "domain — dollar bands vs derived cents domains",
    "tpcds_q14b": "degenerate — ref Dec 11 anchor week: 0/0/42 (empty at "
                  "both oracle-gated small SFs)",
    "tpcds_q15": "domain — zip/state literals + $500 floor vs derived "
                 "domains ($500 selects everything)",
    "tpcds_q17": "degenerate — best single-quarter anchor (ref shape): "
                 "1/0/0 across all 12 derived quarters",
    "tpcds_q21": "domain — price band vs derived cents domain",
    "tpcds_q23a": "degenerate — ref item-day gate >4: NULL at all SFs "
                  "(re-probed r16; >2 also NULL)",
    "tpcds_q23b": "degenerate — ref gate >4: 0 rows at all SFs",
    "tpcds_q24a": "only the color literal remains retuned; ref 'pale' "
                  "is not a derived first-word color (0/0/0). The 0.05 "
                  "threshold is the reference's",
    "tpcds_q24b": "as q24a; ref 'chiffon': 0/0/0",
    "tpcds_q25": "degenerate — ref single-month-anchor shape: best "
                 "anchor 1/0/0 across all 36 derived (year, month)",
    "tpcds_q28": "domain — six quantity-band cents windows vs derived "
                 "cents domains",
    "tpcds_q29": "degenerate — same single-month-anchor family as q25",
    "tpcds_q34": "degenerate — ref 15-20 lines/ticket: 0/0/0 (derived "
                 "orders average ~1.3 store-channel lines)",
    "tpcds_q37": "domain (band) — r16: band re-anchored at the domain "
                 "floor so sf0.001 populates (10/35/100)",
    "tpcds_q39a": "degenerate — ref inner cov gate >1: 0/0/0",
    "tpcds_q39b": "degenerate — ref inner cov gate >1: 0/0/0",
    "tpcds_q40": "domain (band) — r16: re-anchored, 52/100/100",
    "tpcds_q48": "domain — cents/profit bands vs derived domains",
    "tpcds_q58": "degenerate — no item sells through all three channels "
                 "in any single week at test SFs (carried)",
    "tpcds_q72": "degenerate — ref raw inv < cs_quantity: 0/0/0 (derived "
                 "on-hand is 10x a line quantity)",
    "tpcds_q75": "domain — 'Books' not in the derived six-word category "
                 "domain (1:1 relabel + exact-integer ratio kept)",
    "tpcds_q80": "domain (floor) — r16: floor at domain floor, sf0.001 "
                 "populates (27/34/34)",
    "tpcds_q82": "domain (band) — r16: re-anchored, 4/39/100",
    "tpcds_q83": "degenerate — ref 3-anchor-week cohort needs an item "
                 "returned through ALL three channels inside them",
    "tpcds_q85": "domain — cents band stacks vs derived domains",
    "tpcds_q94": "degenerate — ref 60-day window: (0, NULL, NULL) at "
                 "sf0.001/0.01; non-degenerate at sf0.1 only",
}

#: query name -> TPC-DS tables it consumes (filled by _tpcds at
#: registration; lineage tests map shim-plan leaves back through this)
QUERY_TABLES: dict[str, tuple] = {}


def fidelity_counts() -> dict[str, int]:
    """Tier -> number of registered queries (COVERAGE.md surface)."""
    out = {t: 0 for t in _FIDELITY_TIERS}
    for tier in FIDELITY.values():
        out[tier] += 1
    return out


def _tpcds(name: str, tables: list[str], body: str, doc: str,
           extra: str = "", tags: tuple = ()):
    """Register a TPC-DS query: same SQL text on Spark (shared shim
    session: materialized facts as parquet views, small dims inline) and
    DuckDB (per-query MATERIALIZED CTEs over driver-registered views).
    Extra ``tags`` join the standard "tpcds" tag (e.g. "bench" puts the
    query in bench.py's headline set) and the mandatory fidelity tier
    tag looked up from :data:`FIDELITY` (KeyError on an unclassified
    query — classification is part of registration)."""
    tags = tuple(tags) + ("fidelity:" + FIDELITY[name],)
    QUERY_TABLES[name] = tuple(tables)
    oracle = _with_clause(tables, "duck", extra) + body

    def builder(spark, sf_dir):
        s, done = _shim_session(spark, sf_dir)
        _ensure_materialized(
            s, done, sf_dir, [t for t in tables if t in _MATERIALIZED])
        inline = [t for t in tables if t not in _MATERIALIZED]
        return s.sql(_with_clause(inline, "spark", extra) + body)

    builder.__name__ = name
    builder.__doc__ = doc
    register(name, oracle, "tpcds", *tags)(builder)


# ---------------------------------------------------------------------------
# q3 — date-dim star: brand sales in November for one manufacturer
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q3",
    ["date_dim", "store_sales", "item"],
    """
SELECT dt.d_year, item.i_brand_id AS brand_id, item.i_brand AS brand,
       CAST(SUM(ss_ext_sales_price_cents) AS BIGINT) AS sum_agg_cents
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manufact_id = 28
  AND dt.d_moy = 11
GROUP BY dt.d_year, item.i_brand, item.i_brand_id
ORDER BY dt.d_year, sum_agg_cents DESC, brand_id
LIMIT 100
""",
    "TPC-DS q3 (reference tpcds-flow-tests/inputs/q3.sql): date-dim star "
    "over the derived store_sales fact. LIMIT-safe: the sort key "
    "(year, sum, brand_id) is unique per group.",
)

# ---------------------------------------------------------------------------
# q6 — correlated dim subquery + scalar month lookup
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q6",
    ["customer_address", "customer_dim", "store_sales", "date_dim", "item"],
    """
SELECT a.ca_state AS state, CAST(COUNT(*) AS BIGINT) AS cnt
FROM customer_address a, customer_dim c, store_sales s, date_dim d, item i
WHERE a.ca_address_sk = c.c_current_addr_sk
  AND c.c_customer_sk = s.ss_customer_sk
  AND s.ss_sold_date_sk = d.d_date_sk
  AND s.ss_item_sk = i.i_item_sk
  AND d.d_month_seq =
      (SELECT DISTINCT d_month_seq FROM date_dim
       WHERE d_year = 1998 AND d_moy = 1)
  AND CAST(i.i_current_price_cents AS DOUBLE) > 1.04 *
      (SELECT CAST(SUM(j.i_current_price_cents) AS DOUBLE) / COUNT(*)
       FROM item j WHERE j.i_category = i.i_category)
GROUP BY a.ca_state
HAVING COUNT(*) >= 2
ORDER BY cnt, state
LIMIT 100
""",
    "TPC-DS q6 (reference inputs/q6.sql): customers-by-state whose bought "
    "items price above 1.2x their category average in one month. The "
    "correlated average is written as exact-sum/count (registry "
    "convention); HAVING threshold retuned (10 -> 2) for corpus size and "
    "the price multiplier 1.2 -> 1.04 because the derived price band "
    "(900..999.90) is far narrower than real TPC-DS prices — 1.2x its "
    "mean exceeds its maximum, which would make the query structurally "
    "empty. <= 25 states, so the LIMIT never truncates.",
)

# ---------------------------------------------------------------------------
# q7 — 5-way demographic star with promotion channel filter
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q7",
    ["store_sales", "customer_demographics", "date_dim", "item", "promotion"],
    """
SELECT i_item_id,
       CAST(SUM(ss_quantity) AS DOUBLE) / COUNT(*) AS agg1,
       CAST(SUM(ss_list_price_cents) AS DOUBLE) / COUNT(*) AS agg2,
       CAST(SUM(ss_coupon_amt_cents) AS DOUBLE) / COUNT(*) AS agg3,
       CAST(SUM(ss_sales_price_cents) AS DOUBLE) / COUNT(*) AS agg4
FROM store_sales, customer_demographics, date_dim, item, promotion
WHERE ss_sold_date_sk = d_date_sk
  AND ss_item_sk = i_item_sk
  AND ss_cdemo_sk = cd_demo_sk
  AND ss_promo_sk = p_promo_sk
  AND cd_gender = 'M'
  AND cd_marital_status = 'S'
  AND cd_education_status = 'College'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND d_year = 1998
GROUP BY i_item_id
ORDER BY i_item_id
LIMIT 100
""",
    "TPC-DS q7 (reference inputs/q7.sql): 5-way star over store_sales "
    "with demographic + promotion-channel filters. Averages emitted as "
    "exact-cents-sum / count (single IEEE division, bit-exact both "
    "engines). Sort key i_item_id is the group key: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q11 — WITH-heavy year-over-year growth comparison (4 self-joins)
# ---------------------------------------------------------------------------

_Q11_YT = """year_total AS {MAT} (
  SELECT c_customer_id AS customer_id,
         c_preferred_cust_flag AS customer_preferred_cust_flag,
         d_year AS dyear,
         CAST(SUM(ss_list_price_cents - ss_coupon_amt_cents) AS BIGINT)
             AS year_total_cents,
         's' AS sale_type
  FROM customer_dim, store_sales, date_dim
  WHERE c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_preferred_cust_flag, d_year
  UNION ALL
  SELECT c_customer_id AS customer_id,
         c_preferred_cust_flag AS customer_preferred_cust_flag,
         d_year AS dyear,
         CAST(SUM(ws_list_price_cents - ws_coupon_amt_cents) AS BIGINT)
             AS year_total_cents,
         'w' AS sale_type
  FROM customer_dim, web_sales, date_dim
  WHERE c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_preferred_cust_flag, d_year)"""

_tpcds(
    "tpcds_q11",
    ["customer_dim", "store_sales", "web_sales", "date_dim"],
    """
SELECT t_s_secyear.customer_id,
       t_s_secyear.customer_preferred_cust_flag
FROM year_total t_s_firstyear, year_total t_s_secyear,
     year_total t_w_firstyear, year_total t_w_secyear
WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
  AND t_s_firstyear.sale_type = 's'
  AND t_w_firstyear.sale_type = 'w'
  AND t_s_secyear.sale_type = 's'
  AND t_w_secyear.sale_type = 'w'
  AND t_s_firstyear.dyear = 1998
  AND t_s_secyear.dyear = 1999
  AND t_w_firstyear.dyear = 1998
  AND t_w_secyear.dyear = 1999
  AND t_s_firstyear.year_total_cents > 0
  AND t_w_firstyear.year_total_cents > 0
  AND CAST(t_w_secyear.year_total_cents AS DOUBLE)
      / t_w_firstyear.year_total_cents
      > CAST(t_s_secyear.year_total_cents AS DOUBLE)
        / t_s_firstyear.year_total_cents
ORDER BY t_s_secyear.customer_id
LIMIT 100
""",
    "TPC-DS q11 (reference inputs/q11.sql): customers whose web-channel "
    "spend grew faster than store-channel spend 1998 -> 1999. The "
    "year_total CTE is referenced four times (MATERIALIZED on DuckDB — "
    "the exponential-inlining trap). Growth ratios are single IEEE "
    "divisions of exact cents sums. customer_id is unique: LIMIT-safe.",
    extra=_Q11_YT,
)

# ---------------------------------------------------------------------------
# q21 — inventory quantity pivot around a date
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q21",
    ["inventory", "warehouse", "item", "date_dim"],
    """
SELECT *
FROM (SELECT w_warehouse_name, i_item_id,
             CAST(SUM(CASE WHEN d_date < DATE '1999-03-11'
                           THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT)
                 AS inv_before,
             CAST(SUM(CASE WHEN d_date >= DATE '1999-03-11'
                           THEN inv_quantity_on_hand ELSE 0 END) AS BIGINT)
                 AS inv_after
      FROM inventory, warehouse, item, date_dim
      WHERE i_current_price_cents BETWEEN 90000 AND 93000
        AND i_item_sk = inv_item_sk
        AND inv_warehouse_sk = w_warehouse_sk
        AND inv_date_sk = d_date_sk
        AND d_date BETWEEN DATE '1999-02-09' AND DATE '1999-04-10'
      GROUP BY w_warehouse_name, i_item_id) x
WHERE (CASE WHEN inv_before > 0
            THEN CAST(inv_after AS DOUBLE) / inv_before
            ELSE NULL END) BETWEEN 2.0 / 3.0 AND 3.0 / 2.0
ORDER BY w_warehouse_name, i_item_id
LIMIT 100
""",
    "TPC-DS q21 (reference inputs/q21.sql): warehouse inventory balance "
    "in a +-30-day window around a pivot date. The +-30-day interval "
    "arithmetic is pre-folded into literals (cross-engine INTERVAL "
    "syntax differs); price band retuned to the derived cents domain. "
    "(warehouse, item) group key is the sort key: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q34 — ticket line-count buckets joined back to customers
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q34",
    ["store_sales", "date_dim", "store", "household_demographics",
     "customer_dim"],
    """
SELECT c_last_name, c_first_name, c_preferred_cust_flag,
       ss_ticket_number, cnt
FROM (SELECT ss_ticket_number, ss_customer_sk,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND (date_dim.d_dom BETWEEN 1 AND 3
             OR date_dim.d_dom BETWEEN 25 AND 28)
        AND (household_demographics.hd_buy_potential = '>10000'
             OR household_demographics.hd_buy_potential = 'Unknown')
        AND household_demographics.hd_vehicle_count > 0
        AND (CASE WHEN household_demographics.hd_vehicle_count > 0
                  THEN CAST(household_demographics.hd_dep_count AS DOUBLE)
                       / household_demographics.hd_vehicle_count
                  ELSE NULL END) > 1.2
        AND date_dim.d_year IN (1998, 1999, 2000)
        AND store.s_county IN ('county_1', 'county_2')
      GROUP BY ss_ticket_number, ss_customer_sk) dn, customer_dim
WHERE ss_customer_sk = c_customer_sk
  AND cnt BETWEEN 2 AND 5
""",
    "TPC-DS q34 (reference inputs/q34.sql): store tickets with 2-5 lines "
    "bought by high-buy-potential households early/late in the month, "
    "joined back to customer names. County names and the count bucket "
    "(15-20 -> 2-5) retuned to the derived data (orders average ~1.3 "
    "store-channel lines). No LIMIT: hash is order-insensitive.",
)

# ---------------------------------------------------------------------------
# q51 — cumulative-window FULL OUTER comparison of web vs store
# ---------------------------------------------------------------------------

_Q51_CTES = """web_v1 AS {MAT} (
  SELECT ws_item_sk AS item_sk, d_date,
         SUM(SUM(ws_sales_price_cents))
             OVER (PARTITION BY ws_item_sk ORDER BY d_date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cume_sales
  FROM web_sales, date_dim
  WHERE ws_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 23976 AND 23987
    AND ws_item_sk IS NOT NULL
  GROUP BY ws_item_sk, d_date),
store_v1 AS {MAT} (
  SELECT ss_item_sk AS item_sk, d_date,
         SUM(SUM(ss_sales_price_cents))
             OVER (PARTITION BY ss_item_sk ORDER BY d_date
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cume_sales
  FROM store_sales, date_dim
  WHERE ss_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 23976 AND 23987
    AND ss_item_sk IS NOT NULL
  GROUP BY ss_item_sk, d_date)"""

_tpcds(
    "tpcds_q51",
    ["web_sales", "store_sales", "date_dim"],
    """
SELECT item_sk, d_date,
       CAST(web_sales AS BIGINT) AS web_sales,
       CAST(store_sales AS BIGINT) AS store_sales,
       CAST(web_cumulative AS BIGINT) AS web_cumulative,
       CAST(store_cumulative AS BIGINT) AS store_cumulative
FROM (SELECT item_sk, d_date, web_sales, store_sales,
             MAX(web_sales)
                 OVER (PARTITION BY item_sk ORDER BY d_date
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS web_cumulative,
             MAX(store_sales)
                 OVER (PARTITION BY item_sk ORDER BY d_date
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS store_cumulative
      FROM (SELECT CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk
                        ELSE store.item_sk END AS item_sk,
                   CASE WHEN web.d_date IS NOT NULL THEN web.d_date
                        ELSE store.d_date END AS d_date,
                   web.cume_sales AS web_sales,
                   store.cume_sales AS store_sales
            FROM web_v1 web FULL OUTER JOIN store_v1 store
                 ON web.item_sk = store.item_sk
                AND web.d_date = store.d_date) x) y
WHERE web_cumulative > store_cumulative
ORDER BY item_sk, d_date
LIMIT 100
""",
    "TPC-DS q51 (reference inputs/q51.sql): per-item cumulative web vs "
    "store sales (1998), FULL OUTER joined and compared with running-max "
    "windows. DuckDB window sums widen to HUGEINT — every output is "
    "CAST back to BIGINT. (item, date) sort key unique: LIMIT-safe.",
    extra=_Q51_CTES,
)

# ---------------------------------------------------------------------------
# q59 — weekly sales pivot, 52-week self-join across years
# ---------------------------------------------------------------------------

_Q59_WSS = """wss AS {MAT} (
  SELECT d_week_seq, ss_store_sk,
         SUM(CASE WHEN d_day_name = 'Sunday'
                  THEN ss_sales_price_cents ELSE NULL END) AS sun_sales,
         SUM(CASE WHEN d_day_name = 'Monday'
                  THEN ss_sales_price_cents ELSE NULL END) AS mon_sales,
         SUM(CASE WHEN d_day_name = 'Tuesday'
                  THEN ss_sales_price_cents ELSE NULL END) AS tue_sales,
         SUM(CASE WHEN d_day_name = 'Wednesday'
                  THEN ss_sales_price_cents ELSE NULL END) AS wed_sales,
         SUM(CASE WHEN d_day_name = 'Thursday'
                  THEN ss_sales_price_cents ELSE NULL END) AS thu_sales,
         SUM(CASE WHEN d_day_name = 'Friday'
                  THEN ss_sales_price_cents ELSE NULL END) AS fri_sales,
         SUM(CASE WHEN d_day_name = 'Saturday'
                  THEN ss_sales_price_cents ELSE NULL END) AS sat_sales
  FROM store_sales, date_dim
  WHERE d_date_sk = ss_sold_date_sk
  GROUP BY d_week_seq, ss_store_sk)"""

_tpcds(
    "tpcds_q59",
    ["store_sales", "date_dim", "store"],
    """
SELECT s_store_name1, s_store_id1, d_week_seq1,
       CAST(sun_sales1 AS DOUBLE) / sun_sales2 AS sun_ratio,
       CAST(mon_sales1 AS DOUBLE) / mon_sales2 AS mon_ratio,
       CAST(tue_sales1 AS DOUBLE) / tue_sales2 AS tue_ratio,
       CAST(wed_sales1 AS DOUBLE) / wed_sales2 AS wed_ratio,
       CAST(thu_sales1 AS DOUBLE) / thu_sales2 AS thu_ratio,
       CAST(fri_sales1 AS DOUBLE) / fri_sales2 AS fri_ratio,
       CAST(sat_sales1 AS DOUBLE) / sat_sales2 AS sat_ratio
FROM (SELECT s_store_name AS s_store_name1, wss.d_week_seq AS d_week_seq1,
             s_store_id AS s_store_id1,
             sun_sales AS sun_sales1, mon_sales AS mon_sales1,
             tue_sales AS tue_sales1, wed_sales AS wed_sales1,
             thu_sales AS thu_sales1, fri_sales AS fri_sales1,
             sat_sales AS sat_sales1
      FROM wss, store, date_dim d
      WHERE d.d_week_seq = wss.d_week_seq AND ss_store_sk = s_store_sk
        AND d_month_seq BETWEEN 23976 AND 23987) y,
     (SELECT s_store_id AS s_store_id2, wss.d_week_seq AS d_week_seq2,
             sun_sales AS sun_sales2, mon_sales AS mon_sales2,
             tue_sales AS tue_sales2, wed_sales AS wed_sales2,
             thu_sales AS thu_sales2, fri_sales AS fri_sales2,
             sat_sales AS sat_sales2
      FROM wss, store, date_dim d
      WHERE d.d_week_seq = wss.d_week_seq AND ss_store_sk = s_store_sk
        AND d_month_seq BETWEEN 23988 AND 23999) x
WHERE s_store_id1 = s_store_id2
  AND d_week_seq1 = d_week_seq2 - 52
ORDER BY s_store_name1, s_store_id1, d_week_seq1
LIMIT 100
""",
    "TPC-DS q59 (reference inputs/q59.sql): weekly day-of-week sales "
    "pivot per store, self-joined 52 weeks apart (1998 vs 1999) emitting "
    "year-over-year ratios. VERBATIM join/dup semantics since round 10: "
    "the wss/date_dim join fans out one row per calendar day of each "
    "week, and every duplicate row in a (store, week) group is "
    "byte-identical — so the ORDER BY + LIMIT cut is multiset- "
    "deterministic even though the sort key repeats, and the reference "
    "shape runs unmodified (rounds 8-9 normalized the duplicates with a "
    "GROUP BY). Cents sums keep the ratios bit-exact.",
    extra=_Q59_WSS,
)

# ---------------------------------------------------------------------------
# q77 — multi-channel sales/returns ROLLUP
# ---------------------------------------------------------------------------

_Q77_CTES = """ss AS {MAT} (
  SELECT s_store_sk,
         SUM(ss_ext_sales_price_cents) AS sales,
         SUM(ss_net_profit_cents) AS profit
  FROM store_sales, date_dim, store
  WHERE ss_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '1999-08-03' AND DATE '1999-09-02'
    AND ss_store_sk = s_store_sk
  GROUP BY s_store_sk),
sr AS {MAT} (
  SELECT sr_store_sk AS s_store_sk,
         SUM(sr_return_amt_cents) AS returns,
         SUM(sr_net_loss_cents) AS profit_loss
  FROM store_returns, date_dim
  WHERE sr_returned_date_sk = d_date_sk
    AND d_date BETWEEN DATE '1999-08-03' AND DATE '1999-09-02'
  GROUP BY sr_store_sk),
cs AS {MAT} (
  SELECT cs_call_center_sk,
         SUM(cs_ext_sales_price_cents) AS sales,
         SUM(cs_net_profit_cents) AS profit
  FROM catalog_sales, date_dim
  WHERE cs_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '1999-08-03' AND DATE '1999-09-02'
  GROUP BY cs_call_center_sk),
cr AS {MAT} (
  SELECT SUM(cr_return_amount_cents) AS returns,
         SUM(cr_net_loss_cents) AS profit_loss
  FROM catalog_returns, date_dim
  WHERE cr_returned_date_sk = d_date_sk
    AND d_date BETWEEN DATE '1999-08-03' AND DATE '1999-09-02'),
ws AS {MAT} (
  SELECT wp_web_page_sk,
         SUM(ws_ext_sales_price_cents) AS sales,
         SUM(ws_net_profit_cents) AS profit
  FROM web_sales, date_dim, web_page
  WHERE ws_sold_date_sk = d_date_sk
    AND d_date BETWEEN DATE '1999-08-03' AND DATE '1999-09-02'
    AND ws_web_page_sk = wp_web_page_sk
  GROUP BY wp_web_page_sk),
wr AS {MAT} (
  SELECT wr_web_page_sk AS wp_web_page_sk,
         SUM(wr_return_amt_cents) AS returns,
         SUM(wr_net_loss_cents) AS profit_loss
  FROM web_returns, date_dim
  WHERE wr_returned_date_sk = d_date_sk
    AND d_date BETWEEN DATE '1999-08-03' AND DATE '1999-09-02'
  GROUP BY wr_web_page_sk)"""

_tpcds(
    "tpcds_q77",
    ["store_sales", "store_returns", "catalog_sales", "catalog_returns",
     "web_sales", "web_returns", "date_dim", "store", "web_page"],
    """
SELECT channel, id,
       CAST(SUM(sales) AS BIGINT) AS sales,
       CAST(SUM(returns) AS BIGINT) AS returns,
       CAST(SUM(profit) AS BIGINT) AS profit
FROM (SELECT 'store channel' AS channel, ss.s_store_sk AS id,
             sales, COALESCE(returns, 0) AS returns,
             profit - COALESCE(profit_loss, 0) AS profit
      FROM ss LEFT JOIN sr ON ss.s_store_sk = sr.s_store_sk
      UNION ALL
      SELECT 'catalog channel' AS channel, cs_call_center_sk AS id,
             sales, returns, profit - profit_loss AS profit
      FROM cs, cr
      UNION ALL
      SELECT 'web channel' AS channel, ws.wp_web_page_sk AS id,
             sales, COALESCE(returns, 0) AS returns,
             profit - COALESCE(profit_loss, 0) AS profit
      FROM ws LEFT JOIN wr ON ws.wp_web_page_sk = wr.wp_web_page_sk) foo
GROUP BY ROLLUP (channel, id)
ORDER BY channel, id, returns
LIMIT 100
""",
    "TPC-DS q77 (reference inputs/q77.sql): 30-day sales/returns/profit "
    "per channel with a two-level ROLLUP across store, catalog, and web. "
    "All money in exact cents; every SUM CAST back to BIGINT (DuckDB "
    "HUGEINT widening). <= ~26 result rows, so the LIMIT never bites "
    "despite cross-engine NULLS-ordering differences.",
    extra=_Q77_CTES,
)

# ---------------------------------------------------------------------------
# q88 — eight half-hour time-band counts, cross-joined scalars
# ---------------------------------------------------------------------------


def _q88_band(alias: str, hour: int, half: str) -> str:
    cmp = "t_minute >= 30" if half == "late" else "t_minute < 30"
    return f"""(SELECT CAST(COUNT(*) AS BIGINT) AS {alias}
  FROM store_sales, household_demographics, time_dim, store
  WHERE ss_sold_time_sk = time_dim.t_time_sk
    AND ss_hdemo_sk = household_demographics.hd_demo_sk
    AND ss_store_sk = s_store_sk
    AND time_dim.t_hour = {hour} AND {cmp}
    AND ((household_demographics.hd_dep_count = 4
          AND household_demographics.hd_vehicle_count <= 6)
      OR (household_demographics.hd_dep_count = 2
          AND household_demographics.hd_vehicle_count <= 4)
      OR (household_demographics.hd_dep_count = 0
          AND household_demographics.hd_vehicle_count <= 2))
    AND store.s_store_name = 'store_1') {alias}_t"""


_Q88_BODY = "SELECT * FROM\n" + ",\n".join(
    _q88_band(alias, hour, half)
    for alias, hour, half in [
        ("h8_30_to_9", 8, "late"), ("h9_to_9_30", 9, "early"),
        ("h9_30_to_10", 9, "late"), ("h10_to_10_30", 10, "early"),
        ("h10_30_to_11", 10, "late"), ("h11_to_11_30", 11, "early"),
        ("h11_30_to_12", 11, "late"), ("h12_to_12_30", 12, "early"),
    ]
)

_tpcds(
    "tpcds_q88",
    ["store_sales", "household_demographics", "time_dim", "store"],
    _Q88_BODY + "\n",
    "TPC-DS q88 (reference inputs/q88.sql): store traffic counts for "
    "eight half-hour bands (8:30-12:30) for small households at one "
    "store, as eight cross-joined single-row subqueries. Store name "
    "retuned ('ese' -> 'store_1'); the dep/vehicle predicate triplet is "
    "kept verbatim. One deterministic row of eight BIGINT counts.",
)

# ---------------------------------------------------------------------------
# q1 — returns CTE referenced twice + correlated scalar average
# ---------------------------------------------------------------------------

_Q1_CTR = """customer_total_return AS {MAT} (
  SELECT sr_customer_sk AS ctr_customer_sk,
         sr_store_sk AS ctr_store_sk,
         CAST(SUM(sr_return_amt_cents) AS BIGINT) AS ctr_total_return_cents
  FROM store_returns, date_dim
  WHERE sr_returned_date_sk = d_date_sk AND d_year = 1998
  GROUP BY sr_customer_sk, sr_store_sk)"""

_tpcds(
    "tpcds_q1",
    ["store_returns", "date_dim", "store", "customer_dim"],
    """
SELECT c_customer_id
FROM customer_total_return ctr1, store, customer_dim
WHERE CAST(ctr1.ctr_total_return_cents AS DOUBLE) > 1.2 *
      (SELECT CAST(SUM(ctr2.ctr_total_return_cents) AS DOUBLE) / COUNT(*)
       FROM customer_total_return ctr2
       WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
  AND s_store_sk = ctr1.ctr_store_sk
  AND s_state = 'S01'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id
LIMIT 100
""",
    "TPC-DS q1 (reference inputs/q1.sql): customers whose store returns "
    "exceed 1.2x the per-store average — a returns-fact CTE referenced "
    "twice, once inside a correlated scalar subquery (Spark decorrelates "
    "to an aggregate-then-join). avg() written as exact-cents SUM/COUNT; "
    "state 'TN' -> 'S01', d_year 2000 -> 1998 (derived domains). The "
    "single output column IS the sort key, so the LIMIT boundary can "
    "only split identical rows: multiset-safe.",
    extra=_Q1_CTR,
)

# ---------------------------------------------------------------------------
# q19 — brand revenue where customer and store are in different states
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q19",
    ["date_dim", "store_sales", "item", "customer_dim", "customer_address",
     "store"],
    """
SELECT i_brand_id AS brand_id, i_brand AS brand, i_manufact_id, i_manufact,
       CAST(SUM(ss_ext_sales_price_cents) AS BIGINT) AS ext_price_cents
FROM date_dim, store_sales, item, customer_dim, customer_address, store
WHERE d_date_sk = ss_sold_date_sk
  AND ss_item_sk = i_item_sk
  AND i_manager_id = 8
  AND d_moy = 11
  AND d_year = 1998
  AND ss_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND substr(ca_zip, 1, 5) <> substr(s_zip, 1, 5)
  AND ss_store_sk = s_store_sk
GROUP BY i_brand, i_brand_id, i_manufact_id, i_manufact
ORDER BY ext_price_cents DESC, brand, brand_id, i_manufact_id, i_manufact
LIMIT 100
""",
    "TPC-DS q19 (reference inputs/q19.sql): brand revenue from customers "
    "shopping outside their home zip prefix. The reference's "
    "substr(ca_zip,1,5) <> substr(s_zip,1,5) edge runs VERBATIM since "
    "round 10: the round-9 zip co-grid (store zips 10000 + sk*1111; "
    "customers with c_custkey % 11 = 7 mirror one of them) makes the "
    "exclusion non-degenerate — same-zip purchases exist at every SF "
    "(16 pre-filter at sf0.001) and drop out inside the full filter set "
    "at sf0.1. Through round 9 this was structure-adapted "
    "(ca_state <> s_state). Sort key = full group key + sum: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q25 — three-fact chain: store sale -> store return -> catalog re-purchase
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q25",
    ["store_sales", "store_returns", "catalog_sales", "date_dim", "store",
     "item"],
    """
SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
       CAST(SUM(ss_net_profit_cents) AS BIGINT) AS store_sales_profit_cents,
       CAST(SUM(sr_net_loss_cents) AS BIGINT) AS store_returns_loss_cents,
       CAST(SUM(cs_net_profit_cents) AS BIGINT) AS catalog_sales_profit_cents
FROM store_sales, store_returns, catalog_sales,
     date_dim d1, date_dim d2, date_dim d3, store, item
WHERE d1.d_year BETWEEN 1996 AND 1998
  AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk
  AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk
  AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_year BETWEEN 1996 AND 1998
  AND sr_customer_sk = cs_bill_customer_sk
  AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk
  AND d3.d_year BETWEEN 1996 AND 1998
GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
LIMIT 100
""",
    "TPC-DS q25 (reference inputs/q25.sql): items sold in store, "
    "returned, then re-bought through the catalog — a three-fact join "
    "chain through three date_dim aliases. The derived store_returns "
    "carries sr_ticket_number (= the originating o_orderkey, which IS the "
    "derived ss_ticket_number), so the ticket equi-join keeps its "
    "fact-to-fact meaning. Month windows (Apr / Apr-Oct 2001) widened to "
    "the shared 1996-1998 years: the derived catalog re-purchase "
    "coincidence rate is ~40/20000 per returned row, so the reference's "
    "one-month slice would be structurally empty at test SFs. Sort key = "
    "full group key: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q35 — IN + (EXISTS OR EXISTS) demographic profile
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q35",
    ["customer_dim", "customer_address", "customer_demographics",
     "store_sales", "web_sales", "catalog_sales", "date_dim"],
    """
SELECT ca_state, cd_gender, cd_marital_status,
       CAST(COUNT(*) AS BIGINT) AS cnt1,
       CAST(MIN(cd_dep_count) AS BIGINT) AS min_dep,
       CAST(MAX(cd_dep_count) AS BIGINT) AS max_dep,
       CAST(SUM(cd_dep_count) AS DOUBLE) / COUNT(*) AS avg_dep,
       cd_dep_employed_count,
       CAST(MIN(cd_dep_college_count) AS BIGINT) AS min_college,
       CAST(SUM(cd_dep_college_count) AS DOUBLE) / COUNT(*) AS avg_college
FROM customer_dim c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND EXISTS (SELECT * FROM store_sales, date_dim
              WHERE c.c_customer_sk = ss_customer_sk
                AND ss_sold_date_sk = d_date_sk
                AND d_year = 1998 AND d_qoy < 4)
  AND (EXISTS (SELECT * FROM web_sales, date_dim
               WHERE c.c_customer_sk = ws_bill_customer_sk
                 AND ws_sold_date_sk = d_date_sk
                 AND d_year = 1998 AND d_qoy < 4)
       OR EXISTS (SELECT * FROM catalog_sales, date_dim
                  WHERE c.c_customer_sk = cs_bill_customer_sk
                    AND cs_sold_date_sk = d_date_sk
                    AND d_year = 1998 AND d_qoy < 4))
GROUP BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count
ORDER BY ca_state, cd_gender, cd_marital_status, cd_dep_count,
         cd_dep_employed_count, cd_dep_college_count, cnt1
LIMIT 100
""",
    "TPC-DS q35 (reference inputs/q35.sql): demographic profile of "
    "customers active in a quarter window, gated by one mandatory EXISTS "
    "(store channel) AND a disjunction of two more (web OR catalog) — "
    "the decorrelation stress shape. cs_ship_customer_sk -> "
    "cs_bill_customer_sk (the derived catalog fact carries bill only); "
    "avg() as exact SUM/COUNT; d_year 2002 -> 1998. Sort key = full "
    "6-column group key: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q48 — OR-of-ANDs over demographic and address bands
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q48",
    ["store_sales", "store", "customer_demographics", "customer_address",
     "date_dim"],
    """
SELECT CAST(SUM(ss_quantity) AS BIGINT) AS sum_qty
FROM store_sales, store, customer_demographics, customer_address, date_dim
WHERE s_store_sk = ss_store_sk
  AND ss_sold_date_sk = d_date_sk AND d_year = 1998
  AND ((cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'M'
        AND cd_education_status = 'Advanced Degree'
        AND ss_sales_price_cents BETWEEN 1000000 AND 3000000)
    OR (cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'D'
        AND cd_education_status = 'Secondary'
        AND ss_sales_price_cents BETWEEN 3000000 AND 6000000)
    OR (cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'S'
        AND cd_education_status = 'College'
        AND ss_sales_price_cents BETWEEN 6000000 AND 9000000))
  AND ((ss_addr_sk = ca_address_sk
        AND ca_state IN ('S00', 'S01', 'S02')
        AND ss_net_profit_cents BETWEEN 0 AND 200000)
    OR (ss_addr_sk = ca_address_sk
        AND ca_state IN ('S03', 'S04', 'S05')
        AND ss_net_profit_cents BETWEEN 150000 AND 400000)
    OR (ss_addr_sk = ca_address_sk
        AND ca_state IN ('S06', 'S07', 'S08')
        AND ss_net_profit_cents BETWEEN 50000 AND 900000))
ORDER BY sum_qty
LIMIT 100
""",
    "TPC-DS q48 (reference inputs/q48.sql): total quantity under two "
    "three-armed OR-of-AND predicate stacks (marital/education x price "
    "band, state triple x profit band) — the join condition is buried "
    "inside every disjunct, so the planner must factor it out to avoid "
    "a cross product. Bands retuned to the derived cents domains "
    "(sales_price ~87K..10.5M, net_profit 0..1.05M cents); states "
    "SXX. Single-row output.",
)

# ---------------------------------------------------------------------------
# q65 — items revenuing under a fraction of their store's average
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q65",
    ["store", "item", "store_sales", "date_dim"],
    """
SELECT s_store_name, i_item_sk, i_item_desc, sc.revenue_cents,
       i_current_price_cents, i_wholesale_cost_cents, i_brand
FROM store, item,
     (SELECT ss_store_sk, CAST(SUM(revenue_cents) AS DOUBLE) / COUNT(*) AS ave
      FROM (SELECT ss_store_sk, ss_item_sk,
                   CAST(SUM(ss_sales_price_cents) AS BIGINT) AS revenue_cents
            FROM store_sales, date_dim
            WHERE ss_sold_date_sk = d_date_sk
              AND d_month_seq BETWEEN 23976 AND 23987
            GROUP BY ss_store_sk, ss_item_sk) sa
      GROUP BY ss_store_sk) sb,
     (SELECT ss_store_sk, ss_item_sk,
             CAST(SUM(ss_sales_price_cents) AS BIGINT) AS revenue_cents
      FROM store_sales, date_dim
      WHERE ss_sold_date_sk = d_date_sk
        AND d_month_seq BETWEEN 23976 AND 23987
      GROUP BY ss_store_sk, ss_item_sk) sc
WHERE sb.ss_store_sk = sc.ss_store_sk
  AND CAST(sc.revenue_cents AS DOUBLE) <= 0.1 * sb.ave
  AND s_store_sk = sc.ss_store_sk
  AND i_item_sk = sc.ss_item_sk
ORDER BY s_store_name, i_item_sk
LIMIT 100
""",
    "TPC-DS q65 (reference inputs/q65.sql): items whose store revenue "
    "falls under a fraction of that store's per-item average — the same "
    "per-(store,item) revenue subquery evaluated twice, once re-"
    "aggregated per store. avg() as exact SUM/COUNT; d_month_seq window "
    "1176+11 -> 23976+11 (=calendar 1998, derived d_month_seq is "
    "year*12+moy-1); the reference threshold 0.1 runs VERBATIM "
    "(PROMOTED r16: the earlier retune to 0.5 documented the 0.1 decile "
    "as empty by construction, but the shim has gained density since — "
    "re-probed 17/100/100 rows at sf0.001/0.01/0.1). i_item_sk added to "
    "the output so (s_store_name, i_item_sk) is a unique sort key: "
    "LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q79 — per-ticket coupon/profit rollup for busy-household Mondays
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q79",
    ["store_sales", "date_dim", "store", "household_demographics",
     "customer_dim"],
    """
SELECT c_last_name, c_first_name, s_city, ss_ticket_number,
       amt_cents, profit_cents
FROM (SELECT ss_ticket_number, ss_customer_sk, store.s_city,
             CAST(SUM(ss_coupon_amt_cents) AS BIGINT) AS amt_cents,
             CAST(SUM(ss_net_profit_cents) AS BIGINT) AS profit_cents
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND (household_demographics.hd_dep_count = 6
             OR household_demographics.hd_vehicle_count > 2)
        AND date_dim.d_day_name = 'Monday'
        AND date_dim.d_year IN (1996, 1997, 1998)
        AND store.s_number_employees BETWEEN 200 AND 295
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, store.s_city
     ) ms, customer_dim
WHERE ss_customer_sk = c_customer_sk
ORDER BY c_last_name, c_first_name, s_city, profit_cents, ss_ticket_number
LIMIT 100
""",
    "TPC-DS q79 (reference inputs/q79.sql): per-ticket coupon and "
    "profit totals on Mondays for large households at mid-size stores, "
    "joined back to customer names. d_dow = 1 -> d_day_name = 'Monday' "
    "(the derived date_dim carries day names); years 1999-2001 -> "
    "1996-1998. s_number_employees 200..295 keeps 4 of the 8 derived "
    "stores — same selectivity role as the reference band. The sort "
    "key contains (ss_ticket_number, s_city), which uniquely keys the "
    "inner group (customer and address are functions of the ticket): "
    "LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q96 — single-count star through the time dimension
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q96",
    ["store_sales", "household_demographics", "time_dim", "store"],
    """
SELECT CAST(COUNT(*) AS BIGINT) AS cnt
FROM store_sales, household_demographics, time_dim, store
WHERE ss_sold_time_sk = t_time_sk
  AND ss_hdemo_sk = hd_demo_sk
  AND ss_store_sk = s_store_sk
  AND t_hour = 20
  AND t_minute >= 30
  AND hd_dep_count = 7
  AND s_store_name = 'store_3'
ORDER BY cnt
LIMIT 100
""",
    "TPC-DS q96 (reference inputs/q96.sql): count of evening half-hour "
    "store traffic for 7-dependent households — a pure selectivity "
    "star through the synthetic time dimension (t_time_sk is a pure "
    "function of orderkey x linenumber, so the hour band prunes "
    "deterministically). Store 'ese' -> 'store_3'. Single-row output.",
)

# ---------------------------------------------------------------------------
# q97 — store/catalog purchase-overlap cohort via FULL OUTER on dedup CTEs
# ---------------------------------------------------------------------------

_Q97_CTES = """ssci AS {MAT} (
  SELECT ss_customer_sk AS customer_sk, ss_item_sk AS item_sk
  FROM store_sales, date_dim
  WHERE ss_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 23976 AND 23987
  GROUP BY ss_customer_sk, ss_item_sk),
csci AS {MAT} (
  SELECT cs_bill_customer_sk AS customer_sk, cs_item_sk AS item_sk
  FROM catalog_sales, date_dim
  WHERE cs_sold_date_sk = d_date_sk
    AND d_month_seq BETWEEN 23976 AND 23987
  GROUP BY cs_bill_customer_sk, cs_item_sk)"""

_tpcds(
    "tpcds_q97",
    ["store_sales", "catalog_sales", "date_dim"],
    """
SELECT CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL
                      AND csci.customer_sk IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
       CAST(SUM(CASE WHEN ssci.customer_sk IS NULL
                      AND csci.customer_sk IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
       CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL
                      AND csci.customer_sk IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
FROM ssci FULL OUTER JOIN csci
     ON ssci.customer_sk = csci.customer_sk
    AND ssci.item_sk = csci.item_sk
LIMIT 100
""",
    "TPC-DS q97 (reference inputs/q97.sql): how many (customer, item) "
    "purchase pairs exist only in the store channel, only in catalog, "
    "or in both — GROUP BY-deduped per channel, FULL OUTER joined on "
    "the composite key, bucketed by null-side. d_month_seq 1200+11 -> "
    "23976+11. Single-row output of three exact counts.",
    extra=_Q97_CTES,
)

# ---------------------------------------------------------------------------
# q98 — revenue ratio-to-class via window over aggregate
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q98",
    ["store_sales", "item", "date_dim"],
    """
SELECT i_item_desc, i_category, i_class, i_current_price_cents,
       CAST(SUM(ss_ext_sales_price_cents) AS BIGINT) AS itemrevenue_cents,
       CAST(SUM(ss_ext_sales_price_cents) AS DOUBLE) * 100 /
       CAST(SUM(CAST(SUM(ss_ext_sales_price_cents) AS BIGINT))
            OVER (PARTITION BY i_class) AS DOUBLE) AS revenueratio
FROM store_sales, item, date_dim
WHERE ss_item_sk = i_item_sk
  AND i_category IN ('LARGE', 'SMALL', 'PROMO')
  AND ss_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '1998-02-22' AND DATE '1998-03-24'
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price_cents
ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
LIMIT 100
""",
    "TPC-DS q98 (reference inputs/q98.sql): item revenue and its "
    "percentage share of the item-class total — a window aggregate OVER "
    "the grouped aggregate (SUM(SUM(..)) OVER (PARTITION BY i_class)). "
    "The inner window operand and the window result are both pinned to "
    "BIGINT (DuckDB widens window sums to HUGEINT) and the share is one "
    "IEEE multiply+divide of exact cents. Categories retuned to the "
    "derived p_type domain; the +30-day INTERVAL endpoint is written as "
    "a literal date. Sort prefix (category, class, i_item_id) is unique "
    "per row (i_item_id is grouped and 1:1 with the item): LIMIT-safe.",
)

# ===========================================================================
# round-6 batch 2: q36 q38 q42 q43 q45 q50 q61 q62 q76 q90 q93
# ===========================================================================

# ---------------------------------------------------------------------------
# q36 — gross margin ROLLUP with rank-within-GROUPING-parent
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q36",
    ["store_sales", "date_dim", "item", "store"],
    """
SELECT
  CAST(SUM(ss_net_profit_cents) AS DOUBLE)
      / CAST(SUM(ss_ext_sales_price_cents) AS DOUBLE) AS gross_margin,
  i_category, i_class,
  CAST(grouping(i_category) + grouping(i_class) AS INT) AS lochierarchy,
  CAST(rank() OVER (
    PARTITION BY grouping(i_category) + grouping(i_class),
      CASE WHEN grouping(i_class) = 0 THEN i_category END
    ORDER BY CAST(SUM(ss_net_profit_cents) AS DOUBLE)
      / CAST(SUM(ss_ext_sales_price_cents) AS DOUBLE) ASC) AS INT)
      AS rank_within_parent
FROM store_sales, date_dim d1, item, store
WHERE d1.d_year = 1997
  AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk
  AND s_store_sk = ss_store_sk
  AND s_state IN ('S01', 'S02', 'S03')
GROUP BY ROLLUP (i_category, i_class)
ORDER BY lochierarchy DESC,
  CASE WHEN lochierarchy = 0 THEN i_category END,
  rank_within_parent
LIMIT 100
""",
    "TPC-DS q36 (reference inputs/q36.sql): gross-margin ROLLUP over "
    "(category, class) with rank() PARTITIONed BY the GROUPING() level — "
    "the one query shape where grouping() feeds a window. Margin = one "
    "IEEE division of two exact-cents BIGINT sums. 6 categories x 5 "
    "classes -> <= 37 rows, under the LIMIT, so cross-engine NULLS "
    "ordering cannot bite. States retuned to the derived S0x domain; "
    "year 2001 -> 1997.",
)

# ---------------------------------------------------------------------------
# q38 — 3-channel INTERSECT of (last name, first name, day) shoppers
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q38",
    ["store_sales", "catalog_sales", "web_sales", "date_dim", "customer_dim"],
    """
SELECT CAST(count(*) AS BIGINT) AS cnt
FROM (
       SELECT DISTINCT c_last_name, c_first_name, d_date
       FROM store_sales, date_dim, customer_dim
       WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
         AND store_sales.ss_customer_sk = customer_dim.c_customer_sk
         AND d_month_seq BETWEEN 23952 AND 23952 + 11
       INTERSECT
       SELECT DISTINCT c_last_name, c_first_name, d_date
       FROM catalog_sales, date_dim, customer_dim
       WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
         AND catalog_sales.cs_bill_customer_sk = customer_dim.c_customer_sk
         AND d_month_seq BETWEEN 23952 AND 23952 + 11
       INTERSECT
       SELECT DISTINCT c_last_name, c_first_name, d_date
       FROM web_sales, date_dim, customer_dim
       WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
         AND web_sales.ws_bill_customer_sk = customer_dim.c_customer_sk
         AND d_month_seq BETWEEN 23952 AND 23952 + 11
     ) hot_cust
LIMIT 100
""",
    "TPC-DS q38 (reference inputs/q38.sql): customers who bought through "
    "all three channels on the same day — DISTINCT projections chained "
    "with two INTERSECTs (set semantics identical in Spark and DuckDB), "
    "then a bare COUNT. d_month_seq 1200+11 retuned to the derived "
    "epoch (1996 = 23952). Single row: LIMIT trivially safe.",
)

# ---------------------------------------------------------------------------
# q42 — category star for one manager-month
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q42",
    ["date_dim", "store_sales", "item"],
    """
SELECT dt.d_year, item.i_category_id, item.i_category,
       CAST(SUM(ss_ext_sales_price_cents) AS BIGINT) AS sum_sales_cents
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manager_id = 1
  AND dt.d_moy = 11
  AND dt.d_year = 1998
GROUP BY dt.d_year, item.i_category_id, item.i_category
ORDER BY sum_sales_cents DESC, dt.d_year, item.i_category_id,
  item.i_category
LIMIT 100
""",
    "TPC-DS q42 (reference inputs/q42.sql): single-month category star "
    "sliced by manager. i_category_id is a pure deterministic function "
    "of the category string (length*31 + ascii of first char), so the "
    "(id, name) group key is 1:1 with the category and the full sort "
    "key is unique: LIMIT-safe. Year 2000 -> 1998.",
)

# ---------------------------------------------------------------------------
# q43 — store day-of-week pivot
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q43",
    ["date_dim", "store_sales", "store"],
    """
SELECT s_store_name, s_store_id,
  CAST(SUM(CASE WHEN (d_day_name = 'Sunday') THEN ss_sales_price_cents
    ELSE NULL END) AS BIGINT) AS sun_sales_cents,
  CAST(SUM(CASE WHEN (d_day_name = 'Monday') THEN ss_sales_price_cents
    ELSE NULL END) AS BIGINT) AS mon_sales_cents,
  CAST(SUM(CASE WHEN (d_day_name = 'Tuesday') THEN ss_sales_price_cents
    ELSE NULL END) AS BIGINT) AS tue_sales_cents,
  CAST(SUM(CASE WHEN (d_day_name = 'Wednesday') THEN ss_sales_price_cents
    ELSE NULL END) AS BIGINT) AS wed_sales_cents,
  CAST(SUM(CASE WHEN (d_day_name = 'Thursday') THEN ss_sales_price_cents
    ELSE NULL END) AS BIGINT) AS thu_sales_cents,
  CAST(SUM(CASE WHEN (d_day_name = 'Friday') THEN ss_sales_price_cents
    ELSE NULL END) AS BIGINT) AS fri_sales_cents,
  CAST(SUM(CASE WHEN (d_day_name = 'Saturday') THEN ss_sales_price_cents
    ELSE NULL END) AS BIGINT) AS sat_sales_cents
FROM date_dim, store_sales, store
WHERE d_date_sk = ss_sold_date_sk
  AND s_store_sk = ss_store_sk
  AND s_gmt_offset = -5
  AND d_year = 1998
GROUP BY s_store_name, s_store_id
ORDER BY s_store_name, s_store_id
LIMIT 100
""",
    "TPC-DS q43 (reference inputs/q43.sql): one row per store, one "
    "exact-cents SUM(CASE) pivot column per weekday (d_day_name from "
    "the dialect-normalized 0=Sunday DOW). <= 4 stores pass the "
    "gmt_offset slice: LIMIT-safe on the unique (name, id) key alone, "
    "so the reference's sum tie-breakers are dropped from the sort.",
)

# ---------------------------------------------------------------------------
# q45 — zip OR item-IN-subquery web revenue
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q45",
    ["web_sales", "customer_dim", "customer_address", "date_dim", "item"],
    """
SELECT ca_zip, ca_city,
       CAST(SUM(ws_sales_price_cents) AS BIGINT) AS sum_ws_sales_cents
FROM web_sales, customer_dim, customer_address, date_dim, item
WHERE ws_bill_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND ws_item_sk = i_item_sk
  AND (substr(ca_zip, 1, 5) IN
  ('10037', '10074', '10111', '10148', '10185', '10222', '10259', '10296',
   '10333')
  OR
  i_item_id IN (SELECT i_item_id
  FROM item
  WHERE i_item_sk IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)
  )
)
  AND ws_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 1998
GROUP BY ca_zip, ca_city
ORDER BY ca_zip, ca_city
LIMIT 100
""",
    "TPC-DS q45 (reference inputs/q45.sql): web revenue by customer "
    "zip/city where the zip is on a hot list OR the item is in a keyed "
    "subquery — a disjunction Catalyst cannot push into either scan, "
    "forcing the OR to survive to the joined stream. Zips are the shim's "
    "derived values for custkeys 1-9; item sks keep the reference's "
    "primes. Group key (zip, city) is unique per customer cohort: "
    "LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q50 — return-latency bucket pivot per store
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q50",
    ["store_sales", "store_returns", "store", "date_dim"],
    """
SELECT
  s_store_name, s_company_id, s_street_number, s_street_name,
  s_street_type, s_suite_number, s_city, s_county, s_state, s_zip,
  CAST(SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk <= 30)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_30,
  CAST(SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 30) AND
    (sr_returned_date_sk - ss_sold_date_sk <= 60)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_31_60,
  CAST(SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 60) AND
    (sr_returned_date_sk - ss_sold_date_sk <= 90)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_61_90,
  CAST(SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 90) AND
    (sr_returned_date_sk - ss_sold_date_sk <= 120)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_91_120,
  CAST(SUM(CASE WHEN (sr_returned_date_sk - ss_sold_date_sk > 120)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_over_120
FROM store_sales, store_returns, store, date_dim d1, date_dim d2
WHERE d2.d_year = 1998
    AND d2.d_moy = 9
    AND ss_ticket_number = sr_ticket_number
    AND ss_item_sk = sr_item_sk
    AND ss_sold_date_sk = d1.d_date_sk
    AND sr_returned_date_sk = d2.d_date_sk
    AND ss_customer_sk = sr_customer_sk
    AND ss_store_sk = s_store_sk
GROUP BY s_store_name, s_company_id, s_street_number, s_street_name,
  s_street_type, s_suite_number, s_city, s_county, s_state, s_zip
ORDER BY s_store_name, s_company_id, s_street_number, s_street_name,
  s_street_type, s_suite_number, s_city, s_county, s_state, s_zip
LIMIT 100
""",
    "TPC-DS q50 (reference inputs/q50.sql): per-store return-latency "
    "histogram — the (ticket, item, customer) sale-to-return self-path "
    "through two date_dim aliases, bucket arithmetic directly on the "
    "epoch-day surrogate keys. Derived return latency = ship-order "
    "lag + 14 days, so every bucket is populated. <= 8 stores: "
    "LIMIT-safe on the full unique address group key.",
)

# ---------------------------------------------------------------------------
# q61 — promotional vs total sales, two single-row scalar branches
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q61",
    ["store_sales", "store", "promotion", "date_dim", "customer_dim",
     "customer_address", "item"],
    """
SELECT promotions_cents, total_cents,
       CAST(promotions_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) * 100
           AS promo_pct
FROM
  (SELECT CAST(SUM(ss_ext_sales_price_cents) AS BIGINT) AS promotions_cents
  FROM store_sales, store, promotion, date_dim, customer_dim,
       customer_address, item
  WHERE ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND ss_promo_sk = p_promo_sk
    AND ss_customer_sk = c_customer_sk
    AND ca_address_sk = c_current_addr_sk
    AND ss_item_sk = i_item_sk
    AND ca_gmt_offset = -5
    AND i_category = 'PROMO'
    AND (p_channel_dmail = 'Y' OR p_channel_email = 'Y'
         OR p_channel_tv = 'Y')
    AND s_gmt_offset = -5
    AND d_year = 1996
    AND d_moy = 11) promotional_sales,
  (SELECT CAST(SUM(ss_ext_sales_price_cents) AS BIGINT) AS total_cents
  FROM store_sales, store, date_dim, customer_dim, customer_address, item
  WHERE ss_sold_date_sk = d_date_sk
    AND ss_store_sk = s_store_sk
    AND ss_customer_sk = c_customer_sk
    AND ca_address_sk = c_current_addr_sk
    AND ss_item_sk = i_item_sk
    AND ca_gmt_offset = -5
    AND i_category = 'PROMO'
    AND s_gmt_offset = -5
    AND d_year = 1996
    AND d_moy = 11) all_sales
ORDER BY promotions_cents, total_cents
LIMIT 100
""",
    "TPC-DS q61 (reference inputs/q61.sql): promotional share of one "
    "month's store revenue — two single-row aggregate subqueries cross "
    "joined (BroadcastNestedLoopJoin over exactly 1x1 rows), ratio as "
    "one IEEE divide+multiply of exact cents. 'Jewelry' -> the derived "
    "'PROMO' category; gmt/tv-channel filters hit the new shim columns. "
    "Single row: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q62 — web shipping-latency buckets by warehouse x ship mode x site
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q62",
    ["web_sales", "warehouse", "ship_mode", "web_site", "date_dim"],
    """
SELECT
  substr(w_warehouse_name, 1, 20) AS warehouse_name,
  sm_type, web_name,
  CAST(SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk <= 30)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_30,
  CAST(SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 30) AND
    (ws_ship_date_sk - ws_sold_date_sk <= 60)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_31_60,
  CAST(SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 60) AND
    (ws_ship_date_sk - ws_sold_date_sk <= 90)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_61_90,
  CAST(SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 90) AND
    (ws_ship_date_sk - ws_sold_date_sk <= 120)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_91_120,
  CAST(SUM(CASE WHEN (ws_ship_date_sk - ws_sold_date_sk > 120)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_over_120
FROM web_sales, warehouse, ship_mode, web_site, date_dim
WHERE d_month_seq BETWEEN 23952 AND 23952 + 11
    AND ws_ship_date_sk = d_date_sk
    AND ws_warehouse_sk = w_warehouse_sk
    AND ws_ship_mode_sk = sm_ship_mode_sk
    AND ws_web_site_sk = web_site_sk
GROUP BY substr(w_warehouse_name, 1, 20), sm_type, web_name
ORDER BY warehouse_name, sm_type, web_name
LIMIT 100
""",
    "TPC-DS q62 (reference inputs/q62.sql): order-to-ship latency "
    "histogram across warehouse x ship-mode x web-site — the ship_mode "
    "and web_site dims plus ws_ship_date_sk/ws_ship_mode_sk/"
    "ws_warehouse_sk/ws_web_site_sk fact columns exist for this family. "
    "5 warehouses x 5 modes x 6 sites = <= 150 groups but the unique "
    "full group key is the whole sort: deterministic under LIMIT. "
    "Month_seq 1200 retuned to 23952 (1996).",
)

# ---------------------------------------------------------------------------
# q76 — NULL-foreign-key sales counts across channels
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q76",
    ["store_sales", "web_sales", "catalog_sales", "item", "date_dim"],
    """
SELECT channel, col_name, d_year, d_qoy, i_category,
       CAST(COUNT(*) AS BIGINT) AS sales_cnt,
       CAST(SUM(ext_sales_price_cents) AS BIGINT) AS sales_amt_cents
FROM (
       SELECT 'store' AS channel, ss_store_sk AS col_name, d_year, d_qoy,
              i_category, ss_ext_sales_price_cents AS ext_sales_price_cents
       FROM store_sales, item, date_dim
       WHERE ss_store_sk IS NULL
         AND ss_sold_date_sk = d_date_sk
         AND ss_item_sk = i_item_sk
       UNION ALL
       SELECT 'web' AS channel, ws_ship_customer_sk AS col_name, d_year,
              d_qoy, i_category,
              ws_ext_sales_price_cents AS ext_sales_price_cents
       FROM web_sales, item, date_dim
       WHERE ws_ship_customer_sk IS NULL
         AND ws_sold_date_sk = d_date_sk
         AND ws_item_sk = i_item_sk
       UNION ALL
       SELECT 'catalog' AS channel, cs_ship_addr_sk AS col_name, d_year,
              d_qoy, i_category,
              cs_ext_sales_price_cents AS ext_sales_price_cents
       FROM catalog_sales, item, date_dim
       WHERE cs_ship_addr_sk IS NULL
         AND cs_sold_date_sk = d_date_sk
         AND cs_item_sk = i_item_sk) foo
GROUP BY channel, col_name, d_year, d_qoy, i_category
ORDER BY channel, col_name, d_year, d_qoy, i_category
LIMIT 100
""",
    "TPC-DS q76 (reference inputs/q76.sql): volume flowing through rows "
    "whose channel-specific FK is NULL — the shim injects sparse "
    "deterministic NULLs (~2%) into ss_store_sk, ws_ship_customer_sk and "
    "cs_ship_addr_sk precisely so this family is non-degenerate. "
    "col_name is NULL on every surviving row, so the NULL position in "
    "the sort is moot; the remaining sort key is the unique group key: "
    "LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q90 — morning/evening web traffic ratio
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q90",
    ["web_sales", "household_demographics", "time_dim", "web_page"],
    """
SELECT am_cnt, pm_cnt,
       CAST(am_cnt AS DOUBLE) / CAST(pm_cnt AS DOUBLE) AS am_pm_ratio
FROM (SELECT CAST(count(*) AS BIGINT) AS am_cnt
FROM web_sales, household_demographics, time_dim, web_page
WHERE ws_sold_time_sk = time_dim.t_time_sk
  AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
  AND ws_web_page_sk = web_page.wp_web_page_sk
  AND time_dim.t_hour BETWEEN 8 AND 8 + 1
  AND household_demographics.hd_dep_count = 6
  AND web_page.wp_char_count BETWEEN 5000 AND 5200) at_tab,
  (SELECT CAST(count(*) AS BIGINT) AS pm_cnt
  FROM web_sales, household_demographics, time_dim, web_page
  WHERE ws_sold_time_sk = time_dim.t_time_sk
    AND ws_ship_hdemo_sk = household_demographics.hd_demo_sk
    AND ws_web_page_sk = web_page.wp_web_page_sk
    AND time_dim.t_hour BETWEEN 19 AND 19 + 1
    AND household_demographics.hd_dep_count = 6
    AND web_page.wp_char_count BETWEEN 5000 AND 5200) pt_tab
ORDER BY am_pm_ratio
LIMIT 100
""",
    "TPC-DS q90 (reference inputs/q90.sql): ratio of 8-10am to 7-9pm "
    "web orders for one dependent-count cohort on mid-size pages — two "
    "single-row counting branches cross joined, using the new "
    "ws_ship_hdemo_sk fact column and wp_char_count page attribute. "
    "Counts emitted alongside the one-IEEE-division ratio so the oracle "
    "checks exact integers, not just the float. 'at' aliased (reserved "
    "word in DuckDB). Single row: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q93 — customer net revenue after reason-filtered returns
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q93",
    ["store_sales", "store_returns", "reason"],
    """
SELECT ss_customer_sk, CAST(SUM(act_sales) AS BIGINT) AS sumsales_cents
FROM (SELECT
  ss_item_sk, ss_ticket_number, ss_customer_sk,
  CASE WHEN sr_return_quantity IS NOT NULL
    THEN CAST(ss_quantity - sr_return_quantity AS BIGINT)
         * ss_sales_price_cents
  ELSE CAST(ss_quantity AS BIGINT) * ss_sales_price_cents END act_sales
FROM store_sales
  LEFT OUTER JOIN store_returns
    ON (sr_item_sk = ss_item_sk AND sr_ticket_number = ss_ticket_number)
  , reason
WHERE sr_reason_sk = r_reason_sk AND r_reason_desc = 'reason 7') t
GROUP BY ss_customer_sk
ORDER BY sumsales_cents, ss_customer_sk
LIMIT 100
""",
    "TPC-DS q93 (reference inputs/q93.sql): per-customer revenue net of "
    "returns — LEFT OUTER fact-to-fact join on (item, ticket) whose "
    "NULL-extended side feeds a CASE, then an inner reason slice "
    "('reason 28' -> the derived 'reason 7'). The shim's return "
    "quantity is a partial return (ceil(q/2)), so the returned and "
    "kept branches both contribute nonzero cents. act_sales multiplies "
    "exact BIGINTs. Sort (sumsales, customer) is unique: LIMIT-safe.",
)

# ===========================================================================
# round-6 batch 3: q4 q31 q33 q46 q49 q58 q60 q66 q83 q94
# ===========================================================================

# ---------------------------------------------------------------------------
# q4 — 3-channel year_total CTE, six-instance self-join
# ---------------------------------------------------------------------------

_Q4_YT = """year_total AS {MAT} (
  SELECT c_customer_id customer_id, c_first_name customer_first_name,
         c_last_name customer_last_name,
         c_preferred_cust_flag customer_preferred_cust_flag,
         c_birth_country customer_birth_country,
         c_login customer_login, c_email_address customer_email_address,
         d_year dyear,
         CAST(SUM(ss_list_price_cents - ss_ext_wholesale_cost_cents
                  - ss_ext_discount_amt_cents + ss_ext_sales_price_cents)
              AS DOUBLE) / 2 year_total,
         's' sale_type
  FROM customer_dim, store_sales, date_dim
  WHERE c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_first_name, c_last_name, c_preferred_cust_flag,
    c_birth_country, c_login, c_email_address, d_year
  UNION ALL
  SELECT c_customer_id customer_id, c_first_name customer_first_name,
         c_last_name customer_last_name,
         c_preferred_cust_flag customer_preferred_cust_flag,
         c_birth_country customer_birth_country,
         c_login customer_login, c_email_address customer_email_address,
         d_year dyear,
         CAST(SUM(cs_list_price_cents - cs_ext_wholesale_cost_cents
                  - cs_ext_discount_amt_cents + cs_ext_sales_price_cents)
              AS DOUBLE) / 2 year_total,
         'c' sale_type
  FROM customer_dim, catalog_sales, date_dim
  WHERE c_customer_sk = cs_bill_customer_sk AND cs_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_first_name, c_last_name, c_preferred_cust_flag,
    c_birth_country, c_login, c_email_address, d_year
  UNION ALL
  SELECT c_customer_id customer_id, c_first_name customer_first_name,
         c_last_name customer_last_name,
         c_preferred_cust_flag customer_preferred_cust_flag,
         c_birth_country customer_birth_country,
         c_login customer_login, c_email_address customer_email_address,
         d_year dyear,
         CAST(SUM(ws_list_price_cents - ws_ext_wholesale_cost_cents
                  - ws_ext_discount_amt_cents + ws_ext_sales_price_cents)
              AS DOUBLE) / 2 year_total,
         'w' sale_type
  FROM customer_dim, web_sales, date_dim
  WHERE c_customer_sk = ws_bill_customer_sk AND ws_sold_date_sk = d_date_sk
  GROUP BY c_customer_id, c_first_name, c_last_name, c_preferred_cust_flag,
    c_birth_country, c_login, c_email_address, d_year)"""

_tpcds(
    "tpcds_q4",
    ["customer_dim", "store_sales", "catalog_sales", "web_sales",
     "date_dim"],
    """
SELECT
  t_s_secyear.customer_id,
  t_s_secyear.customer_first_name,
  t_s_secyear.customer_last_name,
  t_s_secyear.customer_preferred_cust_flag,
  t_s_secyear.customer_birth_country,
  t_s_secyear.customer_login,
  t_s_secyear.customer_email_address
FROM year_total t_s_firstyear, year_total t_s_secyear,
  year_total t_c_firstyear, year_total t_c_secyear,
  year_total t_w_firstyear, year_total t_w_secyear
WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_c_secyear.customer_id
  AND t_s_firstyear.customer_id = t_c_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
  AND t_s_firstyear.sale_type = 's'
  AND t_c_firstyear.sale_type = 'c'
  AND t_w_firstyear.sale_type = 'w'
  AND t_s_secyear.sale_type = 's'
  AND t_c_secyear.sale_type = 'c'
  AND t_w_secyear.sale_type = 'w'
  AND t_s_firstyear.dyear = 1996
  AND t_s_secyear.dyear = 1996 + 1
  AND t_c_firstyear.dyear = 1996
  AND t_c_secyear.dyear = 1996 + 1
  AND t_w_firstyear.dyear = 1996
  AND t_w_secyear.dyear = 1996 + 1
  AND t_s_firstyear.year_total > 0
  AND t_c_firstyear.year_total > 0
  AND t_w_firstyear.year_total > 0
  AND CASE WHEN t_c_firstyear.year_total > 0
  THEN t_c_secyear.year_total / t_c_firstyear.year_total
      ELSE NULL END
  > CASE WHEN t_s_firstyear.year_total > 0
  THEN t_s_secyear.year_total / t_s_firstyear.year_total
    ELSE NULL END
  AND CASE WHEN t_c_firstyear.year_total > 0
  THEN t_c_secyear.year_total / t_c_firstyear.year_total
      ELSE NULL END
  > CASE WHEN t_w_firstyear.year_total > 0
  THEN t_w_secyear.year_total / t_w_firstyear.year_total
    ELSE NULL END
ORDER BY
  t_s_secyear.customer_id,
  t_s_secyear.customer_first_name,
  t_s_secyear.customer_last_name,
  t_s_secyear.customer_preferred_cust_flag,
  t_s_secyear.customer_birth_country,
  t_s_secyear.customer_login,
  t_s_secyear.customer_email_address
LIMIT 100
""",
    "TPC-DS q4 (reference inputs/q4.sql): customers whose catalog "
    "year-over-year growth beats both store and web growth — the "
    "3-channel year_total CTE instantiated six times. year_total keeps "
    "the reference's half-margin formula over exact cents with one IEEE "
    "/2; growth comparisons divide two such doubles (deterministic both "
    "engines). ext_list_price -> the shim's list_price_cents; years "
    "2001/2 -> 1996/7. One row per customer_id, which leads the sort: "
    "LIMIT-safe.",
    extra=_Q4_YT,
    tags=("bench",),
)

# ---------------------------------------------------------------------------
# q31 — county-level quarterly web-vs-store growth
# ---------------------------------------------------------------------------

_Q31_CTES = """ss AS {MAT} (
  SELECT ca_county, d_qoy, d_year,
         CAST(SUM(ss_ext_sales_price_cents) AS BIGINT) AS store_sales
  FROM store_sales, date_dim, customer_address
  WHERE ss_sold_date_sk = d_date_sk AND ss_addr_sk = ca_address_sk
  GROUP BY ca_county, d_qoy, d_year),
ws AS {MAT} (
  SELECT ca_county, d_qoy, d_year,
         CAST(SUM(ws_ext_sales_price_cents) AS BIGINT) AS web_sales
  FROM web_sales, date_dim, customer_address
  WHERE ws_sold_date_sk = d_date_sk AND ws_addr_sk = ca_address_sk
  GROUP BY ca_county, d_qoy, d_year)"""

_tpcds(
    "tpcds_q31",
    ["store_sales", "web_sales", "date_dim", "customer_address"],
    """
SELECT
  ss1.ca_county,
  ss1.d_year,
  CAST(ws2.web_sales AS DOUBLE) / ws1.web_sales web_q1_q2_increase,
  CAST(ss2.store_sales AS DOUBLE) / ss1.store_sales store_q1_q2_increase,
  CAST(ws3.web_sales AS DOUBLE) / ws2.web_sales web_q2_q3_increase,
  CAST(ss3.store_sales AS DOUBLE) / ss2.store_sales store_q2_q3_increase
FROM
  ss ss1, ss ss2, ss ss3, ws ws1, ws ws2, ws ws3
WHERE
  ss1.d_qoy = 1
    AND ss1.d_year = 1997
    AND ss1.ca_county = ss2.ca_county
    AND ss2.d_qoy = 2
    AND ss2.d_year = 1997
    AND ss2.ca_county = ss3.ca_county
    AND ss3.d_qoy = 3
    AND ss3.d_year = 1997
    AND ss1.ca_county = ws1.ca_county
    AND ws1.d_qoy = 1
    AND ws1.d_year = 1997
    AND ws1.ca_county = ws2.ca_county
    AND ws2.d_qoy = 2
    AND ws2.d_year = 1997
    AND ws1.ca_county = ws3.ca_county
    AND ws3.d_qoy = 3
    AND ws3.d_year = 1997
    AND CASE WHEN ws1.web_sales > 0
    THEN CAST(ws2.web_sales AS DOUBLE) / ws1.web_sales
        ELSE NULL END
    > CASE WHEN ss1.store_sales > 0
    THEN CAST(ss2.store_sales AS DOUBLE) / ss1.store_sales
      ELSE NULL END
    AND CASE WHEN ws2.web_sales > 0
    THEN CAST(ws3.web_sales AS DOUBLE) / ws2.web_sales
        ELSE NULL END
    > CASE WHEN ss2.store_sales > 0
    THEN CAST(ss3.store_sales AS DOUBLE) / ss2.store_sales
      ELSE NULL END
ORDER BY ss1.ca_county
""",
    "TPC-DS q31 (reference inputs/q31.sql): counties where web revenue "
    "grew faster than store revenue across Q1->Q2 AND Q2->Q3 — two "
    "channel CTEs each instantiated three times (six join legs). Growth "
    "ratios are single IEEE divisions of exact-cents BIGINTs. The "
    "reference's ws_bill_addr_sk -> the shim's ws_addr_sk. 8 derived "
    "counties, no LIMIT in the reference text: order cosmetic.",
    extra=_Q31_CTES,
)

# ---------------------------------------------------------------------------
# q33 — manufacturer revenue across all three channels, IN-subquery gate
# ---------------------------------------------------------------------------


def _q33_branch(fact: str, p: str, cust_addr: str) -> str:
    return f"""(
    SELECT i_manufact_id,
           SUM({p}_ext_sales_price_cents) total_sales
    FROM {fact}, date_dim, customer_address, item
    WHERE i_manufact_id IN (SELECT i_manufact_id FROM item
                            WHERE i_category IN ('ECONOMY'))
      AND {p}_item_sk = i_item_sk
      AND {p}_sold_date_sk = d_date_sk
      AND d_year = 1998
      AND d_moy = 5
      AND {cust_addr} = ca_address_sk
      AND ca_gmt_offset = -5
    GROUP BY i_manufact_id)"""


_Q33_CTES = (
    "ss AS {MAT} " + _q33_branch("store_sales", "ss", "ss_addr_sk")
    + ",\ncs AS {MAT} " + _q33_branch("catalog_sales", "cs", "cs_addr_sk")
    + ",\nws AS {MAT} " + _q33_branch("web_sales", "ws", "ws_addr_sk")
)

_tpcds(
    "tpcds_q33",
    ["store_sales", "catalog_sales", "web_sales", "date_dim",
     "customer_address", "item"],
    """
SELECT i_manufact_id, CAST(SUM(total_sales) AS BIGINT) AS total_sales
FROM (SELECT * FROM ss
      UNION ALL
      SELECT * FROM cs
      UNION ALL
      SELECT * FROM ws) tmp1
GROUP BY i_manufact_id
ORDER BY total_sales
LIMIT 100
""",
    "TPC-DS q33 (reference inputs/q33.sql): one month's revenue per "
    "manufacturer summed across all three channels, manufacturers gated "
    "by an uncorrelated IN subquery over one category ('Electronics' -> "
    "the derived 'ECONOMY'). Inner CTE sums stay unwrapped (DuckDB "
    "HUGEINT never reaches the result); only the outer SUM is CAST to "
    "BIGINT. <= 50 manufacturers < LIMIT, so the revenue-only sort "
    "cannot truncate ambiguously.",
    extra=_Q33_CTES,
)

# ---------------------------------------------------------------------------
# q46 — weekend ticket totals where bought city differs from home city
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q46",
    ["store_sales", "date_dim", "store", "household_demographics",
     "customer_address", "customer_dim"],
    """
SELECT
  c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
  amt_cents, profit_cents
FROM
  (SELECT
    ss_ticket_number, ss_customer_sk, ca_city bought_city,
    CAST(SUM(ss_coupon_amt_cents) AS BIGINT) amt_cents,
    CAST(SUM(ss_net_profit_cents) AS BIGINT) profit_cents
  FROM store_sales, date_dim, store, household_demographics,
       customer_address
  WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
    AND store_sales.ss_store_sk = store.s_store_sk
    AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    AND store_sales.ss_addr_sk = customer_address.ca_address_sk
    AND (household_demographics.hd_dep_count = 4 OR
    household_demographics.hd_vehicle_count = 3)
    AND date_dim.d_dow IN (6, 0)
    AND date_dim.d_year IN (1996, 1996 + 1, 1996 + 2)
    AND store.s_city IN ('city_0', 'city_1')
  GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
  customer_dim, customer_address current_addr
WHERE ss_customer_sk = c_customer_sk
  AND customer_dim.c_current_addr_sk = current_addr.ca_address_sk
  AND current_addr.ca_city <> bought_city
ORDER BY c_last_name, c_first_name, ca_city, bought_city,
  ss_ticket_number
LIMIT 100
""",
    "TPC-DS q46 (reference inputs/q46.sql): weekend store tickets for "
    "high-dependent/vehicle households, re-joined to the customer's "
    "current address and kept only when the purchase city differs. "
    "d_dow is the dialect-normalized 0=Sunday weekday. The shim's "
    "ss_addr_sk is the customer's home address except for a "
    "deterministic ~14% 'bought elsewhere' remap (mod-7 onto the supplier "
    "key range), so the <> filter is non-degenerate. One dn row per "
    "ticket and the ticket ends the sort: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q49 — worst return ratios per channel, dual rank windows
# ---------------------------------------------------------------------------


def _q49_branch(tag: str, sales: str, sp: str, rets: str, rp: str,
                sale_ord: str, ret_ord: str, amt: str) -> str:
    return f"""SELECT
  '{tag}' AS channel, {tag}_t.item, {tag}_t.return_ratio,
  {tag}_t.return_rank, {tag}_t.currency_rank
FROM (
       SELECT item, return_ratio, currency_ratio,
         CAST(rank() OVER (ORDER BY return_ratio) AS INT) AS return_rank,
         CAST(rank() OVER (ORDER BY currency_ratio) AS INT) AS currency_rank
       FROM
         (SELECT
           s.{sp}_item_sk AS item,
           CAST(SUM(COALESCE(r.{rp}_return_quantity, 0)) AS DOUBLE) /
             CAST(SUM(COALESCE(s.{sp}_quantity, 0)) AS DOUBLE)
             AS return_ratio,
           CAST(SUM(COALESCE(r.{amt}, 0)) AS DOUBLE) /
             CAST(SUM(COALESCE(s.{sp}_net_paid_cents, 0)) AS DOUBLE)
             AS currency_ratio
         FROM
           {sales} s LEFT OUTER JOIN {rets} r
             ON (s.{sale_ord} = r.{ret_ord} AND
                 s.{sp}_item_sk = r.{rp}_item_sk)
           , date_dim
         WHERE
           r.{amt} > 10000
             AND s.{sp}_net_profit_cents > 100
             AND s.{sp}_net_paid_cents > 0
             AND s.{sp}_quantity > 0
             AND {sp}_sold_date_sk = d_date_sk
             AND d_year = 1997
             AND d_moy = 12
         GROUP BY s.{sp}_item_sk
         ) in_{tag}
     ) {tag}_t
WHERE ({tag}_t.return_rank <= 10 OR {tag}_t.currency_rank <= 10)"""


_Q49_BODY = (
    _q49_branch("web", "web_sales", "ws", "web_returns", "wr",
                "ws_order_number", "wr_order_number",
                "wr_return_amt_cents")
    + "\nUNION\n"
    + _q49_branch("catalog", "catalog_sales", "cs", "catalog_returns", "cr",
                  "cs_order_number", "cr_order_number",
                  "cr_return_amount_cents")
    + "\nUNION\n"
    + _q49_branch("store", "store_sales", "ss", "store_returns", "sr",
                  "ss_ticket_number", "sr_ticket_number",
                  "sr_return_amt_cents")
    + "\nORDER BY 1, 4, 5, 2\nLIMIT 100"
)

_tpcds(
    "tpcds_q49",
    ["web_sales", "web_returns", "catalog_sales", "catalog_returns",
     "store_sales", "store_returns", "date_dim"],
    _Q49_BODY,
    "TPC-DS q49 (reference inputs/q49.sql): per-channel worst return "
    "ratios — LEFT OUTER sale-to-return joins whose WHERE on the "
    "return amount makes them effectively inner (reference semantics "
    "preserved verbatim), two rank() windows per channel, keep rank<=10 "
    "on either, then UNION DISTINCT the three channels. Ratios are "
    "IEEE divisions of exact integers so the rank inputs are bit-equal "
    "across engines. DECIMAL(15,4) -> DOUBLE; $-thresholds in cents. "
    "The result can exceed the LIMIT (rank<=10 under heavy ties), so "
    "the item id is appended to the reference's (channel, rank, rank) "
    "sort to make truncation deterministic.",
)

# ---------------------------------------------------------------------------
# q58 — items with balanced revenue across all three channels in one week
# ---------------------------------------------------------------------------


def _q58_items(cte: str, fact: str, p: str, rev: str) -> str:
    return f"""{cte} AS {{MAT}} (
  SELECT i_item_id item_id, SUM({p}_ext_sales_price_cents) {rev}
  FROM {fact}, item, date_dim
  WHERE {p}_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_week_seq IN (SELECT d_week_seq FROM date_dim
                                        WHERE d_year = 1996))
    AND {p}_sold_date_sk = d_date_sk
  GROUP BY i_item_id)"""


_Q58_CTES = ",\n".join([
    _q58_items("ss_items", "store_sales", "ss", "ss_item_rev"),
    _q58_items("cs_items", "catalog_sales", "cs", "cs_item_rev"),
    _q58_items("ws_items", "web_sales", "ws", "ws_item_rev"),
])

_tpcds(
    "tpcds_q58",
    ["store_sales", "catalog_sales", "web_sales", "item", "date_dim"],
    """
SELECT
  ss_items.item_id,
  CAST(ss_item_rev AS BIGINT) AS ss_item_rev,
  CAST(ss_item_rev AS DOUBLE) / (ss_item_rev + cs_item_rev + ws_item_rev)
    / 3 * 100 ss_dev,
  CAST(cs_item_rev AS BIGINT) AS cs_item_rev,
  CAST(cs_item_rev AS DOUBLE) / (ss_item_rev + cs_item_rev + ws_item_rev)
    / 3 * 100 cs_dev,
  CAST(ws_item_rev AS BIGINT) AS ws_item_rev,
  CAST(ws_item_rev AS DOUBLE) / (ss_item_rev + cs_item_rev + ws_item_rev)
    / 3 * 100 ws_dev,
  CAST(ss_item_rev + cs_item_rev + ws_item_rev AS DOUBLE) / 3 average
FROM ss_items, cs_items, ws_items
WHERE ss_items.item_id = cs_items.item_id
  AND ss_items.item_id = ws_items.item_id
  AND ss_item_rev BETWEEN 0.9 * cs_item_rev AND 1.1 * cs_item_rev
  AND ss_item_rev BETWEEN 0.9 * ws_item_rev AND 1.1 * ws_item_rev
  AND cs_item_rev BETWEEN 0.9 * ss_item_rev AND 1.1 * ss_item_rev
  AND cs_item_rev BETWEEN 0.9 * ws_item_rev AND 1.1 * ws_item_rev
  AND ws_item_rev BETWEEN 0.9 * ss_item_rev AND 1.1 * ss_item_rev
  AND ws_item_rev BETWEEN 0.9 * cs_item_rev AND 1.1 * cs_item_rev
ORDER BY ss_items.item_id, 2
LIMIT 100
""",
    "TPC-DS q58 (reference inputs/q58.sql): items whose one-week revenue "
    "is within 10% across every channel pair. The reference anchors one "
    "week via a nested scalar-date subquery — at test SFs no item sells "
    "through all three channels in any single week, so the cohort is "
    "widened to the weeks of 1996 (same doubly nested week_seq shape as "
    "q83; the scalar-anchor shape stays covered by q6). The 0.9/1.1 "
    "band compares BIGINT cents against an IEEE product (identical "
    "coercion both engines); dev percentages are single IEEE division "
    "chains. Non-empty at sf0.01 (7 items), 0 at sf0.001 (both engines "
    "agree). item_id leads the sort and is the join key: LIMIT-safe.",
    extra=_Q58_CTES,
)

# ---------------------------------------------------------------------------
# q60 — category item revenue across channels, IN-subquery on item_id
# ---------------------------------------------------------------------------


def _q60_branch(fact: str, p: str) -> str:
    return f"""(
    SELECT i_item_id, SUM({p}_ext_sales_price_cents) total_sales
    FROM {fact}, date_dim, customer_address, item
    WHERE i_item_id IN (SELECT i_item_id FROM item
                        WHERE i_category IN ('STANDARD'))
      AND {p}_item_sk = i_item_sk
      AND {p}_sold_date_sk = d_date_sk
      AND d_year = 1998
      AND d_moy = 9
      AND {p}_addr_sk = ca_address_sk
      AND ca_gmt_offset = -5
    GROUP BY i_item_id)"""


_Q60_CTES = (
    "ss AS {MAT} " + _q60_branch("store_sales", "ss")
    + ",\ncs AS {MAT} " + _q60_branch("catalog_sales", "cs")
    + ",\nws AS {MAT} " + _q60_branch("web_sales", "ws")
)

_tpcds(
    "tpcds_q60",
    ["store_sales", "catalog_sales", "web_sales", "date_dim",
     "customer_address", "item"],
    """
SELECT i_item_id, CAST(SUM(total_sales) AS BIGINT) AS total_sales
FROM (SELECT * FROM ss
      UNION ALL
      SELECT * FROM cs
      UNION ALL
      SELECT * FROM ws) tmp1
GROUP BY i_item_id
ORDER BY i_item_id, total_sales
LIMIT 100
""",
    "TPC-DS q60 (reference inputs/q60.sql): September revenue per item "
    "across the three channels for one category cohort ('Music' -> the "
    "derived 'STANDARD'), the item cohort applied through an "
    "uncorrelated IN subquery on i_item_id (q33's sibling keyed by id "
    "string instead of manufacturer). i_item_id is unique in the sort: "
    "LIMIT-safe.",
    extra=_Q60_CTES,
)

# ---------------------------------------------------------------------------
# q66 — warehouse 12-month sales/net pivot, web + catalog union
# ---------------------------------------------------------------------------


def _q66_branch(fact: str, p: str, sales_col: str, net_col: str) -> str:
    mon = lambda m, col, alias: (  # noqa: E731
        f"SUM(CASE WHEN d_moy = {m} THEN {col} ELSE 0 END) AS {alias}"
    )
    months = ["jan", "feb", "mar", "apr", "may", "jun",
              "jul", "aug", "sep", "oct", "nov", "dec"]
    sales = ",\n         ".join(
        mon(i + 1, f"{sales_col} * {p}_quantity", f"{m}_sales")
        for i, m in enumerate(months))
    nets = ",\n         ".join(
        mon(i + 1, f"{net_col} * {p}_quantity", f"{m}_net")
        for i, m in enumerate(months))
    return f"""(SELECT
         w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
         w_country,
         concat('carrier_1', ',', 'carrier_2') AS ship_carriers,
         d_year AS year_,
         {sales},
         {nets}
       FROM {fact}, warehouse, date_dim, time_dim, ship_mode
       WHERE {p}_warehouse_sk = w_warehouse_sk
         AND {p}_sold_date_sk = d_date_sk
         AND {p}_sold_time_sk = t_time_sk
         AND {p}_ship_mode_sk = sm_ship_mode_sk
         AND d_year = 1998
         AND t_time BETWEEN 30838 AND 30838 + 28800
         AND sm_carrier IN ('carrier_1', 'carrier_2')
       GROUP BY w_warehouse_name, w_warehouse_sq_ft, w_city, w_county,
         w_state, w_country, d_year)"""


_Q66_MONTHS = ["jan", "feb", "mar", "apr", "may", "jun",
               "jul", "aug", "sep", "oct", "nov", "dec"]
_Q66_OUTER = ",\n  ".join(
    [f"CAST(SUM({m}_sales) AS BIGINT) AS {m}_sales" for m in _Q66_MONTHS]
    + [f"SUM(CAST({m}_sales AS DOUBLE) / w_warehouse_sq_ft)"
       f" AS {m}_sales_per_sq_foot" for m in _Q66_MONTHS]
    + [f"CAST(SUM({m}_net) AS BIGINT) AS {m}_net" for m in _Q66_MONTHS]
)

_tpcds(
    "tpcds_q66",
    ["web_sales", "catalog_sales", "warehouse", "date_dim", "time_dim",
     "ship_mode"],
    f"""
SELECT
  w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
  w_country, ship_carriers, year_,
  {_Q66_OUTER}
FROM (
       {_q66_branch("web_sales", "ws", "ws_ext_sales_price_cents",
                    "ws_net_paid_cents")}
       UNION ALL
       {_q66_branch("catalog_sales", "cs", "cs_sales_price_cents",
                    "cs_net_paid_cents")}
     ) x
GROUP BY
  w_warehouse_name, w_warehouse_sq_ft, w_city, w_county, w_state,
  w_country, ship_carriers, year_
ORDER BY w_warehouse_name
LIMIT 100
""",
    "TPC-DS q66 (reference inputs/q66.sql): the 72-column warehouse "
    "pivot — 12 monthly sales, 12 sales-per-sq-ft, 12 net columns over "
    "a web+catalog UNION ALL, each branch sliced by an 8-hour "
    "sold-time band and a two-carrier ship-mode list. Quantities "
    "multiply exact cents (BIGINT); per-sq-ft sums divide AFTER the "
    "inner aggregate and the outer SUM has at most 2 operands per "
    "group (one per branch), so the double addition is order-proof. "
    "cs_net_paid_inc_tax -> cs_net_paid_cents; DHL/BARIAN -> the "
    "derived carrier_1/2. <= 5 warehouses: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q83 — return quantities balanced across channels for 3 anchor weeks
# ---------------------------------------------------------------------------


def _q83_items(cte: str, fact: str, p: str, qty: str) -> str:
    return f"""{cte} AS {{MAT}} (
  SELECT i_item_id item_id, CAST(SUM({p}_return_quantity) AS BIGINT) {qty}
  FROM {fact}, item, date_dim
  WHERE {p}_item_sk = i_item_sk
    AND d_date IN (SELECT d_date FROM date_dim
                   WHERE d_week_seq IN
                     (SELECT d_week_seq FROM date_dim
                      WHERE d_year = 1996))
    AND {p}_returned_date_sk = d_date_sk
  GROUP BY i_item_id)"""


_Q83_CTES = ",\n".join([
    _q83_items("sr_items", "store_returns", "sr", "sr_item_qty"),
    _q83_items("cr_items", "catalog_returns", "cr", "cr_item_qty"),
    _q83_items("wr_items", "web_returns", "wr", "wr_item_qty"),
])

_tpcds(
    "tpcds_q83",
    ["store_returns", "catalog_returns", "web_returns", "item",
     "date_dim"],
    """
SELECT
  sr_items.item_id,
  sr_item_qty,
  CAST(sr_item_qty AS DOUBLE) / (sr_item_qty + cr_item_qty + wr_item_qty)
    / 3.0 * 100 sr_dev,
  cr_item_qty,
  CAST(cr_item_qty AS DOUBLE) / (sr_item_qty + cr_item_qty + wr_item_qty)
    / 3.0 * 100 cr_dev,
  wr_item_qty,
  CAST(wr_item_qty AS DOUBLE) / (sr_item_qty + cr_item_qty + wr_item_qty)
    / 3.0 * 100 wr_dev,
  CAST(sr_item_qty + cr_item_qty + wr_item_qty AS DOUBLE) / 3.0 average
FROM sr_items, cr_items, wr_items
WHERE sr_items.item_id = cr_items.item_id
  AND sr_items.item_id = wr_items.item_id
ORDER BY sr_items.item_id, sr_item_qty
LIMIT 100
""",
    "TPC-DS q83 (reference inputs/q83.sql): per-item return quantities "
    "across the three return facts for an anchor-week cohort, resolved "
    "through a doubly nested d_week_seq IN subquery. The reference's 3 "
    "anchor dates select 3 weeks — structurally empty even at sf0.01 "
    "(an item must be returned through ALL three channels inside them), "
    "so the cohort is widened to the weeks of 1996 (11 qualifying items "
    "at sf0.001, 129 at sf0.01) while keeping the nested-IN shape. The "
    "return date_sks are ship+14, whose dates the date_dim shim "
    "includes by construction. item_id is the join key and leads the "
    "sort: LIMIT-safe.",
    extra=_Q83_CTES,
)

# ---------------------------------------------------------------------------
# q94 — web orders shipped from multiple warehouses, never returned
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q94",
    ["web_sales", "web_returns", "date_dim", "customer_address",
     "web_site"],
    """
SELECT
  CAST(count(DISTINCT ws_order_number) AS BIGINT) AS order_count,
  CAST(SUM(ws_ext_ship_cost_cents) AS BIGINT) AS total_shipping_cost_cents,
  CAST(SUM(ws_net_profit_cents) AS BIGINT) AS total_net_profit_cents
FROM
  web_sales ws1, date_dim, customer_address, web_site
WHERE
  d_date BETWEEN DATE '1996-02-01' AND DATE '1996-07-30'
    AND ws1.ws_ship_date_sk = d_date_sk
    AND ws1.ws_ship_addr_sk = ca_address_sk
    AND ca_state = 'S05'
    AND ws1.ws_web_site_sk = web_site_sk
    AND web_company_name = 'pri'
    AND EXISTS(SELECT *
               FROM web_sales ws2
               WHERE ws1.ws_order_number = ws2.ws_order_number
                 AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)
    AND NOT EXISTS(SELECT *
                   FROM web_returns wr1
                   WHERE ws1.ws_order_number = wr1.wr_order_number)
ORDER BY order_count
LIMIT 100
""",
    "TPC-DS q94 (reference inputs/q94.sql): two-month web shipping "
    "stats over orders that shipped from at least two warehouses "
    "(correlated EXISTS with an inequality on the warehouse key) and "
    "were never returned (NOT EXISTS anti-join on the order number). "
    "ws_ship_addr_sk carries the shim's sparse NULLs — NULL addresses "
    "drop at the ca join in both engines. The 60-day window is widened "
    "to 180 days (state x company x multi-warehouse attrition leaves "
    "zero qualifying orders in any 60-day slice at sf0.01); endpoint "
    "written as a literal date; 'IL' -> derived state 'S05'. Single "
    "row: LIMIT-safe.",
)

# ===========================================================================
# round-6 batch 4: q2 q5 q9 q16 q22 q23a q23b q32 q44 q47 q67 q70 q87 q92 q99
# ===========================================================================

# ---------------------------------------------------------------------------
# q2 — web+catalog weekday pivot, 53-week year-over-year ratio
# ---------------------------------------------------------------------------

_Q2_DAYS = ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]
_Q2_NAMES = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
             "Friday", "Saturday"]

_Q2_CTES = ("""wscs AS {MAT} (
  SELECT sold_date_sk, sales_price
  FROM (SELECT ws_sold_date_sk sold_date_sk,
               ws_ext_sales_price_cents sales_price
        FROM web_sales) x
  UNION ALL
  (SELECT cs_sold_date_sk sold_date_sk,
          cs_ext_sales_price_cents sales_price
   FROM catalog_sales)),
wswscs AS {MAT} (
  SELECT d_week_seq,
         """ + ",\n         ".join(
    f"SUM(CASE WHEN (d_day_name = '{n}') THEN sales_price ELSE NULL END) "
    f"{d}_sales" for d, n in zip(_Q2_DAYS, _Q2_NAMES))
    + """
  FROM wscs, date_dim
  WHERE d_date_sk = sold_date_sk
  GROUP BY d_week_seq)""")

_tpcds(
    "tpcds_q2",
    ["web_sales", "catalog_sales", "date_dim"],
    """
SELECT
  d_week_seq1,
  """ + ",\n  ".join(
        f"CAST({d}_sales1 AS DOUBLE) / {d}_sales2 AS {d}_ratio"
        for d in _Q2_DAYS) + """
FROM
  (SELECT wswscs.d_week_seq d_week_seq1,
          """ + ",\n          ".join(
        f"{d}_sales {d}_sales1" for d in _Q2_DAYS) + """
  FROM wswscs, date_dim
  WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 1996) y,
  (SELECT wswscs.d_week_seq d_week_seq2,
          """ + ",\n          ".join(
        f"{d}_sales {d}_sales2" for d in _Q2_DAYS) + """
  FROM wswscs, date_dim
  WHERE date_dim.d_week_seq = wswscs.d_week_seq AND d_year = 1996 + 1) z
WHERE d_week_seq1 = d_week_seq2 - 53
ORDER BY d_week_seq1
""",
    "TPC-DS q2 (reference inputs/q2.sql): web+catalog weekday revenue "
    "pivot per week, the two years' pivots self-joined at a 53-week "
    "offset. Weekday sums are exact cents; ratios are single IEEE "
    "divisions (the reference's round(x, 2) is dropped — cross-engine "
    "half-tie rounding is the one non-reproducible step — and the raw "
    "double is compared instead). d_week_seq joins the pivot back to "
    "date_dim exactly as in the reference. ~52 rows keyed by "
    "d_week_seq1: deterministic, no LIMIT in the reference.",
    extra=_Q2_CTES,
)

# ---------------------------------------------------------------------------
# q5 — sales+returns rollup across store/catalog-page/web-site id spaces
# ---------------------------------------------------------------------------

_Q5_DATES = "d_date BETWEEN DATE '1996-08-23' AND DATE '1996-09-06'"

_Q5_CTES = f"""ssr AS {{MAT}} (
  SELECT s_store_id,
         SUM(sales_price) AS sales, SUM(profit) AS profit,
         SUM(return_amt) AS returns_amt, SUM(net_loss) AS profit_loss
  FROM
    (SELECT ss_store_sk AS store_sk, ss_sold_date_sk AS date_sk,
            ss_ext_sales_price_cents AS sales_price,
            ss_net_profit_cents AS profit,
            CAST(0 AS BIGINT) AS return_amt, CAST(0 AS BIGINT) AS net_loss
     FROM store_sales
     UNION ALL
     SELECT sr_store_sk AS store_sk, sr_returned_date_sk AS date_sk,
            CAST(0 AS BIGINT) AS sales_price, CAST(0 AS BIGINT) AS profit,
            sr_return_amt_cents AS return_amt,
            sr_net_loss_cents AS net_loss
     FROM store_returns) salesreturns, date_dim, store
  WHERE date_sk = d_date_sk
    AND {_Q5_DATES}
    AND store_sk = s_store_sk
  GROUP BY s_store_id),
csr AS {{MAT}} (
  SELECT cp_catalog_page_id,
         SUM(sales_price) AS sales, SUM(profit) AS profit,
         SUM(return_amt) AS returns_amt, SUM(net_loss) AS profit_loss
  FROM
    (SELECT cs_catalog_page_sk AS page_sk, cs_sold_date_sk AS date_sk,
            cs_ext_sales_price_cents AS sales_price,
            cs_net_profit_cents AS profit,
            CAST(0 AS BIGINT) AS return_amt, CAST(0 AS BIGINT) AS net_loss
     FROM catalog_sales
     UNION ALL
     SELECT cr_catalog_page_sk AS page_sk, cr_returned_date_sk AS date_sk,
            CAST(0 AS BIGINT) AS sales_price, CAST(0 AS BIGINT) AS profit,
            cr_return_amount_cents AS return_amt,
            cr_net_loss_cents AS net_loss
     FROM catalog_returns) salesreturns, date_dim, catalog_page
  WHERE date_sk = d_date_sk
    AND {_Q5_DATES}
    AND page_sk = cp_catalog_page_sk
  GROUP BY cp_catalog_page_id),
wsr AS {{MAT}} (
  SELECT web_site_id,
         SUM(sales_price) AS sales, SUM(profit) AS profit,
         SUM(return_amt) AS returns_amt, SUM(net_loss) AS profit_loss
  FROM
    (SELECT ws_web_site_sk AS wsr_web_site_sk, ws_sold_date_sk AS date_sk,
            ws_ext_sales_price_cents AS sales_price,
            ws_net_profit_cents AS profit,
            CAST(0 AS BIGINT) AS return_amt, CAST(0 AS BIGINT) AS net_loss
     FROM web_sales
     UNION ALL
     SELECT ws_web_site_sk AS wsr_web_site_sk,
            wr_returned_date_sk AS date_sk,
            CAST(0 AS BIGINT) AS sales_price, CAST(0 AS BIGINT) AS profit,
            wr_return_amt_cents AS return_amt,
            wr_net_loss_cents AS net_loss
     FROM web_returns
       LEFT OUTER JOIN web_sales ON
         (wr_item_sk = ws_item_sk AND wr_order_number = ws_order_number)
    ) salesreturns, date_dim, web_site
  WHERE date_sk = d_date_sk
    AND {_Q5_DATES}
    AND wsr_web_site_sk = web_site_sk
  GROUP BY web_site_id)"""

_tpcds(
    "tpcds_q5",
    ["store_sales", "store_returns", "catalog_sales", "catalog_returns",
     "web_sales", "web_returns", "date_dim", "store", "catalog_page",
     "web_site"],
    """
SELECT channel, id,
       CAST(SUM(sales) AS BIGINT) AS sales_cents,
       CAST(SUM(returns_amt) AS BIGINT) AS returns_cents,
       CAST(SUM(profit) AS BIGINT) AS profit_cents
FROM
  (SELECT 'store channel' AS channel, concat('store', s_store_id) AS id,
          sales, returns_amt, (profit - profit_loss) AS profit
   FROM ssr
   UNION ALL
   SELECT 'catalog channel' AS channel,
          concat('catalog_page', cp_catalog_page_id) AS id,
          sales, returns_amt, (profit - profit_loss) AS profit
   FROM csr
   UNION ALL
   SELECT 'web channel' AS channel, concat('web_site', web_site_id) AS id,
          sales, returns_amt, (profit - profit_loss) AS profit
   FROM wsr
  ) x
GROUP BY ROLLUP (channel, id)
ORDER BY channel, id
LIMIT 100
""",
    "TPC-DS q5 (reference inputs/q5.sql): 14-day sales+returns per "
    "channel over three different id spaces (store id, catalog page id, "
    "web site id), each channel a sales/returns UNION ALL with "
    "zero-filled counterpart columns, the web returns resolved to their "
    "originating site through the sale they return. RETURNS keyword "
    "alias -> returns_amt (identifier in both engines); DECIMAL(7,2) "
    "zeros -> BIGINT cents. <= ~38 rollup rows < LIMIT, so cross-engine "
    "NULLS ordering cannot bite.",
    extra=_Q5_CTES,
)

# ---------------------------------------------------------------------------
# q9 — five quantity-band scalar-subquery buckets from one reason row
# ---------------------------------------------------------------------------


def _q9_bucket(i: int, lo: int, hi: int, branch: str) -> str:
    # threshold rigged per-bucket so both CASE branches are exercised at
    # every SF: odd buckets always take THEN (count > 0), even buckets
    # always ELSE (count never exceeds 10^15)
    thresh = "0" if branch == "then" else "1000000000000000"
    return f"""CASE WHEN (SELECT count(*) FROM store_sales
  WHERE ss_quantity BETWEEN {lo} AND {hi}) > {thresh}
    THEN (SELECT CAST(SUM(ss_ext_discount_amt_cents) AS DOUBLE) / COUNT(*)
    FROM store_sales
    WHERE ss_quantity BETWEEN {lo} AND {hi})
  ELSE (SELECT CAST(SUM(ss_net_paid_cents) AS DOUBLE) / COUNT(*)
  FROM store_sales
  WHERE ss_quantity BETWEEN {lo} AND {hi}) END bucket{i}"""


_tpcds(
    "tpcds_q9",
    ["store_sales", "reason"],
    "SELECT\n  " + ",\n  ".join(
        _q9_bucket(i, lo, hi, b)
        for i, (lo, hi, b) in enumerate(
            [(1, 20, "then"), (21, 40, "else"), (41, 60, "then"),
             (61, 80, "else"), (81, 100, "then")], start=1)
    ) + "\nFROM reason\nWHERE r_reason_sk = 1\n",
    "TPC-DS q9 (reference inputs/q9.sql): five quantity-band buckets, "
    "each a CASE over three scalar subqueries (count gate, discount "
    "average, net-paid average) hung off a single reason row — 15 "
    "scalar subqueries in one projection. avg() is expanded to exact "
    "BIGINT SUM / COUNT with one IEEE division so the doubles are "
    "bit-equal. The reference's row-count gates target SF100 "
    "cardinalities; they are rigged per-bucket (0 / 10^15) so both "
    "branches execute at every test SF. Single row.",
)

# ---------------------------------------------------------------------------
# q16 — catalog orders shipped from multiple warehouses, never returned
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q16",
    ["catalog_sales", "catalog_returns", "date_dim", "customer_address",
     "call_center"],
    """
SELECT
  CAST(count(DISTINCT cs_order_number) AS BIGINT) AS order_count,
  CAST(SUM(cs_ext_ship_cost_cents) AS BIGINT) AS total_shipping_cost_cents,
  CAST(SUM(cs_net_profit_cents) AS BIGINT) AS total_net_profit_cents
FROM
  catalog_sales cs1, date_dim, customer_address, call_center
WHERE
  d_date BETWEEN DATE '1996-02-01' AND DATE '1996-04-01'
    AND cs1.cs_ship_date_sk = d_date_sk
    AND cs1.cs_ship_addr_sk = ca_address_sk
    AND ca_state = 'S03'
    AND cs1.cs_call_center_sk = cc_call_center_sk
    AND cc_county IN ('county_1', 'county_1', 'county_1', 'county_1',
                      'county_1')
    AND EXISTS(SELECT *
               FROM catalog_sales cs2
               WHERE cs1.cs_order_number = cs2.cs_order_number
                 AND cs1.cs_warehouse_sk <> cs2.cs_warehouse_sk)
    AND NOT EXISTS(SELECT *
                   FROM catalog_returns cr1
                   WHERE cs1.cs_order_number = cr1.cr_order_number)
ORDER BY order_count
LIMIT 100
""",
    "TPC-DS q16 (reference inputs/q16.sql): q94's catalog twin — "
    "multi-warehouse EXISTS, never-returned NOT EXISTS, 60-day ship "
    "window, but sliced by call-center county (the repeated-literal IN "
    "list kept verbatim). 'GA' -> derived 'S03'; Williamson County -> "
    "county_1. Single row: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q22 — four-level product ROLLUP over a year of inventory
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q22",
    ["inventory", "date_dim", "item", "warehouse"],
    """
SELECT
  i_product_name, i_brand, i_class, i_category,
  CAST(SUM(inv_quantity_on_hand) AS DOUBLE) / COUNT(*) AS qoh
FROM inventory, date_dim, item, warehouse
WHERE inv_date_sk = d_date_sk
  AND inv_item_sk = i_item_sk
  AND inv_warehouse_sk = w_warehouse_sk
  AND d_month_seq BETWEEN 23952 AND 23952 + 11
GROUP BY ROLLUP (i_product_name, i_brand, i_class, i_category)
ORDER BY qoh, COALESCE(i_product_name, ''), COALESCE(i_brand, ''),
  COALESCE(i_class, ''), COALESCE(i_category, '')
LIMIT 100
""",
    "TPC-DS q22 (reference inputs/q22.sql): average quantity-on-hand "
    "over a 4-level product ROLLUP of a year of inventory. avg() is "
    "exact SUM/COUNT in one IEEE division. The result far exceeds the "
    "LIMIT and rollup rows carry NULL group keys, so every sort "
    "tiebreaker is COALESCEd to '' — Spark (NULLS FIRST) and DuckDB "
    "(NULLS LAST) would otherwise cut different rows. qoh leads the "
    "sort as in the reference.",
)

# ---------------------------------------------------------------------------
# q32 / q92 — excess-discount hunts via correlated 1.3*avg subqueries
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q32",
    ["catalog_sales", "item", "date_dim"],
    """
SELECT CAST(1 AS INT) AS excess_discount_amount
FROM
  catalog_sales, item, date_dim
WHERE
  i_manufact_id = 19
    AND i_item_sk = cs_item_sk
    AND d_date BETWEEN DATE '1996-01-27' AND DATE '1996-04-26'
    AND d_date_sk = cs_sold_date_sk
    AND cs_ext_discount_amt_cents > (
    SELECT 1.3 * (CAST(SUM(cs_ext_discount_amt_cents) AS DOUBLE)
                  / COUNT(*))
    FROM catalog_sales, date_dim
    WHERE cs_item_sk = i_item_sk
      AND d_date BETWEEN DATE '1996-01-27' AND DATE '1996-04-26'
      AND d_date_sk = cs_sold_date_sk)
LIMIT 100
""",
    "TPC-DS q32 (reference inputs/q32.sql): catalog rows whose discount "
    "exceeds 1.3x the item's own 90-day average — a correlated scalar "
    "aggregate under an inequality. avg -> exact SUM/COUNT + one IEEE "
    "multiply. Every output row is the literal 1, so the LIMIT's choice "
    "of rows is value-irrelevant. Manufacturer 977 -> 19 (derived "
    "domain); 90-day INTERVAL endpoint as a literal.",
)

_tpcds(
    "tpcds_q92",
    ["web_sales", "item", "date_dim"],
    """
SELECT CAST(SUM(ws_ext_discount_amt_cents) AS BIGINT)
    AS excess_discount_amount_cents
FROM web_sales, item, date_dim
WHERE i_manufact_id = 19
  AND i_item_sk = ws_item_sk
  AND d_date BETWEEN DATE '1996-01-27' AND DATE '1996-04-26'
  AND d_date_sk = ws_sold_date_sk
  AND ws_ext_discount_amt_cents >
  (
    SELECT 1.3 * (CAST(SUM(ws_ext_discount_amt_cents) AS DOUBLE)
                  / COUNT(*))
    FROM web_sales, date_dim
    WHERE ws_item_sk = i_item_sk
      AND d_date BETWEEN DATE '1996-01-27' AND DATE '1996-04-26'
      AND d_date_sk = ws_sold_date_sk
  )
ORDER BY excess_discount_amount_cents
LIMIT 100
""",
    "TPC-DS q92 (reference inputs/q92.sql): q32's web twin that SUMs "
    "the excess discounts instead of flagging rows — correlated "
    "1.3*avg subquery feeding a single-row aggregate. Single row: "
    "LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q87 — EXCEPT chain: store shoppers minus catalog minus web
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q87",
    ["store_sales", "catalog_sales", "web_sales", "date_dim",
     "customer_dim"],
    """
SELECT CAST(count(*) AS BIGINT) AS cnt
FROM ((SELECT DISTINCT c_last_name, c_first_name, d_date
FROM store_sales, date_dim, customer_dim
WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
  AND store_sales.ss_customer_sk = customer_dim.c_customer_sk
  AND d_month_seq BETWEEN 23952 AND 23952 + 11)
      EXCEPT
      (SELECT DISTINCT c_last_name, c_first_name, d_date
      FROM catalog_sales, date_dim, customer_dim
      WHERE catalog_sales.cs_sold_date_sk = date_dim.d_date_sk
        AND catalog_sales.cs_bill_customer_sk = customer_dim.c_customer_sk
        AND d_month_seq BETWEEN 23952 AND 23952 + 11)
      EXCEPT
      (SELECT DISTINCT c_last_name, c_first_name, d_date
      FROM web_sales, date_dim, customer_dim
      WHERE web_sales.ws_sold_date_sk = date_dim.d_date_sk
        AND web_sales.ws_bill_customer_sk = customer_dim.c_customer_sk
        AND d_month_seq BETWEEN 23952 AND 23952 + 11)
     ) cool_cust
""",
    "TPC-DS q87 (reference inputs/q87.sql): store-only shopper-days — "
    "q38's EXCEPT-chain sibling (set difference twice, then a bare "
    "count; both engines implement EXCEPT with DISTINCT semantics). "
    "Single row, no LIMIT in the reference.",
)

# ---------------------------------------------------------------------------
# q99 — catalog shipping-latency buckets by warehouse x mode x call center
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q99",
    ["catalog_sales", "warehouse", "ship_mode", "call_center", "date_dim"],
    """
SELECT
  substr(w_warehouse_name, 1, 20) AS warehouse_name,
  sm_type, cc_name,
  CAST(SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk <= 30)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_30,
  CAST(SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 30) AND
    (cs_ship_date_sk - cs_sold_date_sk <= 60)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_31_60,
  CAST(SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 60) AND
    (cs_ship_date_sk - cs_sold_date_sk <= 90)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_61_90,
  CAST(SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 90) AND
    (cs_ship_date_sk - cs_sold_date_sk <= 120)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_91_120,
  CAST(SUM(CASE WHEN (cs_ship_date_sk - cs_sold_date_sk > 120)
    THEN 1 ELSE 0 END) AS BIGINT) AS days_over_120
FROM
  catalog_sales, warehouse, ship_mode, call_center, date_dim
WHERE
  d_month_seq BETWEEN 23952 AND 23952 + 11
    AND cs_ship_date_sk = d_date_sk
    AND cs_warehouse_sk = w_warehouse_sk
    AND cs_ship_mode_sk = sm_ship_mode_sk
    AND cs_call_center_sk = cc_call_center_sk
GROUP BY substr(w_warehouse_name, 1, 20), sm_type, cc_name
ORDER BY warehouse_name, sm_type, cc_name
LIMIT 100
""",
    "TPC-DS q99 (reference inputs/q99.sql): q62's catalog twin — "
    "order-to-ship latency histogram by warehouse x ship mode x call "
    "center. 5x5x4 = 100 possible groups with the full unique group "
    "key as the sort: deterministic under LIMIT.",
)

# ---------------------------------------------------------------------------
# q23a / q23b — frequent items x best customers cross-channel spend
# ---------------------------------------------------------------------------

_Q23_CTES = """frequent_ss_items AS {MAT} (
  SELECT substr(i_item_desc, 1, 30) itemdesc, i_item_sk item_sk,
         d_date solddate, count(*) cnt
  FROM store_sales, date_dim, item
  WHERE ss_sold_date_sk = d_date_sk
    AND ss_item_sk = i_item_sk
    AND d_year IN (1996, 1996 + 1, 1996 + 2, 1996 + 3)
  GROUP BY substr(i_item_desc, 1, 30), i_item_sk, d_date
  HAVING count(*) > 1),
max_store_sales AS {MAT} (
  SELECT max(csales) tpcds_cmax
  FROM (SELECT c_customer_sk,
               SUM(CAST(ss_quantity AS BIGINT) * ss_sales_price_cents)
                   csales
  FROM store_sales, customer_dim, date_dim
  WHERE ss_customer_sk = c_customer_sk
    AND ss_sold_date_sk = d_date_sk
    AND d_year IN (1996, 1996 + 1, 1996 + 2, 1996 + 3)
  GROUP BY c_customer_sk) x),
best_ss_customer AS {MAT} (
  SELECT c_customer_sk,
         SUM(CAST(ss_quantity AS BIGINT) * ss_sales_price_cents) ssales
  FROM store_sales, customer_dim
  WHERE ss_customer_sk = c_customer_sk
  GROUP BY c_customer_sk
  HAVING SUM(CAST(ss_quantity AS BIGINT) * ss_sales_price_cents)
         > (50 / 100.0) * (SELECT * FROM max_store_sales))"""

_tpcds(
    "tpcds_q23a",
    ["store_sales", "catalog_sales", "web_sales", "date_dim", "item",
     "customer_dim"],
    """
SELECT CAST(SUM(sales) AS BIGINT) AS total_sales_cents
FROM ((SELECT CAST(cs_quantity AS BIGINT) * cs_list_price_cents sales
FROM catalog_sales, date_dim
WHERE d_year = 1996
  AND d_moy = 2
  AND cs_sold_date_sk = d_date_sk
  AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
  AND cs_bill_customer_sk IN (SELECT c_customer_sk FROM best_ss_customer))
      UNION ALL
      (SELECT CAST(ws_quantity AS BIGINT) * ws_list_price_cents sales
      FROM web_sales, date_dim
      WHERE d_year = 1996
        AND d_moy = 2
        AND ws_sold_date_sk = d_date_sk
        AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND ws_bill_customer_sk IN (SELECT c_customer_sk
                                    FROM best_ss_customer))) y
LIMIT 100
""",
    "TPC-DS q23a (reference inputs/q23a.sql): catalog+web February spend "
    "restricted to items sold multiple times on a single day over four "
    "years (the reference's >4 gate admits zero item-days below sf1 — "
    "retuned to >1, same shape) AND "
    "customers whose lifetime store spend exceeds half the best "
    "customer's — three stacked CTEs, a scalar SELECT * subquery in a "
    "HAVING, and two IN-subquery gates per branch. quantity x "
    "list-price in exact BIGINT cents; the 50/100.0 threshold is one "
    "IEEE multiply. Single row.",
    extra=_Q23_CTES,
    tags=("bench",),
)

_tpcds(
    "tpcds_q23b",
    ["store_sales", "catalog_sales", "web_sales", "date_dim", "item",
     "customer_dim"],
    """
SELECT c_last_name, c_first_name, CAST(sales AS BIGINT) AS sales_cents
FROM ((SELECT c_last_name, c_first_name,
              SUM(CAST(cs_quantity AS BIGINT) * cs_list_price_cents) sales
FROM catalog_sales, customer_dim, date_dim
WHERE d_year = 1996
  AND d_moy = 2
  AND cs_sold_date_sk = d_date_sk
  AND cs_item_sk IN (SELECT item_sk FROM frequent_ss_items)
  AND cs_bill_customer_sk IN (SELECT c_customer_sk FROM best_ss_customer)
  AND cs_bill_customer_sk = c_customer_sk
GROUP BY c_last_name, c_first_name)
      UNION ALL
      (SELECT c_last_name, c_first_name,
              SUM(CAST(ws_quantity AS BIGINT) * ws_list_price_cents) sales
      FROM web_sales, customer_dim, date_dim
      WHERE d_year = 1996
        AND d_moy = 2
        AND ws_sold_date_sk = d_date_sk
        AND ws_item_sk IN (SELECT item_sk FROM frequent_ss_items)
        AND ws_bill_customer_sk IN (SELECT c_customer_sk
                                    FROM best_ss_customer)
        AND ws_bill_customer_sk = c_customer_sk
      GROUP BY c_last_name, c_first_name)) y
ORDER BY c_last_name, c_first_name, sales_cents
LIMIT 100
""",
    "TPC-DS q23b (reference inputs/q23b.sql): q23a broken out per "
    "customer name — the same CTE stack, per-branch GROUP BY, UNION "
    "ALL kept (a customer buying through both channels appears twice, "
    "as in the reference). (last, first) is 1:1 with the customer "
    "(derived from the unique c_name) and sales breaks the branch tie: "
    "LIMIT-safe.",
    extra=_Q23_CTES,
)

# ---------------------------------------------------------------------------
# q44 — best/worst performing items by store, dual rank join
# ---------------------------------------------------------------------------

_Q44_AVG = ("CAST(SUM(ss_net_profit_cents) AS DOUBLE) / COUNT(*)")

_tpcds(
    "tpcds_q44",
    ["store_sales", "item"],
    f"""
SELECT
  asceding.rnk,
  i1.i_product_name best_performing,
  i2.i_product_name worst_performing
FROM (SELECT *
FROM (SELECT
  item_sk,
  CAST(rank() OVER (ORDER BY rank_col ASC) AS INT) rnk
FROM (SELECT
  ss_item_sk item_sk,
  {_Q44_AVG} rank_col
FROM store_sales ss1
WHERE ss_store_sk = 4
GROUP BY ss_item_sk
HAVING {_Q44_AVG} > 0.9 * (SELECT {_Q44_AVG} rank_col
FROM store_sales
WHERE ss_store_sk = 4
  AND ss_addr_sk IS NULL
GROUP BY ss_store_sk)) V1) V11
WHERE rnk < 11) asceding,
  (SELECT *
  FROM (SELECT
    item_sk,
    CAST(rank() OVER (ORDER BY rank_col DESC) AS INT) rnk
  FROM (SELECT
    ss_item_sk item_sk,
    {_Q44_AVG} rank_col
  FROM store_sales ss1
  WHERE ss_store_sk = 4
  GROUP BY ss_item_sk
  HAVING {_Q44_AVG} > 0.9 * (SELECT {_Q44_AVG} rank_col
  FROM store_sales
  WHERE ss_store_sk = 4
    AND ss_addr_sk IS NULL
  GROUP BY ss_store_sk)) V2) V21
  WHERE rnk < 11) descending,
  item i1, item i2
WHERE asceding.rnk = descending.rnk
  AND i1.i_item_sk = asceding.item_sk
  AND i2.i_item_sk = descending.item_sk
ORDER BY asceding.rnk
LIMIT 100
""",
    "TPC-DS q44 (reference inputs/q44.sql): rank items of one store by "
    "average profit ascending AND descending, join the two rankings on "
    "rank position. The correlated baseline is the store's average "
    "profit over NULL-address rows — the shim injects sparse NULLs "
    "into ss_addr_sk precisely so this scalar subquery is non-empty. "
    "avg() -> exact SUM/COUNT. Equal rank_col values share a rank and "
    "fan out in the join identically in both engines (order-insensitive "
    "compare). <= ~10 ranks: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q47 — monthly brand-store deviation with manual lag/lead self-joins
# ---------------------------------------------------------------------------

_Q47_V1 = """v1 AS {MAT} (
  SELECT
    i_category, i_brand, s_store_name, s_company_name, d_year, d_moy,
    CAST(SUM(ss_sales_price_cents) AS BIGINT) sum_sales,
    avg(SUM(ss_sales_price_cents))
    OVER (PARTITION BY i_category, i_brand, s_store_name, s_company_name,
          d_year) avg_monthly_sales,
    CAST(rank() OVER (PARTITION BY i_category, i_brand, s_store_name,
                      s_company_name
                      ORDER BY d_year, d_moy) AS INT) rn
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk AND
    ss_sold_date_sk = d_date_sk AND
    ss_store_sk = s_store_sk AND
    (
      d_year = 1997 OR
        (d_year = 1997 - 1 AND d_moy = 12) OR
        (d_year = 1997 + 1 AND d_moy = 1)
    )
  GROUP BY i_category, i_brand, s_store_name, s_company_name,
    d_year, d_moy),
v2 AS {MAT} (
    SELECT
      v1.i_category, v1.i_brand, v1.s_store_name, v1.s_company_name,
      v1.d_year, v1.d_moy,
      CAST(v1.avg_monthly_sales AS DOUBLE) avg_monthly_sales,
      v1.sum_sales,
      v1_lag.sum_sales psum,
      v1_lead.sum_sales nsum
    FROM v1, v1 v1_lag, v1 v1_lead
    WHERE v1.i_category = v1_lag.i_category AND
      v1.i_category = v1_lead.i_category AND
      v1.i_brand = v1_lag.i_brand AND
      v1.i_brand = v1_lead.i_brand AND
      v1.s_store_name = v1_lag.s_store_name AND
      v1.s_store_name = v1_lead.s_store_name AND
      v1.s_company_name = v1_lag.s_company_name AND
      v1.s_company_name = v1_lead.s_company_name AND
      v1.rn = v1_lag.rn + 1 AND
      v1.rn = v1_lead.rn - 1)"""

_tpcds(
    "tpcds_q47",
    ["item", "store_sales", "date_dim", "store"],
    """
SELECT *
FROM v2
WHERE d_year = 1997 AND
  avg_monthly_sales > 0 AND
  CASE WHEN avg_monthly_sales > 0
    THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
  ELSE NULL END > 0.1
ORDER BY sum_sales - avg_monthly_sales, s_store_name, i_category,
  i_brand, d_moy
LIMIT 100
""",
    "TPC-DS q47 (reference inputs/q47.sql): months where a brand-store "
    "deviates >10% from its year average — a window-averaged grouped "
    "aggregate whose neighbor months come from rn+-1 SELF-JOINS (the "
    "manual lag/lead idiom). AVG over BIGINT window partitions is "
    "exact-int-sum / count in both engines, then pinned to DOUBLE. The "
    "reference sorts by (deviation, 3); brand and month are appended "
    "because equal deviations occur (group key makes it unique): "
    "LIMIT-safe.",
    extra=_Q47_V1,
)

# ---------------------------------------------------------------------------
# q67 — rank items inside category over an 8-level ROLLUP
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q67",
    ["store_sales", "date_dim", "store", "item"],
    """
SELECT *
FROM
  (SELECT
    i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy,
    s_store_id, sumsales,
    CAST(rank() OVER (PARTITION BY i_category
                      ORDER BY sumsales DESC) AS INT) rk
  FROM
    (SELECT
      i_category, i_class, i_brand, i_product_name, d_year, d_qoy,
      d_moy, s_store_id,
      CAST(SUM(COALESCE(CAST(ss_quantity AS BIGINT)
                        * ss_sales_price_cents, 0)) AS BIGINT) sumsales
    FROM store_sales, date_dim, store, item
    WHERE ss_sold_date_sk = d_date_sk
      AND ss_item_sk = i_item_sk
      AND ss_store_sk = s_store_sk
      AND d_month_seq BETWEEN 23952 AND 23952 + 11
    GROUP BY ROLLUP (i_category, i_class, i_brand, i_product_name,
      d_year, d_qoy, d_moy, s_store_id)) dw1) dw2
WHERE rk <= 100
ORDER BY
  COALESCE(i_category, ''), COALESCE(i_class, ''), COALESCE(i_brand, ''),
  COALESCE(i_product_name, ''), COALESCE(d_year, -1),
  COALESCE(d_qoy, -1), COALESCE(d_moy, -1), COALESCE(s_store_id, ''),
  sumsales, rk
LIMIT 100
""",
    "TPC-DS q67 (reference inputs/q67.sql): top-100 revenue rows per "
    "category over an EIGHT-level ROLLUP (product hierarchy x calendar "
    "x store), ranked by a category-partitioned window — the heaviest "
    "rollup in the corpus (9 grouping sets). sumsales ties share ranks "
    "identically cross-engine (exact cents). The result exceeds the "
    "LIMIT, so every nullable sort key is COALESCEd ('' / -1, sorting "
    "where NULL-as-lowest would) to neutralize Spark-vs-DuckDB NULL "
    "ordering; key order follows the reference.",
    tags=("bench",),
)

# ---------------------------------------------------------------------------
# q70 — state/county profit ROLLUP gated by a windowed top-5-state subquery
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q70",
    ["store_sales", "date_dim", "store"],
    """
SELECT
  CAST(SUM(ss_net_profit_cents) AS BIGINT) AS total_sum_cents,
  s_state, s_county,
  CAST(grouping(s_state) + grouping(s_county) AS INT) AS lochierarchy,
  CAST(rank() OVER (
    PARTITION BY grouping(s_state) + grouping(s_county),
      CASE WHEN grouping(s_county) = 0 THEN s_state END
    ORDER BY SUM(ss_net_profit_cents) DESC) AS INT) AS rank_within_parent
FROM
  store_sales, date_dim d1, store
WHERE
  d1.d_month_seq BETWEEN 23952 AND 23952 + 11
    AND d1.d_date_sk = ss_sold_date_sk
    AND s_store_sk = ss_store_sk
    AND s_state IN
    (SELECT s_state
    FROM
      (SELECT
        s_state AS s_state,
        CAST(rank() OVER (PARTITION BY s_state
          ORDER BY SUM(ss_net_profit_cents) DESC) AS INT) AS ranking
      FROM store_sales, store, date_dim
      WHERE d_month_seq BETWEEN 23952 AND 23952 + 11
        AND d_date_sk = ss_sold_date_sk
        AND s_store_sk = ss_store_sk
      GROUP BY s_state) tmp1
    WHERE ranking <= 5)
GROUP BY ROLLUP (s_state, s_county)
ORDER BY
  lochierarchy DESC
  , CASE WHEN lochierarchy = 0 THEN s_state END
  , rank_within_parent
LIMIT 100
""",
    "TPC-DS q70 (reference inputs/q70.sql): state/county profit ROLLUP "
    "where the state cohort itself comes from a windowed rank subquery "
    "inside an IN — grouping()-driven rank partitioning like q36, plus "
    "a second rank window nested in the WHERE. <= ~26 rollup rows < "
    "LIMIT, so NULL group keys never reach an ambiguous cut.",
)

# ---------------------------------------------------------------------------
# round 7: the remaining 47 corpus queries (VERDICT r6 "what's missing" #1)
# ---------------------------------------------------------------------------
# q12 / q20 — per-item revenue share of its class over a 30-day window
# ---------------------------------------------------------------------------


def _q12_like(name: str, fact: str, p: str, qnum: str) -> None:
    _tpcds(
        name,
        [fact, "item", "date_dim"],
        f"""
SELECT
  i_item_desc, i_category, i_class, i_current_price_cents,
  CAST(SUM({p}_ext_sales_price_cents) AS BIGINT) AS itemrevenue_cents,
  CAST(SUM({p}_ext_sales_price_cents) * 100 AS DOUBLE)
    / SUM(SUM({p}_ext_sales_price_cents)) OVER (PARTITION BY i_class)
    AS revenueratio
FROM {fact}, item, date_dim
WHERE {p}_item_sk = i_item_sk
  AND i_category IN ('ECONOMY', 'SMALL', 'LARGE')
  AND {p}_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '1996-02-22' AND DATE '1996-03-23'
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price_cents
ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio
LIMIT 100
""",
        f"TPC-DS {qnum} (reference inputs/{qnum}.sql): item revenue and "
        "its share of class revenue (a windowed sum-over-sum) across a "
        "30-day window. The ratio is one IEEE division of two exact "
        "BIGINT cent sums. Categories/date retuned to the derived "
        "domains; i_item_id in the group key makes rows unique under "
        "the reference sort: LIMIT-safe.",
    )


_q12_like("tpcds_q12", "web_sales", "ws", "q12")
_q12_like("tpcds_q20", "catalog_sales", "cs", "q20")

# ---------------------------------------------------------------------------
# q52 / q55 — November brand ext-price stars (q3 family)
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q52",
    ["date_dim", "store_sales", "item"],
    """
SELECT dt.d_year, item.i_brand_id AS brand_id, item.i_brand AS brand,
       CAST(SUM(ss_ext_sales_price_cents) AS BIGINT) AS ext_price_cents
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manager_id = 1
  AND dt.d_moy = 11
  AND dt.d_year = 1998
GROUP BY dt.d_year, item.i_brand, item.i_brand_id
ORDER BY dt.d_year, ext_price_cents DESC, brand_id
LIMIT 100
""",
    "TPC-DS q52 (reference inputs/q52.sql): q3's star pinned to one "
    "manager and year (2000 -> 1998, the derived domain). brand_id is "
    "unique per group under the sort: LIMIT-safe.",
)

_tpcds(
    "tpcds_q55",
    ["date_dim", "store_sales", "item"],
    """
SELECT i_brand_id AS brand_id, i_brand AS brand,
       CAST(SUM(ss_ext_sales_price_cents) AS BIGINT) AS ext_price_cents
FROM date_dim, store_sales, item
WHERE d_date_sk = ss_sold_date_sk
  AND ss_item_sk = i_item_sk
  AND i_manager_id = 14
  AND d_moy = 11
  AND d_year = 1997
GROUP BY i_brand, i_brand_id
ORDER BY ext_price_cents DESC, brand_id
LIMIT 100
""",
    "TPC-DS q55 (reference inputs/q55.sql): brand ext-price for one "
    "manager-month (manager 28 -> 14: derived managers are 1..20; year "
    "1999 -> 1997). brand_id unique per group: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q53 / q63 — deviation from windowed average over quarters / months
# ---------------------------------------------------------------------------

_Q53_ITEM_OR = """((i_category IN ('ECONOMY', 'SMALL', 'MEDIUM') AND
      i_class IN ('class_0', 'class_1', 'class_2', 'class_3') AND
      i_brand IN ('Brand#1', 'Brand#3', 'Brand#5', 'Brand#7'))
      OR
      (i_category IN ('LARGE', 'STANDARD', 'PROMO') AND
        i_class IN ('class_1', 'class_2', 'class_3', 'class_4') AND
        i_brand IN ('Brand#2', 'Brand#4', 'Brand#6', 'Brand#8')))"""

_tpcds(
    "tpcds_q53",
    ["item", "store_sales", "date_dim", "store"],
    f"""
SELECT *
FROM
  (SELECT
    i_manufact_id,
    CAST(SUM(ss_sales_price_cents) AS BIGINT) sum_sales_cents,
    CAST(avg(SUM(ss_sales_price_cents))
         OVER (PARTITION BY i_manufact_id) AS DOUBLE) avg_quarterly_sales
  FROM item, store_sales, date_dim, store
  WHERE ss_item_sk = i_item_sk AND
    ss_sold_date_sk = d_date_sk AND
    ss_store_sk = s_store_sk AND
    d_month_seq IN (23952, 23953, 23954, 23955, 23956, 23957, 23958,
                    23959, 23960, 23961, 23962, 23963) AND
    {_Q53_ITEM_OR}
  GROUP BY i_manufact_id, d_qoy) tmp1
WHERE CASE WHEN avg_quarterly_sales > 0
  THEN abs(sum_sales_cents - avg_quarterly_sales) / avg_quarterly_sales
      ELSE NULL END > 0.1
ORDER BY avg_quarterly_sales, sum_sales_cents, i_manufact_id
LIMIT 100
""",
    "TPC-DS q53 (reference inputs/q53.sql): manufacturer-quarters that "
    "deviate >10% from the manufacturer's windowed average. month_seq "
    "1200.. -> 23952.. (year 1996 in the derived calendar); the "
    "category/class/brand OR-branches retuned to derived domains. The "
    "sort key is the whole output row, so a LIMIT cut can only split "
    "identical rows: multiset-safe.",
)

_tpcds(
    "tpcds_q63",
    ["item", "store_sales", "date_dim", "store"],
    f"""
SELECT *
FROM (SELECT
  i_manager_id,
  CAST(SUM(ss_sales_price_cents) AS BIGINT) sum_sales_cents,
  CAST(avg(SUM(ss_sales_price_cents))
       OVER (PARTITION BY i_manager_id) AS DOUBLE) avg_monthly_sales
FROM item, store_sales, date_dim, store
WHERE ss_item_sk = i_item_sk
  AND ss_sold_date_sk = d_date_sk
  AND ss_store_sk = s_store_sk
  AND d_month_seq IN (23952, 23953, 23954, 23955, 23956, 23957, 23958,
                      23959, 23960, 23961, 23962, 23963)
  AND {_Q53_ITEM_OR}
GROUP BY i_manager_id, d_moy) tmp1
WHERE CASE WHEN avg_monthly_sales > 0
  THEN abs(sum_sales_cents - avg_monthly_sales) / avg_monthly_sales
      ELSE NULL END > 0.1
ORDER BY i_manager_id, avg_monthly_sales, sum_sales_cents
LIMIT 100
""",
    "TPC-DS q63 (reference inputs/q63.sql): q53's shape per manager-"
    "month instead of manufacturer-quarter (the reference texts differ "
    "only in the group key and one typo'd class name). Sort key = whole "
    "row: multiset-safe under LIMIT.",
)

# ---------------------------------------------------------------------------
# q89 — brand-store months deviating from the yearly windowed average
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q89",
    ["item", "store_sales", "date_dim", "store"],
    """
SELECT *
FROM (
       SELECT
         i_category, i_class, i_brand,
         s_store_name, s_company_name, d_moy,
         CAST(SUM(ss_sales_price_cents) AS BIGINT) sum_sales_cents,
         CAST(avg(SUM(ss_sales_price_cents))
         OVER
         (PARTITION BY i_category, i_brand, s_store_name, s_company_name)
         AS DOUBLE) avg_monthly_sales
       FROM item, store_sales, date_dim, store
       WHERE ss_item_sk = i_item_sk AND
         ss_sold_date_sk = d_date_sk AND
         ss_store_sk = s_store_sk AND
         d_year IN (1998) AND
         ((i_category IN ('ECONOMY', 'MEDIUM', 'SMALL') AND
           i_class IN ('class_0', 'class_2', 'class_4'))
           OR (i_category IN ('LARGE', 'STANDARD', 'PROMO') AND
           i_class IN ('class_1', 'class_3', 'class_2')))
       GROUP BY i_category, i_class, i_brand,
         s_store_name, s_company_name, d_moy) tmp1
WHERE CASE WHEN (avg_monthly_sales <> 0)
  THEN (abs(sum_sales_cents - avg_monthly_sales) / avg_monthly_sales)
      ELSE NULL END > 0.1
ORDER BY sum_sales_cents - avg_monthly_sales, s_store_name,
  i_category, i_class, i_brand, d_moy
LIMIT 100
""",
    "TPC-DS q89 (reference inputs/q89.sql): brand-store months deviating "
    ">10% from the brand-store yearly average. The reference sorts only "
    "by (deviation, store); equal deviations occur, so the group key is "
    "appended (q47 convention) to make the cut deterministic.",
)

# ---------------------------------------------------------------------------
# q26 — catalog-side demographic star (q7's catalog twin)
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q26",
    ["catalog_sales", "customer_demographics", "date_dim", "item",
     "promotion"],
    """
SELECT i_item_id,
       CAST(SUM(cs_quantity) AS DOUBLE) / COUNT(*) AS agg1,
       CAST(SUM(cs_list_price_cents) AS DOUBLE) / COUNT(*) AS agg2,
       CAST(SUM(cs_coupon_amt_cents) AS DOUBLE) / COUNT(*) AS agg3,
       CAST(SUM(cs_sales_price_cents) AS DOUBLE) / COUNT(*) AS agg4
FROM catalog_sales, customer_demographics, date_dim, item, promotion
WHERE cs_sold_date_sk = d_date_sk
  AND cs_item_sk = i_item_sk
  AND cs_bill_cdemo_sk = cd_demo_sk
  AND cs_promo_sk = p_promo_sk
  AND cd_gender = 'M'
  AND cd_marital_status = 'S'
  AND cd_education_status = 'College'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND d_year = 1998
GROUP BY i_item_id
ORDER BY i_item_id
LIMIT 100
""",
    "TPC-DS q26 (reference inputs/q26.sql): q7's 5-way demographic star "
    "on the catalog channel via cs_bill_cdemo_sk. Averages are exact-"
    "cents-sum / count. Sort key = group key: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q27 — demographic star under ROLLUP(i_item_id, s_state) + grouping()
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q27",
    ["store_sales", "customer_demographics", "date_dim", "store", "item"],
    """
SELECT
  i_item_id, s_state,
  CAST(grouping(s_state) AS INT) g_state,
  CAST(SUM(ss_quantity) AS DOUBLE) / COUNT(*) AS agg1,
  CAST(SUM(ss_list_price_cents) AS DOUBLE) / COUNT(*) AS agg2,
  CAST(SUM(ss_coupon_amt_cents) AS DOUBLE) / COUNT(*) AS agg3,
  CAST(SUM(ss_sales_price_cents) AS DOUBLE) / COUNT(*) AS agg4
FROM store_sales, customer_demographics, date_dim, store, item
WHERE ss_sold_date_sk = d_date_sk AND
  ss_item_sk = i_item_sk AND
  ss_store_sk = s_store_sk AND
  ss_cdemo_sk = cd_demo_sk AND
  cd_gender = 'M' AND
  cd_marital_status = 'S' AND
  cd_education_status = 'College' AND
  d_year = 1998 AND
  s_state IN ('S00', 'S01', 'S02', 'S03', 'S04')
GROUP BY ROLLUP (i_item_id, s_state)
ORDER BY COALESCE(i_item_id, ''), COALESCE(s_state, '')
LIMIT 100
""",
    "TPC-DS q27 (reference inputs/q27.sql): demographic star averaged "
    "under ROLLUP(item, state) with grouping(s_state). The result "
    "exceeds the LIMIT and rollup rows carry NULL keys, so the sort "
    "COALESCEs to '' (sorts first in both engines, matching ascending "
    "NULLS FIRST vs LAST divergence) — q67 convention. States retuned "
    "to the derived S00..S04.",
)

# ---------------------------------------------------------------------------
# q8 — store sales in preferred-customer-heavy zips (INTERSECT cohort)
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q8",
    ["store_sales", "date_dim", "store", "customer_address", "customer_dim"],
    """
SELECT
  s_store_name,
  CAST(SUM(ss_net_profit_cents) AS BIGINT) AS sum_profit_cents
FROM store_sales, date_dim, store,
  (SELECT ca_zip
  FROM (
         (SELECT substr(ca_zip, 1, 2) ca_zip
         FROM customer_address
         WHERE substr(ca_zip, 1, 2) IN (
               '11', '12', '13', '14', '15', '16', '17', '18',
               '24', '35', '42', '53', '60', '76', '87', '98'))
         INTERSECT
         (SELECT ca_zip
         FROM
           (SELECT
             substr(ca_zip, 1, 2) ca_zip,
             count(*) cnt
           FROM customer_address, customer_dim
           WHERE ca_address_sk = c_current_addr_sk AND
             c_preferred_cust_flag = 'Y'
           GROUP BY substr(ca_zip, 1, 2)
           HAVING count(*) > 10) A1)
       ) A2
  ) V1
WHERE ss_store_sk = s_store_sk
  AND ss_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 1998
  AND (substr(s_zip, 1, 2) = V1.ca_zip)
GROUP BY s_store_name
ORDER BY s_store_name
LIMIT 100
""",
    "TPC-DS q8 (reference inputs/q8.sql): store profit where the store's "
    "zip prefix belongs to an INTERSECT of a literal zip cohort and "
    "preferred-customer-heavy zips. Adaptation: the derived zips "
    "(10000 + 37k mod 90000) are collision-free at 5 chars, so the "
    "cohort unit is the 2-char prefix throughout (the reference already "
    "compares store zips at 2 chars); the 400-zip literal list becomes "
    "16 prefixes. Empty at sf0.001 (cohort needs >10 preferred "
    "customers per prefix), non-degenerate at sf0.01+. <= 8 stores: "
    "LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q10 — demographic counts for active customers (EXISTS across channels)
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q10",
    ["customer_dim", "customer_address", "customer_demographics",
     "store_sales", "web_sales", "catalog_sales", "date_dim"],
    """
SELECT
  cd_gender, cd_marital_status, cd_education_status,
  CAST(count(*) AS BIGINT) cnt1,
  cd_purchase_estimate,
  CAST(count(*) AS BIGINT) cnt2,
  cd_credit_rating,
  CAST(count(*) AS BIGINT) cnt3,
  cd_dep_count,
  CAST(count(*) AS BIGINT) cnt4,
  cd_dep_employed_count,
  CAST(count(*) AS BIGINT) cnt5,
  cd_dep_college_count,
  CAST(count(*) AS BIGINT) cnt6
FROM
  customer_dim c, customer_address ca, customer_demographics
WHERE
  c.c_current_addr_sk = ca.ca_address_sk AND
    ca_county IN ('county_0', 'county_1', 'county_2',
                  'county_3', 'county_4') AND
    cd_demo_sk = c.c_current_cdemo_sk AND
    exists(SELECT *
           FROM store_sales, date_dim
           WHERE c.c_customer_sk = ss_customer_sk AND
             ss_sold_date_sk = d_date_sk AND
             d_year = 1998 AND
             d_moy BETWEEN 1 AND 1 + 3) AND
    (exists(SELECT *
            FROM web_sales, date_dim
            WHERE c.c_customer_sk = ws_bill_customer_sk AND
              ws_sold_date_sk = d_date_sk AND
              d_year = 1998 AND
              d_moy BETWEEN 1 AND 1 + 3) OR
      exists(SELECT *
             FROM catalog_sales, date_dim
             WHERE c.c_customer_sk = cs_ship_customer_sk AND
               cs_sold_date_sk = d_date_sk AND
               d_year = 1998 AND
               d_moy BETWEEN 1 AND 1 + 3))
GROUP BY cd_gender, cd_marital_status, cd_education_status,
  cd_purchase_estimate, cd_credit_rating, cd_dep_count,
  cd_dep_employed_count, cd_dep_college_count
ORDER BY cd_gender, cd_marital_status, cd_education_status,
  cd_purchase_estimate, cd_credit_rating, cd_dep_count,
  cd_dep_employed_count, cd_dep_college_count
LIMIT 100
""",
    "TPC-DS q10 (reference inputs/q10.sql): demographic profile of "
    "customers active in-store AND on (web OR catalog) in one quarter — "
    "an EXISTS + (EXISTS OR EXISTS) decorrelation stack over three "
    "channels. Sort key = full group key: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q13 — single-row averages under OR-of-AND demographic/geography bands
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q13",
    ["store_sales", "store", "customer_demographics",
     "household_demographics", "customer_address", "date_dim"],
    """
SELECT
  CAST(SUM(ss_quantity) AS DOUBLE) / COUNT(*) AS avg_quantity,
  CAST(SUM(ss_ext_sales_price_cents) AS DOUBLE) / COUNT(*)
    AS avg_ext_sales_price_cents,
  CAST(SUM(ss_ext_wholesale_cost_cents) AS DOUBLE) / COUNT(*)
    AS avg_ext_wholesale_cost_cents,
  CAST(SUM(ss_ext_wholesale_cost_cents) AS BIGINT)
    AS sum_ext_wholesale_cost_cents
FROM store_sales, store, customer_demographics,
  household_demographics, customer_address, date_dim
WHERE s_store_sk = ss_store_sk
  AND ss_sold_date_sk = d_date_sk AND d_year = 1998
  AND ((ss_hdemo_sk = hd_demo_sk
  AND cd_demo_sk = ss_cdemo_sk
  AND cd_marital_status = 'M'
  AND cd_education_status = 'Advanced Degree'
  AND ss_sales_price_cents BETWEEN 1000000 AND 3000000
  AND hd_dep_count = 3
) OR
  (ss_hdemo_sk = hd_demo_sk
    AND cd_demo_sk = ss_cdemo_sk
    AND cd_marital_status = 'S'
    AND cd_education_status = 'College'
    AND ss_sales_price_cents BETWEEN 3000000 AND 6000000
    AND hd_dep_count = 1
  ) OR
  (ss_hdemo_sk = hd_demo_sk
    AND cd_demo_sk = ss_cdemo_sk
    AND cd_marital_status = 'W'
    AND cd_education_status = 'Secondary'
    AND ss_sales_price_cents BETWEEN 6000000 AND 9000000
    AND hd_dep_count = 1
  ))
  AND ((ss_addr_sk = ca_address_sk
  AND ca_country = 'United States'
  AND ca_state IN ('S01', 'S05', 'S01')
  AND ss_net_profit_cents BETWEEN 0 AND 200000
) OR
  (ss_addr_sk = ca_address_sk
    AND ca_country = 'United States'
    AND ca_state IN ('S07', 'S11', 'S13')
    AND ss_net_profit_cents BETWEEN 100000 AND 300000
  ) OR
  (ss_addr_sk = ca_address_sk
    AND ca_country = 'United States'
    AND ca_state IN ('S17', 'S01', 'S19')
    AND ss_net_profit_cents BETWEEN 50000 AND 250000
  ))
""",
    "TPC-DS q13 (reference inputs/q13.sql): one-row averages where the "
    "demographic AND geographic predicates are OR-of-AND bands that "
    "each re-state the join key (the classic Catalyst join-under-OR "
    "stress). Dollar bands retuned to the derived cents domains; "
    "'2 yr Degree' -> 'Secondary' (derived education domain). No LIMIT.",
)

# ---------------------------------------------------------------------------
# q15 — catalog sales by zip with an OR cohort (zip list / state / price)
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q15",
    ["catalog_sales", "customer_dim", "customer_address", "date_dim"],
    """
SELECT
  ca_zip,
  CAST(SUM(cs_sales_price_cents) AS BIGINT) AS sum_sales_cents
FROM catalog_sales, customer_dim, customer_address, date_dim
WHERE cs_bill_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND (substr(ca_zip, 1, 5) IN ('10074', '10148', '10222', '10296',
                                '10370', '10444', '28500', '47000',
                                '61800')
  OR ca_state IN ('S02', 'S09', 'S16')
  OR cs_sales_price_cents > 9000000)
  AND cs_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 1998
GROUP BY ca_zip
ORDER BY ca_zip
LIMIT 100
""",
    "TPC-DS q15 (reference inputs/q15.sql): catalog revenue by zip for "
    "an OR cohort (explicit zips / states / big-ticket lines). Zip "
    "literals are derived zips 10000 + (37k mod 90000) for custkeys "
    "reachable at every shipped SF (k = 2..12 even, 500, 1000, 1400 — "
    "all <= sf0.01's ~1.5k customers), states S02/S09/"
    "S16, and the $500 price floor becomes 9,000,000 cents (the derived "
    "price domain is ~90k..10.5M cents, so $500 would select "
    "everything). Sort key = group key: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q17 — sale/return/re-purchase quantity statistics per item-store-state
# ---------------------------------------------------------------------------

_Q17_STATS = """CAST(count(*) AS BIGINT) AS {c}_quantitycount,
  CAST(SUM({q}) AS DOUBLE) / COUNT(*) AS {c}_quantityave,
  CASE WHEN COUNT(*) > 1 THEN
    sqrt(CAST(COUNT(*) * SUM(CAST({q} AS BIGINT) * {q})
              - SUM({q}) * SUM({q}) AS DOUBLE)
         / (COUNT(*) * (COUNT(*) - 1))) END AS {c}_quantitystdev,
  CASE WHEN COUNT(*) > 1 THEN
    sqrt(CAST(COUNT(*) * SUM(CAST({q} AS BIGINT) * {q})
              - SUM({q}) * SUM({q}) AS DOUBLE)
         / (COUNT(*) * (COUNT(*) - 1)))
      / (CAST(SUM({q}) AS DOUBLE) / COUNT(*)) END AS {c}_quantitycov"""

_tpcds(
    "tpcds_q17",
    ["store_sales", "store_returns", "catalog_sales", "date_dim",
     "store", "item"],
    """
SELECT
  i_item_id,
  i_item_desc,
  s_state,
  """ + _Q17_STATS.format(c="store_sales", q="ss_quantity") + """,
  """ + _Q17_STATS.format(c="store_returns", q="sr_return_quantity") + """,
  """ + _Q17_STATS.format(c="catalog_sales", q="cs_quantity") + """
FROM store_sales, store_returns, catalog_sales, date_dim d1,
  date_dim d2, date_dim d3, store, item
WHERE d1.d_quarter_name IN (
    '1995Q1', '1995Q2', '1995Q3', '1995Q4',
    '1996Q1', '1996Q2', '1996Q3', '1996Q4',
    '1997Q1', '1997Q2', '1997Q3', '1997Q4',
    '1998Q1', '1998Q2', '1998Q3', '1998Q4')
  AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk
  AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk
  AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_quarter_name IN (
    '1995Q1', '1995Q2', '1995Q3', '1995Q4',
    '1996Q1', '1996Q2', '1996Q3', '1996Q4',
    '1997Q1', '1997Q2', '1997Q3', '1997Q4',
    '1998Q1', '1998Q2', '1998Q3', '1998Q4',
    '1999Q1', '1999Q2', '1999Q3', '1999Q4')
  AND sr_customer_sk = cs_bill_customer_sk
  AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk
  AND d3.d_quarter_name IN (
    '1995Q1', '1995Q2', '1995Q3', '1995Q4',
    '1996Q1', '1996Q2', '1996Q3', '1996Q4',
    '1997Q1', '1997Q2', '1997Q3', '1997Q4',
    '1998Q1', '1998Q2', '1998Q3', '1998Q4',
    '1999Q1', '1999Q2', '1999Q3', '1999Q4')
GROUP BY i_item_id, i_item_desc, s_state
ORDER BY i_item_id, i_item_desc, s_state
LIMIT 100
""",
    "TPC-DS q17 (reference inputs/q17.sql): quantity count/mean/stddev/"
    "cov per item-store-state across a sale -> return -> catalog "
    "re-purchase chain (three facts, three date_dim instances, "
    "d_quarter_name windows). The windows widen from 1/3 quarters to "
    "16/20: cross-channel same-customer-same-item re-purchases are "
    "~40 per 60k derived lines and scatter across years, so the "
    "reference's single-quarter anchor is empty at every SF. "
    "stddev_samp is spelled out as "
    "sqrt((n*sum(q^2) - sum(q)^2) / (n*(n-1))) over exact BIGINT sums "
    "so both engines run the identical IEEE expression (native Welford "
    "orderings are not cross-engine stable). Note: the reference text "
    "has a known typo — it emits stddev/avg (the cov) twice for the "
    "catalog column, labelling one copy _quantitystdev; this repo "
    "intentionally corrects it and emits a true stdev for catalog "
    "(deliberate deviation, not drift). Quantities are never NULL "
    "in the shim, so count(q) = count(*). Sort = group key: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q18 — catalog demographics under ROLLUP(item, country, state, county)
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q18",
    ["catalog_sales", "customer_demographics", "customer_dim",
     "customer_address", "date_dim", "item"],
    """
SELECT
  i_item_id, ca_country, ca_state, ca_county,
  CAST(SUM(cs_quantity) AS DOUBLE) / COUNT(*) AS agg1,
  CAST(SUM(cs_list_price_cents) AS DOUBLE) / COUNT(*) AS agg2,
  CAST(SUM(cs_coupon_amt_cents) AS DOUBLE) / COUNT(*) AS agg3,
  CAST(SUM(cs_sales_price_cents) AS DOUBLE) / COUNT(*) AS agg4,
  CAST(SUM(cs_net_profit_cents) AS DOUBLE) / COUNT(*) AS agg5,
  CAST(SUM(c_birth_year) AS DOUBLE) / COUNT(*) AS agg6,
  CAST(SUM(cd1.cd_dep_count) AS DOUBLE) / COUNT(*) AS agg7
FROM catalog_sales, customer_demographics cd1,
  customer_demographics cd2, customer_dim, customer_address,
  date_dim, item
WHERE cs_sold_date_sk = d_date_sk AND
  cs_item_sk = i_item_sk AND
  cs_bill_cdemo_sk = cd1.cd_demo_sk AND
  cs_bill_customer_sk = c_customer_sk AND
  cd1.cd_gender = 'F' AND
  cd1.cd_education_status = 'Secondary' AND
  c_current_cdemo_sk = cd2.cd_demo_sk AND
  c_current_addr_sk = ca_address_sk AND
  c_birth_month IN (1, 6, 8, 9, 12, 2) AND
  d_year = 1998 AND
  ca_state IN ('S03', 'S08', 'S13', 'S18', 'S23', 'S11', 'S03')
GROUP BY ROLLUP (i_item_id, ca_country, ca_state, ca_county)
ORDER BY COALESCE(ca_country, ''), COALESCE(ca_state, ''),
  COALESCE(ca_county, ''), COALESCE(i_item_id, '')
LIMIT 100
""",
    "TPC-DS q18 (reference inputs/q18.sql): seven averages over catalog "
    "buyers' demographics under a 4-level ROLLUP(item, country, state, "
    "county). DECIMAL(12,2) averages become exact-cents-sum / count. "
    "'Unknown' education -> 'Secondary' (derived domain); states "
    "retuned. Result exceeds the LIMIT with NULL rollup keys in the "
    "sort, so keys are COALESCE'd (q67 convention).",
)

# ---------------------------------------------------------------------------
# q29 — sale/return/re-purchase quantity totals (q17's SUM twin)
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q29",
    ["store_sales", "store_returns", "catalog_sales", "date_dim",
     "store", "item"],
    """
SELECT
  i_item_id,
  i_item_desc,
  s_store_id,
  s_store_name,
  CAST(SUM(ss_quantity) AS BIGINT) AS store_sales_quantity,
  CAST(SUM(sr_return_quantity) AS BIGINT) AS store_returns_quantity,
  CAST(SUM(cs_quantity) AS BIGINT) AS catalog_sales_quantity
FROM
  store_sales, store_returns, catalog_sales, date_dim d1, date_dim d2,
  date_dim d3, store, item
WHERE
  d1.d_moy BETWEEN 1 AND 12
    AND d1.d_year IN (1995, 1996, 1997, 1998)
    AND d1.d_date_sk = ss_sold_date_sk
    AND i_item_sk = ss_item_sk
    AND s_store_sk = ss_store_sk
    AND ss_customer_sk = sr_customer_sk
    AND ss_item_sk = sr_item_sk
    AND ss_ticket_number = sr_ticket_number
    AND sr_returned_date_sk = d2.d_date_sk
    AND d2.d_moy BETWEEN 1 AND 12
    AND d2.d_year BETWEEN 1995 AND 1999
    AND sr_customer_sk = cs_bill_customer_sk
    AND sr_item_sk = cs_item_sk
    AND cs_sold_date_sk = d3.d_date_sk
    AND d3.d_year IN (1995, 1996, 1997, 1998, 1999)
GROUP BY
  i_item_id, i_item_desc, s_store_id, s_store_name
ORDER BY
  i_item_id, i_item_desc, s_store_id, s_store_name
LIMIT 100
""",
    "TPC-DS q29 (reference inputs/q29.sql): quantity totals along the "
    "same three-fact sale -> return -> catalog re-purchase chain as "
    "q17, keyed by item x store. Date windows widened (month -> 4 "
    "sale years, 3 -> 5 catalog years) for the same density reason as "
    "q17 — the single-month anchor is empty at every SF. Sort = group "
    "key: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q68 — two-city ticket extracts with current-vs-bought city mismatch
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q68",
    ["store_sales", "date_dim", "store", "household_demographics",
     "customer_address", "customer_dim"],
    """
SELECT
  c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
  extended_price_cents, extended_tax_cents, list_price_cents
FROM (SELECT
  ss_ticket_number, ss_customer_sk,
  ca_city bought_city,
  CAST(SUM(ss_ext_sales_price_cents) AS BIGINT) extended_price_cents,
  CAST(SUM(ss_ext_list_price_cents) AS BIGINT) list_price_cents,
  CAST(SUM(ss_ext_tax_cents) AS BIGINT) extended_tax_cents
FROM store_sales, date_dim, store, household_demographics,
  customer_address
WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
  AND store_sales.ss_store_sk = store.s_store_sk
  AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
  AND store_sales.ss_addr_sk = customer_address.ca_address_sk
  AND date_dim.d_dom BETWEEN 1 AND 2
  AND (household_demographics.hd_dep_count = 4 OR
  household_demographics.hd_vehicle_count = 3)
  AND date_dim.d_year IN (1996, 1996 + 1, 1996 + 2)
  AND store.s_city IN ('city_0', 'city_1')
GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
  customer_dim,
  customer_address current_addr
WHERE ss_customer_sk = c_customer_sk
  AND customer_dim.c_current_addr_sk = current_addr.ca_address_sk
  AND current_addr.ca_city <> bought_city
ORDER BY c_last_name, ss_ticket_number, bought_city,
  extended_price_cents
LIMIT 100
""",
    "TPC-DS q68 (reference inputs/q68.sql): per-ticket price/tax/list "
    "extracts for early-month city shoppers whose current address city "
    "differs from the bought-from city. The reference sorts by "
    "(last_name, ticket) which ties when one ticket spans several "
    "ship-to addresses; bought_city and the price are appended to make "
    "the LIMIT cut deterministic.",
)

# ---------------------------------------------------------------------------
# q73 — households with 1-5 tickets in a day-of-month band
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q73",
    ["store_sales", "date_dim", "store", "household_demographics",
     "customer_dim"],
    """
SELECT
  c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
  ss_ticket_number, cnt
FROM
  (SELECT
    ss_ticket_number, ss_customer_sk,
    CAST(count(*) AS BIGINT) cnt
  FROM store_sales, date_dim, store, household_demographics
  WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
    AND store_sales.ss_store_sk = store.s_store_sk
    AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
    AND date_dim.d_dom BETWEEN 1 AND 2
    AND (household_demographics.hd_buy_potential = '>10000' OR
    household_demographics.hd_buy_potential = 'Unknown')
    AND household_demographics.hd_vehicle_count > 0
    AND CASE WHEN household_demographics.hd_vehicle_count > 0
    THEN
      CAST(household_demographics.hd_dep_count AS DOUBLE)
        / household_demographics.hd_vehicle_count
        ELSE NULL END > 1
    AND date_dim.d_year IN (1996, 1996 + 1, 1996 + 2)
    AND store.s_county IN ('county_0', 'county_1', 'county_2', 'county_3')
  GROUP BY ss_ticket_number, ss_customer_sk) dj, customer_dim
WHERE ss_customer_sk = c_customer_sk
  AND cnt BETWEEN 1 AND 5
ORDER BY cnt DESC
""",
    "TPC-DS q73 (reference inputs/q73.sql): customers whose early-month "
    "tickets hold 1-5 lines, for high-buy-potential multi-vehicle "
    "households. dep/vehicle is pinned to DOUBLE division (Spark int/"
    "int is double, DuckDB's is exact — the CAST makes both double). "
    "No LIMIT, so the reference's tie-heavy ORDER BY needs no "
    "tiebreaker (the compare is order-insensitive).",
)

# ---------------------------------------------------------------------------
# q91 — call-center catalog-return losses by customer demographic
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q91",
    ["call_center", "catalog_returns", "date_dim", "customer_dim",
     "customer_address", "customer_demographics",
     "household_demographics"],
    """
SELECT
  cc_call_center_id AS call_center,
  cc_name AS call_center_name,
  cc_manager AS manager,
  CAST(SUM(cr_net_loss_cents) AS BIGINT) AS returns_loss_cents
FROM
  call_center, catalog_returns, date_dim, customer_dim,
  customer_address, customer_demographics, household_demographics
WHERE
  cr_call_center_sk = cc_call_center_sk
    AND cr_returned_date_sk = d_date_sk
    AND cr_returning_customer_sk = c_customer_sk
    AND cd_demo_sk = c_current_cdemo_sk
    AND hd_demo_sk = c_current_hdemo_sk
    AND ca_address_sk = c_current_addr_sk
    AND d_year = 1998
    AND d_moy = 11
    AND ((cd_marital_status = 'M' AND cd_education_status = 'College')
    OR (cd_marital_status = 'W' AND cd_education_status = 'Advanced Degree'))
    AND hd_buy_potential LIKE 'Unknown%'
    AND ca_gmt_offset = -5
GROUP BY cc_call_center_id, cc_name, cc_manager, cd_marital_status,
  cd_education_status
ORDER BY returns_loss_cents DESC
""",
    "TPC-DS q91 (reference inputs/q91.sql): call-center losses on "
    "catalog returns from a demographic cohort (marital x education OR "
    "pair, Unknown-buy-potential households, one gmt offset). "
    "('M','Unknown') -> ('M','College') (the derived education domain "
    "has no Unknown); gmt -7 -> -5 (derived offsets are -5/-6). The "
    "demo columns stay in GROUP BY but not the output, exactly like the "
    "reference, so one call center can emit one row per matching "
    "cohort. No LIMIT: the order-insensitive compare needs no "
    "tiebreak. Consumes the round-7 WIP call_center columns "
    "(cc_call_center_id/cc_manager).",
)

# ---------------------------------------------------------------------------
# q78 — store items+customers with zero returns vs their other-channel buys
# ---------------------------------------------------------------------------

_Q78_CTES = """ws AS
(SELECT
    d_year AS ws_sold_year,
    ws_bill_customer_sk AS ws_customer_sk,
    CAST(SUM(ws_quantity) AS BIGINT) AS ws_qty,
    CAST(SUM(ws_ext_wholesale_cost_cents) AS BIGINT) AS ws_wc,
    CAST(SUM(ws_sales_price_cents) AS BIGINT) AS ws_sp
  FROM web_sales
    LEFT JOIN web_returns ON wr_order_number = ws_order_number
      AND ws_item_sk = wr_item_sk
    JOIN date_dim ON ws_sold_date_sk = d_date_sk
  WHERE wr_order_number IS NULL
  GROUP BY d_year, ws_bill_customer_sk
),
    cs AS
  (SELECT
    d_year AS cs_sold_year,
    cs_bill_customer_sk AS cs_customer_sk,
    CAST(SUM(cs_quantity) AS BIGINT) AS cs_qty,
    CAST(SUM(cs_ext_wholesale_cost_cents) AS BIGINT) AS cs_wc,
    CAST(SUM(cs_sales_price_cents) AS BIGINT) AS cs_sp
  FROM catalog_sales
    LEFT JOIN catalog_returns ON cr_order_number = cs_order_number
      AND cs_item_sk = cr_item_sk
    JOIN date_dim ON cs_sold_date_sk = d_date_sk
  WHERE cr_order_number IS NULL
  GROUP BY d_year, cs_bill_customer_sk
  ),
    ss AS
  (SELECT
    d_year AS ss_sold_year,
    ss_customer_sk,
    CAST(SUM(ss_quantity) AS BIGINT) AS ss_qty,
    CAST(SUM(ss_ext_wholesale_cost_cents) AS BIGINT) AS ss_wc,
    CAST(SUM(ss_sales_price_cents) AS BIGINT) AS ss_sp
  FROM store_sales
    LEFT JOIN store_returns ON sr_ticket_number = ss_ticket_number
      AND ss_item_sk = sr_item_sk
    JOIN date_dim ON ss_sold_date_sk = d_date_sk
  WHERE sr_ticket_number IS NULL
  GROUP BY d_year, ss_customer_sk
  )"""

_tpcds(
    "tpcds_q78",
    ["web_sales", "web_returns", "catalog_sales", "catalog_returns",
     "store_sales", "store_returns", "date_dim"],
    """
SELECT
  CAST(floor(CAST(ss_qty AS DOUBLE) * 100 / (ws_qty + cs_qty)) AS BIGINT)
    AS ratio_pct,
  ss_qty AS store_qty,
  ss_wc AS store_wholesale_cost_cents,
  ss_sp AS store_sales_price_cents,
  COALESCE(ws_qty, 0) + COALESCE(cs_qty, 0) AS other_chan_qty,
  COALESCE(ws_wc, 0) + COALESCE(cs_wc, 0)
    AS other_chan_wholesale_cost_cents,
  COALESCE(ws_sp, 0) + COALESCE(cs_sp, 0) AS other_chan_sales_price_cents
FROM ss
  LEFT JOIN ws
    ON (ws_sold_year = ss_sold_year AND ws_customer_sk = ss_customer_sk)
  LEFT JOIN cs
    ON (cs_sold_year = ss_sold_year AND cs_customer_sk = ss_customer_sk)
WHERE COALESCE(ws_qty, 0) > 0 AND COALESCE(cs_qty, 0) > 0
  AND ss_sold_year = 1998
ORDER BY
  ratio_pct,
  ss_qty DESC, ss_wc DESC, ss_sp DESC,
  other_chan_qty,
  other_chan_wholesale_cost_cents,
  other_chan_sales_price_cents
LIMIT 100
""",
    "TPC-DS q78 (reference inputs/q78.sql): per customer x year, store "
    "purchases that were never returned (LEFT JOIN returns + IS "
    "NULL anti-join per channel) compared against the same customer's "
    "unreturned web+catalog volume, keeping only customers active in "
    "all three channels. Adaptations: the reference grain is item x "
    "customer x year, but the derived channel split (l_linenumber % 3) "
    "makes one customer buying one part through three channels "
    "structurally absent (ZERO such triples at sf0.01 AND sf0.1, "
    "measured), so the grain coarsens to customer x year — the "
    "three-CTE anti-join / double LEFT JOIN / ratio architecture is "
    "verbatim. The shim carries line-level "
    "EXT wholesale/sales cents (per-unit cost columns do not derive), "
    "round(qty_ratio, 2) becomes floor(100 * ratio) (floor on the "
    "identical IEEE double is unambiguous cross-engine; round-half on "
    "doubles is not), and the never-NULL-under-WHERE "
    "coalesce(ws_qty + cs_qty, 1) denominator is simplified to "
    "(ws_qty + cs_qty). Year 2000 -> 1998 (mid derived domain). All "
    "seven output columns are sort keys, so the LIMIT cut only ever "
    "splits identical rows: LIMIT-safe.",
    extra=_Q78_CTES,
)

# ---------------------------------------------------------------------------
# q75 — yearly item-hierarchy net-sales delta for one category (all channels)
# ---------------------------------------------------------------------------

_Q75_ALL_SALES = """all_sales AS (
  SELECT
    d_year,
    i_brand_id,
    i_class_id,
    i_category_id,
    i_manufact_id,
    CAST(SUM(sales_cnt) AS BIGINT) AS sales_cnt,
    CAST(SUM(sales_amt_cents) AS BIGINT) AS sales_amt_cents
  FROM (
         SELECT
           d_year,
           i_brand_id,
           i_class_id,
           i_category_id,
           i_manufact_id,
           cs_quantity - COALESCE(cr_return_quantity, 0) AS sales_cnt,
           cs_ext_sales_price_cents
             - COALESCE(cr_return_amount_cents, 0) AS sales_amt_cents
         FROM catalog_sales
           JOIN item ON i_item_sk = cs_item_sk
           JOIN date_dim ON d_date_sk = cs_sold_date_sk
           LEFT JOIN catalog_returns ON (cs_order_number = cr_order_number
             AND cs_item_sk = cr_item_sk)
         WHERE i_category = 'STANDARD'
         UNION
         SELECT
           d_year,
           i_brand_id,
           i_class_id,
           i_category_id,
           i_manufact_id,
           ss_quantity - COALESCE(sr_return_quantity, 0) AS sales_cnt,
           ss_ext_sales_price_cents
             - COALESCE(sr_return_amt_cents, 0) AS sales_amt_cents
         FROM store_sales
           JOIN item ON i_item_sk = ss_item_sk
           JOIN date_dim ON d_date_sk = ss_sold_date_sk
           LEFT JOIN store_returns ON (ss_ticket_number = sr_ticket_number
             AND ss_item_sk = sr_item_sk)
         WHERE i_category = 'STANDARD'
         UNION
         SELECT
           d_year,
           i_brand_id,
           i_class_id,
           i_category_id,
           i_manufact_id,
           ws_quantity - COALESCE(wr_return_quantity, 0) AS sales_cnt,
           ws_ext_sales_price_cents
             - COALESCE(wr_return_amt_cents, 0) AS sales_amt_cents
         FROM web_sales
           JOIN item ON i_item_sk = ws_item_sk
           JOIN date_dim ON d_date_sk = ws_sold_date_sk
           LEFT JOIN web_returns ON (ws_order_number = wr_order_number
             AND ws_item_sk = wr_item_sk)
         WHERE i_category = 'STANDARD') sales_detail
  GROUP BY d_year, i_brand_id, i_class_id, i_category_id, i_manufact_id)"""

_tpcds(
    "tpcds_q75",
    ["catalog_sales", "catalog_returns", "store_sales", "store_returns",
     "web_sales", "web_returns", "item", "date_dim"],
    """
SELECT
  prev_yr.d_year AS prev_year,
  curr_yr.d_year AS curr_year,
  curr_yr.i_brand_id,
  curr_yr.i_class_id,
  curr_yr.i_category_id,
  curr_yr.i_manufact_id,
  prev_yr.sales_cnt AS prev_yr_cnt,
  curr_yr.sales_cnt AS curr_yr_cnt,
  curr_yr.sales_cnt - prev_yr.sales_cnt AS sales_cnt_diff,
  curr_yr.sales_amt_cents - prev_yr.sales_amt_cents
    AS sales_amt_diff_cents
FROM all_sales curr_yr, all_sales prev_yr
WHERE curr_yr.i_brand_id = prev_yr.i_brand_id
  AND curr_yr.i_class_id = prev_yr.i_class_id
  AND curr_yr.i_category_id = prev_yr.i_category_id
  AND curr_yr.i_manufact_id = prev_yr.i_manufact_id
  AND curr_yr.d_year = 1999
  AND prev_yr.d_year = 1999 - 1
  AND prev_yr.sales_cnt > 0
  AND curr_yr.sales_cnt * 10 < prev_yr.sales_cnt * 9
ORDER BY sales_cnt_diff, curr_yr.i_brand_id, curr_yr.i_class_id,
  curr_yr.i_category_id, curr_yr.i_manufact_id
LIMIT 100
""",
    "TPC-DS q75 (reference inputs/q75.sql): channel UNION of net sales "
    "(quantity and revenue minus returns) per item hierarchy per year, "
    "self-joined 1999-vs-1998 keeping manufacturer lines that shrank "
    "more than 10%. 'Books' -> 'STANDARD' (the derived category domain "
    "is the six p_type words). The DECIMAL ratio 'curr/prev < 0.9' is "
    "emitted as exact integer 'curr*10 < prev*9' guarded by "
    "'prev > 0': for positive prev the truth tables are identical; "
    "prev=0 rows are excluded by both forms (division-by-zero "
    "NULL/Inf semantics differ cross-engine, the guard does not); and "
    "negative prev (net returns exceeding net sales, where the "
    "ratio's inequality direction would flip) is excluded explicitly "
    "rather than claimed equivalent. UNION (distinct) "
    "over detail rows is kept verbatim. ORDER BY sales_cnt_diff alone "
    "ties, so the four (unique) hierarchy group keys are appended: "
    "LIMIT-safe.",
    extra=_Q75_ALL_SALES,
)

# ---------------------------------------------------------------------------
# q14a/q14b — cross-channel item cohort (INTERSECT tower) vs average sales
# ---------------------------------------------------------------------------

#: items whose (brand, class, category) sold through ALL three channels
#: inside the 3-year window, plus the global per-line average revenue —
#: shared verbatim by q14a and q14b (reference inputs/q14a.sql:1-57)
_Q14_CTES = """cross_items AS
(SELECT i_item_sk AS ss_item_sk
  FROM item,
    (SELECT
      iss.i_brand_id AS brand_id,
      iss.i_class_id AS class_id,
      iss.i_category_id AS category_id
    FROM store_sales, item iss, date_dim d1
    WHERE ss_item_sk = iss.i_item_sk
      AND ss_sold_date_sk = d1.d_date_sk
      AND d1.d_year BETWEEN 1997 AND 1997 + 2
    INTERSECT
    SELECT
      ics.i_brand_id,
      ics.i_class_id,
      ics.i_category_id
    FROM catalog_sales, item ics, date_dim d2
    WHERE cs_item_sk = ics.i_item_sk
      AND cs_sold_date_sk = d2.d_date_sk
      AND d2.d_year BETWEEN 1997 AND 1997 + 2
    INTERSECT
    SELECT
      iws.i_brand_id,
      iws.i_class_id,
      iws.i_category_id
    FROM web_sales, item iws, date_dim d3
    WHERE ws_item_sk = iws.i_item_sk
      AND ws_sold_date_sk = d3.d_date_sk
      AND d3.d_year BETWEEN 1997 AND 1997 + 2) x
  WHERE i_brand_id = brand_id
    AND i_class_id = class_id
    AND i_category_id = category_id
),
    avg_sales AS
  (SELECT CAST(SUM(quantity * list_price_cents) AS DOUBLE) / COUNT(*)
      AS average_sales
  FROM (
         SELECT
           ss_quantity AS quantity,
           ss_list_price_cents AS list_price_cents
         FROM store_sales, date_dim
         WHERE ss_sold_date_sk = d_date_sk
           AND d_year BETWEEN 1997 AND 1997 + 2
         UNION ALL
         SELECT
           cs_quantity AS quantity,
           cs_list_price_cents AS list_price_cents
         FROM catalog_sales, date_dim
         WHERE cs_sold_date_sk = d_date_sk
           AND d_year BETWEEN 1997 AND 1997 + 2
         UNION ALL
         SELECT
           ws_quantity AS quantity,
           ws_list_price_cents AS list_price_cents
         FROM web_sales, date_dim
         WHERE ws_sold_date_sk = d_date_sk
           AND d_year BETWEEN 1997 AND 1997 + 2) x)"""


def _q14_channel(chan: str, p: str, date_pred: str) -> str:
    """One UNION ALL arm of q14a's y / one derived table of q14b."""
    return f"""SELECT
         '{chan}' AS channel,
         i_brand_id,
         i_class_id,
         i_category_id,
         CAST(SUM({p}_quantity * {p}_list_price_cents) AS BIGINT)
           AS sales_cents,
         COUNT(*) AS number_sales
       FROM {chan}_sales, item, date_dim
       WHERE {p}_item_sk IN (SELECT ss_item_sk FROM cross_items)
         AND {p}_item_sk = i_item_sk
         AND {p}_sold_date_sk = d_date_sk
         AND {date_pred}
       GROUP BY i_brand_id, i_class_id, i_category_id
       HAVING SUM({p}_quantity * {p}_list_price_cents) >
         (SELECT average_sales FROM avg_sales)"""


_tpcds(
    "tpcds_q14a",
    ["store_sales", "catalog_sales", "web_sales", "item", "date_dim"],
    """
SELECT
  channel,
  i_brand_id,
  i_class_id,
  i_category_id,
  CAST(SUM(sales_cents) AS BIGINT) AS sum_sales_cents,
  CAST(SUM(number_sales) AS BIGINT) AS sum_number_sales
FROM (
       """ + _q14_channel("store", "ss",
                          "d_year = 1997 + 2 AND d_moy = 11") + """
       UNION ALL
       """ + _q14_channel("catalog", "cs",
                          "d_year = 1997 + 2 AND d_moy = 11") + """
       UNION ALL
       """ + _q14_channel("web", "ws",
                          "d_year = 1997 + 2 AND d_moy = 11") + """
     ) y
GROUP BY ROLLUP (channel, i_brand_id, i_class_id, i_category_id)
ORDER BY COALESCE(channel, ''), COALESCE(i_brand_id, -1),
  COALESCE(i_class_id, -1), COALESCE(i_category_id, -1)
LIMIT 100
""",
    "TPC-DS q14a (reference inputs/q14a.sql): the heaviest WITH tower "
    "in the corpus — an INTERSECT of three channel scans defines the "
    "cross-channel item cohort, a UNION ALL of all three channels "
    "defines the global average line revenue, then each channel's "
    "November sales over the cohort items are kept only where the "
    "(brand, class, category) group out-earns that average, UNION "
    "ALL'd and re-aggregated under a 4-level ROLLUP. Window 1999-2001 "
    "-> 1997-1999 (sold dates end 2001-08, so the reference's target "
    "November 2001 is empty by construction; November 1999 is dense). "
    "avg(q*p) is spelled CAST(SUM AS DOUBLE)/COUNT(*) over exact cents "
    "(cross-engine identical IEEE division; native AVG orderings are "
    "not). ROLLUP keys are COALESCE'd in the sort (q67 convention) and "
    "unique per grouping level: LIMIT-safe.",
    extra=_Q14_CTES,
)

_tpcds(
    "tpcds_q14b",
    ["store_sales", "catalog_sales", "web_sales", "item", "date_dim"],
    """
SELECT
  this_year.channel AS ty_channel,
  this_year.i_brand_id AS ty_brand_id,
  this_year.i_class_id AS ty_class_id,
  this_year.i_category_id AS ty_category_id,
  this_year.sales_cents AS ty_sales_cents,
  this_year.number_sales AS ty_number_sales,
  last_year.channel AS ly_channel,
  last_year.sales_cents AS ly_sales_cents,
  last_year.number_sales AS ly_number_sales
FROM
  (""" + _q14_channel(
        "store", "ss",
        """d_week_seq = (SELECT d_week_seq
  FROM date_dim
  WHERE d_year = 1997 + 2 AND d_moy = 12 AND d_dom = 25)""") + """) this_year,
  (""" + _q14_channel(
        "store", "ss",
        """d_week_seq = (SELECT d_week_seq
  FROM date_dim
  WHERE d_year = 1997 + 1 AND d_moy = 12 AND d_dom = 25)""") + """) last_year
WHERE this_year.i_brand_id = last_year.i_brand_id
  AND this_year.i_class_id = last_year.i_class_id
  AND this_year.i_category_id = last_year.i_category_id
ORDER BY ty_channel, ty_brand_id, ty_class_id, ty_category_id
LIMIT 100
""",
    "TPC-DS q14b (reference inputs/q14b.sql): q14a's cohort + average "
    "CTEs reused verbatim, but comparing the store channel's "
    "above-average (brand, class, category) groups for the week of "
    "Dec 25 this year against the same week last year (scalar "
    "d_week_seq subqueries — at most one row by d_date_sk "
    "distinctness). Years 2000/1999 -> 1999/1998 (window 1997-1999); Dec 11 -> Dec 25, the only anchor week whose year-over-year above-average triple overlap is non-degenerate at sf0.01 (measured: 5). "
    "The reference's SELECT * would emit duplicate column names "
    "(channel, i_brand_id, ... from both derived tables), which the "
    "driver's sort-columns-by-name compare cannot represent — every "
    "output column is explicitly aliased ty_*/ly_* instead. Join keys "
    "are the grouped (unique) hierarchy triple and lead the sort: "
    "LIMIT-safe.",
    extra=_Q14_CTES,
)

# ---------------------------------------------------------------------------
# q64 — two-year store-repurchase handoff mega-join (18 relations)
# ---------------------------------------------------------------------------

_Q64_CTES = """cs_ui AS {MAT}
(SELECT
    cs_item_sk,
    CAST(SUM(cs_ext_list_price_cents) AS BIGINT) AS sale,
    CAST(SUM(cr_refunded_cash_cents + cr_reversed_charge_cents
      + cr_store_credit_cents) AS BIGINT) AS refund
  FROM catalog_sales
    , catalog_returns
  WHERE cs_item_sk = cr_item_sk
    AND cs_order_number = cr_order_number
  GROUP BY cs_item_sk
  HAVING SUM(cs_ext_list_price_cents) >
    SUM(cr_refunded_cash_cents + cr_reversed_charge_cents
      + cr_store_credit_cents)),
    sale_base AS {MAT}
  (SELECT ss_item_sk, ss_customer_sk, ss_cdemo_sk, ss_hdemo_sk,
          ss_addr_sk, i_product_name, s_store_name, s_zip,
          d1.d_year AS syear, ss_ext_wholesale_cost_cents,
          ss_list_price_cents, ss_coupon_amt_cents
   FROM store_sales, store_returns, cs_ui, date_dim d1, store,
        promotion, item
   WHERE ss_store_sk = s_store_sk AND
     ss_sold_date_sk = d1.d_date_sk AND
     ss_item_sk = i_item_sk AND
     ss_item_sk = sr_item_sk AND
     ss_ticket_number = sr_ticket_number AND
     ss_item_sk = cs_ui.cs_item_sk AND
     ss_promo_sk = p_promo_sk AND
     i_color IN ('red', 'blue', 'hot', 'old', 'small', 'large') AND
     i_current_price_cents BETWEEN 92000 AND 92000 + 5000 AND
     i_current_price_cents BETWEEN 92000 + 1000 AND 92000 + 7000),
    sale_side AS {MAT}
  (SELECT sale_base.*, cd1.cd_marital_status AS b_marital,
          ad1.ca_street_number AS b_street_number,
          ad1.ca_street_name AS b_street_name,
          ad1.ca_city AS b_city, ad1.ca_zip AS b_zip
   FROM sale_base, customer_demographics cd1,
        household_demographics hd1, income_band ib1,
        customer_address ad1
   WHERE ss_cdemo_sk = cd1.cd_demo_sk AND
     ss_hdemo_sk = hd1.hd_demo_sk AND
     hd1.hd_income_band_sk = ib1.ib_income_band_sk AND
     ss_addr_sk = ad1.ca_address_sk),
    cust_side AS {MAT}
  (SELECT c_customer_sk, cd2.cd_marital_status AS c_marital,
          d2.d_year AS fsyear, d3.d_year AS s2year,
          ad2.ca_street_number AS c_street_number,
          ad2.ca_street_name AS c_street_name,
          ad2.ca_city AS c_city, ad2.ca_zip AS c_zip
   FROM customer_dim, customer_demographics cd2,
        household_demographics hd2, income_band ib2,
        customer_address ad2, date_dim d2, date_dim d3
   WHERE c_current_cdemo_sk = cd2.cd_demo_sk AND
     c_current_hdemo_sk = hd2.hd_demo_sk AND
     hd2.hd_income_band_sk = ib2.ib_income_band_sk AND
     c_current_addr_sk = ad2.ca_address_sk AND
     c_first_sales_date_sk = d2.d_date_sk AND
     c_first_shipto_date_sk = d3.d_date_sk),
    cross_sales AS {MAT}
  (SELECT
    i_product_name AS product_name,
    ss_item_sk AS item_sk,
    s_store_name AS store_name,
    s_zip AS store_zip,
    b_street_number,
    b_street_name,
    b_city,
    b_zip,
    c_street_number,
    c_street_name,
    c_city,
    c_zip,
    syear,
    fsyear,
    s2year,
    CAST(COUNT(*) AS BIGINT) AS cnt,
    CAST(SUM(ss_ext_wholesale_cost_cents) AS BIGINT) AS s1,
    CAST(SUM(ss_list_price_cents) AS BIGINT) AS s2,
    CAST(SUM(ss_coupon_amt_cents) AS BIGINT) AS s3
  FROM sale_side, cust_side
  WHERE ss_customer_sk = c_customer_sk AND
    b_marital = c_marital
  GROUP BY i_product_name, ss_item_sk, s_store_name, s_zip,
    b_street_number, b_street_name, b_city, b_zip,
    c_street_number, c_street_name, c_city, c_zip,
    syear, fsyear, s2year
  )"""

_tpcds(
    "tpcds_q64",
    ["catalog_sales", "catalog_returns", "store_sales", "store_returns",
     "date_dim", "store", "customer_dim", "customer_demographics",
     "household_demographics", "customer_address", "income_band",
     "promotion", "item"],
    """
SELECT
  cs1.product_name,
  cs1.store_name,
  cs1.store_zip,
  cs1.b_street_number,
  cs1.b_street_name,
  cs1.b_city,
  cs1.b_zip,
  cs1.c_street_number,
  cs1.c_street_name,
  cs1.c_city,
  cs1.c_zip,
  cs1.syear,
  cs1.cnt,
  cs1.s1,
  cs1.s2,
  cs1.s3,
  cs2.s1 AS s1_2,
  cs2.s2 AS s2_2,
  cs2.s3 AS s3_2,
  cs2.syear AS syear_2,
  cs2.cnt AS cnt_2
FROM cross_sales cs1, cross_sales cs2
WHERE cs1.item_sk = cs2.item_sk AND
  cs1.syear = 1998 AND
  cs2.syear = 1998 + 1 AND
  cs2.cnt <= cs1.cnt AND
  cs1.store_name = cs2.store_name AND
  cs1.store_zip = cs2.store_zip
ORDER BY cs1.product_name, cs1.store_name, cs2.cnt
""",
    "TPC-DS q64 (reference inputs/q64.sql): the corpus's widest join — "
    "store sale + its return + the item's net-positive catalog history "
    "+ two demographics, two households, two addresses, two income "
    "bands, three date roles, store, promotion and item, aggregated "
    "per item/store/address/year and self-joined across consecutive "
    "years on item+store. Adaptations beyond cents: (1) cs_ui's "
    "HAVING 'sale > 2*refund' -> 'sale > refund' — derived refund "
    "components sum to ~95% of the sale price by construction, so the "
    "reference multiplier empties the CTE at every SF; (2) cd1 <> cd2 "
    "marital -> '=' — the derived sale-time and current cdemo sks are "
    "the same pure function of the customer key, so inequality is "
    "vacuously empty (the double-demographics join shape is what is "
    "being exercised); (3) colors/prices retuned to the derived "
    "domains (colors are p_name first words; price band inside the "
    "90000-99990 cents domain, double-band shape kept); (4) years "
    "1999/2000 -> 1998/1999; (5) cs2's duplicate output columns get "
    "explicit s*_2 aliases (driver compares by column name); (6) the "
    "reference's single 18-relation FROM block is decomposed into "
    "layered CTEs (sale side | customer side | final group) — an "
    "algebraically identical inner-join conjunction with the GROUP BY "
    "still over the full join, but DuckDB's join-order search above "
    "~16 relations degenerates into a plan that does not finish even "
    "at sf0.001 (measured >2 min on 6k rows; layered form 0.3 s at "
    "sf0.01), while Spark inlines the CTEs and re-optimizes the full "
    "graph globally (plan-gated: no CartesianProduct). No LIMIT, so "
    "the reference's tie-prone sort needs no tiebreak "
    "(order-insensitive compare).",
    extra=_Q64_CTES,
)

# ---------------------------------------------------------------------------
# q37 / q82 — in-stock items in a price band also sold via one channel
# ---------------------------------------------------------------------------

def _q37_like(name: str, fact_table: str, fact_item: str, lo: int,
              d0: str, d1: str, manufact: str, ref: str) -> None:
    _tpcds(
        name,
        ["item", "inventory", "date_dim", fact_table],
        f"""
SELECT
  i_item_id,
  i_item_desc,
  i_current_price_cents
FROM item, inventory, date_dim, {fact_table}
WHERE i_current_price_cents BETWEEN {lo} AND {lo} + 5000
  AND inv_item_sk = i_item_sk
  AND d_date_sk = inv_date_sk
  AND d_date BETWEEN CAST('{d0}' AS DATE) AND CAST('{d1}' AS DATE)
  AND i_manufact_id IN {manufact}
  AND inv_quantity_on_hand BETWEEN 100 AND 500
  AND {fact_item} = i_item_sk
GROUP BY i_item_id, i_item_desc, i_current_price_cents
ORDER BY i_item_id
LIMIT 100
""",
        f"TPC-DS {ref} (reference inputs/{ref}.sql): items in a price "
        "band from four manufacturers with healthy on-hand inventory "
        "in a 60-day window that also sold through the "
        f"{'catalog' if fact_table == 'catalog_sales' else 'store'} "
        "channel. Price band moved inside the derived 90000-99990 "
        "cents domain (same +$50 width shape; anchored at the domain "
        "floor since r16 so the band also populates sf0.001 — the "
        "r15-era anchors were vacuous at the smallest SF); manufact "
        "ids into 1..50; the reference's date + INTERVAL 60 days is "
        "spelled as the literal end date (identical range, no "
        "cross-engine interval dialect). i_item_id is unique per "
        "group and leads the sort: LIMIT-safe.",
    )


_q37_like("tpcds_q37", "catalog_sales", "cs_item_sk", 90000,
          "1998-02-01", "1998-04-02", "(7, 21, 33, 45)", "q37")
_q37_like("tpcds_q82", "store_sales", "ss_item_sk", 90000,
          "1998-05-25", "1998-07-24", "(12, 27, 38, 44)", "q82")

# ---------------------------------------------------------------------------
# q30 / q81 — customers returning >1.2x their state's average (web/catalog)
# ---------------------------------------------------------------------------

_Q30_CTR = """customer_total_return AS {MAT}
(SELECT
    wr_returning_customer_sk AS ctr_customer_sk,
    ca_state AS ctr_state,
    CAST(SUM(wr_return_amt_cents) AS BIGINT) AS ctr_total_return
  FROM web_returns, date_dim, customer_address
  WHERE wr_returned_date_sk = d_date_sk
    AND d_year = 1998
    AND wr_returning_addr_sk = ca_address_sk
  GROUP BY wr_returning_customer_sk, ca_state)"""

_tpcds(
    "tpcds_q30",
    ["web_returns", "date_dim", "customer_address", "customer_dim"],
    """
SELECT
  c_customer_id,
  c_salutation,
  c_first_name,
  c_last_name,
  c_preferred_cust_flag,
  c_birth_day,
  c_birth_month,
  c_birth_year,
  c_birth_country,
  c_login,
  c_email_address,
  c_last_review_date,
  ctr_total_return
FROM customer_total_return ctr1, customer_address, customer_dim
WHERE ctr1.ctr_total_return >
  (SELECT CAST(SUM(ctr_total_return) AS DOUBLE) / COUNT(*) * 1.2
   FROM customer_total_return ctr2
   WHERE ctr1.ctr_state = ctr2.ctr_state)
  AND ca_address_sk = c_current_addr_sk
  AND ca_state = 'S07'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id, c_salutation, c_first_name, c_last_name,
  c_preferred_cust_flag, c_birth_day, c_birth_month, c_birth_year,
  c_birth_country, c_login, c_email_address, c_last_review_date,
  ctr_total_return
LIMIT 100
""",
    "TPC-DS q30 (reference inputs/q30.sql): web-return customers in "
    "one state whose yearly return total beats 1.2x their state's "
    "average — a grouped CTE consumed twice, once through a "
    "correlated scalar average. avg() is spelled "
    "CAST(SUM AS DOUBLE)/COUNT(*) over exact cents (single IEEE "
    "division both engines). 'GA' -> 'S07' (derived state domain), "
    "d_year 2002 -> 1998. One row per qualifying customer; "
    "c_customer_id is unique and leads the sort: LIMIT-safe.",
    extra=_Q30_CTR,
)

_Q81_CTR = """customer_total_return AS {MAT}
(SELECT
    cr_returning_customer_sk AS ctr_customer_sk,
    ca_state AS ctr_state,
    CAST(SUM(cr_return_amt_inc_tax_cents) AS BIGINT) AS ctr_total_return
  FROM catalog_returns, date_dim, customer_address
  WHERE cr_returned_date_sk = d_date_sk
    AND d_year = 1997
    AND cr_returning_addr_sk = ca_address_sk
  GROUP BY cr_returning_customer_sk, ca_state)"""

_tpcds(
    "tpcds_q81",
    ["catalog_returns", "date_dim", "customer_address", "customer_dim"],
    """
SELECT
  c_customer_id,
  c_salutation,
  c_first_name,
  c_last_name,
  ca_street_number,
  ca_street_name,
  ca_street_type,
  ca_suite_number,
  ca_city,
  ca_county,
  ca_state,
  ca_zip,
  ca_country,
  ca_gmt_offset,
  ca_location_type,
  ctr_total_return
FROM customer_total_return ctr1, customer_address, customer_dim
WHERE ctr1.ctr_total_return >
  (SELECT CAST(SUM(ctr_total_return) AS DOUBLE) / COUNT(*) * 1.2
   FROM customer_total_return ctr2
   WHERE ctr1.ctr_state = ctr2.ctr_state)
  AND ca_address_sk = c_current_addr_sk
  AND ca_state = 'S07'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id, c_salutation, c_first_name, c_last_name,
  ca_street_number, ca_street_name, ca_street_type, ca_suite_number,
  ca_city, ca_county, ca_state, ca_zip, ca_country, ca_gmt_offset,
  ca_location_type, ctr_total_return
LIMIT 100
""",
    "TPC-DS q81 (reference inputs/q81.sql): q30's state-average "
    "pattern on catalog returns with tax-inclusive amounts, emitting "
    "the customer's full current address. Same adaptations as q30 "
    "(spelled-out IEEE average over exact cents, 'GA' -> 'S07'); "
    "d_year 2000 -> 1997. c_customer_id unique, leads the sort: "
    "LIMIT-safe.",
    extra=_Q81_CTR,
)

# ---------------------------------------------------------------------------
# q41 — manufacturers with at least one item matching attribute bundles
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q41",
    ["item"],
    """
SELECT DISTINCT (i_product_name)
FROM item i1
WHERE i_manufact_id BETWEEN 5 AND 5 + 40
  AND (SELECT COUNT(*) AS item_cnt
FROM item
WHERE (i_manufact = i1.i_manufact AND
  ((i_category = 'MEDIUM' AND
    (i_color = 'red' OR i_color = 'blue') AND
    (i_units = 'Each' OR i_units = 'Dozen') AND
    (i_size = 'medium' OR i_size = 'extra large')
  ) OR
    (i_category = 'MEDIUM' AND
      (i_color = 'hot' OR i_color = 'cold') AND
      (i_units = 'Case' OR i_units = 'Pallet') AND
      (i_size = 'small' OR i_size = 'economy')
    ) OR
    (i_category = 'STANDARD' AND
      (i_color = 'old' OR i_color = 'new') AND
      (i_units = 'Unknown' OR i_units = 'Dozen') AND
      (i_size = 'petite' OR i_size = 'large')
    ) OR
    (i_category = 'STANDARD' AND
      (i_color = 'small' OR i_color = 'large') AND
      (i_units = 'Each' OR i_units = 'Case') AND
      (i_size = 'medium' OR i_size = 'extra large')
    ))) OR
  (i_manufact = i1.i_manufact AND
    ((i_category = 'LARGE' AND
      (i_color = 'red' OR i_color = 'hot') AND
      (i_units = 'Pallet' OR i_units = 'Unknown') AND
      (i_size = 'medium' OR i_size = 'extra large')
    ) OR
      (i_category = 'LARGE' AND
        (i_color = 'blue' OR i_color = 'cold') AND
        (i_units = 'Each' OR i_units = 'Dozen') AND
        (i_size = 'small' OR i_size = 'economy')
      ) OR
      (i_category = 'PROMO' AND
        (i_color = 'old' OR i_color = 'small') AND
        (i_units = 'Case' OR i_units = 'Pallet') AND
        (i_size = 'petite' OR i_size = 'large')
      ) OR
      (i_category = 'PROMO' AND
        (i_color = 'new' OR i_color = 'large') AND
        (i_units = 'Dozen' OR i_units = 'Unknown') AND
        (i_size = 'medium' OR i_size = 'extra large')
      )))) > 0
ORDER BY i_product_name
LIMIT 100
""",
    "TPC-DS q41 (reference inputs/q41.sql): product names from "
    "mid-range manufacturers where the manufacturer has at least one "
    "item matching an 8-branch category/color/units/size attribute "
    "bundle — a correlated scalar COUNT(*) subquery over the same "
    "dimension. Every attribute literal is retuned to the derived "
    "domains (categories = p_type words, colors = p_name first "
    "words, units/sizes = the shim's CASE domains); the 8-branch OR "
    "shape and the two-arm manufact correlation are verbatim. "
    "DISTINCT product names sorted: LIMIT-safe (duplicate names "
    "collapse before the cut).",
)

# ---------------------------------------------------------------------------
# q86 — web revenue ROLLUP by category/class with intra-parent ranks
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q86",
    ["web_sales", "date_dim", "item"],
    """
SELECT
  CAST(SUM(ws_net_paid_cents) AS BIGINT) AS total_sum_cents,
  i_category,
  i_class,
  CAST(grouping(i_category) + grouping(i_class) AS INT) AS lochierarchy,
  CAST(rank()
  OVER (
    PARTITION BY grouping(i_category) + grouping(i_class),
      CASE WHEN grouping(i_class) = 0
        THEN i_category END
    ORDER BY SUM(ws_net_paid_cents) DESC) AS INT) AS rank_within_parent
FROM
  web_sales, date_dim d1, item
WHERE
  d1.d_month_seq BETWEEN 23952 AND 23952 + 11
    AND d1.d_date_sk = ws_sold_date_sk
    AND i_item_sk = ws_item_sk
GROUP BY ROLLUP (i_category, i_class)
ORDER BY
  lochierarchy DESC,
  COALESCE(CASE WHEN lochierarchy = 0
    THEN i_category END, ''),
  rank_within_parent,
  COALESCE(i_category, ''), COALESCE(i_class, '')
LIMIT 100
""",
    "TPC-DS q86 (reference inputs/q86.sql): yearly web revenue under "
    "ROLLUP(category, class) with rank() partitioned by grouping() "
    "level — q70's shape on the item hierarchy instead of geography. "
    "d_month_seq 1200 -> 23952 (derived month_seq = year*12+moy-1, "
    "i.e. 1996). Exact-cents rank ties are identical cross-engine. "
    "The sort CASE is COALESCE'd and category/class appended as "
    "tiebreaks (NULL-ordering differs Spark-vs-DuckDB; rollup rows "
    "are unique per (category, class) level): LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q28 — six quantity-band list-price profiles cross-joined
# ---------------------------------------------------------------------------

def _q28_band(i: int, qlo: int, qhi: int, llo: int, clo: int,
              wlo: int) -> str:
    return f"""(SELECT
    CAST(SUM(ss_list_price_cents) AS DOUBLE) / COUNT(ss_list_price_cents)
      AS b{i}_lp,
    CAST(COUNT(ss_list_price_cents) AS BIGINT) AS b{i}_cnt,
    CAST(COUNT(DISTINCT ss_list_price_cents) AS BIGINT) AS b{i}_cntd
  FROM store_sales
  WHERE ss_quantity BETWEEN {qlo} AND {qhi}
    AND (ss_list_price_cents BETWEEN {llo} AND {llo} + 1000000
    OR ss_coupon_amt_cents BETWEEN {clo} AND {clo} + 100000
    OR ss_ext_wholesale_cost_cents BETWEEN {wlo} AND {wlo} + 2000000)) b{i}"""


_tpcds(
    "tpcds_q28",
    ["store_sales"],
    "SELECT *\nFROM " + ",\n  ".join([
        _q28_band(1, 0, 5, 200000, 5000, 100000),
        _q28_band(2, 6, 10, 700000, 20000, 400000),
        _q28_band(3, 11, 15, 1300000, 40000, 700000),
        _q28_band(4, 16, 20, 1800000, 60000, 1000000),
        _q28_band(5, 21, 25, 2300000, 80000, 1300000),
        _q28_band(6, 26, 30, 2800000, 100000, 1600000),
    ]) + "\nLIMIT 100",
    "TPC-DS q28 (reference inputs/q28.sql): six single-row aggregate "
    "derived tables (avg/count/count-distinct of list price inside a "
    "quantity band AND an OR of list/coupon/wholesale bands) "
    "cross-joined into one row of 18 columns. Bands are retuned to "
    "the derived cents domains, each centered on its quantity band's "
    "expected list total so every band is non-empty at sf0.01; avg "
    "is CAST(SUM AS DOUBLE)/COUNT over exact cents (empty bands "
    "yield NULL identically in both engines). Single row: LIMIT "
    "trivially safe.",
)

# ---------------------------------------------------------------------------
# q40 — catalog net sales by warehouse state before/after a pivot date
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q40",
    ["catalog_sales", "catalog_returns", "warehouse", "item",
     "date_dim"],
    """
SELECT
  w_state,
  i_item_id,
  CAST(SUM(CASE WHEN (d_date < CAST('1998-03-11' AS DATE))
    THEN cs_sales_price_cents - COALESCE(cr_refunded_cash_cents, 0)
      ELSE 0 END) AS BIGINT) AS sales_before_cents,
  CAST(SUM(CASE WHEN (d_date >= CAST('1998-03-11' AS DATE))
    THEN cs_sales_price_cents - COALESCE(cr_refunded_cash_cents, 0)
      ELSE 0 END) AS BIGINT) AS sales_after_cents
FROM
  catalog_sales
  LEFT OUTER JOIN catalog_returns ON
                                    (cs_order_number = cr_order_number
                                      AND cs_item_sk = cr_item_sk)
  , warehouse, item, date_dim
WHERE
  i_current_price_cents BETWEEN 90000 AND 95000
    AND i_item_sk = cs_item_sk
    AND cs_warehouse_sk = w_warehouse_sk
    AND cs_sold_date_sk = d_date_sk
    AND d_date BETWEEN CAST('1998-02-09' AS DATE)
  AND CAST('1998-04-10' AS DATE)
GROUP BY w_state, i_item_id
ORDER BY w_state, i_item_id
LIMIT 100
""",
    "TPC-DS q40 (reference inputs/q40.sql): catalog revenue net of "
    "refunds per warehouse state and item, split before/after a "
    "pivot date inside a 60-day window — LEFT OUTER against returns "
    "so unreturned lines keep full price. Price band and dates moved "
    "into the derived domains (pivot 2000-03-11 -> 1998-03-11; the "
    "+-30-day window is spelled as literal dates, no INTERVAL "
    "dialect; the band is anchored at the domain floor since r16 so "
    "sf0.001 populates — 52/100/100 rows at the three SFs). "
    "(w_state, i_item_id) is the group key and the full "
    "sort key: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q56 — three-channel item revenue for a color cohort in one month
# ---------------------------------------------------------------------------

def _q56_chan(cte: str, fact: str, p: str, addr: str) -> str:
    return f"""{cte} AS {{MAT}} (
  SELECT
    i_item_id,
    CAST(SUM({p}_ext_sales_price_cents) AS BIGINT) AS total_sales
  FROM
    {fact}, date_dim, customer_address, item
  WHERE
    i_item_id IN (SELECT i_item_id
    FROM item
    WHERE i_color IN ('red', 'blue', 'hot'))
      AND {p}_item_sk = i_item_sk
      AND {p}_sold_date_sk = d_date_sk
      AND d_year = 1998
      AND d_moy = 2
      AND {addr} = ca_address_sk
      AND ca_gmt_offset = -5
  GROUP BY i_item_id)"""


_Q56_CTES = ",\n    ".join([
    _q56_chan("ss", "store_sales", "ss", "ss_addr_sk"),
    _q56_chan("cs", "catalog_sales", "cs", "cs_bill_addr_sk"),
    _q56_chan("ws", "web_sales", "ws", "ws_bill_addr_sk"),
])

_tpcds(
    "tpcds_q56",
    ["store_sales", "catalog_sales", "web_sales", "date_dim",
     "customer_address", "item"],
    """
SELECT
  i_item_id,
  CAST(SUM(total_sales) AS BIGINT) AS total_sales
FROM (SELECT *
      FROM ss
      UNION ALL
      SELECT *
      FROM cs
      UNION ALL
      SELECT *
      FROM ws) tmp1
GROUP BY i_item_id
ORDER BY total_sales, i_item_id
LIMIT 100
""",
    "TPC-DS q56 (reference inputs/q56.sql): February revenue per item "
    "for a 3-color cohort, summed across all three channels (per-"
    "channel CTEs UNION ALL'd then re-grouped). Colors -> the derived "
    "p_name-first-word domain; gmt_offset -5 kept (derived -5/-6); "
    "d_year 2001 -> 1998. The reference sorts by total_sales alone "
    "(ties possible) — i_item_id (unique group key) appended: "
    "LIMIT-safe.",
    extra=_Q56_CTES,
)

# ---------------------------------------------------------------------------
# q69 — demographics of store-only shoppers (EXISTS + two NOT EXISTS)
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q69",
    ["customer_dim", "customer_address", "customer_demographics",
     "store_sales", "web_sales", "catalog_sales", "date_dim"],
    """
SELECT
  cd_gender,
  cd_marital_status,
  cd_education_status,
  CAST(COUNT(*) AS BIGINT) AS cnt1,
  cd_purchase_estimate,
  CAST(COUNT(*) AS BIGINT) AS cnt2,
  cd_credit_rating,
  CAST(COUNT(*) AS BIGINT) AS cnt3
FROM
  customer_dim c, customer_address ca, customer_demographics
WHERE
  c.c_current_addr_sk = ca.ca_address_sk AND
    ca_state IN ('S01', 'S07', 'S14') AND
    cd_demo_sk = c.c_current_cdemo_sk AND
    EXISTS(SELECT *
           FROM store_sales, date_dim
           WHERE c.c_customer_sk = ss_customer_sk AND
             ss_sold_date_sk = d_date_sk AND
             d_year = 1998 AND
             d_moy BETWEEN 4 AND 4 + 2) AND
    (NOT EXISTS(SELECT *
                FROM web_sales, date_dim
                WHERE c.c_customer_sk = ws_bill_customer_sk AND
                  ws_sold_date_sk = d_date_sk AND
                  d_year = 1998 AND
                  d_moy BETWEEN 4 AND 4 + 2) AND
      NOT EXISTS(SELECT *
                 FROM catalog_sales, date_dim
                 WHERE c.c_customer_sk = cs_ship_customer_sk AND
                   cs_sold_date_sk = d_date_sk AND
                   d_year = 1998 AND
                   d_moy BETWEEN 4 AND 4 + 2))
GROUP BY cd_gender, cd_marital_status, cd_education_status,
  cd_purchase_estimate, cd_credit_rating
ORDER BY cd_gender, cd_marital_status, cd_education_status,
  cd_purchase_estimate, cd_credit_rating
LIMIT 100
""",
    "TPC-DS q69 (reference inputs/q69.sql): demographic profile of "
    "customers in three states who shopped in-store during one "
    "quarter but neither online nor by catalog — one EXISTS and two "
    "NOT EXISTS decorrelated over the channel facts. States -> "
    "derived S-codes, 2001 -> 1998. The triple count(*) per group is "
    "kept verbatim. Group key = sort key: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q71 — brand revenue by breakfast/dinner minute across all channels
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q71",
    ["item", "web_sales", "catalog_sales", "store_sales", "date_dim",
     "time_dim"],
    """
SELECT
  i_brand_id AS brand_id,
  i_brand AS brand,
  t_hour,
  t_minute,
  CAST(SUM(ext_price) AS BIGINT) AS ext_price_cents
FROM item,
  (SELECT
     ws_ext_sales_price_cents AS ext_price,
     ws_sold_date_sk AS sold_date_sk,
     ws_item_sk AS sold_item_sk,
     ws_sold_time_sk AS time_sk
   FROM web_sales, date_dim
   WHERE d_date_sk = ws_sold_date_sk
     AND d_moy = 11
     AND d_year = 1998
   UNION ALL
   SELECT
     cs_ext_sales_price_cents AS ext_price,
     cs_sold_date_sk AS sold_date_sk,
     cs_item_sk AS sold_item_sk,
     cs_sold_time_sk AS time_sk
   FROM catalog_sales, date_dim
   WHERE d_date_sk = cs_sold_date_sk
     AND d_moy = 11
     AND d_year = 1998
   UNION ALL
   SELECT
     ss_ext_sales_price_cents AS ext_price,
     ss_sold_date_sk AS sold_date_sk,
     ss_item_sk AS sold_item_sk,
     ss_sold_time_sk AS time_sk
   FROM store_sales, date_dim
   WHERE d_date_sk = ss_sold_date_sk
     AND d_moy = 11
     AND d_year = 1998
  ) AS tmp, time_dim
WHERE
  sold_item_sk = i_item_sk
    AND i_manager_id = 1
    AND time_sk = t_time_sk
    AND (t_meal_time = 'breakfast' OR t_meal_time = 'dinner')
GROUP BY i_brand, i_brand_id, t_hour, t_minute
ORDER BY ext_price_cents DESC, brand_id
""",
    "TPC-DS q71 (reference inputs/q71.sql): one manager's brand "
    "revenue per breakfast/dinner minute in November, channels UNION "
    "ALL'd before the time_dim join (derived t_meal_time covers "
    "hours 6-8 and 17-19). d_year 1999 -> 1998 (derived November "
    "sold-date density). No LIMIT, so the revenue-first sort needs "
    "no tiebreak (order-insensitive compare).",
)

# ---------------------------------------------------------------------------
# q74 — customers whose web growth outpaces store growth (q11's twin)
# ---------------------------------------------------------------------------

_Q74_YT = """year_total AS {MAT} (
  SELECT
    c_customer_id AS customer_id,
    c_first_name AS customer_first_name,
    c_last_name AS customer_last_name,
    d_year AS sale_year,
    CAST(SUM(ss_net_paid_cents) AS BIGINT) AS year_total,
    's' AS sale_type
  FROM
    customer_dim, store_sales, date_dim
  WHERE c_customer_sk = ss_customer_sk
    AND ss_sold_date_sk = d_date_sk
    AND d_year IN (1997, 1997 + 1)
  GROUP BY
    c_customer_id, c_first_name, c_last_name, d_year
  UNION ALL
  SELECT
    c_customer_id AS customer_id,
    c_first_name AS customer_first_name,
    c_last_name AS customer_last_name,
    d_year AS sale_year,
    CAST(SUM(ws_net_paid_cents) AS BIGINT) AS year_total,
    'w' AS sale_type
  FROM
    customer_dim, web_sales, date_dim
  WHERE c_customer_sk = ws_bill_customer_sk
    AND ws_sold_date_sk = d_date_sk
    AND d_year IN (1997, 1997 + 1)
  GROUP BY
    c_customer_id, c_first_name, c_last_name, d_year)"""

_tpcds(
    "tpcds_q74",
    ["customer_dim", "store_sales", "web_sales", "date_dim"],
    """
SELECT
  t_s_secyear.customer_id,
  t_s_secyear.customer_first_name,
  t_s_secyear.customer_last_name
FROM
  year_total t_s_firstyear, year_total t_s_secyear,
  year_total t_w_firstyear, year_total t_w_secyear
WHERE t_s_secyear.customer_id = t_s_firstyear.customer_id
  AND t_s_firstyear.customer_id = t_w_secyear.customer_id
  AND t_s_firstyear.customer_id = t_w_firstyear.customer_id
  AND t_s_firstyear.sale_type = 's'
  AND t_w_firstyear.sale_type = 'w'
  AND t_s_secyear.sale_type = 's'
  AND t_w_secyear.sale_type = 'w'
  AND t_s_firstyear.sale_year = 1997
  AND t_s_secyear.sale_year = 1997 + 1
  AND t_w_firstyear.sale_year = 1997
  AND t_w_secyear.sale_year = 1997 + 1
  AND t_s_firstyear.year_total > 0
  AND t_w_firstyear.year_total > 0
  AND CASE WHEN t_w_firstyear.year_total > 0
  THEN CAST(t_w_secyear.year_total AS DOUBLE)
    / t_w_firstyear.year_total
      ELSE NULL END
  > CASE WHEN t_s_firstyear.year_total > 0
  THEN CAST(t_s_secyear.year_total AS DOUBLE)
    / t_s_firstyear.year_total
    ELSE NULL END
ORDER BY t_s_secyear.customer_id, t_s_secyear.customer_first_name,
  t_s_secyear.customer_last_name
LIMIT 100
""",
    "TPC-DS q74 (reference inputs/q74.sql): q11's year-over-year "
    "growth comparison without the email/login tiebreak columns — "
    "the two-channel year_total CTE instantiated four times, keeping "
    "customers whose web growth ratio beats their store ratio. "
    "'year' is aliased sale_year (bare-keyword hygiene), ratios are "
    "single IEEE divisions of exact BIGINT cents, years 2001/2 -> "
    "1997/8. The reference's ORDER BY 1,1,1 becomes the three output "
    "columns; customer_id is unique: LIMIT-safe.",
    extra=_Q74_YT,
)

# ---------------------------------------------------------------------------
# q24a/q24b — per-customer store net-paid for one color vs 5% of average
# ---------------------------------------------------------------------------

_Q24_SSALES = """ssales AS {MAT}
(SELECT
    c_last_name,
    c_first_name,
    s_store_name,
    ca_state,
    s_state,
    i_color,
    i_current_price_cents,
    i_manager_id,
    i_units,
    i_size,
    CAST(SUM(ss_net_paid_cents) AS BIGINT) AS netpaid
  FROM store_sales, store_returns, store, item, customer_dim,
    customer_address
  WHERE ss_ticket_number = sr_ticket_number
    AND ss_item_sk = sr_item_sk
    AND ss_customer_sk = c_customer_sk
    AND ss_item_sk = i_item_sk
    AND ss_store_sk = s_store_sk
    AND c_birth_country = upper(ca_country)
    AND s_zip = ca_zip
    AND s_market_id = 8
  GROUP BY c_last_name, c_first_name, s_store_name, ca_state, s_state,
    i_color, i_current_price_cents, i_manager_id, i_units, i_size)"""


def _q24(name: str, color: str, ref: str) -> None:
    _tpcds(
        name,
        ["store_sales", "store_returns", "store", "item",
         "customer_dim", "customer_address"],
        f"""
SELECT
  c_last_name,
  c_first_name,
  s_store_name,
  CAST(SUM(netpaid) AS BIGINT) AS paid
FROM ssales
WHERE i_color = '{color}'
GROUP BY c_last_name, c_first_name, s_store_name
HAVING SUM(netpaid) >
  (SELECT 0.05 * (CAST(SUM(netpaid) AS DOUBLE) / COUNT(*)) FROM ssales)
""",
        f"TPC-DS {ref} (reference inputs/{ref}.sql): returned store "
        "purchases netpaid per customer/store/item-attribute bundle, "
        "then customers whose one-color total beats 5% of the global "
        f"average ('{color}' arm). The reference's join edges "
        "c_birth_country = upper(ca_country) and s_zip = ca_zip run "
        "VERBATIM (round 9): the shim mirrors upper(ca_country) into "
        "c_birth_country for a deterministic 25% customer subset "
        "(c_custkey % 4 = 1) and co-grids a deterministic 1-in-11 "
        "address subset (c_custkey % 11 = 7) onto the store zip grid "
        "10000 + sk*1111 — residue 7 is disjoint from the q15/q45 "
        "zip-literal custkeys mod 11, so their cohorts are untouched. "
        f"Color '{color}' (reference 'pale'/'chiffon' are not in the "
        "derived p_name color domain). avg is spelled "
        "CAST(SUM AS DOUBLE)/COUNT(*). No ORDER BY/LIMIT in the "
        "reference: order-insensitive compare.",
        extra=_Q24_SSALES,
    )


_q24("tpcds_q24a", "red", "q24a")
_q24("tpcds_q24b", "blue", "q24b")

# ---------------------------------------------------------------------------
# q39a/q39b — warehouse/item monthly inventory volatility month-pairs
# ---------------------------------------------------------------------------

_Q39_INV = """inv AS {MAT}
(SELECT
    w_warehouse_name,
    w_warehouse_sk,
    i_item_sk,
    d_moy,
    stdev,
    mean,
    CASE WHEN mean = 0
      THEN NULL
    ELSE stdev / mean END AS cov
  FROM (SELECT
    w_warehouse_name,
    w_warehouse_sk,
    i_item_sk,
    d_moy,
    CASE WHEN COUNT(*) > 1 THEN
      sqrt((COUNT(*) * CAST(SUM(CAST(inv_quantity_on_hand AS BIGINT)
              * inv_quantity_on_hand) AS DOUBLE)
            - CAST(SUM(CAST(inv_quantity_on_hand AS BIGINT)) AS DOUBLE)
              * SUM(CAST(inv_quantity_on_hand AS BIGINT)))
           / (COUNT(*) * (COUNT(*) - 1))) END AS stdev,
    CAST(SUM(CAST(inv_quantity_on_hand AS BIGINT)) AS DOUBLE)
      / COUNT(*) AS mean
  FROM inventory, item, warehouse, date_dim
  WHERE inv_item_sk = i_item_sk
    AND inv_warehouse_sk = w_warehouse_sk
    AND inv_date_sk = d_date_sk
    AND d_year = 1998
  GROUP BY w_warehouse_name, w_warehouse_sk, i_item_sk, d_moy) foo
  WHERE CASE WHEN mean = 0
        THEN 0
        ELSE stdev / mean END > 0.5)"""


def _q39(name: str, extra_pred: str, ref: str, note: str) -> None:
    _tpcds(
        name,
        ["inventory", "item", "warehouse", "date_dim"],
        f"""
SELECT
  inv1.w_warehouse_sk AS w_warehouse_sk_1,
  inv1.i_item_sk AS i_item_sk_1,
  inv1.d_moy AS d_moy_1,
  inv1.mean AS mean_1,
  inv1.cov AS cov_1,
  inv2.w_warehouse_sk AS w_warehouse_sk_2,
  inv2.i_item_sk AS i_item_sk_2,
  inv2.d_moy AS d_moy_2,
  inv2.mean AS mean_2,
  inv2.cov AS cov_2
FROM inv inv1, inv inv2
WHERE inv1.i_item_sk = inv2.i_item_sk
  AND inv1.w_warehouse_sk = inv2.w_warehouse_sk
  AND inv1.d_moy = 9
  AND inv2.d_moy = 9 + 1{extra_pred}
ORDER BY inv1.w_warehouse_sk, inv1.i_item_sk, inv1.d_moy, inv1.mean,
  inv1.cov, inv2.d_moy, inv2.mean, inv2.cov
""",
        f"TPC-DS {ref} (reference inputs/{ref}.sql): warehouse/item "
        "pairs whose monthly on-hand quantity is volatile (coefficient "
        "of variation > 0.5) in BOTH September and October" + note + " — "
        "a grouped-stats CTE self-joined across months. stddev_samp "
        "is the q17 spelled-out sqrt over exact BIGINT sums; mean is "
        "CAST(SUM AS DOUBLE)/COUNT(*); cov their IEEE quotient "
        "(identical expression both engines). The reference CASE "
        "mean WHEN 0 syntax is spelled 'WHEN mean = 0' (mean is an "
        "IEEE double; literal-form CASE equality on doubles is "
        "dialect-fragile). d_year 2001 -> 1998; months 1/2 -> 9/10 and "
        "the cov thresholds 1 / 1.5 -> 0.5 / 0.51 — the derived "
        "uniform-quantity inventory tops out near cov 1.1, and 9/10 is "
        "the only month pair with a qualifying warehouse/item at both "
        "sf0.01 and sf0.1 (measured). Self-joined output "
        "columns get _1/_2 aliases (driver compares by name). No "
        "LIMIT: order-insensitive compare.",
        extra=_Q39_INV,
    )


_q39("tpcds_q39a", "", "q39a", "")
_q39("tpcds_q39b", "\n  AND inv1.cov > 0.51", "q39b",
     " with the September side above 0.51")

# ---------------------------------------------------------------------------
# q54 — revenue segments of December cross-channel category buyers
# ---------------------------------------------------------------------------

_Q54_CTES = """my_customers AS {MAT} (
  SELECT DISTINCT
    c_customer_sk,
    c_current_addr_sk
  FROM
    (SELECT
       cs_sold_date_sk AS sold_date_sk,
       cs_bill_customer_sk AS customer_sk,
       cs_item_sk AS item_sk
     FROM catalog_sales
     UNION ALL
     SELECT
       ws_sold_date_sk AS sold_date_sk,
       ws_bill_customer_sk AS customer_sk,
       ws_item_sk AS item_sk
     FROM web_sales
    ) cs_or_ws_sales,
    item,
    date_dim,
    customer_dim
  WHERE sold_date_sk = d_date_sk
    AND item_sk = i_item_sk
    AND i_category = 'PROMO'
    AND i_class = 'class_0'
    AND c_customer_sk = cs_or_ws_sales.customer_sk
    AND d_moy = 12
    AND d_year = 1997
),
    my_revenue AS {MAT} (
  SELECT
    c_customer_sk,
    CAST(SUM(ss_ext_sales_price_cents) AS BIGINT) AS revenue
  FROM my_customers,
    store_sales,
    customer_address,
    store,
    date_dim
  WHERE c_current_addr_sk = ca_address_sk
    AND ca_county = s_county
    AND ca_state = s_state
    AND ss_sold_date_sk = d_date_sk
    AND c_customer_sk = ss_customer_sk
    AND d_month_seq BETWEEN (SELECT DISTINCT d_month_seq + 1
  FROM date_dim
  WHERE d_year = 1997 AND d_moy = 12)
  AND (SELECT DISTINCT d_month_seq + 3
  FROM date_dim
  WHERE d_year = 1997 AND d_moy = 12)
  GROUP BY c_customer_sk
),
    segments AS {MAT}
(SELECT CAST(floor(revenue / 500000.0) AS INT) AS segment
  FROM my_revenue)"""

_tpcds(
    "tpcds_q54",
    ["catalog_sales", "web_sales", "item", "date_dim", "customer_dim",
     "store_sales", "customer_address", "store"],
    """
SELECT
  segment,
  CAST(COUNT(*) AS BIGINT) AS num_customers,
  segment * 500000 AS segment_base_cents
FROM segments
GROUP BY segment
ORDER BY segment, num_customers
LIMIT 100
""",
    "TPC-DS q54 (reference inputs/q54.sql): customers who bought one "
    "category/class by catalog or web in December, then their store "
    "revenue in the following quarter (month_seq window anchored by "
    "scalar DISTINCT subqueries) bucketed into $5000 segments. "
    "'Women'/'maternity' -> 'PROMO'/'class_0' (the densest derived "
    "category/class cohort in December 1997); "
    "the segment divisor becomes 500000 cents and the truncating "
    "INT cast is spelled floor() (DuckDB rounds double->INT casts, "
    "Spark truncates); county+state store/address co-location kept "
    "verbatim. Group key leads the sort: LIMIT-safe.",
    extra=_Q54_CTES,
)

# ---------------------------------------------------------------------------
# q57 — call-center brand months deviating >10% from the yearly average
# ---------------------------------------------------------------------------

_Q57_CTES = """v1 AS {MAT} (
  SELECT
    i_category,
    i_brand,
    cc_name,
    d_year,
    d_moy,
    CAST(SUM(cs_sales_price_cents) AS BIGINT) AS sum_sales,
    CAST(SUM(SUM(cs_sales_price_cents))
    OVER
    (PARTITION BY i_category, i_brand, cc_name, d_year) AS DOUBLE)
    / COUNT(SUM(cs_sales_price_cents))
    OVER
    (PARTITION BY i_category, i_brand, cc_name, d_year)
    AS avg_monthly_sales,
    rank()
    OVER
    (PARTITION BY i_category, i_brand, cc_name
      ORDER BY d_year, d_moy) AS rn
  FROM item, catalog_sales, date_dim, call_center
  WHERE cs_item_sk = i_item_sk AND
    cs_sold_date_sk = d_date_sk AND
    cc_call_center_sk = cs_call_center_sk AND
    (
      d_year = 1997 OR
        (d_year = 1997 - 1 AND d_moy = 12) OR
        (d_year = 1997 + 1 AND d_moy = 1)
    )
  GROUP BY i_category, i_brand,
    cc_name, d_year, d_moy),
    v2 AS {MAT} (
    SELECT
      v1.i_category,
      v1.i_brand,
      v1.cc_name,
      v1.d_year,
      v1.d_moy,
      v1.avg_monthly_sales,
      v1.sum_sales,
      v1_lag.sum_sales AS psum,
      v1_lead.sum_sales AS nsum
    FROM v1, v1 v1_lag, v1 v1_lead
    WHERE v1.i_category = v1_lag.i_category AND
      v1.i_category = v1_lead.i_category AND
      v1.i_brand = v1_lag.i_brand AND
      v1.i_brand = v1_lead.i_brand AND
      v1.cc_name = v1_lag.cc_name AND
      v1.cc_name = v1_lead.cc_name AND
      v1.rn = v1_lag.rn + 1 AND
      v1.rn = v1_lead.rn - 1)"""

_tpcds(
    "tpcds_q57",
    ["item", "catalog_sales", "date_dim", "call_center"],
    """
SELECT *
FROM v2
WHERE d_year = 1997 AND
  avg_monthly_sales > 0 AND
  CASE WHEN avg_monthly_sales > 0
    THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
  ELSE NULL END > 0.1
ORDER BY sum_sales - avg_monthly_sales, cc_name, i_category, i_brand,
  d_moy
LIMIT 100
""",
    "TPC-DS q57 (reference inputs/q57.sql): call-center brand months "
    "whose catalog sales deviate >10% from that year's monthly "
    "average, with the neighbor months' sums (lag/lead via rank "
    "self-joins, not window lag — the reference's own shape). "
    "avg(sum()) OVER is spelled SUM(SUM())OVER / COUNT(SUM())OVER "
    "(exact partition sum, one IEEE division — native windowed AVG "
    "orderings are not cross-engine stable). 1999 -> 1997. The "
    "reference sorts by (deviation, cc_name) which ties across "
    "brands; category/brand/moy appended (v2 rows are unique per "
    "those + cc_name): LIMIT-safe.",
    extra=_Q57_CTES,
)

# ---------------------------------------------------------------------------
# q72 — catalog lines short on same-week inventory, promo vs no-promo
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q72",
    ["catalog_sales", "inventory", "warehouse", "item",
     "customer_demographics", "household_demographics", "date_dim",
     "promotion", "catalog_returns"],
    """
SELECT
  i_item_desc,
  w_warehouse_name,
  d1.d_week_seq,
  CAST(COUNT(CASE WHEN p_promo_sk IS NULL
    THEN 1
        ELSE 0 END) AS BIGINT) AS no_promo,
  CAST(COUNT(CASE WHEN p_promo_sk IS NOT NULL
    THEN 1
        ELSE 0 END) AS BIGINT) AS promo,
  CAST(COUNT(*) AS BIGINT) AS total_cnt
FROM catalog_sales
  JOIN inventory ON (cs_item_sk = inv_item_sk)
  JOIN warehouse ON (w_warehouse_sk = inv_warehouse_sk)
  JOIN item ON (i_item_sk = cs_item_sk)
  JOIN customer_demographics ON (cs_bill_cdemo_sk = cd_demo_sk)
  JOIN household_demographics ON (cs_bill_hdemo_sk = hd_demo_sk)
  JOIN date_dim d1 ON (cs_sold_date_sk = d1.d_date_sk)
  JOIN date_dim d2 ON (inv_date_sk = d2.d_date_sk)
  JOIN date_dim d3 ON (cs_ship_date_sk = d3.d_date_sk)
  LEFT OUTER JOIN promotion ON (cs_promo_sk = p_promo_sk)
  LEFT OUTER JOIN catalog_returns ON (cr_item_sk = cs_item_sk
    AND cr_order_number = cs_order_number)
WHERE d1.d_week_seq = d2.d_week_seq
  AND inv_quantity_on_hand < cs_quantity * 10
  AND d3.d_date > d1.d_date + INTERVAL 5 DAY
  AND hd_buy_potential = '>10000'
  AND d1.d_year = 1998
  AND cd_marital_status = 'D'
GROUP BY i_item_desc, w_warehouse_name, d1.d_week_seq
ORDER BY total_cnt DESC, i_item_desc, w_warehouse_name, d1.d_week_seq
LIMIT 100
""",
    "TPC-DS q72 (reference inputs/q72.sql): catalog lines whose "
    "same-week warehouse inventory cannot cover the ordered quantity "
    "(ship lag > 5 days, one demographic cohort), split promo vs "
    "no-promo. The derived on-hand quantity is 10x a line quantity, "
    "so the shortage compare is scaled to the same units "
    "(inv < cs_quantity * 10; the raw form is empty under the "
    "demographic cut at sf<=0.1). The inventory fan-out is collapsed "
    "by the d_week_seq equality. The reference's duplicated "
    "hd/d_year predicates are "
    "deduplicated; its count(CASE...ELSE 0) quirk (counts every row "
    "in both arms) is kept verbatim — the three counts are equal by "
    "construction in both engines. 1999 -> 1998; INTERVAL 5 DAY is "
    "parsed identically by Spark and DuckDB. Group key in the sort: "
    "LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q80 — 30-day sales/returns/profit ROLLUP across channel entities
# ---------------------------------------------------------------------------

def _q80_chan(cte: str, fact: str, p: str, rp: str, ent_table: str,
              ent_join: str, ent_id: str, ret_amt: str,
              ret_join: str) -> str:
    return f"""{cte} AS {{MAT}}
(SELECT
    {ent_id} AS entity_id,
    CAST(SUM({p}_ext_sales_price_cents) AS BIGINT) AS sales_cents,
    CAST(SUM(COALESCE({ret_amt}, 0)) AS BIGINT) AS returns_cents,
    CAST(SUM({p}_net_profit_cents - COALESCE({rp}_net_loss_cents, 0))
      AS BIGINT) AS profit_cents
  FROM {fact}
    LEFT OUTER JOIN {rp}_returns_t ON ({ret_join})
    , date_dim, {ent_table}, item, promotion
  WHERE {p}_sold_date_sk = d_date_sk
    AND d_date BETWEEN CAST('1998-08-23' AS DATE)
  AND CAST('1998-09-22' AS DATE)
    AND {ent_join}
    AND {p}_item_sk = i_item_sk
    AND i_current_price_cents > 90000
    AND {p}_promo_sk = p_promo_sk
    AND p_channel_tv = 'N'
  GROUP BY {ent_id})"""


_Q80_CTES = ",\n    ".join([
    _q80_chan("ssr", "store_sales", "ss", "sr", "store",
              "ss_store_sk = s_store_sk", "s_store_id",
              "sr_return_amt_cents",
              "ss_item_sk = sr_item_sk AND "
              "ss_ticket_number = sr_ticket_number"),
    _q80_chan("csr", "catalog_sales", "cs", "cr", "catalog_page",
              "cs_catalog_page_sk = cp_catalog_page_sk",
              "cp_catalog_page_id", "cr_return_amount_cents",
              "cs_item_sk = cr_item_sk AND "
              "cs_order_number = cr_order_number"),
    _q80_chan("wsr", "web_sales", "ws", "wr", "web_site",
              "ws_web_site_sk = web_site_sk", "web_site_id",
              "wr_return_amt_cents",
              "ws_item_sk = wr_item_sk AND "
              "ws_order_number = wr_order_number"),
]).replace("sr_returns_t", "store_returns").replace(
    "cr_returns_t", "catalog_returns").replace(
    "wr_returns_t", "web_returns")

_tpcds(
    "tpcds_q80",
    ["store_sales", "store_returns", "catalog_sales", "catalog_returns",
     "web_sales", "web_returns", "date_dim", "store", "catalog_page",
     "web_site", "item", "promotion"],
    """
SELECT
  channel,
  id,
  CAST(SUM(sales_cents) AS BIGINT) AS sales_cents,
  CAST(SUM(returns_cents) AS BIGINT) AS returns_cents,
  CAST(SUM(profit_cents) AS BIGINT) AS profit_cents
FROM (SELECT
        'store channel' AS channel,
        concat('store', entity_id) AS id,
        sales_cents,
        returns_cents,
        profit_cents
      FROM ssr
      UNION ALL
      SELECT
        'catalog channel' AS channel,
        concat('catalog_page', entity_id) AS id,
        sales_cents,
        returns_cents,
        profit_cents
      FROM csr
      UNION ALL
      SELECT
        'web channel' AS channel,
        concat('web_site', entity_id) AS id,
        sales_cents,
        returns_cents,
        profit_cents
      FROM wsr) x
GROUP BY ROLLUP (channel, id)
HAVING COUNT(*) > 0
ORDER BY COALESCE(channel, ''), COALESCE(id, '')
LIMIT 100
""",
    "TPC-DS q80 (reference inputs/q80.sql): 30-day sales, returns and "
    "net profit per store / catalog page / web site (LEFT JOIN "
    "returns inside each channel CTE), UNION ALL'd under "
    "ROLLUP(channel, id). Window 2000-08-23+30d -> 1998-08-23..."
    "09-22 (literal end date, no INTERVAL dialect); price floor "
    "at the derived cents-domain floor (r16: the r15-era 95000 floor "
    "left sf0.001's detail set empty — 90000 populates all three SFs "
    "with sf0.01/0.1 rows unchanged in count); the reserved-ish "
    "sales/returns/profit aliases carry a _cents suffix. ROLLUP "
    "keys COALESCE'd in the sort and unique per level: LIMIT-safe. "
    "HAVING COUNT(*) > 0 normalizes the empty-detail edge: over ZERO "
    "input rows DuckDB emits the ROLLUP's () super-aggregate row "
    "(all-NULL) while Spark emits nothing — q80's detail set WAS "
    "empty at sf0.001 through r15 (r9 sf0.001 matrix catch); the "
    "guard is an identity on every non-empty group.",
    extra=_Q80_CTES,
)

# ---------------------------------------------------------------------------
# q84 — income-band city customers with store-return demographics
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q84",
    ["customer_dim", "customer_address", "customer_demographics",
     "household_demographics", "income_band", "store_returns"],
    """
SELECT
  c_customer_id AS customer_id,
  concat(c_last_name, ', ', c_first_name) AS customername
FROM customer_dim
  , customer_address
  , customer_demographics
  , household_demographics
  , income_band
  , store_returns
WHERE ca_city = 'city_5'
  AND c_current_addr_sk = ca_address_sk
  AND ib_lower_bound >= 38128
  AND ib_upper_bound <= 38128 + 50000
  AND ib_income_band_sk = hd_income_band_sk
  AND cd_demo_sk = c_current_cdemo_sk
  AND hd_demo_sk = c_current_hdemo_sk
  AND sr_cdemo_sk = cd_demo_sk
ORDER BY c_customer_id
LIMIT 100
""",
    "TPC-DS q84 (reference inputs/q84.sql): customers in one city "
    "whose household income band sits in a $50k window and whose "
    "demographic appears on a store return — a pure six-dim star "
    "with no aggregate. 'Edgewood' -> 'city_5'; the reference band "
    "floor 38128 runs VERBATIM (PROMOTED r16: the retune to 40000 "
    "assumed the floor must sit on a derived $10k band step, but the "
    ">=/<= window needs no alignment — re-probed 22/100/100 rows at "
    "three SFs). One output row per "
    "matching return row (duplicates intended, as in the "
    "reference); rows with equal customer_id are identical, so the "
    "LIMIT cut is multiset-deterministic.",
)

# ---------------------------------------------------------------------------
# q85 — web-return reasons by demographic/geography OR-band stacks
# ---------------------------------------------------------------------------

_tpcds(
    "tpcds_q85",
    ["web_sales", "web_returns", "web_page", "customer_demographics",
     "customer_address", "date_dim", "reason"],
    """
SELECT
  substr(r_reason_desc, 1, 20) AS reason_prefix,
  CAST(SUM(CAST(ws_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)
    AS avg_quantity,
  CAST(SUM(wr_refunded_cash_cents) AS DOUBLE) / COUNT(*)
    AS avg_refunded_cash_cents,
  CAST(SUM(wr_fee_cents) AS DOUBLE) / COUNT(*) AS avg_fee_cents
FROM web_sales, web_returns, web_page, customer_demographics cd1,
  customer_demographics cd2, customer_address, date_dim, reason
WHERE ws_web_page_sk = wp_web_page_sk
  AND ws_item_sk = wr_item_sk
  AND ws_order_number = wr_order_number
  AND ws_sold_date_sk = d_date_sk AND d_year = 1997
  AND cd1.cd_demo_sk = wr_refunded_cdemo_sk
  AND cd2.cd_demo_sk = wr_returning_cdemo_sk
  AND ca_address_sk = wr_refunded_addr_sk
  AND r_reason_sk = wr_reason_sk
  AND
  (
    (
      cd1.cd_marital_status = 'M'
        AND
        cd1.cd_marital_status = cd2.cd_marital_status
        AND
        cd1.cd_education_status = 'Advanced Degree'
        AND
        cd1.cd_education_status = cd2.cd_education_status
        AND
        ws_sales_price_cents BETWEEN 100000 AND 10500000
    )
      OR
      (
        cd1.cd_marital_status = 'S'
          AND
          cd1.cd_marital_status = cd2.cd_marital_status
          AND
          cd1.cd_education_status = 'College'
          AND
          cd1.cd_education_status = cd2.cd_education_status
          AND
          ws_sales_price_cents BETWEEN 90000 AND 8000000
      )
      OR
      (
        cd1.cd_marital_status = 'W'
          AND
          cd1.cd_marital_status = cd2.cd_marital_status
          AND
          cd1.cd_education_status = 'Secondary'
          AND
          cd1.cd_education_status = cd2.cd_education_status
          AND
          ws_sales_price_cents BETWEEN 150000 AND 10500000
      )
  )
  AND
  (
    (
      ca_country = 'United States'
        AND
        ca_state IN ('S03', 'S08', 'S13')
        AND ws_net_profit_cents BETWEEN 0 AND 1100000
    )
      OR
      (
        ca_country = 'United States'
          AND
          ca_state IN ('S17', 'S21', 'S09')
          AND ws_net_profit_cents BETWEEN -100000 AND 1100000
      )
      OR
      (
        ca_country = 'United States'
          AND
          ca_state IN ('S11', 'S14', 'S19')
          AND ws_net_profit_cents BETWEEN -1000000 AND 1100000
      )
  )
GROUP BY r_reason_desc
ORDER BY reason_prefix, avg_quantity, avg_refunded_cash_cents,
  avg_fee_cents
LIMIT 100
""",
    "TPC-DS q85 (reference inputs/q85.sql): average quantity/refund/"
    "fee per return reason for web returns passing BOTH a "
    "marital-education-priceband OR-stack (refunding and returning "
    "demographics must agree) and a state-profitband OR-stack. "
    "Averages are CAST(SUM AS DOUBLE)/COUNT(*) over exact values; "
    "'2 yr Degree' -> 'Secondary', states -> derived S-codes, "
    "price/profit bands -> wide overlapping windows of the derived "
    "cents domains (3-branch OR shapes kept; the agreeing-demographics "
    "congruence leaves only ~3 qualifying returns at sf0.01, so the "
    "bands are permissive by design); d_year 2000 -> 1997. Group key leads the "
    "sort: LIMIT-safe.",
)

# ---------------------------------------------------------------------------
# q95 — returned multi-warehouse web orders shipped to one state
# ---------------------------------------------------------------------------

_Q95_WS_WH = """ws_wh AS {MAT}
(SELECT
    ws1.ws_order_number,
    ws1.ws_warehouse_sk AS wh1,
    ws2.ws_warehouse_sk AS wh2
  FROM web_sales ws1, web_sales ws2
  WHERE ws1.ws_order_number = ws2.ws_order_number
    AND ws1.ws_warehouse_sk <> ws2.ws_warehouse_sk)"""

_tpcds(
    "tpcds_q95",
    ["web_sales", "web_returns", "date_dim", "customer_address",
     "web_site"],
    """
SELECT
  CAST(COUNT(DISTINCT ws_order_number) AS BIGINT) AS order_count,
  CAST(SUM(ws_ext_ship_cost_cents) AS BIGINT)
    AS total_shipping_cost_cents,
  CAST(SUM(ws_net_profit_cents) AS BIGINT) AS total_net_profit_cents
FROM
  web_sales ws1, date_dim, customer_address, web_site
WHERE
  d_date BETWEEN CAST('1998-02-01' AS DATE) AND
  CAST('1998-04-02' AS DATE)
    AND ws1.ws_ship_date_sk = d_date_sk
    AND ws1.ws_ship_addr_sk = ca_address_sk
    AND ca_state = 'S05'
    AND ws1.ws_web_site_sk = web_site_sk
    AND web_company_name = 'pri'
    AND ws1.ws_order_number IN (SELECT ws_order_number
  FROM ws_wh)
    AND ws1.ws_order_number IN (SELECT wr_order_number
  FROM web_returns, ws_wh
  WHERE wr_order_number = ws_wh.ws_order_number)
ORDER BY order_count
LIMIT 100
""",
    "TPC-DS q95 (reference inputs/q95.sql): shipping cost and profit "
    "of web orders shipped from MORE than one warehouse (self-join "
    "inequality CTE), returned at least once, shipped into one state "
    "by one company in a 60-day window — two IN-subqueries over the "
    "same CTE, the second joined against returns. 'IL' -> 'S05'; "
    "web_company_name 'pri' is reproduced by the derived web_site "
    "(even sks); 1999 -> 1998 with the +60-day bound spelled as a "
    "literal date; the reference's backtick-quoted aliases become "
    "plain identifiers (driver compares by column name). Single "
    "aggregate row: LIMIT trivially safe.",
    extra=_Q95_WS_WH,
)
