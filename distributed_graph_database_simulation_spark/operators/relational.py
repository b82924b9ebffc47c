"""Relational operator surface (SURVEY.md §2b) over the driver testdata.

The reference has **no relational algebra at all** — its only predicate is the
edge test ``graph[node][neighbor]==1`` (``secondary_server.c:158``) and its
only "aggregate" is the reader counter (``secondary_server.c:76``). This
module is the §2b checklist made concrete: one representative query per
category (scan/filter, join variants, aggregation, window, sort/top-k, set
ops, scalar functions, grouping sets, pivot, sessionization), each written
with the DataFrame API (Catalyst plans it) and paired with a DuckDB oracle
string for the driver's differential gate.

Determinism rules for oracle hash parity:
- money aggregates go through DECIMAL (functions/portable.py);
- every ORDER BY used with LIMIT carries a unique-key tiebreak;
- averages are computed as exact-decimal-sum / count in DOUBLE;
- time arithmetic uses integer microseconds (``unix_micros`` / ``epoch_us``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.portable import dec, dsum, dsum_expr
from ..sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- aggregation: TPC-H Q1-style pricing summary -------------------------

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(12,4)") + dec("l_tax"))
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum_expr(disc_price, "sum_disc_price"),
            dsum_expr(charge, "sum_charge"),
            F.count("*").alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
    )
    return out


PRICING_SUMMARY_SQL = """
WITH a AS (
  SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
              * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))), 6) AS DOUBLE) AS sum_disc_price,
         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
              * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))
              * (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4)))), 6) AS DOUBLE) AS sum_charge,
         COUNT(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '2000-12-01'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price, sum_disc_price, sum_charge,
       count_order, sum_qty / count_order AS avg_qty, sum_base_price / count_order AS avg_price
FROM a
"""


# --- join + agg + top-k: TPC-H Q3-style ----------------------------------

def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1999-01-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-01-01"))
    revenue = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - dec("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_expr(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


TOP_REVENUE_ORDERS_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
            * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))), 6) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01'
  AND l_shipdate  > TIMESTAMP '1996-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- multi-join with dimension broadcast: TPC-H Q5-style -----------------

def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    revenue = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)") - dec("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name")
        .agg(dsum_expr(revenue, "revenue"), F.count("*").alias("n_items"))
    )


REGION_REVENUE_SQL = """
SELECT r_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
            * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))), 6) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY r_name
"""


# --- anti join -----------------------------------------------------------

def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_mktsegment, c_acctbal
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


# --- semi join + distinct aggregation ------------------------------------

def segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    active = cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_semi")
    return active.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        dsum("c_acctbal", "sum_acctbal"),
    )


SEGMENT_STATS_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS sum_acctbal
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
"""


# --- grouping sets: rollup + cube ---------------------------------------

def rollup_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            F.count("*").alias("n_rows"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
    )


ROLLUP_SHIPPING_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "sum_price"))
    )


CUBE_ORDER_PRIORITY_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- window: top-k per group --------------------------------------------

def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rk")
    )


TOP_PARTS_PER_BRAND_SQL = """
SELECT p_brand, p_partkey, p_retailprice, rk
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
  FROM part
) WHERE rk <= 3
"""


# --- window: running aggregate ------------------------------------------

def running_supplier_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 20)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(dec("l_quantity")).over(w).cast("double").alias("run_qty"),
    )


RUNNING_SUPPLIER_QTY_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) OVER (
         PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty
FROM lineitem WHERE l_suppkey < 20
"""


# --- set operations ------------------------------------------------------

def setops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    auto = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    in_debt = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    with_orders = orders.select(F.col("o_custkey").alias("c_custkey"))
    return (
        building.union(auto).distinct()
        .intersect(with_orders.distinct())
        .exceptAll(in_debt)  # distinct inputs -> same as EXCEPT
    )


SETOPS_CUSTOMERS_SQL = """
(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
 UNION
 SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
INTERSECT
SELECT DISTINCT o_custkey FROM orders
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal < 0
"""


# --- scalar functions: strings / dates / math ---------------------------

def scalar_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.month("o_orderdate").cast("int").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("o_day"),
        F.upper("o_orderpriority").alias("prio_u"),
        F.substring("o_orderstatus", 1, 1).alias("status_c"),
        F.length("o_orderpriority").cast("int").alias("prio_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("key_mod"),
        F.when(F.col("o_totalprice") > 200000, F.lit("high"))
        .when(F.col("o_totalprice") > 100000, F.lit("mid"))
        .otherwise(F.lit("low"))
        .alias("price_band"),
    )


SCALAR_ORDERS_SQL = """
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST(MONTH(o_orderdate) AS INT) AS o_month,
       CAST(DAY(o_orderdate) AS INT) AS o_day,
       UPPER(o_orderpriority) AS prio_u,
       SUBSTR(o_orderstatus, 1, 1) AS status_c,
       CAST(LENGTH(o_orderpriority) AS INT) AS prio_len,
       CONCAT_WS('-', o_orderstatus, o_orderpriority) AS status_prio,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
       CAST(o_orderkey % 7 AS BIGINT) AS key_mod,
       CASE WHEN o_totalprice > 200000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS price_band
FROM orders WHERE o_orderkey < 2000
"""


# --- scalar functions: json + time arithmetic on events ------------------

def scalar_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.date_trunc("hour", "ts").alias("ts_hour"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        (F.col("user_id") % 10).cast("bigint").alias("user_bucket"),
    )


SCALAR_EVENTS_SQL = """
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
       date_trunc('hour', ts) AS ts_hour,
       epoch_us(ts) AS ts_us,
       CAST(user_id % 10 AS BIGINT) AS user_bucket
FROM events WHERE event_id < 2000
"""


# --- scalar functions: arrays + maps ------------------------------------

def array_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction/inspection + map access, reduced to scalar outputs.

    Array-valued result columns are avoided on purpose: engines format
    nested values differently, which would break the driver's value-hash
    even when contents agree. Every array/map op here collapses to a
    scalar both engines print identically.
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)
    arr = F.sort_array(F.collect_list("l_linenumber"))
    per_order = li.groupBy("l_orderkey").agg(arr.alias("lines"))
    m = F.create_map(F.lit("first"), F.element_at("lines", 1),
                     F.lit("last"), F.element_at("lines", -1))
    return per_order.select(
        "l_orderkey",
        F.size("lines").alias("n_lines"),
        F.element_at("lines", 1).alias("first_line"),
        F.element_at("lines", -1).alias("last_line"),
        F.array_contains("lines", 3).alias("has_line3"),
        F.aggregate("lines", F.lit(0), lambda a, x: a + x).alias("line_sum"),
        F.element_at(m, "last").alias("map_last"),
    )


ARRAY_MAP_FUNCS_SQL = """
WITH per_order AS (
  SELECT l_orderkey, list(l_linenumber ORDER BY l_linenumber) AS lines
  FROM lineitem WHERE l_orderkey < 3000 GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(len(lines) AS INT) AS n_lines,
       lines[1] AS first_line,
       lines[-1] AS last_line,
       list_contains(lines, 3) AS has_line3,
       CAST(list_sum(lines) AS INT) AS line_sum,
       (MAP {'first': lines[1], 'last': lines[-1]}['last'])[1] AS map_last
FROM per_order
"""


# --- approximate distinct (HLL sketch) ----------------------------------

def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate per return flag.

    Sketch internals are engine-specific, so there is no cross-engine
    oracle (rows-only driver check); the <=2% rsd accuracy contract vs the
    exact count is pinned in unit tests. At scale this is THE distinct
    estimator: one pass, fixed memory, mergeable across partitions.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )


def approx_distinct_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle-assertable sibling of :func:`approx_distinct_parts` —
    the last rows-only-by-design family gains a driver-checkable row
    (the pipe_hll_store_merge flag playbook): per return flag, the EXACT
    distinct part count (value-matched against the oracle) plus a boolean
    asserting the HLL++ estimate landed within 5x its configured 2% rsd.
    A broken estimator (or a sketch regression) flips the flag and
    hash-mismatches; the raw estimate itself stays on the rows-only entry
    where engine-specific sketch internals belong.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_exact"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", rsd=0.02)
                - F.count_distinct("l_partkey")
            )
            <= F.lit(0.10) * F.count_distinct("l_partkey")
        ).alias("within_10pct"),
    )


APPROX_DISTINCT_CHECKED_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_exact,
       TRUE AS within_10pct
FROM lineitem GROUP BY l_returnflag
"""


# --- pivot ---------------------------------------------------------------

def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
        .withColumnRenamed("O", "qty_open")
        .withColumnRenamed("F", "qty_filled")
    )
    return out


PIVOT_RETURNFLAG_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(12,4)) END) AS DOUBLE) AS qty_open,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(12,4)) END) AS DOUBLE) AS qty_filled
FROM lineitem GROUP BY l_returnflag
"""


# --- sessionization (gap > 30 min) --------------------------------------

def event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        (
            F.when(
                F.lag(F.unix_micros(F.col("ts"))).over(w).isNull()
                | (F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w) > 1_800_000_000),
                1,
            ).otherwise(0)
        ).alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").cast("bigint").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


EVENT_SESSIONS_SQL = """
SELECT user_id,
       CAST(SUM(new_session) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM (
  SELECT user_id,
         CASE WHEN LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
GROUP BY user_id
"""


# --- tumbling time-window aggregate (batch form) -------------------------

def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value", "sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events GROUP BY date_trunc('hour', ts), event_type
"""


# --- range join ----------------------------------------------------------

def range_join_ship_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range join: lineitems shipped within 60 days of their order.

    The range predicate rides the equi hash join as a post-join filter —
    no nested-loop blowup; at scale the equi key carries the shuffle and the
    range condition stays a cheap row filter.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    joined = li.join(
        orders,
        (li["l_orderkey"] == orders["o_orderkey"])
        & (li["l_shipdate"] >= orders["o_orderdate"])
        & (li["l_shipdate"] < F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_fast_ships"),
        dsum("l_quantity", "sum_qty"),
    )


RANGE_JOIN_SHIP_LAG_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_fast_ships,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate < o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderpriority
"""


# --- as-of join (backward) ----------------------------------------------

def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event matched to the user's latest order at
    or before the event time.

    Scale-first plan — the classic distributed as-of: union the two sides
    into one keyed timeline, sort within key, carry the latest order forward
    with ``last_value(..., ignorenulls)``. One shuffle + sort, zero pair
    explosion (the naive equi-join-then-rank plan materializes every
    (event, earlier-order) pair). Orders are deduped per (custkey, date)
    keeping max orderkey so the match is deterministic; at equal timestamps
    the order sorts first => inclusive (ts >= o_orderdate) semantics,
    matching DuckDB's ASOF JOIN.
    """
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 5000)
    orders = _t(spark, sf_dir, "orders")
    latest_per_date = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    o_side = latest_per_date.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("side"),  # orders sort before events at equal t
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("carry_orderkey"),
        F.col("o_orderdate").alias("carry_orderdate"),
    )
    e_side = ev.select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("long").alias("carry_orderkey"),
        F.lit(None).cast("timestamp").alias("carry_orderdate"),
    )
    timeline = o_side.unionByName(e_side)
    w = (
        W.partitionBy("key")
        .orderBy("t", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        timeline.withColumn(
            "o_orderkey", F.last("carry_orderkey", ignorenulls=True).over(w)
        )
        .withColumn(
            "o_orderdate", F.last("carry_orderdate", ignorenulls=True).over(w)
        )
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            "o_orderkey",
            "o_orderdate",
        )
    )


ASOF_LATEST_ORDER_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
),
e AS (SELECT event_id, user_id, ts FROM events WHERE event_id < 5000)
SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate
FROM e ASOF LEFT JOIN o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


# --- sort / limit (global top-k) ----------------------------------------

def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


TOPK_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
"""


# --- correlated subqueries (Catalyst decorrelation) ----------------------

PRIORITY_LATE_ORDERS_SQL_SPARK = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM {orders}
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM {lineitem}
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


def priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS (correlated on the key AND the
    outer order date). Catalyst decorrelates it into a left-semi hash join
    — the plan a hand-written semi join would produce."""
    return spark.sql(
        PRIORITY_LATE_ORDERS_SQL_SPARK,
        orders=_t(spark, sf_dir, "orders"),
        lineitem=_t(spark, sf_dir, "lineitem"),
    )


PRIORITY_LATE_ORDERS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


SMALL_QTY_REVENUE_SQL_SPARK = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 6) AS DOUBLE) AS total_price,
       COUNT(*) AS n_rows
FROM {lineitem} l1
WHERE l_quantity < (
    SELECT 0.5 * AVG(l_quantity) FROM {lineitem} l2
    WHERE l2.l_partkey = l1.l_partkey
)
"""


def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average),
    decorrelated by Catalyst into an aggregate + join."""
    return spark.sql(
        SMALL_QTY_REVENUE_SQL_SPARK, lineitem=_t(spark, sf_dir, "lineitem")
    )


SMALL_QTY_REVENUE_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 6) AS DOUBLE) AS total_price,
       COUNT(*) AS n_rows
FROM lineitem l1
WHERE l_quantity < (
    SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l1.l_partkey
)
"""


# --- source formats: csv / json round-trip -------------------------------

def multiformat_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV, JSON and ORC scan surface: export nation/region/supplier to the
    three formats, read each back with explicit schemas, join and aggregate.

    The oracle reads the original parquet, so the answer proves all three
    codecs round-trip values (ints, strings, doubles survive). Files land
    in a scratch dir; at scale these are the standard landing-zone formats
    in front of parquet.
    """
    import os as _os
    import tempfile

    base = _os.path.join(tempfile.gettempdir(), "dgds_multiformat")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    supplier = _t(spark, sf_dir, "supplier")
    nation.write.mode("overwrite").option("header", True).csv(f"{base}/nation_csv")
    region.write.mode("overwrite").json(f"{base}/region_json")
    supplier.write.mode("overwrite").orc(f"{base}/supplier_orc")
    nation_csv = (
        spark.read.option("header", True)
        .schema(nation.schema)
        .csv(f"{base}/nation_csv")
    )
    region_json = spark.read.schema(region.schema).json(f"{base}/region_json")
    supplier_orc = spark.read.orc(f"{base}/supplier_orc")
    return (
        supplier_orc.join(
            F.broadcast(nation_csv),
            supplier_orc["s_nationkey"] == nation_csv["n_nationkey"],
        )
        .join(
            F.broadcast(region_json),
            nation_csv["n_regionkey"] == region_json["r_regionkey"],
        )
        .groupBy("r_name")
        .agg(
            F.countDistinct("n_nationkey").alias("n_nations"),
            F.count("*").alias("n_suppliers"),
            F.min("n_name").alias("first_nation"),
        )
    )


MULTIFORMAT_SOURCES_SQL = """
SELECT r_name,
       COUNT(DISTINCT n_nationkey) AS n_nations,
       COUNT(*) AS n_suppliers,
       MIN(n_name) AS first_nation
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --- outer joins ---------------------------------------------------------

def outer_join_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two per-nation aggregates with deliberately
    asymmetric coverage (the supplier side is acctbal-filtered so some
    nations appear on one side only) — the null-completing join family,
    COALESCE-normalized exactly like the SQL oracle."""
    sup = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_rich_suppliers"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_building_customers"))
    )
    return (
        sup.join(cust, sup["s_nationkey"] == cust["c_nationkey"], "full_outer")
        .select(
            F.coalesce("s_nationkey", "c_nationkey").alias("nationkey"),
            F.coalesce("n_rich_suppliers", F.lit(0)).alias("n_rich_suppliers"),
            F.coalesce("n_building_customers", F.lit(0)).alias("n_building_customers"),
        )
    )


OUTER_JOIN_NATION_ACTIVITY_SQL = """
WITH sup AS (
  SELECT s_nationkey, COUNT(*) AS n_rich_suppliers
  FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey
),
cust AS (
  SELECT c_nationkey, COUNT(*) AS n_building_customers
  FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey
)
SELECT COALESCE(s_nationkey, c_nationkey) AS nationkey,
       COALESCE(n_rich_suppliers, 0) AS n_rich_suppliers,
       COALESCE(n_building_customers, 0) AS n_building_customers
FROM sup FULL OUTER JOIN cust ON s_nationkey = c_nationkey
"""


# --- time-range window frame ---------------------------------------------

def trailing_month_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per supplier, trailing-30-day shipped quantity at
    each lineitem's ship date.

    Spark's rangeBetween needs a numeric ordering key, so the frame is
    [ts-30d, ts] in integer epoch seconds — value-identical to the oracle's
    ``RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW`` over the
    timestamp (peers included in both). Integer quantities keep the running
    sums exact. One hash-partitioned sort per supplier; no global sort.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.unix_timestamp("l_shipdate").alias("ship_s"),
    )
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("ship_s")
        .rangeBetween(-30 * 86400, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum("qty").over(w).alias("qty_30d"),
        F.count("*").over(w).alias("n_30d"),
    )


TRAILING_MONTH_QTY_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS BIGINT)) OVER w AS BIGINT) AS qty_30d,
       COUNT(*) OVER w AS n_30d
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
"""


# --- ordered-statistic aggregation ---------------------------------------

def quantiles_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group: continuous (interpolated) and discrete.

    Spark ``percentile`` and DuckDB ``quantile_cont`` share the
    ``(n-1)*p`` interpolation definition, and on integral-valued doubles
    the interpolation arithmetic is IEEE-identical — so even ordered
    statistics are differential-checkable without rounding slop.
    ``percentile_disc`` picks an actual data value (no arithmetic at all).
    At scale this is the sort-based aggregate family: per-group sort within
    the hash-partitioned shuffle, no global sort.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5D)").alias("p50_qty"),
        F.expr("percentile(l_quantity, 0.9D)").alias("p90_qty"),
        F.expr(
            "percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("q1_price"),
        F.expr(
            "percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice)"
        ).alias("q3_price"),
    )


QUANTILES_PER_FLAG_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       quantile_disc(l_extendedprice, 0.25) AS q1_price,
       quantile_disc(l_extendedprice, 0.75) AS q3_price
FROM lineitem GROUP BY l_returnflag
"""


# --- bucketed co-located join (shuffle-free at any scale) ----------------

def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem with BOTH sides bucketed on the join key.

    `bucketBy(orderkey)` at write time pre-partitions the data so the join
    needs NO exchange at read time — at 100 TB this converts the single
    most expensive shuffle (fact-fact join) into a zero-network merge of
    co-located buckets; `tests/test_plans.py` pins the exchange-free plan.
    The bucket count (8 here for the local run) scales to thousands on a
    cluster; only bucket-count parity between the two tables matters.
    """
    import os
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for tbl in ("dgds_orders_b", "dgds_lineitem_b"):
        # in-memory catalog forgets tables between sessions but the files
        # survive; clear both so overwrite semantics stay deterministic
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(os.path.join(warehouse, tbl), ignore_errors=True)
    _t(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("dgds_orders_b")
    _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    ).write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode(
        "overwrite"
    ).saveAsTable("dgds_lineitem_b")
    joined = bucketed_join_bare(spark)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        dsum_expr(dec("l_extendedprice") * (F.lit(1).cast("decimal(12,4)")
                                            - dec("l_discount")), "revenue"),
    )


def bucketed_join_bare(spark: SparkSession) -> DataFrame:
    """The exchange-free join itself (plan-test target; assumes the bucketed
    tables exist). The merge hint only pins the join strategy — the absence
    of shuffles comes from the matching bucket layout, not the hint."""
    ob = spark.table("dgds_orders_b").select("o_orderkey", "o_orderpriority")
    lb = spark.table("dgds_lineitem_b")
    return ob.hint("merge").join(lb, ob["o_orderkey"] == lb["l_orderkey"])


BUCKETED_JOIN_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_items,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
             * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))), 6)
            AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# --- two-phase salted aggregation (skew pattern) -------------------------

N_SALTS = 16


def salted_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter counts via explicit two-phase salted aggregation.

    The skew pattern made concrete: a hot grouping key (event_type has ~5
    values over 600k rows at sf0.1) first aggregates on (key, salt) so every
    reducer gets work, then the per-salt partials combine in a second, tiny
    aggregation. Spark's partial aggregation does this implicitly for
    algebraic aggregates — the operator exists to keep the explicit pattern
    tested for the cases that need it (e.g. collect-heavy or percentile
    aggs where map-side combine can't run). Result == plain GROUP BY.
    """
    ev = _t(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(N_SALTS)))
    # partials stay DECIMAL: casting each salt's subtotal to double would
    # round 16 times and drift off the single-rounding oracle value
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("c"), F.sum(dec("value")).alias("v")
    )
    return partial.groupBy("event_type").agg(
        F.sum("c").alias("n_events"),
        F.sum("v").cast("double").alias("sum_value"),
    )


SALTED_HEAVY_HITTERS_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
"""


# --- SQL API surface (TPC-H Q6-style via spark.sql) ----------------------

FORECAST_REVENUE_SQL_SPARK = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
           * CAST(l_discount AS DECIMAL(12,4))), 6) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM {lineitem}
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``spark.sql`` entry point: same Catalyst pipeline as the
    DataFrame API, demonstrated once so the SQL surface is contract-covered.
    Parameterized table binding (no temp-view mutation)."""
    return spark.sql(
        FORECAST_REVENUE_SQL_SPARK, lineitem=_t(spark, sf_dir, "lineitem")
    )


FORECAST_REVENUE_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
           * CAST(l_discount AS DECIMAL(12,4))), 6) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


# --- distinct aggregates -------------------------------------------------

def distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_partkey", "l_suppkey").alias("n_part_supp"),
        F.count("*").alias("n_rows"),
    )


DISTINCT_PARTS_PER_FLAG_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def funnel_df(
    events: DataFrame, steps: list[str], horizon_minutes: int = 60
) -> DataFrame:
    """K-step event funnel per user: how far along ``steps`` each user got,
    where step i+1 must occur strictly AFTER the matched step i and the
    whole funnel must complete within ``horizon_minutes`` of step 1 — the
    standard product-analytics query (view -> click -> purchase).

    Single-shuffle formulation: per-user events collect into one sorted
    array (bounded by per-user activity, the same envelope sessionization
    assumes), and the funnel state machine runs INSIDE ``F.aggregate`` over
    that array — a JVM higher-order fold, no Python, no per-step join or
    re-aggregation (the naive formulation is k chained conditional
    aggregates = k shuffles). Returns (user_id, stage_reached,
    funnel_start_ts) with stage_reached in [0, len(steps)];
    funnel_start_ts is NULL for users who never hit step 1.
    """
    k = len(steps)
    lit_steps = F.array(*[F.lit(s) for s in steps])
    horizon_us = int(horizon_minutes) * 60 * 1_000_000
    per_user = (
        events.where(F.col("event_type").isin(steps))
        .groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.unix_micros("ts").alias("us"),
                        F.col("event_id").alias("eid"),  # deterministic tie order
                        F.col("event_type").alias("etype"),
                    )
                )
            ).alias("evs")
        )
    )
    zero = F.struct(
        F.lit(0).cast("int").alias("stage"), F.lit(None).cast("bigint").alias("t0")
    )
    state = F.aggregate(
        "evs",
        zero,
        lambda acc, x: F.when(
            (acc["stage"] < k)
            & (x["etype"] == F.element_at(lit_steps, acc["stage"] + 1))
            & (
                (acc["stage"] == 0)
                | ((x["us"] > acc["t0"]) & (x["us"] <= acc["t0"] + F.lit(horizon_us)))
            ),
            F.struct(
                (acc["stage"] + 1).cast("int").alias("stage"),
                F.when(acc["stage"] == 0, x["us"]).otherwise(acc["t0"]).alias("t0"),
            ),
        ).otherwise(acc),
    )
    return per_user.select(
        "user_id",
        state["stage"].alias("stage_reached"),
        F.timestamp_micros(state["t0"]).alias("funnel_start_ts"),
    )


def interval_overlap_join_df(
    left: DataFrame,
    right: DataFrame,
    bucket_width: int,
    on: list[str] | None = None,
) -> DataFrame:
    """All pairs of overlapping intervals between two tables (half-open
    ``[start, end)`` semantics), without a cross product: each interval is
    exploded to the fixed-width buckets it covers, candidates come from a
    keyed equi-join on (optional key columns +) bucket, duplicates from
    multi-bucket overlaps collapse via the canonical bucket trick (keep a
    candidate only in the FIRST bucket both intervals cover), and the
    exact predicate verifies. This is the standard genomic/temporal
    interval-join decomposition: shuffle volume is rows × avg buckets per
    interval — proportional to data and interval length, never |L|×|R|.

    ``left``/``right`` need (``start``, ``end``) columns; ``on`` adds
    equi-key columns (e.g. a user or chromosome id) that must also match.
    ``bucket_width`` should approximate the typical interval length (too
    small explodes rows; too large admits more false candidates for the
    verifier — a knob, not a correctness concern).

    Returns left.* (prefixed ``l_``) + right.* (prefixed ``r_``).
    """
    on = on or []

    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        renamed = df.select(
            *[F.col(c).alias(f"{prefix}{c}") for c in df.columns]
        )
        s, e = F.col(f"{prefix}start"), F.col(f"{prefix}end")
        buckets = F.sequence(
            F.floor(s / bucket_width).cast("bigint"),
            F.floor((F.greatest(e, s + 1) - 1) / bucket_width).cast("bigint"),
        )
        return renamed.withColumn("bucket", F.explode(buckets))

    lb = bucketed(left, "l_")
    rb = bucketed(right, "r_")
    join_keys = [lb["bucket"] == rb["bucket"]] + [
        lb[f"l_{c}"] == rb[f"r_{c}"] for c in on
    ]
    ls, le = F.col("l_start"), F.col("l_end")
    rs, re_ = F.col("r_start"), F.col("r_end")
    overlap = (ls < re_) & (rs < le)
    # canonical bucket: the first bucket both intervals cover — exactly one
    # per overlapping pair, so no distinct over the full candidate set
    first_common = F.floor(F.greatest(ls, rs) / bucket_width).cast("bigint")
    return (
        lb.join(rb, join_keys)
        .where(overlap & (lb["bucket"] == first_common))
        .drop(rb["bucket"])
        .drop("bucket")
    )


def resample_forward_fill_df(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
) -> DataFrame:
    """Regular-grid resampling with forward fill — the hypertable
    ``time_bucket_gapfill + locf`` shape: per key, emit one row per
    ``step_seconds`` bucket between that key's first and last observation,
    carrying the last observed value forward across empty buckets.

    Distributed shape: bucket heads come from one keyed aggregate over the
    raw events (last value per non-empty bucket — ``max_by`` on the raw
    timestamp, deterministic under ties by (ts, value)); the dense grid is
    generated JVM-side per key with ``sequence`` + ``explode`` (never a
    driver loop or a calendar cross join); the fill is one
    ``last(value, ignorenulls)`` window scanning forward in bucket order —
    one shuffle on the key, one window pass, all O(grid) rows. Gaps before
    a key's first observation cannot exist by construction (the grid
    starts at its first bucket). Returns
    (key, bucket_ts timestamp, value, observed boolean).
    """
    from pyspark.sql import Window

    b = (F.unix_timestamp(F.col(ts_col)) / step_seconds).cast("bigint")
    per_bucket = (
        events.select(
            F.col(key_col).alias("key"),
            b.alias("bucket"),
            F.struct(
                F.unix_timestamp(F.col(ts_col)).alias("ts"),
                F.col(value_col).cast("double").alias("v"),
            ).alias("obs"),
        )
        .groupBy("key", "bucket")
        .agg(F.max("obs")["v"].alias("value"))
    )
    spans = per_bucket.groupBy("key").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = spans.select(
        "key", F.explode(F.sequence("b0", "b1")).alias("bucket")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(per_bucket, ["key", "bucket"], "left")
        .select(
            "key",
            F.timestamp_seconds(F.col("bucket") * step_seconds).alias("bucket_ts"),
            F.last("value", ignorenulls=True).over(w).alias("value"),
            F.col("value").isNotNull().alias("observed"),
            "bucket",
        )
        .drop("bucket")
    )


def scd2_history_df(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from a change log: per
    key, one validity interval per observed change —
    (key, valid_from, valid_to, <values...>, is_current), with
    ``valid_to`` = next change's timestamp (NULL while current). The
    standard snapshot-maintenance shape for attribute tables (doc
    metadata, license status, source quality tier) that training-data
    audits need to query "as of" any point in time.

    One shuffle on the key + one window pass (``lead``). Duplicate
    (key, ts) rows collapse deterministically to the struct-max of the
    value tuple BEFORE the window, so intervals never zero-width.
    Composes with :func:`interval_overlap_join_df` for as-of audits.
    """
    from pyspark.sql import Window

    vals = [F.col(c) for c in value_cols]
    collapsed = (
        changes.select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("valid_from"),
            F.struct(*vals).alias("_vals"),
        )
        .groupBy("key", "valid_from")
        .agg(F.max("_vals").alias("_vals"))
    )
    w = Window.partitionBy("key").orderBy("valid_from")
    out = collapsed.select(
        "key",
        "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        *[F.col("_vals")[c].alias(c) for c in value_cols],
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())


def rolling_zscore_df(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-key rolling z-score anomaly flags: each observation scored
    against the mean/stddev of its key's TRAILING time window (RANGE
    frame ending at the current row, so no lookahead leakage) — the
    standard streaming-quality outlier screen (sensor spikes, metric
    anomalies, corrupt ingestion values) in batch form.

    One shuffle on the key + one window pass computing count/mean/stddev
    in the same frame. Rows with fewer than 2 trailing observations or
    zero variance score NULL (insufficient evidence ≠ anomaly — kept
    explicit, not zero-filled). Returns
    (key, ts, value, n_window, mean_w, z double, is_anomaly boolean).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("key")
        .orderBy(F.col("ts_sec"))
        .rangeBetween(-window_seconds, 0)
    )
    base = events.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.unix_timestamp(F.col(ts_col)).alias("ts_sec"),
        F.col(value_col).cast("double").alias("value"),
    )
    scored = base.select(
        "key",
        "ts",
        "value",
        F.count("value").over(w).alias("n_window"),
        F.avg("value").over(w).alias("mean_w"),
        F.stddev_samp("value").over(w).alias("sd_w"),
    )
    z = F.when(
        (F.col("n_window") >= 2) & (F.col("sd_w") > 0),
        (F.col("value") - F.col("mean_w")) / F.col("sd_w"),
    )
    return scored.select(
        "key",
        "ts",
        "value",
        "n_window",
        "mean_w",
        z.alias("z"),
        (F.abs(z) > z_threshold).alias("is_anomaly"),
    )


# --- driver-contract wrappers for the round-5 library operators ----------

FUNNEL_STEPS = ["view", "click", "purchase"]
FUNNEL_HORIZON_MIN = 1440  # 24 h: stages 2/3 non-vacuous at every gate sf


def rel_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel over events (:func:`funnel_df`).

    24 h horizon chosen from the data (≈2 events/user/day): at sf0.01 the
    stage histogram is {1: 90, 2: 46, 3: 14} — every stage populated, so a
    driver hash match certifies the whole state machine, not a degenerate
    all-stage-1 outcome."""
    events = _t(spark, sf_dir, "events")
    return funnel_df(events, FUNNEL_STEPS, horizon_minutes=FUNNEL_HORIZON_MIN)


# The fold scans events sorted by (us, event_id, event_type); stage 1 is the
# first step-1 event, stages 2..k match the first later-in-order event of
# the right type with us strictly after t0 and within the horizon of t0.
# That is exactly a per-stage min-row_number chain in SQL.
_FUNNEL_H_US = FUNNEL_HORIZON_MIN * 60 * 1_000_000
REL_FUNNEL_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY us, event_id, event_type) AS rn
  FROM ev
),
s1 AS (
  SELECT user_id, min(rn) AS rn1 FROM ranked
  WHERE event_type = 'view' GROUP BY user_id
),
t1 AS (
  SELECT r.user_id, r.us AS t0, s1.rn1
  FROM ranked r JOIN s1 ON r.user_id = s1.user_id AND r.rn = s1.rn1
),
s2 AS (
  SELECT r.user_id, min(r.rn) AS rn2
  FROM ranked r JOIN t1 ON r.user_id = t1.user_id
  WHERE r.event_type = 'click' AND r.rn > t1.rn1
    AND r.us > t1.t0 AND r.us <= t1.t0 + {_FUNNEL_H_US}
  GROUP BY r.user_id
),
s3 AS (
  SELECT r.user_id, min(r.rn) AS rn3
  FROM ranked r JOIN t1 ON r.user_id = t1.user_id JOIN s2 ON r.user_id = s2.user_id
  WHERE r.event_type = 'purchase' AND r.rn > s2.rn2
    AND r.us > t1.t0 AND r.us <= t1.t0 + {_FUNNEL_H_US}
  GROUP BY r.user_id
)
SELECT u.user_id,
       CAST(CASE WHEN s3.rn3 IS NOT NULL THEN 3
                 WHEN s2.rn2 IS NOT NULL THEN 2
                 WHEN t1.rn1 IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS stage_reached,
       make_timestamp(t1.t0) AS funnel_start_ts
FROM (SELECT DISTINCT user_id FROM ev) u
LEFT JOIN t1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
"""


def rel_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals from the events change log
    (:func:`scd2_history_df`): per user, the history of their event_type
    "attribute" with (valid_from, valid_to] intervals and is_current."""
    events = _t(spark, sf_dir, "events")
    return scd2_history_df(events, "user_id", "ts", ["event_type"])


REL_SCD2_SQL = """
WITH collapsed AS (
  SELECT user_id AS key, ts AS valid_from, max(event_type) AS event_type
  FROM events GROUP BY 1, 2
),
led AS (
  SELECT key, valid_from,
         lead(valid_from) OVER (PARTITION BY key ORDER BY valid_from) AS valid_to,
         event_type
  FROM collapsed
)
SELECT key, valid_from, valid_to, event_type, valid_to IS NULL AS is_current
FROM led
"""


RESAMPLE_STEP_SEC = 21_600  # 6 h buckets over the 30-day event window


def rel_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resample + forward fill of event values per user
    (:func:`resample_forward_fill_df`), 6 h buckets."""
    events = _t(spark, sf_dir, "events")
    return resample_forward_fill_df(
        events, "user_id", "ts", "value", RESAMPLE_STEP_SEC
    )


REL_RESAMPLE_FFILL_SQL = f"""
WITH b AS (
  SELECT user_id AS key,
         CAST(floor(epoch(ts)) AS BIGINT) // {RESAMPLE_STEP_SEC} AS bucket,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
         CAST(value AS DOUBLE) AS v
  FROM events
),
pb AS (
  SELECT key, bucket, (max(struct_pack(ts := ts_sec, v := v))).v AS obs_value
  FROM b GROUP BY 1, 2
),
spans AS (SELECT key, min(bucket) AS b0, max(bucket) AS b1 FROM pb GROUP BY 1),
grid AS (SELECT key, unnest(generate_series(b0, b1)) AS bucket FROM spans),
j AS (
  SELECT g.key, g.bucket, pb.obs_value
  FROM grid g LEFT JOIN pb ON pb.key = g.key AND pb.bucket = g.bucket
)
SELECT key,
       make_timestamp(bucket * {RESAMPLE_STEP_SEC} * 1000000) AS bucket_ts,
       last_value(obs_value IGNORE NULLS) OVER (
         PARTITION BY key ORDER BY bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       obs_value IS NOT NULL AS observed
FROM j
"""


ZSCORE_WINDOW_SEC = 86_400  # 1-day trailing window: ~88% of rows have n>=2


def rel_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-1-day rolling z-score anomaly flags
    (:func:`rolling_zscore_df`). mean/z are emitted micro-rounded BIGINTs:
    windowed avg/stddev accumulate in engine-specific order (DuckDB uses a
    segment tree), so the raw doubles can differ in the last ulp — the
    same integer-micro compare the PageRank oracle uses."""
    events = _t(spark, sf_dir, "events")
    scored = rolling_zscore_df(events, "user_id", "ts", "value", ZSCORE_WINDOW_SEC)
    return scored.select(
        "key",
        "ts",
        "value",
        "n_window",
        F.round(F.col("mean_w") * 1e6).cast("bigint").alias("mean_w_micro"),
        F.round(F.col("z") * 1e6).cast("bigint").alias("z_micro"),
        # NULL z -> not flagged; NULL booleans stringify differently across
        # the two engines' pandas bridges, so the wrapper pins tri-state
        # down to two for the differential compare (z_micro stays NULL).
        F.coalesce("is_anomaly", F.lit(False)).alias("is_anomaly"),
    )


REL_ROLLING_ZSCORE_SQL = f"""
WITH b AS (
  SELECT user_id AS key, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
         CAST(value AS DOUBLE) AS value
  FROM events
),
s AS (
  SELECT key, ts, value,
         count(value) OVER w AS n_window,
         avg(value) OVER w AS mean_w,
         stddev_samp(value) OVER w AS sd_w
  FROM b
  WINDOW w AS (PARTITION BY key ORDER BY ts_sec
               RANGE BETWEEN {ZSCORE_WINDOW_SEC} PRECEDING AND CURRENT ROW)
)
SELECT key, ts, value,
       CAST(n_window AS BIGINT) AS n_window,
       CAST(round(mean_w * 1e6) AS BIGINT) AS mean_w_micro,
       CAST(round((CASE WHEN n_window >= 2 AND sd_w > 0
                        THEN (value - mean_w) / sd_w END) * 1e6) AS BIGINT) AS z_micro,
       COALESCE(abs(CASE WHEN n_window >= 2 AND sd_w > 0
                         THEN (value - mean_w) / sd_w END) > 3.0,
                FALSE) AS is_anomaly
FROM s
"""


VIEW_WINDOW_SEC = 1800     # a view "covers" 30 min
PURCHASE_WINDOW_SEC = 2700  # a purchase covers 45 min


def rel_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join in the driver gate: per-user view windows vs
    purchase windows (:func:`interval_overlap_join_df`, bucketized
    decomposition). The oracle is the naive overlap predicate — fine at
    the gate sf, which is exactly why the bucketized path needs the
    differential check (its canonical-bucket dedup must reproduce the
    naive semantics)."""
    events = _t(spark, sf_dir, "events")
    base = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("start"),
    )
    left = base.where(F.col("event_type") == "view").select(
        "user_id", "event_id", "start", (F.col("start") + VIEW_WINDOW_SEC).alias("end")
    )
    right = base.where(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        "start",
        (F.col("start") + PURCHASE_WINDOW_SEC).alias("end"),
    )
    out = interval_overlap_join_df(left, right, bucket_width=1800, on=["user_id"])
    return out.select(
        F.col("l_user_id").alias("user_id"),
        F.col("l_event_id").alias("view_event_id"),
        F.col("r_event_id").alias("purchase_event_id"),
        F.col("l_start").alias("view_start"),
        F.col("r_start").alias("purchase_start"),
    )


REL_INTERVAL_OVERLAP_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS start
  FROM events
),
v AS (
  SELECT user_id, event_id, start, start + {VIEW_WINDOW_SEC} AS e
  FROM base WHERE event_type = 'view'
),
p AS (
  SELECT user_id, event_id, start, start + {PURCHASE_WINDOW_SEC} AS e
  FROM base WHERE event_type = 'purchase'
)
SELECT v.user_id,
       v.event_id AS view_event_id,
       p.event_id AS purchase_event_id,
       v.start AS view_start,
       p.start AS purchase_start
FROM v JOIN p ON p.user_id = v.user_id
              AND v.start < p.e AND p.start < v.e
"""


def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) of ``part``: rows where no other part is
    both cheaper-or-equal (``p_retailprice``) and larger-or-equal
    (``p_size``) with a strict improvement in at least one — the classic
    multi-criteria "best offers" operator (Börzsönyi et al., ICDE 2001).

    Two-phase distributed plan: (1) a NARROW local-skyline prune inside an
    Arrow kernel — per batch, sort by (price asc, size desc) and drop rows
    dominated within the batch via one prefix-max sweep; pruning is safe
    (a locally dominated row is globally dominated) and collapses each
    partition to its own frontier, which for anti-correlated-at-worst data
    is orders of magnitude smaller than the partition; then (2) the exact
    global filter: a broadcast self anti-join of the survivors on the
    dominance predicate. At 100 TB only step 1 touches the corpus; the
    anti-join runs over local-frontier survivors (skyline of n uniform 2-d
    points is O(log n) expected — broadcastable; a huge anti-correlated
    frontier would surface loudly as a broadcast-threshold error, not a
    silent wrong answer).

    Ties: exact duplicates on both dimensions dominate neither way and are
    all kept — same semantics as the oracle's NOT EXISTS with a strict
    disjunct.
    """
    import pandas as pd

    part = _t(spark, sf_dir, "part").select("p_partkey", "p_size", "p_retailprice")

    def local_skyline(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(
                ["p_retailprice", "p_size"], ascending=[True, False]
            ).reset_index(drop=True)
            group_max = pdf.groupby("p_retailprice")["p_size"].transform("max")
            per_price_max = pdf.groupby("p_retailprice", sort=True)["p_size"].max()
            lower_price_max = per_price_max.cummax().shift(1, fill_value=-1)
            dominated = (pdf["p_size"] < group_max) | (
                pdf["p_retailprice"].map(lower_price_max) >= pdf["p_size"]
            )
            yield pdf[~dominated]

    local = part.mapInPandas(
        local_skyline, "p_partkey bigint, p_size int, p_retailprice double"
    )
    a, b = local.alias("a"), local.alias("b")
    dominates = (
        (F.col("b.p_retailprice") <= F.col("a.p_retailprice"))
        & (F.col("b.p_size") >= F.col("a.p_size"))
        & (
            (F.col("b.p_retailprice") < F.col("a.p_retailprice"))
            | (F.col("b.p_size") > F.col("a.p_size"))
        )
    )
    return a.join(F.broadcast(b), dominates, "left_anti").select(
        "p_partkey", "p_size", "p_retailprice"
    )


SKYLINE_PARTS_SQL = """
SELECT a.p_partkey, a.p_size, a.p_retailprice
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice
    AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
"""


# Local-frontier survivor count above which the broadcast anti-join phase
# must not run (anti-correlated data makes the TRUE frontier O(n): every
# point survives the local prune and the broadcast would ship the corpus
# to every executor). The routed entry point below switches to the exact
# sort-based global pass instead of failing or melting.
SKYLINE_BROADCAST_CAP = 500_000


def _skyline_local_prune(part: DataFrame) -> DataFrame:
    """Phase 1 of every skyline plan: the narrow per-batch prune (a locally
    dominated row is globally dominated, so dropping it is always safe)."""
    import pandas as pd  # noqa: F401 — Arrow kernel dependency

    def local_skyline(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(
                ["p_retailprice", "p_size"], ascending=[True, False]
            ).reset_index(drop=True)
            group_max = pdf.groupby("p_retailprice")["p_size"].transform("max")
            per_price_max = pdf.groupby("p_retailprice", sort=True)["p_size"].max()
            lower_price_max = per_price_max.cummax().shift(1, fill_value=-1)
            dominated = (pdf["p_size"] < group_max) | (
                pdf["p_retailprice"].map(lower_price_max) >= pdf["p_size"]
            )
            yield pdf[~dominated]

    return part.mapInPandas(
        local_skyline, "p_partkey bigint, p_size int, p_retailprice double"
    )


def _skyline_sorted_global(local: DataFrame, n_range_parts: int = 64) -> DataFrame:
    """Exact global skyline WITHOUT a broadcast — the anti-correlated-data
    fallback (r09 verdict #8): range-partition by price, sort within
    partitions by (price asc, size desc), then one prefix-max sweep with
    cross-partition carry.

    Correctness: a row survives iff its size strictly exceeds the max size
    over all STRICTLY cheaper rows AND it has the max size within its own
    price group (ties on both dims all survive — same semantics as the
    NOT-EXISTS oracle). ``repartitionByRange`` co-locates equal prices, so
    the per-partition carry-in (max size over all earlier partitions,
    computed from one tiny per-partition aggregate collected to the driver)
    is exactly "max size over strictly cheaper rows in earlier partitions".
    Within a partition the Arrow kernel carries (open price group, its max,
    prefix max) ACROSS batches, so a price group spanning batch boundaries
    is still judged against its true group max — sortedness guarantees the
    group's max size arrives in its first batch.

    Cost: one range exchange + in-partition sort over local-frontier
    survivors + one driver-side N-row aggregate. Nothing is broadcast, so
    a 10M-point anti-correlated frontier (output ~= input) streams through
    instead of melting the driver.
    """
    import pandas as pd  # noqa: F401

    ranged = (
        local.repartitionByRange(n_range_parts, "p_retailprice")
        .sortWithinPartitions("p_retailprice", F.desc("p_size"))
        .withColumn("pid", F.spark_partition_id())
    )
    ranged = ranged.persist()
    stats = ranged.groupBy("pid").agg(F.max("p_size").alias("pmax")).collect()
    carry: dict[int, float] = {}
    run = float("-inf")
    for r in sorted(stats, key=lambda r: r["pid"]):
        carry[int(r["pid"])] = run
        run = max(run, float(r["pmax"]))

    def sweep(batches):
        started = False
        lower_max = float("-inf")   # max size over fully-closed cheaper groups
        cur_price = None            # open price group (may span batches)
        cur_max = float("-inf")     # its group max (arrives in its first batch)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not started:
                lower_max = carry.get(int(pdf["pid"].iloc[0]), float("-inf"))
                started = True
            per_price = pdf.groupby("p_retailprice", sort=True)["p_size"].max()
            first_price = per_price.index[0]
            if cur_price is not None and first_price == cur_price:
                # group continuation: its true max was seen in an earlier
                # batch (sorted size desc), keep it
                per_price.iloc[0] = max(per_price.iloc[0], cur_max)
            elif cur_price is not None:
                lower_max = max(lower_max, cur_max)
            lpm = per_price.cummax().shift(1)
            lpm.iloc[0] = float("-inf")
            lpm = lpm.clip(lower=lower_max).fillna(lower_max)
            gmax_row = pdf["p_retailprice"].map(per_price)
            lpm_row = pdf["p_retailprice"].map(lpm)
            keep = (pdf["p_size"] == gmax_row) & (pdf["p_size"] > lpm_row)
            yield pdf[keep].drop(columns=["pid"])
            cur_price = per_price.index[-1]
            cur_max = float(per_price.iloc[-1])
            if len(per_price) > 1:
                lower_max = max(lower_max, float(per_price.cummax().iloc[-2]))

    out = ranged.mapInPandas(
        sweep, "p_partkey bigint, p_size int, p_retailprice double"
    )
    return out


def skyline_routed_df(
    spark: SparkSession,
    part: DataFrame,
    broadcast_cap: int = SKYLINE_BROADCAST_CAP,
) -> DataFrame:
    """Size-routed exact skyline over a (p_partkey, p_size, p_retailprice)
    frame: local prune, then EITHER the broadcast anti-join (small
    frontier — the common case; O(log n) expected survivors on independent
    dims) OR the sort-based global sweep (anti-correlated data, where the
    frontier is O(n) and broadcasting it would be a cluster-melter). The
    router counts the local-frontier survivors — one cheap job over the
    pruned frame — instead of guessing from the input size."""
    from pyspark.storagelevel import StorageLevel

    local = _skyline_local_prune(
        part.select("p_partkey", "p_size", "p_retailprice")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = local.count()
    if n <= broadcast_cap:
        a, b = local.alias("a"), local.alias("b")
        dominates = (
            (F.col("b.p_retailprice") <= F.col("a.p_retailprice"))
            & (F.col("b.p_size") >= F.col("a.p_size"))
            & (
                (F.col("b.p_retailprice") < F.col("a.p_retailprice"))
                | (F.col("b.p_size") > F.col("a.p_size"))
            )
        )
        return a.join(F.broadcast(b), dominates, "left_anti").select(
            "p_partkey", "p_size", "p_retailprice"
        )
    return _skyline_sorted_global(local)


RETENTION_BUCKET_SECONDS = 24 * 3600  # daily cohorts (the data spans ~30 days)


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention over ``events``: cohort = each user's first
    active epoch-day, and for every (cohort_day, offset_day) the count of
    cohort users still active that many days later — the standard
    product-analytics retention triangle.

    Days are integer epoch-day indexes (floor(epoch_seconds / 86400)) —
    engine-portable arithmetic, no calendar/session-timezone dependence.

    Scale: ONE corpus shuffle. Each user's active-day set is gathered with
    a map-side-combined ``collect_set`` (state bounded by the day span, not
    the event count), so dedup, cohort (= array_min) and offsets all fall
    out of a single hash on ``user_id``; the only other exchange is the
    final O(days^2)-cardinality aggregate. The naive
    distinct + min-per-user + self-join formulation pays 4 corpus
    exchanges for the same answer.
    """
    day = F.floor(F.col("ts").cast("double") / F.lit(float(RETENTION_BUCKET_SECONDS)))
    per_user = (
        _t(spark, sf_dir, "events")
        .select("user_id", day.cast("bigint").alias("day"))
        .groupBy("user_id")
        .agg(F.collect_set("day").alias("days"))
    )
    return (
        per_user.select(
            F.array_min("days").alias("cohort_day"), F.explode("days").alias("day")
        )
        .groupBy(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("offset_day")
        )
        .agg(F.count("*").alias("n_users"))
    )


RETENTION_COHORTS_SQL = f"""
WITH active AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / {RETENTION_BUCKET_SECONDS}) AS BIGINT) AS day
  FROM events
),
cohorts AS (
  SELECT user_id, MIN(day) AS cohort_day FROM active GROUP BY user_id
)
SELECT c.cohort_day, a.day - c.cohort_day AS offset_day,
       COUNT(*) AS n_users
FROM active a JOIN cohorts c USING (user_id)
GROUP BY 1, 2
"""


RELATIONAL_QUERIES: dict[str, tuple] = {
    "rel_pricing_summary": (pricing_summary, PRICING_SUMMARY_SQL),
    "rel_top_revenue_orders": (top_revenue_orders, TOP_REVENUE_ORDERS_SQL),
    "rel_region_revenue": (region_revenue, REGION_REVENUE_SQL),
    "rel_customers_without_orders": (customers_without_orders, CUSTOMERS_WITHOUT_ORDERS_SQL),
    "rel_segment_stats": (segment_stats, SEGMENT_STATS_SQL),
    "rel_rollup_shipping": (rollup_shipping, ROLLUP_SHIPPING_SQL),
    "rel_cube_order_priority": (cube_order_priority, CUBE_ORDER_PRIORITY_SQL),
    "rel_top_parts_per_brand": (top_parts_per_brand, TOP_PARTS_PER_BRAND_SQL),
    "rel_running_supplier_qty": (running_supplier_qty, RUNNING_SUPPLIER_QTY_SQL),
    "rel_setops_customers": (setops_customers, SETOPS_CUSTOMERS_SQL),
    "rel_scalar_orders": (scalar_orders, SCALAR_ORDERS_SQL),
    "rel_scalar_events": (scalar_events, SCALAR_EVENTS_SQL),
    "rel_pivot_returnflag": (pivot_returnflag, PIVOT_RETURNFLAG_SQL),
    "rel_event_sessions": (event_sessions, EVENT_SESSIONS_SQL),
    "rel_events_hourly": (events_hourly, EVENTS_HOURLY_SQL),
    "rel_topk_orders": (topk_orders, TOPK_ORDERS_SQL),
    "rel_range_join": (range_join_ship_lag, RANGE_JOIN_SHIP_LAG_SQL),
    "rel_asof_join": (asof_latest_order, ASOF_LATEST_ORDER_SQL),
    "rel_array_map_funcs": (array_map_funcs, ARRAY_MAP_FUNCS_SQL),
    "rel_approx_distinct": (approx_distinct_parts, None),
    "rel_sql_forecast_revenue": (forecast_revenue, FORECAST_REVENUE_SQL),
    "rel_multiformat_sources": (multiformat_sources, MULTIFORMAT_SOURCES_SQL),
    "rel_correlated_exists": (priority_late_orders, PRIORITY_LATE_ORDERS_SQL),
    "rel_correlated_scalar": (small_qty_revenue, SMALL_QTY_REVENUE_SQL),
    "rel_salted_heavy_hitters": (salted_heavy_hitters, SALTED_HEAVY_HITTERS_SQL),
    "rel_bucketed_join": (bucketed_join, BUCKETED_JOIN_SQL),
    "rel_quantiles": (quantiles_per_flag, QUANTILES_PER_FLAG_SQL),
    "rel_outer_join": (outer_join_nation_activity, OUTER_JOIN_NATION_ACTIVITY_SQL),
    "rel_range_frame_window": (trailing_month_qty, TRAILING_MONTH_QTY_SQL),
    "rel_distinct_parts_per_flag": (distinct_parts_per_flag, DISTINCT_PARTS_PER_FLAG_SQL),
    "rel_funnel": (rel_funnel, REL_FUNNEL_SQL),
    "rel_scd2": (rel_scd2, REL_SCD2_SQL),
    "rel_resample_ffill": (rel_resample_ffill, REL_RESAMPLE_FFILL_SQL),
    "rel_rolling_zscore": (rel_rolling_zscore, REL_ROLLING_ZSCORE_SQL),
    # staged round-7 rotation stock (see registry.STAGED_NEXT_ROTATION)
    "rel_interval_overlap": (rel_interval_overlap, REL_INTERVAL_OVERLAP_SQL),
    # staged round-9 additions (registry.STAGED_DECLARED_ROUND)
    "rel_skyline": (skyline_parts, SKYLINE_PARTS_SQL),
    "rel_retention_cohorts": (retention_cohorts, RETENTION_COHORTS_SQL),
    # staged r10: the oracle-assertable sibling of rel_approx_distinct
    "rel_approx_distinct_checked": (
        approx_distinct_checked,
        APPROX_DISTINCT_CHECKED_SQL,
    ),
}


def grouping_sets_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the multi-grain aggregation surface
    rollup/cube can't express: ((flag, status), (status), ()) skips the
    (flag) grain a ROLLUP would force, the shape of a report that wants
    per-cell detail, per-status totals, and a grand total in ONE corpus
    pass (Spark rewrites it as a single Expand + hash aggregate — three
    separate groupBys would each rescan the table). Uses the native
    ``DataFrame.groupingSets`` API; decimal-exact sums via dsum; GROUPING()
    flags disambiguate aggregated-away NULLs from data NULLs."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            dsum("l_quantity", "sum_qty"),
            F.count("*").alias("n_rows"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
    )


GROUPING_SETS_SHIPPING_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n_rows,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
"""


RELATIONAL_QUERIES["rel_grouping_sets"] = (
    grouping_sets_shipping,
    GROUPING_SETS_SHIPPING_SQL,
)


def unpivot_region_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native UNPIVOT (wide -> long melt): per-region entity counts as
    three wide BIGINT columns, melted to (region, metric, value) rows via
    ``DataFrame.unpivot`` — the inverse of the pivot entry and the
    standard reshape before a generic per-metric aggregation/plotting
    stage. Spark compiles unpivot to an Expand (each input row emitted
    once per value column, constant-width) — no shuffle at all beyond the
    count aggregates feeding it."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    nat = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "r_name", "n_nationkey"
    )
    cust = (
        c.join(F.broadcast(nat), c.c_nationkey == nat.n_nationkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        s.join(F.broadcast(nat), s.s_nationkey == nat.n_nationkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_suppliers"))
    )
    # The three per-region aggregates are |region| rows each — broadcast
    # explicitly (left SMJ-planned without the hint: the agg output hides
    # the size estimate from the static planner until AQE kicks in).
    # LEFT joins + coalesce(…, 0), matching the oracle's LEFT JOIN: a
    # region with nations but zero customers or suppliers must surface as
    # a 0-count row in BOTH engines, not vanish from one (r11 ADVICE).
    wide = (
        nat.groupBy("r_name")
        .agg(F.count("*").alias("n_nations"))
        .join(F.broadcast(cust), "r_name", "left")
        .join(F.broadcast(supp), "r_name", "left")
        .select(
            F.col("r_name").alias("region"),
            F.col("n_nations").cast("bigint").alias("n_nations"),
            F.coalesce("n_customers", F.lit(0)).cast("bigint").alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).cast("bigint").alias("n_suppliers"),
        )
    )
    return wide.unpivot(
        ids=["region"],
        values=["n_nations", "n_customers", "n_suppliers"],
        variableColumnName="metric",
        valueColumnName="value",
    )


UNPIVOT_REGION_COUNTS_SQL = """
WITH wide AS (
  SELECT r.r_name AS region,
         CAST(COUNT(DISTINCT n.n_nationkey) AS BIGINT) AS n_nations,
         CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
         CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_suppliers
  FROM region r
  JOIN nation n ON n.n_regionkey = r.r_regionkey
  LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
  LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
  GROUP BY 1
)
SELECT region, metric, value
FROM wide UNPIVOT (value FOR metric IN (n_nations, n_customers, n_suppliers))
"""


RELATIONAL_QUERIES["rel_unpivot"] = (
    unpivot_region_counts,
    UNPIVOT_REGION_COUNTS_SQL,
)


def rank_family_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution-rank window family in one pass: ntile(4) quartile
    bucket, percent_rank, and cume_dist per order within its priority
    class, ordered by (o_totalprice, o_orderkey) — the tie-break on the
    unique key makes ntile deterministic (ntile depends on ROW order, not
    rank, so an ambiguous order would be engine-dependent; percent_rank /
    cume_dist are single IEEE divisions of exact integer ranks, bit-stable
    across engines). One window exchange on the priority key serves all
    three functions."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


RANK_FAMILY_SQL = """
SELECT o_orderkey, o_orderpriority,
       CAST(NTILE(4) OVER w AS INT) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


RELATIONAL_QUERIES["rel_rank_family"] = (rank_family_orders, RANK_FAMILY_SQL)


def approx_quantile_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``percentile_approx`` (Spark's native Greenwald-Khanna variant)
    certified with the checked pattern (`rel_approx_distinct_checked`):
    per return flag, emit the EXACT p50 in micro-units (value-matched
    against DuckDB ``quantile_cont`` — same (n-1)*p interpolation as
    Spark ``percentile``) plus a flag the oracle pins TRUE: the approx
    answer lies between the exact 0.48 and 0.52 quantiles (accuracy
    10000 bounds rank error at 1/10000 = 0.01%; +-2 percentile points is
    a ~200x envelope, stable at every sf). At 100 TB the approx path is
    the only viable one — GK state is O(1/accuracy * log n) per group vs
    a full sort for exact percentile — and this entry pins that the fast
    path stays inside the envelope of the slow one."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.expr("percentile(l_extendedprice, 0.5)") * 1e6
        ).cast("bigint").alias("p50_exact_micro"),
        (
            F.expr("percentile_approx(l_extendedprice, 0.5, 10000)").between(
                F.expr("percentile(l_extendedprice, 0.48)"),
                F.expr("percentile(l_extendedprice, 0.52)"),
            )
        ).alias("approx_in_envelope"),
    )


APPROX_QUANTILE_CHECKED_SQL = """
SELECT l_returnflag,
       CAST(ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) * 1e6)
            AS BIGINT) AS p50_exact_micro,
       TRUE AS approx_in_envelope
FROM lineitem GROUP BY l_returnflag
"""


RELATIONAL_QUERIES["rel_approx_quantile_checked"] = (
    approx_quantile_checked,
    APPROX_QUANTILE_CHECKED_SQL,
)


def mad_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per return flag — the robust
    location/scale pair (median, MAD) an outlier-tolerant quality monitor
    uses where mean/stddev would chase tails. Two sort-based aggregate
    passes: per-group exact median (tiny result, broadcast back), then
    the median of absolute deviations. Same cross-engine guarantee as
    the quantiles entry: Spark ``percentile`` and DuckDB ``quantile_cont``
    share the (n-1)*p interpolation, and on values that are multiples of
    0.5 (integral quantities, dyadic midpoints) the arithmetic is
    IEEE-identical — exact differential check, no rounding slop."""
    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    med = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5D)").alias("med")
    )
    return (
        li.join(F.broadcast(med), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.min("med").alias("median_qty"),
            F.expr("percentile(abs(l_quantity - med), 0.5D)").alias("mad_qty"),
            F.count("*").cast("bigint").alias("n"),
        )
    )


REL_MAD_SQL = """
WITH med AS (
  SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS med
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
       MIN(m.med) AS median_qty,
       quantile_cont(abs(l.l_quantity - m.med), 0.5) AS mad_qty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem l JOIN med m USING (l_returnflag)
GROUP BY l.l_returnflag
"""


RELATIONAL_QUERIES["rel_mad"] = (mad_per_flag, REL_MAD_SQL)


def sliding_distinct_users_df(
    ev: DataFrame, days_back: int = 6, pairs_out: list | None = None
) -> DataFrame:
    """Exact trailing-(days_back+1)-day distinct users per active day —
    the DAU/WAU engagement pair every analytics stack reports, and the
    textbook op a window function CANNOT express
    (``COUNT(DISTINCT) OVER (RANGE ...)`` is unsupported in both engines
    because distinct state doesn't compose across frame slides).

    The scale-out shape: dedupe to (day, user) pairs FIRST (one shuffle,
    collapses the raw event volume to at most |users| x |days| rows),
    then count each user ONCE per window via the first-in-window trick:
    with ``prev_d`` = the user's previous active day (one lag() over the
    pairs), the pair (u, day) is u's FIRST activity inside window d
    exactly for d in [max(day, prev_d + 7), day + 6] — so exploding only
    that (possibly empty) range yields each (window, user) exactly once
    and the count is a plain map-side-combinable COUNT(*), no second
    corpus-wide distinct. At 100 TB the cost is bounded by active pairs
    (one distinct + one per-user window + one partial-agg count), never
    raw events — vs the naive per-day self-join that rescans 7 days of
    raw events per output row. A 30/90-day variant only changes the
    explode constant.

    Emits one row per ACTIVE day: exact 1-day and trailing-7-day
    distinct user counts (windows that run past the last active day are
    not emitted; leading days keep their partial-history semantics, as
    in every production WAU definition).

    ``pairs_out``: optional list the persisted (day, user) pairs handle is
    appended to, so a caller that MATERIALIZES the result itself (e.g. the
    streaming WAU entry, which localCheckpoints it) can unpersist exactly
    this operator's cache instead of clearing the whole session catalog
    (cache-ownership policy, tests/test_cache_ownership.py). Left unset,
    the harness owns the release as for every lazy-plan operator.
    """
    from pyspark.storagelevel import StorageLevel

    # Three consumers (active-day list, first-in-window explode, 1-day
    # counts) — without the cache the raw-events distinct runs once per
    # consumer (r13 double-execute audit). Bounded: at most
    # |users| x |days| narrow rows; spills, never recomputes.
    pairs = (
        ev.select(F.date_trunc("day", "ts").alias("d"), "user_id")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if pairs_out is not None:
        pairs_out.append(pairs)
    days = pairs.select("d").distinct()
    w_user = W.partitionBy("user_id").orderBy("d")
    gaps = pairs.select("d", F.lag("d").over(w_user).alias("prev_d"))
    # greatest() skips the null prev_d of each user's first pair.
    start = F.greatest(
        F.col("d"), F.col("prev_d") + F.expr(f"INTERVAL {days_back + 1} DAYS")
    )
    end = F.col("d") + F.expr(f"INTERVAL {days_back} DAYS")
    contrib = gaps.select(
        F.explode(
            F.when(
                start <= end, F.sequence(start, end, F.expr("INTERVAL 1 DAY"))
            )
        ).alias("d")
    )
    wau = contrib.join(days, "d").groupBy("d").agg(
        F.count("*").cast("bigint").alias("users_7d")
    )
    dau = pairs.groupBy("d").agg(F.count("*").cast("bigint").alias("users_1d"))
    return dau.join(wau, "d").select("d", "users_1d", "users_7d")


def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day exact distinct users over the events table
    (:func:`sliding_distinct_users_df`)."""
    return sliding_distinct_users_df(_t(spark, sf_dir, "events"))


SLIDING_DISTINCT_USERS_SQL = """
WITH pairs AS (
  SELECT DISTINCT date_trunc('day', ts) AS d, user_id FROM events
),
days AS (SELECT DISTINCT d FROM pairs)
SELECT days.d,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs p WHERE p.d = days.d)
         AS users_1d,
       (SELECT CAST(COUNT(DISTINCT p.user_id) AS BIGINT) FROM pairs p
        WHERE p.d BETWEEN days.d - INTERVAL 6 DAY AND days.d)
         AS users_7d
FROM days
"""


RELATIONAL_QUERIES["rel_sliding_distinct_users"] = (
    sliding_distinct_users,
    SLIDING_DISTINCT_USERS_SQL,
)


def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group — the most frequent order priority per
    order status, ties broken by the lexicographically smallest value.
    Native ``mode()`` leaves ties implementation-chosen in BOTH engines,
    so both sides compute the explicit argmax instead: one
    partial-aggregated count per (group, value) — map-side combine
    crushes hot values before the exchange — then a row_number over the
    |groups x values|-sized count table. Nothing corpus-sized crosses
    the second exchange; at 100 TB the cost is one combiner-backed
    aggregate, the argmax input being bounded by value cardinality."""
    o = _t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n")
    )
    w = W.partitionBy("o_orderstatus").orderBy(
        F.desc("n"), F.asc("o_orderpriority")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_n"),
        )
    )


REL_MODE_SQL = """
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2
),
ranked AS (
  SELECT o_orderstatus, o_orderpriority, n,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY n DESC, o_orderpriority ASC) AS rk
  FROM counts
)
SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_n
FROM ranked WHERE rk = 1
"""


RELATIONAL_QUERIES["rel_mode"] = (mode_per_group, REL_MODE_SQL)


ATTRIBUTION_HORIZON_DAYS = 3


def attribution_last_touch_df(
    ev: DataFrame, horizon_days: int = ATTRIBUTION_HORIZON_DAYS
) -> DataFrame:
    """Last-touch revenue attribution — the conversion-credit query every
    marketing warehouse runs: each purchase is credited to the SAME
    user's most recent preceding non-purchase event within the horizon
    (purchases with no touch in range credit 'unattributed').

    One pass, no self-join: events are ordered per user and the carried
    last-touch arrives via ``last(..., ignorenulls=True)`` over an
    unbounded-preceding frame — the classic carry-forward window, so the
    cost is one user-keyed sort shuffle over events, not the
    purchases x touches range join the naive formulation pays (at 100 TB
    a user's history is contiguous in one partition and the frame is
    streaming-evaluable). Ties at identical timestamps break by event_id,
    pinned identically in the oracle.

    Returns one row per touch channel: (touch_type, n_purchases,
    value_sum) with value_sum in exact micro-units.
    """
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type") != "purchase",
        F.struct(F.col("ts").alias("t_ts"), F.col("event_type").alias("t_type")),
    )
    carried = ev.select(
        "user_id", "ts", "event_id", "event_type", "value", touch.alias("touch")
    ).withColumn("last_touch", F.last("touch", ignorenulls=True).over(w))
    purchases = carried.where(F.col("event_type") == "purchase").select(
        F.when(
            F.col("last_touch").isNotNull()
            & (
                F.col("last_touch.t_ts")
                >= F.col("ts") - F.expr(f"INTERVAL {horizon_days} DAYS")
            ),
            F.col("last_touch.t_type"),
        )
        .otherwise(F.lit("unattributed"))
        .alias("touch_type"),
        "value",
    )
    return purchases.groupBy("touch_type").agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.sum(F.round(F.col("value") * 1e6).cast("bigint")).alias("value_sum_micro"),
    )


def rel_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution over the events table
    (:func:`attribution_last_touch_df`)."""
    return attribution_last_touch_df(_t(spark, sf_dir, "events"))


ATTRIBUTION_LAST_TOUCH_SQL = f"""
WITH carried AS (
  SELECT user_id, ts, event_id, event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
           OVER w AS t_ts,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
           OVER w AS t_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
purchases AS (
  SELECT CASE WHEN t_ts IS NOT NULL
               AND t_ts >= ts - INTERVAL {ATTRIBUTION_HORIZON_DAYS} DAY
              THEN t_type ELSE 'unattributed' END AS touch_type,
         value
  FROM carried WHERE event_type = 'purchase'
)
SELECT touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS value_sum_micro
FROM purchases GROUP BY touch_type
"""


RELATIONAL_QUERIES["rel_attribution_last_touch"] = (
    rel_attribution_last_touch,
    ATTRIBUTION_LAST_TOUCH_SQL,
)


ANALYZE_COLS = ("l_quantity", "l_extendedprice", "l_discount")
ANALYZE_BUCKETS = 8


def analyze_stats_df(df: DataFrame, cols=ANALYZE_COLS, n_buckets: int = ANALYZE_BUCKETS) -> DataFrame:
    """Optimizer-grade column statistics — the ANALYZE TABLE pass a
    cost-based planner (and a data-quality monitor) runs before anything
    else: per column, row count, exact NDV, min/max, and an equi-width
    histogram. The CBO stats-collection shape at 100 TB: one melt to
    (col_name, value) rows, then two map-side-combinable hash aggregates
    (column summaries; bucket counts) — no window, no sort, nothing
    driver-side but the |cols|-row summary broadcast.

    Exactness discipline: values are scaled to integer CENTS
    (``round(v * 100)`` — the data dictionary pins <= 2 decimals for the
    measured columns) so bucket boundaries are INTEGER division —
    ``width = (max - min) div n_buckets + 1`` — and the histogram is
    bit-identical across engines; an equi-width histogram on raw doubles
    flips boundary rows on a one-ulp division difference.

    Returns one row per (col_name, bucket):
    ``(col_name, bucket, n_rows, col_count, col_ndv, min_cents,
    max_cents)`` — column-level stats repeated per bucket row keeps the
    output a single flat frame."""
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.round(F.col(c) * 100).cast("bigint").alias("vc"),
                    )
                    for c in cols
                ]
            )
        ).alias("m")
    ).select("m.col_name", "m.vc")
    summary = melted.groupBy("col_name").agg(
        F.count("*").cast("bigint").alias("col_count"),
        F.countDistinct("vc").cast("bigint").alias("col_ndv"),
        F.min("vc").alias("min_cents"),
        F.max("vc").alias("max_cents"),
    )
    hist = (
        melted.join(F.broadcast(summary), "col_name")
        .withColumn(
            "bucket",
            F.expr(
                f"(vc - min_cents) div "
                f"((max_cents - min_cents) div {n_buckets} + 1)"
            ).cast("int"),
        )
        .groupBy("col_name", "bucket")
        .agg(F.count("*").cast("bigint").alias("n_rows"))
    )
    return hist.join(F.broadcast(summary), "col_name").select(
        "col_name", "bucket", "n_rows", "col_count", "col_ndv",
        "min_cents", "max_cents",
    )


def rel_analyze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style stats over lineitem's three measure columns
    (:func:`analyze_stats_df`)."""
    return analyze_stats_df(_t(spark, sf_dir, "lineitem"))


_ANALYZE_COLS_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS col_name, CAST(round({c} * 100) AS BIGINT) AS vc FROM lineitem"
    for c in ANALYZE_COLS
)

REL_ANALYZE_STATS_SQL = f"""
WITH melted AS ({_ANALYZE_COLS_SQL}),
summary AS (
  SELECT col_name,
         CAST(COUNT(*) AS BIGINT) AS col_count,
         CAST(COUNT(DISTINCT vc) AS BIGINT) AS col_ndv,
         MIN(vc) AS min_cents,
         MAX(vc) AS max_cents
  FROM melted GROUP BY col_name
)
SELECT m.col_name,
       CAST((m.vc - s.min_cents)
            // ((s.max_cents - s.min_cents) // {ANALYZE_BUCKETS} + 1) AS INT)
         AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       s.col_count, s.col_ndv, s.min_cents, s.max_cents
FROM melted m JOIN summary s USING (col_name)
GROUP BY 1, 2, s.col_count, s.col_ndv, s.min_cents, s.max_cents
"""


RELATIONAL_QUERIES["rel_analyze_stats"] = (rel_analyze_stats, REL_ANALYZE_STATS_SQL)


# --- CBO: collected stats driving the physical plan ----------------------

def _cbo_register_and_analyze(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Register orders/lineitem as external catalog tables over the
    testdata parquet (zero-copy) and run ANALYZE TABLE ... COMPUTE
    STATISTICS FOR COLUMNS — the step that turns :func:`analyze_stats_df`'s
    stats-collection pass into planner inputs. Only catalog tables carry
    stats, which is why this path reads via ``spark.table`` rather than
    ``spark.read.parquet``.

    NOT analyzed: any TIMESTAMP_NTZ column — Spark's FilterEstimation
    pattern-matches value types and raises MatchError on TimestampNTZType
    (observed on 4.1; the filter below therefore predicates on bigint
    o_custkey, which estimates via min/max range arithmetic).
    """
    import hashlib

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    orders_tbl, li_tbl = f"dgds_cbo_orders_{tag}", f"dgds_cbo_lineitem_{tag}"
    for name, src, cols in (
        (orders_tbl, "orders", "o_custkey, o_orderkey, o_orderpriority"),
        (li_tbl, "lineitem", "l_orderkey, l_extendedprice"),
    ):
        if not spark.catalog.tableExists(name):
            spark.sql(
                f"CREATE TABLE {name} USING PARQUET "
                f"LOCATION '{sf_dir}/{src}.parquet'"
            )
            spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}")
    return orders_tbl, li_tbl


# Broadcast threshold for the CBO demonstration: below every
# column-pruned no-stats size estimate of the join legs (projection
# scaling alone takes sf0.001 lineitem's single-column leg to ~16 KB —
# size-based estimation shrinks with column pruning even without CBO),
# but above the stats-estimated size of the filtered orders subplan
# (~150 rows x row-width ~ 5 KB). Without column stats the planner must
# sort-merge; with stats the same query broadcast-hash-joins — pinned in
# tests/test_plans.py.
CBO_BROADCAST_THRESHOLD = 8 * 1024
# o_custkey spans 0..~150*sf_scale (sf0.001 tops out at 149), so the
# segment predicate must sit well inside the smallest range to have
# real selectivity at every shipped sf: < 15 is ~10% of sf0.001 orders,
# ~1% at sf0.01, ~0.1% at sf0.1.
CBO_CUSTKEY_LIMIT = 15


def rel_cbo_stats_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based-optimizer wiring (r14 verdict #2): revenue by order
    priority for a small customer segment, planned WITH catalog column
    stats + ``spark.sql.cbo.enabled``. The result is plan-invariant (the
    exact oracle certifies values); what the stats change is the PHYSICAL
    plan — the filtered orders side's estimated size drops from
    file-bytes to stats-rows x row-width, flipping the big join from
    sort-merge to broadcast-hash (the decision a 100 TB user runs ANALYZE
    for). Confs are scoped: the query is materialized eagerly under CBO
    and the session is restored before returning.
    """
    orders_tbl, li_tbl = _cbo_register_and_analyze(spark, sf_dir)
    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.cbo.enabled",
            "spark.sql.cbo.joinReorder.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(CBO_BROADCAST_THRESHOLD)
    )
    try:
        seg = spark.table(orders_tbl).where(
            F.col("o_custkey") < CBO_CUSTKEY_LIMIT
        )
        out = (
            spark.table(li_tbl)
            .join(seg, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").cast("bigint").alias("n_lineitems"),
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
                .cast("bigint")
                .alias("revenue_cents"),
            )
        )
        # materialize under the CBO confs — the driver collects AFTER this
        # function returns and the confs are restored, so a lazy plan
        # would silently be re-planned without stats
        return out.localCheckpoint(eager=True)
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


REL_CBO_STATS_JOIN_SQL = f"""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_custkey < {CBO_CUSTKEY_LIMIT}
GROUP BY o.o_orderpriority
"""


RELATIONAL_QUERIES["rel_cbo_stats_join"] = (rel_cbo_stats_join, REL_CBO_STATS_JOIN_SQL)
