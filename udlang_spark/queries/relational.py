"""Relational operator coverage (SURVEY.md §2.5-2.7 engine extensions).

The reference (uDLang) has no joins, aggregations, windows, sorts, or set
operations (SURVEY.md §2.5-2.7: single `in` record, src/vm.rs:354); these are
the north-star relational extensions, expressed as stock Spark DataFrame
plans so Catalyst picks physical strategies (broadcast vs. sort-merge joins,
partial aggregation, AQE skew handling).

Every query here has a DuckDB oracle. Determinism notes:
- Sums of money columns go through DECIMAL(18,2)-derived types: exact in both
  engines regardless of partition/accumulation order, then cast to double.
- Sums of arbitrary doubles go through DECIMAL(38,18): the cast is
  correctly-rounded in both engines and the decimal sum is exact.
- Top-k queries carry a unique-key tie-break so membership is total-ordered.
"""

from __future__ import annotations

import math
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udlang_spark.sources.tables import load_table

MONEY = "decimal(18,2)"
EXACT = "decimal(38,18)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def dec(c: str | F.Column) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(MONEY)


BIG = "decimal(38,0)"


def cents(c: str) -> F.Column:
    """Money column → cents-scaled LONG. Exact: the data carries exactly 2
    decimals, so x*100 lands within 1e-10 of an integer and round() can
    never face a .5 tie. Long per-row arithmetic beats the BigDecimal
    multiply chain ~2× (see q01); aggregation buffers must still go through
    DECIMAL(38,0) — long totals overflow ~2^63 at 100 TB scale."""
    return F.round(F.col(c) * 100).cast("long")


def sum_revenue(alias: str) -> F.Column:
    """Σ extendedprice·(1-discount) as cents×basis-points longs (scale 4),
    decimal-exact accumulation, emitted as double — bit-identical to the
    decimal-typed formulation (both are correctly-rounded exact rationals)."""
    rev4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (F.sum(rev4.cast(BIG)).cast("double") / 1e4).alias(alias)


# ---------------------------------------------------------------------------
# q01 — TPC-H Q1 style pricing summary: filter + groupBy agg.
# Scale: map-side partial aggregation on (returnflag, linestatus) — tiny key
# cardinality, so the shuffle moves only |groups| x |partitions| rows.
#
# Arithmetic: the per-row money math runs in cents-scaled LONGs (the data
# has exactly 2 decimals, so round(x*100) is exact — no .5 ties can occur),
# and only the aggregation buffers are DECIMAL(38,0) (long totals overflow
# ~2^63 at 100 TB: 7e11 rows × ~1e11 charge-units/row; silent wraparound is
# the failure mode ANSI-off Spark gives you). Measured at sf0.1: 1.3 s vs
# 1.7 s with full decimal-typed per-row multiplies — the BigDecimal
# multiply chain, not the sum, was the cost. Output values are identical:
# both formulations compute the same exact rationals.
# ---------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = "decimal(38,0)"
    ep = F.round(F.col("l_extendedprice") * 100).cast("long")
    dc = F.round(F.col("l_discount") * 100).cast("long")
    tx = F.round(F.col("l_tax") * 100).cast("long")
    qty = F.col("l_quantity").cast("long")
    disc4 = ep * (100 - dc)  # cents × basis-points: scale 4
    charge6 = disc4 * (100 + tx)  # scale 6
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            (F.sum(ep.cast(big)).cast("double") / 1e2).alias("sum_base_price"),
            (F.sum(disc4.cast(big)).cast("double") / 1e4).alias("sum_disc_price"),
            (F.sum(charge6.cast(big)).cast("double") / 1e6).alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            ((F.sum(ep.cast(big)).cast("double") / 1e2) / n).alias("avg_price"),
            ((F.sum(dc.cast(big)).cast("double") / 1e2) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


ORACLE_Q01 = """
SELECT l_returnflag, l_linestatus,
  sum(l_quantity) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q02 — TPC-H Q6 style: selective filter + single global agg.
# Scale: all predicates push to the parquet scan (PushedFilters), only 3
# columns read; partial agg means one double per partition crosses the wire.
# ---------------------------------------------------------------------------
def q02_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_Q02 = """
SELECT
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.09 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# q03 — TPC-H Q3 style shipping priority: 3-way join + agg + top-10.
# Scale: customer filter first (pushdown), join keyed on custkey/orderkey
# shuffles only surviving rows; top-10 via sort+limit (Spark TakeOrdered —
# no global sort materialization).
# ---------------------------------------------------------------------------
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum_revenue("revenue"))
        .withColumn("o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


ORACLE_Q03 = """
SELECT l_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
  o_orderpriority,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q04 — TPC-H Q4 style: EXISTS → left-semi join, then count by priority.
# Scale: semi join only needs the key column of the probe side; Spark builds
# a hash set, no row duplication.
# ---------------------------------------------------------------------------
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE_Q04 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q05 — TPC-H Q5 style: 6-way star join, dims broadcast.
# Scale: nation/region/supplier are broadcast (no shuffle); the fact-fact
# lineitem⋈orders join shuffles on orderkey; AQE converts to broadcast at
# runtime when a filtered side is small.
# ---------------------------------------------------------------------------
def q05_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Join order note (measured): pre-filtering CUSTOMER to the region via
    # the broadcast nation⋈region chain and joining orders⋈cust BEFORE the
    # lineitem join was tried and is SLOWER at sf0.1 (1.54 s vs 1.06 s) —
    # the extra custkey exchange and the serialized stage dependency cost
    # more than the 1/|regions| orders reduction saves while the orderkey
    # shuffle still fits in memory. At 100 TB the tradeoff flips only if
    # the orderkey exchange spills; that rewrite is one join-reorder away
    # and q56 demonstrates the pushed-down form.
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(sum_revenue("revenue"))
    )


ORACLE_Q05 = """
SELECT n_name,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# q06 — anti join: customers with no orders.
# ---------------------------------------------------------------------------
def q06_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


ORACLE_Q06 = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------------------
# q07 — TPC-H Q13 style: left outer join + two-level aggregation.
# ---------------------------------------------------------------------------
def q07_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


ORACLE_Q07 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# q08 — window ranking: top-3 orders by totalprice per priority class.
# Scale: single shuffle on the partition key; rank filter is applied
# streaming per partition (WindowExec), no global sort.
# ---------------------------------------------------------------------------
def q08_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
    )


ORACLE_Q08 = """
SELECT o_orderpriority, rk, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
)
WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# q09 — running window aggregates over the event stream: cumulative sum,
# lag, and a row index per user. DECIMAL(38,18) keeps the cumulative sum
# exact so the running values hash identically in both engines.
# ---------------------------------------------------------------------------
def q09_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("seq"),
        F.sum(F.col("value").cast(MONEY)).over(cum).cast("double").alias("running_value"),
        F.lag("event_type", 1).over(w).alias("prev_type"),
    )


ORACLE_Q09 = """
SELECT user_id, event_id,
  row_number() OVER w AS seq,
  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
  lag(event_type, 1) OVER w AS prev_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
"""


# ---------------------------------------------------------------------------
# q10 — set operations: UNION / INTERSECT / EXCEPT on key sets.
# ---------------------------------------------------------------------------
def q10_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    machinery = cust.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_custkey").alias("custkey")
    )
    with_open = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return building.union(machinery).distinct().intersect(with_open.distinct()).exceptAll(
        cust.filter(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("custkey"))
    )


ORACLE_Q10 = """
SELECT custkey FROM (
  (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
   UNION
   SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
)
EXCEPT ALL
SELECT c_custkey FROM customer WHERE c_acctbal < 0
"""


# ---------------------------------------------------------------------------
# q11 — distinct aggregation: exact count-distinct per group.
# Scale: Spark expands distinct aggs into a two-phase plan automatically;
# for 100 TB approx_count_distinct (HLL, no expansion) is the cheap variant —
# exposed in operators/relational.py, not oracle-checked (approximate).
# ---------------------------------------------------------------------------
def q11_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


ORACLE_Q11 = """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers, count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q12 — ROLLUP grouping sets over two dimensions.
# ---------------------------------------------------------------------------
def q12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            "total_price",
        )
    )


ORACLE_Q12 = """
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# q13 — tumbling-window aggregation over the event stream (batch-equivalence
# form of the streaming operator; same F.window runs under readStream with a
# watermark — see udlang_spark/streaming/).
# ---------------------------------------------------------------------------
def q13_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(MONEY)).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


ORACLE_Q13 = """
SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS bucket,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q14 — semi-structured extraction: pull a field out of the JSON props
# column and aggregate it.
# ---------------------------------------------------------------------------
def q14_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        (F.sum(k).cast("double") / F.count(F.lit(1))).alias("avg_k"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE_Q14 = """
SELECT event_type,
  CAST(sum(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(sum(CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS DOUBLE) / count(*) AS avg_k,
  count(*) AS n
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q15 — date functions: monthly order aggregation.
# ---------------------------------------------------------------------------
def q15_orders_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
            F.min(dec("o_totalprice")).cast("double").alias("min_price"),
            F.max(dec("o_totalprice")).cast("double").alias("max_price"),
        )
    )


ORACLE_Q15 = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
  count(*) AS n_orders,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
  CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
  CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q16 — string predicates + functions over part.
# ---------------------------------------------------------------------------
def q16_part_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(~F.col("p_type").startswith("PROMO"))
        .select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.length("p_name").alias("name_len"),
            F.size(F.split("p_name", " ")).alias("name_words"),
            F.substring("p_type", 1, 5).alias("type_prefix"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        )
    )


ORACLE_Q16 = """
SELECT p_partkey,
  upper(p_brand) AS brand_upper,
  length(p_name) AS name_len,
  len(string_split(p_name, ' ')) AS name_words,
  substr(p_type, 1, 5) AS type_prefix,
  concat_ws('|', p_brand, p_type) AS brand_type
FROM part
WHERE p_type NOT LIKE 'PROMO%'
"""


# ---------------------------------------------------------------------------
# q17 — broadcast star join over dimensions only.
# ---------------------------------------------------------------------------
def q17_supplier_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(dec("s_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


ORACLE_Q17 = """
SELECT r_name, count(*) AS n_suppliers,
  CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------------------
# q18 — as-of join: for each error event, the latest prior-or-equal click by
# the same user. Union + partitioned window: ONE shuffle on user_id, linear
# in |events| (operators/joins.py asof_join — SURVEY.md §2.5 interval/as-of
# row). DuckDB's native ASOF JOIN is the oracle.
# ---------------------------------------------------------------------------
def q18_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udlang_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", F.col("value").alias("err_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        errors, clicks, by="user_id", value_cols=("value",), prefix="click_"
    )
    return joined.select(
        "event_id",
        "user_id",
        "err_value",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
        "click_value",
    )


ORACLE_Q18 = """
SELECT l.event_id, l.user_id, l.value AS err_value,
       strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS click_time,
       r.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


# ---------------------------------------------------------------------------
# q19 — CUBE grouping: all aggregation lattices over (returnflag, linestatus)
# in one pass (SURVEY.md §2.6: cube/rollup/grouping-sets engine extension).
# Scale: Spark expands grouping sets map-side then partially aggregates —
# shuffle volume is |groups| x |sets|, independent of row count.
# ---------------------------------------------------------------------------
def q19_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pre-aggregate to the base (returnflag, linestatus) groups FIRST, then
    # cube the tiny pre-agg: Spark's cube plans an Expand that multiplies
    # EVERY input row by the number of grouping sets (4× here) before the
    # partial agg — on the 6-row pre-aggregate the expansion is free, on the
    # fact table it's 4× the scan volume. Sums/counts re-aggregate losslessly
    # (decimal partials stay decimal until the final cast).
    li = _t(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(dec("l_extendedprice")).alias("rev0"),
    )
    return (
        base.cube("l_returnflag", "l_linestatus")
        .agg(
            F.sum("n0").alias("n"),
            F.sum("rev0").cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "revenue",
        )
    )


ORACLE_Q19 = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# q20 — custom aggregate (UDAF) via pandas_udf GROUPED_AGG (SURVEY.md §2.10
# UDAF row): per-type median event value. Arrow-batched; Spark runs it as a
# real aggregate (partial batches per group). Median of two middle values is
# bit-deterministic: same two doubles → same midpoint in both engines.
# ---------------------------------------------------------------------------
def q20_median_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    # Spark disallows mixing pandas and JVM aggregates in one agg
    # (INVALID_PANDAS_UDF_PLACEMENT), so the count is a pandas UDAF too
    @pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        return int(len(v))

    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        median_udaf("value").alias("median_value"),
        count_udaf("value").alias("n"),
    )


ORACLE_Q20 = """
SELECT event_type, median(value) AS median_value, count(*) AS n
FROM events
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q21 — range (interval-containment) join: events bucketed into value bands
# via operators/joins.py range_join with interval bucketing — the big-big
# shape where both sides join on a discrete bucket id (equi-join, codegen)
# and the range predicate re-filters, instead of a nested-loop.
# ---------------------------------------------------------------------------
def q21_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udlang_spark.operators.joins import range_join

    ev = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(f"band_{i}", float(i * 50), float((i + 1) * 50)) for i in range(10)],
        "band string, lo double, hi double",
    )
    joined = range_join(
        ev.select("event_id", "value"), "value", bands, "lo", "hi", bucket_width=50
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    )


ORACLE_Q21 = """
SELECT 'band_' || CAST(b AS VARCHAR) AS band, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
JOIN (SELECT unnest(range(0, 10)) AS b) bands
  ON value >= b * 50 AND value < (b + 1) * 50
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q22 — skew-safe two-stage aggregation: partial agg on (key, salt), final
# on key (operators/skew.py). Results are exactly the plain groupBy — the
# salt only changes shuffle distribution, which is the point at 100 TB when
# one key is pathological.
# ---------------------------------------------------------------------------
def q22_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udlang_spark.operators.skew import salted_agg

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", dec("value").alias("value")
    )
    out = salted_agg(ev, "user_id", {"value": "sum", "event_id": "count"}, n_salts=8)
    return out.select(
        "user_id",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("count_event_id").alias("n"),
    )


ORACLE_Q22 = """
SELECT user_id,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       count(*) AS n
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# q23 — exact ordered-set aggregates: percentiles per group. Spark's
# `percentile` and DuckDB's `quantile_cont` use the same linear
# interpolation, so the comparison is bit-exact. (Scale note: exact
# percentile shuffles the group's values; at 100 TB use
# approx_percentile's t-digest — same API shape, mergeable sketch.)
# ---------------------------------------------------------------------------
def q23_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.95).alias("p95"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


ORACLE_Q23 = """
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.95) AS p95,
       min(value) AS min_value,
       max(value) AS max_value
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q24 — lag/lead window functions: per-user event deltas in event-time
# order (completes the §2.7 ranking/offset function surface next to q08's
# row_number and q09's frames).
# ---------------------------------------------------------------------------
def q24_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
        F.row_number().over(w).alias("seq"),
    )


ORACLE_Q24 = """
SELECT event_id, user_id,
  round(value - lag(value) OVER w, 6) AS delta_prev,
  lead(event_type) OVER w AS next_type,
  CAST(row_number() OVER w AS INTEGER) AS seq
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# q25 — TPC-H Q19-style disjunctive predicate: OR-of-AND branches over a
# join. Catalyst extracts the common l_quantity bounds into the scan's
# pushed filters and keeps the per-branch conjunctions above the join —
# the classic test that disjunctions don't defeat pushdown.
# ---------------------------------------------------------------------------
def q25_disjunctive_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, li["l_partkey"] == part["p_partkey"])
    branch1 = (
        (F.col("p_size") <= 10) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20)
    )
    branch2 = (
        (F.col("p_size") <= 25) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30)
    )
    return (
        j.filter(branch1 | branch2)
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1).cast(MONEY) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


ORACLE_Q25 = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       count(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_size <= 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_size <= 25 AND l_quantity BETWEEN 10 AND 30)
"""


# ---------------------------------------------------------------------------
# q26 — TPC-H Q17 shape: correlated scalar-aggregate subquery ("orders below
# 20% of the part's average quantity"), decorrelated as aggregate + join
# back. Scale: the aggregate output is |part| rows (~30× smaller than
# lineitem), so AQE converts the join-back to a broadcast hash join at
# runtime; the only full shuffle is the partial agg on l_partkey.
# Determinism: the threshold is 0.2 * (exact decimal sum → double) / count —
# identical IEEE arithmetic in both engines, so the `<` boundary is exact.
# ---------------------------------------------------------------------------
def q26_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    lim = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1)))
        ).alias("qty_limit")
    )
    return (
        li.join(lim, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


ORACLE_Q26 = """
WITH lim AS (
  SELECT l_partkey AS pk,
         0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
           AS qty_limit
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       count(*) AS n
FROM lineitem JOIN lim ON l_partkey = pk
WHERE l_quantity < qty_limit
"""


# ---------------------------------------------------------------------------
# q27 — GROUPING SETS (the general form behind q12's rollup / q19's cube):
# per-status, per-priority, and grand-total aggregates in one pass. Spark
# expands the sets with a single Expand node feeding one hash aggregate —
# one scan, one shuffle, regardless of how many sets are listed.
# ---------------------------------------------------------------------------
def q27_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


ORACLE_Q27 = """
SELECT o_orderstatus, o_orderpriority,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# ---------------------------------------------------------------------------
# q28 — pivot: order spend by year × priority, priorities becoming columns.
# The pivot value list is declared (not discovered), so the plan is a single
# groupBy(year) aggregate with one conditional-sum per column — no extra
# pass to collect distinct pivot keys, which at 100 TB would be its own job.
# ---------------------------------------------------------------------------
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def q28_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("o_year"))
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.sum(dec("o_totalprice")).cast("double"))
    )


ORACLE_Q28 = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderpriority = '1-URGENT') AS DOUBLE) AS "1-URGENT",
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderpriority = '2-HIGH') AS DOUBLE) AS "2-HIGH",
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderpriority = '3-MEDIUM') AS DOUBLE) AS "3-MEDIUM",
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS DOUBLE) AS "4-NOT SPECIFIED",
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderpriority = '5-LOW') AS DOUBLE) AS "5-LOW"
FROM orders GROUP BY year(o_orderdate)
"""


# ---------------------------------------------------------------------------
# q29 — window frame surface beyond q09's running totals: a RANGE frame in
# event-time units (trailing 30-day spend — peers included by value, not
# row position), plus ntile / percent_rank / first_value. All four share
# one partitionBy(o_custkey) sort, so the physical plan is a single window
# exchange + sort feeding every function.
# Determinism: ntile and percent_rank order by (o_totalprice, o_orderkey) —
# the unique key makes tie order total.
# ---------------------------------------------------------------------------
def q29_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders").withColumn(
        "order_day", F.datediff("o_orderdate", F.lit("1970-01-01"))
    )
    w_range = (
        Window.partitionBy("o_custkey").orderBy("order_day").rangeBetween(-30, 0)
    )
    w_rank = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_first = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice")).over(w_range).cast("double").alias("spend_30d"),
        F.ntile(4).over(w_rank).alias("quartile"),
        F.round(F.percent_rank().over(w_rank), 6).alias("pr"),
        F.first("o_totalprice").over(w_first).alias("first_price"),
    )


ORACLE_Q29 = """
SELECT o_orderkey, o_custkey,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w_range AS DOUBLE) AS spend_30d,
  CAST(ntile(4) OVER w_rank AS INTEGER) AS quartile,
  round(percent_rank() OVER w_rank, 6) AS pr,
  first_value(o_totalprice) OVER w_first AS first_price
FROM (SELECT *, date_diff('day', DATE '1970-01-01', o_orderdate) AS order_day
      FROM orders)
WINDOW
  w_range AS (PARTITION BY o_custkey ORDER BY order_day
              RANGE BETWEEN 30 PRECEDING AND CURRENT ROW),
  w_rank AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey),
  w_first AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# q30 — deterministic hash sampling: sample = f(key), not f(rng state), so
# the same rows are selected on any engine, any partitioning, any retry —
# which is what makes sampled pipelines debuggable and resumable at 100 TB
# (df.sample's per-partition RNG changes membership under repartitioning).
# Rate granularity is 16^-digits; one hex digit = 1/16 ≈ 6.25%.
# The filter is a pure scan predicate: no shuffle until the aggregate.
# ---------------------------------------------------------------------------
def q30_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    keep = F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 1) == "0"
    return (
        li.filter(keep)
        .groupBy("l_returnflag")
        .agg(
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_price"),
            F.count(F.lit(1)).alias("n_sampled"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


ORACLE_Q30 = """
SELECT l_returnflag,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       count(*) AS n_sampled,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem
WHERE substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) = '0'
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q31 — time-series gap-fill: hourly event buckets densified against a
# generated calendar (missing hours appear as rows), counts filled with 0
# and a forward-filled running level (last non-null, IGNORE NULLS window).
# Scale: the calendar is |hours| rows — generated, not scanned; the dense
# join is calendar ⋈ buckets on the hour key (broadcast: a year is 8.8k
# rows); the forward-fill is one global-window sort over |hours| rows
# (tiny), NOT over raw events. Gap-fill never touches the fact table twice.
# ---------------------------------------------------------------------------
def q31_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    buckets = ev.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    )
    cal = (
        ev.agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket")
        )
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        cal.join(buckets, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("sum_value", ignorenulls=True).over(w).alias("level"),
        )
    )


ORACLE_Q31 = """
WITH b AS (
  SELECT date_trunc('hour', ts) AS bucket, count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
  FROM events GROUP BY 1
),
cal AS (
  SELECT unnest(generate_series(date_trunc('hour', (SELECT min(ts) FROM events)),
                                date_trunc('hour', (SELECT max(ts) FROM events)),
                                INTERVAL 1 HOUR)) AS bucket
)
SELECT cal.bucket,
       coalesce(b.n_events, 0) AS n_events,
       last_value(b.sum_value IGNORE NULLS)
         OVER (ORDER BY cal.bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS level
FROM cal LEFT JOIN b ON cal.bucket = b.bucket
"""


# ---------------------------------------------------------------------------
# q32 — batch sessionization: the lag-gap/cumsum idiom (the batch twin of
# streaming session_window). One window partition per user does both the
# gap flags and the session numbering; the per-session aggregate then
# shuffles on (user, session). Two wide ops total, both keyed by user —
# at scale the second reuses the first's partitioning (same key prefix).
# ---------------------------------------------------------------------------
def q32_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long") > 1800),
        1,
    ).otherwise(0)
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = ev.withColumn("new_sess", new_sess).withColumn(
        "session_seq", F.sum("new_sess").over(wc)
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.sum(dec("value")).cast("double").alias("session_value"),
    )


ORACLE_Q32 = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, n_events,
       strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
       session_value
FROM (
  SELECT user_id, session_seq, count(*) AS n_events,
         min(ts) AS session_start, max(ts) AS session_end,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
  FROM numbered GROUP BY user_id, session_seq
)
"""


# ---------------------------------------------------------------------------
# q33 — unpivot (stack): the inverse reshape of q28's pivot. Wide → long is
# a per-row Generate (no shuffle beyond the pivot's own aggregation); the
# oracle is the direct long-form aggregation, so the test also proves
# pivot→unpivot is lossless (modulo absent year×priority combos, dropped
# by the null filter on both sides).
# ---------------------------------------------------------------------------
def q33_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = q28_pivot(spark, sf_dir)
    stack_args = ", ".join(f"'{p}', `{p}`" for p in _PRIORITIES)
    return (
        wide.selectExpr(
            "o_year",
            f"stack({len(_PRIORITIES)}, {stack_args}) AS (o_orderpriority, total_price)",
        )
        .filter(F.col("total_price").isNotNull())
    )


ORACLE_Q33 = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       o_orderpriority,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q34 — CDC upsert (MERGE emulation): a derived update batch (every 7th
# order, +5.00 surcharge) merged into orders; updates win per key, untouched
# rows pass through. anti-join + union — see operators/upsert.py for the
# scale notes (the anti side broadcasts when the CDC batch is small).
# (The surcharge is additive, not multiplicative: a ×1.1 reprice creates
# exact .xx50 rescale ties, which Spark rounds HALF_UP and DuckDB half-even
# — the one place the engines' decimal rounding modes disagree.)
# ---------------------------------------------------------------------------
def q34_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udlang_spark.operators.upsert import upsert

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(5.0)
    )
    merged = upsert(orders, updates, "o_orderkey")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice")).cast("double").alias("total"),
    )


ORACLE_Q34 = """
WITH updates AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice + 5.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 7 = 0
),
merged AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
  UNION ALL
  SELECT * FROM updates
)
SELECT o_orderstatus, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM merged GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# q35 — SCD2 history: the events stream per user as a type-2 dimension —
# each change becomes a version with [valid_from, valid_to) and a current
# flag. One window shuffle on user_id (operators/upsert.py scd2_history).
# ---------------------------------------------------------------------------
def q35_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udlang_spark.operators.upsert import scd2_history

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    hist = scd2_history(ev, "user_id", "ts", "event_id")
    return hist.select(
        "user_id", "event_id", "event_type", "valid_from", "valid_to", "is_current"
    )


ORACLE_Q35 = """
SELECT user_id, event_id, event_type,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       (lead(ts) OVER w IS NULL) AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ---------------------------------------------------------------------------
# q36 — SQL API passthrough: the SAME ANSI text runs on Spark (over
# registered temp views) and on DuckDB as its own oracle — the engine's
# spark.sql surface is first-class, not a wrapper around the DataFrame
# API (both compile to identical Catalyst plans anyway).
# ---------------------------------------------------------------------------
_Q36_SQL = """
SELECT o_orderstatus,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY o_orderstatus
"""


def q36_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_Q36_SQL)


# ---------------------------------------------------------------------------
# q37 — data audit: the validation pass a pipeline runs before training —
# null counts, domain violations, duplicate keys, and referential orphans,
# all in one scan per table plus one anti-join. The orphan check is a
# left-anti keyed on orderkey (broadcast-able: the distinct key set of the
# parent is far smaller than the child table).
# ---------------------------------------------------------------------------
def q37_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    orphans = li.join(orders.select("o_orderkey"),
                      li.l_orderkey == F.col("o_orderkey"), "left_anti")
    dup_keys = (
        orders.groupBy("o_orderkey").count().filter(F.col("count") > 1)
    )
    return li.agg(
        F.count(F.lit(1)).alias("n_lineitem"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
        F.sum((F.col("l_discount") < 0).cast("long")).alias("neg_discount"),
        F.sum(((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("long")).alias(
            "qty_out_of_range"
        ),
    ).crossJoin(
        orphans.agg(F.count(F.lit(1)).alias("n_orphan_lineitems"))
    ).crossJoin(
        dup_keys.agg(F.count(F.lit(1)).alias("n_dup_orderkeys"))
    )


ORACLE_Q37 = """
SELECT
  (SELECT count(*) FROM lineitem) AS n_lineitem,
  (SELECT count(*) FROM lineitem WHERE l_quantity IS NULL) AS null_qty,
  (SELECT count(*) FROM lineitem WHERE l_discount < 0) AS neg_discount,
  (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
    AS qty_out_of_range,
  (SELECT count(*) FROM lineitem
   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS n_orphan_lineitems,
  (SELECT count(*) FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey
                         HAVING count(*) > 1)) AS n_dup_orderkeys
"""


# ---------------------------------------------------------------------------
# q38 — fixed-width histogram of order totals: bucket = floor(value/width),
# one groupBy — the profile/EDA primitive. Bucket arithmetic is pure scan-
# side math; the shuffle carries |buckets| partial counts per partition.
# ---------------------------------------------------------------------------
def q38_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("long")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


ORACLE_Q38 = """
SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
       count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
FROM orders GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q39 — VariantType semi-structured extraction (Spark 4's native path for
# JSON columns, vs q14's regexp fallback): parse once to variant, then
# typed path extraction. At scale variant beats per-field regexp/from_json
# because the binary encoding is parsed once and fields are lazily
# projected; the oracle is DuckDB's native JSON extraction.
# ---------------------------------------------------------------------------
def q39_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n_with_k"),
        )
    )


ORACLE_Q39 = """
SELECT event_type,
       min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q40 — TPC-H Q21 shape (multi-level correlated EXISTS / NOT EXISTS):
# suppliers who were the SOLE latest shipper on multi-supplier orders.
# The two correlated subqueries decorrelate into ONE window pass over the
# per-(order, supplier) aggregate — supplier count, order max, and
# max-achiever count all share the partitionBy(l_orderkey) exchange, so
# the whole query is two shuffles (agg + window) regardless of data size.
# ---------------------------------------------------------------------------
def q40_sole_latest_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    so = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("s_max")
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        so.withColumn("o_max", F.max("s_max").over(w))
        .withColumn("n_sup", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_at_max",
            F.sum((F.col("s_max") == F.col("o_max")).cast("long")).over(w),
        )
    )
    return (
        flagged.filter(
            (F.col("s_max") == F.col("o_max"))
            & (F.col("n_sup") > 1)
            & (F.col("n_at_max") == 1)
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("waiting_orders"))
        .orderBy(F.col("waiting_orders").desc(), F.col("suppkey"))
        .limit(10)
    )


ORACLE_Q40 = """
WITH sup_ord AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_max
  FROM lineitem GROUP BY 1, 2
),
ord AS (SELECT l_orderkey, max(l_shipdate) AS o_max FROM lineitem GROUP BY 1)
SELECT s.l_suppkey AS suppkey, count(*) AS waiting_orders
FROM sup_ord s JOIN ord o USING (l_orderkey)
WHERE s.s_max = o.o_max
  AND EXISTS (SELECT 1 FROM sup_ord s2
              WHERE s2.l_orderkey = s.l_orderkey AND s2.l_suppkey <> s.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM sup_ord s3
                  WHERE s3.l_orderkey = s.l_orderkey
                    AND s3.l_suppkey <> s.l_suppkey AND s3.s_max = o.o_max)
GROUP BY 1 ORDER BY waiting_orders DESC, suppkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# q41 — TPC-H Q2 shape (correlated MIN subquery): for every part, the
# supplier offering its minimum observed price. The reference has no joins
# or subqueries (SURVEY.md §2.5); classic decorrelation: the per-part
# correlated `price = (SELECT min(price) ...)` becomes ONE row_number window
# over the (part, supplier) aggregate — agg shuffle + window reuse the same
# hash partitioning on l_partkey, so Q2's nested subquery costs two narrow
# exchanges total, independent of fact size. Supplier/nation joins broadcast.
# ---------------------------------------------------------------------------
def q41_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    # ONE hash agg: min(struct(price, suppkey)) per part is the argmin with
    # smallest-suppkey tie-break — identical to the two-stage (per-supplier
    # min → per-part rank-1 window) form, but with a single shuffle and no
    # window sort. Struct min compares lexicographically, so the winner is
    # the supplier achieving the global min price (ties → lowest suppkey).
    best = (
        li.groupBy("l_partkey")
        .agg(
            F.min(
                F.struct(
                    dec("l_extendedprice").alias("best_price"),
                    F.col("l_suppkey").alias("l_suppkey"),
                )
            ).alias("m")
        )
        .select(
            "l_partkey",
            F.col("m.best_price").alias("best_price"),
            F.col("m.l_suppkey").alias("l_suppkey"),
        )
    )
    return (
        best.join(F.broadcast(sup), best.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation"),
            F.col("best_price").cast("double").alias("best_price"),
        )
        .orderBy("partkey")
        .limit(50)
    )


ORACLE_Q41 = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS best_price
  FROM lineitem GROUP BY 1, 2
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY l_partkey
                               ORDER BY best_price, l_suppkey) AS rn
  FROM ps
)
SELECT l_partkey AS partkey, s_name AS supp_name, n_name AS nation,
       CAST(best_price AS DOUBLE) AS best_price
FROM best JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
WHERE rn = 1
ORDER BY partkey LIMIT 50
"""


# ---------------------------------------------------------------------------
# q42 — TPC-H Q11 shape (HAVING > fraction of a global scalar subquery):
# parts whose revenue exceeds 0.05% of total revenue. The scalar subquery
# is a 1-row aggregate broadcast against the per-part aggregate (no second
# scan ordering constraint; Catalyst plans it as a cheap cross-join of a
# 1-row relation). Threshold compare and share are computed in double from
# DECIMAL-exact sums, so the boundary is deterministic cross-engine.
# ---------------------------------------------------------------------------
def q42_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    rev = dec("l_extendedprice") * (F.lit(1).cast(MONEY) - dec("l_discount"))
    per_part = li.groupBy("l_partkey").agg(F.sum(rev).alias("part_value"))
    total = per_part.agg(F.sum("part_value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("part_value").cast("double")
            > F.col("total_value").cast("double") * 0.0005
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("part_value").cast("double").alias("part_value"),
            (
                F.col("part_value").cast("double")
                / F.col("total_value").cast("double")
            ).alias("share"),
        )
        .orderBy(F.col("part_value").desc(), F.col("partkey"))
    )


ORACLE_Q42 = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS part_value
  FROM lineitem GROUP BY 1
),
total AS (SELECT sum(part_value) AS total_value FROM per_part)
SELECT l_partkey AS partkey,
       CAST(part_value AS DOUBLE) AS part_value,
       CAST(part_value AS DOUBLE) / CAST(total_value AS DOUBLE) AS share
FROM per_part, total
WHERE CAST(part_value AS DOUBLE) > CAST(total_value AS DOUBLE) * 0.0005
ORDER BY part_value DESC, partkey
"""


# ---------------------------------------------------------------------------
# q43 — TPC-H Q8 shape (market share as ratio-of-conditional-sums): per
# order year, the fraction of revenue shipped by ASIA-nation suppliers.
# One pass over the join: numerator is a CASE inside the same aggregate,
# not a second scan/join. Supplier→nation→region is a broadcast chain
# (dims are tiny at any scale); the only wide exchange is lineitem⋈orders
# on orderkey. Share divides two decimal-exact sums in double.
# ---------------------------------------------------------------------------
def q43_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    sup_region = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "r_name")
    )
    rev = dec("l_extendedprice") * (F.lit(1).cast(MONEY) - dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup_region), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(F.when(F.col("r_name") == "ASIA", rev).otherwise(F.lit(0).cast(MONEY)))
            .cast("double")
            .alias("asia_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
        .withColumn("asia_share", F.col("asia_revenue") / F.col("total_revenue"))
        .orderBy("order_year")
    )


ORACLE_Q43 = """
WITH sup_region AS (
  SELECT s_suppkey, r_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
),
by_year AS (
  SELECT year(o_orderdate) AS order_year,
    CAST(sum(CASE WHEN r_name = 'ASIA'
        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS asia_revenue,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                JOIN sup_region ON l_suppkey = s_suppkey
  GROUP BY 1
)
SELECT order_year, asia_revenue, total_revenue,
       asia_revenue / total_revenue AS asia_share
FROM by_year ORDER BY order_year
"""


# ---------------------------------------------------------------------------
# q44 — fuzzy self-join (edit-distance entity matching): part-name pairs
# within the same brand at levenshtein ≤ 4. Two layered prunings:
# (1) DISTINCT-DOMAIN rewrite — edit distance depends only on the NAME
#     VALUES, so compute it once per distinct ordered name pair (|domain|²
#     = 64² here, a broadcast table) instead of once per part pair
#     (Σ block² ≈ 8M at sf0.1: rows repeat names ~300×). Measured 16.5 s
#     → see below; the levenshtein count drops 2000×. When the domain is
#     NOT small relative to rows (free text), fall back to blocking the
#     nested loop on (brand), as the dedup operators do with LSH.
# (2) the surviving name pairs re-attach to parts via hash equi-joins on
#     (name) then (brand, name) — output-bound, no nested loop anywhere.
# ---------------------------------------------------------------------------
def q44_fuzzy_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udlang_spark.session import persist_tracked

    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    # persisted: both sides of the levenshtein cross join read this
    # relation — without the persist each side re-ran the scan+distinct
    # (r14; the relation is distinct names, far smaller than part)
    names = persist_tracked(part.select("p_name").distinct())
    nd = (
        names.select(F.col("p_name").alias("n1"))
        .crossJoin(names.select(F.col("p_name").alias("n2")))
        .withColumn("dist", F.levenshtein("n1", "n2"))
        .filter(F.col("dist") <= 4)
    )
    a = part.alias("a")
    b = part.alias("b")
    return (
        a.join(F.broadcast(nd), F.col("a.p_name") == F.col("n1"))
        .join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("b.p_name") == F.col("n2"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_brand").alias("brand"),
            F.col("a.p_partkey").alias("key1"),
            F.col("b.p_partkey").alias("key2"),
            F.col("a.p_name").alias("name1"),
            F.col("b.p_name").alias("name2"),
            "dist",
        )
        .orderBy("dist", "key1", "key2")
        .limit(100)
    )


ORACLE_Q44 = """
SELECT a.p_brand AS brand, a.p_partkey AS key1, b.p_partkey AS key2,
       a.p_name AS name1, b.p_name AS name2,
       levenshtein(a.p_name, b.p_name) AS dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 4
ORDER BY dist, key1, key2 LIMIT 100
"""


# ---------------------------------------------------------------------------
# q45 — per-group z-score outlier detection over events. Two passes:
# (1) per-type moments — count + decimal-exact sum + decimal-exact sum of
# per-row double squares (the v*v multiply is a correctly-rounded IEEE op,
# identical cross-engine; summing the decimal casts makes the aggregate
# order-independent), (2) broadcast the tiny per-type stats back and count
# |z| > 3. No transcendentals except sqrt (correctly rounded per IEEE 754),
# so the output is bit-deterministic under any partitioning.
# ---------------------------------------------------------------------------
def q45_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(EXACT)).alias("s"),
        F.sum((F.col("value") * F.col("value")).cast(EXACT)).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("ss").cast("double") - F.col("s").cast("double") * mean
    ) / (F.col("n") - 1)
    stats = stats.select(
        "event_type",
        "n",
        mean.alias("mean"),
        F.sqrt(var).alias("std"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.sum((F.abs(z) > 3).cast("long")).alias("n_outliers"),
            # round(·, 6): the DECIMAL(38,18)→double cast behind mean/std can
            # double-round differently across engines (scaled int128 > 2^53),
            # shifting z by 1 ulp — rounding makes the reported stat stable.
            F.round(F.max(F.abs(z)), 6).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


ORACLE_Q45 = """
WITH stats AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE) AS s,
         CAST(sum(CAST(value * value AS DECIMAL(38,18))) AS DOUBLE) AS ss
  FROM events GROUP BY 1
),
st AS (
  SELECT event_type, n, s / n AS mean,
         sqrt((ss - s * (s / n)) / (n - 1)) AS std
  FROM stats
)
SELECT e.event_type, max(n) AS n,
       CAST(sum(CAST(abs((value - mean) / std) > 3 AS BIGINT)) AS BIGINT) AS n_outliers,
       round(max(abs((value - mean) / std)), 6) AS max_abs_z
FROM events e JOIN st ON e.event_type = st.event_type
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q46 — deterministic stratified sampling: exactly 10 customers per market
# segment, ranked by md5(custkey). Like q30's hash sampling, membership is a
# pure function of the key — stable under repartitioning, retries, and
# engine swaps (df.sample's per-partition RNG is none of those). The rank
# is one window sort per stratum; at scale the per-stratum sort is the cost,
# so for huge strata you'd pre-filter with a hash-prefix predicate (q30)
# before ranking.
# ---------------------------------------------------------------------------
def q46_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.md5(F.col("c_custkey").cast("string")), "c_custkey"
    )
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("rn"),
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
        )
        .orderBy("segment", "rn")
    )


ORACLE_Q46 = """
SELECT c_mktsegment AS segment,
       row_number() OVER (PARTITION BY c_mktsegment
                          ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn,
       c_custkey AS custkey, c_name AS name
FROM customer
QUALIFY rn <= 10
ORDER BY segment, rn
"""


# ---------------------------------------------------------------------------
# q47 — TPC-H Q12 shape (IN-list predicate + conditional aggregation over a
# join): per returnflag, how many high- vs low-priority orders shipped.
# The IN-list pushes to the orders scan (PushedFilters: In(o_orderpriority));
# the CASE runs inside the same aggregate — one join, one agg, no second
# pass. The lineitem⋈orders join shuffles on orderkey (both are facts).
# ---------------------------------------------------------------------------
def q47_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_Q47 = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
GROUP BY l_returnflag ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# q48 — TPC-H Q16 shape (NOT IN anti-join + multi-key countDistinct):
# supplier variety per (brand, size-bucket), excluding a denylisted
# supplier set. NOT IN over a subquery compiles to a null-aware anti join;
# here the denylist side is provably non-null (filter on the key), so
# Catalyst can use a plain left-anti broadcast. countDistinct over the
# remaining pairs is a two-phase agg (partial distinct map-side).
# ---------------------------------------------------------------------------
def q48_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    denylist = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = (
        li.join(denylist, li.l_suppkey == denylist.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("p_brand", (F.col("p_size") % 5).alias("size_bucket"), "l_suppkey")
    )
    return (
        pairs.groupBy("p_brand", "size_bucket")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "size_bucket")
    )


ORACLE_Q48 = """
SELECT p_brand, p_size % 5 AS size_bucket,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, size_bucket
"""


# ---------------------------------------------------------------------------
# q49 — TPC-H Q22 shape (scalar AVG subquery + NOT EXISTS anti-join):
# "rich but inactive" customers — above-average balance, no orders — by
# nation bucket. The AVG is a 1-row broadcast; the NOT EXISTS is a
# left-anti join against orders. Both decorrelations are exact: no row
# comparison against the average can straddle engines because the
# average divides a DECIMAL-exact sum.
# ---------------------------------------------------------------------------
def q49_inactive_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast(MONEY)).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 10).alias("nation_bucket"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast(MONEY)).cast("double").alias("totacctbal"),
        )
        .orderBy("nation_bucket")
    )


ORACLE_Q49 = """
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey % 10 AS nation_bucket,
       count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q50 — ordered funnel (view → click → purchase): per user, each stage
# counts only if it happens strictly AFTER the previous stage's first
# occurrence. The sequential dependency decorrelates into a chain of
# per-user MIN aggregates, each joined back — three narrow aggs keyed on
# user_id that all reuse one hash partitioning; no sort of raw events, no
# per-user sequence materialization. Conversion ratios divide exact counts.
# ---------------------------------------------------------------------------
def q50_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    totals = ev.agg(F.countDistinct("user_id").alias("users_total"))
    nv = v.agg(F.count(F.lit(1)).alias("reached_view"))
    nc = c.agg(F.count(F.lit(1)).alias("reached_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("reached_purchase"))
    return (
        totals.crossJoin(nv)
        .crossJoin(nc)
        .crossJoin(np_)
        # zero-stage guards: an empty funnel stage must yield NULL ratios,
        # not an ANSI divide-by-zero — matching DuckDB, whose double x/0 IS
        # NULL (verified; the oracle needs no change)
        .withColumn(
            "view_to_click",
            F.when(
                F.col("reached_view") > 0,
                F.col("reached_click").cast("double")
                / F.col("reached_view").cast("double"),
            ),
        )
        .withColumn(
            "click_to_purchase",
            F.when(
                F.col("reached_click") > 0,
                F.col("reached_purchase").cast("double")
                / F.col("reached_click").cast("double"),
            ),
        )
    )


ORACLE_Q50 = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, min(ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE event_type = 'click' AND ts > t_view GROUP BY 1
),
p AS (
  SELECT e.user_id, min(ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE event_type = 'purchase' AND ts > t_click GROUP BY 1
)
SELECT (SELECT count(DISTINCT user_id) FROM events) AS users_total,
       (SELECT count(*) FROM v) AS reached_view,
       (SELECT count(*) FROM c) AS reached_click,
       (SELECT count(*) FROM p) AS reached_purchase,
       CAST((SELECT count(*) FROM c) AS DOUBLE)
         / CAST((SELECT count(*) FROM v) AS DOUBLE) AS view_to_click,
       CAST((SELECT count(*) FROM p) AS DOUBLE)
         / CAST((SELECT count(*) FROM c) AS DOUBLE) AS click_to_purchase
"""


# ---------------------------------------------------------------------------
# q51 — event-type transition matrix (sequence mining): consecutive event
# pairs per user ordered by (ts, event_id), counted across the corpus with
# each from-state's share. One window pass partitioned by user_id (lead),
# one (from, to) aggregate, one from-state re-aggregate — the raw events
# sort once, inside their user partition.
# ---------------------------------------------------------------------------
def q51_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    w_from = Window.partitionBy("from_type")
    return (
        counts.withColumn(
            "share",
            F.col("n").cast("double") / F.sum("n").over(w_from).cast("double"),
        )
        .orderBy("from_type", "to_type")
    )


ORACLE_Q51 = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, count(*) AS n FROM seq
  WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE)
         / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS share
FROM counts ORDER BY from_type, to_type
"""


# ---------------------------------------------------------------------------
# q52 — retention cohorts: users grouped by first-seen day, counted as
# active in each subsequent 7-day offset window. The week offset is pure
# integer day arithmetic (datediff div 7) — no engine-specific week
# alignment (date_trunc('week') Monday conventions) can leak in. Two aggs
# on user_id + one on (cohort, offset); the first-seen relation is
# users-sized and broadcast back to events.
# ---------------------------------------------------------------------------
def q52_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(F.to_date(F.min("ts")).alias("first_day"))
    return (
        ev.join(F.broadcast(first), "user_id")
        .select(
            "user_id",
            "first_day",
            F.expr("datediff(to_date(ts), first_day) div 7").alias("week_off"),
        )
        .groupBy(
            F.date_format("first_day", "yyyy-MM-dd").alias("cohort_day"),
            "week_off",
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_day", "week_off")
    )


ORACLE_Q52 = """
WITH first AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS first_day FROM events GROUP BY 1
)
SELECT strftime(first_day, '%Y-%m-%d') AS cohort_day,
       date_diff('day', first_day, CAST(ts AS DATE)) // 7 AS week_off,
       count(DISTINCT e.user_id) AS n_active
FROM events e JOIN first f ON e.user_id = f.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q53 — mergeable-sketch aggregates: approx_count_distinct (HLL++) and
# approx_percentile (t-digest-style) side by side with their exact twins.
# These are THE 100 TB forms (SURVEY.md §9 swap points): exact distinct
# shuffles every distinct key, exact percentiles sort — the sketches are
# fixed-size, mergeable partial states (map-side combine ships ~KB per
# partition regardless of cardinality). Sketch internals are
# engine-specific, so the contract output is the exact twins plus
# WITHIN-BOUND booleans for the sketches: DuckDB reproduces the exact
# values and asserts TRUE for the bounds, making the sketch path
# driver-checkable; the raw sketch-vs-exact bound is also pytest-enforced
# (tests/test_relational_oracle.py). Percentiles run in integer cents so
# midpoint interpolation is exact in both engines regardless of each
# engine's interpolation formula.
# ---------------------------------------------------------------------------
def q53_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # countDistinct runs as its OWN two-stage aggregate and broadcast-joins
    # back on the 3-row group key: mixing a distinct agg with the
    # percentile/sketch buffers in one agg makes Spark EXPAND every row
    # (one copy per distinct group) and drag the object-hash percentile
    # buffers through the doubled stream — measured 24 s combined vs ≤2 s
    # for every component alone at sf0.1.
    exact = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        # round() before the BIGINT cast: the raw double×100 is rarely
        # integral, and Spark's double→int cast TRUNCATES while DuckDB's
        # ROUNDS — without the explicit round the two engines take
        # percentiles over different cent multisets
        F.expr(
            "percentile(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5)"
        ).alias("exact_p50_cents"),
        F.expr(
            "approx_percentile(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5, 10000)"
        ).alias("approx_p50_cents"),
    ).join(exact, "l_returnflag")
    return agg.select(
        "l_returnflag",
        "exact_orders",
        (F.col("exact_p50_cents") / F.lit(100.0)).alias("exact_p50"),
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            <= 0.05 * F.col("exact_orders")
        ).alias("approx_orders_ok"),
        (
            F.abs(F.col("approx_p50_cents") - F.col("exact_p50_cents"))
            <= 0.02 * F.abs(F.col("exact_p50_cents"))
        ).alias("approx_p50_ok"),
    )


ORACLE_SKETCH_STATS = """
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS exact_orders,
       quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT), 0.5) / 100.0
         AS exact_p50,
       TRUE AS approx_orders_ok,
       TRUE AS approx_p50_ok
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q54 — time-series pattern search: z-normalized distance from every
# length-4 sliding window of each user's value series to a fixed query
# pattern (a rising ramp), top-20 closest windows. Expressed with explicit
# lag columns (fixed pattern length), so every arithmetic step is a
# fixed-order IEEE op — bit-deterministic cross-engine; no frame-sum
# association (engines disagree on sliding-sum tree shapes) ever enters.
# Scale: one window pass partitioned by user_id; candidate scoring is
# row-local; TakeOrdered(20) never materializes a global sort.
# ---------------------------------------------------------------------------
def q54_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = (
        ev.withColumn("v1", F.lag("value", 1).over(w))
        .withColumn("v2", F.lag("value", 2).over(w))
        .withColumn("v3", F.lag("value", 3).over(w))
        .filter(F.col("v3").isNotNull())
    )
    m = (F.col("v3") + F.col("v2") + F.col("v1") + F.col("value")) / 4
    var = (
        (F.col("v3") - m) * (F.col("v3") - m)
        + (F.col("v2") - m) * (F.col("v2") - m)
        + (F.col("v1") - m) * (F.col("v1") - m)
        + (F.col("value") - m) * (F.col("value") - m)
    ) / 4
    std = F.sqrt(var)
    # chronological window [v3,v2,v1,v0] vs rising-ramp pattern
    p = (-1.161895, -0.387298, 0.387298, 1.161895)  # z-normalized ramp
    z3 = (F.col("v3") - m) / std
    z2 = (F.col("v2") - m) / std
    z1 = (F.col("v1") - m) / std
    z0 = (F.col("value") - m) / std
    dist = (
        (z3 - p[0]) * (z3 - p[0])
        + (z2 - p[1]) * (z2 - p[1])
        + (z1 - p[2]) * (z1 - p[2])
        + (z0 - p[3]) * (z0 - p[3])
    )
    return (
        lagged.filter(std > 0)
        .select(
            "user_id",
            "event_id",
            F.round(dist, 6).alias("dist"),
        )
        .orderBy("dist", "user_id", "event_id")
        .limit(20)
    )


ORACLE_Q54 = """
WITH lagged AS (
  SELECT user_id, event_id, value AS v0,
         lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v1,
         lag(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v2,
         lag(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v3
  FROM events
),
scored AS (
  SELECT user_id, event_id,
         (v3 + v2 + v1 + v0) / 4 AS m,
         sqrt(((v3 - (v3+v2+v1+v0)/4) * (v3 - (v3+v2+v1+v0)/4)
             + (v2 - (v3+v2+v1+v0)/4) * (v2 - (v3+v2+v1+v0)/4)
             + (v1 - (v3+v2+v1+v0)/4) * (v1 - (v3+v2+v1+v0)/4)
             + (v0 - (v3+v2+v1+v0)/4) * (v0 - (v3+v2+v1+v0)/4)) / 4) AS std,
         v0, v1, v2, v3
  FROM lagged WHERE v3 IS NOT NULL
)
SELECT user_id, event_id,
       round(((v3 - m) / std - (-1.161895)) * ((v3 - m) / std - (-1.161895))
           + ((v2 - m) / std - (-0.387298)) * ((v2 - m) / std - (-0.387298))
           + ((v1 - m) / std - 0.387298) * ((v1 - m) / std - 0.387298)
           + ((v0 - m) / std - 1.161895) * ((v0 - m) / std - 1.161895), 6) AS dist
FROM scored WHERE std > 0
ORDER BY dist, user_id, event_id LIMIT 20
"""


# ---------------------------------------------------------------------------
# q55 — exponential moving average per user (ordered fold): EMA is
# inherently sequential, so it compiles to collect-ordered + aggregate()
# (a left fold inside codegen) — per-user state is that user's own series,
# partitioned on user_id, no cross-user coupling. A left fold is a FIXED
# operation order, so unlike frame sums it is bit-deterministic — and both
# engines fold left (Spark aggregate(), DuckDB list_reduce), seeded with
# the first element.
# ---------------------------------------------------------------------------
def q55_user_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    series = ev.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ts, event_id, value))),"
            " s -> s.value)"
        ).alias("vs")
    )
    ema = F.aggregate(
        F.slice(F.col("vs"), 2, F.greatest(F.size("vs") - 1, F.lit(0))),
        F.element_at(F.col("vs"), 1),
        lambda acc, x: acc * F.lit(0.8) + F.lit(0.2) * x,
    )
    return series.select(
        "user_id",
        F.size("vs").alias("n_events"),
        F.round(ema, 6).alias("ema"),
    ).orderBy("user_id")


ORACLE_Q55 = """
WITH series AS (
  SELECT user_id, list(value ORDER BY ts, event_id) AS vs
  FROM events GROUP BY user_id
)
SELECT user_id, len(vs) AS n_events,
       round(list_reduce(vs::DOUBLE[], (acc, x) -> acc * 0.8 + 0.2 * x), 6) AS ema
FROM series ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q56 — TPC-H Q7 shape (volume shipping between two nations): revenue flowing
# between NATION_1 and NATION_2 in either direction, by ship year. The
# nation filter is pushed BELOW the fact-fact join: lineitem first broadcast-
# joins the pre-filtered supplier side (~2/25 of suppliers), shrinking the
# rows entering the lineitem⋈orders shuffle by ~12×; the customer side is
# filtered the same way before its join. At 100 TB the only wide exchange
# is the already-pruned orderkey join — dims stay broadcast at any scale.
# ---------------------------------------------------------------------------
def q56_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    n1 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    supp_n = supp.join(F.broadcast(n1), supp.s_nationkey == n1.s_nkey).select(
        "s_suppkey", "supp_nation"
    )
    cust_n = cust.join(F.broadcast(n2), cust.c_nationkey == n2.c_nkey).select(
        "c_custkey", "cust_nation"
    )
    return (
        li.filter(F.year("l_shipdate").between(1996, 1997))
        .join(F.broadcast(supp_n), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_n, orders.o_custkey == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(sum_revenue("revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


ORACLE_Q56 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS ship_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2')
  AND n2.n_name IN ('NATION_1', 'NATION_2')
  AND n1.n_name <> n2.n_name
  AND year(l_shipdate) BETWEEN 1996 AND 1997
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q57 — TPC-H Q9 shape (product-type profit by nation and year). The
# testdata has no partsupp, so supply cost is modeled as 0.6·p_retailprice
# (the shape — fact⋈part⋈supplier⋈nation with a derived profit measure —
# is what Q9 exercises). Profit runs in scale-4 integer units per row
# (cents × basis-points; qty is integer-valued, so qty·ret_cents·60 is
# exact), accumulated in DECIMAL(38,0). Part is filtered before the join
# and the supplier→nation chain is broadcast; the partkey join is the one
# shuffle, and AQE broadcast-converts it when the filtered part side fits.
# ---------------------------------------------------------------------------
def q57_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    sup_n = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey).select(
        "s_suppkey", "n_name"
    )
    rev4 = cents("l_extendedprice") * (100 - cents("l_discount"))
    cost4 = F.col("l_quantity").cast("long") * cents("p_retailprice") * 60
    return (
        li.join(part.select("p_partkey", "p_retailprice"), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup_n), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("ship_year"))
        .agg((F.sum((rev4 - cost4).cast(BIG)).cast("double") / 1e4).alias("profit"))
        .orderBy("nation", "ship_year")
    )


ORACLE_Q57 = """
SELECT n_name AS nation, year(l_shipdate) AS ship_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(0.6 AS DECIMAL(2,1))) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q58 — TPC-H Q10 shape (returned-item reporting): top-20 customers by
# revenue lost to returns in one quarter. The orderdate filter lands on the
# orders scan (PushedFilters) and the returnflag filter on the lineitem
# scan, so the orderkey shuffle only moves one quarter of one-third of the
# fact data; customer⋈nation is a broadcast chain. Top-k is a TakeOrdered
# (no global sort), tie-broken on c_custkey for cross-engine determinism.
# ---------------------------------------------------------------------------
def q58_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(sum_revenue("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


ORACLE_Q58 = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


# ---------------------------------------------------------------------------
# q59 — TPC-H Q14 shape (promotion effect): share of one month's revenue
# from PROMO-type parts, as a ratio of two conditional sums in ONE pass
# over the join (no second scan). The month filter prunes lineitem before
# the partkey join; no broadcast hint on part — at bench scale AQE
# broadcast-converts the filtered fact side, and at 100 TB part itself
# (~20 B rows/100 TB SF) must shuffle, which Catalyst picks automatically.
# ---------------------------------------------------------------------------
def q59_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev4 = (cents("l_extendedprice") * (100 - cents("l_discount"))).cast(BIG)
    promo4 = F.when(F.col("p_type") == "PROMO", rev4).otherwise(F.lit(0).cast(BIG))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (F.sum(promo4).cast("double") / 1e4).alias("promo_revenue"),
            (F.sum(rev4).cast("double") / 1e4).alias("total_revenue"),
        )
        .withColumn(
            "promo_share", F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")
        )
    )


ORACLE_Q59 = """
WITH j AS (
  SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
           THEN CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'
)
SELECT promo_revenue, total_revenue,
       100.0 * promo_revenue / total_revenue AS promo_share
FROM j
"""


# ---------------------------------------------------------------------------
# q60 — TPC-H Q15 shape (top supplier via scalar-max subquery): suppliers
# whose quarterly revenue equals the global max. The per-supplier rollup is
# one shuffle on suppkey; the 1-row max is broadcast back and the equality
# filter runs map-side (a broadcast nested-loop over one row — free). The
# revenue doubles on both sides derive from the same exact decimal sum, so
# equality is well-defined. Supplier join is broadcast (dim).
# ---------------------------------------------------------------------------
def q60_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(sum_revenue("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.mx)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


ORACLE_Q60 = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q61 — TPC-H Q18 shape (large-volume customers): orders whose total line
# quantity exceeds 300. The HAVING aggregate runs FIRST (one shuffle on
# orderkey, integer sums, map-side partials), producing a tiny survivor
# set that then broadcast-joins orders and customer — the classic
# "aggregate before join" rewrite that keeps the wide joins off the full
# fact table at 100 TB. Sorted on totalprice desc with orderkey tie-break.
# ---------------------------------------------------------------------------
def q61_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


ORACLE_Q61 = """
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS BIGINT)) > 300
)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice, total_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


# ---------------------------------------------------------------------------
# q62 — TPC-H Q20 shape (dominant-supplier semi-join; partsupp-free
# adaptation): suppliers who ship more than half of some part's total
# shipped quantity. Both aggregation levels come from ONE lineitem scan:
# the (partkey, suppkey) rollup is the only fact shuffle, and the per-part
# total is a WINDOW over that rollup — not a self-join of the rollup with
# its own re-aggregation, which Spark plans as a second full scan+shuffle
# of the fact (AQE does not reuse the stage across the self-reference;
# plan-audited in tests/test_plans.py). The window's exchange moves only
# |part|×|supp-per-part| pre-aggregated rows. Integer quantity math — the
# 2·supp_qty > part_qty dominance test is exact. Supplier list comes back
# via a left-semi join (no row multiplication).
# ---------------------------------------------------------------------------
def q62_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("supp_qty")
    )
    dom = ps.withColumn(
        "part_qty", F.sum("supp_qty").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("supp_qty") * 2 > F.col("part_qty"))
    return (
        supp.join(dom, supp.s_suppkey == dom.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


ORACLE_Q62 = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS supp_qty
  FROM lineitem GROUP BY 1, 2
),
pt AS (SELECT l_partkey, sum(supp_qty) AS part_qty FROM ps GROUP BY 1),
dom AS (
  SELECT DISTINCT l_suppkey
  FROM ps JOIN pt USING (l_partkey) WHERE supp_qty * 2 > part_qty
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q63 — running DISTINCT count over a window. Spark has no
# COUNT(DISTINCT) OVER; the naive emulation — size(collect_set() over w) —
# carries a per-row set in window state (O(|distinct|) memory PER ROW of
# the frame walk, and unbounded for high-cardinality distincts). Instead:
# flag each (user, type)'s FIRST occurrence with one row_number window,
# then running-sum the flag with a second — two sorts over the same
# user-partitioned shuffle, O(1) state per row at any cardinality.
# DuckDB's native windowed count(DISTINCT) is the oracle.
# ---------------------------------------------------------------------------
def q63_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    first_w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    run_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn(
            "is_first", (F.row_number().over(first_w) == 1).cast("long")
        )
        .withColumn("distinct_types", F.sum("is_first").over(run_w))
        .select("user_id", "event_id", "distinct_types")
        .orderBy("user_id", "event_id")
    )


ORACLE_Q63 = """
SELECT user_id, event_id,
       count(DISTINCT event_type) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS distinct_types
FROM events
ORDER BY user_id, event_id
"""


# ---------------------------------------------------------------------------
# q64 — global contiguous sequence ids (1..N in event-time order) WITHOUT
# the single-partition global sort that row_number() over an unpartitioned
# window costs: range-partition on the order key, stamp a partition-local
# index map-side (mapInPandas running counter), add broadcast per-partition
# offsets. One wide exchange total — see operators/indexing.py. Ordinal
# stamping is the pretraining-shard id / stable-sample-id primitive.
# ---------------------------------------------------------------------------
def q64_global_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udlang_spark.operators.indexing import global_row_number

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    return global_row_number(ev, ["ts", "event_id"]).select(
        "event_id", "seq"
    ).orderBy("event_id")


ORACLE_Q64 = """
SELECT event_id,
       row_number() OVER (ORDER BY ts, event_id) AS seq
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# q65 — snapshot diff (table reconciliation): key-wise compare of two
# table versions into added / removed / changed. One full-outer join on
# the key — no row hashing shuffle tricks needed because the comparison
# runs inside the join's codegen (eqNullSafe conjunction over non-key
# columns). The "new" snapshot is derived deterministically from orders
# (drop %101 keys, reprioritize %97 keys, re-key %103 as inserts) so both
# engines diff identical inputs. At 100 TB both sides shuffle on the key;
# with bucketed tables (sources/bucketing.py) the exchange disappears.
# ---------------------------------------------------------------------------
def q65_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udlang_spark.operators.upsert import snapshot_diff

    orders = _t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 103 != 0)
    new = (
        orders.filter(F.col("o_orderkey") % 101 != 0)
        .withColumn(
            "o_orderpriority",
            F.when(F.col("o_orderkey") % 97 == 0, F.lit("0-RUSH")).otherwise(
                F.col("o_orderpriority")
            ),
        )
        .union(
            orders.filter(F.col("o_orderkey") % 103 == 0).withColumn(
                "o_orderkey", F.col("o_orderkey") + 1000000000
            )
        )
    )
    return (
        snapshot_diff(old, new, ["o_orderkey"])
        .filter(F.col("status") != "unchanged")
        .orderBy("o_orderkey")
    )


ORACLE_Q65 = """
WITH old AS (
  SELECT * FROM orders WHERE o_orderkey % 103 <> 0
),
new AS (
  SELECT o_orderkey,
         o_custkey, o_orderstatus, o_totalprice, o_orderdate,
         CASE WHEN o_orderkey % 97 = 0 THEN '0-RUSH' ELSE o_orderpriority END
           AS o_orderpriority
  FROM orders WHERE o_orderkey % 101 <> 0
  UNION ALL
  SELECT o_orderkey + 1000000000,
         o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 103 = 0
),
diff AS (
  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_custkey IS NOT DISTINCT FROM n.o_custkey
               AND o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
               AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
               AND o.o_orderdate IS NOT DISTINCT FROM n.o_orderdate
               AND o.o_orderpriority IS NOT DISTINCT FROM n.o_orderpriority
              THEN 'unchanged' ELSE 'changed' END AS status
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT o_orderkey, status FROM diff
WHERE status <> 'unchanged' ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# q66 — skew-safe salted join (operators/skew.py): the explicit form for
# PLANNED skew, when one key's fan-in is known pathological. The salt only
# changes shuffle distribution — the result is exactly the plain join, which
# is what the oracle checks.
# ---------------------------------------------------------------------------
def q66_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udlang_spark.operators.skew import salted_join

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "event_type")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, "user_id", n_salts=8)
    return joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


ORACLE_Q66 = """
SELECT c_mktsegment, event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


# 262144 bits = 8192 32-bit words (a 32 KiB constant binary literal —
# cheap since bloom.py packs the words into ONE BinaryType literal).
# m is DERIVED FROM THE DIM at plan time, not frozen at one scale: the
# r13 262144 constant (sized for sf0.1's ~28k keys, ~2% FP) SATURATED at
# the 10× scale stress — ~280k keys filled 96% of the bits, FP ≈ 88%, a
# filter that passes nearly everything with zero correctness signal (the
# same failure the r13 32768→262144 resize fixed one scale earlier, which
# is the tell that any constant is wrong). The rule is pure integer
# arithmetic so the DuckDB oracle computes the identical m from the same
# COUNT (no float log2 whose boundary rounding could diverge):
# 12 bits/key ≈ 1.1% FP at k=3 at every scale.
_BLOOM_K = 3
_BLOOM_MIN_M = 4096
_BLOOM_BITS_PER_KEY = 12
_BLOOM_DIM_PRED = "(o_orderpriority = '1-URGENT') AND (o_totalprice > 150000)"


def _bloom_m_for(n_keys: int) -> int:
    return max(
        _BLOOM_MIN_M, ((_BLOOM_BITS_PER_KEY * n_keys + 31) // 32) * 32
    )


def q67_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning (operators/bloom.py): an m-bit
    filter over the urgent-high-value order keys probes every lineitem
    row map-side — no join, no shuffle, just a Column predicate riding
    the fact scan — so only possibly-matching rows would travel into the
    real join. Reports the pruning ledger (fact rows, bloom survivors,
    true semi-join matches, false positives) and the revenue over the
    true matches (DECIMAL money convention). md5-derived positions make
    every pruning decision reproducible in the oracle; zero false
    negatives is structural (the revenue equals the unpruned join's).

    r14: the r13 plan cache on this query was EVICTED (r13 VERDICT
    "what's wrong #1"): its construction is per-run DATA work — the
    dim-count sizing job and the bloom-build aggregation + m/32-word
    collect over orders — that a fresh invocation always pays and that
    production re-derives per filter build (Spark's own runtime bloom
    joins rebuild per query). Memoising it across bench runs priced a
    strictly smaller computation than a fresh run. The two dim jobs now
    share one persisted dim scan instead (the legitimate half of the
    saving: same work, one parquet scan+filter instead of two)."""
    from udlang_spark.operators import bloom
    from udlang_spark.session import persist_tracked
    from udlang_spark.sources.tables import fan_out

    li = _t(spark, sf_dir, "lineitem")
    dim = persist_tracked(
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 150000)
        )
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    # plan-time sizing: one count job over the (filtered, pruned) dim scan
    # picks m — the observability ledger below is what would CATCH a
    # mis-sized filter, the sizing rule is what prevents one. The dim is
    # persisted: the count, the bloom-build aggregation, and the
    # ground-truth broadcast below are three consumers of one small scan.
    m_bits = _bloom_m_for(dim.count())
    words = bloom.bloom_build(dim, "l_orderkey", m_bits, _BLOOM_K)
    # the whole ledger in ONE fact pass: flag each row with the bloom
    # probe (evaluated once), left-join the broadcast dim for ground
    # truth, aggregate counts + DECIMAL revenue together. fan_out first:
    # the k md5 probes are CPU-heavy per-row work that would otherwise
    # ride the single-row-group scan as ONE task at bench SF; the
    # production bloom_semi_join operator itself stays shuffle-free
    # (tests/test_plans.py pins it), this ledger QUERY spreads the audit
    # arithmetic. No-op at real scale where the scan has splits.
    flagged = fan_out(li.select("l_orderkey", "l_extendedprice")).select(
        "l_orderkey",
        "l_extendedprice",
        bloom.bloom_might_contain(
            F.col("l_orderkey"), words, _BLOOM_K
        ).alias("bpass"),
    )
    enriched = flagged.join(
        F.broadcast(dim.withColumn("_m", F.lit(1))), "l_orderkey", "left"
    )
    is_true = F.col("bpass") & F.col("_m").isNotNull()
    res = enriched.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.sum(F.col("bpass").cast("long")).alias("n_bloom_pass"),
        F.sum(is_true.cast("long")).alias("n_true_semi"),
        (
            F.sum(F.col("bpass").cast("long")) - F.sum(is_true.cast("long"))
        ).alias("false_positives"),
        F.sum(
            F.when(is_true, F.col("l_extendedprice").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("true_revenue"),
    )
    return res


def _bloom_oracle(k: int = _BLOOM_K) -> str:
    # m is the prm CTE — the SAME integer sizing rule as _bloom_m_for,
    # computed from the dim count inside the oracle so both engines size
    # the filter from the data (scalar subqueries, evaluated once)
    hashes = ", ".join(str(i) for i in range(k))
    probe_tests = " AND ".join(
        f"""(wl[CAST(p{i} // 32 AS INTEGER) + 1]
           & (1::BIGINT << CAST(p{i} % 32 AS INTEGER))) <> 0"""
        for i in range(k)
    )
    probe_pos = ", ".join(
        f"""(CAST(CAST(concat('0x', substr(md5('bloom:' ||
          CAST(l_orderkey AS VARCHAR)), {1 + 8 * i}, 8)) AS UBIGINT)
          AS BIGINT) % (SELECT m FROM prm)) AS p{i}"""
        for i in range(k)
    )
    return f"""
WITH dimk AS (
  SELECT o_orderkey AS kk FROM orders WHERE {_BLOOM_DIM_PRED}),
prm AS (
  SELECT greatest({_BLOOM_MIN_M},
                  (({_BLOOM_BITS_PER_KEY} * count(*) + 31) // 32) * 32)
    AS m
  FROM dimk),
pos AS (
  SELECT (CAST(CAST(concat('0x', substr(md5('bloom:' ||
           CAST(kk AS VARCHAR)), 1 + 8 * i, 8)) AS UBIGINT) AS BIGINT)
          % (SELECT m FROM prm)) AS pos
  FROM dimk, (SELECT unnest([{hashes}]) AS i) h),
words AS (
  SELECT CAST(pos // 32 AS INTEGER) AS word,
         bit_or((1::BIGINT << CAST(pos % 32 AS INTEGER))) AS bits
  FROM pos GROUP BY 1),
dense AS (
  SELECT g.w AS word, coalesce(words.bits, 0::BIGINT) AS bits
  FROM (SELECT unnest(generate_series(
          0, (SELECT m FROM prm) // 32 - 1)) AS w) g
  LEFT JOIN words ON words.word = g.w),
bloom AS (SELECT list(bits ORDER BY word) AS wl FROM dense),
fact AS (SELECT l_orderkey, l_extendedprice, {probe_pos} FROM lineitem),
pass AS (
  SELECT f.l_orderkey, f.l_extendedprice
  FROM fact f, bloom WHERE {probe_tests}),
tru AS (
  SELECT p.l_orderkey, p.l_extendedprice
  FROM pass p WHERE p.l_orderkey IN (SELECT kk FROM dimk))
SELECT
  (SELECT count(*) FROM lineitem) AS n_fact,
  (SELECT count(*) FROM pass) AS n_bloom_pass,
  (SELECT count(*) FROM tru) AS n_true_semi,
  (SELECT count(*) FROM pass) - (SELECT count(*) FROM tru)
    AS false_positives,
  (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
   FROM tru) AS true_revenue
"""


ORACLE_Q67 = _bloom_oracle()


def q68_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy traversal WITHOUT recursive SQL: suppliers form
    a synthetic tree (parent(s) = (s−1) div 4 for s > 0; 0 is the root),
    and every node's (root, depth, path cost) is computed by ITERATIVE
    pointer doubling — each round joins the frontier to its current
    ancestor's ancestor, so depth-d trees resolve in ⌈log2 d⌉ rounds, not
    d (the 100 TB form of WITH RECURSIVE: a deep chain costs log rounds
    of equi-joins, each localCheckpoint'ed to keep the plan O(1)).
    The DuckDB oracle uses literal WITH RECURSIVE — two entirely
    different execution strategies, one answer."""
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("long").alias("node")
    )
    # (node, anc, dist): current known ancestor pointer + hop count
    state = sup.select(
        "node",
        F.when(F.col("node") > 0, (F.col("node") - 1) / 4)
        .otherwise(F.col("node"))
        .cast("long")
        .alias("anc"),
        F.when(F.col("node") > 0, F.lit(1)).otherwise(F.lit(0)).alias("dist"),
    )
    # pointer doubling: anc(node) := anc(anc(node)), dist adds — the round
    # count is SIZED FROM THE DATA, not a constant: the div-4 tree's depth
    # over keys 0..m is ⌊log4(3m+1)⌋-ish, and doubling resolves depth d in
    # ⌈log2 d⌉ rounds. One tiny max() job replaces blind worst-case rounds
    # — at sf0.1 that is 3 join+checkpoint rounds instead of 6, and the
    # bound still grows with the data (10⁹ keys → depth 15 → 4 rounds).
    # After the sized rounds every pointer provably rests at the root, so
    # no convergence re-check job is needed.
    max_node = sup.agg(F.max("node")).collect()[0][0] or 0
    depth = 0  # depth d starts at node (4^d - 1)/3
    while (4 ** (depth + 1) - 1) // 3 <= max_node:
        depth += 1
    rounds = max(1, math.ceil(math.log2(depth))) if depth else 1
    for _ in range(rounds):
        upd = state.alias("a").join(
            state.alias("b"), F.col("a.anc") == F.col("b.node")
        ).select(
            F.col("a.node").alias("node"),
            F.col("b.anc").alias("anc"),
            (F.col("a.dist") + F.col("b.dist")).alias("dist"),
        )
        state = upd.localCheckpoint(eager=True)
    return state.select(
        "node", F.col("anc").alias("root"), F.col("dist").alias("depth")
    )


# the oracle walks the tree one level per recursion step — the engine's
# pointer-doubling must agree with plain WITH RECURSIVE. Each chain's
# TERMINAL row (anc = 0, the root) carries the full depth; intermediate
# rows still have anc > 0, so the filter picks exactly one row per node.
ORACLE_Q68 = """
WITH RECURSIVE up AS (
  SELECT CAST(s_suppkey AS BIGINT) AS node,
         CAST(s_suppkey AS BIGINT) AS anc,
         0 AS depth
  FROM supplier
  UNION ALL
  SELECT node, (anc - 1) // 4 AS anc, depth + 1
  FROM up WHERE anc > 0
)
SELECT node, CAST(anc AS BIGINT) AS root, depth
FROM up WHERE anc = 0
"""


def q69_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (SURVEY.md §2.10 — completes the U*F trio
    beside compiled-Column UDFs and the pandas GROUPED_AGG UDAF of q20):
    a table function `word_positions(text)` registered with
    spark.udtf.register and invoked through SQL LATERAL, emitting one
    (pos, word) row per token. Python UDTFs run row-at-a-time — the
    documented slow path; the engine's own operators express the same
    explode as pure Column work (t_token_stats) — so this exists for
    surface parity, capped to a bounded slice. The reference's multi-`out`
    kernels ARE its UDTFs (one record in, many out); this is the
    Spark-native registration form of the same shape."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class WordPositions:
        def eval(self, text: str):  # noqa: ANN001 — UDTF protocol
            if text:
                for i, w in enumerate(text.lower().split()):
                    yield (i, w)

    spark.udtf.register("q69_word_positions", WordPositions)
    docs = _t(spark, sf_dir, "documents")
    docs.where(F.col("doc_id") < 20).createOrReplaceTempView("q69_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.word
        FROM q69_docs d, LATERAL q69_word_positions(d.text) t
        """
    )


ORACLE_Q69 = """
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS wl
  FROM documents WHERE doc_id < 20
)
SELECT doc_id, CAST(g.i AS INTEGER) AS pos, wl[g.i + 1] AS word
FROM d, LATERAL (SELECT unnest(generate_series(0, len(wl) - 1)) AS i) g
"""


# ---------------------------------------------------------------------------
# q70 — co-bucketed join: the scale answer to "the biggest shuffle in the
# pipeline is the orders⋈lineitem join". Both sides are written ONCE as
# bucketed+sorted catalog tables on the join key (sources/bucketing.py);
# every later join on that key plans as a sort-merge join with ZERO
# Exchange on either side — each task reads matching bucket files from
# both tables (tests/test_plans.py::test_bucketed_join_has_no_exchange
# pins the plan). At 100 TB this converts the pipeline's dominant shuffle
# into a co-partitioned read that amortizes over every recurring join.
# The bucketed write is cached per (sf_dir, n_buckets) like the IVF-PQ
# index: an index/layout is built once and used many times, so the
# steady-state cost of this query IS the exchange-free join.
# ---------------------------------------------------------------------------
_Q70_BUCKETS = 8


def _q70_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    import hashlib
    import shutil
    from urllib.parse import urlparse

    from udlang_spark.sources import bucketing

    from udlang_spark.sources.tables import table_fingerprint

    # fingerprint the sources so regenerated parquet under the same path
    # is a cache miss (new tables), never a stale bucketed copy; the sf
    # name is part of the table name so generation cleanup below only
    # retires THIS sf's older builds (dropping another sf's live tables
    # would ping-pong rebuilds when bench@sf0.1 and correctness@sf0.01
    # alternate)
    sfname = "".join(
        c if c.isalnum() else "_" for c in os.path.basename(sf_dir.rstrip("/"))
    )
    fp = table_fingerprint(sf_dir, "orders", "lineitem")
    tag = hashlib.md5(f"{sf_dir}|{fp}|{_Q70_BUCKETS}".encode()).hexdigest()[:10]
    to = f"q70_orders_b_{sfname}_{tag}"
    tl = f"q70_lineitem_b_{sfname}_{tag}"
    if not (spark.catalog.tableExists(to) and spark.catalog.tableExists(tl)):
        # a PREVIOUS session's write may have left the managed-table
        # location on disk while this session's in-memory catalog has no
        # entry — saveAsTable then fails LOCATION_ALREADY_EXISTS. Stale
        # locations are safe to clear: the build below is a pure function
        # of (sf_dir, n_buckets), which the tag pins.
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for t in (to, tl):
            if not spark.catalog.tableExists(t):
                shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
        # retire THIS sf's older generations (stale fingerprints): drop
        # their catalog entries and warehouse dirs so regenerated
        # testdata doesn't accumulate dead bucketed copies
        stale_prefixes = (f"q70_orders_b_{sfname}_", f"q70_lineitem_b_{sfname}_")
        for old in spark.catalog.listTables():
            if old.name.startswith(stale_prefixes) and not old.name.endswith(
                tag
            ):
                spark.sql(f"DROP TABLE IF EXISTS {old.name}")
        if os.path.isdir(wh):
            for d in os.listdir(wh):
                if d.startswith(stale_prefixes) and not d.endswith(tag):
                    shutil.rmtree(os.path.join(wh, d), ignore_errors=True)
        bucketing.write_bucketed(
            _t(spark, sf_dir, "orders").select(
                "o_orderkey", "o_orderpriority"
            ),
            to,
            "o_orderkey",
            n_buckets=_Q70_BUCKETS,
        )
        bucketing.write_bucketed(
            _t(spark, sf_dir, "lineitem").select(
                F.col("l_orderkey").alias("o_orderkey"),
                "l_extendedprice",
                "l_discount",
            ),
            tl,
            "o_orderkey",
            n_buckets=_Q70_BUCKETS,
        )
    return to, tl


def q70_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udlang_spark.sources import bucketing

    to, tl = _q70_tables(spark, sf_dir)
    j = bucketing.cobucketed_join(spark, to, tl, "o_orderkey")
    # money through DECIMAL for an exact cross-engine sum, then double
    rev = F.sum(
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
        ).cast("decimal(28,6)")
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            rev.cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_Q70 = """
SELECT o_orderpriority,
       count(*) AS n_items,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q71 — Z-order (Morton) layout: interleave the bits of two join/filter
# dimensions so that range predicates on EITHER dimension prune most
# files. This is the multi-dimensional clustering trick behind Delta's
# OPTIMIZE ZORDER / Iceberg's z-ordering: sorting by z-value puts rows
# close in BOTH dimensions into the same file, so per-file min/max zone
# maps stay tight on both columns at once (a plain sort keeps only its
# leading column's zone maps tight). The query computes the z-value as a
# pure-Column 32-term bit-interleave (whole-stage codegen, zero Python),
# groups rows into z-cells (the file/rowgroup surrogate), and emits each
# cell's zone map — n, min/max of both dims — which is exactly the
# metadata a 100 TB scan would prune on. Locality is pytest-pinned
# (tests/test_plans.py::test_zorder_cells_bound_both_dims: avg per-cell
# extent of BOTH dims ≪ a 1-D sort's trailing-dim extent).
# ---------------------------------------------------------------------------
_Z_BITS = 8  # bits kept per dimension → 16-bit z-value
_Z_CELL_SHIFT = 8  # z >> shift = cell id: each cell is a 16×16 (x,y) tile


def _zvalue_col(x, y):
    """Σ_i ((x>>i)&1)·4^i·1 + ((y>>i)&1)·4^i·2 — the Morton interleave as
    one codegen-friendly sum of 2·_Z_BITS masked terms (constant shift
    distances and multipliers, so the whole expression folds into
    WholeStageCodegen; no UDF, no join)."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
        terms.append(F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(2 << (2 * i)))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def q71_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    x = (F.col("l_partkey") % (1 << _Z_BITS)).cast("long")
    y = (F.col("l_suppkey") % (1 << _Z_BITS)).cast("long")
    cells = (
        li.select(
            F.shiftright(_zvalue_col(x, y), _Z_CELL_SHIFT).alias("zcell"),
            x.alias("x"),
            y.alias("y"),
        )
        .groupBy("zcell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )
    return cells.orderBy("zcell")


def _zorder_oracle() -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((x >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((y >> {i}) & 1) * {2 << (2 * i)}")
    zexpr = " + ".join(terms)
    return f"""
WITH pts AS (
  SELECT l_partkey % {1 << _Z_BITS} AS x, l_suppkey % {1 << _Z_BITS} AS y
  FROM lineitem
)
SELECT ({zexpr}) >> {_Z_CELL_SHIFT} AS zcell,
       count(*) AS n,
       min(x) AS x_min, max(x) AS x_max,
       min(y) AS y_min, max(y) AS y_max
FROM pts
GROUP BY 1
ORDER BY zcell
"""


ORACLE_Q71 = _zorder_oracle()


# ---------------------------------------------------------------------------
# q72 — interval union (coverage aggregation): merge overlapping
# per-user intervals with the classic gaps-and-islands chain — an island
# starts where the interval's start exceeds the running max of previous
# ends — then aggregate each island once. Pure window work: ONE shuffle
# on the partition key funds the lag, the running max, and the island
# sum; no self-join, no explode-per-second. At 100 TB this is the shape
# for "total active time per user/machine" over billions of overlapping
# spans — the naive per-second explode is 10^4× the rows, and the
# interval self-join is quadratic per user.
# ---------------------------------------------------------------------------
def q72_interval_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").cast("long").alias("s"),
        (F.col("ts").cast("long") + (F.col("event_id") % 7 + 1) * 60).alias(
            "e"
        ),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(
            0
        ),
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(w)
    ).groupBy("user_id", "island").agg(
        F.min("s").alias("is_s"), F.max("e").alias("is_e")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(F.col("is_e") - F.col("is_s")).alias("covered_sec"),
        )
        .orderBy("user_id")
    )


ORACLE_Q72 = """
WITH iv AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + (event_id % 7 + 1) * 60 AS e
  FROM events),
flagged AS (
  SELECT user_id, s, e,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   IS NULL
              OR s > max(e) OVER (PARTITION BY user_id ORDER BY s, e
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv),
islands AS (
  SELECT user_id,
         sum(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) AS island,
         s, e
  FROM flagged),
agg AS (
  SELECT user_id, island, min(s) AS is_s, max(e) AS is_e
  FROM islands GROUP BY user_id, island)
SELECT user_id,
       count(*) AS n_intervals,
       CAST(sum(is_e - is_s) AS BIGINT) AS covered_sec
FROM agg GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q73 — co-occurrence pair mining (market-basket / co-click statistics,
# the input to item-item embeddings and recommender training): part pairs
# within the same order, counted, top-k. The self-join is keyed by the
# BASKET id, so candidate pairs are bounded per basket (≤ items²/2 with
# TPC-H's ≤7 items/order), never corpus-quadratic; the pair-count agg
# map-side combines; the top-k is a TakeOrdered with a total-order
# tie-break. At 100 TB the only wide ops are the basket-key shuffle and
# the (p1,p2) count shuffle — a pathological mega-basket (one key with
# 10^5 items) is the thing to guard: cap items per basket upstream or
# salt the basket before pairing.
# ---------------------------------------------------------------------------
def q73_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition on the basket key: the self-join then runs co-partitioned
    # (one exchange, reused by both aliases) at full cluster parallelism.
    # The broadcast alternative measured 1.64 s vs 1.21 s here at sf0.1 —
    # and broadcasting the fact table is not a 100 TB option anyway; the
    # shuffle_hash hint pins the shuffled join so the optimizer can't
    # "helpfully" broadcast the corpus.
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .repartition("l_orderkey")
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b.hint("shuffle_hash"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    )
    counts = pairs.groupBy(
        F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
    ).agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), "p1", "p2").limit(20)


ORACLE_Q73 = """
SELECT p1, p2, n FROM (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2) t
ORDER BY n DESC, p1, p2
LIMIT 20
"""


# ---------------------------------------------------------------------------
# q74 — skew diagnostics: operators/skew.skew_report over the event-type
# key, applying the MEASURED salting decision rule (SKEW_BENCH_r06: salt
# only when one key's share exceeds a fair core share ~1/n_cores). The
# probe is the profiling pass a pipeline runs BEFORE choosing plain vs
# salted join/agg on a key — one count aggregate, output bounded by key
# cardinality.
# ---------------------------------------------------------------------------
def q74_skew_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from udlang_spark.operators import skew

    ev = _t(spark, sf_dir, "events")
    return skew.skew_report(ev, "event_type", n_cores=32).orderBy(
        "event_type"
    )


ORACLE_Q74 = """
WITH tot AS (SELECT count(*) AS total FROM events)
SELECT event_type,
       count(*) AS n,
       round(CAST(count(*) AS DOUBLE) / total, 6) AS share,
       count(*) * 32 > total AS salt_recommended
FROM events, tot
GROUP BY event_type, total
ORDER BY event_type
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_forecast_revenue": q02_forecast_revenue,
    "q03_shipping_priority": q03_shipping_priority,
    "q04_order_priority": q04_order_priority,
    "q05_region_volume": q05_region_volume,
    "q06_customers_without_orders": q06_customers_without_orders,
    "q07_custdist": q07_custdist,
    "q08_topk_per_group": q08_topk_per_group,
    "q09_running_totals": q09_running_totals,
    "q10_set_ops": q10_set_ops,
    "q11_distinct_counts": q11_distinct_counts,
    "q12_rollup": q12_rollup,
    "q13_events_tumbling": q13_events_tumbling,
    "q14_events_json": q14_events_json,
    "q15_orders_monthly": q15_orders_monthly,
    "q16_part_strings": q16_part_strings,
    "q17_supplier_by_region": q17_supplier_by_region,
    "q18_asof_join": q18_asof_join,
    "q19_cube": q19_cube,
    "q20_median_udaf": q20_median_udaf,
    "q21_range_join": q21_range_join,
    "q22_salted_agg": q22_salted_agg,
    "q23_percentiles": q23_percentiles,
    "q24_lag_lead": q24_lag_lead,
    "q25_disjunctive_pricing": q25_disjunctive_pricing,
    "q26_small_qty_revenue": q26_small_qty_revenue,
    "q27_grouping_sets": q27_grouping_sets,
    "q28_pivot": q28_pivot,
    "q29_window_frames": q29_window_frames,
    "q30_hash_sample": q30_hash_sample,
    "q31_gap_fill": q31_gap_fill,
    "q32_sessionize": q32_sessionize,
    "q33_unpivot": q33_unpivot,
    "q34_upsert": q34_upsert,
    "q35_scd2": q35_scd2,
    "q36_sql_passthrough": q36_sql_passthrough,
    "q37_data_audit": q37_data_audit,
    "q38_histogram": q38_histogram,
    "q39_variant_json": q39_variant_json,
    "q40_sole_latest_shipper": q40_sole_latest_shipper,
    "q41_min_cost_supplier": q41_min_cost_supplier,
    "q42_important_parts": q42_important_parts,
    "q43_market_share": q43_market_share,
    "q44_fuzzy_part_pairs": q44_fuzzy_part_pairs,
    "q45_zscore_outliers": q45_zscore_outliers,
    "q46_stratified_sample": q46_stratified_sample,
    "q47_shipmode_priority": q47_shipmode_priority,
    "q48_supplier_variety": q48_supplier_variety,
    "q49_inactive_rich_customers": q49_inactive_rich_customers,
    "q50_funnel": q50_funnel,
    "q51_transitions": q51_transitions,
    "q52_retention": q52_retention,
    "q53_sketch_stats": q53_sketch_stats,
    "q54_pattern_match": q54_pattern_match,
    "q55_user_ema": q55_user_ema,
    "q56_nation_trade_volume": q56_nation_trade_volume,
    "q57_product_profit": q57_product_profit,
    "q58_returned_items": q58_returned_items,
    "q59_promo_effect": q59_promo_effect,
    "q60_top_supplier": q60_top_supplier,
    "q61_large_volume_customers": q61_large_volume_customers,
    "q62_dominant_suppliers": q62_dominant_suppliers,
    "q63_running_distinct": q63_running_distinct,
    "q64_global_seq": q64_global_seq,
    "q65_snapshot_diff": q65_snapshot_diff,
    "q66_salted_join": q66_salted_join,
    "q67_bloom_prune": q67_bloom_prune,
    "q68_hierarchy": q68_hierarchy,
    "q69_udtf": q69_udtf,
    "q70_bucketed_join": q70_bucketed_join,
    "q71_zorder_layout": q71_zorder_layout,
    "q72_interval_union": q72_interval_union,
    "q73_copurchase_pairs": q73_copurchase_pairs,
    "q74_skew_probe": q74_skew_probe,
}

ORACLE = {
    "q01_pricing_summary": ORACLE_Q01,
    "q02_forecast_revenue": ORACLE_Q02,
    "q03_shipping_priority": ORACLE_Q03,
    "q04_order_priority": ORACLE_Q04,
    "q05_region_volume": ORACLE_Q05,
    "q06_customers_without_orders": ORACLE_Q06,
    "q07_custdist": ORACLE_Q07,
    "q08_topk_per_group": ORACLE_Q08,
    "q09_running_totals": ORACLE_Q09,
    "q10_set_ops": ORACLE_Q10,
    "q11_distinct_counts": ORACLE_Q11,
    "q12_rollup": ORACLE_Q12,
    "q13_events_tumbling": ORACLE_Q13,
    "q14_events_json": ORACLE_Q14,
    "q15_orders_monthly": ORACLE_Q15,
    "q16_part_strings": ORACLE_Q16,
    "q17_supplier_by_region": ORACLE_Q17,
    "q18_asof_join": ORACLE_Q18,
    "q19_cube": ORACLE_Q19,
    "q20_median_udaf": ORACLE_Q20,
    "q21_range_join": ORACLE_Q21,
    "q22_salted_agg": ORACLE_Q22,
    "q23_percentiles": ORACLE_Q23,
    "q24_lag_lead": ORACLE_Q24,
    "q25_disjunctive_pricing": ORACLE_Q25,
    "q26_small_qty_revenue": ORACLE_Q26,
    "q27_grouping_sets": ORACLE_Q27,
    "q28_pivot": ORACLE_Q28,
    "q29_window_frames": ORACLE_Q29,
    "q30_hash_sample": ORACLE_Q30,
    "q31_gap_fill": ORACLE_Q31,
    "q32_sessionize": ORACLE_Q32,
    "q33_unpivot": ORACLE_Q33,
    "q34_upsert": ORACLE_Q34,
    "q35_scd2": ORACLE_Q35,
    "q36_sql_passthrough": _Q36_SQL,
    "q37_data_audit": ORACLE_Q37,
    "q38_histogram": ORACLE_Q38,
    "q39_variant_json": ORACLE_Q39,
    "q40_sole_latest_shipper": ORACLE_Q40,
    "q41_min_cost_supplier": ORACLE_Q41,
    "q42_important_parts": ORACLE_Q42,
    "q43_market_share": ORACLE_Q43,
    "q44_fuzzy_part_pairs": ORACLE_Q44,
    "q45_zscore_outliers": ORACLE_Q45,
    "q46_stratified_sample": ORACLE_Q46,
    "q47_shipmode_priority": ORACLE_Q47,
    "q48_supplier_variety": ORACLE_Q48,
    "q49_inactive_rich_customers": ORACLE_Q49,
    "q50_funnel": ORACLE_Q50,
    "q51_transitions": ORACLE_Q51,
    "q52_retention": ORACLE_Q52,
    "q53_sketch_stats": ORACLE_SKETCH_STATS,
    "q54_pattern_match": ORACLE_Q54,
    "q55_user_ema": ORACLE_Q55,
    "q56_nation_trade_volume": ORACLE_Q56,
    "q57_product_profit": ORACLE_Q57,
    "q58_returned_items": ORACLE_Q58,
    "q59_promo_effect": ORACLE_Q59,
    "q60_top_supplier": ORACLE_Q60,
    "q61_large_volume_customers": ORACLE_Q61,
    "q62_dominant_suppliers": ORACLE_Q62,
    "q63_running_distinct": ORACLE_Q63,
    "q64_global_seq": ORACLE_Q64,
    "q65_snapshot_diff": ORACLE_Q65,
    "q66_salted_join": ORACLE_Q66,
    "q67_bloom_prune": ORACLE_Q67,
    "q68_hierarchy": ORACLE_Q68,
    "q69_udtf": ORACLE_Q69,
    "q70_bucketed_join": ORACLE_Q70,
    "q71_zorder_layout": ORACLE_Q71,
    "q72_interval_union": ORACLE_Q72,
    "q73_copurchase_pairs": ORACLE_Q73,
    "q74_skew_probe": ORACLE_Q74,
}
