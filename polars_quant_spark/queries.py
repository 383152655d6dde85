"""Declared correctness surface: named Spark queries + DuckDB oracle twins.

Each entry runs the Spark implementation of one SURVEY.md §2 operator over the
driver tables and is hash-compared against the ANSI-SQL twin on DuckDB
(CORRECTNESS_r{N}.json). Conventions that make the hash comparison exact:

* every float output column is ROUND(x, 6) on both engines;
* group SUMs quantize to integer micro-units first (FLOOR(x·1e6+0.5)) and
  sum integers on both engines — exact in any association order; Spark adds
  longs in codegen (two-level with a DECIMAL merge where a group's total
  grows with the dataset: see micros/units/merge_micros), DuckDB's
  SUM(BIGINT) widens to HUGEINT;
* recurrences (EMA family) are recursive CTEs on the DuckDB side with the
  smoothing factor inlined as a full-precision double literal — the same
  double arithmetic the numpy kernels execute;
* column names/ordering match by construction (the driver sorts by name).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from polars_quant_spark.functions import momentum as mo
from polars_quant_spark.functions import overlap as ov
from polars_quant_spark.functions import price as pr
from polars_quant_spark.functions import returns as ret
from polars_quant_spark.functions import volatility as vy
from polars_quant_spark.functions import volume as vu
from polars_quant_spark.functions._util import round6
from polars_quant_spark.operators.recurrence import Rec, with_recurrences
from polars_quant_spark.oracle import (
    BARS_CTE,
    ema_ctes,
    ema_q_ctes,
    ewm_step,
    floor_rounds,
    recursive_with,
)
from polars_quant_spark.sources.bars import bars, load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


# ---------------------------------------------------------------------------
# REGISTRATION ORDER — driver capture window.
#
# The correctness driver verifies exactly the first 50 entries of QUERIES in
# registration order (CORRECTNESS_r{N}.json). Registration above is grouped
# by module, so an append-only ordering would spend all 50 slots on the
# indicator/CDL families and leave the backtest, dedup/ANN, factor, selector,
# loader, streaming, and semi/anti/rollup families with no driver-verified
# row (this is exactly what happened in rounds 1-2). Rebuild both dicts with
# a curated front-50 — one representative per SURVEY.md §2 family — so every
# family gets a driver-verified entry; everything else follows in its
# original order and is still covered by the full 374-query harness
# (tests/run_harness.py) and pytest.
#
# tests/test_registration_order.py asserts the family coverage of this
# window, so a future append can't silently push a family back out.
# ---------------------------------------------------------------------------

# ROUND-14 ROTATION (VERDICT r13 #8): third post-saturation stalest-first
# window from tools/propose_window.py — 5 dtype canaries + 45 stalest greens
# (ledger last_seen ascending). No fresh registrations this round
# (optimization round: no new features).
PRIORITY_CARRYOVERS: list[str] = [
    # (b) dtype-diverse green canaries (driver-hash drift guards)
    "cdl_all_patterns",    # 61 int flags + string symbol in one hash
    "price_transforms",    # pure float columns
    "loader_grid_fill",    # date grid x symbols, timestamp axis
    "sketch_kmv_users",    # bigint estimate (the r3-r5 red class shape)
    "sel_info",            # 15-column mixed-type latest-bar summary
    # (c) stalest-first rotation (ledger last_seen ascending)
    "rel_q11_important_parts",
    "rel_q14_promo_share",
    "rel_q15_top_supplier",
    "rel_q16_supplier_counts",
    "rel_q17_small_qty_revenue",
    "rel_q18_large_orders",
    "rel_q19_disjunctive_revenue",
    "rel_q21_sole_returner",
    "rel_q9_profit",
    "rel_q13_custdist",
    "rel_q20_excess_shippers",
    "rel_q2_min_cost_supplier",
    "doc_span_dedup",
    "doc_winnow",
    "emb_quantize",
    "bt_sequential_curve",
    "factor_quantile_sorts",
    "stream_session_batch",
    "sketch_stratified_docs",
    "doc_contamination",
    "events_cohort_retention",
    "bt_stop_curve",
    "stream_ohlcv_bars",
    "factor_event_study",
    "emb_pq_recall",
    "ops_bucketed_sma",
    "media_jpeg_features",
    "rel_q6_forecast_revenue",
    "rel_q10_returned_items",
    "asof_tolerance_nearest",
    "interval_overlap_bars",
    "range_point_events",
    "ind_macdfix",
    "ind_ma_dispatch",
    "ind_macdext",
    "rel_salted_nation_rollup",
    "rel_topk_per_group",
    "loader_interpolate",
    "ind_keltner",
    "ind_donchian_20",
    "ind_ichimoku",
    "ind_vortex_14",
    "vol_efi_13",
    "vol_eom_14",
    "bars_volume_profile",
]

PRIORITY_FRESH: list[str] = []

PRIORITY_50: list[str] = PRIORITY_CARRYOVERS + PRIORITY_FRESH


def reorder_registration() -> None:
    """Re-entrant: move every already-registered PRIORITY_50 query to the
    front, preserving relative order elsewhere. Lenient about
    not-yet-registered names because a sibling query module can be the
    import entry point (it imports this module before finishing its own
    registrations); each sibling calls this again at the end of its body,
    so whichever module finishes last leaves the order complete.
    tests/test_registration_order.py asserts the final order strictly."""
    front = [k for k in PRIORITY_50 if k in QUERIES]
    order = front + [k for k in QUERIES if k not in set(front)]
    for d in (QUERIES, ORACLES):
        items = [(k, d[k]) for k in order if k in d]
        d.clear()
        d.update(items)



def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = floor_rounds(sql)
        return fn

    return deco


def _w():
    return Window.partitionBy("symbol").orderBy("t")


r6 = round6


def micros(c: F.Column) -> F.Column:
    """Quantize a double to integer micro-units (FLOOR(x·1e6 + 0.5), long).

    Integer-domain money/measure sums: a long add per row stays inside
    whole-stage codegen (~3× faster than the DECIMAL(38,6) accumulate it
    replaces, which re-parses every double through BigDecimal). The DuckDB
    twin writes SUM(CAST(FLOOR(x*1e6+0.5) AS BIGINT)) — both engines then
    sum exact integers, so association order can't drift the hash."""
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("long")


def units(c: F.Column) -> F.Column:
    """Micro-units → units as double (the final presentation division)."""
    return c.cast("double") / F.lit(1000000.0)


def merge_micros(c: F.Column) -> F.Column:
    """Scale-safe merge of per-partition long partials: DECIMAL(38,0) sum.

    A single-level long sum would overflow int64 at ~9.2e12 units per group
    — reachable for global sums at 100 TB. The two-level shape (groupBy
    (keys, spark_partition_id) with long sums, then this decimal merge over
    the tiny partials frame) keeps the per-row hot path in codegen'd long
    arithmetic and pays BigDecimal only on groups×partitions rows. DuckDB's
    SUM(BIGINT) widens to HUGEINT — both sides exact integers."""
    return F.sum(c.cast("decimal(38,0)"))


# F.col needs an active SparkContext in PySpark 4 — keep module import inert.
KEY = ["symbol", "t"]

# The named-window preamble shared by indicator oracles.
def _win(p: int) -> str:
    return f"(PARTITION BY symbol ORDER BY t ROWS BETWEEN {p - 1} PRECEDING AND CURRENT ROW)"


_CUM = "(PARTITION BY symbol ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
_ORD = "(PARTITION BY symbol ORDER BY t)"


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------


@q(
    "bars_view",
    BARS_CTE
    + """
SELECT symbol, t, ts_us, ROUND(open, 6) AS open, ROUND(high, 6) AS high,
       ROUND(low, 6) AS low, ROUND(close, 6) AS close, volume
FROM bars
""",
)
def bars_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    return b.select(
        "symbol",
        "t",
        "ts_us",
        r6(F.col("open")).alias("open"),
        r6(F.col("high")).alias("high"),
        r6(F.col("low")).alias("low"),
        r6(F.col("close")).alias("close"),
        F.col("volume"),
    )


# ---------------------------------------------------------------------------
# relational surface (scan → filter → join → agg; Catalyst showcase)
# ---------------------------------------------------------------------------


@q(
    "rel_q1_pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_qty,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_base_price,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_disc_price,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
       ROUND(CAST(SUM(CAST(FLOOR(l_quantity * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*), 6) AS avg_qty,
       ROUND(CAST(SUM(CAST(FLOOR(l_extendedprice * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*), 6) AS avg_price,
       ROUND(CAST(SUM(CAST(FLOOR(l_discount * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(*), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def rel_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: predicate pushdown to parquet + two-level hash agg.

    Scale: the per-row hot path is floor-quantize + long add (whole-stage
    codegen); per-(group, input-partition) long partials are exchanged —
    groups × partitions rows, tiny for 4 groups — and merged in DECIMAL so
    a 100 TB global sum cannot overflow int64 (see merge_micros)."""
    from polars_quant_spark.functions._util import cached_build

    li = load_table(spark, sf_dir, "lineitem")

    def build():
        disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        charge = disc_price * (1 + F.col("l_tax"))
        pred = F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp")
        partial_aggs = [
            F.sum(micros(F.col("l_quantity"))).alias("_qty"),
            F.sum(micros(F.col("l_extendedprice"))).alias("_price"),
            F.sum(micros(disc_price)).alias("_disc_price"),
            F.sum(micros(charge)).alias("_charge"),
            F.sum(micros(F.col("l_discount"))).alias("_disc"),
            F.count(F.lit(1)).alias("_n"),
        ]
        n = F.sum("_n")
        merge_aggs = [
            units(merge_micros(F.col("_qty"))).alias("sum_qty"),
            units(merge_micros(F.col("_price"))).alias("sum_base_price"),
            units(merge_micros(F.col("_disc_price"))).alias("sum_disc_price"),
            units(merge_micros(F.col("_charge"))).alias("sum_charge"),
            r6(units(merge_micros(F.col("_qty"))) / n).alias("avg_qty"),
            r6(units(merge_micros(F.col("_price"))) / n).alias("avg_price"),
            r6(units(merge_micros(F.col("_disc"))) / n).alias("avg_disc"),
            n.alias("count_order"),
        ]
        return pred, partial_aggs, merge_aggs

    # Column trees are constants of this query (~1,100 py4j round-trips to
    # rebuild) — memoized per gateway, same pattern as functions/pattern.py
    pred, partial_aggs, merge_aggs = cached_build(("rel_q1",), build)
    partials = (
        li.where(pred)
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_p"))
        .agg(*partial_aggs)
    )
    return partials.groupBy("l_returnflag", "l_linestatus").agg(*merge_aggs)


@q(
    "rel_q3_shipping_priority",
    """
SELECT l_orderkey,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
       STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def rel_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. customer scales with SF so it carries NO broadcast
    hint — statistics/AQE broadcast it while it fits and fall back to a
    shuffle join at 100× (a forced hint would OOM the driver there);
    lineitem↔orders is the one real shuffle; top-k via
    TakeOrderedAndProject (no global sort)."""
    from polars_quant_spark.functions._util import cached_build

    def build():
        # name-based predicates (unambiguous under TPC-H column prefixes)
        # so the trees cache — same treatment as rel_q5
        return (
            F.col("c_mktsegment") == "BUILDING",
            F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"),
            F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            units(
                F.sum(micros(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            ).alias("revenue"),
            [
                F.col("l_orderkey"),
                F.col("revenue"),
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                F.col("o_orderpriority"),
            ],
            [F.col("revenue").desc(), F.col("l_orderkey")],
        )

    p_cu, p_od, p_li, j_ol, j_oc, agg_rev, sel, order = cached_build(
        ("rel_q3",), build
    )
    cu = load_table(spark, sf_dir, "customer").where(p_cu)
    od = load_table(spark, sf_dir, "orders").where(p_od)
    li = load_table(spark, sf_dir, "lineitem").where(p_li)
    return (
        li.join(od, j_ol)
        .join(cu, j_oc)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        # Per-order revenue is bounded (≤7 lineitems/order at any SF), so a
        # single-level long sum of micro-units can't overflow — no decimal
        # anywhere in this plan.
        .agg(agg_rev)
        .select(sel)
        .orderBy(order)
        .limit(10)
    )


@q(
    "rel_q5_region_revenue",
    """
SELECT n_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
""",
)
def rel_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join. Only the true dimensions (nation/region,
    fixed 25/5 rows) carry broadcast hints; customer/supplier scale with SF,
    so AQE/statistics pick broadcast vs shuffle at runtime."""
    from polars_quant_spark.functions._util import cached_build

    cu = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")

    def build():
        # TPC-H column names are table-prefixed, so name-based join
        # predicates resolve unambiguously — and unlike DataFrame-bound
        # attribute refs they are constants of the query, cacheable
        return (
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp")),
            F.col("r_name") == "ASIA",
            F.col("l_orderkey") == F.col("o_orderkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
            F.col("n_regionkey") == F.col("r_regionkey"),
            F.sum(micros(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("_rev"),
            units(merge_micros(F.col("_rev"))).alias("revenue"),
        )

    p_od, p_re, j_od, j_cu, j_su, j_na, j_re, agg_rev, agg_merge = cached_build(
        ("rel_q5",), build
    )
    od = load_table(spark, sf_dir, "orders").where(p_od)
    re = load_table(spark, sf_dir, "region").where(p_re)
    return (
        li.join(od, j_od)
        .join(cu, j_cu)
        .join(su, j_su)
        .join(F.broadcast(na), j_na)
        .join(F.broadcast(re), j_re)
        # Per-nation revenue grows with SF → two-level quantized sum: long
        # partials per (nation, partition), decimal merge over the tiny
        # partials frame (see rel_q1 / merge_micros).
        .groupBy("n_name", F.spark_partition_id().alias("_p"))
        .agg(agg_rev)
        .groupBy("n_name")
        .agg(agg_merge)
    )


@q(
    "agg_events_daily",
    """
SELECT event_type, STRFTIME(ts, '%Y-%m-%d') AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_value,
       ROUND(CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 / COUNT(value), 6) AS avg_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type, STRFTIME(ts, '%Y-%m-%d')
""",
)
def agg_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling daily rollup over the event stream (batch form of the
    streaming window agg).

    The distinct count is hand-planned as two hash aggs — (key, user_id)
    partials first, then per-key merge — instead of count_distinct, whose
    mixed distinct/plain-agg plan Expands every input row 2×. Stage 1 does
    the heavy reduction map-side on (key, user) with long micro-unit sums;
    stage 2 touches only ~|users per key-day| rows, merging in decimal
    (overflow-safe at any SF) and counting rows = distinct users."""
    from polars_quant_spark.functions._util import cached_build
    from polars_quant_spark.sources.bars import events_with_ts

    ev = events_with_ts(spark, sf_dir)

    def build():
        day = F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day")
        stage1 = [
            F.count(F.lit(1)).alias("_n"),
            F.count("value").alias("_nv"),
            F.sum(micros(F.col("value"))).alias("_sv"),
        ]
        sum_value = units(merge_micros(F.col("_sv")))
        stage2 = [
            F.sum("_n").alias("n_events"),
            sum_value.alias("sum_value"),
            r6(sum_value / F.sum("_nv")).alias("avg_value"),
            F.count("user_id").alias("n_users"),
        ]
        return day, stage1, stage2

    day, stage1, stage2 = cached_build(("agg_events_daily",), build)
    per_user = ev.groupBy("event_type", day, "user_id").agg(*stage1)
    return per_user.groupBy("event_type", "day").agg(*stage2)


# ---------------------------------------------------------------------------
# price transforms (pure projections)
# ---------------------------------------------------------------------------


@q(
    "price_transforms",
    BARS_CTE
    + """
SELECT symbol, t,
       ROUND((open + high + low + close) / 4.0, 6) AS avgprice,
       ROUND((high + low) / 2.0, 6) AS medprice,
       ROUND((high + low + close) / 3.0, 6) AS typprice,
       ROUND((high + low + 2.0 * close) / 4.0, 6) AS wclprice
FROM bars
""",
)
def price_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    return b.select(
        *KEY,
        r6(pr.avgprice("open", "high", "low", "close")).alias("avgprice"),
        r6(pr.medprice("high", "low")).alias("medprice"),
        r6(pr.typprice("high", "low", "close")).alias("typprice"),
        r6(pr.wclprice("high", "low", "close")).alias("wclprice"),
    )


# ---------------------------------------------------------------------------
# window indicators (single-window Column expressions)
# ---------------------------------------------------------------------------


@q(
    "ind_sma_20",
    BARS_CTE
    + f"""
SELECT symbol, t,
       ROUND(CASE WHEN COUNT(close) OVER w = 20 THEN AVG(close) OVER w END, 6) AS sma_20
FROM bars
WINDOW w AS {_win(20)}
""",
)
def ind_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    return b.select(*KEY, r6(ov.sma("close", 20, _w())).alias("sma_20"))


@q(
    "ind_wma_10",
    BARS_CTE
    + f"""
SELECT symbol, t,
       ROUND(CASE WHEN COUNT(close) OVER w = 10 THEN
         list_dot_product(list(close) OVER w,
                          [1.0,2.0,3.0,4.0,5.0,6.0,7.0,8.0,9.0,10.0]) / 55.0 END, 6) AS wma_10
FROM bars
WINDOW w AS {_win(10)}
""",
)
def ind_wma(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    return b.select(*KEY, r6(ov.wma("close", 10, _w())).alias("wma_10"))


def _trima_weights(p: int) -> list[float]:
    if p % 2 == 1:
        p1 = p2 = (p + 1) // 2
    else:
        p1, p2 = p // 2 + 1, p // 2
    weights = [0.0] * (p1 + p2 - 1)
    for i in range(p2):
        for j in range(p1):
            weights[i + j] += 1.0
    return weights


_TRIMA10_W = _trima_weights(10)

@q(
    "ind_trima_10",
    BARS_CTE
    + f"""
SELECT symbol, t,
       ROUND(CASE WHEN COUNT(close) OVER w = 10 THEN
         list_dot_product(list(close) OVER w,
                          {[float(x) for x in _TRIMA10_W]}) / 30.0 END, 6) AS trima_10
FROM bars
WINDOW w AS {_win(10)}
""",
)
def ind_trima(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    return b.select(*KEY, r6(ov.trima("close", 10, _w())).alias("trima_10"))


@q(
    "ind_bbands_20",
    BARS_CTE
    + f"""
SELECT symbol, t,
       ROUND(CASE WHEN COUNT(close) OVER w = 20 THEN AVG(close) OVER w + 2.0 * STDDEV_POP(close) OVER w END, 6) AS bb_upper,
       ROUND(CASE WHEN COUNT(close) OVER w = 20 THEN AVG(close) OVER w END, 6) AS bb_middle,
       ROUND(CASE WHEN COUNT(close) OVER w = 20 THEN AVG(close) OVER w - 2.0 * STDDEV_POP(close) OVER w END, 6) AS bb_lower
FROM bars
WINDOW w AS {_win(20)}
""",
)
def ind_bbands(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    up, mid, lo = ov.bbands("close", 20, 2.0, 2.0, _w())
    return b.select(
        *KEY,
        r6(up).alias("bb_upper"),
        r6(mid).alias("bb_middle"),
        r6(lo).alias("bb_lower"),
    )


@q(
    "ind_midpoint_midprice_14",
    BARS_CTE
    + f"""
SELECT symbol, t,
       ROUND(CASE WHEN COUNT(close) OVER w = 14 THEN (MAX(close) OVER w + MIN(close) OVER w) / 2.0 END, 6) AS midpoint_14,
       ROUND(CASE WHEN COUNT(high) OVER w = 14 THEN (MAX(high) OVER w + MIN(low) OVER w) / 2.0 END, 6) AS midprice_14
FROM bars
WINDOW w AS {_win(14)}
""",
)
def ind_midpoint_midprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    return b.select(
        *KEY,
        r6(ov.midpoint("close", 14, _w())).alias("midpoint_14"),
        r6(ov.midprice("high", "low", 14, _w())).alias("midprice_14"),
    )


@q(
    "ind_mom_roc_10",
    BARS_CTE
    + f"""
SELECT symbol, t,
       ROUND(close - LAG(close, 10) OVER o, 6) AS mom_10,
       ROUND(CASE WHEN LAG(close, 10) OVER o != 0 THEN 100.0 * (close - LAG(close, 10) OVER o) / LAG(close, 10) OVER o END, 6) AS roc_10,
       ROUND(CASE WHEN LAG(close, 10) OVER o != 0 THEN (close - LAG(close, 10) OVER o) / LAG(close, 10) OVER o END, 6) AS rocp_10,
       ROUND(CASE WHEN LAG(close, 10) OVER o != 0 THEN close / LAG(close, 10) OVER o END, 6) AS rocr_10,
       ROUND(CASE WHEN LAG(close, 10) OVER o != 0 THEN 100.0 * close / LAG(close, 10) OVER o END, 6) AS rocr100_10
FROM bars
WINDOW o AS {_ORD}
""",
)
def ind_mom_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    w = _w()
    return b.select(
        *KEY,
        r6(mo.mom("close", 10, w)).alias("mom_10"),
        r6(mo.roc("close", 10, w)).alias("roc_10"),
        r6(mo.rocp("close", 10, w)).alias("rocp_10"),
        r6(mo.rocr("close", 10, w)).alias("rocr_10"),
        r6(mo.rocr100("close", 10, w)).alias("rocr100_10"),
    )


@q(
    "ind_returns",
    BARS_CTE
    + f"""
SELECT symbol, t,
       ROUND(CASE WHEN LAG(close, 1) OVER o != 0 THEN close / LAG(close, 1) OVER o - 1.0 END, 6) AS ret_1,
       ROUND(CASE WHEN LAG(close, 1) OVER o != 0 AND close / LAG(close, 1) OVER o > 0
                  THEN LN(close / LAG(close, 1) OVER o) END, 6) AS logret_1
FROM bars
WINDOW o AS {_ORD}
""",
)
def ind_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    w = _w()
    return b.select(
        *KEY,
        r6(ret.returns("close", 1, w)).alias("ret_1"),
        r6(ret.log_returns("close", 1, w)).alias("logret_1"),
    )


@q(
    "ind_bop",
    BARS_CTE
    + """
SELECT symbol, t,
       ROUND(CASE WHEN high = low THEN 0.0 ELSE (close - open) / (high - low) END, 6) AS bop
FROM bars
""",
)
def ind_bop(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    return b.select(*KEY, r6(mo.bop("open", "high", "low", "close")).alias("bop"))


@q(
    "ind_willr_14",
    BARS_CTE
    + f"""
SELECT symbol, t,
       ROUND(CASE WHEN COUNT(close) OVER w = 14 THEN
         CASE WHEN MAX(high) OVER w = MIN(low) OVER w THEN 0.0
              ELSE -100.0 * (MAX(high) OVER w - close) / (MAX(high) OVER w - MIN(low) OVER w) END
       END, 6) AS willr_14
FROM bars
WINDOW w AS {_win(14)}
""",
)
def ind_willr(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    return b.select(*KEY, r6(mo.willr("high", "low", "close", 14, _w())).alias("willr_14"))


@q(
    "ind_cmo_14",
    BARS_CTE
    + f"""
, diffs AS (
  SELECT symbol, t, close - LAG(close) OVER {_ORD} AS d FROM bars
)
SELECT symbol, t,
       ROUND(CASE WHEN COUNT(d) OVER w = 14 THEN
         CASE WHEN SUM(CASE WHEN d > 0 THEN d ELSE 0.0 END) OVER w
                 + SUM(CASE WHEN d < 0 THEN -d ELSE 0.0 END) OVER w = 0 THEN 0.0
              ELSE 100.0 * (SUM(CASE WHEN d > 0 THEN d ELSE 0.0 END) OVER w
                          - SUM(CASE WHEN d < 0 THEN -d ELSE 0.0 END) OVER w)
                   / (SUM(CASE WHEN d > 0 THEN d ELSE 0.0 END) OVER w
                    + SUM(CASE WHEN d < 0 THEN -d ELSE 0.0 END) OVER w) END
       END, 6) AS cmo_14
FROM diffs
WINDOW w AS {_win(14)}
""",
)
def ind_cmo(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    return b.select(*KEY, r6(mo.cmo("close", 14, _w())).alias("cmo_14"))


@q(
    "ind_ultosc",
    BARS_CTE
    + f"""
, btr AS (
  SELECT symbol, t,
         close - LEAST(low, LAG(close) OVER {_ORD}) AS bp,
         GREATEST(high, LAG(close) OVER {_ORD}) - LEAST(low, LAG(close) OVER {_ORD}) AS tr
  FROM bars
)
SELECT symbol, t,
       ROUND(CASE WHEN COUNT(bp) OVER w28 = 28 THEN
         100.0 * (4.0 * (CASE WHEN SUM(tr) OVER w7 != 0 THEN SUM(bp) OVER w7 / SUM(tr) OVER w7 END)
                + 2.0 * (CASE WHEN SUM(tr) OVER w14 != 0 THEN SUM(bp) OVER w14 / SUM(tr) OVER w14 END)
                + (CASE WHEN SUM(tr) OVER w28 != 0 THEN SUM(bp) OVER w28 / SUM(tr) OVER w28 END)) / 7.0
       END, 6) AS ultosc
FROM btr
WINDOW w7 AS {_win(7)}, w14 AS {_win(14)}, w28 AS {_win(28)}
""",
)
def ind_ultosc(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    return b.select(*KEY, r6(mo.ultosc("high", "low", "close", 7, 14, 28, _w())).alias("ultosc"))


@q(
    "ind_mfi_14",
    BARS_CTE
    + f"""
, flows AS (
  SELECT symbol, t,
         (high + low + close) / 3.0 - LAG((high + low + close) / 3.0) OVER {_ORD} AS dtp,
         (high + low + close) / 3.0 * volume AS flow
  FROM bars
)
SELECT symbol, t,
       ROUND(CASE WHEN COUNT(dtp) OVER w = 14 THEN
         CASE WHEN SUM(CASE WHEN dtp > 0 THEN flow ELSE 0.0 END) OVER w
                 + SUM(CASE WHEN dtp < 0 THEN flow ELSE 0.0 END) OVER w = 0 THEN 0.0
              ELSE 100.0 * SUM(CASE WHEN dtp > 0 THEN flow ELSE 0.0 END) OVER w
                   / (SUM(CASE WHEN dtp > 0 THEN flow ELSE 0.0 END) OVER w
                    + SUM(CASE WHEN dtp < 0 THEN flow ELSE 0.0 END) OVER w) END
       END, 6) AS mfi_14
FROM flows
WINDOW w AS {_win(14)}
""",
)
def ind_mfi(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    return b.select(*KEY, r6(mo.mfi("high", "low", "close", "volume", 14, _w())).alias("mfi_14"))


@q(
    "ind_cci_14",
    BARS_CTE
    + f"""
, tp AS (
  SELECT symbol, t, (high + low + close) / 3.0 AS tp FROM bars
), layered AS (
  SELECT symbol, t, tp,
         AVG(tp) OVER w AS m,
         list(tp) OVER w AS lst,
         COUNT(tp) OVER w AS cnt
  FROM tp
  WINDOW w AS {_win(14)}
)
SELECT symbol, t,
       ROUND(CASE WHEN cnt = 14 THEN
         CASE WHEN list_sum(list_transform(lst, v -> abs(v - m))) / 14.0 = 0 THEN 0.0
              ELSE (tp - m) / (0.015 * (list_sum(list_transform(lst, v -> abs(v - m))) / 14.0)) END
       END, 6) AS cci_14
FROM layered
""",
)
def ind_cci(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    return b.select(*KEY, r6(mo.cci("high", "low", "close", 14, _w())).alias("cci_14"))


@q(
    "ind_aroon_14",
    BARS_CTE
    + f"""
, ex AS (
  SELECT symbol, t,
         (MAX(struct_pack(v := high, t := t)) OVER w).t AS t_max,
         (MIN(struct_pack(v := low, nt := -t)) OVER w).nt AS nt_min,
         COUNT(high) OVER w AS cnt
  FROM bars
  WINDOW w AS {_win(15)}
)
SELECT symbol, t,
       ROUND(CASE WHEN cnt = 15 THEN 100.0 * (14 - (t + nt_min)) / 14.0 END, 6) AS aroon_dn,
       ROUND(CASE WHEN cnt = 15 THEN 100.0 * (14 - (t - t_max)) / 14.0 END, 6) AS aroon_up,
       ROUND(CASE WHEN cnt = 15 THEN 100.0 * (14 - (t - t_max)) / 14.0
                                    - 100.0 * (14 - (t + nt_min)) / 14.0 END, 6) AS aroon_osc
FROM ex
""",
)
def ind_aroon(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    dn, up = mo.aroon("high", "low", 14, _w(), "t")
    osc = mo.aroonosc("high", "low", 14, _w(), "t")
    return b.select(
        *KEY,
        r6(dn).alias("aroon_dn"),
        r6(up).alias("aroon_up"),
        r6(osc).alias("aroon_osc"),
    )


@q(
    "ind_stoch",
    BARS_CTE
    + f"""
, fk AS (
  SELECT symbol, t,
         CASE WHEN COUNT(close) OVER w5 = 5 THEN
           CASE WHEN MAX(high) OVER w5 = MIN(low) OVER w5 THEN 0.0
                ELSE 100.0 * (close - MIN(low) OVER w5) / (MAX(high) OVER w5 - MIN(low) OVER w5) END
         END AS fastk
  FROM bars
  WINDOW w5 AS {_win(5)}
), sk AS (
  SELECT symbol, t, fastk,
         CASE WHEN COUNT(fastk) OVER w3 = 3 THEN AVG(fastk) OVER w3 END AS slowk
  FROM fk
  WINDOW w3 AS {_win(3)}
)
SELECT symbol, t, ROUND(fastk, 6) AS stoch_fastk, ROUND(slowk, 6) AS stoch_slowk,
       ROUND(CASE WHEN COUNT(slowk) OVER w3 = 3 THEN AVG(slowk) OVER w3 END, 6) AS stoch_slowd
FROM sk
WINDOW w3 AS {_win(3)}
""",
)
def ind_stoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    out = mo.stoch(b, "high", "low", "close", 5, 3, 3, "symbol", "t", "s")
    return out.select(
        *KEY,
        r6(F.col("s_fastk")).alias("stoch_fastk"),
        r6(F.col("s_slowk")).alias("stoch_slowk"),
        r6(F.col("s_slowd")).alias("stoch_slowd"),
    )


@q(
    "vol_ad_obv",
    BARS_CTE
    + f"""
, contrib AS (
  SELECT symbol, t,
         CASE WHEN high = low THEN 0.0
              ELSE ((close - low) - (high - close)) / (high - low) * volume END AS adc,
         CASE WHEN LAG(close) OVER {_ORD} IS NULL THEN volume
              WHEN close > LAG(close) OVER {_ORD} THEN volume
              WHEN close < LAG(close) OVER {_ORD} THEN -volume
              ELSE 0.0 END AS obvc
  FROM bars
)
SELECT symbol, t,
       ROUND(CAST(SUM(CAST(FLOOR(adc * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(38,6))) OVER cw AS DOUBLE), 6) AS ad,
       ROUND(CAST(SUM(CAST(FLOOR(obvc * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(38,6))) OVER cw AS DOUBLE), 6) AS obv
FROM contrib
WINDOW cw AS {_CUM}
""",
)
def vol_ad_obv(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    w = _w()
    return b.select(
        *KEY,
        r6(vu.ad("high", "low", "close", "volume", w, exact=True)).alias("ad"),
        r6(vu.obv("close", "volume", w, exact=True)).alias("obv"),
    )


@q(
    "vol_trange",
    BARS_CTE
    + f"""
SELECT symbol, t,
       ROUND(CASE WHEN LAG(close) OVER o IS NOT NULL THEN
         GREATEST(high - low, ABS(high - LAG(close) OVER o), ABS(low - LAG(close) OVER o))
       END, 6) AS trange
FROM bars
WINDOW o AS {_ORD}
""",
)
def vol_trange(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    return b.select(*KEY, r6(vy.trange("high", "low", "close", _w())).alias("trange"))


# ---------------------------------------------------------------------------
# recurrence indicators (pandas kernels vs recursive-CTE oracles)
# ---------------------------------------------------------------------------


def _rec_query(specs: list[Rec], out_cols: list[str]):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        b = bars(spark, sf_dir)
        out = with_recurrences(b, specs)
        return out.select(*KEY, *[r6(F.col(c)).alias(c) for c in out_cols])

    return fn


QUERIES["ind_ema_20"] = _rec_query([Rec("ema_20", "ema", ["close"], {"p": 20})], ["ema_20"])
ORACLES["ind_ema_20"] = (
    recursive_with(ema_ctes("ema20", "bars", "close", 20))
    + """
SELECT b.symbol, b.t, ROUND(e.ema20, 6) AS ema_20
FROM bars b LEFT JOIN ema20 e ON b.symbol = e.symbol AND b.t = e.t
"""
)

QUERIES["ind_dema_10"] = _rec_query([Rec("dema_10", "dema", ["close"], {"p": 10})], ["dema_10"])
ORACLES["ind_dema_10"] = (
    recursive_with(
        ema_ctes("e1", "bars", "close", 10),
        ema_ctes("e2", "e1", "e1", 10),
    )
    + """
SELECT b.symbol, b.t, ROUND(2.0 * e1.e1 - e2.e2, 6) AS dema_10
FROM bars b
LEFT JOIN e1 ON b.symbol = e1.symbol AND b.t = e1.t
LEFT JOIN e2 ON b.symbol = e2.symbol AND b.t = e2.t
"""
)

QUERIES["ind_tema_10"] = _rec_query([Rec("tema_10", "tema", ["close"], {"p": 10})], ["tema_10"])
ORACLES["ind_tema_10"] = (
    recursive_with(
        ema_ctes("e1", "bars", "close", 10),
        ema_ctes("e2", "e1", "e1", 10),
        ema_ctes("e3", "e2", "e2", 10),
    )
    + """
SELECT b.symbol, b.t, ROUND(3.0 * e1.e1 - 3.0 * e2.e2 + e3.e3, 6) AS tema_10
FROM bars b
LEFT JOIN e1 ON b.symbol = e1.symbol AND b.t = e1.t
LEFT JOIN e2 ON b.symbol = e2.symbol AND b.t = e2.t
LEFT JOIN e3 ON b.symbol = e3.symbol AND b.t = e3.t
"""
)


def _t3_coeffs(v: float) -> tuple[float, float, float, float]:
    return (
        -(v ** 3),
        3.0 * v ** 2 + 3.0 * v ** 3,
        -6.0 * v ** 2 - 3.0 * v - 3.0 * v ** 3,
        1.0 + 3.0 * v + v ** 3 + 3.0 * v ** 2,
    )


_T3C = _t3_coeffs(0.7)

QUERIES["ind_t3_5"] = _rec_query(
    [Rec("t3_5", "t3", ["close"], {"p": 5, "vfactor": 0.7})], ["t3_5"]
)
ORACLES["ind_t3_5"] = (
    recursive_with(
        ema_ctes("e1", "bars", "close", 5),
        ema_ctes("e2", "e1", "e1", 5),
        ema_ctes("e3", "e2", "e2", 5),
        ema_ctes("e4", "e3", "e3", 5),
        ema_ctes("e5", "e4", "e4", 5),
        ema_ctes("e6", "e5", "e5", 5),
    )
    + f"""
SELECT b.symbol, b.t,
       ROUND({_T3C[0]!r} * e6.e6 + {_T3C[1]!r} * e5.e5
           + {_T3C[2]!r} * e4.e4 + {_T3C[3]!r} * e3.e3, 6) AS t3_5
FROM bars b
LEFT JOIN e3 ON b.symbol = e3.symbol AND b.t = e3.t
LEFT JOIN e4 ON b.symbol = e4.symbol AND b.t = e4.t
LEFT JOIN e5 ON b.symbol = e5.symbol AND b.t = e5.t
LEFT JOIN e6 ON b.symbol = e6.symbol AND b.t = e6.t
"""
)

_KAMA_P = 10
_KF, _KS = 2.0 / 3.0, 2.0 / 31.0
QUERIES["ind_kama_10"] = _rec_query([Rec("kama_10", "kama", ["close"], {"p": _KAMA_P})], ["kama_10"])
ORACLES["ind_kama_10"] = (
    recursive_with(
        f"""
kama_base AS MATERIALIZED (
  SELECT symbol, t, close AS x,
         ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY t) AS rn
  FROM bars WHERE close IS NOT NULL
),
kama_er AS MATERIALIZED (
  SELECT symbol, rn, x,
         CASE WHEN rn > {_KAMA_P} THEN
           CASE WHEN vol > 0 THEN ABS(x - xp) / vol ELSE 0.0 END
         END AS er
  FROM (
    SELECT symbol, rn, x,
           LAG(x, {_KAMA_P}) OVER (PARTITION BY symbol ORDER BY rn) AS xp,
           SUM(adx) OVER (PARTITION BY symbol ORDER BY rn
                          ROWS BETWEEN {_KAMA_P - 1} PRECEDING AND CURRENT ROW) AS vol
    FROM (SELECT symbol, rn, x,
                 ABS(x - LAG(x) OVER (PARTITION BY symbol ORDER BY rn)) AS adx
          FROM kama_base) a
  ) bb
),
kama_rec AS (
  SELECT symbol, rn, k FROM (
    SELECT symbol, rn, AVG(x) OVER (PARTITION BY symbol ORDER BY rn
                                    ROWS BETWEEN {_KAMA_P - 1} PRECEDING AND CURRENT ROW) AS k
    FROM kama_base) s WHERE rn = {_KAMA_P}
  UNION ALL
  SELECT e.symbol, e.rn,
         k.k + POWER(e.er * {_KF - _KS!r} + {_KS!r}, 2) * (e.x - k.k)
  FROM kama_rec k JOIN kama_er e ON e.symbol = k.symbol AND e.rn = k.rn + 1
),
kama_out AS MATERIALIZED (
  SELECT b.symbol, b.t, r.k
  FROM kama_base b LEFT JOIN kama_rec r ON b.symbol = r.symbol AND b.rn = r.rn
)"""
    )
    + """
SELECT b.symbol, b.t, ROUND(k.k, 6) AS kama_10
FROM bars b LEFT JOIN kama_out k ON b.symbol = k.symbol AND b.t = k.t
"""
)

_RSI_P = 14
QUERIES["ind_rsi_14"] = _rec_query([Rec("rsi_14", "rsi", ["close"], {"p": _RSI_P})], ["rsi_14"])
ORACLES["ind_rsi_14"] = (
    recursive_with(
        f"""
rsi_base AS MATERIALIZED (
  SELECT symbol, t, d,
         CASE WHEN d > 0 THEN d ELSE 0.0 END AS up,
         CASE WHEN d < 0 THEN -d ELSE 0.0 END AS dn,
         ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY t) AS rn
  FROM (
    SELECT symbol, t, close - LAG(close) OVER (PARTITION BY symbol ORDER BY t) AS d
    FROM bars WHERE close IS NOT NULL
  ) dd WHERE d IS NOT NULL
),
rsi_rec AS (
  SELECT symbol, rn, au, ad FROM (
    SELECT symbol, rn,
           AVG(up) OVER wp AS au, AVG(dn) OVER wp AS ad
    FROM rsi_base
    WINDOW wp AS (PARTITION BY symbol ORDER BY rn ROWS BETWEEN {_RSI_P - 1} PRECEDING AND CURRENT ROW)
  ) s WHERE rn = {_RSI_P}
  UNION ALL
  SELECT b.symbol, b.rn,
         {ewm_step("r.au", "b.up", 1.0 / _RSI_P)},
         {ewm_step("r.ad", "b.dn", 1.0 / _RSI_P)}
  FROM rsi_rec r JOIN rsi_base b ON b.symbol = r.symbol AND b.rn = r.rn + 1
),
rsi_out AS MATERIALIZED (
  SELECT b.symbol, b.t,
         CASE WHEN r.ad = 0 THEN 100.0 ELSE 100.0 * r.au / (r.au + r.ad) END AS rsi
  FROM rsi_base b JOIN rsi_rec r ON b.symbol = r.symbol AND b.rn = r.rn
)"""
    )
    + """
SELECT b.symbol, b.t, ROUND(o.rsi, 6) AS rsi_14
FROM bars b LEFT JOIN rsi_out o ON b.symbol = o.symbol AND b.t = o.t
"""
)

_ATR_P = 14
QUERIES["ind_atr_natr_14"] = _rec_query(
    [
        Rec("atr_14", "atr", ["high", "low", "close"], {"p": _ATR_P}),
        Rec("natr_14", "natr", ["high", "low", "close"], {"p": _ATR_P}),
    ],
    ["atr_14", "natr_14"],
)
ORACLES["ind_atr_natr_14"] = (
    recursive_with(
        f"""
tr_tbl AS MATERIALIZED (
  SELECT symbol, t, close,
         GREATEST(high - low, ABS(high - pc), ABS(low - pc)) AS tr
  FROM (
    SELECT symbol, t, high, low, close,
           LAG(close) OVER (PARTITION BY symbol ORDER BY t) AS pc
    FROM bars
  ) x WHERE pc IS NOT NULL
)""",
        ema_ctes("atrc", "tr_tbl", "tr", _ATR_P, alpha=1.0 / _ATR_P),
    )
    + """
SELECT b.symbol, b.t, ROUND(a.atrc, 6) AS atr_14,
       ROUND(CASE WHEN b.close != 0 THEN 100.0 * a.atrc / b.close ELSE 0.0 END, 6) AS natr_14
FROM bars b LEFT JOIN atrc a ON b.symbol = a.symbol AND b.t = a.t
"""
)

# MACD family: QUANTIZED micro-unit lattice (VERDICT r7 #3). Through round
# 7 these three were the only queries red at sf0.1 (1-ulp FMA drift over
# 20k-step float recurrences landing on 6-dp rounding boundaries — green at
# the sf0.01 driver gate, accepted three rounds running). The renko/zigzag
# integer-state discipline retires the class permanently: close is
# quantized to integer micro-units, the SMA seed and EVERY recurrence step
# re-quantize with floor(x + 0.5) (recurrence._ewma_q / oracle.ema_q_ctes),
# and the outputs are exact BIGINT micro-units — no float state survives a
# step, so drift cannot accumulate at ANY series length. The float `macd`
# kernel remains the package's user-facing surface (bench + numpy parity
# tests still exercise it); these oracle twins pin the engine-exact form.
def _macd_q_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = bars(spark, sf_dir)
    qb = b.select(
        "symbol",
        "t",
        F.floor(F.col("close") * 1000000.0 + F.lit(0.5))
        .cast("double")
        .alias("_cm"),
    )
    out = with_recurrences(
        qb,
        [
            Rec(
                ["macd_dif_micro", "macd_dea_micro", "macd_hist_micro"],
                "macd_q",
                ["_cm"],
                {"fast": 12, "slow": 26, "signal": 9},
            )
        ],
    )
    return out.select(
        *KEY,
        F.col("macd_dif_micro").cast("long").alias("macd_dif_micro"),
        F.col("macd_dea_micro").cast("long").alias("macd_dea_micro"),
        F.col("macd_hist_micro").cast("long").alias("macd_hist_micro"),
    )


QUERIES["ind_macd"] = _macd_q_query
ORACLES["ind_macd"] = (
    recursive_with(
        """
qbars AS MATERIALIZED (
  SELECT symbol, t, FLOOR(close * 1000000.0 + 0.5) AS cm FROM bars
)""",
        ema_q_ctes("qef", "qbars", "cm", 12),
        ema_q_ctes("qes", "qbars", "cm", 26),
        """
dif_tbl AS MATERIALIZED (
  SELECT qef.symbol, qef.t, qef.qef - qes.qes AS dif
  FROM qef JOIN qes ON qef.symbol = qes.symbol AND qef.t = qes.t
)""",
        ema_q_ctes("qdea", "dif_tbl", "dif", 9),
    )
    + """
SELECT b.symbol, b.t,
       CAST(d.dif AS BIGINT) AS macd_dif_micro,
       CAST(s.qdea AS BIGINT) AS macd_dea_micro,
       CAST(d.dif - s.qdea AS BIGINT) AS macd_hist_micro
FROM bars b
LEFT JOIN dif_tbl d ON b.symbol = d.symbol AND b.t = d.t
LEFT JOIN qdea s ON b.symbol = s.symbol AND b.t = s.t
"""
)

QUERIES["ind_trix_30"] = _rec_query([Rec("trix_30", "trix", ["close"], {"p": 30})], ["trix_30"])
ORACLES["ind_trix_30"] = (
    recursive_with(
        ema_ctes("e1", "bars", "close", 30),
        ema_ctes("e2", "e1", "e1", 30),
        ema_ctes("e3", "e2", "e2", 30),
        """
trix_tbl AS MATERIALIZED (
  SELECT symbol, t,
         100.0 * (e3 / LAG(e3) OVER (PARTITION BY symbol ORDER BY t) - 1.0) AS trix
  FROM e3 WHERE e3 IS NOT NULL
)""",
    )
    + """
SELECT b.symbol, b.t, ROUND(x.trix, 6) AS trix_30
FROM bars b LEFT JOIN trix_tbl x ON b.symbol = x.symbol AND b.t = x.t
"""
)

# Pull in the extension surface (DMI family, SAR, stochastic variants,
# patterns, pipeline ops) — registers into the same dicts.
import polars_quant_spark.queries_ext  # noqa: E402,F401
import polars_quant_spark.queries_tpch  # noqa: E402,F401
import polars_quant_spark.queries_patterns  # noqa: E402,F401
import polars_quant_spark.queries_pipeline  # noqa: E402,F401

# Manually-registered oracles bypass the @q decorator — normalize all
# ROUND(x, 6) to the deterministic FLOOR form in one sweep (idempotent).
for _name in list(ORACLES):
    ORACLES[_name] = floor_rounds(ORACLES[_name])


@q(
    "rel_q6_forecast_revenue",
    """
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
""",
)
def rel_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + scalar aggregate — every predicate
    pushes to the parquet scan; a global sum grows with the dataset, so the
    quantized long partials merge in decimal (see rel_q1 / merge_micros)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .groupBy(F.spark_partition_id().alias("_p"))
        .agg(
            F.sum(micros(F.col("l_extendedprice") * F.col("l_discount"))).alias("_rev"),
            F.count(F.lit(1)).alias("_n"),
        )
        .agg(
            units(merge_micros(F.col("_rev"))).alias("revenue"),
            F.sum("_n").alias("n"),
        )
    )


@q(
    "rel_q10_returned_items",
    """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def rel_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue by customer, top 20."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    na = load_table(spark, sf_dir, "nation")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)  # SF-scaled: no forced hint
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        # per-customer revenue is bounded (fixed orders/customer in TPC-H),
        # so single-level long micro-unit sums are overflow-safe at any SF
        .agg(
            units(
                F.sum(micros(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@q(
    "rel_q4_priority_semi",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def rel_q4_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → left-semi join): orders in a window with at
    least one returned lineitem, counted by priority. The semi join never
    materializes lineitem columns — Spark's LeftSemi hash join emits each
    order at most once and the probe side carries only l_orderkey (the
    returnflag filter pushes to the scan), so the shuffle is keys-only.
    (The driver lineitem has no commit/receipt dates; l_returnflag='R'
    stands in for the late-delivery EXISTS predicate — same plan shape.)
    Reference parity: relational scan/filter surface, SURVEY §2.2-2.3."""
    od = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        od.join(li, od.o_orderkey == li.l_orderkey, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@q(
    "rel_q22_inactive_anti",
    """
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       ROUND(CAST(SUM(CAST(FLOOR(c_acctbal * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / COUNT(*), 6) AS avg_bal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def rel_q22_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (NOT EXISTS → left-anti join): customers with no
    order since the cutoff, by market segment. LeftAnti is the only
    distributed shape that answers NOT EXISTS without materializing the
    non-matches: the orders side is pre-filtered at the scan and reduced to
    its key column, and each customer row is emitted iff its hash-bucket
    probe finds nothing. The avg is exact across engines because both sum
    integer micro-units (association-order-free) before one double divide."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "leftanti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            round6(
                units(F.sum(micros(F.col("c_acctbal")))) / F.count(F.lit(1))
            ).alias("avg_bal"),
        )
        .orderBy("c_mktsegment")
    )


reorder_registration()
