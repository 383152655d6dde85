"""Extended TPC-H-shape relational surface (q7/q8/q11/q14/q15/q16/q17/q18/
q19/q21 adapted to the driver schema — no partsupp table, no commit/receipt
dates; substitutions are noted per query and keep the *plan shape* that makes
each TPC-H query interesting: multi-join star chains, conditional aggregates,
scalar-subquery thresholds, correlated-average join-backs, agg-filtered semi
joins, disjunctive pushdown, exists/not-exists composition).

Reference parity: the reference's relational/query surface is its Polars
lazy-frame pipeline (scan → filter → join → group_by → sort, README.md:40-98);
these queries exercise the same algebra Spark-first. All money sums follow the
house micro-unit convention (see queries.py docstring) so cross-engine hashes
are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from polars_quant_spark.functions._util import round6 as r6
from polars_quant_spark.queries import merge_micros, micros, q, units
from polars_quant_spark.sources.bars import load_table

_REV_SQL = "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 1000000.0 + 0.5) AS BIGINT)"


def _rev_micros() -> F.Column:
    return micros(F.col("l_extendedprice") * (1 - F.col("l_discount")))


@q(
    "rel_q7_nation_volume",
    f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(rev) AS DOUBLE) / 1000000.0 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
         {_REV_SQL} AS rev
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def rel_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.

    Plan: the two nation filters prune supplier/customer *before* their
    joins (each side keeps ~1/25 of rows), nation broadcasts, and the only
    large shuffles are lineitem↔orders and the pre-filtered customer probe.
    The disjunctive nation-pair predicate is applied post-join on the two
    small dimension columns — Catalyst pushes the single-nation halves into
    each branch via constraint propagation where possible."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    na = load_table(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    su = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(na.where(F.col("n_name").isin(pair))),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cu = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(na.where(F.col("n_name").isin(pair))),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(units(F.sum(_rev_micros())).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@q(
    "rel_q8_market_share",
    f"""
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN rev ELSE 0 END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         {_REV_SQL} AS rev,
         n2.n_name AS nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
)
def rel_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's market share inside one region/part-type
    market, by order year — the conditional-aggregate-over-a-star query.

    Plan: part is filtered to one p_type before its join (broadcastable
    after the filter at driver SFs; AQE decides), region+nation broadcast,
    and the share is two micro-unit sums in ONE aggregate pass (a CASE
    inside the sum, not two scans). The customer-side region filter prunes
    via the broadcast dim chain customer→nation→region."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY").select("p_partkey")
    od = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cu = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    su = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    rev = _rev_micros()
    return (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("nation") == "NATION_3", rev).otherwise(F.lit(0))).alias("_nat"),
            F.sum(rev).alias("_all"),
        )
        .select(
            "o_year",
            r6(F.col("_nat").cast("double") / F.col("_all").cast("double")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@q(
    "rel_q11_important_parts",
    f"""
WITH pv AS (
  SELECT l_partkey, SUM({_REV_SQL}) AS value_m
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(value_m AS DOUBLE) / 1000000.0 AS part_value
FROM pv
WHERE value_m * (SELECT COUNT(*) FROM pv) > (SELECT SUM(value_m) FROM pv)
ORDER BY part_value DESC, l_partkey
LIMIT 50
""",
)
def rel_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds a fraction of the
    GLOBAL total — the scalar-subquery-threshold query. (No partsupp table
    in the driver schema; lineitem revenue per part stands in for
    ps_supplycost·ps_availqty. Same shape: agg → global scalar → filter.)

    The cut is above-AVERAGE value (value·n > Σvalue, cross-multiplied
    INTEGER micro-units — exact on both engines, and scale-free: TPC-H's
    fixed 0.0001·SF fraction goes vacuous when every one of ~2000·SF parts
    holds ~1/n of an evenly-spread synthetic total, which is exactly what
    happened to the old 0.001 cut at sf0.01 — a 0-row driver window entry).

    Plan: ONE shuffle builds the per-part values; the global (total, n)
    scalar is a second tiny agg over those partials, broadcast back as a
    1-row join — the per-part frame is never re-scanned from parquet
    (Spark reuses the shuffle output across both consumers) and never
    re-shuffled. Top-k is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(_rev_micros()).alias("_vm"))
    total = pv.agg(
        merge_micros(F.col("_vm")).alias("_tot"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        pv.join(F.broadcast(total))
        .where(F.col("_vm").cast("decimal(38,0)") * F.col("_n") > F.col("_tot"))
        .select("l_partkey", units(F.col("_vm")).alias("part_value"))
        .orderBy(F.col("part_value").desc(), F.col("l_partkey"))
        .limit(50)
    )


@q(
    "rel_q14_promo_share",
    f"""
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
             / CAST(SUM({_REV_SQL}) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
""",
)
def rel_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one ship month — the
    conditional-aggregate ratio query.

    Plan: the month filter pushes to the lineitem scan (row-group pruning
    on l_shipdate at scale), part joins on the filtered remainder (p_type
    is the only part column read), and both sums come out of one aggregate
    pass. Global sums → two-level micro-unit merge."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    pa = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev_micros()
    return (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .groupBy(F.spark_partition_id().alias("_p"))
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias("_promo"),
            F.sum(rev).alias("_all"),
        )
        .agg(
            merge_micros(F.col("_promo")).alias("_pm"),
            merge_micros(F.col("_all")).alias("_am"),
        )
        .select(
            r6(
                F.lit(100.0) * F.col("_pm").cast("double") / F.col("_am").cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@q(
    "rel_q15_top_supplier",
    f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM({_REV_SQL}) AS DOUBLE) / 1000000.0 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def rel_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue —
    the scalar-subquery-max query (ties kept, hence no LIMIT 1).

    Plan: one shuffle for per-supplier revenue; the max is a tiny agg over
    those partials broadcast back as a 1-row equality join (same
    shuffle-reuse shape as rel_q11); supplier attaches by key afterwards —
    at most a handful of rows reach that join's left side, so it
    broadcasts the winners, not the supplier table. Revenue equality is
    exact because both engines quantized to micro-units first."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        units(F.sum(_rev_micros())).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    winners = rev.join(F.broadcast(mx), rev.total_revenue == F.col("_mx")).select(
        "supplier_no", "total_revenue"
    )
    return (
        su.join(F.broadcast(winners), su.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@q(
    "rel_q16_supplier_counts",
    """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 30
""",
)
def rel_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each surviving
    (brand, type, size) bucket. (No partsupp table; the observed distinct
    (l_partkey, l_suppkey) pairs in lineitem stand in for it.)

    Plan: COUNT(DISTINCT) is rewritten as two stacked exact aggregates —
    distinct pairs on the shuffle key, then distinct (group, suppkey), then
    a plain count — so no Expand node and every level map-side combines.
    The part filter lands before the join and prunes to three columns."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    pa = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(30)
    )


@q(
    "rel_q17_small_qty_revenue",
    """
SELECT ROUND(CAST(SUM(CAST(FLOOR(l_extendedprice * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / 7.0, 6) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS agg_partkey, 0.2 * AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey) pa
  ON agg_partkey = l_partkey
WHERE p_brand = 'Brand#5' AND p_type = 'SMALL'
  AND l_quantity < avg_qty
""",
)
def rel_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-average-quantity orders of one
    brand's small parts — the correlated-average subquery, decorrelated as
    an aggregate join-back (the only distributed form: the per-part average
    joins back to the detail rows by key instead of re-running per row).

    Plan: two shuffles on the same key (detail, per-part avg) hash-join
    without a third exchange; the brand/type filter reduces the join's part
    side to a broadcastable sliver. avg_qty stays double — both engines
    compute 0.2·AVG identically (sum/count in doubles, same order within a
    key after the shuffle? no: AVG is order-sensitive — here each part's
    group is small and both engines sum doubles ascending-key-free; the
    predicate compares strictly below, and quantities are integral halves,
    so boundary drift cannot flip the comparison)."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#5") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    # decimal-exact AVG: micro-unit sum / count, so association order can't
    # drift the 0.2·avg threshold between engines
    avg = li.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        (
            F.lit(0.2)
            * (units(F.sum(micros(F.col("l_quantity")))) / F.count(F.lit(1)))
        ).alias("avg_qty")
    )
    return (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .join(avg, li.l_partkey == F.col("agg_partkey"))
        .where(F.col("l_quantity") < F.col("avg_qty"))
        .groupBy()
        .agg(
            r6(units(F.sum(micros(F.col("l_extendedprice")))) / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@q(
    "rel_q18_large_orders",
    """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       ROUND(SUM(l_quantity), 6) AS sum_qty
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def rel_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders (IN → agg-filtered left-semi
    join) with their customers, top 20 by price.

    Plan: the HAVING aggregate runs once on (orderkey), its survivors form
    a small keys-only frame that SEMI-joins lineitem before the wide joins
    — the classic reduce-early shape (quantity sums are integral in TPC-H
    so the >150 cut is exact); orders/customer attach afterwards; top-k is
    TakeOrderedAndProject, no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(micros(F.col("l_quantity"))).alias("_q"))
        .where(units(F.col("_q")) > 150.0)
        .select(F.col("l_orderkey").alias("_bigkey"))
    )
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(big, li.l_orderkey == F.col("_bigkey"), "leftsemi")
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(r6(units(F.sum(micros(F.col("l_quantity"))))).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@q(
    "rel_q19_disjunctive_revenue",
    f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) / 1000000.0 AS revenue,
       COUNT(*) AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""",
)
def rel_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs over both join sides — the disjunctive
    pushdown query.

    Plan: Catalyst splits the disjunction into per-side implied filters
    (p_brand IN (…) AND p_size ≤ 35 on part; l_quantity BETWEEN 1 AND 30 on
    lineitem) that push to both scans BEFORE the join, then re-checks the
    exact residual post-join — the textbook reason to write this
    declaratively instead of unioning three hand-built branches."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(pa, li.l_partkey == pa.p_partkey)
    qt = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & qt.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & qt.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & qt.between(20, 30))
    )
    return (
        j.where(cond)
        .groupBy(F.spark_partition_id().alias("_p"))
        .agg(F.sum(_rev_micros()).alias("_r"), F.count(F.lit(1)).alias("_n"))
        .agg(units(merge_micros(F.col("_r"))).alias("revenue"), F.sum("_n").alias("n"))
    )


@q(
    "rel_q21_sole_returner",
    """
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret
  FROM lineitem GROUP BY l_orderkey
),
culprit AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN per_order p ON l.l_orderkey = p.l_orderkey
  WHERE l.l_returnflag = 'R' AND p.n_supp > 1 AND p.n_ret = 1
)
SELECT s_name, COUNT(*) AS numwait
FROM culprit JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def rel_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE offender inside
    multi-supplier orders — the exists/not-exists double-correlation query.
    (No commit/receipt dates in the driver schema; l_returnflag='R' stands
    in for "failed to deliver on time".)

    The two correlated subqueries (EXISTS another supplier; NOT EXISTS
    another *offending* supplier) decorrelate into ONE per-order aggregate
    — n_supp > 1 ∧ n_ret = 1 — instead of two self-joins of lineitem;
    the offender set then joins back by (orderkey, R). That turns TPC-H's
    most join-heavy query into two shuffles on l_orderkey (which hash-join
    without a third exchange) plus a 100-row supplier broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret"),
    )
    culprit = (
        li.where(F.col("l_returnflag") == "R")
        .join(
            per_order.where((F.col("n_supp") > 1) & (F.col("n_ret") == 1)),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    # supplier scales with SF — no forced hint; AQE broadcasts while it fits
    return (
        culprit.join(su, culprit.l_suppkey == su.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@q(
    "rel_price_percentiles",
    """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
       ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def rel_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (p50/p90/p99 of extended price by return
    flag). Spark `percentile` and DuckDB `quantile_cont` share the
    linear-interpolation definition, so the outputs are engine-exact at
    6 dp. Scale note: exact percentiles sort within each group — the
    per-group memory is the group's rows, acceptable for bounded group
    counts; the unbounded-cardinality path is sketch.sampled_quantiles
    (deterministic sample, same SQL contract)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            r6(F.expr("percentile(l_extendedprice, 0.5)")).alias("p50"),
            r6(F.expr("percentile(l_extendedprice, 0.9)")).alias("p90"),
            r6(F.expr("percentile(l_extendedprice, 0.99)")).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "rel_unpivot_measures",
    """
SELECT l_orderkey, l_linenumber, measure, ROUND(val, 6) AS val
FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
  FROM lineitem WHERE l_orderkey % 997 = 0
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
  FROM lineitem WHERE l_orderkey % 997 = 0
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount
  FROM lineitem WHERE l_orderkey % 997 = 0
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'tax', l_tax
  FROM lineitem WHERE l_orderkey % 997 = 0
) u
""",
)
def rel_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long melt) of the four lineitem measures via Spark's
    native ``unpivot`` — ONE scan emitting 4 rows per input row (the plan
    is a single Expand node), versus the UNION-ALL twin's four scans.
    The complement of the pivot in loader_wide_pivot; §2.2 reshaping
    surface."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 997 == 0)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "_v",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.regexp_replace("measure", "^l_", "").alias("measure"),
        r6(F.col("_v")).alias("val"),
    )


@q(
    "rel_q9_profit",
    """
SELECT nation, o_year,
       CAST(SUM(amount_m) AS DOUBLE) / 1000000.0 AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(FLOOR((l_extendedprice * (1 - l_discount) - p_retailprice * 0.01 * l_quantity)
                    * 1000000.0 + 0.5) AS BIGINT) AS amount_m
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def rel_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    matching a name pattern. (No partsupp: ps_supplycost is proxied as 1%
    of p_retailprice — the join/agg shape is what matters.)

    Plan: the p_name LIKE filter prunes part before its join; supplier and
    nation chain as broadcasts behind it (AQE-chosen for supplier);
    lineitem↔orders is the one large shuffle. Profit per row mixes two
    measures — quantized to micro-units BEFORE the group sums, so the
    nation×year totals are association-free integers on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = load_table(spark, sf_dir, "nation")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = micros(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.lit(0.01) * F.col("l_quantity")
    )
    return (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(units(F.sum(amount)).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@q(
    "rel_q13_custdist",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def rel_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of order counts per customer,
    INCLUDING zero-order customers — the left-outer + double-aggregate
    query (an inner join would silently drop the empty customers, which is
    the point of the shape).

    Plan: one shuffle joins customer to the pre-filtered orders, one
    per-customer count, then a tiny second agg over counts. COUNT(col)
    (not COUNT(*)) gives unmatched customers 0 on both engines."""
    cu = load_table(spark, sf_dir, "customer").select("c_custkey")
    od = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@q(
    "rel_q20_excess_shippers",
    """
WITH part_total AS (
  SELECT l_partkey, SUM(CAST(FLOOR(l_quantity * 1000000.0 + 0.5) AS BIGINT)) AS tot_m
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_partkey
),
supp_part AS (
  SELECT l_suppkey, l.l_partkey,
         SUM(CAST(FLOOR(l_quantity * 1000000.0 + 0.5) AS BIGINT)) AS sq_m
  FROM lineitem l
  JOIN part ON p_partkey = l.l_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l.l_partkey
)
SELECT DISTINCT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM supp_part JOIN part_total ON supp_part.l_partkey = part_total.l_partkey
  WHERE CAST(sq_m AS DOUBLE) > 0.2 * CAST(tot_m AS DOUBLE)
)
ORDER BY s_suppkey
""",
)
def rel_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped an outsized share (>20%) of
    some promo part's annual volume — the nested-aggregate-threshold semi
    chain. (No partsupp availqty; the supplier's own shipped share proxies
    "excess stock". Same shape: agg → threshold vs a second agg → IN →
    semi join to the supplier dimension.)

    Plan: both aggregates shuffle lineitem on compatible keys (partkey /
    (suppkey, partkey)); the threshold comparison is a small agg↔agg join;
    supplier attaches by LeftSemi — never materializing the qualifying
    pairs. Quantity shares compare quantized integers cast to double, so
    the 0.2 cut is engine-exact."""
    date_lo = F.lit("1997-01-01 00:00:00").cast("timestamp")
    date_hi = F.lit("1998-01-01 00:00:00").cast("timestamp")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= date_lo) & (F.col("l_shipdate") < date_hi)
    )
    part_total = li.groupBy("l_partkey").agg(
        F.sum(micros(F.col("l_quantity"))).alias("tot_m")
    )
    pa = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    supp_part = (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(micros(F.col("l_quantity"))).alias("sq_m"))
    )
    qualifying = (
        supp_part.join(part_total, "l_partkey")
        .where(F.col("sq_m").cast("double") > 0.2 * F.col("tot_m").cast("double"))
        .select("l_suppkey")
    )
    su = load_table(spark, sf_dir, "supplier")
    return (
        su.join(qualifying, su.s_suppkey == qualifying.l_suppkey, "leftsemi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@q(
    "rel_q2_min_cost_supplier",
    """
WITH ps AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
cand AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name
  FROM ps
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size = 9 AND p_type = 'SMALL' AND r_name = 'EUROPE'
),
best AS (
  SELECT p_partkey, MIN(struct_pack(a := s_acctbal, b := s_suppkey)) AS m
  FROM cand GROUP BY p_partkey
)
SELECT c.p_partkey, c.p_brand, c.s_suppkey, c.s_name,
       ROUND(c.s_acctbal, 6) AS s_acctbal, c.n_name
FROM cand c JOIN best b
  ON c.p_partkey = b.p_partkey
 AND c.s_acctbal = (b.m).a AND c.s_suppkey = (b.m).b
ORDER BY c.s_acctbal, c.p_partkey
LIMIT 20
""",
)
def rel_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per part, the best supplier in a region — the
    correlated scalar-subquery (MIN per group) decorrelated as an
    aggregate join-back. (No partsupp: observed (partkey, suppkey) pairs
    from lineitem stand in for it, and MIN s_acctbal — with suppkey as the
    deterministic tie-break — stands in for MIN ps_supplycost. TPC-H picks
    MAX acctbal among min-cost suppliers; the driver proxy collapses both
    levels into one ordered min, keeping the decorrelation shape.)

    Plan: the distinct pair frame shuffles once on the pair; part's
    size/type filter prunes before the join; the per-part argmin is
    min(struct) — no window, no sort — joined back by (part, min) equality.
    Dimension chain broadcasts."""
    ps = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    pa = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 9) & (F.col("p_type") == "SMALL")
    ).select("p_partkey", "p_brand")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    cand = (
        ps.join(pa, ps.l_partkey == pa.p_partkey)
        .join(su, ps.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .select("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    best = cand.groupBy(F.col("p_partkey").alias("_pk")).agg(
        F.min(F.struct(F.col("s_acctbal").alias("a"), F.col("s_suppkey").alias("b"))).alias("m")
    )
    return (
        cand.join(
            best,
            (cand.p_partkey == F.col("_pk"))
            & (cand.s_acctbal == F.col("m.a"))
            & (cand.s_suppkey == F.col("m.b")),
        )
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            r6(F.col("s_acctbal")).alias("s_acctbal"),
            "n_name",
        )
        .orderBy("s_acctbal", "p_partkey")
        .limit(20)
    )


@q(
    "rel_q12_priority_counts",
    """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def rel_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional priority counts per line status.
    (No shipmode/commit/receipt columns; l_linestatus stands in for
    shipmode and the ship-year window for the late-delivery filter — the
    join + dual-conditional-count shape is intact.)

    Plan: the date filter pushes to the lineitem scan, the keys-only
    orders side joins on orderkey, and both counts come from ONE aggregate
    pass (CASE inside SUM)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@q(
    "rel_cube_revenue",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
""",
)
def rel_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) — all four grouping sets in one
    pass (Expand node ×4 lanes). Same two-level quantized composition as
    rel_rollup_revenue: the cube runs on the tiny per-partition partials
    frame, so the Expand multiplies partials, not the fact table."""
    from polars_quant_spark.queries import merge_micros, micros, units

    li = load_table(spark, sf_dir, "lineitem")
    partials = li.groupBy(
        "l_returnflag", "l_linestatus", F.spark_partition_id().alias("_p")
    ).agg(
        F.sum(micros(F.col("l_extendedprice"))).alias("_rev"),
        F.count(F.lit(1)).alias("_n"),
    )
    return partials.cube("l_returnflag", "l_linestatus").agg(
        units(merge_micros(F.col("_rev"))).alias("revenue"),
        F.sum("_n").alias("n"),
    )


@q(
    "rel_window_family",
    """
WITH s AS (
  SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice
  FROM lineitem WHERE l_orderkey % 499 = 0
)
SELECT l_orderkey, l_linenumber, l_returnflag,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
       ROUND(NTH_VALUE(l_extendedprice, 3) OVER
             (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey, l_linenumber
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS third_lowest,
       ROUND(COALESCE(LAG(l_extendedprice, 2) OVER w, -1.0), 6) AS lag2
FROM s
WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey, l_linenumber)
""",
)
def rel_window_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic window-function family beyond the rank trio:
    PERCENT_RANK / CUME_DIST / NTILE / NTH_VALUE (running frame) /
    offset LAG with default — one partition spec, one sort, ties broken
    by the unique (orderkey, linenumber) pair so every function is
    deterministic cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 499 == 0
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        r6(F.percent_rank().over(w)).alias("pct_rank"),
        r6(F.cume_dist().over(w)).alias("cume"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        r6(F.nth_value("l_extendedprice", 3).over(wf)).alias("third_lowest"),
        r6(F.coalesce(F.lag("l_extendedprice", 2).over(w), F.lit(-1.0))).alias("lag2"),
    )


@q(
    "rel_market_basket",
    """
WITH items AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
),
n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
brand_cnt AS (SELECT p_brand, COUNT(*) AS c FROM items GROUP BY p_brand),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS cab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
)
SELECT p.brand_a, p.brand_b, p.cab,
       ROUND((CAST(p.cab AS DOUBLE) / n.n)
             / ((CAST(ca.c AS DOUBLE) / n.n) * (CAST(cb.c AS DOUBLE) / n.n)), 6) AS lift
FROM pairs p
JOIN brand_cnt ca ON ca.p_brand = p.brand_a
JOIN brand_cnt cb ON cb.p_brand = p.brand_b
CROSS JOIN n_orders n
WHERE p.cab >= 20
ORDER BY lift DESC, p.brand_a, p.brand_b
LIMIT 20
""",
)
def rel_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift over brands co-purchased in one order — the
    association-rule primitive. The pair fan-out self-joins the DISTINCT
    (order, brand) frame on the order key — bounded by basket size, never
    a cross join — and the lift expression tree is identical on both
    engines."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pa = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = items.agg(F.countDistinct("l_orderkey").alias("n"))
    brand_cnt = items.groupBy("p_brand").agg(F.count(F.lit(1)).alias("c"))
    a = items.select(F.col("l_orderkey").alias("_o"), F.col("p_brand").alias("brand_a"))
    b = items.select(F.col("l_orderkey").alias("_o2"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, (F.col("_o") == F.col("_o2")) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("cab"))
        .where(F.col("cab") >= 20)
    )
    ca = brand_cnt.select(F.col("p_brand").alias("brand_a"), F.col("c").alias("ca"))
    cb = brand_cnt.select(F.col("p_brand").alias("brand_b"), F.col("c").alias("cb"))
    lift = (F.col("cab").cast("double") / F.col("n")) / (
        (F.col("ca").cast("double") / F.col("n"))
        * (F.col("cb").cast("double") / F.col("n"))
    )
    return (
        pairs.join(ca, "brand_a")
        .join(cb, "brand_b")
        .join(F.broadcast(n_orders))
        .select("brand_a", "brand_b", "cab", r6(lift).alias("lift"))
        .orderBy(F.col("lift").desc(), "brand_a", "brand_b")
        .limit(20)
    )


@q(
    "rel_repeat_purchase_curve",
    """
WITH ranked AS (
  SELECT o_custkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS nth
  FROM orders
),
cnt AS (SELECT nth, COUNT(*) AS n_customers FROM ranked GROUP BY nth),
base AS (SELECT n_customers AS n1 FROM cnt WHERE nth = 1)
SELECT c.nth, c.n_customers,
       ROUND(CAST(c.n_customers AS DOUBLE) / b.n1, 6) AS retention
FROM cnt c CROSS JOIN base b
WHERE c.nth <= 10
ORDER BY c.nth
""",
)
def rel_repeat_purchase_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase curve: how many customers reach their Nth order and
    the retention ratio vs first-time buyers — the lifecycle funnel every
    commerce team tracks. One rank window + a tiny count + a 1-row
    broadcast base."""
    od = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = od.select(F.row_number().over(w).alias("nth"))
    cnt = ranked.groupBy("nth").agg(F.count(F.lit(1)).alias("n_customers"))
    base = cnt.where(F.col("nth") == 1).select(F.col("n_customers").alias("n1"))
    return (
        cnt.join(F.broadcast(base))
        .where(F.col("nth") <= 10)
        .select(
            "nth",
            "n_customers",
            r6(F.col("n_customers").cast("double") / F.col("n1")).alias("retention"),
        )
        .orderBy("nth")
    )


@q(
    "rel_supplier_hhi",
    f"""
WITH sr AS (
  SELECT l_suppkey, SUM({_REV_SQL}) AS rev_m
  FROM lineitem GROUP BY l_suppkey
),
tot AS (SELECT SUM(rev_m) AS t FROM sr)
SELECT COUNT(*) AS n_suppliers,
       ROUND(SUM(POWER(CAST(rev_m AS DOUBLE) / t, 2)) * 10000.0, 6) AS hhi
FROM sr CROSS JOIN tot
""",
)
def rel_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration (Herfindahl–Hirschman index × 10⁴) over
    revenue shares — the dependency-risk scalar. One revenue aggregate, a
    1-row total broadcast, and a squared-share sum; shares derive from
    integer micro-unit revenues so both engines square identical
    doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    sr = li.groupBy("l_suppkey").agg(F.sum(_rev_micros()).alias("rev_m"))
    tot = sr.agg(F.sum("rev_m").alias("t"))
    share2 = F.pow(F.col("rev_m").cast("double") / F.col("t"), F.lit(2.0))
    return (
        sr.join(F.broadcast(tot))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            r6(F.sum(share2) * 10000.0).alias("hhi"),
        )
    )


@q(
    "rel_nation_trade_balance",
    f"""
WITH sells AS (
  SELECT s_nationkey AS nk, SUM({_REV_SQL}) AS sell_m
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  GROUP BY s_nationkey
),
buys AS (
  SELECT c_nationkey AS nk, SUM({_REV_SQL}) AS buy_m
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  GROUP BY c_nationkey
)
SELECT n_name,
       CAST(COALESCE(s.sell_m, 0) AS DOUBLE) / 1000000.0 AS sold,
       CAST(COALESCE(b.buy_m, 0) AS DOUBLE) / 1000000.0 AS bought,
       CAST(COALESCE(s.sell_m, 0) - COALESCE(b.buy_m, 0) AS DOUBLE) / 1000000.0 AS balance
FROM nation
LEFT JOIN sells s ON s.nk = n_nationkey
LEFT JOIN buys b ON b.nk = n_nationkey
ORDER BY n_name
""",
)
def rel_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation trade balance: revenue earned as supplier minus spend as
    customer — two independent star aggregates full-joined onto the
    nation dimension (nations with no activity keep zeros)."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sells = (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("_nk_s"))
        .agg(F.sum(_rev_micros()).alias("sell_m"))
    )
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    buys = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .groupBy(F.col("c_nationkey").alias("_nk_b"))
        .agg(F.sum(_rev_micros()).alias("buy_m"))
    )
    na = load_table(spark, sf_dir, "nation")
    sold = F.coalesce(F.col("sell_m"), F.lit(0)).cast("double") / 1e6
    bought = F.coalesce(F.col("buy_m"), F.lit(0)).cast("double") / 1e6
    bal = (
        F.coalesce(F.col("sell_m"), F.lit(0)) - F.coalesce(F.col("buy_m"), F.lit(0))
    ).cast("double") / 1e6
    return (
        na.join(sells, na.n_nationkey == F.col("_nk_s"), "left")
        .join(buys, na.n_nationkey == F.col("_nk_b"), "left")
        .select("n_name", sold.alias("sold"), bought.alias("bought"), bal.alias("balance"))
        .orderBy("n_name")
    )


@q(
    "rel_order_size_hist",
    """
WITH sizes AS (
  SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY l_orderkey
)
SELECT n_lines, COUNT(*) AS n_orders
FROM sizes GROUP BY n_lines ORDER BY n_lines
""",
)
def rel_order_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines-per-order distribution — the basket-size histogram (the
    double-aggregate shape of q13 without the dimension join)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .groupBy("n_lines")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("n_lines")
    )


@q(
    "rel_customer_ltv_deciles",
    """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(FLOOR(o_totalprice * 1000000.0 + 0.5) AS BIGINT)) AS sp_m
  FROM orders GROUP BY o_custkey
),
dec AS (
  SELECT o_custkey, sp_m,
         NTILE(10) OVER (ORDER BY sp_m DESC, o_custkey) AS decile
  FROM spend
)
SELECT decile,
       COUNT(*) AS n_customers,
       CAST(SUM(sp_m) AS DOUBLE) / 1000000.0 AS total_spend,
       ROUND(CAST(SUM(sp_m) AS DOUBLE)
             / (SELECT CAST(SUM(sp_m) AS DOUBLE) FROM spend), 6) AS spend_share
FROM dec
GROUP BY decile
ORDER BY decile
""",
)
def rel_customer_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value deciles: spend per decile and each decile's
    share of total — the whale curve behind revenue concentration. One
    customer aggregate, one rank window, a scalar broadcast share."""
    od = load_table(spark, sf_dir, "orders")
    spend = od.groupBy("o_custkey").agg(
        F.sum(micros(F.col("o_totalprice"))).alias("sp_m")
    )
    dec = spend.select(
        "sp_m",
        F.ntile(10)
        .over(Window.orderBy(F.col("sp_m").desc(), "o_custkey"))
        .alias("decile"),
    )
    tot = spend.agg(F.sum("sp_m").alias("_t"))
    return (
        dec.groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n_customers"), F.sum("sp_m").alias("_s"))
        .join(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            (F.col("_s").cast("double") / 1e6).alias("total_spend"),
            r6(F.col("_s").cast("double") / F.col("_t").cast("double")).alias(
                "spend_share"
            ),
        )
        .orderBy("decile")
    )


# Keep the driver's 50-slot capture window intact regardless of which query
# module was the import entry point (see queries.reorder_registration).
from polars_quant_spark.queries import reorder_registration as _ro  # noqa: E402

_ro()
