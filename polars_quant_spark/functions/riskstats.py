"""Per-symbol risk / market-structure statistics (round-8 promotions).

These four were query-local compositions in ``queries_ext.py`` through
round 7 (each driver-green as `bars_rolling_beta`, `bars_sortino`,
`bars_variance_ratio`, `bars_hurst`); promoted here so package users get
them as first-class entry points — the same discipline as the round-7
trend/momentum promotions. Each function keeps the plan shape of its
query-local form bit-for-bit (golden hash SAME per promotion): returns are
quantized to integer micro-units BEFORE any moment sum, so every window or
group aggregate is an exact association-free integer and the final ratio
is one identical double expression on any engine.

No reference kernel exists for these (they extend the surface of
/root/reference/src/talib/); semantics follow the standard published
definitions (rolling CAPM beta; Sortino 1980s downside-risk ratio;
Lo & MacKinlay 1988 variance ratio; Hurst via the aggregated-variance
method)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# All squared / cross-product moment sums below accumulate in
# decimal(38,0), never plain long (ADVICE r8): a quantized return for an
# extreme price jump is ~1e9 micro-units, so one long*long product is
# ~1e18 — within one step of silently wrapping Int64. hurst always did
# this; the cast is now uniform across the module.
_DEC = "decimal(38,0)"


def _no_collisions(outs: list[str], keys: list[str], internals: list[str]) -> None:
    """Reject only collisions that can actually occur (ADVICE r8): these
    functions build narrow explicit selects, so arbitrary input columns
    never flow through — the only hazards are an output alias or a
    hard-coded internal alias matching one of the key columns that are
    selected alongside it."""
    bad_out = [o for o in outs if o in keys]
    if bad_out:
        raise ValueError(
            f"output column(s) {bad_out} collide with the key column(s) "
            f"{keys}; pass a different out="
        )
    bad_int = [i for i in internals if i in keys]
    if bad_int:
        raise ValueError(
            f"key column(s) {bad_int} collide with internal aliases this "
            "function hard-codes; rename the partition_by/order_by column"
        )


def _qret(close: str, o) -> Column:
    """Simple return quantized to integer micro-units."""
    return F.floor(
        (F.col(close) / F.lag(close).over(o) - F.lit(1.0)) * 1000000.0
        + F.lit(0.5)
    ).cast("long")


def _qlogret(close: str, o) -> Column:
    """Log return quantized to integer micro-units (caller must have
    filtered close > 0)."""
    return F.floor(
        F.log(F.col(close) / F.lag(close).over(o)) * 1e6 + F.lit(0.5)
    ).cast("long")


def rolling_beta(
    df: DataFrame,
    close: str = "close",
    p: int = 60,
    partition_by: str = "symbol",
    order_by: str = "t",
    out: str = "beta",
) -> DataFrame:
    """Rolling ``p``-bar beta of each key against the equal-weight market
    return (the time-varying systematic-exposure measure). Returns
    (partition_by, order_by, out) rows where the window is full and the
    market variance is positive. Two exchanges: the per-``order_by``
    market collapse, then the per-key window. The per-t market frame
    carries NO broadcast hint (it grows with history — AQE decides)."""
    _no_collisions(
        [out], [partition_by, order_by], ["qr", "qm", "_n", "_c", "_v"]
    )
    o = Window.partitionBy(partition_by).orderBy(order_by)
    rr = df.select(
        partition_by, order_by, _qret(close, o).alias("qr")
    ).where(F.col("qr").isNotNull())
    mkt = rr.groupBy(order_by).agg(
        F.floor(F.sum("qr").cast("double") / F.count(F.lit(1)) + F.lit(0.5))
        .cast("long")
        .alias("qm")
    )
    j = rr.join(mkt, order_by)
    wf = Window.partitionBy(partition_by).orderBy(order_by).rowsBetween(
        -(p - 1), 0
    )
    n = F.count(F.lit(1)).over(wf)
    s_am = F.sum(F.col("qr").cast(_DEC) * F.col("qm")).over(wf)
    s_a = F.sum("qr").over(wf)
    s_m = F.sum("qm").over(wf)
    s_mm = F.sum(F.col("qm").cast(_DEC) * F.col("qm")).over(wf)
    cov = (
        s_am.cast("double") / 1e12
        - (s_a.cast("double") / 1e6) * (s_m.cast("double") / 1e6) / n
    )
    var = (
        s_mm.cast("double") / 1e12
        - (s_m.cast("double") / 1e6) * (s_m.cast("double") / 1e6) / n
    )
    return (
        j.select(
            partition_by,
            order_by,
            n.alias("_n"),
            cov.alias("_c"),
            var.alias("_v"),
        )
        .where((F.col("_n") == p) & (F.col("_v") > 0))
        .select(
            partition_by, order_by, (F.col("_c") / F.col("_v")).alias(out)
        )
    )


def sortino(
    df: DataFrame,
    close: str = "close",
    partition_by: str = "symbol",
    order_by: str = "t",
) -> DataFrame:
    """Per-key Sortino ratio (zero target): mean return over downside
    deviation. Returns one row per key with ``mean_ret`` /
    ``downside_dev`` / ``sortino`` (unrounded; NULL sortino when there are
    no losses). Integer micro² moment sums keep the stats engine-exact."""
    _no_collisions(
        ["mean_ret", "downside_dev", "sortino"], [partition_by], ["qr"]
    )
    o = Window.partitionBy(partition_by).orderBy(order_by)
    r = df.select(partition_by, _qret(close, o).alias("qr")).where(
        F.col("qr").isNotNull()
    )
    neg2 = F.sum(
        F.when(F.col("qr") < 0, F.col("qr").cast(_DEC) * F.col("qr"))
        .otherwise(F.lit(0).cast(_DEC))
    )
    n = F.count(F.lit(1))
    mean_ret = F.sum("qr").cast("double") / 1e6 / n
    ddev = F.sqrt(neg2.cast("double") / 1e12 / n)
    return r.groupBy(partition_by).agg(
        mean_ret.alias("mean_ret"),
        ddev.alias("downside_dev"),
        F.when(neg2 > 0, mean_ret / ddev).alias("sortino"),
    )


def variance_ratio(
    df: DataFrame,
    close: str = "close",
    q: int = 5,
    partition_by: str = "symbol",
    order_by: str = "t",
    out: str = "vr",
) -> DataFrame:
    """Lo–MacKinlay variance ratio VR(q) per key: population variance of
    overlapping q-bar log-return sums over q× the 1-bar variance (≈1
    random walk, >1 momentum, <1 mean reversion). One row per key,
    ``out`` NULL when degenerate. One window pass + one aggregate."""
    _no_collisions(
        [out],
        [partition_by, order_by],
        ["qlr", "qq", "n1", "a1", "b1", "nq", "aq", "bq"],
    )
    b = df.where(F.col(close) > 0)
    o = Window.partitionBy(partition_by).orderBy(order_by)
    r = b.select(
        partition_by, order_by, _qlogret(close, o).alias("qlr")
    ).where(F.col("qlr").isNotNull())
    w = Window.partitionBy(partition_by).orderBy(order_by).rowsBetween(
        -(q - 1), 0
    )
    qq = F.when(F.count("qlr").over(w) == q, F.sum("qlr").over(w))
    a = r.select(partition_by, "qlr", qq.alias("qq"))
    s = a.groupBy(partition_by).agg(
        F.count("qlr").alias("n1"),
        F.sum("qlr").alias("a1"),
        F.sum(F.col("qlr").cast(_DEC) * F.col("qlr")).alias("b1"),
        F.count("qq").alias("nq"),
        F.sum("qq").alias("aq"),
        F.sum(F.col("qq").cast(_DEC) * F.col("qq")).alias("bq"),
    )
    v1 = F.col("b1").cast("double") / F.col("n1") - (
        F.col("a1").cast("double") / F.col("n1")
    ) * (F.col("a1").cast("double") / F.col("n1"))
    vq = F.col("bq").cast("double") / F.col("nq") - (
        F.col("aq").cast("double") / F.col("nq")
    ) * (F.col("aq").cast("double") / F.col("nq"))
    ok = (F.col("n1") > 0) & (F.col("nq") > 0) & (v1 > 0)
    return s.select(
        partition_by, F.when(ok, vq / (float(q) * v1)).alias(out)
    )


def hurst(
    df: DataFrame,
    close: str = "close",
    partition_by: str = "symbol",
    order_by: str = "t",
    out: str = "hurst",
    weights: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """Hurst exponent per key (aggregated-variance method over horizons
    1/2/4/8/16): ~0.5 random walk, >0.5 trending, <0.5 mean-reverting.
    ``weights`` are the fixed log-log regression weights for horizons
    (1, 2, 8, 16); the default is the least-squares slope weights over
    log(1,2,4,8,16) that the `bars_hurst` oracle pins (the x-values are
    constants so the regression collapses to fixed weights with Σw = 0 —
    the unit scale cancels and variances stay in raw micro² units). One
    window pass (all horizons share the key exchange), one hash aggregate
    of exact integer moments, then the fixed-weight log-log slope."""
    if weights is None:
        weights = (
            -0.28853900817779266,
            -0.14426950408889633,
            0.14426950408889633,
            0.28853900817779266,
        )
    _no_collisions(
        [out], [partition_by, order_by], ["qlr", "q2", "q4", "q8", "q16"]
    )
    b = df.where(F.col(close) > 0)
    o = Window.partitionBy(partition_by).orderBy(order_by)
    r = b.select(
        partition_by, order_by, _qlogret(close, o).alias("qlr")
    ).where(F.col("qlr").isNotNull())

    def qsum(p: int):
        w = Window.partitionBy(partition_by).orderBy(order_by).rowsBetween(
            -(p - 1), 0
        )
        return F.when(F.count("qlr").over(w) == p, F.sum("qlr").over(w))

    a = r.select(
        partition_by,
        "qlr",
        qsum(2).alias("q2"),
        qsum(4).alias("q4"),
        qsum(8).alias("q8"),
        qsum(16).alias("q16"),
    )
    dec = "decimal(38,0)"
    aggs = []
    for name, tag in (
        ("qlr", "1"), ("q2", "2"), ("q4", "4"), ("q8", "8"), ("q16", "16")
    ):
        aggs += [
            F.count(name).alias(f"n{tag}"),
            F.sum(name).alias(f"a{tag}"),
            F.sum(F.col(name).cast(dec) * F.col(name)).alias(f"b{tag}"),
        ]
    s = a.groupBy(partition_by).agg(*aggs).where(F.col("n16") > 0)

    def var(tag: str):
        n = F.col(f"n{tag}")
        return F.col(f"b{tag}").cast("double") / n - (
            F.col(f"a{tag}").cast("double") / n
        ) * (F.col(f"a{tag}").cast("double") / n)

    v1, v2, v8, v16 = var("1"), var("2"), var("8"), var("16")
    w1, w2, w8, w16 = weights
    h = F.when(
        (v1 > 0) & (v2 > 0) & (v8 > 0) & (v16 > 0),
        0.5
        * (
            (F.lit(w1) * F.log(v1) + F.lit(w2) * F.log(v2))
            + F.lit(w8) * F.log(v8)
            + F.lit(w16) * F.log(v16)
        ),
    )
    return s.select(partition_by, h.alias(out))
