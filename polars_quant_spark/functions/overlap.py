"""Overlap studies — the Column-expression subset (SURVEY.md §2.5).

SMA/WMA/TRIMA/BBANDS/MIDPOINT/MIDPRICE are single-window aggregations and stay
entirely in Spark's codegen'd window exec. The recurrence family (EMA, DEMA,
TEMA, T3, KAMA, MAMA, SAR, SAREXT, MAVP) lives in
``polars_quant_spark.operators.recurrence`` as pandas kernels — those have no
closed-form SQL window (SURVEY.md §4.2 item 1).

Reference kernels: /root/reference/src/talib/overlap.rs (SMA :871-937,
WMA :1328-1399, TRIMA :1313-1326, BBANDS :46-116, MIDPOINT :180-278,
MIDPRICE :281-404).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F

from polars_quant_spark.functions._util import dcol, guarded, trailing, wdot


def sma(x: Column | str, p: int = 30, w: WindowSpec = None) -> Column:
    """Trailing mean; NULL until the frame holds p values (overlap.rs:871-937)."""
    x = dcol(x)
    return guarded(F.avg(x).over(trailing(w, p)), x, p, w)


def wma(x: Column | str, p: int = 30, w: WindowSpec = None) -> Column:
    """Linearly-weighted MA: weights 1..p over the trailing window, divided by
    p(p+1)/2 (overlap.rs:1328-1399). Window dot-product via higher-order fns."""
    x = dcol(x)
    weights = [float(i) for i in range(1, p + 1)]
    denom = p * (p + 1) / 2.0
    return guarded(wdot(x, p, w, weights) / F.lit(denom), x, p, w)


def trima(x: Column | str, p: int = 30, w: WindowSpec = None) -> Column:
    """Triangular MA = SMA(SMA(x, p1), p2) with the reference's odd/even split
    (overlap.rs:1313-1326): odd p → p1 = p2 = (p+1)/2 = ceil(p/2);
    even p → inner p/2+1, outer p/2. Expressed as one fused window dot-product
    with triangular weights — algebraically identical, single window pass."""
    x = dcol(x)
    if p % 2 == 1:
        p1 = p2 = (p + 1) // 2
    else:
        p1, p2 = p // 2 + 1, p // 2
    # Convolution of two box filters of lengths p1 and p2 → triangular weights
    # over a window of length p1 + p2 - 1 == p.
    total = p1 + p2 - 1
    weights = [0.0] * total
    for i in range(p2):
        for j in range(p1):
            weights[i + j] += 1.0
    norm = float(p1 * p2)
    return guarded(wdot(x, total, w, weights) / F.lit(norm), x, total, w)


def bbands(
    x: Column | str,
    p: int = 20,
    nbdevup: float = 2.0,
    nbdevdn: float = 2.0,
    w: WindowSpec = None,
) -> tuple[Column, Column, Column]:
    """Bollinger bands (upper, middle, lower) using population σ
    (overlap.rs:100-106 uses E[x²]−μ²)."""
    x = dcol(x)
    frame = trailing(w, p)
    mid = F.avg(x).over(frame)
    sd = F.stddev_pop(x).over(frame)
    upper = guarded(mid + nbdevup * sd, x, p, w)
    middle = guarded(mid, x, p, w)
    lower = guarded(mid - nbdevdn * sd, x, p, w)
    return upper, middle, lower


def midpoint(x: Column | str, p: int = 14, w: WindowSpec = None) -> Column:
    """(rolling max + rolling min)/2 (overlap.rs:180-278)."""
    x = dcol(x)
    frame = trailing(w, p)
    return guarded((F.max(x).over(frame) + F.min(x).over(frame)) / 2.0, x, p, w)


def midprice(high: Column | str, low: Column | str, p: int = 14, w: WindowSpec = None) -> Column:
    """(rolling max(high) + rolling min(low))/2 (overlap.rs:281-404)."""
    h, l = dcol(high), dcol(low)
    frame = trailing(w, p)
    return guarded((F.max(h).over(frame) + F.min(l).over(frame)) / 2.0, h, p, w)


def ma(
    df,
    x: str,
    p: int = 30,
    matype: int = 0,
    partition_by: str = "symbol",
    order_by: str = "t",
    out: str = "ma",
):
    """MA dispatcher (overlap.rs:146-153,857-869): 0=SMA, 1=EMA, 2=WMA,
    3=DEMA, 4=TEMA, 5=TRIMA, 6=KAMA, 7=MAMA, 8=T3.

    DataFrame-level because half the types are recurrences: expression types
    (0/2/5) attach a Column; recurrence types route through the runner."""
    from pyspark.sql import Window

    from polars_quant_spark.operators.recurrence import Rec, with_recurrences

    w = Window.partitionBy(partition_by).orderBy(order_by)
    if matype == 0:
        return df.withColumn(out, sma(x, p, w))
    if matype == 2:
        return df.withColumn(out, wma(x, p, w))
    if matype == 5:
        return df.withColumn(out, trima(x, p, w))
    kernel = {1: "ema", 3: "dema", 4: "tema", 6: "kama", 8: "t3"}.get(matype)
    if kernel is not None:
        return with_recurrences(df, [Rec(out, kernel, [x], {"p": p})], partition_by, order_by)
    if matype == 7:
        import polars_quant_spark.operators.hilbert  # noqa: F401 (registers mama)

        return with_recurrences(
            df, [Rec([out, f"{out}_fama"], "mama", [x], {})], partition_by, order_by
        )
    raise ValueError(f"unknown matype {matype}")
