"""Momentum indicators — Column-expression subset (SURVEY.md §2.5).

Wilder-smoothed indicators (RSI, ADX/ADXR/DX, ±DI/±DM, ATR) and EMA-based ones
(MACD, TRIX, APO/PPO with EMA legs) live in ``operators.recurrence``.

Reference kernels: /root/reference/src/talib/momentum.rs; compositions from
/root/reference/python/polars_quant/talib/momentum.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from polars_quant_spark.functions._util import dcol, guarded, trailing


def mom(x: Column | str, p: int = 10, w: WindowSpec = None) -> Column:
    """x − x[t−p] (momentum.rs:383-397)."""
    x = dcol(x)
    return x - F.lag(x, p).over(w)


def roc(x: Column | str, p: int = 10, w: WindowSpec = None) -> Column:
    """100·(x−x₋ₚ)/x₋ₚ (momentum.rs:438-453); NULL when x₋ₚ = 0 (ANSI-safe)."""
    x = dcol(x)
    prev = F.lag(x, p).over(w)
    return F.when(prev != 0, 100.0 * (x - prev) / prev)


def rocp(x: Column | str, p: int = 10, w: WindowSpec = None) -> Column:
    """(x−x₋ₚ)/x₋ₚ (momentum.rs:455-470)."""
    x = dcol(x)
    prev = F.lag(x, p).over(w)
    return F.when(prev != 0, (x - prev) / prev)


def rocr(x: Column | str, p: int = 10, w: WindowSpec = None) -> Column:
    """x/x₋ₚ (momentum.rs:472-487)."""
    x = dcol(x)
    prev = F.lag(x, p).over(w)
    return F.when(prev != 0, x / prev)


def rocr100(x: Column | str, p: int = 10, w: WindowSpec = None) -> Column:
    """100·x/x₋ₚ (momentum.rs:489-504)."""
    x = dcol(x)
    prev = F.lag(x, p).over(w)
    return F.when(prev != 0, 100.0 * x / prev)


def bop(open: Column | str, high: Column | str, low: Column | str, close: Column | str) -> Column:
    """(c−o)/(h−l), 0 when h==l (momentum.rs:112-135)."""
    o, h, l, c = dcol(open), dcol(high), dcol(low), dcol(close)
    return F.when(h == l, F.lit(0.0)).otherwise((c - o) / (h - l))


def willr(high: Column | str, low: Column | str, close: Column | str, p: int = 14, w: WindowSpec = None) -> Column:
    """−100·(HHV−c)/(HHV−LLV); 0 when the range is flat (momentum.rs:629-662)."""
    h, l, c = dcol(high), dcol(low), dcol(close)
    frame = trailing(w, p)
    hhv = F.max(h).over(frame)
    llv = F.min(l).over(frame)
    expr = F.when(hhv == llv, F.lit(0.0)).otherwise(-100.0 * (hhv - c) / (hhv - llv))
    return guarded(expr, c, p, w)


def cmo(x: Column | str, p: int = 14, w: WindowSpec = None) -> Column:
    """100·(Σup−Σdn)/(Σup+Σdn) over the trailing p diffs (momentum.rs:180-223);
    0 when there was no movement at all."""
    x = dcol(x)
    diff = x - F.lag(x).over(w)
    frame = trailing(w, p)
    up = F.sum(F.when(diff > 0, diff).otherwise(F.lit(0.0))).over(frame)
    dn = F.sum(F.when(diff < 0, -diff).otherwise(F.lit(0.0))).over(frame)
    expr = F.when(up + dn == 0, F.lit(0.0)).otherwise(100.0 * (up - dn) / (up + dn))
    return guarded(expr, diff, p, w)


def ultosc(
    high: Column | str,
    low: Column | str,
    close: Column | str,
    p1: int = 7,
    p2: int = 14,
    p3: int = 28,
    w: WindowSpec = None,
) -> Column:
    """Ultimate oscillator: 100·(4·A₁+2·A₂+A₃)/7 with Aₖ = ΣBP/ΣTR over pₖ
    (momentum.rs:571-627). BP = c − min(l, prev_c); TR = max(h, prev_c) −
    min(l, prev_c)."""
    h, l, c = dcol(high), dcol(low), dcol(close)
    prev_c = F.lag(c).over(w)
    bp = c - F.least(l, prev_c)
    tr = F.greatest(h, prev_c) - F.least(l, prev_c)

    def avg_ratio(p: int) -> Column:
        frame = trailing(w, p)
        str_ = F.sum(tr).over(frame)
        return F.when(str_ != 0, F.sum(bp).over(frame) / str_)

    expr = 100.0 * (4.0 * avg_ratio(p1) + 2.0 * avg_ratio(p2) + avg_ratio(p3)) / 7.0
    return guarded(expr, bp, p3, w)


def mfi(
    high: Column | str,
    low: Column | str,
    close: Column | str,
    volume: Column | str,
    p: int = 14,
    w: WindowSpec = None,
) -> Column:
    """Money flow index: 100·Σ⁺flow/(Σ⁺flow+Σ⁻flow) over trailing p, flow =
    typical price × volume signed by ΔTP (momentum.rs:285-342); 100 when there
    is no negative flow."""
    h, l, c, v = dcol(high), dcol(low), dcol(close), dcol(volume)
    tp = (h + l + c) / 3.0
    dtp = tp - F.lag(tp).over(w)
    flow = tp * v
    frame = trailing(w, p)
    pos = F.sum(F.when(dtp > 0, flow).otherwise(F.lit(0.0))).over(frame)
    neg = F.sum(F.when(dtp < 0, flow).otherwise(F.lit(0.0))).over(frame)
    expr = F.when(pos + neg == 0, F.lit(0.0)).otherwise(100.0 * pos / (pos + neg))
    return guarded(expr, dtp, p, w)


def cci(high: Column | str, low: Column | str, close: Column | str, p: int = 14, w: WindowSpec = None) -> Column:
    """(TP − SMA(TP)) / (0.015 · mean|TP−SMA|) (momentum.rs:137-178); 0 when
    the mean deviation is 0. Mean absolute deviation needs the window *values*
    (not just moments) → collect_list + higher-order aggregate, still JVM-side."""
    h, l, c = dcol(high), dcol(low), dcol(close)
    tp = (h + l + c) / 3.0
    frame = trailing(w, p)
    mean = F.avg(tp).over(frame)
    lst = F.collect_list(tp).over(frame)
    md = F.aggregate(lst, F.lit(0.0), lambda acc, v: acc + F.abs(v - mean)) / float(p)
    expr = F.when(md == 0, F.lit(0.0)).otherwise((tp - mean) / (0.015 * md))
    return guarded(expr, tp, p, w)


def aroon(
    high: Column | str,
    low: Column | str,
    p: int = 14,
    w: WindowSpec = None,
    t: Column | str = "t",
) -> tuple[Column, Column]:
    """Aroon (down, up): 100·(p − bars since extreme)/p over a window of p+1
    bars [i−p, i] (momentum.rs:69-110). Ties resolve to the most recent bar.

    Argmax-in-window via the struct-max trick: max(struct(value, t)) orders by
    value then t — pure window agg, no UDF. ``t`` is a monotonically increasing
    bar index within the partition (bars() provides it)."""
    h, l, tcol = dcol(high), dcol(low), dcol(t)
    frame = trailing(w, p + 1)
    t_of_max = F.max(F.struct(h.alias("v"), tcol.alias("t"))).over(frame).getField("t")
    t_of_min = F.min(F.struct(l.alias("v"), (-tcol).alias("nt"))).over(frame).getField("nt")
    up = 100.0 * (p - (tcol - t_of_max)) / p
    dn = 100.0 * (p - (tcol + t_of_min)) / p
    return guarded(dn, h, p + 1, w), guarded(up, h, p + 1, w)


def aroonosc(high: Column | str, low: Column | str, p: int = 14, w: WindowSpec = None, t: Column | str = "t") -> Column:
    """aroon_up − aroon_down (wrapper momentum.py:136-141, kernel absent —
    status M; semantics from the TA-Lib contract)."""
    dn, up = aroon(high, low, p, w, t)
    return up - dn


def apo(x: Column | str, fast: int = 12, slow: int = 26, w: WindowSpec = None) -> Column:
    """Absolute price oscillator, matype=0 (SMA legs): MA(fast) − MA(slow).
    Wrapper momentum.py:25-30; kernel absent from the snapshot (status M)."""
    from polars_quant_spark.functions.overlap import sma

    return sma(x, fast, w) - sma(x, slow, w)


def ppo(x: Column | str, fast: int = 12, slow: int = 26, w: WindowSpec = None) -> Column:
    """Percentage price oscillator: 100·(MAf−MAs)/MAs (momentum.py:136-141)."""
    from polars_quant_spark.functions.overlap import sma

    s = sma(x, slow, w)
    return F.when(s != 0, 100.0 * (sma(x, fast, w) - s) / s)


def stoch(
    df: DataFrame,
    high: str = "high",
    low: str = "low",
    close: str = "close",
    fastk_period: int = 5,
    slowk_period: int = 3,
    slowd_period: int = 3,
    partition_by: str = "symbol",
    order_by: str = "t",
    prefix: str = "stoch",
) -> DataFrame:
    """Slow stochastic (momentum.py:178-186 composition): fastK = 100·(c−LLV)/
    (HHV−LLV); slowK = SMA(fastK, slowk); slowD = SMA(slowK, slowd). MA type
    fixed to SMA (matype=0, the reference default). DataFrame-level because the
    SMA legs window over a derived column."""
    from polars_quant_spark.functions.overlap import sma

    w = Window.partitionBy(partition_by).orderBy(order_by)
    h, l, c = dcol(high), dcol(low), dcol(close)
    frame = trailing(w, fastk_period)
    hhv, llv = F.max(h).over(frame), F.min(l).over(frame)
    fastk = F.when(hhv == llv, F.lit(0.0)).otherwise(100.0 * (c - llv) / (hhv - llv))
    df = df.withColumn(f"{prefix}_fastk", guarded(fastk, c, fastk_period, w))
    df = df.withColumn(f"{prefix}_slowk", sma(f"{prefix}_fastk", slowk_period, w))
    df = df.withColumn(f"{prefix}_slowd", sma(f"{prefix}_slowk", slowd_period, w))
    return df


def stochf(
    df: DataFrame,
    high: str = "high",
    low: str = "low",
    close: str = "close",
    fastk_period: int = 5,
    fastd_period: int = 3,
    partition_by: str = "symbol",
    order_by: str = "t",
    prefix: str = "stochf",
) -> DataFrame:
    """Fast stochastic (momentum.py:188-195): fastK plus fastD = SMA(fastK)."""
    from polars_quant_spark.functions.overlap import sma

    w = Window.partitionBy(partition_by).orderBy(order_by)
    h, l, c = dcol(high), dcol(low), dcol(close)
    frame = trailing(w, fastk_period)
    hhv, llv = F.max(h).over(frame), F.min(l).over(frame)
    fastk = F.when(hhv == llv, F.lit(0.0)).otherwise(100.0 * (c - llv) / (hhv - llv))
    df = df.withColumn(f"{prefix}_fastk", guarded(fastk, c, fastk_period, w))
    df = df.withColumn(f"{prefix}_fastd", sma(f"{prefix}_fastk", fastd_period, w))
    return df


def stochrsi(
    df: DataFrame,
    close: str = "close",
    timeperiod: int = 14,
    fastk_period: int = 5,
    fastd_period: int = 3,
    partition_by: str = "symbol",
    order_by: str = "t",
    prefix: str = "stochrsi",
) -> DataFrame:
    """Stochastic RSI (reference python/polars_quant/talib/momentum.py:197-205):
    STOCHF's fastK/fastD applied to RSI(timeperiod) instead of price —
    fastK = 100·(RSI − LLV(RSI)) / (HHV(RSI) − LLV(RSI)), fastD =
    SMA(fastK, fastd_period). MA type fixed to SMA (matype=0, the reference
    default). DataFrame-level because the RSI leg is a Wilder recurrence
    (batched applyInPandas, one pass per key) and the stochastic legs
    window over that derived column; the windows all share the per-key
    exchange the recurrence already established."""
    from polars_quant_spark.functions.overlap import sma
    from polars_quant_spark.operators.recurrence import Rec, with_recurrences

    w = Window.partitionBy(partition_by).orderBy(order_by)
    rsi_col = f"{prefix}_rsi"
    df = with_recurrences(
        df,
        [Rec(rsi_col, "rsi", [close], {"p": timeperiod})],
        partition_by=partition_by,
        order_by=order_by,
    )
    r = dcol(rsi_col)
    frame = trailing(w, fastk_period)
    hhv, llv = F.max(r).over(frame), F.min(r).over(frame)
    fastk = F.when(hhv == llv, F.lit(0.0)).otherwise(100.0 * (r - llv) / (hhv - llv))
    df = df.withColumn(f"{prefix}_fastk", guarded(fastk, r, fastk_period, w))
    df = df.withColumn(f"{prefix}_fastd", sma(f"{prefix}_fastk", fastd_period, w))
    return df.drop(rsi_col)
