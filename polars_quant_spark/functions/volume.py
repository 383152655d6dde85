"""Volume indicators (SURVEY.md §2.5 Volume).

Corrected semantics per SURVEY.md §0 — we implement the documented TA-Lib
contract, not the reference's snapshot bugs:

* OBV sign: reference adds volume on a price *drop*
  (/root/reference/src/talib/volume.rs:81-92, inverted diff) — we add on a rise.
* AD when high==low: reference emits 0.0 (/root/reference/src/talib/volume.rs:113-116);
  we treat the bar's contribution as 0 and keep emitting the running sum.
* ADOSC: reference double-accumulates AD (/root/reference/src/talib/volume.rs:48-66);
  ours is EMA(AD,fast) − EMA(AD,slow) — see operators.recurrence.adosc (EMA leg).

All cumulative sums are unbounded-preceding window sums — single shuffle on
the partition key, codegen'd running aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F

from polars_quant_spark.functions._util import cumulative, dcol, require_absent


def clv_flow(high: Column | str, low: Column | str, close: Column | str, volume: Column | str) -> Column:
    """Per-bar Chaikin money-flow contribution: CLV·vol, 0 on flat bars."""
    h, l, c, v = dcol(high), dcol(low), dcol(close), dcol(volume)
    clv = ((c - l) - (h - c)) / (h - l)
    return F.when(h == l, F.lit(0.0)).otherwise(clv * v)


def ad(
    high: Column | str,
    low: Column | str,
    close: Column | str,
    volume: Column | str,
    w: WindowSpec = None,
    exact: bool = False,
) -> Column:
    """Chaikin A/D line: running sum of CLV·vol (volume.rs:100-125).

    ``exact=True`` quantizes each bar's contribution to 6 decimals (the
    deterministic floor-round) and accumulates in DECIMAL(38,6) — the running
    total is then bit-reproducible across engines and partitionings (long
    cumulative float sums drift by ~1 ulp·√n otherwise, and a raw
    double→decimal cast still disagrees on dyadic half-boundaries)."""
    from polars_quant_spark.functions._util import round6

    contrib = clv_flow(high, low, close, volume)
    if exact:
        return (
            F.sum(round6(contrib).cast("decimal(38,6)")).over(cumulative(w)).cast("double")
        )
    return F.sum(contrib).over(cumulative(w))


def obv_flow(close: Column | str, volume: Column | str, w: WindowSpec = None) -> Column:
    """Per-bar OBV contribution: ±volume by close direction, +volume on the
    first bar (TA-Lib seed), 0 on flat closes."""
    c, v = dcol(close), dcol(volume)
    prev = F.lag(c).over(w)
    return (
        F.when(prev.isNull(), v)
        .when(c > prev, v)
        .when(c < prev, -v)
        .otherwise(F.lit(0.0))
    )


def obv(
    close: Column | str,
    volume: Column | str,
    w: WindowSpec = None,
    exact: bool = False,
) -> Column:
    """On-balance volume: running ±volume by close direction; the first bar
    contributes +volume (TA-Lib seed), flat closes contribute 0
    (volume.rs:69-96, sign corrected per SURVEY §0)."""
    contrib = obv_flow(close, volume, w)
    if exact:
        from polars_quant_spark.functions._util import round6

        return (
            F.sum(round6(contrib).cast("decimal(38,6)")).over(cumulative(w)).cast("double")
        )
    return F.sum(contrib).over(cumulative(w))


def klinger(
    df,
    high: str = "high",
    low: str = "low",
    close: str = "close",
    volume: str = "volume",
    fast: int = 34,
    slow: int = 55,
    partition_by: str = "symbol",
    order_by: str = "t",
    out: str = "kvo",
):
    """Klinger-style volume oscillator: EMA(fast) − EMA(slow) of
    trend-signed volume force (typical-price direction × volume) — volume
    pressure with the long/short EMA pair run in ONE batched recurrence
    pass (same chained-EMA contract as MACD/ADOSC). Promoted in round 7
    from the query-local composition behind `ind_klinger`; adds ``out``
    (NULL while either EMA warms up). Volume is half-up rounded to an
    integer before signing so both engines agree bit-for-bit on the
    force stream."""
    from pyspark.sql import Window

    require_absent(df, out, "_kvo_vf", "_kvo_f", "_kvo_s")

    from polars_quant_spark.operators.recurrence import Rec, with_recurrences

    o = Window.partitionBy(partition_by).orderBy(order_by)
    tp = F.col(high) + F.col(low) + F.col(close)
    sgn = (
        F.when(tp > F.lag(tp).over(o), 1)
        .when(tp < F.lag(tp).over(o), -1)
        .otherwise(0)
    )
    vf = (F.floor(F.col(volume) + F.lit(0.5)).cast("long") * sgn).cast("double")
    rec = with_recurrences(
        df.select("*", vf.alias("_kvo_vf")),
        [
            Rec("_kvo_f", "ema", ["_kvo_vf"], {"p": fast}),
            Rec("_kvo_s", "ema", ["_kvo_vf"], {"p": slow}),
        ],
        partition_by=partition_by,
        order_by=order_by,
    )
    return rec.select(
        *df.columns, (F.col("_kvo_f") - F.col("_kvo_s")).alias(out)
    )
