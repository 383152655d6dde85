"""Cross-symbol portfolio rebalancing backtest.

The reference's engines replay ONE asset per capital pool (independent
pools, README.md:402-407); a portfolio engine needs cross-symbol state
(one cash balance, S share counts) and so cannot ride the per-symbol fold.
The distributed decomposition used here:

1. **Holdings change only at rebalance points.** Between them the share
   vector is constant, so the sequential fold touches ONLY the sampled
   price matrix (n_rebalances × S rows — every-th bar per symbol), which is
   bounded by calendar × universe, not by data volume. That tiny frame
   folds in one `applyInPandas` group.
2. **The equity curve is a join, not a fold.** Daily equity = cash(rb) +
   Σ shares(rb)·price(t), computed by joining the broadcast holdings
   schedule back to the full bar stream on (rb, symbol) and aggregating
   per t — fully distributed, one shuffle on t.

Cross-engine exactness: the fold accumulates value/spent in sorted-symbol
order with plain double adds (the SQL twin writes the identical left-
associated chain over pivoted symbol columns); curve sums quantize each
shares·price term to integer micro-units before adding.

Symbols whose histories are shorter than the longest one would make the
grid ragged; the engine cuts the curve at the shortest symbol's last bar
(N_min) so every t has the full cross-section.
"""

from __future__ import annotations

from math import floor

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

_SCHED_SCHEMA = StructType(
    [
        StructField("rb", LongType()),
        StructField("symbol", StringType()),
        StructField("shares", DoubleType()),
        StructField("cash", DoubleType()),
    ]
)


def rebalance_schedule(
    sampled: DataFrame,
    weights: dict[str, float],
    initial_capital: float = 100_000.0,
    symbol: str = "symbol",
    price: str = "close",
    cost_bps: float = 0.0,
    score: str | None = None,
) -> DataFrame:
    """Fold the sampled (rb, symbol, price) matrix into the holdings
    schedule: at each rebalance point, portfolio value is marked to the
    point's prices and shares are re-targeted to floor(value·w/price);
    the integer-share remainder stays in cash. ``cost_bps`` charges
    turnover — Σ|Δshares|·price · bps/10⁴ — against cash AFTER the
    re-target (costs don't feed back into the same point's sizing; the
    next rebalance sees the reduced value). One bounded pandas group.

    ``score``: name of a per-(rb, symbol) column in ``sampled`` holding a
    raw allocation score (e.g. inverse vol); weights become
    score/Σscores per point (ordered sum — the twin's exact chain) and
    ``weights`` is ignored for sizing (its KEYS still fix the universe
    when provided)."""
    syms = sorted(weights) if weights is not None else None
    w = [float(weights[s]) for s in syms] if weights is not None else None
    rate = float(cost_bps) / 10000.0
    dynamic = score is not None

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["rb", symbol], kind="mergesort")
        ss = syms if syms is not None else sorted(pdf[symbol].unique())
        shares = {s: 0.0 for s in ss}
        cash = initial_capital
        out = []
        for rb, g in pdf.groupby("rb", sort=True):
            px = dict(zip(g[symbol], g[price]))
            value = cash
            for s in ss:  # ordered adds — the SQL twin's exact chain
                value += shares[s] * px[s]
            if dynamic:
                sc = dict(zip(g[symbol], g[score]))
                sumw = 0.0
                for s in ss:
                    sumw += sc[s]
            spent = 0.0
            turn = 0.0
            prev = dict(shares)
            for i, s in enumerate(ss):
                wi = (sc[s] / sumw) if dynamic else w[i]
                shares[s] = float(floor((value * wi) / px[s]))
                spent += shares[s] * px[s]
            for s in ss:
                turn += abs(shares[s] - prev[s]) * px[s]
            cash = value - spent - turn * rate
            for s in ss:
                out.append((int(rb), s, shares[s], cash))
        return pd.DataFrame(out, columns=["rb", "symbol", "shares", "cash"])

    cols = [F.col("rb"), F.col(symbol).alias("symbol"), F.col(price).alias(price)]
    if dynamic:
        cols.append(F.col(score).alias(score))
    return (
        sampled.select(*cols)
        .groupBy(F.lit(0).alias("_g"))
        .applyInPandas(lambda _, pdf: fold(pdf), schema=_SCHED_SCHEMA)
    )


def rebalance_backtest(
    df: DataFrame,
    weights: dict[str, float],
    every: int = 21,
    initial_capital: float = 100_000.0,
    symbol: str = "symbol",
    t: str = "t",
    price: str = "close",
    cost_bps: float = 0.0,
) -> DataFrame:
    """Periodic fixed-weight rebalancing over a keyed bar frame whose ``t``
    is a dense per-symbol 1-based bar index (the bars() contract). Returns
    the daily portfolio curve (t, cash, equity).

    Scale: the only data-volume-sized work is one broadcast join of the
    holdings schedule to the bar stream plus a groupBy(t) — the sequential
    part touches n_rebalances × S rows regardless of corpus size."""
    syms = sorted(weights)
    b = df.where(F.col(symbol).isin(syms)).select(symbol, t, price)
    nmin = b.groupBy(symbol).agg(F.max(t).alias("_n")).agg(F.min("_n").alias("_nmin"))
    b = b.join(F.broadcast(nmin)).where(F.col(t) <= F.col("_nmin"))
    rb = ((F.col(t) - 1) / every).cast("long").alias("rb")
    sampled = b.where((F.col(t) - 1) % every == 0).select(rb, symbol, price)
    sched = rebalance_schedule(
        sampled, weights, initial_capital, symbol=symbol, price=price,
        cost_bps=cost_bps,
    )
    mic = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("long")  # noqa: E731
    joined = b.withColumn("rb", rb).join(F.broadcast(sched), ["rb", symbol])
    return (
        joined.groupBy(t)
        .agg(
            F.max(mic(F.col("cash"))).alias("_cash_m"),
            F.sum(mic(F.col("shares") * F.col(price))).alias("_hold_m"),
        )
        .select(
            t,
            (F.col("_cash_m").cast("double") / 1e6).alias("cash"),
            ((F.col("_cash_m") + F.col("_hold_m")).cast("double") / 1e6).alias(
                "equity"
            ),
        )
    )
