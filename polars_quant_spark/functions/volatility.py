"""Volatility indicators (SURVEY.md §2.5 Volatility).

TRANGE is a pure lag expression. ATR is Wilder smoothing of TR — EMA with
period 2p−1 (/root/reference/src/talib/volatility.rs:31) — i.e. a recurrence;
the distributed implementation is in operators.recurrence (atr/natr kernels).
"""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F

from polars_quant_spark.functions._util import dcol


def trange(high: Column | str, low: Column | str, close: Column | str, w: WindowSpec = None) -> Column:
    """True range: max(h−l, |h−prev_c|, |l−prev_c|); NULL on the first bar
    (volatility.rs:51-89)."""
    h, l, c = dcol(high), dcol(low), dcol(close)
    prev_c = F.lag(c).over(w)
    return F.when(
        prev_c.isNotNull(),
        F.greatest(h - l, F.abs(h - prev_c), F.abs(l - prev_c)),
    )
