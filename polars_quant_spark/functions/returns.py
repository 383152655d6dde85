"""Simple/log returns over a period (reference README.md:46-84, status R in
SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F

from polars_quant_spark.functions._util import dcol


def returns(x: Column | str, p: int = 1, w: WindowSpec = None) -> Column:
    """(x / x[t-p]) - 1; NULL when the base price is 0 (ANSI-safe)."""
    x = dcol(x)
    prev = F.lag(x, p).over(w)
    return F.when(prev != 0, x / prev - 1.0)


def log_returns(x: Column | str, p: int = 1, w: WindowSpec = None) -> Column:
    """ln(x / x[t-p]); NULL when the ratio is not positive."""
    x = dcol(x)
    prev = F.lag(x, p).over(w)
    ratio = F.when(prev != 0, x / prev)
    return F.when(ratio > 0, F.log(ratio))
