"""Simple/log returns over a period (reference README.md:46-84, status R in
SURVEY.md §2.8)."""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F

from polars_quant_spark.functions._util import dcol


def returns(x: Column | str, p: int = 1, w: WindowSpec = None) -> Column:
    """(x / x[t-p]) - 1."""
    x = dcol(x)
    return x / F.lag(x, p).over(w) - 1.0


def log_returns(x: Column | str, p: int = 1, w: WindowSpec = None) -> Column:
    """ln(x / x[t-p])."""
    x = dcol(x)
    return F.log(x / F.lag(x, p).over(w))
