"""Price transforms — pure elementwise Column arithmetic.

Reference: /root/reference/src/talib/price.rs:10-91 (SURVEY.md §2.5). These
compile to whole-stage-codegen projections: zero shuffles, zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column

from polars_quant_spark.functions._util import dcol


def avgprice(open: Column | str, high: Column | str, low: Column | str, close: Column | str) -> Column:
    """(o+h+l+c)/4 — price.rs:10-30."""
    return (dcol(open) + dcol(high) + dcol(low) + dcol(close)) / 4.0


def medprice(high: Column | str, low: Column | str) -> Column:
    """(h+l)/2 — price.rs:33-49."""
    return (dcol(high) + dcol(low)) / 2.0


def typprice(high: Column | str, low: Column | str, close: Column | str) -> Column:
    """(h+l+c)/3 — price.rs:52-70."""
    return (dcol(high) + dcol(low) + dcol(close)) / 3.0


def wclprice(high: Column | str, low: Column | str, close: Column | str) -> Column:
    """(h+l+2c)/4 — price.rs:73-91."""
    return (dcol(high) + dcol(low) + 2.0 * dcol(close)) / 4.0
