"""Folder scan + alignment operators.

``prepare_sequential_data`` re-expresses the reference's
python/polars_quant/backtest/sequential.py:7-93 pipeline Spark-first:
per-file symbol tagging, loose union, full date×symbol grid, left join,
sort, forward/backward/zero fill — see SURVEY.md §2.1.

``load`` is the v0.x README wide-format loader (README.md:90-161): folder →
one wide frame keyed by date with ``{symbol}_{col}`` columns. Wide format is
an anti-pattern at Spark scale, so ``load`` is implemented as a pivot of the
long layout and intended for small asset counts only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_READERS = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
}


def _read_folder_long(
    spark: SparkSession,
    folder_path: str,
    symbol_col: str = "symbol",
) -> DataFrame:
    """Read every data file in a folder, tagging rows with the file stem as
    ``symbol`` when the column is absent (reference backtest/sequential.py:48-58),
    then union loosely (diagonal concat ≙ unionByName(allowMissingColumns))."""
    frames: list[DataFrame] = []
    for fname in sorted(os.listdir(folder_path)):
        stem, ext = os.path.splitext(fname)
        fmt = _READERS.get(ext.lower())
        if fmt is None:
            continue
        reader = spark.read.format(fmt)
        if fmt == "csv":
            reader = reader.option("header", "true").option("inferSchema", "true")
        df = reader.load(os.path.join(folder_path, fname))
        if symbol_col not in df.columns:
            df = df.withColumn(symbol_col, F.lit(stem))
        frames.append(df)
    if not frames:
        raise ValueError(f"no readable data files in {folder_path}")
    out = frames[0]
    for df in frames[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def forward_fill(df: DataFrame, cols: list[str], partition_by: str, order_by: str) -> DataFrame:
    """Per-symbol forward fill: F.last(ignorenulls) over an unbounded-preceding
    window — the Spark idiom for the reference's fill_null('forward') over
    grouped data (backtest/sequential.py:77-81)."""
    w = (
        Window.partitionBy(partition_by)
        .orderBy(order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in cols:
        df = df.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return df


def backward_fill(df: DataFrame, cols: list[str], partition_by: str, order_by: str) -> DataFrame:
    w = (
        Window.partitionBy(partition_by)
        .orderBy(order_by)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    for c in cols:
        df = df.withColumn(c, F.first(F.col(c), ignorenulls=True).over(w))
    return df


def prepare_sequential_data(
    spark: SparkSession,
    folder_path: str,
    date_col: str = "date",
    symbol_col: str = "symbol",
    fill_null_strategy: str = "forward",
    default_fill_value: float = 0.0,
) -> DataFrame:
    """Long multi-asset table on a full date×symbol grid.

    Mirrors /root/reference/python/polars_quant/backtest/sequential.py:7-93:
    scan folder → tag symbol → union → distinct dates × distinct symbols grid
    (crossJoin; both sides are tiny dimension sets, so Spark broadcasts) →
    left join observations → sort → fill.
    """
    obs = _read_folder_long(spark, folder_path, symbol_col)
    dates = obs.select(date_col).distinct()
    symbols = obs.select(symbol_col).distinct()
    grid = dates.crossJoin(F.broadcast(symbols))
    full = grid.join(obs, on=[date_col, symbol_col], how="left")
    value_cols = [c for c in full.columns if c not in (date_col, symbol_col)]
    full = full.sortWithinPartitions(symbol_col, date_col)
    if fill_null_strategy == "forward":
        full = forward_fill(full, value_cols, symbol_col, date_col)
    elif fill_null_strategy == "backward":
        full = backward_fill(full, value_cols, symbol_col, date_col)
    elif fill_null_strategy not in (None, "none", "zero"):
        raise ValueError(f"unknown fill_null_strategy {fill_null_strategy!r}")
    if default_fill_value is not None:
        numeric = [
            f.name
            for f in full.schema.fields
            if f.name in value_cols and f.dataType.typeName() in ("double", "float", "long", "integer")
        ]
        full = full.fillna(default_fill_value, subset=numeric)
    return full.orderBy(date_col, symbol_col)


def load(
    spark: SparkSession,
    folder: str,
    date_col: str = "date",
    symbol_col: str = "symbol",
    fields: list[str] | None = None,
) -> DataFrame:
    """Wide multi-asset frame: ``date`` + ``{symbol}_{field}`` columns
    (reference README.md:90-161 'load'). Built by pivoting the long layout;
    only sensible for small symbol counts — the long layout is the scale path.
    """
    long_df = _read_folder_long(spark, folder, symbol_col)
    if fields is None:
        fields = [c for c in long_df.columns if c not in (date_col, symbol_col)]
    aggs = [F.first(F.col(f)).alias(f) for f in fields]
    wide = long_df.groupBy(date_col).pivot(symbol_col).agg(*aggs)
    return wide.orderBy(date_col)
