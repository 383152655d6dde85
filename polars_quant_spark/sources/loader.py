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

def _read_spark(fmt: str):
    def read(spark: SparkSession, path: str) -> DataFrame:
        reader = spark.read.format(fmt)
        if fmt == "csv":
            reader = reader.option("header", "true").option("inferSchema", "true")
        return reader.load(path)

    return read


def _read_feather(spark: SparkSession, path: str) -> DataFrame:
    """Arrow IPC / Feather via pyarrow, ingested driver-side.

    The reference README's feather/ipc inputs are per-asset files (README.md:
    90-96) — driver-sized by contract. Executors can't split an IPC file the
    way they split parquet, so the scale path remains parquet; this reader
    exists for input parity."""
    import pyarrow.feather as fe

    return spark.createDataFrame(fe.read_feather(path))


def _read_excel(spark: SparkSession, path: str) -> DataFrame:
    """.xlsx via a minimal stdlib zip+XML parser (first worksheet, first row
    as header, shared-string and inline values, numbers as double). The
    container ships no openpyxl; legacy binary .xls needs xlrd and raises a
    clear error."""
    if path.lower().endswith(".xls"):
        raise ValueError(
            f"{path}: legacy .xls needs the 'xlrd' package (not installed); "
            "convert to .xlsx/csv/parquet"
        )
    import pandas as pd

    rows = _parse_xlsx(path)
    if not rows:
        raise ValueError(f"{path}: empty worksheet")
    header, *data = rows
    ncol = len(header)
    data = [r + [None] * (ncol - len(r)) for r in data]
    return spark.createDataFrame(pd.DataFrame(data, columns=[str(h) for h in header]))


def _parse_xlsx(path: str) -> list[list]:
    """Cells of the first worksheet as python values (str/float/None)."""
    import re
    import zipfile
    from xml.etree import ElementTree as ET

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = ["".join(t.text or "" for t in si.iter(f"{ns}t")) for si in root]
        sheet = next(
            n for n in sorted(z.namelist()) if re.match(r"xl/worksheets/sheet\d+\.xml", n)
        )
        root = ET.fromstring(z.read(sheet))
        out: list[list] = []
        for row in root.iter(f"{ns}row"):
            cells: dict[int, object] = {}
            for c in row.iter(f"{ns}c"):
                ref = c.get("r", "A")
                col = 0
                for ch in ref:
                    if ch.isalpha():
                        col = col * 26 + (ord(ch.upper()) - 64)
                idx = col - 1
                ctype = c.get("t", "n")
                v = c.find(f"{ns}v")
                is_node = c.find(f"{ns}is")
                if ctype == "s" and v is not None:
                    cells[idx] = shared[int(v.text)]
                elif ctype == "inlineStr" and is_node is not None:
                    cells[idx] = "".join(t.text or "" for t in is_node.iter(f"{ns}t"))
                elif v is not None and v.text is not None:
                    cells[idx] = v.text if ctype == "str" else float(v.text)
            width = max(cells) + 1 if cells else 0
            out.append([cells.get(i) for i in range(width)])
        return out


_READERS = {
    ".parquet": _read_spark("parquet"),
    ".csv": _read_spark("csv"),
    ".json": _read_spark("json"),
    ".feather": _read_feather,
    ".ipc": _read_feather,
    ".arrow": _read_feather,
    ".xlsx": _read_excel,
    ".xls": _read_excel,
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
        read = _READERS.get(ext.lower())
        if read is None:
            continue
        df = read(spark, os.path.join(folder_path, fname))
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
    # running frame over the DESCENDING sort, not (0, unboundedFollowing):
    # Spark evaluates unbounded-following frames by rescanning the
    # remainder per row (quadratic in partition length — see
    # clean.interpolate_linear). last-ignorenulls over the reversed order
    # is the same backward fill at O(n).
    w = (
        Window.partitionBy(partition_by)
        .orderBy(F.col(order_by).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in cols:
        df = df.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
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
