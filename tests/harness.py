"""Local twin of the driver's correctness gate: run each __spark_entry__
query on Spark and its oracle on DuckDB, compare row count, column names and
(order-insensitively) values."""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if v == 0.0:
            return 0.0  # -0.0 == 0.0
        return v
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def compare(spark_df, con, sql: str, name: str = "") -> list[str]:
    """Returns list of mismatch descriptions (empty = pass)."""
    errors = []
    sp = spark_df.toPandas()
    du = con.sql(sql).df()
    sp_cols = sorted(sp.columns)
    du_cols = sorted(du.columns)
    if sp_cols != du_cols:
        return [f"{name}: columns differ: spark={sp_cols} duck={du_cols}"]
    if len(sp) != len(du):
        errors.append(f"{name}: row count spark={len(sp)} duck={len(du)}")
        return errors
    sp_rows = sorted(
        (tuple(_norm_cell(v) for v in row) for row in sp[sp_cols].itertuples(index=False)),
        key=repr,
    )
    du_rows = sorted(
        (tuple(_norm_cell(v) for v in row) for row in du[du_cols].itertuples(index=False)),
        key=repr,
    )
    n_bad = 0
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        if a != b:
            n_bad += 1
            if n_bad <= 3:
                errors.append(f"{name}: row {i}: spark={a} duck={b}")
    if n_bad:
        errors.append(f"{name}: {n_bad}/{len(sp_rows)} rows differ")
    return errors
