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


def _kind_class(dtype) -> str:
    """Collapse a pandas dtype into the class the driver's value hash
    distinguishes: integral vs float vs bool vs everything-else. Nullable
    pandas extension ints report kind 'i'/'u' too.

    Width is deliberately IGNORED: a census of all 385 queries found 15
    integer-width splits (int64 vs int32, even int32 vs int8 in
    doc_simhash_pairs), several of them driver-hash-green across rounds
    (bars_vwap, interval_overlap_bars r5; doc_simhash_pairs r3) — the
    driver distinguishes kind class, not width, so flagging widths would
    be pure false alarms."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "other"


def nan_asymmetries(sp, du, name: str = "") -> list[str]:
    """Driver-faithful NaN check: _norm_cell maps NaN -> None for the value
    comparison (so NULL-vs-NaN divergence is invisible locally), but a
    driver-style value hash distinguishes them. Fail when a column carries
    a different number of float-NaN cells on the two engines — the same
    local-blind-spot shape as the int/float dtype class (probed clean over
    all 385 queries at sf0.001, 2026-08-15; this keeps it that way)."""
    import math

    import numpy as np

    errors = []
    for c in sp.columns:
        if c not in du.columns:
            continue
        counts = []
        for side in (sp[c], du[c]):
            if side.dtype.kind == "f":
                counts.append(int(np.isnan(side.to_numpy()).sum()))
            elif side.dtype == object:
                counts.append(
                    sum(1 for v in side if isinstance(v, float) and math.isnan(v))
                )
            else:
                counts.append(0)
        if counts[0] != counts[1]:
            errors.append(
                f"{name}: column {c!r} NaN-cell asymmetry: "
                f"spark={counts[0]} duck={counts[1]} "
                "(driver hash distinguishes NaN from NULL)"
            )
    return errors


def dtype_mismatches(sp, du, name: str = "") -> list[str]:
    """Driver-faithful dtype check (VERDICT r5 #2): the driver's value hash
    distinguishes int64 2017 from float64 2017.0, while Python `==` does
    not — the blind spot that hid the DuckDB SUM(int)->HUGEINT->float64
    oracle defect for three rounds. Fail when one side types a column
    integral and the other floats it (both-sides-float is fine: Spark's
    toPandas floats nullable ints exactly like DuckDB's .df())."""
    errors = []
    numericish = {"int", "float", "bool"}
    for c in sp.columns:
        if c not in du.columns:
            continue
        sk, dk = _kind_class(sp[c].dtype), _kind_class(du[c].dtype)
        if sk != dk and sk in numericish and dk in numericish:
            # int/float splits are only driver-visible when neither side
            # has nulls (with nulls pandas floats the int side anyway);
            # bool-vs-numeric splits (True == 1 to Python, not to a
            # dtype-sensitive hash) are visible regardless.
            if {sk, dk} == {"int", "float"} and (
                sp[c].isna().any() or du[c].isna().any()
            ):
                continue
            errors.append(
                f"{name}: column {c!r} dtype class differs: "
                f"spark={sp[c].dtype} duck={du[c].dtype} "
                "(driver hash distinguishes 5 from 5.0 and True from 1)"
            )
    return errors


def compare(spark_df, con, sql: str, name: str = "") -> list[str]:
    """Returns list of mismatch descriptions (empty = pass)."""
    errors = []
    sp = spark_df.toPandas()
    du = con.sql(sql).df()
    sp_cols = sorted(sp.columns)
    du_cols = sorted(du.columns)
    if sp_cols != du_cols:
        return [f"{name}: columns differ: spark={sp_cols} duck={du_cols}"]
    errors.extend(dtype_mismatches(sp, du, name))
    errors.extend(nan_asymmetries(sp, du, name))
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
