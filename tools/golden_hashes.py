"""Shared fingerprinting for the golden-hash regression tier (VERDICT r6 #3).

Once a query rotates out of the 50-slot driver window, only the full
DuckDB harness (~12 min) re-checks it. This module fingerprints each
query's SPARK result at sf0.001 — dtype-faithful (int 5 ≠ float 5.0 ≠
bool True, NULL ≠ NaN, mirroring the driver's value hash), row-order
insensitive (rows sorted canonically), column-order insensitive (columns
sorted by name) — so a pinned JSON of hashes catches semantic drift in
any rotated-out query without spinning up DuckDB or evaluating the
recursive-CTE oracle twins (which dominate full-harness wall-clock).

Determinism note: every query result in this repo is engine-exact by
design (integer micro-unit sums, 6-dp floor-rounds, deterministic
tie-breaks) — that is what lets the round driver hash-compare them
against DuckDB at all — so the same code on the same parquet produces
the same fingerprint run-to-run, AQE and shuffle order included.
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math

import numpy as np


def canon_cell(v) -> str:
    """Canonical, dtype-tagged rendering of one result cell."""
    if v is None:
        return "N"
    if isinstance(v, float) and math.isnan(v):
        return "f:NaN"
    # pandas NA / NaT without importing pandas types explicitly
    if v.__class__.__name__ in ("NAType", "NaTType"):
        return "N"
    if isinstance(v, (bool, np.bool_)):
        return f"b:{bool(v)}"
    if isinstance(v, (int, np.integer)):
        return f"i:{int(v)}"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "f:NaN"
        if f == 0.0:
            f = 0.0  # -0.0 folds into 0.0, matching harness._norm_cell
        return f"f:{f!r}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "l:[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "m:{"
            + ",".join(f"{k}={canon_cell(x)}" for k, x in sorted(v.items()))
            + "}"
        )
    if isinstance(v, (datetime.datetime, datetime.date, datetime.time)):
        return f"t:{v.isoformat()}"
    # Length-prefix string payloads so a value containing the cell separator
    # (\x1f) or the row separator (\n) cannot shift cell/row boundaries in
    # fingerprint(): "s:<charlen>:<payload>" parses unambiguously left-to-
    # right, so no two distinct cell sequences join to the same string
    # (ADVICE r7 — separator-collision fix; golden file regenerated).
    s = str(v)
    return f"s:{len(s)}:{s}"


def fingerprint(df) -> dict:
    """Row-order/column-order-insensitive sha256 of a Spark DataFrame's
    result. Collected via Arrow (``df.toArrow()``), NOT toPandas: pandas
    renders a float column's NULLs as NaN, which would collapse the
    NULL-vs-NaN distinction this fingerprint exists to preserve
    (code-review r7 — Arrow's ``to_pylist`` keeps None and float('nan')
    distinct in the same column)."""
    tbl = df.toArrow()
    cols = sorted(tbl.column_names)
    rows = sorted(
        "\x1f".join(canon_cell(rec[c]) for c in cols)
        for rec in tbl.to_pylist()
    )
    digest = hashlib.sha256("\n".join(rows).encode("utf-8")).hexdigest()
    return {"rows": tbl.num_rows, "cols": cols, "sha256": digest}
