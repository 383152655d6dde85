"""Plan-inspection utilities: the programmatic face of `.explain()`.

The engine's scale discipline (pushdown reaches the scan, dims broadcast,
window chains share one exchange, no cartesian fan-outs) is asserted in
tests/test_plans.py via these helpers; they are exported here so pipelines
can enforce the same invariants at deploy time (e.g. fail a job submit if
a plan regression slips in a cartesian product).
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

__all__ = [
    "plan_str",
    "n_exchanges",
    "n_scans",
    "pushed_filters",
    "read_schemas",
    "has_cartesian",
    "check",
]


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (explain() prints; this returns)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def n_exchanges(p: str | DataFrame) -> int:
    """Number of Exchange (shuffle/broadcast-exchange) operators."""
    if isinstance(p, DataFrame):
        p = plan_str(p)
    return len(re.findall(r"\(\d+\) Exchange", p))


def n_scans(p: str | DataFrame, source: str = "parquet") -> int:
    """Number of physical scans (a frame read twice = lineage recompute)."""
    if isinstance(p, DataFrame):
        p = plan_str(p)
    return len(re.findall(rf"\(\d+\) Scan {source}", p))


def pushed_filters(p: str | DataFrame) -> list[str]:
    """Every PushedFilters line — empty brackets mean the scan reads all
    row groups and the filter runs post-scan."""
    if isinstance(p, DataFrame):
        p = plan_str(p)
    return [ln.strip() for ln in p.splitlines() if "PushedFilters" in ln]


def read_schemas(p: str | DataFrame) -> list[str]:
    """Every ReadSchema line — a scan that reads columns the query never
    touches defeats column pruning."""
    if isinstance(p, DataFrame):
        p = plan_str(p)
    return [ln.strip() for ln in p.splitlines() if "ReadSchema" in ln]


def has_cartesian(p: str | DataFrame) -> bool:
    """True if the plan contains an unbounded pair fan-out (CartesianProduct
    or BroadcastNestedLoopJoin) — the at-scale kill signal unless one side
    is provably tiny (1-row scalar broadcasts are the accepted exception and
    still show as BroadcastNestedLoopJoin; callers filter by intent)."""
    if isinstance(p, DataFrame):
        p = plan_str(p)
    return "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p


def check(
    df: DataFrame,
    max_exchanges: int | None = None,
    max_scans: int | None = None,
    forbid_cartesian: bool = False,
) -> list[str]:
    """Validate a plan against scale invariants; returns violation messages
    (empty = clean). Intended as a deploy-time gate:

        problems = check(my_pipeline_df, max_exchanges=3, forbid_cartesian=True)
        if problems: raise RuntimeError(problems)
    """
    p = plan_str(df)
    out: list[str] = []
    if max_exchanges is not None and n_exchanges(p) > max_exchanges:
        out.append(f"exchanges {n_exchanges(p)} > {max_exchanges}")
    if max_scans is not None and n_scans(p) > max_scans:
        out.append(f"scans {n_scans(p)} > {max_scans}")
    if forbid_cartesian and has_cartesian(p):
        out.append("plan contains CartesianProduct/BroadcastNestedLoopJoin")
    return out
