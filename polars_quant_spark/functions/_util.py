"""Shared helpers for indicator Column expressions.

Semantics contract (the declared behavior our DuckDB oracles also encode —
SURVEY.md §4.2 items 2-3):

* Every windowed indicator takes an explicit base window ``w`` =
  ``Window.partitionBy(symbol).orderBy(time)`` (no frame); trailing
  row-count frames are derived here.
* Warm-up: output is NULL until the trailing frame holds exactly ``p``
  non-null inputs (``F.count(x).over(frame) == p``). The reference instead
  skips nulls without consuming window slots
  (/root/reference/src/talib/overlap.rs:891-895); on null-free data the two
  agree. We document (not replicate) the divergence — row-count frames are
  the only formulation that stays inside Spark's codegen'd window exec.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def col(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def dcol(x: Column | str) -> Column:
    """All indicator inputs are cast to double on entry, like the reference
    (/root/reference/src/talib/overlap.rs:48)."""
    return col(x).cast("double")


def require_absent(df, *names: str) -> None:
    """Raise early if an output or internal temp column an indicator entry
    point is about to add already exists on the input (ADVICE r7): the
    collision would otherwise surface downstream as a duplicate/ambiguous
    column error far from the call site. Callers fix it by passing a
    different ``out=`` / ``prefix=``."""
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"output/temp column(s) {clash} already exist on the input "
            "DataFrame; pass a different out=/prefix= to avoid duplicate "
            "column names"
        )


def trailing(w: WindowSpec, p: int) -> WindowSpec:
    """Trailing row-count frame of length p: rowsBetween(-(p-1), 0)."""
    return w.rowsBetween(-(p - 1), 0)


def cumulative(w: WindowSpec) -> WindowSpec:
    return w.rowsBetween(Window.unboundedPreceding, 0)


def full_window(x: Column, p: int, w: WindowSpec) -> Column:
    """True once the trailing frame holds p non-null values of x."""
    return F.count(x).over(trailing(w, p)) == p


def guarded(expr: Column, x: Column, p: int, w: WindowSpec) -> Column:
    """NULL during warm-up, expr once the frame is full."""
    return F.when(full_window(x, p, w), expr)


def widen(df):
    """Round-robin a narrow scan out to cluster width before a heavy
    projection (tokenize/hash/cosine). A single-row-group parquet file scans
    as ONE task, serializing everything behind it; any real multi-file
    corpus is already wide and this is a no-op. The repartition pays a
    shuffle of the *raw* rows — always the cheap side of an explode or
    score fan-out."""
    if df.isStreaming:  # .rdd is illegal on streams; micro-batches are wide
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def round6(c: Column, decimals: int = 6) -> Column:
    """Deterministic cross-engine rounding: FLOOR(x·10ᵈ + 0.5)/10ᵈ.

    Spark's F.round re-parses the double's shortest decimal representation
    (BigDecimal HALF_UP) while DuckDB rounds the exact binary expansion —
    they disagree on exact half-boundaries. This formula is plain IEEE double
    arithmetic, bit-identical on both engines (oracle.floor_rounds rewrites
    the SQL side to match)."""
    scale = float(10 ** decimals)
    return F.floor(c * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def wdot(x: Column, p: int, w: WindowSpec, weights: list[float]) -> Column:
    """Dot product of the trailing-p window values with a fixed weight vector.

    Stays JVM-side: collect_list over the frame + zip_with/aggregate
    higher-order functions — no Python workers. O(p) per row; fine for the
    reference's p ≤ 30 defaults. For very large p prefer a pandas kernel.
    """
    lst = F.collect_list(x).over(trailing(w, p))
    wlit = F.array(*[F.lit(float(v)) for v in weights])
    return F.aggregate(
        F.zip_with(lst, wlit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# ---------------------------------------------------------------------------
# Driver-side expression-tree cache (optimization round 13).
#
# Building Column/WindowSpec trees in classic PySpark costs one py4j
# round-trip per operator call (~1 ms on this host class); profiling showed
# query CONSTRUCTION at 0.3-2.5 s per bench query — comparable to the
# queries' sf0.1 execution. Unresolved Columns are immutable, reusable
# expression trees (functions/pattern.py has memoized its 61 pattern trees
# this way since round 6), so hot builders memoize per py4j gateway: the
# gateway object pins the cache generation, and a full JVM restart (new
# gateway) invalidates every entry automatically. Nothing data-dependent is
# ever cached — these are prepared-statement-style plan fragments, built
# once per process and re-analyzed by Catalyst on every query that uses
# them.
# ---------------------------------------------------------------------------

_EXPR_CACHE: dict[tuple, object] = {}
_CACHE_GW: object | None = None


def cached_build(key: tuple, build):
    """Return ``build()``, memoized under ``key`` for the lifetime of the
    current py4j gateway. ``build`` must construct only session-independent
    objects (Columns, WindowSpecs, lists/dicts thereof).

    A gateway change (JVM restart) CLEARS the whole cache rather than
    leaving dead-gateway values pinned (ADVICE r13: in a long-lived driver
    process that restarts Spark, per-entry generation checks kept stale
    Column refs — and their py4j handles — alive indefinitely)."""
    global _CACHE_GW
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    gw = sc._gateway if sc is not None else None
    if gw is not _CACHE_GW:
        _EXPR_CACHE.clear()
        _CACHE_GW = gw
    if key in _EXPR_CACHE:
        return _EXPR_CACHE[key]
    val = build()
    _EXPR_CACHE[key] = val
    return val
