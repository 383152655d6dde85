"""Chunked (halo) evaluation of bounded-lookback window chains — the
expression-layer sibling of the segmented recurrence scans
(operators/segmented.py): lifts the per-key parallelism cap of
``Window.partitionBy(key)`` when there are few keys with very long
histories (one instrument with billions of bars = one task in the plain
plan — the classic 100 TB failure mode).

Idea: cut each key's dense integer time axis into ``chunk``-row blocks and
duplicate the last ``lookback`` rows of every block into the next block as
*halo* rows. A window partitioned by (key, block) then sees, for every
non-halo row, exactly the same trailing frame content as the global
per-key window — because every supported frame reaches back at most
``lookback`` rows. Halo rows are dropped after evaluation. Parallelism
becomes (#keys × #blocks) instead of #keys, at the cost of a
``lookback/chunk`` row-duplication factor (<1% for the defaults).

Exactness contract (asserted by the `ind_chunked_expr` oracle and pytest):
* the order column is a dense per-key integer (1, 2, 3, … — the repo's bar
  index contract, sources/bars.py);
* every builder derives only *trailing* row frames of length ≤
  ``lookback + 1`` (or lags ≤ ``lookback``) from the base window it is
  given — no unbounded/cumulative frames, no leads;
* under those two conditions the outputs are bit-identical to the plain
  per-key window — this is an execution strategy, not an approximation.

Plan shape: one explode (row → 1 or 2 struct marks, fully codegen'd), one
hash shuffle on (key, block) for the window sort — the same single
exchange the plain plan pays, just at higher key cardinality.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def with_chunked_windows(
    df: DataFrame,
    builders: dict[str, Callable[[WindowSpec], Column]],
    lookback: int,
    chunk: int = 8192,
    by: str | list[str] = "symbol",
    order: str = "t",
) -> DataFrame:
    """Evaluate ``builders`` (name → fn(base_window) → Column, the same
    shape every indicator in functions/ takes) over halo chunks. Returns
    the input columns plus one output column per builder, bit-equal to
    evaluating each builder over ``Window.partitionBy(by).orderBy(order)``.

    ``lookback`` must be ≥ the longest trailing reach any builder uses
    (frame length − 1, or the largest lag). Oversizing is safe (slightly
    more halo rows); undersizing silently corrupts chunk-boundary rows —
    size it from the indicator periods, as `ind_chunked_expr` does."""
    if lookback >= chunk:
        raise ValueError("chunk must exceed lookback")
    keys = [by] if isinstance(by, str) else list(by)
    pos = F.col(order).cast("long") - 1  # dense 1-based order contract
    ck = (pos / chunk).cast("long")
    is_tail = (pos % chunk) >= (chunk - lookback)
    marks = F.when(
        is_tail,
        F.array(
            F.struct(ck.alias("ck"), F.lit(False).alias("halo")),
            F.struct((ck + 1).alias("ck"), F.lit(True).alias("halo")),
        ),
    ).otherwise(F.array(F.struct(ck.alias("ck"), F.lit(False).alias("halo"))))
    marked = df.select("*", F.explode(marks).alias("_m")).select(
        "*", F.col("_m.ck").alias("_ck"), F.col("_m.halo").alias("_halo")
    )
    w = Window.partitionBy(*keys, "_ck").orderBy(order)
    out = marked.select(
        *df.columns,
        "_halo",
        *[fn(w).alias(name) for name, fn in builders.items()],
    )
    return out.where(~F.col("_halo")).drop("_halo")
