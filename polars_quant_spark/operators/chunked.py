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


def _require_numeric_order(df: DataFrame, order: str, op: str) -> None:
    """Chunk/block ids come from ``cast(order AS long)`` but the
    within-block window sorts the RAW column — for a non-numeric order the
    two disagree (numeric strings sort "1","10","100","11",…), corrupting
    every window silently (code-review r7). Plan-time check, no job."""
    from pyspark.sql.types import NumericType

    dt = df.schema[order].dataType
    if not isinstance(dt, NumericType):
        raise ValueError(
            f"{op}: order column {order!r} has type {dt.simpleString()}; "
            "the halo-chunk contract needs a NUMERIC dense 1-based "
            "position (block assignment casts to long, the window sorts "
            "the raw column — they must agree). Renumber with "
            "row_number()."
        )


def chunked_cumsum(
    df: DataFrame,
    builders: dict[str, Callable[[WindowSpec], Column]],
    lookback: int = 1,
    chunk: int = 8192,
    by: str | list[str] = "symbol",
    order: str = "t",
) -> DataFrame:
    """Block-parallel EXACT prefix sums — the cumulative complement of
    ``with_chunked_windows`` (unbounded frames cannot halo). Classic
    two-level scan: per-block running sum plus the exclusive sum of the
    preceding blocks' totals, joined back on (key, block).

    ``builders`` map output name → fn(base_window) → the PER-ROW
    contribution (the window is for bounded lags inside the contribution,
    e.g. OBV's ``lag(close)``; ``lookback`` sizes that halo — 0 for
    row-local contributions like AD's CLV·volume).

    Exact only for order-insensitive addition: contributions must be in
    the integer/decimal domain (the repo's quantized-sum discipline, see
    functions/volume.py ``exact=True``) — float addition re-associates
    across blocks and would drift. The `vol_ad_obv_chunked` oracle reuses
    the PLAIN cumulative window's SQL twin verbatim, proving block
    reassociation changes nothing.

    Plan: one forced (keys, block) exchange for the big frame; block
    totals aggregate on that same partitioning (no second big exchange);
    the offsets frame is #blocks rows — its exchange and the join back
    are negligible. Result columns are cast to double (mirroring the
    ``exact=True`` indicator contract)."""
    if lookback >= chunk:
        raise ValueError("chunk must exceed lookback")
    _require_numeric_order(df, order, "chunked_cumsum")
    keys = [by] if isinstance(by, str) else list(by)
    pos = F.col(order).cast("long") - 1  # dense 1-based order contract
    ck = (pos / chunk).cast("long")
    if lookback > 0:
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
    else:
        marked = df.select("*", ck.alias("_ck"), F.lit(False).alias("_halo"))
    marked = marked.repartition(*[F.col(k) for k in keys], F.col("_ck"))
    w_blk = Window.partitionBy(*keys, "_ck").orderBy(order)
    # materialize contributions once (halo rows nulled: they only exist to
    # feed lags, they must not enter any sum)
    names = list(builders)
    step = marked.select(
        "*",
        *[
            F.when(~F.col("_halo"), fn(w_blk)).alias(f"_c_{n}")
            for n, fn in builders.items()
        ],
    )
    run = step.select(
        "*",
        *[
            F.sum(f"_c_{n}")
            .over(w_blk.rowsBetween(Window.unboundedPreceding, 0))
            .alias(f"_r_{n}")
            for n in names
        ],
    )
    totals = step.groupBy(*keys, "_ck").agg(
        *[F.sum(f"_c_{n}").alias(f"_t_{n}") for n in names]
    )
    w_off = (
        Window.partitionBy(*keys)
        .orderBy("_ck")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *keys,
        "_ck",
        *[F.sum(f"_t_{n}").over(w_off).alias(f"_o_{n}") for n in names],
    )
    out = run.join(offsets, [*keys, "_ck"]).where(~F.col("_halo"))
    zero = F.lit(0).cast("decimal(38,6)")
    return out.select(
        *df.columns,
        *[
            (F.col(f"_r_{n}") + F.coalesce(F.col(f"_o_{n}"), zero))
            .cast("double")
            .alias(n)
            for n in names
        ],
    )


def with_chunked_windows(
    df: DataFrame,
    builders: dict[str, Callable[[WindowSpec], Column]],
    lookback: int,
    chunk: int = 8192,
    by: str | list[str] = "symbol",
    order: str = "t",
    cache_key: str | None = None,
) -> DataFrame:
    """Evaluate ``builders`` (name → fn(base_window) → Column, the same
    shape every indicator in functions/ takes) over halo chunks. Returns
    the input columns plus one output column per builder, bit-equal to
    evaluating each builder over ``Window.partitionBy(by).orderBy(order)``.

    ``lookback`` must be ≥ the longest trailing reach any builder uses
    (frame length − 1, or the largest lag). Oversizing is safe (slightly
    more halo rows); undersizing silently corrupts chunk-boundary rows —
    size it from the indicator periods, as `ind_chunked_expr` does.

    ``cache_key``: opt-in driver-side memoization of the built expression
    trees (functions/_util.cached_build) for callers that re-submit the
    same spec — the caller asserts ``builders`` is STABLE for that key
    (same names → same Columns); everything built here is name-based
    (F.col) + the spec's ints, so the trees are session-independent."""
    if lookback >= chunk:
        raise ValueError("chunk must exceed lookback")
    _require_numeric_order(df, order, "with_chunked_windows")
    keys = [by] if isinstance(by, str) else list(by)

    def build():
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
        part_cols = [F.col(k) for k in keys] + [F.col("_ck")]
        w = Window.partitionBy(*keys, "_ck").orderBy(order)
        built = [fn(w).alias(name) for name, fn in builders.items()]
        return marks, part_cols, built

    if cache_key is not None:
        from polars_quant_spark.functions._util import cached_build

        # Key on the builder FUNCTIONS, not just their names (ADVICE r13):
        # two call sites sharing a cache_key with identical names but
        # different Column-building closures must not reuse each other's
        # trees. (file, firstlineno) identifies the def site; hashable
        # closure-cell contents distinguish same-site parametrized lambdas
        # (e.g. `bb(0)` vs `bb(2)`).
        def _fp(f):
            code = getattr(f, "__code__", None)
            if code is None:
                return repr(f)
            cells: tuple = ()
            if getattr(f, "__closure__", None):
                try:
                    cells = tuple(c.cell_contents for c in f.__closure__)
                    hash(cells)
                except Exception:  # unhashable capture: fall back to def site
                    cells = ("<unhashable>",)
            return (code.co_filename, code.co_firstlineno, cells)

        marks, part_cols, built = cached_build(
            ("with_chunked_windows", cache_key, lookback, chunk,
             tuple(keys), order,
             tuple((n, _fp(f)) for n, f in builders.items())),
            build,
        )
    else:
        marks, part_cols, built = build()
    marked = df.select("*", F.explode(marks).alias("_m")).select(
        "*", F.col("_m.ck").alias("_ck"), F.col("_m.halo").alias("_halo")
    )
    # The explicit repartition is the POINT of the operator: the window's
    # ClusteredDistribution((keys, _ck)) is already satisfied by any
    # upstream hashpartitioning(keys) (a (key, block) group is a subset of
    # its key's partition), so EnsureRequirements would elide the exchange
    # and the window would still run at #keys parallelism. Forcing the
    # exchange on (keys…, _ck) is what actually spreads one key's blocks
    # over the cluster.
    marked = marked.repartition(*part_cols)
    out = marked.select(
        *df.columns,
        "_halo",
        *built,
    )
    return out.where(~F.col("_halo")).drop("_halo")


# Rows-per-key threshold below which the plain per-key window wins: the halo
# plan pays one explode + a higher-cardinality shuffle, worth it only once a
# single key's history is long enough that one task per key is the
# bottleneck. The skewed-symbol smoke (tools/skew_smoke.py, results in
# docs/SCALE.md) measured the crossover on local[32] between ~6e4 (even
# 5-symbol histories: chunked ≈ plain) and ~2.5e5 rows in one key (one
# symbol holding 50% of an 8× corpus: chunked clearly ahead); 100_000 sits
# between the two measured regimes. On a 1000-executor cluster the same
# logic holds per core: chunk when max(rows-per-key) ≫ rows-per-task you
# can afford serially.
AUTO_CHUNK_THRESHOLD = 100_000


def auto_chunk_windows(
    df: DataFrame,
    builders: dict[str, Callable[[WindowSpec], Column]],
    lookback: int,
    chunk: int = 8192,
    by: str | list[str] = "symbol",
    order: str = "t",
    threshold: int = AUTO_CHUNK_THRESHOLD,
    max_rows_per_key: int | None = None,
) -> DataFrame:
    """Size-dispatching front door for bounded-lookback window chains:
    evaluate ``builders`` over the PLAIN per-key window when every key's
    history is short (the halo explode + block shuffle would be pure
    overhead) and over halo chunks (``with_chunked_windows``) when any
    key's history exceeds ``threshold`` rows — the few-keys/long-history
    regime where one task per key becomes the 100 TB bottleneck.

    ``max_rows_per_key``: pass the known per-key row bound (table stats,
    a prior count, the loader's grid size) to keep dispatch plan-time-only;
    when None, one lightweight count-by-key job measures it (aggregates
    push down to the scan — cheap relative to the window chain being
    planned, and cacheable by the caller).

    PRECONDITION (shared with ``with_chunked_windows``): ``order`` must be
    the dense 1-based position within each key (pos = order - 1). The plain
    arm tolerates any orderable column, the chunked arm does NOT — a sparse
    or offset order mis-assigns chunk ids and silently corrupts
    chunk-boundary rows, turning a data-size increase into a correctness
    flip (ADVICE r5). When this function has to measure (no
    ``max_rows_per_key`` given) it validates density in the same pass and
    raises; when the caller supplies the bound, the caller owns the
    contract. A non-castable order column (e.g. string) is treated as
    sparse, not silently passed (ADVICE r6: NULL from the long cast must
    fail the gate, not fall through ``otherwise(0)``).

    BREAKING CHANGE (round 6): the measured path raises for ANY non-dense
    order column — even when the data is small enough that dispatch would
    have picked the plain arm, which does tolerate arbitrary orderable
    columns (e.g. epoch timestamps). This is deliberate: accepting a
    sparse order at small sizes means a later data-size increase flips the
    dispatch to the chunked arm and SILENTLY corrupts results, which is
    strictly worse than an eager error. Callers with a valid sparse order
    have two escape hatches (both named in the error message): renumber
    with ``row_number()`` over the same sort, or pass ``max_rows_per_key``
    to take ownership of the contract and skip the measuring pass.

    Both paths are bit-identical (the chunked operator's exactness
    contract) given the dense-order contract, so the dispatch only moves
    the work, never the answer."""
    if max_rows_per_key is None:
        # fail fast, before the count job: a numeric-STRING order column
        # (e.g. "1".."20000") try_casts cleanly and would pass the density
        # probe, then corrupt the chunked arm (numeric chunk ids, but the
        # window sorts lexicographically) — the same contract
        # _require_numeric_order enforces inside the operators
        _require_numeric_order(df, order, "auto_chunk_windows")
        keys = [by] if isinstance(by, str) else list(by)
        row = (
            df.groupBy(*keys)
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.count_distinct(F.col(order)).alias("_nd"),
                F.max(F.col(order).try_cast("long")).alias("_mx"),
                F.min(F.col(order).try_cast("long")).alias("_mn"),
            )
            .agg(
                F.max("_n").alias("m"),
                F.max(
                    # min==1 and max==n alone admit duplicate-plus-gap
                    # sequences like [1,2,2,4]; requiring n distinct
                    # values closes that (code-review r7)
                    F.when(
                        F.col("_mx").isNull()
                        | (F.col("_mx") != F.col("_n"))
                        | (F.col("_mn") != 1)
                        | (F.col("_nd") != F.col("_n")),
                        1,
                    ).otherwise(0)
                ).alias("sparse"),
            )
            .first()
        )
        if row and row["sparse"]:
            raise ValueError(
                f"auto_chunk_windows: order column {order!r} is not the "
                "dense 1-based per-key position (min 1, max = rows-per-key)"
                " — the chunked arm would corrupt chunk-boundary rows; "
                "renumber with row_number() or pass max_rows_per_key "
                "explicitly to take ownership of the contract"
            )
        max_rows_per_key = int(row["m"]) if row and row["m"] is not None else 0
    if max_rows_per_key <= threshold:
        keys = [by] if isinstance(by, str) else list(by)
        w = Window.partitionBy(*keys).orderBy(order)
        return df.select(
            "*", *[fn(w).alias(name) for name, fn in builders.items()]
        )
    return with_chunked_windows(
        df, builders, lookback=lookback, chunk=chunk, by=by, order=order
    )
