"""Segmented exponential scans — the huge-single-symbol escape hatch.

``with_recurrences`` (operators/recurrence.py) materializes one pandas frame
per symbol group; a symbol with billions of bars therefore becomes one
executor-memory-sized group (the documented r1 limitation, recurrence.py
module doc). ``ewma_segmented`` removes that bound for the EMA/RMA family
while staying *bit-identical* to the single-group scan:

* rows are split into ``segment_rows``-sized per-symbol segments
  (row_number over the symbol window — the same exchange the indicator
  pipeline already pays);
* segments run as **sequential Spark passes**: pass k processes every
  symbol's k-th segment in parallel (applyInPandas over symbols), then the
  carried accumulator — ONE double per symbol, smuggled out on a marker row
  — is JOINED into pass k+1's input as a ``_seed`` column (merge-pinned on
  the symbol key: the same exchange the next pass's groupBy needs anyway).
  VERDICT r8 gap #3: the carry used to round-trip through the driver
  (``collect()`` of one marker row per symbol per segment — a 10⁶-row
  driver funnel at 10⁶ symbols); the join keeps it executor-side at any
  symbol count, and the whole chain is one lazy DAG;
* segment 0 runs the ordinary ``_ewma`` (SMA seed, pandas-ewm tail);
  continuation segments resume the pandas-ewm recurrence from the carried e.

Exactness argument: an exponential scan is a strict left fold; cutting the
fold and resuming from the carried accumulator replays identical float ops
in identical order, so output equals the unsegmented scan bit-for-bit
(asserted in tests/test_segmented.py). Executor memory is bounded by one
segment instead of one symbol; wall-clock is n_segments sequential jobs,
each parallel across symbols — the right trade exactly when single symbols
are huge.

Constraints: ``segment_rows ≥ p`` (so the SMA seed always completes inside
segment 0) and null-free input (compact/filter upstream; a null inside a
continuation would shift the fold).

Cache hygiene: every operator here pins its continuation pieces
(DISK_ONLY persist / localCheckpoint) because they feed the returned lazy
frame; the pins live for the session unless the caller consumes the
result inside ``session.released(spark)`` (ADVICE r10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.storagelevel import StorageLevel
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from polars_quant_spark.operators.recurrence import (
    _arrow_group_path_available,
    _ewma,
)

# Truncate the sequential-pass lineage every this-many segments; plan depth
# at any action is bounded by this constant instead of n_segments.
_CHECKPOINT_EVERY_SEGMENTS = 4

#: Test hook: force the applyInPandas arms (the executable spec) even when
#: the Arrow group path is available, so the arm differential can pin
#: pandas≡arrow on the same input (tests/test_segmented.py).
_FORCE_PANDAS_ARM = False


def _use_arrow(df: DataFrame) -> bool:
    return (not _FORCE_PANDAS_ARM) and _arrow_group_path_available(df)

#: segment_rows="auto" sizing: ceil(max-rows-per-key / TARGET) with a FLOOR.
#: Wall-clock is n_segments SEQUENTIAL passes, so a fixed segment_rows makes
#: the pass count grow linearly with history length (the census outliers:
#: 512-row demo configs ran 40 passes at sf0.1's 20.3k-bar symbols, VERDICT
#: r11 #6). TARGET=4 bounds the pass count while still crossing ≥3 segment
#: boundaries — and exactly one _CHECKPOINT_EVERY_SEGMENTS boundary — at any
#: SF whose histories exceed the floor, so the driver oracle keeps proving
#: the segmented path, not a degenerate single segment. The FLOOR keeps tiny
#: inputs from paying sequential-pass overhead for toy segments. Memory
#: bound: the caller picking "auto" accepts ~max_rows/4 rows per pandas
#: group — for the memory-bounded regime (billion-row symbols) pass an
#: explicit segment_rows instead.
AUTO_SEGMENT_TARGET = 4
AUTO_SEGMENT_FLOOR = 512


def _segmented_base(
    df: DataFrame, partition_by: str, order_by: str, segment_rows: int | str
):
    """Shared pass-0 scaffolding: (_rn, _seg) columns over the symbol
    window, materialized ONCE behind a lineage cut. Returns (base,
    last_seg, resolved_segment_rows); last_seg is None on empty input.

    ``segment_rows="auto"`` sizes segments from the data: one action reads
    max(_rn) off the checkpointed base (the same materializing action the
    fixed path spends on max(_seg)) and sets segment_rows =
    max(AUTO_SEGMENT_FLOOR, ceil(max_rn / AUTO_SEGMENT_TARGET)); _seg is a
    trivial projection over the checkpoint either way, and last_seg is
    derived arithmetically — the action count is identical to the fixed
    path.

    base is read n_segments + 2 times (the max-seg action, one slice per
    pass, the final join); without materialization every read re-executes
    the full upstream lineage — harmless for a raw scan, MULTIPLICATIVE
    for chained segmented ops (rsi = 2 chains, adx = 4: pass k of chain c
    re-ran chains 1..c-1, and ind_adx_seg_14 took >20 min at sf0.01).
    localCheckpoint, not persist: a cache keeps the nested plan, and the
    COMPOSED plan text across 4 chains OOM'd the driver in Catalyst's
    PlanStringConcat — truncating to a leaf bounds plan size per chain.
    DISK_ONLY blocks for the same write-once/read-few reason as the piece
    cache (storageLevel kwarg is Spark 4.x; fall back if absent). AQE-less
    compilation is safe here: base is one window over the input, and every
    downstream join in this module is merge-pinned."""
    # Validate BEFORE any Spark job (ADVICE r12): a bad value previously
    # surfaced as ZeroDivisionError at the _seg projection, and only after
    # paying the checkpoint + max(_rn) action below.
    if segment_rows != "auto":
        if not isinstance(segment_rows, int) or isinstance(segment_rows, bool):
            raise ValueError(
                f"segment_rows must be an int >= 1 or 'auto'; got {segment_rows!r}"
            )
        if segment_rows < 1:
            raise ValueError(
                f"segment_rows must be >= 1; got {segment_rows}"
            )
    w = Window.partitionBy(partition_by).orderBy(order_by)
    base = df.withColumn("_rn", F.row_number().over(w))
    try:
        base = base.localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    except TypeError:
        base = base.localCheckpoint(eager=False)
    max_rn = base.agg(F.max("_rn")).collect()[0][0]
    if segment_rows == "auto":
        if max_rn is None:
            segment_rows = AUTO_SEGMENT_FLOOR
        else:
            segment_rows = max(
                AUTO_SEGMENT_FLOOR,
                -(-int(max_rn) // AUTO_SEGMENT_TARGET),
            )
    base = base.withColumn(
        "_seg", ((F.col("_rn") - 1) / F.lit(int(segment_rows))).cast("long")
    )
    last_seg = None if max_rn is None else (int(max_rn) - 1) // int(segment_rows)
    return base, last_seg, int(segment_rows)


def _cache_piece(res: DataFrame, k: int) -> DataFrame:
    """Shared piece-cache policy. Pass k's plan nests pass k-1's, and
    persist() is lazy, so without a periodic cut the final action analyzes
    O(n_segments)-deep plans — O(n_segments²) total Catalyst work, a
    driver blowup at thousands of segments (round-10 advisor). A periodic
    localCheckpoint resets plan depth to ≤ the checkpoint interval (the
    bpe_merges pattern, text.py:863); it compiles WITHOUT AQE, which is
    exactly why every seed join in this module is merge-pinned at the
    source rather than left to runtime demotion. Between cuts: DISK_ONLY,
    not the MEMORY_AND_DISK default — each piece is written once and read
    at most twice (the seed row for pass k+1, the final union), and ALL
    pieces stay pinned until that union; at 26 segments × a 25.6 M-row
    corpus the on-heap copies thrashed the GC (GCLocker retry storms on
    the 256× replica) where the spill-to-disk level streams cleanly."""
    if (k + 1) % _CHECKPOINT_EVERY_SEGMENTS == 0:
        return res.localCheckpoint(eager=False)
    return res.persist(StorageLevel.DISK_ONLY)


def _join_back(
    base: DataFrame, pieces: list[DataFrame], partition_by: str
) -> DataFrame:
    """Shared output assembly: union the per-segment result pieces and
    left-join them back onto the checkpointed base on (symbol, _rn)."""
    merged = pieces[0]
    for piece in pieces[1:]:
        merged = merged.unionByName(piece)
    return base.join(merged, [partition_by, "_rn"], "left").drop("_seg", "_rn")


def ewma_segmented(
    df: DataFrame,
    x: str,
    p: int,
    alpha: float | None = None,
    out: str = "ema",
    partition_by: str = "symbol",
    order_by: str = "t",
    segment_rows: int | str = 1_000_000,
) -> DataFrame:
    """SMA-seeded exponential scan, bit-equal to
    ``with_recurrences(..., Rec(out, "ema"|"rma", ...))`` on null-free input,
    but bounded by ``segment_rows`` of executor memory per group instead of
    the whole symbol. α defaults to 2/(p+1); pass 1/p for Wilder RMA."""
    if alpha is None:
        alpha = 2.0 / (p + 1)
    base, last_seg, segment_rows = _segmented_base(df, partition_by, order_by, segment_rows)
    if segment_rows < p:
        raise ValueError(f"segment_rows ({segment_rows}) must be >= p ({p})")
    if last_seg is None:
        return df.withColumn(out, F.lit(None).cast("double"))

    schema = StructType(
        [
            df.schema[partition_by],
            StructField("_rn", LongType()),
            StructField(out, DoubleType()),
        ]
    )

    def scan(vals: np.ndarray, e: float | None):
        """The per-group scan body, shared bit-identically by both arms:
        (values, carried accumulator | None) → (result, carry-out)."""
        if e is None:
            res = _ewma(vals, alpha, p)
            valid = np.where(~np.isnan(res))[0]
            e_out = float(res[valid[-1]]) if valid.size else np.nan
        else:
            z = np.empty(vals.shape[0] + 1, dtype=np.float64)
            z[0] = e
            z[1:] = vals
            res = (
                pd.Series(z).ewm(alpha=alpha, adjust=False).mean().to_numpy()[1:]
            )
            e_out = float(res[-1]) if res.size else e
        return res, e_out

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_rn", kind="mergesort").reset_index(drop=True)
        sym = pdf[partition_by].iloc[0]
        vals = pdf[x].to_numpy(dtype="float64", na_value=np.nan)
        # the carried accumulator arrives as a joined `_seed` column
        # (absent on pass 0; NaN when the prior segment produced no value)
        e = None
        if "_seed" in pdf.columns:
            s0 = pdf["_seed"].iloc[0]
            if s0 is not None and not pd.isna(s0):
                e = float(s0)
        res, e_out = scan(vals, e)
        body = pd.DataFrame(
            {
                partition_by: pdf[partition_by],
                "_rn": pdf["_rn"].astype("int64"),
                out: res,
            }
        )
        # marker row (_rn = -1) smuggles the carried accumulator out of
        # the executors; joined into the next pass, filtered from output
        mark = pd.DataFrame({partition_by: [sym], "_rn": [-1], out: [e_out]})
        return pd.concat([body, mark], ignore_index=True)

    def run_arrow(tbl):
        # applyInArrow arm (default on Spark 4): same scan, but the key and
        # _rn buffers are REUSED zero-copy in the output instead of round-
        # tripping through pandas blocks, and the result array is emitted
        # with from_pandas=True (NaN→null), matching what the pandas
        # serializer does to the pandas arm's NaN rows byte-for-byte.
        import pyarrow as pa
        import pyarrow.compute as pc

        tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("_rn", "ascending")]))
        sym_col = tbl.column(partition_by)
        sym = sym_col[0].as_py()
        vals = (
            pc.cast(tbl.column(x), pa.float64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        e = None
        if "_seed" in tbl.column_names:
            s0 = tbl.column("_seed")[0].as_py()
            if s0 is not None and not (isinstance(s0, float) and np.isnan(s0)):
                e = float(s0)
        res, e_out = scan(vals, e)
        rn_col = pc.cast(tbl.column("_rn"), pa.int64())
        return pa.table(
            {
                partition_by: pa.chunked_array(
                    list(sym_col.chunks) + [pa.array([sym], type=sym_col.type)]
                ),
                "_rn": pa.chunked_array(
                    list(rn_col.chunks) + [pa.array([-1], type=pa.int64())]
                ),
                out: pa.chunked_array(
                    [
                        pa.array(res, type=pa.float64(), from_pandas=True),
                        pa.array([e_out], type=pa.float64(), from_pandas=True),
                    ]
                ),
            }
        )

    use_arrow = _use_arrow(df)
    pieces: list[DataFrame] = []
    prev: DataFrame | None = None
    for k in range(int(last_seg) + 1):
        seg = base.where(F.col("_seg") == k).select(partition_by, "_rn", x)
        if prev is not None:
            seeds_df = prev.where(F.col("_rn") == -1).select(
                partition_by, F.col(out).alias("_seed")
            )
            # merge pin: seeds_df is one row per SYMBOL (data-dimension-
            # scaled, estimate-poisoned behind applyInPandas) and this join
            # compiles inside the next pass's persisted subtree — i.e.
            # AQE-less, where a static broadcast would be built for real at
            # any true size (the r8 landmine class). The shuffle is free in
            # context: the join's hash partitioning on the symbol key is
            # exactly the exchange the groupBy.applyInPandas needs next.
            seg = seg.join(seeds_df.hint("merge"), partition_by, "left")
        if use_arrow:
            res = seg.groupBy(partition_by).applyInArrow(run_arrow, schema=schema)
        else:
            res = seg.groupBy(partition_by).applyInPandas(run, schema=schema)
        res = _cache_piece(res, k)
        pieces.append(res.where(F.col("_rn") >= 0))
        prev = res

    return _join_back(base, pieces, partition_by)


def rsi_segmented(
    df: DataFrame,
    x: str = "close",
    p: int = 14,
    out: str = "rsi",
    partition_by: str = "symbol",
    order_by: str = "t",
    segment_rows: int | str = 1_000_000,
) -> DataFrame:
    """Wilder RSI without the one-pandas-frame-per-symbol memory bound —
    bit-equal to ``with_recurrences(..., Rec(out, "rsi", [x], {"p": p}))``
    on null-free input (asserted in tests/test_segmented.py).

    RSI is a pure composition of two Wilder RMA scans over row-local
    transforms: up/dn come from one LAG window (the exchange the pipeline
    already pays), each RMA runs through ``ewma_segmented`` (α = 1/p —
    state-carrying segments, executor memory bounded by ``segment_rows``
    instead of the whole symbol), and the final combine replays the
    kernel's float sequence exactly: 100·au/(au+ad), ad == 0 → 100
    (operators/recurrence.py:163 — momentum.rs:506-541 semantics).

    When to use: an exact exponential fold cannot be parallelized WITHIN
    a symbol (every step depends on the previous), so this does not beat
    the plain scan on wall while the symbol still fits executor memory —
    it makes the billion-row symbol FEASIBLE (per-task memory is one
    segment; wall is n_segments passes, each parallel across symbols).
    For bounded-lookback chains, ``chunked.with_chunked_windows`` is the
    wall-clock answer; this is the unbounded-memory-recurrence one
    (the 256× sequential-history smoke in docs/SCALE.md motivated both)."""
    w = Window.partitionBy(partition_by).orderBy(order_by)
    d = F.col(x) - F.lag(x).over(w)
    diffs = (
        df.withColumn("_d", d)
        .where(F.col("_d").isNotNull())
        .withColumn("_up", F.when(F.col("_d") > 0, F.col("_d")).otherwise(F.lit(0.0)))
        .withColumn("_dn", F.when(F.col("_d") < 0, -F.col("_d")).otherwise(F.lit(0.0)))
    )
    # round-13: ONE fused sweep runs both Wilder RMAs (they are parallel
    # scans over row-local columns) — one base checkpoint and n_segments
    # passes total instead of two of each
    both = _fused_ewma_sweep(
        diffs, ["_up", "_dn"], ["_au", "_ad"], p, 1.0 / p,
        partition_by, order_by, segment_rows,
    )
    rsi = F.when(F.col("_ad") == 0.0, F.lit(100.0)).otherwise(
        F.lit(100.0) * F.col("_au") / (F.col("_au") + F.col("_ad"))
    )
    scored = both.select(
        partition_by, order_by, rsi.alias(out)
    )
    return df.join(scored, [partition_by, order_by], "left")


def atr_segmented(
    df: DataFrame,
    high: str = "high",
    low: str = "low",
    close: str = "close",
    p: int = 14,
    out: str = "atr",
    partition_by: str = "symbol",
    order_by: str = "t",
    segment_rows: int | str = 1_000_000,
) -> DataFrame:
    """ATR = RMA(true range, p) without the per-symbol memory/serial bound —
    bit-equal to ``with_recurrences(..., Rec(out, "atr", ...))`` on
    null-free input. True range is row-local given LAG(close)
    (GREATEST of h−l, |h−prev_c|, |l−prev_c| — the kernel's
    np.maximum.reduce, exact for any double triple), so one window plus
    one state-carrying RMA covers it (operators/recurrence.py:195)."""
    w = Window.partitionBy(partition_by).orderBy(order_by)
    pc = F.lag(close).over(w)
    # gate on the lag BEFORE greatest: Spark's GREATEST skips NULL operands
    # (numpy's maximum.reduce propagates NaN), so an ungated first row would
    # degrade to h−l and poison the RMA seed instead of being dropped
    tr = F.when(
        pc.isNotNull(),
        F.greatest(
            F.col(high) - F.col(low),
            F.abs(F.col(high) - pc),
            F.abs(F.col(low) - pc),
        ),
    )
    rows = df.withColumn("_tr", tr).where(F.col("_tr").isNotNull())
    res = ewma_segmented(
        rows, "_tr", p, alpha=1.0 / p, out=out,
        partition_by=partition_by, order_by=order_by, segment_rows=segment_rows,
    )
    return df.join(
        res.select(partition_by, order_by, out), [partition_by, order_by], "left"
    )


def adx_family_segmented(
    df: DataFrame,
    high: str = "high",
    low: str = "low",
    close: str = "close",
    p: int = 14,
    partition_by: str = "symbol",
    order_by: str = "t",
    segment_rows: int | str = 1_000_000,
) -> DataFrame:
    """The full Wilder DMI/ADX family (±DM, ±DI, DX, ADX, ADXR) without the
    per-symbol memory bound — bit-equal to the ``with_recurrences`` kernels
    on null-free input (operators/recurrence.py:216-308, momentum.rs:668-727).

    Composition: up/dn moves and true range are row-local LAG transforms;
    all FOUR Wilder RMAs (s_pdm, s_mdm, s_tr, and ADX over dx) run in one
    ``_fused_ewma_sweep`` — dx is derived in-kernel from the first three
    chains' outputs with the exact float order of the ±DI/DX SQL
    expressions, and its warm-row NaNs are compacted by the scan itself
    (the kernel seeds on the first p VALID dx values, exactly as the old
    pre-filtered fourth sweep did); ±DI and DX are then the same
    row-local SQL ratios for output (including the warm-row NaN mask —
    Spark's NULL arithmetic mirrors np.where + mask only if DX is
    explicitly nulled while s_tr is, which this does); ADXR is a
    LAG(p−1) average over the full row grid. Adds the seven columns to
    ``df``.

    Same scale contract as ``rsi_segmented``: memory bounded per
    segment; wall is sequential passes — use the plain kernels while a
    symbol fits executor memory."""
    w = Window.partitionBy(partition_by).orderBy(order_by)
    ph, pl, pc = F.lag(high).over(w), F.lag(low).over(w), F.lag(close).over(w)
    up_move = F.col(high) - ph
    dn_move = pl - F.col(low)
    tr = F.when(
        pc.isNotNull(),
        F.greatest(
            F.col(high) - F.col(low),
            F.abs(F.col(high) - pc),
            F.abs(F.col(low) - pc),
        ),
    )
    base = (
        df.withColumn("_pdm", F.when((up_move > dn_move) & (up_move > 0), up_move).otherwise(F.lit(0.0)))
        .withColumn("_mdm", F.when((dn_move > up_move) & (dn_move > 0), dn_move).otherwise(F.lit(0.0)))
        .withColumn("_tr", tr)
        .where(F.col("_tr").isNotNull())
    )
    # round-13: ONE fused sweep runs all four Wilder RMAs — the three
    # parallel DM/TR chains plus ADX's chain over dx, derived in-kernel
    # from their outputs with the exact IEEE op sequence of the SQL
    # expressions below (same doubles in, correctly-rounded *,/ → same
    # doubles out). dx's warm-row NaNs are compacted by the scan itself,
    # reproducing the old pre-filtered 4th sweep's "seed on the first p
    # VALID dx" without re-segmenting. One base checkpoint and n_segments
    # passes total instead of four of each.
    def _dx_chain(res: list) -> np.ndarray:
        spdm, smdm, str_ = res[0], res[1], res[2]
        with np.errstate(divide="ignore", invalid="ignore"):
            pdi = np.where(str_ > 0, 100.0 * spdm / str_, 0.0)
            mdi = np.where(str_ > 0, 100.0 * smdm / str_, 0.0)
            dsum = pdi + mdi
            dx = np.where(dsum > 0, 100.0 * np.abs(pdi - mdi) / dsum, 0.0)
        dx[np.isnan(str_)] = np.nan
        return dx

    sm = _fused_ewma_sweep(
        base, ["_pdm", "_mdm", "_tr", _dx_chain],
        ["_spdm", "_smdm", "_str", "_adx"], p, 1.0 / p,
        partition_by, order_by, segment_rows,
    )
    warm = F.col("_str").isNull()
    pdi = F.when(warm, F.lit(None)).when(
        F.col("_str") > 0, F.lit(100.0) * F.col("_spdm") / F.col("_str")
    ).otherwise(F.lit(0.0))
    mdi = F.when(warm, F.lit(None)).when(
        F.col("_str") > 0, F.lit(100.0) * F.col("_smdm") / F.col("_str")
    ).otherwise(F.lit(0.0))
    scored = sm.withColumn("_pdi", pdi).withColumn("_mdi", mdi)
    dsum = F.col("_pdi") + F.col("_mdi")
    dx = F.when(warm, F.lit(None)).when(
        dsum > 0, F.lit(100.0) * F.abs(F.col("_pdi") - F.col("_mdi")) / dsum
    ).otherwise(F.lit(0.0))
    scored = scored.withColumn("_dx", dx)
    cols = [
        ("_spdm", "plus_dm"), ("_smdm", "minus_dm"), ("_pdi", "plus_di"),
        ("_mdi", "minus_di"), ("_dx", "dx"),
    ]
    out = df.join(
        scored.select(partition_by, order_by, *[c for c, _ in cols], "_adx"),
        [partition_by, order_by],
        "left",
    )
    adxr = (F.col("_adx") + F.lag("_adx", p - 1).over(w)) / F.lit(2.0)
    return (
        out.withColumn("_adxr", adxr)
        .select(
            *df.columns,
            *[F.col(c).alias(n) for c, n in cols],
            F.col("_adx").alias("adx"),
            F.col("_adxr").alias("adxr"),
        )
    )


def _chained_emas(
    df: DataFrame,
    x: str,
    p: int,
    depth: int,
    partition_by: str,
    order_by: str,
    segment_rows: int | str,
) -> DataFrame:
    """Run ``depth`` SMA-seeded EMA scans, each over the previous output's
    VALID rows — the exact composition of the plain kernels, whose
    ``_compact_apply`` re-compacts warm-up NaNs before every chained scan.
    Adds columns _e1.._e{depth}.

    Round-13 optimization: ONE fused segmented sweep instead of ``depth``
    sequential ``ewma_segmented`` calls. The old composition paid depth ×
    (base checkpoint + max(_rn) action + n_segments passes + join-back) —
    ~60 stages for T3's six chains, 12.9 s at sf0.1 where the plain kernel
    runs in ~0.5 s, and at true scale depth full re-reads of the corpus.
    The fused sweep pays ONE base and n_segments passes total; each pass
    runs all ``depth`` chains on the segment in-process (chain i's input
    is chain i−1's output array, exactly as the plain ``t3`` kernel
    composes them) and carries per-chain resume state across segments:

    * ``(seen, psum)`` while a chain is still inside its SMA warm-up —
      ``np.cumsum`` seeded by prepending the carried partial sum replays
      the identical left-to-right adds, so a seed window spanning a
      segment boundary sums in the unsegmented order (the old per-chain
      re-segmentation never had a spanning seed; the carry makes the cut
      position irrelevant instead);
    * the accumulator ``e`` once seeded — the ewm tail resumes from it
      (the module's standing exactness argument, unchanged).

    Chain outputs are NaN-prefix + valid-tail on null-free input; the
    kernel still compacts by mask (not prefix-assumption), mirroring
    ``_compact_apply``. Bit-equality vs the plain chain is pinned by the
    existing dema/tema/t3 segmented tests plus the boundary-spanning-seed
    case in tests/test_segmented.py."""
    outs = [f"_e{i}" for i in range(1, depth + 1)]
    return _fused_ewma_sweep(
        df, [x] + list(range(depth - 1)), outs, p, 2.0 / (p + 1),
        partition_by, order_by, segment_rows,
    )


def _fused_ewma_sweep(
    df: DataFrame,
    srcs: list,
    outs: list[str],
    p: int | list[int],
    alpha: float | list[float],
    partition_by: str,
    order_by: str,
    segment_rows: int | str,
) -> DataFrame:
    """One segmented sweep running len(outs) SMA-seeded exponential scans
    with shared scaffolding (one base checkpoint, one pass per segment).
    ``srcs[i]`` names chain i's input: a df COLUMN NAME (str), the INDEX
    of an earlier chain whose output feeds it — so ``[x, 0, 1]`` is the
    TEMA chain and ``["_up", "_dn"]`` is RSI's two parallel Wilder RMAs —
    or a CALLABLE of the earlier-output list (row-local derivation, e.g.
    ADX's dx from the three smoothed DM/TR chains; NaN entries are
    compacted by the scan exactly as a pre-filtered frame would be).
    ``p``/``alpha`` are scalars (every chain, the common case) or
    per-chain lists — heterogeneous (p, α) is what lets DIFFERENT
    indicator families (Wilder α=1/p next to EMA α=2/(p+1)) share one
    sweep (``indicator_family_segmented``). Exactness: the per-chain
    (seen, partial-sum, accumulator) carry of ``_chained_emas`` (see its
    docstring), per chain — the carry makes the fold independent of WHERE
    the segment cuts fall, which is what lets a derived chain reuse the
    base segmentation instead of re-segmenting its own filtered frame."""
    depth = len(outs)
    ps = list(p) if isinstance(p, (list, tuple)) else [int(p)] * depth
    alphas = (
        list(alpha) if isinstance(alpha, (list, tuple)) else [float(alpha)] * depth
    )
    if len(ps) != depth or len(alphas) != depth:
        raise ValueError("per-chain p/alpha lists must match len(outs)")
    base, last_seg, segment_rows = _segmented_base(
        df, partition_by, order_by, segment_rows
    )
    if segment_rows < max(ps):
        raise ValueError(
            f"segment_rows ({segment_rows}) must be >= max p ({max(ps)})"
        )
    if last_seg is None:
        cur = df
        for o in outs:
            cur = cur.withColumn(o, F.lit(None).cast("double"))
        return cur
    in_cols = sorted({s for s in srcs if isinstance(s, str)})

    schema = StructType(
        [
            df.schema[partition_by],
            StructField("_rn", LongType()),
            *[StructField(o, DoubleType()) for o in outs],
            # resume state, marker rows only: [seen, psum, e] × depth
            StructField("_st", DoubleType(), True),
        ]
    )
    n_st = 3 * depth

    def scan_chains(fetch, st: list, n: int):
        """The per-group chain loop, shared bit-identically by both arms.
        ``fetch(name)`` returns a column as float64 ndarray (null→NaN);
        mutates ``st`` in place and returns the per-chain output arrays."""
        res_list: list[np.ndarray] = []
        res_cols = {}
        for i in range(depth):
            s = srcs[i]
            p, alpha = ps[i], alphas[i]
            if isinstance(s, str):
                cur = fetch(s)
            elif callable(s):
                cur = s(res_list)
            else:
                cur = res_list[s]
            seen, psum, e = st[3 * i], st[3 * i + 1], st[3 * i + 2]
            out = np.full(n, np.nan)
            pos = np.flatnonzero(~np.isnan(cur))
            w = cur[pos]
            # warm-up is `seen < p`, NOT `isnan(e)` (ADVICE r13): a chain
            # whose accumulator went NaN AFTER seeding (inf/degenerate
            # inputs propagating through the ewm) must take the resume
            # branch — whose NaN-seeded ewm restarts at the next valid
            # value exactly like the single-group kernel's one continuous
            # ewm does after an interior NaN — instead of re-entering
            # warm-up with need == 0 and writing a bogus psum/p re-seed
            # onto the segment's last valid row.
            if seen < p:
                need = int(p - seen)
                if len(w) < need:
                    if len(w):
                        psum = float(
                            np.cumsum(np.concatenate(([psum], w)))[-1]
                            if seen
                            else np.cumsum(w)[-1]
                        )
                        seen += len(w)
                else:
                    head = w[:need]
                    psum = float(
                        np.cumsum(np.concatenate(([psum], head)))[-1]
                        if seen
                        else np.cumsum(head)[-1]
                    )
                    e = psum / p
                    out[pos[need - 1]] = e
                    tail = w[need:]
                    if len(tail):
                        z = np.empty(len(tail) + 1)
                        z[0] = e
                        z[1:] = tail
                        r = (
                            pd.Series(z)
                            .ewm(alpha=alpha, adjust=False)
                            .mean()
                            .to_numpy()[1:]
                        )
                        out[pos[need:]] = r
                        e = float(r[-1])
                    seen, psum = float(p), 0.0
            else:
                if len(w):
                    z = np.empty(len(w) + 1)
                    z[0] = e
                    z[1:] = w
                    r = (
                        pd.Series(z)
                        .ewm(alpha=alpha, adjust=False)
                        .mean()
                        .to_numpy()[1:]
                    )
                    out[pos] = r
                    e = float(r[-1])
            st[3 * i], st[3 * i + 1], st[3 * i + 2] = seen, psum, e
            res_cols[outs[i]] = out
            res_list.append(out)
        return res_cols

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_rn", kind="mergesort").reset_index(drop=True)
        sym = pdf[partition_by].iloc[0]
        n = len(pdf)
        # carried state arrives as _seed_0.._seed_{3·depth−1} columns
        # (absent on pass 0)
        if "_seed_0" in pdf.columns:
            st = [float(pdf[f"_seed_{j}"].iloc[0]) for j in range(n_st)]
        else:
            st = [0.0, 0.0, np.nan] * depth
        res_cols = scan_chains(
            lambda c: pdf[c].to_numpy(dtype="float64", na_value=np.nan), st, n
        )
        body = pd.DataFrame(
            {
                partition_by: pdf[partition_by],
                "_rn": pdf["_rn"].astype("int64"),
                **res_cols,
                "_st": np.full(n, np.nan),
            }
        )
        # marker rows (_rn = −1−j) smuggle the resume state out of the
        # executors: state scalar j rides the _st column of marker row j
        marks = pd.DataFrame(
            {
                partition_by: [sym] * n_st,
                "_rn": [-1 - j for j in range(n_st)],
                **{o: [np.nan] * n_st for o in outs},
                "_st": st,
            }
        )
        return pd.concat([body, marks], ignore_index=True)

    def run_arrow(tbl):
        # applyInArrow arm (default on Spark 4): identical scan; key/_rn
        # buffers reused zero-copy, outputs emitted with from_pandas=True
        # (NaN→null) to match the pandas serializer's treatment of the
        # pandas arm's NaN rows. See ewma_segmented.run_arrow.
        import pyarrow as pa
        import pyarrow.compute as pc

        tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("_rn", "ascending")]))
        n = tbl.num_rows
        sym_col = tbl.column(partition_by)
        sym = sym_col[0].as_py()
        if "_seed_0" in tbl.column_names:
            st = []
            for j in range(n_st):
                v = tbl.column(f"_seed_{j}")[0].as_py()
                st.append(np.nan if v is None else float(v))
        else:
            st = [0.0, 0.0, np.nan] * depth
        res_cols = scan_chains(
            lambda c: pc.cast(tbl.column(c), pa.float64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False),
            st,
            n,
        )
        rn_col = pc.cast(tbl.column("_rn"), pa.int64())
        f64 = pa.float64()
        cols = {
            partition_by: pa.chunked_array(
                list(sym_col.chunks) + [pa.array([sym] * n_st, type=sym_col.type)]
            ),
            "_rn": pa.chunked_array(
                list(rn_col.chunks)
                + [pa.array([-1 - j for j in range(n_st)], type=pa.int64())]
            ),
        }
        for o in outs:
            cols[o] = pa.chunked_array(
                [
                    pa.array(res_cols[o], type=f64, from_pandas=True),
                    pa.nulls(n_st, f64),
                ]
            )
        cols["_st"] = pa.chunked_array(
            [pa.nulls(n, f64), pa.array(st, type=f64, from_pandas=True)]
        )
        return pa.table(cols)

    use_arrow = _use_arrow(df)
    pieces: list[DataFrame] = []
    prev: DataFrame | None = None
    for k in range(int(last_seg) + 1):
        seg = base.where(F.col("_seg") == k).select(partition_by, "_rn", *in_cols)
        if prev is not None:
            # pivot the marker rows back to one row of _seed_j columns per
            # symbol; merge pin for the ewma_segmented seed-join reasons
            seeds_df = prev.where(F.col("_rn") < 0).groupBy(partition_by).agg(
                *[
                    F.max(F.when(F.col("_rn") == -1 - j, F.col("_st"))).alias(
                        f"_seed_{j}"
                    )
                    for j in range(n_st)
                ]
            )
            seg = seg.join(seeds_df.hint("merge"), partition_by, "left")
        if use_arrow:
            res = seg.groupBy(partition_by).applyInArrow(run_arrow, schema=schema)
        else:
            res = seg.groupBy(partition_by).applyInPandas(run, schema=schema)
        res = _cache_piece(res, k)
        pieces.append(res.where(F.col("_rn") >= 0).drop("_st"))
        prev = res

    merged = pieces[0]
    for piece in pieces[1:]:
        merged = merged.unionByName(piece)
    return base.join(merged, [partition_by, "_rn"], "left").drop("_seg", "_rn")


def dema_segmented(
    df: DataFrame,
    x: str = "close",
    p: int = 30,
    out: str = "dema",
    partition_by: str = "symbol",
    order_by: str = "t",
    segment_rows: int | str = 1_000_000,
) -> DataFrame:
    """2·EMA − EMA(EMA) without the per-symbol memory bound — bit-equal to
    ``with_recurrences(..., Rec(out, "dema", ...))`` on null-free input
    (operators/recurrence.py:91, overlap.rs:543-658). Two state-carrying
    EMA chains + one row-local combine in the kernel's float order."""
    ch = _chained_emas(df, x, p, 2, partition_by, order_by, segment_rows)
    val = F.lit(2.0) * F.col("_e1") - F.col("_e2")
    return df.join(
        ch.select(partition_by, order_by, val.alias(out)),
        [partition_by, order_by],
        "left",
    )


def tema_segmented(
    df: DataFrame,
    x: str = "close",
    p: int = 30,
    out: str = "tema",
    partition_by: str = "symbol",
    order_by: str = "t",
    segment_rows: int | str = 1_000_000,
) -> DataFrame:
    """3·E1 − 3·E2 + E3, segmented (operators/recurrence.py:98,
    overlap.rs:1177-1311) — three chains, kernel float order."""
    ch = _chained_emas(df, x, p, 3, partition_by, order_by, segment_rows)
    val = F.lit(3.0) * F.col("_e1") - F.lit(3.0) * F.col("_e2") + F.col("_e3")
    return df.join(
        ch.select(partition_by, order_by, val.alias(out)),
        [partition_by, order_by],
        "left",
    )


def t3_segmented(
    df: DataFrame,
    x: str = "close",
    p: int = 5,
    vfactor: float = 0.7,
    out: str = "t3",
    partition_by: str = "symbol",
    order_by: str = "t",
    segment_rows: int | str = 1_000_000,
) -> DataFrame:
    """Tillson T3 (SIX chained SMA-seeded EMAs + GD coefficients),
    segmented (operators/recurrence.py:106, overlap.rs:939-1175). The
    deepest chain composition in the family — only practical because each
    chain's base plan is checkpoint-truncated; coefficients are computed
    in Python doubles, identical to the kernel's."""
    v = vfactor
    c1 = -(v ** 3)
    c2 = 3.0 * v ** 2 + 3.0 * v ** 3
    c3 = -6.0 * v ** 2 - 3.0 * v - 3.0 * v ** 3
    c4 = 1.0 + 3.0 * v + v ** 3 + 3.0 * v ** 2
    ch = _chained_emas(df, x, p, 6, partition_by, order_by, segment_rows)
    val = (
        F.lit(c1) * F.col("_e6")
        + F.lit(c2) * F.col("_e5")
        + F.lit(c3) * F.col("_e4")
        + F.lit(c4) * F.col("_e3")
    )
    return df.join(
        ch.select(partition_by, order_by, val.alias(out)),
        [partition_by, order_by],
        "left",
    )


def indicator_family_segmented(
    df: DataFrame,
    high: str = "high",
    low: str = "low",
    close: str = "close",
    rsi_p: int = 14,
    atr_p: int = 14,
    adx_p: int = 14,
    t3_p: int = 5,
    t3_vfactor: float = 0.7,
    partition_by: str = "symbol",
    order_by: str = "t",
    segment_rows: int | str = 1_000_000,
) -> DataFrame:
    """RSI + ATR + the full Wilder DMI/ADX family + T3 in **one** fused
    segmented sweep — the combined multi-indicator shape that previously
    paid four separate ops: 4 base checkpoints, 4 max(_rn) actions,
    4 × n_segments group passes and 4 join-backs over the same corpus
    (round-14, VERDICT r13 #5). Bit-equal to composing
    ``rsi_segmented`` / ``atr_segmented`` / ``adx_family_segmented`` /
    ``t3_segmented`` (asserted in tests/test_segmented.py), which are
    themselves bit-equal to the plain ``with_recurrences`` kernels on
    null-free input.

    How the fusion stays exact: every source column is NULL-GATED in one
    projection over the shared LAG window (a null input row is what the
    per-op versions' ``.where`` filters dropped; the sweep's scan compacts
    NaN entries exactly as a pre-filtered frame would), and the sweep's
    per-chain (p, α) support runs Wilder α=1/p chains next to T3's six
    α=2/(p+1) chains in the same pass. ATR is RMA(_tr, atr_p) — when
    ``atr_p == adx_p`` it is literally ADX's ``_str`` chain (one chain
    serves both outputs); otherwise it gets its own chain. DX derives
    in-kernel from the smoothed DM/TR chains with the exact IEEE op order
    of the output SQL (see ``adx_family_segmented``).

    Adds: rsi, atr, plus_dm, minus_dm, plus_di, minus_di, dx, adx, adxr,
    t3. Same scale contract as the per-op versions: per-task memory is one
    segment; wall is n_segments passes — but ONE set of them."""
    w = Window.partitionBy(partition_by).orderBy(order_by)
    d = F.col(close) - F.lag(close).over(w)
    ph, pl, pc = F.lag(high).over(w), F.lag(low).over(w), F.lag(close).over(w)
    up_move = F.col(high) - ph
    dn_move = pl - F.col(low)
    tr = F.when(
        pc.isNotNull(),
        F.greatest(
            F.col(high) - F.col(low),
            F.abs(F.col(high) - pc),
            F.abs(F.col(low) - pc),
        ),
    )
    # Null-gating (the per-op versions FILTER these rows out; here the
    # scan compacts the NaNs instead): _up/_dn are null where d is null,
    # _pdm/_mdm null where tr is null — `.otherwise(0.0)` alone would
    # turn those rows into spurious 0.0 observations.
    base = (
        df.withColumn("_d", d)
        .withColumn(
            "_up",
            F.when(F.col("_d") > 0, F.col("_d")).when(
                F.col("_d").isNotNull(), F.lit(0.0)
            ),
        )
        .withColumn(
            "_dn",
            F.when(F.col("_d") < 0, -F.col("_d")).when(
                F.col("_d").isNotNull(), F.lit(0.0)
            ),
        )
        .withColumn("_tr", tr)
        .withColumn(
            "_pdm",
            F.when(
                tr.isNotNull(),
                F.when(
                    (up_move > dn_move) & (up_move > 0), up_move
                ).otherwise(F.lit(0.0)),
            ),
        )
        .withColumn(
            "_mdm",
            F.when(
                tr.isNotNull(),
                F.when(
                    (dn_move > up_move) & (dn_move > 0), dn_move
                ).otherwise(F.lit(0.0)),
            ),
        )
        .drop("_d")
    )

    def _dx_chain(res: list) -> np.ndarray:
        # identical float order to adx_family_segmented._dx_chain — res
        # indices shifted to this sweep's chain layout (2=_spdm, 3=_smdm,
        # 4=_str)
        spdm, smdm, str_ = res[2], res[3], res[4]
        with np.errstate(divide="ignore", invalid="ignore"):
            pdi = np.where(str_ > 0, 100.0 * spdm / str_, 0.0)
            mdi = np.where(str_ > 0, 100.0 * smdm / str_, 0.0)
            dsum = pdi + mdi
            dx = np.where(dsum > 0, 100.0 * np.abs(pdi - mdi) / dsum, 0.0)
        dx[np.isnan(str_)] = np.nan
        return dx

    wilder_r, wilder_a = 1.0 / rsi_p, 1.0 / adx_p
    ema_a = 2.0 / (t3_p + 1)
    srcs: list = ["_up", "_dn", "_pdm", "_mdm", "_tr", _dx_chain]
    outs = ["_au", "_ad", "_spdm", "_smdm", "_str", "_adx"]
    ps = [rsi_p, rsi_p, adx_p, adx_p, adx_p, adx_p]
    alphas = [wilder_r, wilder_r, wilder_a, wilder_a, wilder_a, wilder_a]
    if atr_p != adx_p:
        srcs.append("_tr")
        outs.append("_atr")
        ps.append(atr_p)
        alphas.append(1.0 / atr_p)
    t3_first = len(outs)
    srcs += [close] + list(range(t3_first, t3_first + 5))
    outs += [f"_e{i}" for i in range(1, 7)]
    ps += [t3_p] * 6
    alphas += [ema_a] * 6

    sm = _fused_ewma_sweep(
        base, srcs, outs, ps, alphas, partition_by, order_by, segment_rows
    )

    # row-local output SQL — copied verbatim from the per-op versions so
    # the float order (and NULL masks) are identical
    rsi = F.when(F.col("_ad") == 0.0, F.lit(100.0)).otherwise(
        F.lit(100.0) * F.col("_au") / (F.col("_au") + F.col("_ad"))
    )
    warm = F.col("_str").isNull()
    pdi = F.when(warm, F.lit(None)).when(
        F.col("_str") > 0, F.lit(100.0) * F.col("_spdm") / F.col("_str")
    ).otherwise(F.lit(0.0))
    mdi = F.when(warm, F.lit(None)).when(
        F.col("_str") > 0, F.lit(100.0) * F.col("_smdm") / F.col("_str")
    ).otherwise(F.lit(0.0))
    scored = sm.withColumn("_pdi", pdi).withColumn("_mdi", mdi)
    dsum = F.col("_pdi") + F.col("_mdi")
    dx = F.when(warm, F.lit(None)).when(
        dsum > 0, F.lit(100.0) * F.abs(F.col("_pdi") - F.col("_mdi")) / dsum
    ).otherwise(F.lit(0.0))
    v = t3_vfactor
    c1 = -(v ** 3)
    c2 = 3.0 * v ** 2 + 3.0 * v ** 3
    c3 = -6.0 * v ** 2 - 3.0 * v - 3.0 * v ** 3
    c4 = 1.0 + 3.0 * v + v ** 3 + 3.0 * v ** 2
    t3 = (
        F.lit(c1) * F.col("_e6")
        + F.lit(c2) * F.col("_e5")
        + F.lit(c3) * F.col("_e4")
        + F.lit(c4) * F.col("_e3")
    )
    atr_col = F.col("_str") if atr_p == adx_p else F.col("_atr")
    scored = scored.withColumn("_dx", dx)
    adxr = (F.col("_adx") + F.lag("_adx", adx_p - 1).over(w)) / F.lit(2.0)
    return scored.select(
        *df.columns,
        rsi.alias("rsi"),
        atr_col.alias("atr"),
        F.col("_spdm").alias("plus_dm"),
        F.col("_smdm").alias("minus_dm"),
        F.col("_pdi").alias("plus_di"),
        F.col("_mdi").alias("minus_di"),
        F.col("_dx").alias("dx"),
        F.col("_adx").alias("adx"),
        adxr.alias("adxr"),
        t3.alias("t3"),
    )


def kama_segmented(
    df: DataFrame,
    x: str = "close",
    p: int = 30,
    out: str = "kama",
    partition_by: str = "symbol",
    order_by: str = "t",
    segment_rows: int | str = 1_000_000,
) -> DataFrame:
    """Kaufman adaptive MA without the per-symbol memory bound — bit-equal
    to ``with_recurrences(..., Rec(out, "kama", ...))`` on null-free input
    (operators/recurrence.py:123, overlap.rs:732-855).

    KAMA is the family's hardest case: the fold is NONLINEAR
    (data-dependent smoothing constant) and each step needs the trailing
    p+1 raw values for the efficiency ratio — a scalar carry alone is not
    enough. Each continuation pass therefore ships TWO things: the carried
    accumulator k (marker-row join, as in ``ewma_segmented``) and a p-row
    HALO of the previous segment's tail (sliced from the SAME checkpointed
    base — no extra lineage), so every body row can rebuild its exact
    ER window locally; halo rows are dropped from the output. The
    continuation replays the kernel's per-step arithmetic verbatim
    (including the chunked row-wise cumsum volatility and libm ``** 2``),
    so the composition is bit-exact across segment boundaries.

    Requires ``segment_rows ≥ p + 1`` (the kernel emits nothing for
    n < p+1, so a p-row segment 0 would diverge from the whole-symbol
    scan). Same scale contract as the rest of the module: executor memory
    bounded by segment + halo; wall is n_segments sequential passes."""
    from polars_quant_spark.operators.recurrence import kama as _kama_dense

    base, last_seg, segment_rows = _segmented_base(df, partition_by, order_by, segment_rows)
    if segment_rows < p + 1:
        raise ValueError(f"segment_rows ({segment_rows}) must be >= p + 1 ({p + 1})")
    if last_seg is None:
        return df.withColumn(out, F.lit(None).cast("double"))

    schema = StructType(
        [
            df.schema[partition_by],
            StructField("_rn", LongType()),
            StructField(out, DoubleType()),
        ]
    )
    fast_sc, slow_sc = 2.0 / 3.0, 2.0 / 31.0

    def scan(vals: np.ndarray, halo_n: int, seed):
        """The per-group body, shared bit-identically by both arms:
        (values incl. halo rows, halo count, carried k | None) →
        (body results, carry-out, body start index)."""
        if seed is None or halo_n < p:
            # pass 0 (or the unreachable lost-seed case, see docstring):
            # the kernel's own scan over the dense segment
            res = _kama_dense(vals, p)
            valid = np.where(~np.isnan(res))[0]
            k_out = float(res[valid[-1]]) if valid.size else np.nan
            return res, k_out, 0
        n = vals.shape[0]
        nb = n - halo_n
        adiff = np.abs(np.diff(vals))
        vol = np.empty(nb)
        win = np.lib.stride_tricks.sliding_window_view(adiff, p)
        step = max(1, 4_000_000 // p)
        for lo in range(0, nb, step):
            hi = min(lo + step, nb)
            vol[lo:hi] = win[lo:hi].cumsum(axis=1)[:, -1]
        with np.errstate(invalid="ignore", divide="ignore"):
            er = np.where(vol > 0, np.abs(vals[p:] - vals[:-p]) / vol, 0.0)
        k = seed
        res = np.empty(nb)
        for j in range(nb):
            sc = (er[j] * (fast_sc - slow_sc) + slow_sc) ** 2
            k = k + sc * (vals[p + j] - k)
            res[j] = k
        k_out = float(k) if nb else seed
        return res, k_out, halo_n

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_rn", kind="mergesort").reset_index(drop=True)
        sym = pdf[partition_by].iloc[0]
        halo_n = int(pdf["_halo"].sum()) if "_halo" in pdf.columns else 0
        if halo_n and halo_n == len(pdf):
            # Halo-only group (ADVICE r10, high): a symbol whose total row
            # count lands in the halo window (lo-p, lo] of this segment
            # boundary — uneven symbol lengths. Every row here was already
            # emitted by the previous pass's body and no body rows remain;
            # the dense fallback would re-emit the halo rows as NaN
            # duplicates (halo_n < p) and the continuation path would crash
            # sliding_window_view (halo_n == p, nb == 0). Emit nothing: no
            # later segment slices this symbol, so no marker is needed.
            return pd.DataFrame(
                {
                    partition_by: pdf[partition_by].iloc[:0],
                    "_rn": pdf["_rn"].iloc[:0].astype("int64"),
                    out: np.empty(0, dtype="float64"),
                }
            )
        vals = pdf[x].to_numpy(dtype="float64", na_value=np.nan)
        seed = None
        if "_seed" in pdf.columns:
            s0 = pdf["_seed"].iloc[0]
            if s0 is not None and not pd.isna(s0):
                seed = float(s0)
        res, k_out, start = scan(vals, halo_n, seed)
        body = pdf.iloc[start:]
        bdf = pd.DataFrame(
            {
                partition_by: body[partition_by],
                "_rn": body["_rn"].astype("int64"),
                out: res,
            }
        )
        mark = pd.DataFrame({partition_by: [sym], "_rn": [-1], out: [k_out]})
        return pd.concat([bdf, mark], ignore_index=True)

    def run_arrow(tbl):
        # applyInArrow arm (round-14 default on Spark 4): identical scan;
        # key/_rn buffers reused zero-copy, outputs emitted with
        # from_pandas=True (NaN→null) to match the pandas serializer's
        # treatment of the pandas arm's NaN rows. See ewma_segmented.
        import pyarrow as pa
        import pyarrow.compute as pc

        tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("_rn", "ascending")]))
        n = tbl.num_rows
        sym_col = tbl.column(partition_by)
        sym = sym_col[0].as_py()
        rn_col = pc.cast(tbl.column("_rn"), pa.int64())
        halo_n = (
            int(pc.sum(tbl.column("_halo")).as_py() or 0)
            if "_halo" in tbl.column_names
            else 0
        )
        if halo_n and halo_n == n:
            # halo-only group: emit nothing (see the pandas arm's comment)
            return pa.table(
                {
                    partition_by: sym_col.slice(0, 0),
                    "_rn": rn_col.slice(0, 0),
                    out: pa.array([], type=pa.float64()),
                }
            )
        vals = (
            pc.cast(tbl.column(x), pa.float64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        seed = None
        if "_seed" in tbl.column_names:
            s0 = tbl.column("_seed")[0].as_py()
            if s0 is not None and not (isinstance(s0, float) and np.isnan(s0)):
                seed = float(s0)
        res, k_out, start = scan(vals, halo_n, seed)
        body_sym = sym_col.slice(start)
        body_rn = rn_col.slice(start)
        return pa.table(
            {
                partition_by: pa.chunked_array(
                    list(body_sym.chunks) + [pa.array([sym], type=sym_col.type)]
                ),
                "_rn": pa.chunked_array(
                    list(body_rn.chunks) + [pa.array([-1], type=pa.int64())]
                ),
                out: pa.chunked_array(
                    [
                        pa.array(res, type=pa.float64(), from_pandas=True),
                        pa.array([k_out], type=pa.float64(), from_pandas=True),
                    ]
                ),
            }
        )

    use_arrow = _use_arrow(df)
    s_rows = segment_rows
    pieces: list[DataFrame] = []
    prev: DataFrame | None = None
    for k in range(int(last_seg) + 1):
        lo = k * s_rows
        if k == 0:
            seg = base.where(F.col("_seg") == 0).select(
                partition_by, "_rn", x, F.lit(0).alias("_halo")
            )
        else:
            seg = base.where(
                (F.col("_rn") > lo - p) & (F.col("_rn") <= lo + s_rows)
            ).select(
                partition_by, "_rn", x,
                F.when(F.col("_rn") <= lo, 1).otherwise(0).alias("_halo"),
            )
        if prev is not None:
            seeds_df = prev.where(F.col("_rn") == -1).select(
                partition_by, F.col(out).alias("_seed")
            )
            seg = seg.join(seeds_df.hint("merge"), partition_by, "left")
        if use_arrow:
            res = seg.groupBy(partition_by).applyInArrow(run_arrow, schema=schema)
        else:
            res = seg.groupBy(partition_by).applyInPandas(run, schema=schema)
        res = _cache_piece(res, k)
        pieces.append(res.where(F.col("_rn") >= 0))
        prev = res

    return _join_back(base, pieces, partition_by)


# ---------------------------------------------------------------------------
# Parabolic SAR family (the last with_recurrences kernels without a
# memory-bounded escape — VERDICT r10 #3)
# ---------------------------------------------------------------------------


class _SarParams:
    """Step-rule constants shared by the SAR/SAREXT scans. Plain SAR is
    SAREXT with symmetric schedules, offset 0 and unsigned output:
    ``ep * (1.0 + 0.0)`` is ``ep * 1.0`` which IEEE-754 guarantees equals
    ``ep`` bit-for-bit, so one scan serves both kernels verbatim."""

    __slots__ = (
        "startvalue", "offset", "init_long", "inc_long", "max_long",
        "init_short", "inc_short", "max_short", "signed",
    )

    def __init__(self, startvalue, offset, init_long, inc_long, max_long,
                 init_short, inc_short, max_short, signed):
        self.startvalue = startvalue
        self.offset = offset
        self.init_long = init_long
        self.inc_long = inc_long
        self.max_long = max_long
        self.init_short = init_short
        self.inc_short = inc_short
        self.max_short = max_short
        self.signed = signed


def _sar_scan(hh, ll, state, i0, p):
    """Replay ``recurrence.sar``/``sarext`` iterations ``i0..n-1`` from an
    optional carried state (operators/recurrence.py:398,639 — identical
    per-step arithmetic and branch order). ``state`` is (long, s, ep, af)
    at the end of the previous iteration; None means segment 0, where the
    kernel's own trend seeding runs (startvalue sign for SAREXT, bar-1
    range comparison otherwise) and the loop starts at i=1. Returns
    (out, state_out); state_out is None only when n < 2 on segment 0 (the
    kernel emits nothing there)."""
    n = hh.shape[0]
    out = np.full(n, np.nan)
    if state is None:
        if n < 2:
            return out, None
        if p.startvalue > 0:
            long_, s = True, p.startvalue
        elif p.startvalue < 0:
            long_, s = False, -p.startvalue
        else:
            long_ = (hh[1] - hh[0]) >= (ll[0] - ll[1])
            s = ll[0] if long_ else hh[0]
        ep = hh[1] if long_ else ll[1]
        af = p.init_long if long_ else p.init_short
        i0 = 1
    else:
        long_, s, ep, af = state
    for i in range(i0, n):
        s = s + af * (ep - s)
        if long_:
            s = min(s, ll[i - 1], ll[max(i - 2, 0)])
            if ll[i] < s:  # reverse to short
                s = ep * (1.0 + p.offset)
                ep = ll[i]
                af = p.init_short
                long_ = False
            elif hh[i] > ep:
                ep = hh[i]
                af = min(af + p.inc_long, p.max_long)
        else:
            s = max(s, hh[i - 1], hh[max(i - 2, 0)])
            if hh[i] > s:  # reverse to long
                s = ep * (1.0 - p.offset)
                ep = hh[i]
                af = p.init_long
                long_ = True
            elif ll[i] < ep:
                ep = ll[i]
                af = min(af + p.inc_short, p.max_short)
        out[i] = (s if long_ else -s) if p.signed else s
    return out, (long_, s, ep, af)


def _sar_family_segmented(
    df: DataFrame,
    high: str,
    low: str,
    p: _SarParams,
    out: str,
    partition_by: str,
    order_by: str,
    segment_rows: int | str,
) -> DataFrame:
    """Shared state+halo plumbing for ``sar_segmented``/``sarext_segmented``
    (the ``kama_segmented`` pattern). The SAR fold is a 4-tuple state
    machine — (long, s, ep, af) — whose clamp reads the trailing TWO bars'
    high/low, so each continuation pass ships:

    * the carried state on FOUR marker rows (_rn −1..−4 = long/s/ep/af —
      the ewma marker generalized; pivoted back to columns by a per-symbol
      aggregate that rides the same symbol-key exchange the next pass's
      groupBy needs), and
    * a 2-row halo of the previous segment's tail (sliced from the SAME
      checkpointed base), so steps at the boundary rebuild their exact
      ``ll[i-1], ll[i-2]`` clamp window locally; halo rows are dropped
      from the output.

    Halo-only groups (symbols whose total length lands in (lo-2, lo]) are
    excluded the same way as kama_segmented's ADVICE-r10 fix: every such
    row was already emitted by the previous pass. Same scale contract as
    the module: executor memory bounded by segment + halo; wall is
    n_segments sequential passes."""
    base, last_seg, segment_rows = _segmented_base(df, partition_by, order_by, segment_rows)
    if segment_rows < 2:
        raise ValueError(f"segment_rows ({segment_rows}) must be >= 2")
    if last_seg is None:
        return df.withColumn(out, F.lit(None).cast("double"))

    schema = StructType(
        [
            df.schema[partition_by],
            StructField("_rn", LongType()),
            StructField(out, DoubleType()),
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_rn", kind="mergesort").reset_index(drop=True)
        sym = pdf[partition_by].iloc[0]
        halo_n = int(pdf["_halo"].sum()) if "_halo" in pdf.columns else 0
        if halo_n and halo_n == len(pdf):
            # halo-only group: symbol ended at/inside this boundary's halo
            # window — previous pass emitted everything (see kama_segmented)
            return pd.DataFrame(
                {
                    partition_by: pdf[partition_by].iloc[:0],
                    "_rn": pdf["_rn"].iloc[:0].astype("int64"),
                    out: np.empty(0, dtype="float64"),
                }
            )
        hh = pdf[high].to_numpy(dtype="float64", na_value=np.nan)
        ll = pdf[low].to_numpy(dtype="float64", na_value=np.nan)
        state = None
        if "_ss" in pdf.columns:
            sv = pdf["_ss"].iloc[0]
            if sv is not None and not pd.isna(sv):
                state = (
                    bool(pdf["_sl"].iloc[0]),
                    float(sv),
                    float(pdf["_sep"].iloc[0]),
                    float(pdf["_saf"].iloc[0]),
                )
        if state is None:
            # pass 0 (or the unreachable lost-seed case): kernel seeding
            res, st_out = _sar_scan(hh, ll, None, 1, p)
            body = pdf
        else:
            res_full, st_out = _sar_scan(hh, ll, state, halo_n, p)
            res = res_full[halo_n:]
            body = pdf.iloc[halo_n:]
        bdf = pd.DataFrame(
            {
                partition_by: body[partition_by],
                "_rn": body["_rn"].astype("int64"),
                out: res,
            }
        )
        lg, s, ep, af = st_out if st_out is not None else (
            np.nan, np.nan, np.nan, np.nan
        )
        mark = pd.DataFrame(
            {
                partition_by: [sym] * 4,
                "_rn": [-1, -2, -3, -4],
                out: [float(lg), s, ep, af],
            }
        )
        return pd.concat([bdf, mark], ignore_index=True)

    def run_arrow(tbl):
        # applyInArrow arm (round-14 default on Spark 4): the identical
        # ``_sar_scan`` body; key/_rn buffers reused zero-copy, outputs
        # emitted with from_pandas=True (NaN→null) to match the pandas
        # serializer. See ewma_segmented.run_arrow.
        import pyarrow as pa
        import pyarrow.compute as pc

        tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("_rn", "ascending")]))
        n = tbl.num_rows
        sym_col = tbl.column(partition_by)
        sym = sym_col[0].as_py()
        rn_col = pc.cast(tbl.column("_rn"), pa.int64())
        halo_n = (
            int(pc.sum(tbl.column("_halo")).as_py() or 0)
            if "_halo" in tbl.column_names
            else 0
        )
        if halo_n and halo_n == n:
            # halo-only group: emit nothing (see the pandas arm's comment)
            return pa.table(
                {
                    partition_by: sym_col.slice(0, 0),
                    "_rn": rn_col.slice(0, 0),
                    out: pa.array([], type=pa.float64()),
                }
            )
        hh = (
            pc.cast(tbl.column(high), pa.float64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        ll = (
            pc.cast(tbl.column(low), pa.float64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        state = None
        if "_ss" in tbl.column_names:
            sv = tbl.column("_ss")[0].as_py()
            if sv is not None and not (isinstance(sv, float) and np.isnan(sv)):
                state = (
                    bool(tbl.column("_sl")[0].as_py()),
                    float(sv),
                    float(tbl.column("_sep")[0].as_py()),
                    float(tbl.column("_saf")[0].as_py()),
                )
        if state is None:
            res, st_out = _sar_scan(hh, ll, None, 1, p)
            start = 0
        else:
            res_full, st_out = _sar_scan(hh, ll, state, halo_n, p)
            res = res_full[halo_n:]
            start = halo_n
        lg, s, ep, af = st_out if st_out is not None else (
            np.nan, np.nan, np.nan, np.nan
        )
        body_sym = sym_col.slice(start)
        body_rn = rn_col.slice(start)
        return pa.table(
            {
                partition_by: pa.chunked_array(
                    list(body_sym.chunks) + [pa.array([sym] * 4, type=sym_col.type)]
                ),
                "_rn": pa.chunked_array(
                    list(body_rn.chunks)
                    + [pa.array([-1, -2, -3, -4], type=pa.int64())]
                ),
                out: pa.chunked_array(
                    [
                        pa.array(res, type=pa.float64(), from_pandas=True),
                        pa.array(
                            [float(lg), s, ep, af],
                            type=pa.float64(),
                            from_pandas=True,
                        ),
                    ]
                ),
            }
        )

    use_arrow = _use_arrow(df)
    s_rows = segment_rows
    pieces: list[DataFrame] = []
    prev: DataFrame | None = None
    for k in range(int(last_seg) + 1):
        lo = k * s_rows
        if k == 0:
            seg = base.where(F.col("_seg") == 0).select(
                partition_by, "_rn", high, low, F.lit(0).alias("_halo")
            )
        else:
            seg = base.where(
                (F.col("_rn") > lo - 2) & (F.col("_rn") <= lo + s_rows)
            ).select(
                partition_by, "_rn", high, low,
                F.when(F.col("_rn") <= lo, 1).otherwise(0).alias("_halo"),
            )
        if prev is not None:
            # pivot the 4 marker rows back to columns; the aggregate's
            # symbol-key exchange is the one the groupBy needs anyway,
            # and the join stays merge-pinned (AQE-less subtree — the
            # explode-estimate hazard class, see ewma_segmented)
            seeds_df = (
                prev.where(F.col("_rn") < 0)
                .groupBy(partition_by)
                .agg(
                    F.max(F.when(F.col("_rn") == -1, F.col(out))).alias("_sl"),
                    F.max(F.when(F.col("_rn") == -2, F.col(out))).alias("_ss"),
                    F.max(F.when(F.col("_rn") == -3, F.col(out))).alias("_sep"),
                    F.max(F.when(F.col("_rn") == -4, F.col(out))).alias("_saf"),
                )
            )
            seg = seg.join(seeds_df.hint("merge"), partition_by, "left")
        if use_arrow:
            res = seg.groupBy(partition_by).applyInArrow(run_arrow, schema=schema)
        else:
            res = seg.groupBy(partition_by).applyInPandas(run, schema=schema)
        res = _cache_piece(res, k)
        pieces.append(res.where(F.col("_rn") >= 0))
        prev = res

    return _join_back(base, pieces, partition_by)


def sar_segmented(
    df: DataFrame,
    high: str = "high",
    low: str = "low",
    acceleration: float = 0.02,
    maximum: float = 0.2,
    out: str = "sar",
    partition_by: str = "symbol",
    order_by: str = "t",
    segment_rows: int | str = 1_000_000,
) -> DataFrame:
    """Parabolic SAR without the per-symbol memory bound — bit-equal to
    ``with_recurrences(..., Rec(out, "sar", [high, low], ...))`` on
    null-free input (operators/recurrence.py:398; asserted in
    tests/test_segmented.py across segment AND checkpoint boundaries)."""
    p = _SarParams(
        0.0, 0.0,
        acceleration, acceleration, maximum,
        acceleration, acceleration, maximum,
        signed=False,
    )
    return _sar_family_segmented(
        df, high, low, p, out, partition_by, order_by, segment_rows
    )


def sarext_segmented(
    df: DataFrame,
    high: str = "high",
    low: str = "low",
    startvalue: float = 0.0,
    offsetonreverse: float = 0.0,
    accelerationinitlong: float = 0.02,
    accelerationlong: float = 0.02,
    accelerationmaxlong: float = 0.2,
    accelerationinitshort: float = 0.02,
    accelerationshort: float = 0.02,
    accelerationmaxshort: float = 0.2,
    out: str = "sarext",
    partition_by: str = "symbol",
    order_by: str = "t",
    segment_rows: int | str = 1_000_000,
) -> DataFrame:
    """Extended parabolic SAR, segmented — bit-equal to
    ``with_recurrences(..., Rec(out, "sarext", [high, low], ...))`` on
    null-free input (operators/recurrence.py:639). ``startvalue`` applies
    only on segment 0, exactly as in the kernel."""
    p = _SarParams(
        startvalue, offsetonreverse,
        accelerationinitlong, accelerationlong, accelerationmaxlong,
        accelerationinitshort, accelerationshort, accelerationmaxshort,
        signed=True,
    )
    return _sar_family_segmented(
        df, high, low, p, out, partition_by, order_by, segment_rows
    )


# ---------------------------------------------------------------------------
# Integer-lattice (quantized) EMA / MACD trio — closing the second r10
# segmented non-goal (VERDICT r10 #3)
# ---------------------------------------------------------------------------


def ewma_q_segmented(
    df: DataFrame,
    x: str,
    alpha: float,
    seed_n: int,
    out: str = "ema_q",
    partition_by: str = "symbol",
    order_by: str = "t",
    segment_rows: int | str = 1_000_000,
) -> DataFrame:
    """INTEGER-LATTICE exponential scan (``recurrence._ewma_q``: every step
    re-quantizes with floor(x + 0.5)), segmented. Bit-equal by the same
    argument as ``ewma_segmented`` — a strict left fold resumed from its
    carried accumulator replays identical ops — but here the argument is
    even stronger: the carried state is an INTEGER (exact in a double up
    to 2⁵³), so the continuation is engine- and segmentation-invariant by
    construction. Input must be integer-valued micro-units as doubles
    (floor(v·1e6 + 0.5)); output is integer-valued micro-units."""
    import math

    from polars_quant_spark.operators.recurrence import _ewma_q

    a = float(alpha)
    b = 1.0 - a
    base, last_seg, segment_rows = _segmented_base(df, partition_by, order_by, segment_rows)
    if segment_rows < seed_n:
        raise ValueError(
            f"segment_rows ({segment_rows}) must be >= seed_n ({seed_n})"
        )
    if last_seg is None:
        return df.withColumn(out, F.lit(None).cast("double"))

    schema = StructType(
        [
            df.schema[partition_by],
            StructField("_rn", LongType()),
            StructField(out, DoubleType()),
        ]
    )

    def scan(vals: np.ndarray, s):
        """The per-group scan body, shared bit-identically by both arms:
        (values, carried lattice state | None) → (result, carry-out)."""
        if s is None:
            res = _ewma_q(vals, a, seed_n)
            valid = np.where(~np.isnan(res))[0]
            s_out = float(res[valid[-1]]) if valid.size else np.nan
        else:
            n = vals.shape[0]
            res = np.empty(n)
            for i in range(n):
                s = math.floor(b * s + a * float(vals[i]) + 0.5)
                res[i] = s
            s_out = float(s)
        return res, s_out

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_rn", kind="mergesort").reset_index(drop=True)
        sym = pdf[partition_by].iloc[0]
        vals = pdf[x].to_numpy(dtype="float64", na_value=np.nan)
        s = None
        if "_seed" in pdf.columns:
            s0 = pdf["_seed"].iloc[0]
            if s0 is not None and not pd.isna(s0):
                s = float(s0)
        res, s_out = scan(vals, s)
        body = pd.DataFrame(
            {
                partition_by: pdf[partition_by],
                "_rn": pdf["_rn"].astype("int64"),
                out: res,
            }
        )
        mark = pd.DataFrame({partition_by: [sym], "_rn": [-1], out: [s_out]})
        return pd.concat([body, mark], ignore_index=True)

    def run_arrow(tbl):
        # applyInArrow arm (round-14 default on Spark 4): identical scan;
        # key/_rn buffers reused zero-copy. See ewma_segmented.run_arrow.
        import pyarrow as pa
        import pyarrow.compute as pc

        tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("_rn", "ascending")]))
        sym_col = tbl.column(partition_by)
        sym = sym_col[0].as_py()
        vals = (
            pc.cast(tbl.column(x), pa.float64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        s = None
        if "_seed" in tbl.column_names:
            s0 = tbl.column("_seed")[0].as_py()
            if s0 is not None and not (isinstance(s0, float) and np.isnan(s0)):
                s = float(s0)
        res, s_out = scan(vals, s)
        rn_col = pc.cast(tbl.column("_rn"), pa.int64())
        return pa.table(
            {
                partition_by: pa.chunked_array(
                    list(sym_col.chunks) + [pa.array([sym], type=sym_col.type)]
                ),
                "_rn": pa.chunked_array(
                    list(rn_col.chunks) + [pa.array([-1], type=pa.int64())]
                ),
                out: pa.chunked_array(
                    [
                        pa.array(res, type=pa.float64(), from_pandas=True),
                        pa.array([s_out], type=pa.float64(), from_pandas=True),
                    ]
                ),
            }
        )

    use_arrow = _use_arrow(df)
    pieces: list[DataFrame] = []
    prev: DataFrame | None = None
    for k in range(int(last_seg) + 1):
        seg = base.where(F.col("_seg") == k).select(partition_by, "_rn", x)
        if prev is not None:
            seeds_df = prev.where(F.col("_rn") == -1).select(
                partition_by, F.col(out).alias("_seed")
            )
            seg = seg.join(seeds_df.hint("merge"), partition_by, "left")
        if use_arrow:
            res = seg.groupBy(partition_by).applyInArrow(run_arrow, schema=schema)
        else:
            res = seg.groupBy(partition_by).applyInPandas(run, schema=schema)
        res = _cache_piece(res, k)
        pieces.append(res.where(F.col("_rn") >= 0))
        prev = res

    return _join_back(base, pieces, partition_by)


def macd_q_segmented(
    df: DataFrame,
    x: str = "_cm",
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    dif_out: str = "macd_dif",
    dea_out: str = "macd_dea",
    hist_out: str = "macd_hist",
    partition_by: str = "symbol",
    order_by: str = "t",
    segment_rows: int | str = 1_000_000,
) -> DataFrame:
    """Quantized MACD trio without the per-symbol memory bound — bit-equal
    to ``with_recurrences(..., Rec([...], "macd_q", [x], ...))`` on
    null-free integer-micro-unit input (operators/recurrence.py:359;
    asserted in tests/test_segmented.py). MACDFIX is this with the fixed
    12/26 legs.

    Composition (the ``adx_family_segmented`` discipline): two quantized
    EMA chains over the input build ``dif``; the signal chain scans only
    dif-VALID rows (the kernel's ``_compact_apply`` compacts the warm-up
    NaN prefix before seeding — filtering before the scan reproduces that
    compaction exactly, since on null-free input the invalid rows are a
    contiguous per-symbol prefix); warm-up rows rejoin by union (no
    shuffle beyond the scans' own symbol-key exchanges). Differences of
    lattice integers are exact in doubles."""
    kw = dict(
        partition_by=partition_by, order_by=order_by, segment_rows=segment_rows
    )
    ch = ewma_q_segmented(df, x, 2.0 / (fast + 1), fast, out="_efq", **kw)
    ch = ewma_q_segmented(ch, x, 2.0 / (slow + 1), slow, out="_esq", **kw)
    ch = ch.withColumn(dif_out, F.col("_efq") - F.col("_esq"))
    valid = ch.where(F.col(dif_out).isNotNull())
    dea = ewma_q_segmented(valid, dif_out, 2.0 / (signal + 1), signal, out=dea_out, **kw)
    warm = ch.where(F.col(dif_out).isNull()).withColumn(
        dea_out, F.lit(None).cast("double")
    )
    full = dea.unionByName(warm)
    return full.withColumn(hist_out, F.col(dif_out) - F.col(dea_out)).drop(
        "_efq", "_esq"
    )


# ---------------------------------------------------------------------------
# Vectorized backtest fold, segmented — the round-11 1024x finding
# ---------------------------------------------------------------------------


def backtest_segmented(
    df: DataFrame,
    price: str = "close",
    buy: str = "buy",
    sell: str = "sell",
    params=None,
    partition_by: str = "symbol",
    order_by: str = "t",
    segment_rows: int | str = 1_000_000,
) -> DataFrame:
    """``vectorized_backtest`` without the one-pandas-frame-per-symbol
    memory bound — bit-equal on identical input (asserted in
    tests/test_segmented.py, all six output columns, stops included).

    Motivation (docs/SCALE.md round 11): at 1024x per-symbol history
    (~123 M bars/symbol) the plain fold's pre-groupBy sort OOMs an 8 GB
    heap outright and completes only at 48 GB with decade-over-decade
    superlinearity (98 s @256x -> 1135 s @1024x, 11.5x wall for 4x data)
    — memory pressure, not algorithm. The fold's carried state is NINE
    scalars (``vectorized.FoldState``: position, cash, peak, entry_cost,
    entry_px, last_price, trades, wins, hwm), so the SAR multi-marker
    pattern applies directly: marker rows _rn -1..-9 smuggle the state
    (in the ``position`` column), a per-symbol aggregate pivots them back
    for the next pass, and no halo is needed (pure scalar carry).

    One contract wrinkle: the plain op repeats each symbol's FINAL
    (n_trades, n_wins) on every row. Counters are monotone nondecreasing
    across segments, so the final value per symbol is the MAX over all
    segment markers — one extra symbol-key aggregate + merge-pinned join,
    the same exchange the output join pays anyway."""
    from polars_quant_spark.backtest.vectorized import (
        BacktestParams,
        _fold_state,
    )

    p = params or BacktestParams()
    base, last_seg, segment_rows = _segmented_base(df, partition_by, order_by, segment_rows)
    if last_seg is None:
        out = df
        for c in ("position", "cash", "equity", "drawdown"):
            out = out.withColumn(c, F.lit(None).cast("double"))
        for c in ("n_trades", "n_wins"):
            out = out.withColumn(c, F.lit(None).cast("long"))
        return out

    schema = StructType(
        [
            df.schema[partition_by],
            StructField("_rn", LongType()),
            StructField("position", DoubleType()),
            StructField("cash", DoubleType()),
            StructField("equity", DoubleType()),
            StructField("drawdown", DoubleType()),
        ]
    )
    seed_cols = [f"_s{i}" for i in range(1, 10)]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_rn", kind="mergesort").reset_index(drop=True)
        sym = pdf[partition_by].iloc[0]
        px = pdf[price].to_numpy(dtype="float64", na_value=np.nan)
        b = pdf[buy].astype("boolean").fillna(False).to_numpy(dtype="bool")
        s = pdf[sell].astype("boolean").fillna(False).to_numpy(dtype="bool")
        state = None
        if "_s2" in pdf.columns:
            cash0 = pdf["_s2"].iloc[0]  # cash: never NaN in a real state
            if cash0 is not None and not pd.isna(cash0):
                vals = [pdf[c].iloc[0] for c in seed_cols]
                state = (
                    float(vals[0]), float(vals[1]), float(vals[2]),
                    float(vals[3]), float(vals[4]), float(vals[5]),
                    int(vals[6]), int(vals[7]), float(vals[8]),
                )
        pos, cash, eq, dd, st = _fold_state(px, b, s, p, state)
        bdf = pd.DataFrame(
            {
                partition_by: pdf[partition_by],
                "_rn": pdf["_rn"].astype("int64"),
                "position": pos,
                "cash": cash,
                "equity": eq,
                "drawdown": dd,
            }
        )
        mark = pd.DataFrame(
            {
                partition_by: [sym] * 9,
                "_rn": list(range(-1, -10, -1)),
                "position": [float(v) for v in st],
                "cash": [np.nan] * 9,
                "equity": [np.nan] * 9,
                "drawdown": [np.nan] * 9,
            }
        )
        return pd.concat([bdf, mark], ignore_index=True)

    def run_arrow(tbl):
        # applyInArrow arm (round-14 default on Spark 4): the identical
        # ``_fold_state`` kernel; key/_rn buffers reused zero-copy, bool
        # signals null→False exactly like the pandas arm's
        # .astype("boolean").fillna(False). See vectorized_backtest_arrow.
        import pyarrow as pa
        import pyarrow.compute as pc

        tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("_rn", "ascending")]))
        sym_col = tbl.column(partition_by)
        sym = sym_col[0].as_py()
        px = (
            pc.cast(tbl.column(price), pa.float64())
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        b = (
            pc.fill_null(tbl.column(buy), False)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("bool", copy=False)
        )
        s = (
            pc.fill_null(tbl.column(sell), False)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("bool", copy=False)
        )
        state = None
        if "_s2" in tbl.column_names:
            cash0 = tbl.column("_s2")[0].as_py()  # cash: never NaN in a real state
            if cash0 is not None and not (
                isinstance(cash0, float) and np.isnan(cash0)
            ):
                vals = [tbl.column(c)[0].as_py() for c in seed_cols]
                state = (
                    float(vals[0]), float(vals[1]), float(vals[2]),
                    float(vals[3]), float(vals[4]), float(vals[5]),
                    int(vals[6]), int(vals[7]), float(vals[8]),
                )
        pos, cash, eq, dd, st = _fold_state(px, b, s, p, state)
        rn_col = pc.cast(tbl.column("_rn"), pa.int64())
        f64 = pa.float64()
        return pa.table(
            {
                partition_by: pa.chunked_array(
                    list(sym_col.chunks) + [pa.array([sym] * 9, type=sym_col.type)]
                ),
                "_rn": pa.chunked_array(
                    list(rn_col.chunks)
                    + [pa.array(list(range(-1, -10, -1)), type=pa.int64())]
                ),
                "position": pa.chunked_array(
                    [
                        pa.array(pos, type=f64, from_pandas=True),
                        pa.array(
                            [float(v) for v in st], type=f64, from_pandas=True
                        ),
                    ]
                ),
                "cash": pa.chunked_array(
                    [pa.array(cash, type=f64, from_pandas=True), pa.nulls(9, f64)]
                ),
                "equity": pa.chunked_array(
                    [pa.array(eq, type=f64, from_pandas=True), pa.nulls(9, f64)]
                ),
                "drawdown": pa.chunked_array(
                    [pa.array(dd, type=f64, from_pandas=True), pa.nulls(9, f64)]
                ),
            }
        )

    use_arrow = _use_arrow(df)
    pieces: list[DataFrame] = []
    marks: list[DataFrame] = []
    prev: DataFrame | None = None
    for k in range(int(last_seg) + 1):
        seg = base.where(F.col("_seg") == k).select(
            partition_by, "_rn", price, buy, sell
        )
        if prev is not None:
            seeds_df = (
                prev.where(F.col("_rn") < 0)
                .groupBy(partition_by)
                .agg(
                    *[
                        F.max(
                            F.when(F.col("_rn") == -i, F.col("position"))
                        ).alias(f"_s{i}")
                        for i in range(1, 10)
                    ]
                )
            )
            seg = seg.join(seeds_df.hint("merge"), partition_by, "left")
        if use_arrow:
            res = seg.groupBy(partition_by).applyInArrow(run_arrow, schema=schema)
        else:
            res = seg.groupBy(partition_by).applyInPandas(run, schema=schema)
        res = _cache_piece(res, k)
        pieces.append(res.where(F.col("_rn") >= 0))
        marks.append(res.where(F.col("_rn") < 0))
        prev = res

    allmarks = marks[0]
    for m in marks[1:]:
        allmarks = allmarks.unionByName(m)
    # final per-symbol totals: trades (-7) / wins (-8) are monotone
    # nondecreasing across segments, so max over all markers = final
    totals = allmarks.where(F.col("_rn").isin(-7, -8)).groupBy(partition_by).agg(
        F.max(F.when(F.col("_rn") == -7, F.col("position")))
        .cast("long")
        .alias("n_trades"),
        F.max(F.when(F.col("_rn") == -8, F.col("position")))
        .cast("long")
        .alias("n_wins"),
    )
    out = _join_back(base, pieces, partition_by)
    return out.join(totals.hint("merge"), partition_by, "left")


def macdext_q_segmented(
    df: DataFrame,
    x: str = "_cm",
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
    dif_out: str = "macd_dif",
    dea_out: str = "macd_dea",
    hist_out: str = "macd_hist",
    partition_by: str = "symbol",
    order_by: str = "t",
    segment_rows: int | str = 1_000_000,
) -> DataFrame:
    """Quantized MACDEXT (EMA fast/slow legs + SMA signal — matypes 1/1/0,
    the shape ``ind_macdext`` exercises), segmented. Bit-equal to
    ``with_recurrences(..., Rec([...], "macdext_q", [x], ...))`` on
    null-free integer-micro-unit input (operators/recurrence.py:376).

    The EMA legs are the same segmented integer-lattice folds as
    ``macd_q_segmented``. The SMA signal leg needs no segmentation at all:
    ``_sma_q`` is a BOUNDED trailing window (``signal`` rows), which Spark's
    window exec evaluates with spill — floor(avg + 0.5) over dif-valid rows
    reproduces the kernel's compacted rolling mean exactly (integer sums are
    exact in doubles, the divide and floor are single correctly-rounded
    ops)."""
    kw = dict(
        partition_by=partition_by, order_by=order_by, segment_rows=segment_rows
    )
    ch = ewma_q_segmented(df, x, 2.0 / (fast + 1), fast, out="_efq", **kw)
    ch = ewma_q_segmented(ch, x, 2.0 / (slow + 1), slow, out="_esq", **kw)
    ch = ch.withColumn(dif_out, F.col("_efq") - F.col("_esq"))
    # the kernel compacts dif's warm-up NaNs before the rolling mean, so
    # the window must rank over dif-VALID rows only
    wv = (
        Window.partitionBy(partition_by)
        .orderBy(order_by)
        .rowsBetween(-(signal - 1), 0)
    )
    valid = ch.where(F.col(dif_out).isNotNull()).withColumn(
        "_nv",
        F.count(F.lit(1)).over(
            Window.partitionBy(partition_by)
            .orderBy(order_by)
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    dea = valid.withColumn(
        dea_out,
        F.when(
            F.col("_nv") >= signal,
            F.floor(F.avg(dif_out).over(wv) + F.lit(0.5)),
        ),
    ).drop("_nv")
    warm = ch.where(F.col(dif_out).isNull()).withColumn(
        dea_out, F.lit(None).cast("double")
    )
    full = dea.unionByName(warm)
    return full.withColumn(hist_out, F.col(dif_out) - F.col(dea_out)).drop(
        "_efq", "_esq"
    )
