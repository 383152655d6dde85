"""Segmented EMA/RMA must equal the single-group scan bit-for-bit."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from polars_quant_spark.operators.recurrence import Rec, with_recurrences
from polars_quant_spark.operators.segmented import ewma_segmented


@pytest.fixture(scope="module")
def tall_df(spark):
    """Two symbols, one 'fat' (2 500 bars → 3 segments at 1 000 rows)."""
    rng = np.random.default_rng(5)
    frames = []
    for sym, n in [("FAT", 2500), ("THIN", 40)]:
        frames.append(
            pd.DataFrame(
                {
                    "symbol": sym,
                    "t": np.arange(n),
                    "close": 100.0 + np.cumsum(rng.normal(0, 1, n)),
                }
            )
        )
    return spark.createDataFrame(pd.concat(frames, ignore_index=True))


@pytest.mark.parametrize("alpha,p", [(None, 20), (1.0 / 14, 14)])
def test_segmented_bit_equal_to_single_group(spark, tall_df, alpha, p):
    kernel = "ema" if alpha is None else "rma"
    whole = (
        with_recurrences(tall_df, [Rec("e", kernel, ["close"], {"p": p})])
        .select("symbol", "t", "e")
        .collect()
    )
    segd = (
        ewma_segmented(
            tall_df, "close", p, alpha=alpha, out="e", segment_rows=1000
        )
        .select("symbol", "t", "e")
        .collect()
    )
    w = {(r["symbol"], r["t"]): r["e"] for r in whole}
    s = {(r["symbol"], r["t"]): r["e"] for r in segd}
    assert set(w) == set(s)
    diff = [k for k in w if (w[k] is None) != (s[k] is None) or
            (w[k] is not None and w[k] != s[k])]
    assert not diff, diff[:5]


def test_segmented_short_symbol_all_null(spark, tall_df):
    segd = ewma_segmented(tall_df, "close", 50, out="e", segment_rows=1000)
    thin = segd.where("symbol = 'THIN'").select("e").collect()
    assert all(r["e"] is None for r in thin)


def test_segment_rows_must_cover_seed(spark, tall_df):
    with pytest.raises(ValueError, match="segment_rows"):
        ewma_segmented(tall_df, "close", 20, segment_rows=10)


def test_segmented_many_segments_crosses_checkpoint_boundary(spark, tall_df):
    """10 segments at 250 rows: the periodic lineage cut
    (_CHECKPOINT_EVERY_SEGMENTS = 4, round-10 advisor item) fires twice
    mid-chain and must not perturb the carried fold — output stays
    bit-equal to the single-group scan. The plan assertion pins that the
    cut actually happened: checkpoint scans (ExistingRDD) appear in the
    physical plan and the nested applyInPandas count stays bounded
    (measured: 61 nodes truncated vs 161 untruncated at 10 segments — a
    silent revert to persist() would trip the <=100 bound)."""
    from polars_quant_spark.plans.inspect import plan_str

    p = 20
    whole = (
        with_recurrences(tall_df, [Rec("e", "ema", ["close"], {"p": p})])
        .select("symbol", "t", "e")
        .collect()
    )
    seg_df = ewma_segmented(tall_df, "close", p, out="e", segment_rows=250)
    plan = plan_str(seg_df)
    assert "ExistingRDD" in plan, "lineage cut missing: no checkpoint scan"
    assert plan.count("FlatMapGroupsInPandas") <= 100
    segd = seg_df.select("symbol", "t", "e").collect()
    w = {(r["symbol"], r["t"]): r["e"] for r in whole}
    s = {(r["symbol"], r["t"]): r["e"] for r in segd}
    assert w == s


def test_rsi_segmented_bit_equal_to_single_group(spark, tall_df):
    from polars_quant_spark.operators.segmented import rsi_segmented

    whole = (
        with_recurrences(tall_df, [Rec("r", "rsi", ["close"], {"p": 14})])
        .select("symbol", "t", "r")
        .collect()
    )
    segd = (
        rsi_segmented(tall_df, "close", 14, out="r", segment_rows=1000)
        .select("symbol", "t", "r")
        .collect()
    )
    w = {(r["symbol"], r["t"]): r["r"] for r in whole}
    s = {(r["symbol"], r["t"]): r["r"] for r in segd}
    assert set(w) == set(s)
    diff = [k for k in w if (w[k] is None) != (s[k] is None) or
            (w[k] is not None and w[k] != s[k])]
    assert not diff, diff[:5]
    assert sum(v is not None for v in s.values()) > 2400  # real values, not all-null


def test_atr_segmented_bit_equal_to_single_group(spark, tall_df):
    from polars_quant_spark.operators.segmented import atr_segmented

    hl = tall_df.withColumn("high", F.col("close") * 1.01).withColumn(
        "low", F.col("close") * 0.99
    )
    whole = (
        with_recurrences(hl, [Rec("a", "atr", ["high", "low", "close"], {"p": 14})])
        .select("symbol", "t", "a")
        .collect()
    )
    segd = (
        atr_segmented(hl, p=14, out="a", segment_rows=1000)
        .select("symbol", "t", "a")
        .collect()
    )
    w = {(r["symbol"], r["t"]): r["a"] for r in whole}
    s = {(r["symbol"], r["t"]): r["a"] for r in segd}
    assert set(w) == set(s)
    diff = [k for k in w if (w[k] is None) != (s[k] is None) or
            (w[k] is not None and w[k] != s[k])]
    assert not diff, diff[:5]
    assert sum(v is not None for v in s.values()) > 2400


def test_adx_family_segmented_bit_equal_to_single_group(spark, tall_df):
    from polars_quant_spark.operators.segmented import adx_family_segmented

    hl = tall_df.withColumn("high", F.col("close") * 1.01).withColumn(
        "low", F.col("close") * 0.99
    )
    specs = [
        Rec("plus_di", "plus_di", ["high", "low", "close"], {"p": 14}),
        Rec("minus_di", "minus_di", ["high", "low", "close"], {"p": 14}),
        Rec("plus_dm", "plus_dm", ["high", "low"], {"p": 14}),
        Rec("minus_dm", "minus_dm", ["high", "low"], {"p": 14}),
        Rec("dx", "dx", ["high", "low", "close"], {"p": 14}),
        Rec("adx", "adx", ["high", "low", "close"], {"p": 14}),
        Rec("adxr", "adxr", ["high", "low", "close"], {"p": 14}),
    ]
    names = ["plus_di", "minus_di", "plus_dm", "minus_dm", "dx", "adx", "adxr"]
    whole = (
        with_recurrences(hl, specs).select("symbol", "t", *names).collect()
    )
    segd = (
        adx_family_segmented(hl, p=14, segment_rows=1000)
        .select("symbol", "t", *names)
        .collect()
    )
    w = {(r["symbol"], r["t"]): tuple(r[n] for n in names) for r in whole}
    s = {(r["symbol"], r["t"]): tuple(r[n] for n in names) for r in segd}
    assert set(w) == set(s)
    diff = []
    for k in w:
        for a, b, n in zip(w[k], s[k], names):
            if (a is None) != (b is None) or (a is not None and a != b):
                diff.append((k, n, a, b))
    assert not diff, diff[:6]
    assert sum(v[-2] is not None for v in s.values()) > 2300  # adx populated


@pytest.mark.parametrize(
    "name,p,fn_name",
    [("dema", 10, "dema_segmented"), ("tema", 10, "tema_segmented"), ("t3", 5, "t3_segmented")],
)
def test_ema_chain_segmented_bit_equal(spark, tall_df, name, p, fn_name):
    """DEMA (2 chains), TEMA (3) and T3 (6) must equal the plain kernels
    bit-for-bit — the chained-compaction composition plus the kernel's
    combine float order, across segment and checkpoint boundaries."""
    import polars_quant_spark.operators.segmented as seg

    kw = {"p": p} if name != "t3" else {"p": p}
    whole = (
        with_recurrences(tall_df, [Rec("v", name, ["close"], kw)])
        .select("symbol", "t", "v")
        .collect()
    )
    segd = (
        getattr(seg, fn_name)(tall_df, "close", p=p, out="v", segment_rows=700)
        .select("symbol", "t", "v")
        .collect()
    )
    w = {(r["symbol"], r["t"]): r["v"] for r in whole}
    s = {(r["symbol"], r["t"]): r["v"] for r in segd}
    assert set(w) == set(s)
    diff = [k for k in w if (w[k] is None) != (s[k] is None) or
            (w[k] is not None and w[k] != s[k])]
    assert not diff, diff[:5]
    assert sum(v is not None for v in s.values()) > 2300


def test_kama_segmented_bit_equal_and_guard(spark, tall_df):
    """KAMA (nonlinear fold + trailing-p ER window) must equal the plain
    kernel bit-for-bit — the state+halo continuation replays the kernel's
    per-step arithmetic across segment AND checkpoint boundaries — and the
    p-row-segment divergence case must be rejected up front."""
    from polars_quant_spark.operators.segmented import kama_segmented

    whole = (
        with_recurrences(tall_df, [Rec("v", "kama", ["close"], {"p": 10})])
        .select("symbol", "t", "v")
        .collect()
    )
    for seg_rows in (700, 137):  # 4 and 19 segments on FAT: crosses checkpoints
        segd = (
            kama_segmented(tall_df, "close", p=10, out="v", segment_rows=seg_rows)
            .select("symbol", "t", "v")
            .collect()
        )
        w = {(r["symbol"], r["t"]): r["v"] for r in whole}
        s = {(r["symbol"], r["t"]): r["v"] for r in segd}
        assert set(w) == set(s)
        diff = [k for k in w if (w[k] is None) != (s[k] is None) or
                (w[k] is not None and w[k] != s[k])]
        assert not diff, (seg_rows, diff[:5])
        assert sum(v is not None for v in s.values()) > 2400
    with pytest.raises(ValueError):
        kama_segmented(tall_df, "close", p=10, segment_rows=10)


def _bit_equal(whole, segd, col):
    w = {(r["symbol"], r["t"]): r[col] for r in whole}
    s = {(r["symbol"], r["t"]): r[col] for r in segd}
    assert set(w) == set(s) and len(s) == len(segd)
    diff = [k for k in w if (w[k] is None) != (s[k] is None) or
            (w[k] is not None and w[k] != s[k])]
    assert not diff, diff[:5]


def test_sar_segmented_bit_equal_and_guard(spark, tall_df):
    """Parabolic SAR (4-tuple reversal state machine + 2-bar clamp halo)
    must equal the plain kernel bit-for-bit across segment AND checkpoint
    boundaries — the last with_recurrences family without a memory-bounded
    escape (VERDICT r10 #3)."""
    from polars_quant_spark.operators.segmented import sar_segmented

    hl = tall_df.withColumn("high", F.col("close") * 1.01).withColumn(
        "low", F.col("close") * 0.99
    )
    whole = (
        with_recurrences(hl, [Rec("v", "sar", ["high", "low"], {})])
        .select("symbol", "t", "v")
        .collect()
    )
    for seg_rows in (700, 137):  # 4 and 19 segments: crosses checkpoints
        segd = (
            sar_segmented(hl, out="v", segment_rows=seg_rows)
            .select("symbol", "t", "v")
            .collect()
        )
        _bit_equal(whole, segd, "v")
    with pytest.raises(ValueError):
        sar_segmented(hl, segment_rows=1)


def test_sarext_segmented_bit_equal_asymmetric(spark, tall_df):
    """SAREXT with a signed start value, reversal offset and ASYMMETRIC
    long/short acceleration schedules — every parameter the plain kernel
    honors must survive segmentation bit-for-bit."""
    from polars_quant_spark.operators.segmented import sarext_segmented

    hl = tall_df.withColumn("high", F.col("close") * 1.02).withColumn(
        "low", F.col("close") * 0.98
    )
    kw = {
        "startvalue": -95.0,
        "offsetonreverse": 0.01,
        "accelerationinitlong": 0.02,
        "accelerationlong": 0.03,
        "accelerationmaxlong": 0.25,
        "accelerationinitshort": 0.01,
        "accelerationshort": 0.04,
        "accelerationmaxshort": 0.15,
    }
    whole = (
        with_recurrences(hl, [Rec("v", "sarext", ["high", "low"], kw)])
        .select("symbol", "t", "v")
        .collect()
    )
    segd = (
        sarext_segmented(hl, out="v", segment_rows=300, **kw)
        .select("symbol", "t", "v")
        .collect()
    )
    _bit_equal(whole, segd, "v")


def test_sar_segmented_uneven_lengths_at_halo_boundary(spark):
    """The kama ADVICE-r10 bug class applies to the SAR halo too: symbols
    ending exactly at (EDGE=100) or just inside (MID=99) a later segment
    boundary's 2-row halo window must neither duplicate rows nor crash."""
    from polars_quant_spark.operators.segmented import sar_segmented

    rng = np.random.default_rng(13)
    frames = []
    for sym, n in [("FAT", 250), ("MID", 99), ("EDGE", 100)]:
        close = 100.0 + np.cumsum(rng.normal(0, 1, n))
        frames.append(
            pd.DataFrame(
                {
                    "symbol": sym,
                    "t": np.arange(n),
                    "high": close * 1.01,
                    "low": close * 0.99,
                }
            )
        )
    df = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    whole = (
        with_recurrences(df, [Rec("v", "sar", ["high", "low"], {})])
        .select("symbol", "t", "v")
        .collect()
    )
    segd = (
        sar_segmented(df, out="v", segment_rows=100)
        .select("symbol", "t", "v")
        .collect()
    )
    assert len(segd) == 250 + 99 + 100
    _bit_equal(whole, segd, "v")


def test_macd_q_segmented_bit_equal(spark, tall_df):
    """The quantized MACD trio (integer-lattice folds + compacted signal
    chain) must equal Rec('macd_q') bit-for-bit across segment and
    checkpoint boundaries — the second r10 segmented non-goal closed."""
    from polars_quant_spark.operators.segmented import macd_q_segmented

    qb = tall_df.select(
        "symbol",
        "t",
        F.floor(F.col("close") * 1000000.0 + F.lit(0.5))
        .cast("double")
        .alias("_cm"),
    )
    whole = (
        with_recurrences(
            qb,
            [Rec(["d", "s", "h"], "macd_q", ["_cm"],
                 {"fast": 12, "slow": 26, "signal": 9})],
        )
        .select("symbol", "t", "d", "s", "h")
        .collect()
    )
    for seg_rows in (700, 137):
        segd = (
            macd_q_segmented(
                qb, "_cm", dif_out="d", dea_out="s", hist_out="h",
                segment_rows=seg_rows,
            )
            .select("symbol", "t", "d", "s", "h")
            .collect()
        )
        for col in ("d", "s", "h"):
            _bit_equal(whole, segd, col)
    with pytest.raises(ValueError):
        macd_q_segmented(qb, "_cm", segment_rows=5)


def test_backtest_segmented_bit_equal(spark, tall_df):
    """The vectorized backtest fold (9-scalar state: position/cash/peak/
    entry/last_price/counters/hwm) must equal vectorized_backtest
    bit-for-bit across segment and checkpoint boundaries — including the
    per-symbol FINAL n_trades/n_wins repeated on every row, and the
    stop/trailing exits whose state spans boundaries."""
    from polars_quant_spark.backtest.vectorized import (
        BacktestParams,
        vectorized_backtest,
    )
    from polars_quant_spark.operators.segmented import backtest_segmented

    w = Window.partitionBy("symbol").orderBy("t")
    sig = (
        tall_df.withColumn("_ma_f", F.avg("close").over(w.rowsBetween(-4, 0)))
        .withColumn("_ma_s", F.avg("close").over(w.rowsBetween(-19, 0)))
        .withColumn("buy", F.col("_ma_f") > F.col("_ma_s"))
        .withColumn("sell", F.col("_ma_f") < F.col("_ma_s"))
        .drop("_ma_f", "_ma_s")
    )
    cols = ["position", "cash", "equity", "drawdown", "n_trades", "n_wins"]
    for p in (
        BacktestParams(),
        BacktestParams(stop_loss=0.02, take_profit=0.05, trailing_stop=0.03),
    ):
        whole = {
            (r["symbol"], r["t"]): tuple(r[c] for c in cols)
            for r in vectorized_backtest(sig, params=p)
            .select("symbol", "t", *cols)
            .collect()
        }
        for seg_rows in (700, 137):
            segd = {
                (r["symbol"], r["t"]): tuple(r[c] for c in cols)
                for r in backtest_segmented(
                    sig, params=p, segment_rows=seg_rows
                )
                .select("symbol", "t", *cols)
                .collect()
            }
            assert set(whole) == set(segd)
            diff = [k for k in whole if whole[k] != segd[k]]
            assert not diff, (seg_rows, diff[:3],
                              [(whole[k], segd[k]) for k in diff[:2]])


def test_macdext_q_segmented_bit_equal(spark, tall_df):
    """MACDEXT's quantized shape (EMA legs + SMA signal): the legs are
    segmented integer folds, the SMA signal is a bounded trailing window
    over dif-valid rows — all three outputs bit-equal to Rec('macdext_q')."""
    from polars_quant_spark.operators.segmented import macdext_q_segmented

    qb = tall_df.select(
        "symbol",
        "t",
        F.floor(F.col("close") * 1000000.0 + F.lit(0.5))
        .cast("double")
        .alias("_cm"),
    )
    whole = (
        with_recurrences(
            qb,
            [Rec(["d", "s", "h"], "macdext_q", ["_cm"],
                 {"fast": 12, "slow": 26, "signal": 9})],
        )
        .select("symbol", "t", "d", "s", "h")
        .collect()
    )
    segd = (
        macdext_q_segmented(
            qb, "_cm", dif_out="d", dea_out="s", hist_out="h",
            segment_rows=700,
        )
        .select("symbol", "t", "d", "s", "h")
        .collect()
    )
    for col in ("d", "s", "h"):
        _bit_equal(whole, segd, col)


def test_auto_backtest_dispatch(spark, tall_df):
    """auto_backtest picks the plain per-symbol fold below the threshold
    and the segmented fold above it (plan-asserted via the checkpointed
    base only the segmented arm builds), with identical outputs — the
    auto_chunk_windows discipline applied to the fold family."""
    from polars_quant_spark.backtest.vectorized import auto_backtest
    from polars_quant_spark.plans.inspect import plan_str

    w = Window.partitionBy("symbol").orderBy("t")
    sig = (
        tall_df.withColumn("_f", F.avg("close").over(w.rowsBetween(-4, 0)))
        .withColumn("_s", F.avg("close").over(w.rowsBetween(-19, 0)))
        .withColumn("buy", F.col("_f") > F.col("_s"))
        .withColumn("sell", F.col("_f") < F.col("_s"))
        .drop("_f", "_s")
    )
    plain = auto_backtest(sig)  # FAT=2500 rows << default threshold
    assert "ExistingRDD" not in plan_str(plain)
    segd = auto_backtest(sig, threshold=1000, segment_rows=800)
    assert "ExistingRDD" in plan_str(segd)
    cols = ["position", "cash", "equity", "drawdown", "n_trades", "n_wins"]
    a = {(r["symbol"], r["t"]): tuple(r[c] for c in cols)
         for r in plain.select("symbol", "t", *cols).collect()}
    b = {(r["symbol"], r["t"]): tuple(r[c] for c in cols)
         for r in segd.select("symbol", "t", *cols).collect()}
    assert a == b
    # explicit bound skips the measuring job and dispatches plan-time-only
    forced = auto_backtest(sig, max_rows_per_key=50_000_000)
    assert "ExistingRDD" in plan_str(forced)


def test_kama_segmented_uneven_lengths_at_halo_boundary(spark):
    """ADVICE r10 (high): symbols whose TOTAL row count lands inside (or
    exactly at) a later segment boundary's halo window (lo-p, lo] used to
    (a) duplicate their tail rows with NaN via the dense fallback when the
    group held only halo rows (halo_n < p), and (b) crash
    sliding_window_view when the length hit the boundary exactly
    (halo_n == p, nb == 0). Repro shape from the advice: segment_rows=100,
    p=10, MID=95 (inside segment-1's halo window), EDGE=100 (exactly at
    the boundary), EDGE2=195 (inside segment-2's halo window), FAT=250
    (drives last_seg to 2 so both later slices run)."""
    from polars_quant_spark.operators.segmented import kama_segmented

    rng = np.random.default_rng(11)
    frames = []
    for sym, n in [("FAT", 250), ("MID", 95), ("EDGE", 100), ("EDGE2", 195)]:
        frames.append(
            pd.DataFrame(
                {
                    "symbol": sym,
                    "t": np.arange(n),
                    "close": 100.0 + np.cumsum(rng.normal(0, 1, n)),
                }
            )
        )
    df = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    whole = (
        with_recurrences(df, [Rec("v", "kama", ["close"], {"p": 10})])
        .select("symbol", "t", "v")
        .collect()
    )
    segd = (
        kama_segmented(df, "close", p=10, out="v", segment_rows=100)
        .select("symbol", "t", "v")
        .collect()
    )
    assert len(segd) == 250 + 95 + 100 + 195  # no duplicated (symbol, t)
    w = {(r["symbol"], r["t"]): r["v"] for r in whole}
    s = {(r["symbol"], r["t"]): r["v"] for r in segd}
    assert set(w) == set(s) and len(s) == len(segd)
    diff = [k for k in w if (w[k] is None) != (s[k] is None) or
            (w[k] is not None and w[k] != s[k])]
    assert not diff, diff[:5]


def test_auto_segment_rows_resolution(spark, tall_df):
    """segment_rows="auto" sizes segments as max(FLOOR, ceil(max_rn/TARGET))
    and stays bit-equal to the plain kernel (VERDICT r11 #6: the census
    outliers came from a fixed demo segment_rows whose pass count grew
    linearly with history)."""
    from polars_quant_spark.operators.segmented import (
        AUTO_SEGMENT_FLOOR,
        AUTO_SEGMENT_TARGET,
        _segmented_base,
    )

    base, last_seg, rows = _segmented_base(tall_df, "symbol", "t", "auto")
    # FAT has 2500 bars: ceil(2500/4)=625 >= the 512 floor -> 4 segments
    assert rows == max(AUTO_SEGMENT_FLOOR, -(-2500 // AUTO_SEGMENT_TARGET))
    assert last_seg == (2500 - 1) // rows == AUTO_SEGMENT_TARGET - 1

    whole = (
        with_recurrences(tall_df, [Rec("e", "ema", ["close"], {"p": 20})])
        .select("symbol", "t", "e")
        .collect()
    )
    segd = (
        ewma_segmented(tall_df, "close", 20, out="e", segment_rows="auto")
        .select("symbol", "t", "e")
        .collect()
    )
    w = {(r["symbol"], r["t"]): r["e"] for r in whole}
    s = {(r["symbol"], r["t"]): r["e"] for r in segd}
    assert w == s


def test_auto_segment_rows_floor_validation(spark, tall_df):
    """A period larger than the auto-resolved segment size must still be
    rejected (validation happens AFTER resolution)."""
    import pytest as _pytest

    from polars_quant_spark.operators.segmented import ewma_segmented as es

    with _pytest.raises(ValueError, match="must be >= p"):
        es(tall_df, "close", 5000, out="e", segment_rows="auto")


def test_segment_rows_validated_before_any_job(spark, tall_df):
    """Invalid segment_rows raises ValueError at the TOP of
    _segmented_base (ADVICE r12) — previously 0 surfaced as
    ZeroDivisionError, and only after paying the checkpoint + max(_rn)
    action."""
    import pytest as _pytest

    from polars_quant_spark.operators.segmented import ewma_segmented as es

    for bad in (0, -5, 2.5, "autox", True):
        with _pytest.raises(ValueError, match="segment_rows"):
            es(tall_df, "close", 5, out="e", segment_rows=bad)


def test_auto_backtest_mixed_corpus_split(spark, tall_df):
    """Mixed corpora split per key (VERDICT r11 #5): only oversized
    symbols ride the sequential segmented passes; the rest keep the
    one-job plain fold. The union must equal the plain whole-corpus fold
    on every row, and an all-big corpus must still dispatch fully
    segmented."""
    from polars_quant_spark.backtest.vectorized import (
        auto_backtest,
        vectorized_backtest,
    )
    from polars_quant_spark.plans.inspect import plan_str

    w = Window.partitionBy("symbol").orderBy("t")
    sig = (
        tall_df.withColumn("_f", F.avg("close").over(w.rowsBetween(-4, 0)))
        .withColumn("_s", F.avg("close").over(w.rowsBetween(-19, 0)))
        .withColumn("buy", F.col("_f") > F.col("_s"))
        .withColumn("sell", F.col("_f") < F.col("_s"))
        .drop("_f", "_s")
    )
    cols = ["position", "cash", "equity", "drawdown", "n_trades", "n_wins"]
    want = {(r["symbol"], r["t"]): tuple(r[c] for c in cols)
            for r in vectorized_backtest(sig).select("symbol", "t", *cols).collect()}

    # FAT(2500) > 1000 >= THIN(40): probe finds both regimes -> split
    mixed = auto_backtest(sig, threshold=1000, segment_rows=800)
    ps = plan_str(mixed)
    assert "Union" in ps  # both arms present
    got = {(r["symbol"], r["t"]): tuple(r[c] for c in cols)
           for r in mixed.select("symbol", "t", *cols).collect()}
    assert got == want

    # every symbol above threshold -> single segmented plan, no Union
    allbig = auto_backtest(sig, threshold=30, segment_rows=800)
    assert "Union" not in plan_str(allbig).split("ExistingRDD")[0]
    got2 = {(r["symbol"], r["t"]): tuple(r[c] for c in cols)
            for r in allbig.select("symbol", "t", *cols).collect()}
    assert got2 == want


def test_auto_backtest_null_key_groups(spark, tall_df):
    """NULL partition keys route correctly at every size (ADVICE r12):
    the probe's collect_list(when(...)) drops the null marker, so an
    OVERSIZED null-key group used to slip onto the whole-symbol plain
    fold (the OOM regime), and the segmented arm's equi-join-backs would
    have given it NULL output anyway. Now the probe measures the null
    group explicitly; big null groups run segmented under a synthetic
    constant key (restored to null after), small ones keep the null-safe
    plain arm. Ground truth is vectorized_backtest, whose pure
    groupBy().applyInPandas keeps a null group natively."""
    from polars_quant_spark.backtest.vectorized import (
        auto_backtest,
        vectorized_backtest,
    )

    w = Window.partitionBy("symbol").orderBy("t")
    sig = (
        tall_df
        # FAT -> null key (2500 rows, the oversized group); THIN stays
        .withColumn(
            "symbol",
            F.when(F.col("symbol") == "FAT", F.lit(None)).otherwise(
                F.col("symbol")
            ),
        )
        .withColumn("_f", F.avg("close").over(w.rowsBetween(-4, 0)))
        .withColumn("_s", F.avg("close").over(w.rowsBetween(-19, 0)))
        .withColumn("buy", F.col("_f") > F.col("_s"))
        .withColumn("sell", F.col("_f") < F.col("_s"))
        .drop("_f", "_s")
    )
    cols = ["position", "cash", "equity", "drawdown", "n_trades", "n_wins"]
    want = {(r["symbol"], r["t"]): tuple(r[c] for c in cols)
            for r in vectorized_backtest(sig).select("symbol", "t", *cols).collect()}

    # null group (2500) > 1000 >= THIN(40): null rides segmented, THIN plain
    big_null = auto_backtest(sig, threshold=1000, segment_rows=800)
    got = {(r["symbol"], r["t"]): tuple(r[c] for c in cols)
           for r in big_null.select("symbol", "t", *cols).collect()}
    assert got == want

    # both oversized: null -> sentinel segmented, THIN -> segmented
    got2 = {(r["symbol"], r["t"]): tuple(r[c] for c in cols)
            for r in auto_backtest(sig, threshold=30, segment_rows=800)
            .select("symbol", "t", *cols).collect()}
    assert got2 == want

    # small null group: stays on the plain arm (threshold above both)
    got3 = {(r["symbol"], r["t"]): tuple(r[c] for c in cols)
            for r in auto_backtest(sig, threshold=5000)
            .select("symbol", "t", *cols).collect()}
    assert got3 == want


def test_ema_chain_fused_seed_spans_segment_boundary(spark, tall_df):
    """Round-13 fused chain sweep: with tiny segments (segment_rows barely
    above p), the LATER chains' SMA seed windows span several segment
    boundaries — the (seen, partial-sum) carry must resume the seed's
    left-to-right adds exactly. With p=100 and segment_rows=260, chain 6
    starts warming at valid row 495 and its 100-row seed window crosses
    the boundary at 520 (chains 3-5 span boundaries too)."""
    import polars_quant_spark.operators.segmented as seg

    whole = (
        with_recurrences(tall_df, [Rec("v", "t3", ["close"], {"p": 100})])
        .select("symbol", "t", "v")
        .collect()
    )
    segd = (
        seg.t3_segmented(tall_df, "close", p=100, out="v", segment_rows=260)
        .select("symbol", "t", "v")
        .collect()
    )
    w = {(r["symbol"], r["t"]): r["v"] for r in whole}
    s = {(r["symbol"], r["t"]): r["v"] for r in segd}
    assert set(w) == set(s)
    diff = [k for k in w if (w[k] is None) != (s[k] is None) or
            (w[k] is not None and w[k] != s[k])]
    assert not diff, diff[:5]
    assert sum(v is not None for v in s.values()) > 1800


def test_segmented_arrow_arm_bit_equal_to_pandas_arm(spark, tall_df):
    """The applyInArrow arms (round-13 default) must produce EXACTLY what
    the applyInPandas spec arms produce — values and NULL positions — for
    both the single-chain sweep (ewma_segmented) and the fused multi-chain
    sweep with a derived chain (adx_family_segmented → _fused_ewma_sweep's
    str/index/callable source forms)."""
    from polars_quant_spark.operators import segmented as seg_mod
    from polars_quant_spark.operators.segmented import adx_family_segmented

    rng = np.random.default_rng(11)
    n = 1200
    hi = 100.0 + np.cumsum(rng.normal(0, 1, n))
    base = pd.DataFrame(
        {
            "symbol": "FAT",
            "t": np.arange(n),
            "high": hi,
            "low": hi - rng.uniform(0.1, 2.0, n),
            "close": hi - rng.uniform(0.0, 1.5, n),
        }
    )
    df = spark.createDataFrame(base)

    def both(fn):
        assert not seg_mod._FORCE_PANDAS_ARM
        arrow_rows = fn().collect()
        seg_mod._FORCE_PANDAS_ARM = True
        try:
            pandas_rows = fn().collect()
        finally:
            seg_mod._FORCE_PANDAS_ARM = False
        return arrow_rows, pandas_rows

    # single-chain sweep
    a, b = both(
        lambda: ewma_segmented(
            df.select("symbol", "t", "close"), "close", 14,
            alpha=1.0 / 14, out="e", segment_rows=300,
        ).select("symbol", "t", "e")
    )
    ka = {(r["symbol"], r["t"]): r["e"] for r in a}
    kb = {(r["symbol"], r["t"]): r["e"] for r in b}
    assert set(ka) == set(kb) and len(ka) == n
    bad = [k for k in ka if ka[k] != kb[k] and not (ka[k] is None and kb[k] is None)]
    assert not bad, bad[:5]

    # fused sweep, all three source forms (str, callable) + 7 outputs
    cols = ["plus_dm", "minus_dm", "plus_di", "minus_di", "dx", "adx", "adxr"]
    a, b = both(
        lambda: adx_family_segmented(df, p=14, segment_rows=300).select(
            "symbol", "t", *cols
        )
    )
    ka = {(r["symbol"], r["t"]): tuple(r[c] for c in cols) for r in a}
    kb = {(r["symbol"], r["t"]): tuple(r[c] for c in cols) for r in b}
    assert set(ka) == set(kb) and len(ka) == n
    bad = [k for k in ka if ka[k] != kb[k]]
    assert not bad, bad[:5]


def test_segmented_arrow_arm_bit_equal_remaining_sites(spark):
    """Round-14: the four remaining segmented operators grew applyInArrow
    arms (kama, sar-family, ewma_q, backtest segmented). Each Arrow arm
    must produce EXACTLY what its applyInPandas spec arm produces — values
    and NULL positions — including the halo-only-group early-exit (uneven
    symbol lengths: MID ends just inside, EDGE exactly at, a later
    boundary's halo window)."""
    from polars_quant_spark.backtest.vectorized import BacktestParams
    from polars_quant_spark.operators import segmented as seg_mod
    from polars_quant_spark.operators.segmented import (
        backtest_segmented,
        ewma_q_segmented,
        kama_segmented,
        sarext_segmented,
    )

    rng = np.random.default_rng(17)
    frames = []
    for sym, n in [("FAT", 450), ("MID", 99), ("EDGE", 100)]:
        close = 100.0 + np.cumsum(rng.normal(0, 1, n))
        frames.append(
            pd.DataFrame(
                {
                    "symbol": sym,
                    "t": np.arange(n),
                    "high": close * 1.01,
                    "low": close * 0.99,
                    "close": close,
                    "cm": np.floor(close * 1e6 + 0.5),
                    "buy": (np.arange(n) % 37) == 3,
                    "sell": (np.arange(n) % 29) == 7,
                }
            )
        )
    df = spark.createDataFrame(pd.concat(frames, ignore_index=True))

    def both(fn, cols):
        assert not seg_mod._FORCE_PANDAS_ARM
        a = fn().select("symbol", "t", *cols).collect()
        seg_mod._FORCE_PANDAS_ARM = True
        try:
            b = fn().select("symbol", "t", *cols).collect()
        finally:
            seg_mod._FORCE_PANDAS_ARM = False
        ka = {(r["symbol"], r["t"]): tuple(r[c] for c in cols) for r in a}
        kb = {(r["symbol"], r["t"]): tuple(r[c] for c in cols) for r in b}
        assert set(ka) == set(kb) and len(ka) == 450 + 99 + 100
        bad = [k for k in ka if ka[k] != kb[k]]
        assert not bad, bad[:5]

    both(lambda: kama_segmented(df, "close", 10, out="v", segment_rows=100), ["v"])
    both(lambda: sarext_segmented(df, out="v", segment_rows=100), ["v"])
    both(
        lambda: ewma_q_segmented(df, "cm", 2.0 / 13.0, 12, out="v", segment_rows=100),
        ["v"],
    )
    both(
        lambda: backtest_segmented(
            df,
            params=BacktestParams(stop_loss=0.02, trailing_stop=0.03),
            segment_rows=137,
        ),
        ["position", "cash", "equity", "drawdown", "n_trades", "n_wins"],
    )


def test_fused_sweep_nan_accumulator_after_seed_propagates(spark):
    """ADVICE r13 (segmented.py scan_chains): a chain whose SEEDED
    accumulator is NaN at a segment boundary — the np.cumsum SMA seed over
    a window containing inf and -inf is NaN, and an all-inf tail keeps the
    carried e NaN through the segment end (pandas ewm treats inf as
    missing) — used to re-enter the warm-up branch on the next segment
    with need == 0, re-seeding from the bogus psum/p = 0.0. The warm-up
    guard is now `seen < p`, so the resume branch's NaN-seeded ewm
    restarts at the next valid value — exactly what the single-group
    kernel's one continuous ewm computes on the same input."""
    from polars_quant_spark.operators.segmented import dema_segmented

    n = 20
    close = np.arange(5.0, 5.0 + n)
    close[0], close[1], close[2] = 1.0, np.inf, -np.inf  # NaN SMA seed (p=3)
    close[3] = close[4] = np.inf  # ewm carries the NaN seed to the boundary
    df = spark.createDataFrame(
        pd.DataFrame({"symbol": "X", "t": np.arange(n), "close": close})
    )
    whole = (
        with_recurrences(df, [Rec("v", "dema", ["close"], {"p": 3})])
        .select("symbol", "t", "v")
        .collect()
    )
    segd = (
        dema_segmented(df, "close", p=3, out="v", segment_rows=5)
        .select("symbol", "t", "v")
        .collect()
    )
    _bit_equal(whole, segd, "v")


def test_indicator_family_segmented_bit_equal_to_per_op(spark, tall_df):
    """Round-14 (VERDICT r13 #5): the fused multi-op family sweep — RSI +
    ATR + the DMI/ADX family + T3 in ONE sweep — must produce EXACTLY what
    composing the four per-op segmented calls produces, column by column,
    values and NULL positions, across segment boundaries. Covers both the
    shared-_str path (atr_p == adx_p) and the extra-chain path
    (atr_p != adx_p)."""
    from polars_quant_spark.operators.segmented import (
        adx_family_segmented,
        atr_segmented,
        indicator_family_segmented,
        rsi_segmented,
        t3_segmented,
    )

    hl = tall_df.withColumn("high", F.col("close") * 1.01).withColumn(
        "low", F.col("close") * 0.99
    )
    fam_cols = [
        "rsi", "atr", "plus_dm", "minus_dm", "plus_di", "minus_di",
        "dx", "adx", "adxr", "t3",
    ]

    for atr_p in (14, 10):
        per_op = rsi_segmented(hl, "close", 14, out="rsi", segment_rows=700)
        per_op = atr_segmented(
            per_op, p=atr_p, out="atr", segment_rows=700
        )
        per_op = adx_family_segmented(per_op, p=14, segment_rows=700)
        per_op = t3_segmented(per_op, "close", 5, out="t3", segment_rows=700)
        a = per_op.select("symbol", "t", *fam_cols).collect()
        fam = indicator_family_segmented(
            hl, rsi_p=14, atr_p=atr_p, adx_p=14, t3_p=5, segment_rows=700
        )
        b = fam.select("symbol", "t", *fam_cols).collect()
        for c in fam_cols:
            _bit_equal(a, b, c)
