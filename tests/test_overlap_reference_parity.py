"""Parity of the repo's overlap kernels against tests/overlap_reference.py —
the independent per-value transcriptions of the reference's EMA-family
contracts (/root/reference/src/talib/overlap.rs).

Two kinds of assertion, mirroring that module's docstring:

* WHERE THE REFERENCE IS STANDARD (sma/ema/trima/tema/t3, and dema values
  past its one-row-late start), the repo kernels must match the
  transcription allclose (the transcriptions use plain ``a*(x-e)+e`` while
  the Rust uses mul_add, so exact equality is not expected).
* WHERE THE REFERENCE DIVERGES from standard TA-Lib (catalogued in SURVEY
  §0: calc_wma's missing ``-= sum`` rebalance, calc_dema's one-row-late
  start, calc_kama's window-of-period-changes ER and 2p-row warmup), the
  DIVERGENCE ITSELF is asserted — the transcription must reproduce the
  reference's drift/null pattern and the repo must implement the standard
  form instead. If either side changes silently, these tests fail.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window

from polars_quant_spark.functions import overlap as ov
from polars_quant_spark.operators import recurrence as rec
from tests.overlap_reference import (
    ref_dema,
    ref_ema,
    ref_kama,
    ref_sma,
    ref_t3,
    ref_tema,
    ref_trima,
    ref_wma,
)

N = 160
RNG = np.random.default_rng(42)
V = np.maximum(100.0 + np.cumsum(RNG.normal(0, 1.5, N)), 1.0)


def _ref_arr(vals: list[float | None]) -> np.ndarray:
    return np.array([np.nan if x is None else x for x in vals])


@pytest.fixture(scope="module")
def frame(spark):
    pdf = pd.DataFrame({"symbol": ["X"] * N, "t": np.arange(N), "close": V})
    return spark.createDataFrame(pdf)


def _collect(df, col):
    rows = df.orderBy("t").select(col).collect()
    return np.array([np.nan if r[0] is None else r[0] for r in rows])


def _w():
    return Window.partitionBy("symbol").orderBy("t")


# --- standard contracts: repo == transcription -----------------------------


def test_sma_parity(frame):
    got = _collect(frame.withColumn("x", ov.sma("close", 12, _w())), "x")
    np.testing.assert_allclose(got, _ref_arr(ref_sma(list(V), 12)), rtol=1e-9, equal_nan=True)


def test_trima_parity(frame):
    for p in (9, 10):  # odd and even n1/n2 splits
        got = _collect(frame.withColumn("x", ov.trima("close", p, _w())), "x")
        np.testing.assert_allclose(
            got, _ref_arr(ref_trima(list(V), p)), rtol=1e-9, equal_nan=True
        )


def test_ema_parity():
    np.testing.assert_allclose(
        rec.ema(V, 10), _ref_arr(ref_ema(list(V), 10)), rtol=1e-12, equal_nan=True
    )


def test_tema_parity():
    np.testing.assert_allclose(
        rec.tema(V, 8), _ref_arr(ref_tema(list(V), 8)), rtol=1e-9, equal_nan=True
    )


def test_t3_parity():
    np.testing.assert_allclose(
        rec.t3(V, 6, 0.7), _ref_arr(ref_t3(list(V), 6, 0.7)), rtol=1e-9, equal_nan=True
    )


# --- catalogued divergences: the transcription reproduces the reference's
# --- behaviour, the repo implements the standard form ----------------------


def test_wma_first_window_matches_then_reference_drifts(frame):
    p = 10
    got = _collect(frame.withColumn("x", ov.wma("close", p, _w())), "x")
    ref = _ref_arr(ref_wma(list(V), p))
    # identical null pattern and an identical FIRST full window…
    np.testing.assert_array_equal(np.isnan(got), np.isnan(ref))
    np.testing.assert_allclose(got[p - 1], ref[p - 1], rtol=1e-9)
    # …but calc_wma's missing `numerator -= sum` rebalance makes the
    # reference drift afterwards (overlap.rs:1328-1398) — the repo's
    # standard WMA must NOT reproduce that drift
    later = np.nanmax(np.abs(got[p:] - ref[p:]))
    assert later > 1e-3, "reference WMA drift disappeared — recheck SURVEY §0"


def test_dema_reference_starts_one_row_late():
    p = 10
    got = rec.dema(V, p)
    ref = _ref_arr(ref_dema(list(V), p))
    seed_row = 2 * p - 2
    # the reference NULLs its seed row (count == 2p-1; overlap.rs:543-658),
    # the repo emits it, consistent with the reference's own TEMA/T3
    assert np.isnan(ref[seed_row]) and not np.isnan(got[seed_row])
    # past the late start the recursions coincide
    np.testing.assert_allclose(
        got[seed_row + 1 :], ref[seed_row + 1 :], rtol=1e-9, equal_nan=True
    )


def test_kama_reference_warmup_and_er_diverge():
    p = 10
    got = rec.kama(V, p)
    ref = _ref_arr(ref_kama(list(V), p))
    # repo: standard SMA(p) seed at row p-1; reference: fold seeded from
    # mean(v[p..2p-1]), first emission at row 2p-1 (overlap.rs:732-855)
    assert not np.isnan(got[p - 1]) and np.isnan(ref[p - 1])
    first_ref = int(np.flatnonzero(~np.isnan(ref))[0])
    assert first_ref == 2 * p - 1
    # different ER constructions → materially different smoothing paths
    both = ~np.isnan(got) & ~np.isnan(ref)
    assert np.nanmax(np.abs(got[both] - ref[both])) > 1e-3
