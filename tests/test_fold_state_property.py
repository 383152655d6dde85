"""Property tests: resumable scans are segmentation-invariant at the
numpy level.

The Spark-side bit-equality suites (tests/test_segmented.py) prove the
full plumbing at a handful of segment sizes; these tests hammer the
CARRY LOGIC itself — for random inputs and a random cut point, running
the scan whole must equal running it in two pieces with the state handed
across. Hypothesis draws only (seed, shape, cut) scalars; the series
come from a seeded numpy generator, so example generation stays fast
(drawing large float lists through hypothesis directly was measured at
minutes per test)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from polars_quant_spark.backtest.vectorized import BacktestParams, _fold_state
from polars_quant_spark.operators.segmented import _SarParams, _sar_scan


@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(3, 200),
    ext=st.booleans(),
    sv=st.sampled_from([0.0, 50.0, -50.0]),
)
@settings(max_examples=150, deadline=None)
def test_sar_scan_segmentation_invariant(seed, n, ext, sv):
    rng = np.random.default_rng(seed)
    close = np.abs(100 + np.cumsum(rng.normal(0, 1, n))) + 1.0
    hh, ll = close * 1.01, close * 0.99
    p = _SarParams(
        sv if ext else 0.0,
        float(rng.uniform(0, 0.05)) if ext else 0.0,
        0.02, 0.03, 0.25,
        0.01 if ext else 0.02,
        0.04 if ext else 0.02,
        0.15 if ext else 0.2,
        signed=ext,
    )
    whole, st_whole = _sar_scan(hh, ll, None, 1, p)
    cut = int(rng.integers(2, n))  # continuation legal: 2-row halo exists
    first, st1 = _sar_scan(hh[:cut], ll[:cut], None, 1, p)
    second, st2 = _sar_scan(hh[cut - 2 :], ll[cut - 2 :], st1, 2, p)
    glued = np.concatenate([first, second[2:]])
    np.testing.assert_array_equal(whole, glued)
    assert st_whole == st2


@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(1, 200),
    stops=st.booleans(),
)
@settings(max_examples=150, deadline=None)
def test_backtest_fold_segmentation_invariant(seed, n, stops):
    rng = np.random.default_rng(seed)
    price = np.abs(100 + np.cumsum(rng.normal(0, 2, n))) + 1.0
    if n >= 5:  # freeze-state coverage: a NaN and a non-positive price
        price[rng.integers(0, n)] = np.nan
        price[rng.integers(0, n)] = -1.0
    buy = rng.integers(0, 2, n).astype(bool)
    sell = rng.integers(0, 2, n).astype(bool)
    p = (
        BacktestParams(stop_loss=0.02, take_profit=0.05, trailing_stop=0.03)
        if stops
        else BacktestParams()
    )
    pos_w, cash_w, eq_w, dd_w, st_w = _fold_state(price, buy, sell, p)
    cut = int(rng.integers(0, n + 1))
    a = _fold_state(price[:cut], buy[:cut], sell[:cut], p)
    b = _fold_state(price[cut:], buy[cut:], sell[cut:], p, a[4])
    for whole, first, second in zip((pos_w, cash_w, eq_w, dd_w), a[:4], b[:4]):
        np.testing.assert_array_equal(whole, np.concatenate([first, second]))
    # final states must agree including NaN last_price (tuple == is False
    # for NaN, so compare fields with nan-awareness)
    for x, y in zip(st_w, b[4]):
        assert x == y or (
            isinstance(x, float) and isinstance(y, float)
            and np.isnan(x) and np.isnan(y)
        )
