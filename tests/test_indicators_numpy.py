"""Indicator parity vs straightforward NumPy reference implementations
(SURVEY.md §5 item 1 — the reference's own test strategy is oracle comparison
against TA-Lib; TA-Lib isn't in this container, so the oracles are independent
NumPy re-derivations written from the declared formulas)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from polars_quant_spark.functions import momentum as mo
from polars_quant_spark.functions import overlap as ov
from polars_quant_spark.functions import volume as vu
from polars_quant_spark.operators import recurrence as rec

RNG = np.random.default_rng(42)
N = 300


@pytest.fixture(scope="module")
def ohlcv(spark):
    close = 100.0 + np.cumsum(RNG.normal(0, 1, N))
    close = np.maximum(close, 1.0)
    open_ = np.concatenate([[close[0]], close[:-1]])
    high = np.maximum(open_, close) * 1.002
    low = np.minimum(open_, close) * 0.998
    vol = RNG.integers(100, 1000, N).astype(float)
    pdf = pd.DataFrame(
        {
            "symbol": ["X"] * N,
            "t": np.arange(1, N + 1),
            "open": open_,
            "high": high,
            "low": low,
            "close": close,
            "volume": vol,
        }
    )
    return spark.createDataFrame(pdf), pdf


W = None


def _w():
    return Window.partitionBy("symbol").orderBy("t")


def _collect(df, colname):
    rows = df.orderBy("t").select(colname).collect()
    return np.array([r[0] if r[0] is not None else np.nan for r in rows])


def test_sma(ohlcv):
    df, pdf = ohlcv
    got = _collect(df.withColumn("x", ov.sma("close", 20, _w())), "x")
    want = pdf["close"].rolling(20).mean().to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-9, equal_nan=True)


def test_wma(ohlcv):
    df, pdf = ohlcv
    got = _collect(df.withColumn("x", ov.wma("close", 10, _w())), "x")
    weights = np.arange(1, 11)
    want = (
        pdf["close"].rolling(10).apply(lambda v: np.dot(v, weights) / weights.sum(), raw=True)
    ).to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-9, equal_nan=True)


def test_bbands(ohlcv):
    df, pdf = ohlcv
    up, mid, lo = ov.bbands("close", 20, 2, 2, _w())
    got = _collect(df.withColumn("x", up), "x")
    m = pdf["close"].rolling(20).mean()
    sd = pdf["close"].rolling(20).std(ddof=0)
    np.testing.assert_allclose(got, (m + 2 * sd).to_numpy(), rtol=1e-9, equal_nan=True)


def test_ema_sma_seed(ohlcv):
    df, pdf = ohlcv
    out = rec.with_recurrences(df, [rec.Rec("x", "ema", ["close"], {"p": 20})])
    got = _collect(out, "x")
    x = pdf["close"].to_numpy()
    want = np.full(N, np.nan)
    e = x[:20].mean()
    want[19] = e
    a = 2.0 / 21.0
    for i in range(20, N):
        e += a * (x[i] - e)
        want[i] = e
    np.testing.assert_allclose(got, want, rtol=1e-9, equal_nan=True)


def test_rsi_wilder(ohlcv):
    df, pdf = ohlcv
    out = rec.with_recurrences(df, [rec.Rec("x", "rsi", ["close"], {"p": 14})])
    got = _collect(out, "x")
    x = pdf["close"].to_numpy()
    d = np.diff(x)
    up = np.where(d > 0, d, 0.0)
    dn = np.where(d < 0, -d, 0.0)
    want = np.full(N, np.nan)
    au, ad = up[:14].mean(), dn[:14].mean()
    want[14] = 100.0 if ad == 0 else 100.0 * au / (au + ad)
    for i in range(15, N):
        au += (up[i - 1] - au) / 14.0
        ad += (dn[i - 1] - ad) / 14.0
        want[i] = 100.0 if ad == 0 else 100.0 * au / (au + ad)
    np.testing.assert_allclose(got, want, rtol=1e-6, equal_nan=True)


def test_willr_flat_range_zero(spark):
    pdf = pd.DataFrame(
        {
            "symbol": ["X"] * 20,
            "t": range(1, 21),
            "high": [5.0] * 20,
            "low": [5.0] * 20,
            "close": [5.0] * 20,
        }
    )
    df = spark.createDataFrame(pdf)
    got = _collect(df.withColumn("x", mo.willr("high", "low", "close", 14, _w())), "x")
    assert np.isnan(got[:13]).all()
    np.testing.assert_allclose(got[13:], 0.0)


def test_obv_seed_and_sign(spark):
    pdf = pd.DataFrame(
        {
            "symbol": ["X"] * 4,
            "t": [1, 2, 3, 4],
            "close": [10.0, 11.0, 9.0, 9.0],
            "volume": [100.0, 200.0, 300.0, 400.0],
        }
    )
    df = spark.createDataFrame(pdf)
    got = _collect(df.withColumn("x", vu.obv("close", "volume", _w())), "x")
    np.testing.assert_allclose(got, [100.0, 300.0, 0.0, 0.0])


def test_mom_lag(ohlcv):
    df, pdf = ohlcv
    got = _collect(df.withColumn("x", mo.mom("close", 10, _w())), "x")
    want = pdf["close"].diff(10).to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-9, equal_nan=True)


def test_macd_composition(ohlcv):
    df, pdf = ohlcv
    out = rec.with_recurrences(
        df, [rec.Rec(["dif", "dea", "hist"], "macd", ["close"], {})]
    )
    dif = _collect(out, "dif")
    dea = _collect(out, "dea")
    hist = _collect(out, "hist")
    x = pdf["close"].to_numpy()
    e12 = rec.ema(x, 12)
    e26 = rec.ema(x, 26)
    np.testing.assert_allclose(dif, e12 - e26, rtol=1e-9, equal_nan=True)
    np.testing.assert_allclose(hist, dif - dea, rtol=1e-9, equal_nan=True)


def test_null_skipping(spark):
    """Nulls don't consume window slots in recurrence kernels (reference
    null semantics, overlap.rs:891-895)."""
    x = [1.0, 2.0, None, 3.0, 4.0, 5.0, 6.0]
    pdf = pd.DataFrame({"symbol": ["X"] * 7, "t": range(1, 8), "close": x})
    df = spark.createDataFrame(pdf)
    out = rec.with_recurrences(df, [rec.Rec("e", "ema", ["close"], {"p": 3})])
    got = _collect(out, "e")
    assert np.isnan(got[2])  # null in → null out
    # seed = mean of first 3 *valid* values (1,2,3) at the 3rd valid row
    np.testing.assert_allclose(got[3], 2.0)


def test_supertrend_invariants():
    """Line sits below price in uptrends and above in downtrends; both
    directions occur on a wandering series; the line ratchets (never moves
    against the trend while the trend holds)."""
    import numpy as np

    from polars_quant_spark.operators.recurrence import supertrend

    rng = np.random.default_rng(3)
    c = 100 + np.cumsum(rng.normal(0, 2, 400))
    h = c + rng.uniform(0.1, 1, 400)
    l = c - rng.uniform(0.1, 1, 400)
    st, d = supertrend(h, l, c, p=10, mult=3.0)
    m = ~np.isnan(st)
    assert {1.0, -1.0} <= set(d[m])
    assert ((d[m] == 1.0) <= (st[m] <= c[m] + 1e-9)).all()
    assert ((d[m] == -1.0) <= (st[m] >= c[m] - 1e-9)).all()
    # ratchet: within a run of constant direction the line is monotone
    idx = np.where(m)[0]
    for i, j in zip(idx[:-1], idx[1:]):
        if d[i] == d[j] == 1.0:
            assert st[j] >= st[i] - 1e-9  # uptrend line never falls
        elif d[i] == d[j] == -1.0:
            assert st[j] <= st[i] + 1e-9  # downtrend line never rises
