"""HT/MESA family sanity tests + Structured Streaming window tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_quant_spark.operators import hilbert
from polars_quant_spark.operators.recurrence import Rec, with_recurrences
from polars_quant_spark.streaming import windows as sw

N = 200
RNG = np.random.default_rng(11)


@pytest.fixture(scope="module")
def wave():
    t = np.arange(N)
    # a clean 20-bar cycle plus drift — the MESA machine should lock near 20
    return 100.0 + 5.0 * np.sin(2 * np.pi * t / 20.0) + 0.01 * t


def test_ht_dcperiod_locks_cycle(wave):
    out = hilbert.ht_dcperiod(wave)
    tail = out[100:]
    assert np.isnan(out[:31]).all()  # 31-bar warmup (cycle.rs:66-68)
    assert not np.isnan(out[31])
    assert 10.0 < np.nanmean(tail) < 35.0  # locked in the right region


def test_ht_warmup_and_short_series(wave):
    short = hilbert.ht_dcperiod(wave[:20])
    assert np.isnan(short).all()  # n < 32 → all null (cycle.rs:16-18)


def test_ht_sine_bounds(wave):
    s, lead = hilbert.ht_sine(wave)
    valid = ~np.isnan(s)
    assert valid.sum() > 0
    assert (np.abs(s[valid]) <= 1.0 + 1e-12).all()
    assert (np.abs(lead[~np.isnan(lead)]) <= 1.0 + 1e-12).all()


def test_ht_trendmode_binary(wave):
    out = hilbert.ht_trendmode(wave)
    valid = out[~np.isnan(out)]
    assert set(np.unique(valid)) <= {0.0, 1.0}


def test_mama_follows_price(wave):
    m, f = hilbert.mama(wave)
    valid = ~np.isnan(m)
    # adaptive MA stays inside the price envelope
    assert (m[valid] > wave[valid].min() - 6).all()
    assert (m[valid] < wave[valid].max() + 6).all()
    # fama is smoother (smaller variance of diffs)
    dv = np.diff(m[valid])
    df_ = np.diff(f[valid])
    assert np.nanstd(df_) <= np.nanstd(dv) + 1e-9


def test_mavp_variable_period(wave):
    periods = np.full(N, 5.0)
    out = hilbert.mavp(wave, periods, 2, 30)
    want = pd.Series(wave).rolling(5).mean().to_numpy()
    np.testing.assert_allclose(out[4:], want[4:], rtol=1e-9)


def test_ht_family_spark(spark):
    pdf = pd.DataFrame(
        {
            "symbol": ["X"] * N,
            "t": np.arange(1, N + 1),
            "close": 100.0 + 5.0 * np.sin(2 * np.pi * np.arange(N) / 20.0),
        }
    )
    df = spark.createDataFrame(pdf)
    out = with_recurrences(
        df,
        [
            Rec("dcp", "ht_dcperiod", ["close"], {}),
            Rec(["mama", "fama"], "mama", ["close"], {}),
        ],
    )
    rows = out.where(F.col("dcp").isNotNull()).count()
    assert rows == N - 31  # output starts at bar index 31


def test_streaming_tumbling_counts(spark, sf_dir):
    ev = sw.read_events_stream(spark, sf_dir)
    agg = sw.tumbling_counts(ev, window="1 day", watermark="2 days")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT sum(n_events) AS n FROM tumbling_test"
    ).collect()[0]["n"]
    assert got == 1000  # every sf0.001 event lands in some window
    q.stop()


def test_streaming_session_windows(spark, sf_dir):
    ev = sw.read_events_stream(spark, sf_dir)
    agg = sw.session_windows(ev, gap="1 hour", watermark="2 days")
    q = (
        agg.writeStream.format("memory")
        .queryName("session_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM session_test").collect()
    assert len(rows) > 0
    assert sum(r["n_events"] for r in rows) == 1000
    q.stop()
