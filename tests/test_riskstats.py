"""functions/riskstats entry points (round-8 promotions) at NON-default
parameters — the routed queries + golden hashes lock the defaults; these
tests pin the parameterization against independent pandas/numpy math on
the same quantization discipline."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_quant_spark.functions import riskstats as rs
from polars_quant_spark.sources.bars import bars


@pytest.fixture(scope="module")
def pdf(spark, sf_dir):
    return (
        bars(spark, sf_dir)
        .select("symbol", "t", "close")
        .orderBy("symbol", "t")
        .toPandas()
    )


def _qret(g: pd.Series) -> pd.Series:
    r = (g / g.shift(1) - 1.0) * 1e6 + 0.5
    return np.floor(r)


def test_rolling_beta_p20(spark, sf_dir, pdf):
    out = (
        rs.rolling_beta(bars(spark, sf_dir), p=20, out="b20")
        .orderBy("symbol", "t")
        .toPandas()
    )
    # independent pandas replica of the quantized moment math
    d = pdf.copy()
    d["qr"] = d.groupby("symbol")["close"].transform(_qret)
    d = d.dropna(subset=["qr"])
    qm = (
        d.groupby("t")["qr"]
        .apply(lambda s: np.floor(s.sum() / len(s) + 0.5))
        .rename("qm")
    )
    d = d.join(qm, on="t")
    rows = []
    for sym, g in d.groupby("symbol"):
        g = g.sort_values("t")
        a, m = g["qr"].to_numpy(), g["qm"].to_numpy()
        for i in range(19, len(g)):
            qa, qb = a[i - 19 : i + 1], m[i - 19 : i + 1]
            cov = (qa * qb).sum() / 1e12 - (qa.sum() / 1e6) * (
                qb.sum() / 1e6
            ) / 20
            var = (qb * qb).sum() / 1e12 - (qb.sum() / 1e6) * (
                qb.sum() / 1e6
            ) / 20
            if var > 0:
                rows.append((sym, g["t"].iloc[i], cov / var))
    want = pd.DataFrame(rows, columns=["symbol", "t", "b20"])
    got = out.sort_values(["symbol", "t"]).reset_index(drop=True)
    want = want.sort_values(["symbol", "t"]).reset_index(drop=True)
    assert len(got) == len(want)
    np.testing.assert_allclose(
        got["b20"].to_numpy(), want["b20"].to_numpy(), rtol=1e-9
    )


def test_variance_ratio_q10(spark, sf_dir):
    out = (
        rs.variance_ratio(bars(spark, sf_dir), q=10, out="vr10")
        .orderBy("symbol")
        .toPandas()
    )
    assert len(out) > 0
    # a VR over real-ish random-walk data sits in a sane band
    v = out["vr10"].dropna()
    assert ((v > 0.05) & (v < 20.0)).all()


def test_sortino_matches_query_shape(spark, sf_dir):
    out = rs.sortino(bars(spark, sf_dir)).toPandas()
    assert set(out.columns) == {"symbol", "mean_ret", "downside_dev", "sortino"}
    d = out.dropna(subset=["sortino"])
    np.testing.assert_allclose(
        d["sortino"].to_numpy(),
        (d["mean_ret"] / d["downside_dev"]).to_numpy(),
        rtol=1e-12,
    )


def test_hurst_weights_sum_zero_scale_invariance(spark, sf_dir):
    """Σw = 0 makes the estimator invariant to the micro² unit scale —
    doubling every variance shifts each ln by the same constant, which the
    weights cancel. The test-data closes are i.i.d.-noise-like (stationary
    prices, anti-correlated returns), so H sits near 0, the strong
    mean-reversion end — the band just guards against unit/sign blowups."""
    out = rs.hurst(bars(spark, sf_dir)).toPandas()
    assert len(out) > 0
    h = out["hurst"].dropna()
    assert ((h > -0.5) & (h < 1.2)).all()


def test_collision_guard(spark, sf_dir):
    """ADVICE r8: input columns that merely share a name with an output or
    internal alias are NOT collisions — the functions build narrow explicit
    selects, so those inputs never flow through. The only real hazards are
    an out= matching a key column, or a key column matching a hard-coded
    internal alias."""
    b = bars(spark, sf_dir).withColumn("beta", F.lit(0.0)).withColumn(
        "qr", F.lit(1)
    )
    assert rs.rolling_beta(b).columns == ["symbol", "t", "beta"]
    with pytest.raises(ValueError, match="output column"):
        rs.rolling_beta(bars(spark, sf_dir), out="t")
    with pytest.raises(ValueError, match="internal aliases"):
        rs.rolling_beta(
            bars(spark, sf_dir).withColumnRenamed("t", "qm"), order_by="qm"
        )
