"""Portfolio construction (extension of the backtest/metrics surface).

``min_variance_weights`` follows the engine's moment-aggregation pattern
(linear.py OLS, similarity.embedding_gram): the distributed work reduces
the data to an S×S covariance (S = number of assets — driver-tiny), the
S-dimensional solve runs on the driver with numpy, and the weights come
back as a small DataFrame. Nothing asset-count-squared ever shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def min_variance_weights(
    spark: SparkSession,
    cov_upper: DataFrame,
    sym_a: str = "sym_a",
    sym_b: str = "sym_b",
    cov: str = "cov",
    ridge: float = 1e-9,
) -> DataFrame:
    """Global minimum-variance portfolio from an upper-triangle covariance
    frame (e.g. ``bars_return_cov``): w = Σ⁻¹1 / (1'Σ⁻¹1). ``ridge`` adds
    λI before the solve (covariances estimated from finite samples can be
    near-singular). Returns (symbol, weight), weights summing to 1; shorts
    allowed (the analytic unconstrained solution — clip/renormalize
    downstream for long-only mandates)."""
    import numpy as np

    rows = cov_upper.select(sym_a, sym_b, cov).collect()
    syms = sorted({r[sym_a] for r in rows} | {r[sym_b] for r in rows})
    idx = {s: i for i, s in enumerate(syms)}
    n = len(syms)
    S = np.zeros((n, n))
    for r in rows:
        i, j = idx[r[sym_a]], idx[r[sym_b]]
        S[i, j] = S[j, i] = r[cov]
    S = S + ridge * np.eye(n)
    ones = np.ones(n)
    w = np.linalg.solve(S, ones)
    w = w / (ones @ w)
    return spark.createDataFrame(
        [(s, float(w[idx[s]])) for s in syms], ["symbol", "weight"]
    )
