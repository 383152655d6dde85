"""Property test for the quantized-EMA determinism claim (round 8).

The MACD trio's engine-exactness rests on one statement: the integer-
lattice recurrence of ``recurrence._ewma_q`` and the recursive-CTE twin of
``oracle.ema_q_ctes`` produce the SAME integer at every step, for any
input series and any length — because each step is one correctly-rounded
float expression on identical integers, re-floored to the lattice. This
test checks the claim directly against DuckDB (no Spark, no bars tables):
random micro-unit series, including adversarial near-half-boundary values,
through both implementations, compared exactly.
"""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from polars_quant_spark.operators.recurrence import _ewma_q


def _duckdb_ewma_q(m: np.ndarray, p: int) -> np.ndarray:
    alpha = 2.0 / (p + 1)
    a, b = repr(alpha), repr(1.0 - alpha)
    con = duckdb.connect()
    con.register(
        "src",
        __import__("pandas").DataFrame(
            {"rn": np.arange(1, m.shape[0] + 1), "x": m.astype(float)}
        ),
    )
    rows = con.sql(
        f"""
WITH RECURSIVE rec AS (
  SELECT rn, ema FROM (
    SELECT rn,
           FLOOR(SUM(x) OVER (ORDER BY rn
                   ROWS BETWEEN {p - 1} PRECEDING AND CURRENT ROW)
                 / {p} + 0.5) AS ema
    FROM src) s
  WHERE rn = {p}
  UNION ALL
  SELECT b.rn, FLOOR({b} * e.ema + {a} * b.x + 0.5)
  FROM rec e JOIN src b ON b.rn = e.rn + 1
)
SELECT rn, ema FROM rec ORDER BY rn
"""
    ).fetchall()
    out = np.full(m.shape[0], np.nan)
    for rn, v in rows:
        out[rn - 1] = v
    return out


@settings(max_examples=15, deadline=None)
@given(
    data=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=30,
        max_size=400,
    ),
    p=st.sampled_from([3, 9, 12, 26]),
)
def test_ewma_q_matches_duckdb_exactly(data, p):
    m = np.array(data, dtype=np.float64)
    ours = _ewma_q(m, 2.0 / (p + 1), p)
    theirs = _duckdb_ewma_q(m, p)
    np.testing.assert_array_equal(ours, theirs)


def test_ewma_q_long_series_boundary_stress():
    """20k steps (the sf0.1 length that broke the float form) with values
    engineered to sit near half-integer pre-floor results as often as a
    random walk allows — still exact."""
    rng = np.random.default_rng(42)
    m = np.floor(
        1e8 * np.exp(np.cumsum(rng.normal(0, 1e-4, 20_000))) + 0.5
    )
    ours = _ewma_q(m, 2.0 / 27.0, 26)
    theirs = _duckdb_ewma_q(m, 26)
    np.testing.assert_array_equal(ours, theirs)
