"""Regenerate golden-oracle parquet files.

The HT/MESA family (operators/hilbert) is a sequential state machine with no
tractable SQL twin, so its driver oracle is a *golden file*: the expected
output recomputed OUTSIDE Spark — DuckDB evaluates the bars twin (BARS_CTE)
and the numpy kernels run directly per symbol on the driver — then written
as parquet that the oracle SQL reads back verbatim. This pins the full Spark
pipeline (shuffle, per-group ordering, NaN→NULL normalization, rounding) to
a driver-side recomputation; the kernels themselves are validated separately
against an INDEPENDENT ring-buffer transcription of the reference contract
(tests/mesa_reference.py, asserted bit-exact in
tests/test_mesa_reference_parity.py) plus the property tests in
tests/test_hilbert_streaming.py (cycle lock, amplitude bounds, warm-up
contract) — so the golden file is no longer the only algorithm evidence.

Usage: python tools/make_golden.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from polars_quant_spark.operators import hilbert  # noqa: E402,F401 (registers kernels)
from polars_quant_spark.operators.recurrence import KERNELS  # noqa: E402
from polars_quant_spark.sources.bars import BARS_CTE  # noqa: E402

#: (kernel, out_cols) in the exact order of the ind_ht_family query.
SPECS = [
    ("ht_dcperiod", ["ht_dcperiod"]),
    ("ht_dcphase", ["ht_dcphase"]),
    ("ht_phasor", ["ht_inphase", "ht_quadrature"]),
    ("ht_sine", ["ht_sine", "ht_leadsine"]),
    ("ht_trendline", ["ht_trendline"]),
    ("ht_trendmode", ["ht_trendmode"]),
    ("mama", ["mama", "fama"]),
]


def r6(a: np.ndarray) -> np.ndarray:
    return np.floor(a * 1e6 + 0.5) / 1e6


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    tag = sf.rstrip("/").split("/")[-1]
    con = duckdb.connect()
    for t in ["events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    bars = con.sql(BARS_CTE + "SELECT symbol, t, close FROM bars ORDER BY symbol, t").df()
    outs = []
    for sym, g in bars.groupby("symbol", sort=True):
        g = g.sort_values("t").reset_index(drop=True)
        x = g["close"].to_numpy(dtype="float64")
        cols = {"symbol": g["symbol"], "t": g["t"]}
        for kname, out_cols in SPECS:
            fn, _ = KERNELS[kname]
            res = fn(x)
            res = res if isinstance(res, tuple) else (res,)
            for name, arr in zip(out_cols, res):
                if name == "ht_trendmode":
                    s = pd.Series(arr)
                    cols[name] = s.astype("Int32").where(~s.isna(), pd.NA)
                else:
                    cols[name] = r6(arr)
        outs.append(pd.DataFrame(cols))
    golden = pd.concat(outs, ignore_index=True)
    path = f"golden/ind_ht_family_{tag}.parquet"
    golden.to_parquet(path, index=False)
    print(f"wrote {path}: {len(golden)} rows, {len(golden.columns)} cols")


if __name__ == "__main__":
    main()
