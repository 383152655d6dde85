"""Multi-feature OLS (`linear`, reference README.md:168-240, SURVEY §2.8).

Scale design: never materialize group rows. One aggregation pass computes the
moment matrices (X'X, X'y as k² + k sums of products — map-side combined,
tiny shuffle), then each group's k×k system is solved in a vectorized pandas
pass over the *aggregated* rows (one row per group). Works identically for
one global fit, per-date Fama-MacBeth fits, or millions of groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType


def _moment_aggs(y: str, xs: list[str], fit_intercept: bool) -> list:
    """Sums of cross-products for the normal equations (plus intercept col)."""
    feats = ([F.lit(1.0)] if fit_intercept else []) + [F.col(c).cast("double") for c in xs]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, fi in enumerate(feats):
        for j, fj in enumerate(feats):
            if j < i:
                continue
            aggs.append(F.sum(fi * fj).alias(f"_xx_{i}_{j}"))
        aggs.append(F.sum(fi * F.col(y).cast("double")).alias(f"_xy_{i}"))
    aggs.append(F.sum(F.col(y).cast("double")).alias("_sy"))
    aggs.append(F.sum(F.col(y).cast("double") * F.col(y).cast("double")).alias("_syy"))
    return aggs


def ols(
    df: DataFrame,
    y: str,
    xs: list[str],
    group_by: list[str] | None = None,
    fit_intercept: bool = True,
) -> DataFrame:
    """Fit y ~ xs (+ intercept) per group.

    Returns one row per group: coefficients array (intercept first when
    fitted), r2, n. Solves via pinv for robustness on collinear groups.
    """
    k = len(xs) + (1 if fit_intercept else 0)
    keys = group_by or []
    grouped = df.groupBy(*keys) if keys else df.groupBy()
    moments = grouped.agg(*_moment_aggs(y, xs, fit_intercept))

    key_fields = [moments.schema[c] for c in keys]
    schema = StructType(
        key_fields
        + [
            StructField("coefficients", ArrayType(DoubleType())),
            StructField("r2", DoubleType()),
            StructField("n", LongType()),
        ]
    )

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            n = row["_n"]
            xtx = np.zeros((k, k))
            xty = np.zeros(k)
            for i in range(k):
                for j in range(k):
                    lo, hi = min(i, j), max(i, j)
                    xtx[i, j] = row[f"_xx_{lo}_{hi}"]
                xty[i] = row[f"_xy_{i}"]
            beta = np.linalg.pinv(xtx) @ xty
            sy, syy = row["_sy"], row["_syy"]
            ss_tot = syy - sy * sy / n if n > 0 else 0.0
            # SSR via moments: y'y − 2β'X'y + β'X'Xβ
            ss_res = syy - 2.0 * beta @ xty + beta @ xtx @ beta
            r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
            out.append([row[c] for c in keys] + [beta.tolist(), float(r2), int(n)])
        return pd.DataFrame(out, columns=keys + ["coefficients", "r2", "n"])

    if keys:
        return moments.groupBy(*keys).applyInPandas(
            lambda pdf: solve(pdf), schema=schema
        )
    # single global fit: moments is one row — mapInPandas keeps it distributed-safe
    return moments.mapInPandas(lambda it: (solve(pdf) for pdf in it), schema=schema)


def residualize(
    df: DataFrame,
    y: str,
    xs: list[str],
    group_by: list[str] | None = None,
    out: str = "resid",
) -> DataFrame:
    """y minus its OLS fit (per group) — the neutralization primitive for
    `clean` (README.md:246-342). Joins the per-group β back (broadcast: one
    row per group) and computes the residual as a Column expression."""
    beta = ols(df, y, xs, group_by)
    keys = group_by or []
    joined = df.join(F.broadcast(beta), on=keys) if keys else df.crossJoin(F.broadcast(beta))
    pred = F.col("coefficients")[0]
    for i, x in enumerate(xs):
        pred = pred + F.col("coefficients")[i + 1] * F.col(x).cast("double")
    return joined.withColumn(out, F.col(y).cast("double") - pred).drop(
        "coefficients", "r2", "n"
    )
