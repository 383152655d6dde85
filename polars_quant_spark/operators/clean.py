"""Data-cleaning operators (`clean`, reference README.md:246-342, SURVEY
§2.8): winsorization (percentile / sigma / MAD), z-scoring, group
neutralization. All window/groupBy compositions over exact percentiles."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_quant_spark.operators.linear import residualize


def winsorize(
    df: DataFrame,
    col: str,
    method: str = "percentile",
    lower: float = 0.05,
    upper: float = 0.95,
    n_sigma: float = 3.0,
    group_by: list[str] | None = None,
    out: str | None = None,
) -> DataFrame:
    """Clamp outliers per group.

    * percentile: clamp to [P(lower), P(upper)] (exact interpolated percentile)
    * sigma: clamp to mean ± n_sigma·std (sample std)
    * mad: clamp to median ± n_sigma·1.4826·MAD
    """
    out = out or col
    x = F.col(col).cast("double")
    keys = group_by or []
    w = Window.partitionBy(*keys) if keys else Window.partitionBy()
    if method == "percentile":
        lo = F.percentile(x, F.lit(lower)).over(w)
        hi = F.percentile(x, F.lit(upper)).over(w)
    elif method == "sigma":
        mu, sd = F.avg(x).over(w), F.stddev_samp(x).over(w)
        lo, hi = mu - n_sigma * sd, mu + n_sigma * sd
    elif method == "mad":
        med = F.percentile(x, F.lit(0.5)).over(w)
        # MAD needs a second pass over |x − median| — window-over-window, so
        # compute median first, then the MAD window on the derived column.
        df = df.withColumn("_med", med).withColumn("_ad", F.abs(x - F.col("_med")))
        mad = F.percentile(F.col("_ad"), F.lit(0.5)).over(w)
        scale = n_sigma * 1.4826
        return (
            df.withColumn(out, F.greatest(F.least(x, F.col("_med") + scale * mad), F.col("_med") - scale * mad))
            .drop("_med", "_ad")
        )
    else:
        raise ValueError(f"unknown winsorize method {method!r}")
    return df.withColumn(out, F.greatest(F.least(x, hi), lo))


def zscore(
    df: DataFrame,
    col: str,
    group_by: list[str] | None = None,
    out: str | None = None,
) -> DataFrame:
    """(x − mean)/std within group (sample std); NULL when std = 0."""
    out = out or f"{col}_z"
    x = F.col(col).cast("double")
    keys = group_by or []
    w = Window.partitionBy(*keys) if keys else Window.partitionBy()
    mu, sd = F.avg(x).over(w), F.stddev_samp(x).over(w)
    return df.withColumn(out, F.when(sd > 0, (x - mu) / sd))


def neutralize(
    df: DataFrame,
    col: str,
    industry_col: str | None = None,
    size_col: str | None = None,
    group_by: list[str] | None = None,
    out: str | None = None,
) -> DataFrame:
    """Industry/size neutralization (README.md:300-342): subtract industry
    group means, then residualize on log(size) via OLS per group."""
    out = out or f"{col}_neutral"
    work = df
    x = F.col(col).cast("double")
    if industry_col is not None:
        keys = (group_by or []) + [industry_col]
        w = Window.partitionBy(*keys)
        work = work.withColumn("_demeaned", x - F.avg(x).over(w))
    else:
        work = work.withColumn("_demeaned", x)
    if size_col is not None:
        work = work.withColumn(
            "_logsize", F.log(F.when(F.col(size_col) > 0, F.col(size_col).cast("double")))
        )
        work = residualize(work, "_demeaned", ["_logsize"], group_by, out=out)
        return work.drop("_demeaned", "_logsize")
    return work.withColumnRenamed("_demeaned", out)
