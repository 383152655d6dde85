"""Factor research kit (reference README.md:1392-1689, SURVEY §2.8):
IC / Rank-IC / IR, quantile portfolio sorts, Fama-MacBeth, rolling IC.

All groupBy + Window + agg compositions — one shuffle per stage, no UDFs
except the tiny per-date OLS solve (see operators.linear)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_quant_spark.operators.linear import ols


def forward_returns(
    df: DataFrame,
    price: str = "close",
    horizon: int = 1,
    partition_by: str = "symbol",
    order_by: str = "t",
    out: str = "fwd_ret",
) -> DataFrame:
    """lead(price, h)/price − 1 per symbol; NULL-safe on zero prices."""
    w = Window.partitionBy(partition_by).orderBy(order_by)
    p = F.col(price).cast("double")
    nxt = F.lead(p, horizon).over(w)
    return df.withColumn(out, F.when(p != 0, nxt / p - 1.0))


def ic(
    df: DataFrame,
    factor: str,
    fwd_ret: str = "fwd_ret",
    date_col: str = "t",
) -> DataFrame:
    """Per-date Pearson information coefficient: corr(factor, fwd_ret)."""
    return df.groupBy(date_col).agg(
        F.corr(F.col(factor), F.col(fwd_ret)).alias("ic"),
        F.count(F.lit(1)).alias("n"),
    )


def rank_ic(
    df: DataFrame,
    factor: str,
    fwd_ret: str = "fwd_ret",
    date_col: str = "t",
) -> DataFrame:
    """Per-date Spearman-style IC: Pearson corr of within-date percent ranks.
    Null factor/return rows are dropped before ranking (engines disagree on
    NULL ordering, and ranking nulls is meaningless anyway)."""
    df = df.where(F.col(factor).isNotNull() & F.col(fwd_ret).isNotNull())
    wd = Window.partitionBy(date_col)
    ranked = df.withColumn(
        "_fr", F.percent_rank().over(wd.orderBy(F.col(factor), F.col("symbol")))
    ).withColumn(
        "_rr", F.percent_rank().over(wd.orderBy(F.col(fwd_ret), F.col("symbol")))
    )
    return ranked.groupBy(date_col).agg(
        F.corr(F.col("_fr"), F.col("_rr")).alias("rank_ic"),
        F.count(F.lit(1)).alias("n"),
    )


def ir(ic_df: DataFrame, ic_col: str = "ic") -> DataFrame:
    """Information ratio over the IC time series: mean/std (ddof=1)."""
    mu = F.avg(ic_col)
    sd = F.stddev_samp(ic_col)
    return ic_df.agg(
        mu.alias("ic_mean"),
        sd.alias("ic_std"),
        F.when(sd > 0, mu / sd).otherwise(F.lit(0.0)).alias("ir"),
        F.count(F.lit(1)).alias("n_periods"),
    )


def rolling_ic(
    ic_df: DataFrame, p: int = 20, date_col: str = "t", ic_col: str = "ic"
) -> DataFrame:
    """Trailing-p mean of the per-date IC series."""
    w = Window.orderBy(date_col).rowsBetween(-(p - 1), 0)
    return ic_df.withColumn(
        "rolling_ic",
        F.when(F.count(ic_col).over(w) == p, F.avg(ic_col).over(w)),
    )


def quantile_sorts(
    df: DataFrame,
    factor: str,
    fwd_ret: str = "fwd_ret",
    q: int = 5,
    date_col: str = "t",
    tiebreak: str = "symbol",
) -> DataFrame:
    """ntile(q) portfolio sorts per date → mean forward return per bucket.
    Deterministic: ties broken by `tiebreak`."""
    wd = Window.partitionBy(date_col).orderBy(F.col(factor), F.col(tiebreak))
    bucketed = df.where(F.col(factor).isNotNull() & F.col(fwd_ret).isNotNull()).withColumn(
        "bucket", F.ntile(q).over(wd)
    )
    return bucketed.groupBy("bucket").agg(
        F.avg(fwd_ret).alias("mean_fwd_ret"),
        F.count(F.lit(1)).alias("n"),
    )


def fama_macbeth(
    df: DataFrame,
    y: str = "fwd_ret",
    xs: list[str] | None = None,
    date_col: str = "t",
) -> DataFrame:
    """Fama-MacBeth: per-date cross-sectional OLS, then t-stats of the
    coefficient time series. Stage 1 is the moment-matrix OLS (no row
    materialization); stage 2 is a tiny aggregation over dates."""
    xs = xs or ["factor"]
    per_date = ols(df, y, xs, group_by=[date_col])
    k = len(xs) + 1
    cols = [F.col("coefficients")[i].alias(f"b{i}") for i in range(k)]
    betas = per_date.select(date_col, *cols)
    aggs = []
    for i in range(k):
        mu = F.avg(f"b{i}")
        sd = F.stddev_samp(f"b{i}")
        n = F.count(f"b{i}").cast("double")
        aggs += [
            mu.alias(f"b{i}_mean"),
            F.when(sd > 0, mu / (sd / F.sqrt(n))).otherwise(F.lit(0.0)).alias(f"b{i}_tstat"),
        ]
    return betas.agg(*aggs)


def subsample_ic(
    ic_df: DataFrame,
    date_col: str = "t",
    n_splits: int = 2,
    ic_col: str = "ic",
) -> DataFrame:
    """Subsample robustness test (README.md:1392-1689 roadmap): split the IC
    time series into n contiguous date buckets and report mean/std/IR per
    bucket — a factor whose IR holds across subsamples is robust."""
    w = Window.orderBy(F.col(date_col))
    bucketed = ic_df.withColumn("subsample", F.ntile(n_splits).over(w))
    mu = F.avg(ic_col)
    sd = F.stddev_samp(ic_col)
    return bucketed.groupBy("subsample").agg(
        mu.alias("ic_mean"),
        sd.alias("ic_std"),
        F.when(sd > 0, mu / sd).otherwise(F.lit(0.0)).alias("ir"),
        F.count(F.lit(1)).alias("n_periods"),
    )


def subgroup_ic(
    df: DataFrame,
    factor: str,
    fwd_ret: str = "fwd_ret",
    group_col: str = "symbol",
    date_col: str = "t",
) -> DataFrame:
    """Per-subgroup IC (e.g. by sector): corr(factor, fwd_ret) within each
    group across all dates."""
    return df.groupBy(group_col).agg(
        F.corr(F.col(factor), F.col(fwd_ret)).alias("ic"),
        F.count(F.lit(1)).alias("n"),
    )


def event_study(
    df,
    event_col,
    horizon: int = 5,
    symbol: str = "symbol",
    t: str = "t",
    price: str = "close",
):
    """Event-study CAR inputs: the average simple return at each offset in
    [−horizon, +horizon] around event bars (rows where ``event_col`` is
    true), per symbol — the abnormal-returns staple of factor research.

    Distributed shape: per-bar returns are one window pass; event bars
    explode into 2·horizon+1 (symbol, t₀+offset) probes that equi-join the
    return frame — a bounded fan-out, no self-join of the full bar stream,
    no cartesian. Returns (symbol, offset, n_events, avg_ret) with the
    average micro-unit-exact (integer sums / count)."""
    from pyspark.sql import Window

    w = Window.partitionBy(symbol).orderBy(t)
    r = (
        df.select(symbol, t, F.col(price).cast("double").alias("_px"),
                  F.col(event_col).alias("_ev"))
        .withColumn("_prev", F.lag("_px").over(w))
        .withColumn(
            "_ret_m",
            F.floor(
                (F.col("_px") / F.col("_prev") - 1.0) * F.lit(1000000.0) + F.lit(0.5)
            ).cast("long"),
        )
    )
    probes = (
        r.where(F.col("_ev"))
        .select(
            F.col(symbol).alias("_s"),
            F.col(t).alias("_t0"),
            F.explode(
                F.sequence(F.lit(-horizon), F.lit(horizon))
            ).alias("offset"),
        )
        .select("_s", "offset", (F.col("_t0") + F.col("offset")).alias("_tt"))
    )
    joined = probes.join(
        r.where(F.col("_ret_m").isNotNull()).select(
            F.col(symbol).alias("_s"), F.col(t).alias("_tt"), "_ret_m"
        ),
        ["_s", "_tt"],
    )
    return (
        joined.groupBy(F.col("_s").alias(symbol), "offset")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum("_ret_m").cast("double") / 1e6 / F.count(F.lit(1))
            ).alias("avg_ret"),
        )
    )
