"""Backtest summary metrics — the formulas of
/root/reference/src/backtest/metrics.rs:7-152 (SURVEY §2.6) as Spark
aggregations, computed for every symbol in one pass.

Formulas (metrics.rs line refs):
* total_return = equity_end/initial − 1
* annualized_return = (1+total)^(252/n) − 1            (:3,54-58, 252 days)
* max_drawdown = max((peak − eq)/peak) over running peak (:21-39)
* volatility σ of daily returns, ddof=1                (:61-69)
* sharpe = (annualized − rf) / (σ·√252), rf = 3%       (:4,71-75)
* win_rate = wins/trades                               (:77-81)
* beta = cov(daily, bench_daily)/var(bench_daily)      (:86-120, sample)
* alpha = annualized − (rf + β·(bench_annualized − rf)) (:122-139, CAPM)
* max_profit = max(total_return, 0); total_trades      (:142-150)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_quant_spark.functions._util import round6

TRADING_DAYS = 252.0
RISK_FREE = 0.03


def summary(
    bt: DataFrame,
    initial_capital: float = 100_000.0,
    equity: str = "equity",
    benchmark: str | None = None,
    partition_by: str = "symbol",
    order_by: str = "t",
) -> DataFrame:
    """Per-symbol metrics row from a vectorized_backtest output frame.

    One window pass (daily returns + running peak) and one groupBy — two
    shuffles total on the symbol key, regardless of symbol count.
    """
    from polars_quant_spark.functions._util import cached_build

    def build():
        w = Window.partitionBy(partition_by).orderBy(order_by)
        cum = w.rowsBetween(Window.unboundedPreceding, 0)

        eq = F.col(equity)
        daily_ret = eq / F.lag(eq).over(w) - 1.0
        peak = F.max(eq).over(cum)
        dd = F.when(peak > 0, (peak - eq) / peak).otherwise(F.lit(0.0))
        bret = (
            F.col(benchmark) / F.lag(F.col(benchmark)).over(w) - 1.0
            if benchmark is not None
            else None
        )

        last_eq = F.max_by(eq, F.col(order_by))
        n = F.count(F.lit(1)).cast("double")
        total_return = last_eq / F.lit(initial_capital) - 1.0
        annualized = F.pow(1.0 + total_return, F.lit(TRADING_DAYS) / n) - 1.0
        vol = F.stddev_samp("_ret")

        aggs = [
            n.alias("n_bars"),
            round6(total_return).alias("total_return"),
            round6(annualized).alias("annualized_return"),
            round6(F.max("_dd")).alias("max_drawdown"),
            round6(vol).alias("volatility"),
            round6(
                F.when(vol > 0, (annualized - RISK_FREE) / (vol * F.sqrt(F.lit(TRADING_DAYS)))).otherwise(
                    F.lit(0.0)
                )).alias("sharpe"),
            round6(F.greatest(total_return, F.lit(0.0))).alias("max_profit"),
            F.first("n_trades").alias("total_trades"),
            round6(
                F.when(
                    F.first("n_trades") > 0,
                    F.first("n_wins").cast("double") / F.first("n_trades"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("win_rate"),
        ]
        if benchmark is not None:
            beta = F.covar_samp("_ret", "_bret") / F.var_samp("_bret")
            bench_total = F.last(F.col(benchmark), ignorenulls=True) / F.first(
                F.col(benchmark), ignorenulls=True
            ) - 1.0
            bench_ann = F.pow(1.0 + bench_total, F.lit(TRADING_DAYS) / n) - 1.0
            aggs += [
                round6(beta).alias("beta"),
                round6(annualized - (RISK_FREE + beta * (bench_ann - RISK_FREE))).alias("alpha"),
            ]
        return daily_ret, dd, bret, aggs

    # metric Column trees are pure functions of the scalar args (~800 py4j
    # round-trips per call otherwise) — memoized per gateway
    daily_ret, dd, bret, aggs = cached_build(
        ("bt_summary", initial_capital, equity, benchmark, partition_by, order_by),
        build,
    )

    enriched = bt.withColumn("_ret", daily_ret).withColumn("_dd", dd)
    if bret is not None:
        enriched = enriched.withColumn("_bret", bret)

    return enriched.groupBy(partition_by).agg(*aggs)
