"""Parallel strategy-parameter sweep.

The reference's Strategy surface (README.md:862-996) generates signals for
ONE parameterization at a time; scanning a grid is a driver-side loop per
asset. Spark's win is running the WHOLE grid × universe in one job: each
(symbol, fast, slow) combination is an independent fold, so the sweep is a
union of per-combo signal plans feeding the same vectorized fold — one
shuffle on (symbol) per combo, all combos concurrent across executors.
At cluster scale this is the hyperparameter-scan shape: data volume ×
grid size parallelism with zero sequential coupling between combos.

Returns one row per (symbol, fast, slow) with the strategy's final
equity — argmax per symbol gives the in-sample winner (walk-forward
evaluation = run the sweep on a date-filtered frame, apply the winner on
the complement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_quant_spark.backtest.vectorized import BacktestParams, vectorized_backtest


def _cross_signals(df: DataFrame, fast: int, slow: int) -> DataFrame:
    """MA-crossover flags in INTEGER micro-units: _f/_s are windowed SUMs of
    quantized closes (NULL through warm-up, like SMA), and the mean
    comparison _f/fast vs _s/slow is cross-multiplied to _f·slow vs
    _s·fast — exact in any accumulation order, so the discrete buy/sell
    flags can't flip on a last-ulp AVG difference between Spark's bounded
    -frame recompute and the oracle's segment tree (the mkt_breadth r3
    class; same rewrite as the r4 signal-family fix)."""
    w = Window.partitionBy("symbol").orderBy("t")
    qclose = F.floor(F.col("close") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    wf = w.rowsBetween(-(fast - 1), 0)
    ws = w.rowsBetween(-(slow - 1), 0)
    b = df.withColumn(
        "_f", F.when(F.count("close").over(wf) == fast, F.sum(qclose).over(wf))
    ).withColumn(
        "_s", F.when(F.count("close").over(ws) == slow, F.sum(qclose).over(ws))
    )
    f_x, s_x = F.col("_f") * slow, F.col("_s") * fast
    fl_x, sl_x = F.lag("_f").over(w) * slow, F.lag("_s").over(w) * fast
    up = (f_x > s_x) & (fl_x <= sl_x)
    dn = (f_x < s_x) & (fl_x >= sl_x)
    return b.withColumn("buy", F.coalesce(up, F.lit(False))).withColumn(
        "sell", F.coalesce(dn, F.lit(False))
    )


def parameter_sweep(
    df: DataFrame,
    grid: list[tuple[int, int]],
    params: BacktestParams | None = None,
) -> DataFrame:
    """Run the MA-cross strategy for every (fast, slow) pair in `grid` over
    every symbol, in one unioned plan. Output: (symbol, fast, slow,
    final_equity) — one row per combo per symbol."""
    p = params or BacktestParams()
    outs = []
    for fast, slow in grid:
        sig = _cross_signals(df.select("symbol", "t", "close"), fast, slow)
        curve = vectorized_backtest(sig, params=p)
        outs.append(
            curve.groupBy("symbol").agg(
                F.lit(fast).alias("fast"),
                F.lit(slow).alias("slow"),
                F.max_by("equity", "t").alias("final_equity"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def best_params(sweep: DataFrame) -> DataFrame:
    """Per-symbol argmax of final equity (ties broken by smallest
    (fast, slow) for determinism)."""
    pick = F.min(
        F.struct(
            (-F.col("final_equity")).alias("neg"),
            F.col("fast"),
            F.col("slow"),
        )
    ).alias("m")
    return (
        sweep.groupBy("symbol")
        .agg(pick)
        .select(
            "symbol",
            F.col("m.fast").alias("fast"),
            F.col("m.slow").alias("slow"),
            (-F.col("m.neg")).alias("final_equity"),
        )
    )
