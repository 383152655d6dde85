"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline at sf0.001 (smoke check).
``queries()`` / ``oracle_sql()`` — the declared correctness surface; the
driver runs each Spark query against its DuckDB twin at sf0.01
(row-count + schema + order-insensitive value-hash).

Implementation lives in ``polars_quant_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship slice (SURVEY §7 Phase 0): bars → SMA/EMA/RSI/MACD →
    MA-crossover signals → vectorized backtest fold → per-symbol risk
    metrics. Exercises scan → window → recurrence runner → fold → agg."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from polars_quant_spark.backtest.metrics import summary
    from polars_quant_spark.backtest.vectorized import vectorized_backtest
    from polars_quant_spark.functions import overlap as ov
    from polars_quant_spark.operators.recurrence import Rec, with_recurrences
    from polars_quant_spark.sources.bars import bars

    w = Window.partitionBy("symbol").orderBy("t")
    b = bars(spark, SF_SMOKE)
    b = b.withColumn("sma_20", ov.sma("close", 20, w))
    b = with_recurrences(
        b,
        [
            Rec("ema_12", "ema", ["close"], {"p": 12}),
            Rec("ema_26", "ema", ["close"], {"p": 26}),
            Rec("rsi_14", "rsi", ["close"], {"p": 14}),
            Rec(["macd_dif", "macd_dea", "macd_hist"], "macd", ["close"], {}),
        ],
    )
    cross_up = (F.col("ema_12") > F.col("ema_26")) & (
        F.lag("ema_12").over(w) <= F.lag("ema_26").over(w)
    )
    cross_dn = (F.col("ema_12") < F.col("ema_26")) & (
        F.lag("ema_12").over(w) >= F.lag("ema_26").over(w)
    )
    sig = b.withColumn(
        "buy", F.coalesce(cross_up & (F.col("rsi_14") < 70), F.lit(False))
    ).withColumn("sell", F.coalesce(cross_dn, F.lit(False)))
    curve = vectorized_backtest(sig)
    return summary(curve)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from polars_quant_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from polars_quant_spark.queries import ORACLES

    return dict(ORACLES)
