from polars_quant_spark.backtest.vectorized import auto_backtest, vectorized_backtest
from polars_quant_spark.backtest.metrics import summary
from polars_quant_spark.backtest.margin import (
    Backtest,
    MarginParams,
    margin_backtest,
)
from polars_quant_spark.backtest.sequential import (
    Order,
    OrderContext,
    ExecutionEngine,
    Portfolio,
    SequentialBacktester,
)

__all__ = [
    "auto_backtest",
    "vectorized_backtest",
    "summary",
    "Backtest",
    "MarginParams",
    "margin_backtest",
    "Order",
    "OrderContext",
    "ExecutionEngine",
    "Portfolio",
    "SequentialBacktester",
]
