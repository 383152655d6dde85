from polars_quant_spark.functions import (
    momentum,
    overlap,
    pattern,
    price,
    returns,
    trend,
    volatility,
    volume,
)

__all__ = ["momentum", "overlap", "pattern", "price", "returns", "trend", "volatility", "volume"]
