from polars_quant_spark.sources.bars import bars, BARS_CTE, load_table
from polars_quant_spark.sources.loader import prepare_sequential_data, load

__all__ = ["bars", "BARS_CTE", "load_table", "prepare_sequential_data", "load"]
