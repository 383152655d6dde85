from polars_quant_spark.operators import recurrence

__all__ = ["recurrence"]
