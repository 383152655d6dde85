"""Stock screener (`Selector`, reference README.md:643-858, SURVEY §2.2/§2.7):
named screens composing to a Column conjunction, plus sort/top-k.

Each screen is a predicate over an indicator-enriched bar frame; screens are
pure Column expressions so Catalyst can fold and push them."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_quant_spark.functions import momentum as mo
from polars_quant_spark.functions import overlap as ov


class Selector:
    """Fluent screen builder over a long bar frame (symbol, t, OHLCV…).

    >>> sel = (Selector(df).price_above_ma(20).volume_surge(1.5)
    ...        .rsi_below(70, rsi_col="rsi_14"))
    >>> picks = sel.top(10, by="mom_10")
    """

    def __init__(self, df: DataFrame, partition_by: str = "symbol", order_by: str = "t"):
        self.df = df
        self.partition_by = partition_by
        self.order_by = order_by
        self._w = Window.partitionBy(partition_by).orderBy(order_by)
        self._conds: list[Column] = []

    # --- named screens (README.md:683-778 families) ---

    def price_between(self, lo: float, hi: float, price: str = "close") -> "Selector":
        self._conds.append(F.col(price).between(lo, hi))
        return self

    def price_above_ma(self, p: int = 20, price: str = "close") -> "Selector":
        self._conds.append(F.col(price) > ov.sma(price, p, self._w))
        return self

    def price_below_ma(self, p: int = 20, price: str = "close") -> "Selector":
        self._conds.append(F.col(price) < ov.sma(price, p, self._w))
        return self

    def returns_above(self, r: float, p: int = 1, price: str = "close") -> "Selector":
        self._conds.append(mo.rocp(price, p, self._w) > r)
        return self

    def volume_surge(self, mult: float = 1.5, p: int = 20, vol: str = "volume") -> "Selector":
        self._conds.append(F.col(vol) > mult * ov.sma(vol, p, self._w))
        return self

    def volatility_below(self, v: float, p: int = 20, price: str = "close") -> "Selector":
        frame = self._w.rowsBetween(-(p - 1), 0)
        self._conds.append(F.stddev_pop(F.col(price)).over(frame) < v)
        return self

    def rsi_below(self, v: float = 30.0, rsi_col: str = "rsi_14") -> "Selector":
        self._conds.append(F.col(rsi_col) < v)
        return self

    def rsi_above(self, v: float = 70.0, rsi_col: str = "rsi_14") -> "Selector":
        self._conds.append(F.col(rsi_col) > v)
        return self

    def consecutive_up(self, n: int = 3, price: str = "close") -> "Selector":
        up = (F.col(price) > F.lag(price).over(self._w)).cast("int")
        frame = self._w.rowsBetween(-(n - 1), 0)
        self._conds.append(F.sum(up).over(frame) == n)
        return self

    def breakout_high(self, p: int = 20, price: str = "close", high: str = "high") -> "Selector":
        prev_frame = self._w.rowsBetween(-p, -1)
        self._conds.append(F.col(price) > F.max(F.col(high)).over(prev_frame))
        return self

    def where(self, cond: Column) -> "Selector":
        self._conds.append(cond)
        return self

    # --- terminal ops ---

    def condition(self) -> Column:
        if not self._conds:
            return F.lit(True)
        out = self._conds[0]
        for c in self._conds[1:]:
            out = out & c
        return out

    def filter(self) -> DataFrame:
        # screens may contain window expressions, which Spark disallows
        # directly in WHERE — materialize the condition as a column first
        return (
            self.df.withColumn("__sel", self.condition())
            .where(F.col("__sel"))
            .drop("__sel")
        )

    def top(self, n: int, by: str, ascending: bool = False) -> DataFrame:
        """Global top-n of the filtered rows (README.md:782-799 sort+top_n).
        TakeOrderedAndProject — no full sort at scale."""
        key = F.col(by).asc() if ascending else F.col(by).desc()
        return self.filter().orderBy(key, F.col(self.partition_by), F.col(self.order_by)).limit(n)
