"""Stock screener (`Selector`, reference README.md:643-858, SURVEY §2.2/§2.7):
named screens composing to a Column conjunction, plus sort/top-k.

Each screen is a predicate over an indicator-enriched bar frame; screens are
pure Column expressions so Catalyst can fold and push them.

The moving-average-relative screens (price vs MA, volume surge/shrink)
compare cross-multiplied INTEGER micro-unit sums instead of raw doubles
against a windowed AVG: ``x > m·avg_p(x)`` becomes
``den·p·q(x) > num·Σ_p(q(x))`` with ``m = num/den`` and
``q(x) = FLOOR(x·1e6 + 0.5)``. Windowed float AVGs are
associativity-sensitive (bounded-frame recompute vs segment-tree can differ
in the last ulp), so a bar sitting exactly on its MA could flip in or out of
the screen between engines/runs; integer sums make the screen deterministic
everywhere at a 1e-6 quantization the screen semantics don't care about."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_quant_spark.functions import momentum as mo
from polars_quant_spark.functions import overlap as ov


def _q6(x: Column) -> Column:
    """Micro-unit quantization: FLOOR(x·1e6 + 0.5) as long."""
    return F.floor(x * F.lit(1000000.0) + F.lit(0.5)).cast("long")


def _ratio(mult: float) -> tuple[int, int]:
    """Rational approximation of a screen multiplier for the integer
    cross-multiplied MA comparison. The denominator is capped at 1000
    (ample for screen multipliers like 1.5 or 0.95, exact to 1e-3) so the
    int64 products stay far from overflow: den·p·q(x) ≤ 1e3·200·1e12 ≈
    2e17 < 2^63 even for micro-quantized volumes — an uncapped 1e6
    denominator could silently wrap under Spark's non-ANSI long multiply
    (r4 ADVICE)."""
    fr = Fraction(mult).limit_denominator(1000)
    return fr.numerator, fr.denominator


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

    def _ma_cmp(self, col: str, p: int, mult: float, above: bool) -> Column:
        """x >/< mult·avg_p(x), as exact integers: den·p·q(x) >/< num·Σq(x),
        NULL-gated until the frame holds p values (matches overlap.sma).

        The cross-multiply runs in decimal(38,0): with micro-quantized
        VOLUMES q can reach 1e15, and q·den·p crosses 2^63 around
        p·den ≥ 1e4 — Spark's non-ANSI long multiply would wrap silently
        and corrupt the predicate (r5 advisory). Decimal keeps the
        comparison exact at any screen magnitude; it is predicate-only,
        so no hashed output column changes type."""
        w = self._w.rowsBetween(-(p - 1), 0)
        num, den = _ratio(mult)
        dec = "decimal(38,0)"
        qx = _q6(F.col(col))
        lhs = qx.cast(dec) * F.lit(den * p).cast(dec)
        rhs = F.sum(qx.cast(dec)).over(w) * F.lit(num).cast(dec)
        return F.when(
            F.count(F.col(col)).over(w) == p, (lhs > rhs) if above else (lhs < rhs)
        )

    def price_above_ma(self, p: int = 20, price: str = "close") -> "Selector":
        self._conds.append(self._ma_cmp(price, p, 1.0, above=True))
        return self

    def price_below_ma(self, p: int = 20, price: str = "close") -> "Selector":
        self._conds.append(self._ma_cmp(price, p, 1.0, above=False))
        return self

    def returns_above(self, r: float, p: int = 1, price: str = "close") -> "Selector":
        self._conds.append(mo.rocp(price, p, self._w) > r)
        return self

    def volume_surge(self, mult: float = 1.5, p: int = 20, vol: str = "volume") -> "Selector":
        self._conds.append(self._ma_cmp(vol, p, mult, above=True))
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

    # --- remaining README.md:683-778 families ---

    def price_min(self, v: float, price: str = "close") -> "Selector":
        self._conds.append(F.col(price) >= v)
        return self

    def price_max(self, v: float, price: str = "close") -> "Selector":
        self._conds.append(F.col(price) <= v)
        return self

    def volume_min(self, v: float, days: int = 1, vol: str = "volume") -> "Selector":
        """Min volume, or min N-day average volume when days > 1."""
        if days > 1:
            frame = self._w.rowsBetween(-(days - 1), 0)
            self._conds.append(F.avg(F.col(vol)).over(frame) >= v)
        else:
            self._conds.append(F.col(vol) >= v)
        return self

    def returns_below(self, r: float, p: int = 1, price: str = "close") -> "Selector":
        self._conds.append(mo.rocp(price, p, self._w) < r)
        return self

    def volatility_above(self, v: float, p: int = 20, price: str = "close") -> "Selector":
        frame = self._w.rowsBetween(-(p - 1), 0)
        self._conds.append(F.stddev_pop(F.col(price)).over(frame) > v)
        return self

    def volume_shrink(self, mult: float = 0.5, p: int = 5, vol: str = "volume") -> "Selector":
        self._conds.append(self._ma_cmp(vol, p, mult, above=False))
        return self

    def consecutive_down(self, n: int = 3, price: str = "close") -> "Selector":
        dn = (F.col(price) < F.lag(price).over(self._w)).cast("int")
        frame = self._w.rowsBetween(-(n - 1), 0)
        self._conds.append(F.sum(dn).over(frame) == n)
        return self

    def breakdown_low(self, p: int = 20, price: str = "close", low: str = "low") -> "Selector":
        prev_frame = self._w.rowsBetween(-p, -1)
        self._conds.append(F.col(price) < F.min(F.col(low)).over(prev_frame))
        return self

    def _macd_cols(self, fast: int, slow: int, signal: int, price: str):
        """Column-form MACD for screening: DIF = SMA(fast) − SMA(slow),
        DEA = `signal`-row mean of DIF. True EMA-MACD is a recurrence
        (operators/recurrence provides it as a DataFrame transform); a
        screen must stay a pure Column expression, so these are the
        declared screening semantics — the reference ships no Selector
        code, README.md:713-718 names only the conditions."""
        dif = ov.sma(price, fast, self._w) - ov.sma(price, slow, self._w)
        terms = [F.lag(dif, i).over(self._w) for i in range(signal)]
        dea = sum(terms[1:], terms[0]) / float(signal)
        return dif, dea

    def macd(
        self,
        cond: str = "golden_cross",
        fast: int = 12,
        slow: int = 26,
        signal: int = 9,
        price: str = "close",
    ) -> "Selector":
        """MACD screen: golden_cross / death_cross / above_zero / below_zero
        (README.md:713-718)."""
        dif, dea = self._macd_cols(fast, slow, signal, price)
        prev_dif = F.lag(dif).over(self._w)
        prev_dea = F.lag(dea).over(self._w)
        conds = {
            "golden_cross": (dif > dea) & (prev_dif <= prev_dea),
            "death_cross": (dif < dea) & (prev_dif >= prev_dea),
            "above_zero": dif > 0,
            "below_zero": dif < 0,
        }
        self._conds.append(conds[cond])
        return self

    def _kdj_cols(self, p: int, price: str, high: str, low: str):
        """Column-form KDJ: RSV = stochastic %K(p); K/D are 3-row SMA
        smoothings (the recurrence-free declared semantics); J = 3K − 2D."""
        frame = self._w.rowsBetween(-(p - 1), 0)
        hh = F.max(F.col(high)).over(frame)
        ll = F.min(F.col(low)).over(frame)
        rsv = F.when(hh == ll, F.lit(50.0)).otherwise(
            100.0 * (F.col(price) - ll) / (hh - ll)
        )
        k_terms = [F.lag(rsv, i).over(self._w) for i in range(3)]
        k = sum(k_terms[1:], k_terms[0]) / 3.0
        d_terms = [F.lag(k, i).over(self._w) for i in range(3)]
        d = sum(d_terms[1:], d_terms[0]) / 3.0
        return k, d, 3.0 * k - 2.0 * d

    def kdj(
        self,
        cond: str = "golden_cross",
        p: int = 9,
        price: str = "close",
        high: str = "high",
        low: str = "low",
    ) -> "Selector":
        """KDJ screen: golden_cross / death_cross / oversold / overbought
        (README.md:720-722)."""
        k, d, _j = self._kdj_cols(p, price, high, low)
        prev_k = F.lag(k).over(self._w)
        prev_d = F.lag(d).over(self._w)
        conds = {
            "golden_cross": (k > d) & (prev_k <= prev_d),
            "death_cross": (k < d) & (prev_k >= prev_d),
            "oversold": k < 20.0,
            "overbought": k > 80.0,
        }
        self._conds.append(conds[cond])
        return self

    def limit(
        self, cond: str = "limit_up", threshold: float = 9.9, price: str = "close"
    ) -> "Selector":
        """Daily-limit screen: limit_up / limit_down / near_limit_up /
        near_limit_down against `threshold` percent (README.md:724-726)."""
        ret_pct = 100.0 * (F.col(price) / F.lag(price).over(self._w) - 1.0)
        near = threshold * 0.8
        conds = {
            "limit_up": ret_pct >= threshold,
            "limit_down": ret_pct <= -threshold,
            "near_limit_up": (ret_pct >= near) & (ret_pct < threshold),
            "near_limit_down": (ret_pct <= -near) & (ret_pct > -threshold),
        }
        self._conds.append(conds[cond])
        return self

    def screen(self, **kw) -> "Selector":
        """Keyword front-end matching the reference's ``filter(...)``
        parameter names (README.md:683-778) — every one of the 30+ params
        maps onto a named screen above. Chainable."""
        if "price_min" in kw:
            self.price_min(kw["price_min"])
        if "price_max" in kw:
            self.price_max(kw["price_max"])
        if "volume_min" in kw:
            self.volume_min(kw["volume_min"], kw.get("volume_avg_days", 1))
        if "return_min" in kw:
            self.returns_above(kw["return_min"] / 100.0, kw.get("return_period", 1))
        if "return_max" in kw:
            self.returns_below(kw["return_max"] / 100.0, kw.get("return_period", 1))
        vp = kw.get("volatility_period", 20)
        if "volatility_min" in kw:
            self.volatility_above(kw["volatility_min"], vp)
        if "volatility_max" in kw:
            self.volatility_below(kw["volatility_max"], vp)
        if "ma_above" in kw:
            self.price_above_ma(kw["ma_above"])
        if "ma_below" in kw:
            self.price_below_ma(kw["ma_below"])
        rp = kw.get("rsi_period", 14)
        if "rsi_min" in kw:
            self.rsi_above(kw["rsi_min"], rsi_col=kw.get("rsi_col", f"rsi_{rp}"))
        if "rsi_max" in kw:
            self.rsi_below(kw["rsi_max"], rsi_col=kw.get("rsi_col", f"rsi_{rp}"))
        if "macd" in kw:
            self.macd(
                kw["macd"],
                kw.get("macd_fast", 12),
                kw.get("macd_slow", 26),
                kw.get("macd_signal", 9),
            )
        if "kdj" in kw:
            self.kdj(kw["kdj"], kw.get("kdj_period", 9))
        if "limit_type" in kw:
            self.limit(kw["limit_type"], kw.get("limit_threshold", 9.9))
        if kw.get("volume_change") == "volume_surge":
            self.volume_surge(kw.get("volume_multiplier", 2.0), kw.get("volume_change_days", 5))
        elif kw.get("volume_change") == "volume_shrink":
            self.volume_shrink(1.0 / kw.get("volume_multiplier", 2.0), kw.get("volume_change_days", 5))
        if kw.get("consecutive") == "consecutive_up":
            self.consecutive_up(kw.get("consecutive_days", 3))
        elif kw.get("consecutive") == "consecutive_down":
            self.consecutive_down(kw.get("consecutive_days", 3))
        if kw.get("breakout") == "breakout_high":
            self.breakout_high(kw.get("breakout_period", 20))
        elif kw.get("breakout") == "breakdown_low":
            self.breakdown_low(kw.get("breakout_period", 20))
        return self

    def reset(self) -> "Selector":
        """Drop all accumulated screens (README.md:820-828)."""
        self._conds = []
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

    def _latest(self) -> DataFrame:
        """The filtered frame restricted to each symbol's latest bar — the
        reference Selector screens 'current' state (README.md:803-816)."""
        filtered = self.df.withColumn("__sel", self.condition())
        wdesc = Window.partitionBy(self.partition_by).orderBy(
            F.col(self.order_by).desc()
        )
        return (
            filtered.withColumn("__rn", F.row_number().over(wdesc))
            .where((F.col("__rn") == 1) & F.col("__sel"))
            .drop("__rn", "__sel")
        )

    def result(self) -> list:
        """Symbols whose latest bar passes every screen (README.md:803-816;
        returns a list like the reference)."""
        rows = self._latest().select(self.partition_by).collect()
        return sorted(r[0] for r in rows)

    def info(self) -> DataFrame:
        """15-column latest-bar summary of the passing symbols
        (README.md:832-858): price/OHLV, 1/5/20-day returns (%), annualized
        20-day volatility (%), MA 5/10/20, volume ratio, amplitude (%)."""
        w = self._w
        close = F.col("close")
        ret = lambda p: 100.0 * (close / F.lag(close, p).over(w) - 1.0)  # noqa: E731
        logret = F.log(close / F.lag(close).over(w))
        vol_frame = w.rowsBetween(-19, 0)
        enriched = self.df.select(
            "*",
            ret(1).alias("return_1d"),
            ret(5).alias("return_5d"),
            ret(20).alias("return_20d"),
            (100.0 * F.stddev_samp(logret).over(vol_frame) * F.sqrt(F.lit(252.0))).alias(
                "volatility"
            ),
            ov.sma("close", 5, w).alias("ma_5"),
            ov.sma("close", 10, w).alias("ma_10"),
            ov.sma("close", 20, w).alias("ma_20"),
            (F.col("volume") / F.avg("volume").over(w.rowsBetween(-4, 0))).alias(
                "volume_ratio"
            ),
            (100.0 * (F.col("high") - F.col("low")) / close).alias("amplitude"),
        )
        sel = Selector(enriched, self.partition_by, self.order_by)
        sel._conds = list(self._conds)
        have = set(self.df.columns)

        def opt(c: str):
            return F.col(c) if c in have else F.lit(None).cast("double").alias(c)

        return sel._latest().select(
            F.col(self.partition_by).alias("symbol"),
            close.alias("price"),
            opt("open"),
            opt("high"),
            opt("low"),
            opt("volume"),
            "return_1d",
            "return_5d",
            "return_20d",
            "volatility",
            "ma_5",
            "ma_10",
            "ma_20",
            "volume_ratio",
            "amplitude",
        )

    def sort(self, by: str = "return_5d", ascending: bool = False, top_n: int | None = None) -> DataFrame:
        """README.md:782-799 sort over the info() metrics (price, return_1d/
        5d/20d, volume, volatility), optional top-n."""
        out = self.info()
        key = F.col(by)
        out = out.orderBy(key.asc() if ascending else key.desc(), F.col("symbol"))
        return out.limit(top_n) if top_n else out
