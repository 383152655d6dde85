"""Candlestick pattern recognition — pure lag + boolean Column expressions.

The reference implements 61 kernels (/root/reference/src/talib/pattern.rs,
2143 LoC) over shared predicate helpers with FIXED relative thresholds
(pattern.rs:2068-2143) — not TA-Lib's adaptive body averages (SURVEY.md §0/§2.5).
We mirror those predicates as a tiny Column DSL; every pattern compiles to
whole-stage-codegen'd `lag` + `when` expressions: no UDFs, no extra shuffles
beyond the one window partitioning.

Output contract: Int32, +100 bullish / −100 bearish / 0 none, NULL during the
lag warm-up (pattern L = extra bars consumed).

Threshold constants (pattern.rs:2096-2143):
  long body  > 5% of midprice      short body < 10%          doji ≤ 0.5%
  long shadow > 2·body             short shadow < 0.5·body
  very short shadow < 0.1·body     very long lower shadow > 3·body
  near < 1%                        equal < 0.1%
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F

from polars_quant_spark.functions._util import dcol


@dataclass
class Candle:
    """One bar's OHLC at lag k, plus the reference's predicate helpers."""

    o: Column
    h: Column
    l: Column
    c: Column

    # --- pattern.rs:2068-2143 predicate helpers ---
    @property
    def bull(self) -> Column:
        return self.c > self.o

    @property
    def bear(self) -> Column:
        return self.c < self.o

    @property
    def body(self) -> Column:
        return F.abs(self.c - self.o)

    @property
    def mid(self) -> Column:
        return (self.o + self.c) / 2.0

    @property
    def midprice(self) -> Column:
        return (self.h + self.l) / 2.0

    @property
    def upper_shadow(self) -> Column:
        return self.h - F.greatest(self.o, self.c)

    @property
    def lower_shadow(self) -> Column:
        return F.least(self.o, self.c) - self.l

    @property
    def long_body(self) -> Column:
        return self.body > 0.05 * self.midprice

    @property
    def short_body(self) -> Column:
        return self.body < 0.10 * self.midprice

    @property
    def doji(self) -> Column:
        return self.body <= 0.005 * self.midprice

    @property
    def long_up_shadow(self) -> Column:
        return self.upper_shadow > 2.0 * self.body

    @property
    def long_dn_shadow(self) -> Column:
        return self.lower_shadow > 2.0 * self.body

    @property
    def short_up_shadow(self) -> Column:
        return self.upper_shadow < 0.5 * self.body

    @property
    def short_dn_shadow(self) -> Column:
        return self.lower_shadow < 0.5 * self.body

    @property
    def vshort_up_shadow(self) -> Column:
        return self.upper_shadow < 0.1 * self.body

    @property
    def vshort_dn_shadow(self) -> Column:
        return self.lower_shadow < 0.1 * self.body

    @property
    def vlong_dn_shadow(self) -> Column:
        return self.lower_shadow > 3.0 * self.body

    def near(self, a: Column, b: Column) -> Column:
        return F.abs(a - b) < 0.01 * self.midprice

    def equal(self, a: Column, b: Column) -> Column:
        return F.abs(a - b) < 0.001 * self.midprice


#: Candle helper names materialized as `_a{lag}_{name}` columns by
#: with_patterns (everything derived from one bar's OHLC).
_DERIVED = [
    "bull", "bear", "body", "mid", "midprice", "upper_shadow", "lower_shadow",
    "long_body", "short_body", "doji", "long_up_shadow", "long_dn_shadow",
    "short_up_shadow", "short_dn_shadow", "vshort_up_shadow",
    "vshort_dn_shadow", "vlong_dn_shadow",
]


@dataclass
class _FlatCandle(Candle):
    """Candle whose derived helpers are references to the materialized
    `_a{tag}_*` anatomy columns (see with_patterns)."""

    tag: str = ""


#: Shared unresolved column refs for the flat anatomy columns. Column
#: objects are immutable and reusable across DataFrames; handing out one
#: cached instance per name removes thousands of py4j round-trips from the
#: 61-pattern expression build (~40% of with_patterns' driver-side cost).
_FLAT_COLS: dict[str, Column] = {}


def _flat_col(name: str) -> Column:
    col = _FLAT_COLS.get(name)
    if col is None:
        col = F.col(name)
        _FLAT_COLS[name] = col
    return col


def _flat_prop(nm: str):
    return property(lambda self: _flat_col(f"_a{self.tag}_{nm}"))


for _nm in _DERIVED:
    setattr(_FlatCandle, _nm, _flat_prop(_nm))


#: When set (by `with_patterns`), candles() hands out these precomputed
#: lag-column candles instead of inlining F.lag windows — the 61-pattern tree
#: would otherwise repeat every lag expression thousands of times and spend
#: ~20s in Catalyst/codegen per query.
_PRECOMPUTED: list[Candle] | None = None


def candles(
    open: Column | str,
    high: Column | str,
    low: Column | str,
    close: Column | str,
    w: WindowSpec,
    lookback: int,
) -> list[Candle]:
    """[current, lag1, lag2, ...] candles up to `lookback` bars back."""
    if _PRECOMPUTED is not None:
        return _PRECOMPUTED[: lookback + 1]
    o, h, l, c = dcol(open), dcol(high), dcol(low), dcol(close)
    out = [Candle(o, h, l, c)]
    for k in range(1, lookback + 1):
        out.append(
            Candle(
                F.lag(o, k).over(w),
                F.lag(h, k).over(w),
                F.lag(l, k).over(w),
                F.lag(c, k).over(w),
            )
        )
    return out


def _signal(warm: Column, bull_cond: Column | None, bear_cond: Column | None) -> Column:
    """+100/−100/0 Int32, NULL before `warm` rows exist."""
    expr = F.lit(0)
    if bear_cond is not None:
        expr = F.when(bear_cond, F.lit(-100)).otherwise(expr)
    if bull_cond is not None:
        expr = F.when(bull_cond, F.lit(100)).otherwise(expr)
    return F.when(warm, expr).cast("int")


def _warm(c: list[Candle], lookback: int) -> Column:
    return c[lookback].c.isNotNull() if lookback > 0 else c[0].c.isNotNull()


# --- individual patterns (reference line refs from pattern.rs) -------------


def cdldoji(o, h, l, c, w) -> Column:
    """Doji flag (+100) — pattern.rs:553."""
    cs = candles(o, h, l, c, w, 0)
    return _signal(_warm(cs, 0), cs[0].doji, None)


def cdldragonflydoji(o, h, l, c, w) -> Column:
    """Doji with long lower shadow, tiny upper — pattern.rs:610."""
    cs = candles(o, h, l, c, w, 0)
    t = cs[0]
    return _signal(_warm(cs, 0), t.doji & t.long_dn_shadow & t.vshort_up_shadow, None)


def cdlgravestonedoji(o, h, l, c, w) -> Column:
    """Doji with long upper shadow, tiny lower (−100 flag) — pattern.rs:777."""
    cs = candles(o, h, l, c, w, 0)
    t = cs[0]
    return _signal(_warm(cs, 0), None, t.doji & t.long_up_shadow & t.vshort_dn_shadow)


def cdllongleggeddoji(o, h, l, c, w) -> Column:
    """Doji with long shadows both sides — pattern.rs:1267."""
    cs = candles(o, h, l, c, w, 0)
    t = cs[0]
    return _signal(_warm(cs, 0), t.doji & t.long_up_shadow & t.long_dn_shadow, None)


def cdlrickshawman(o, h, l, c, w) -> Column:
    """Long-legged doji with body near the bar midpoint — pattern.rs:1553."""
    cs = candles(o, h, l, c, w, 0)
    t = cs[0]
    cond = t.doji & t.long_up_shadow & t.long_dn_shadow & t.near(t.mid, t.midprice)
    return _signal(_warm(cs, 0), cond, None)


def cdlmarubozu(o, h, l, c, w) -> Column:
    """Long body, no shadows — pattern.rs:1321."""
    cs = candles(o, h, l, c, w, 0)
    t = cs[0]
    base = t.long_body & t.vshort_up_shadow & t.vshort_dn_shadow
    return _signal(_warm(cs, 0), base & t.bull, base & t.bear)


def cdlclosingmarubozu(o, h, l, c, w) -> Column:
    """Long body closing at its extreme — pattern.rs:414."""
    cs = candles(o, h, l, c, w, 0)
    t = cs[0]
    return _signal(
        _warm(cs, 0),
        t.long_body & t.bull & t.vshort_up_shadow,
        t.long_body & t.bear & t.vshort_dn_shadow,
    )


def cdlbelthold(o, h, l, c, w) -> Column:
    """Long body opening at its extreme — pattern.rs:345."""
    cs = candles(o, h, l, c, w, 0)
    t = cs[0]
    return _signal(
        _warm(cs, 0),
        t.long_body & t.bull & t.vshort_dn_shadow,
        t.long_body & t.bear & t.vshort_up_shadow,
    )


def cdllongline(o, h, l, c, w) -> Column:
    """Long body, short shadows — pattern.rs:1292."""
    cs = candles(o, h, l, c, w, 0)
    t = cs[0]
    base = t.long_body & t.short_up_shadow & t.short_dn_shadow
    return _signal(_warm(cs, 0), base & t.bull, base & t.bear)


def cdlshortline(o, h, l, c, w) -> Column:
    """Short body, short shadows — pattern.rs:1709."""
    cs = candles(o, h, l, c, w, 0)
    t = cs[0]
    base = t.short_body & ~t.doji & t.short_up_shadow & t.short_dn_shadow
    return _signal(_warm(cs, 0), base & t.bull, base & t.bear)


def cdlspinningtop(o, h, l, c, w) -> Column:
    """Short body, shadows longer than body — pattern.rs:1738."""
    cs = candles(o, h, l, c, w, 0)
    t = cs[0]
    base = t.short_body & ~t.doji & (t.upper_shadow > t.body) & (t.lower_shadow > t.body)
    return _signal(_warm(cs, 0), base & t.bull, base & t.bear)


def cdlhighwave(o, h, l, c, w) -> Column:
    """Short body, very long shadows both sides — pattern.rs:929."""
    cs = candles(o, h, l, c, w, 0)
    t = cs[0]
    base = t.short_body & ~t.doji & t.long_up_shadow & t.long_dn_shadow
    return _signal(_warm(cs, 0), base & t.bull, base & t.bear)


def cdltakuri(o, h, l, c, w) -> Column:
    """Dragonfly doji with VERY long lower shadow — pattern.rs:1831."""
    cs = candles(o, h, l, c, w, 0)
    t = cs[0]
    cond = t.doji & t.vshort_up_shadow & t.vlong_dn_shadow
    return _signal(_warm(cs, 0), cond, None)


def cdlhammer(o, h, l, c, w) -> Column:
    """Small body at top, long lower shadow, in a downtrend (prev bear) —
    pattern.rs:802."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    cond = t.short_body & ~t.doji & t.long_dn_shadow & t.vshort_up_shadow & p1.bear
    return _signal(_warm(cs, 1), cond, None)


def cdlhangingman(o, h, l, c, w) -> Column:
    """Hammer shape after an up bar → bearish — pattern.rs:832."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    cond = t.short_body & ~t.doji & t.long_dn_shadow & t.vshort_up_shadow & p1.bull
    return _signal(_warm(cs, 1), None, cond)


def cdlinvertedhammer(o, h, l, c, w) -> Column:
    """Small body at bottom, long upper shadow, after a down bar — pattern.rs:1111."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    cond = t.short_body & ~t.doji & t.long_up_shadow & t.vshort_dn_shadow & p1.bear
    return _signal(_warm(cs, 1), cond, None)


def cdlshootingstar(o, h, l, c, w) -> Column:
    """Inverted-hammer shape gapping up after an up bar → bearish — pattern.rs:1679."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    cond = (
        t.short_body & ~t.doji & t.long_up_shadow & t.vshort_dn_shadow
        & p1.bull & (F.least(t.o, t.c) > p1.c)
    )
    return _signal(_warm(cs, 1), None, cond)


def cdlengulfing(o, h, l, c, w) -> Column:
    """Body engulfs previous body — pattern.rs:635."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    bull = t.bull & p1.bear & (t.c > p1.o) & (t.o < p1.c)
    bear = t.bear & p1.bull & (t.o > p1.c) & (t.c < p1.o)
    return _signal(_warm(cs, 1), bull, bear)


def cdlharami(o, h, l, c, w) -> Column:
    """Small body inside previous long body — pattern.rs:862."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    inside = (F.greatest(t.o, t.c) < F.greatest(p1.o, p1.c)) & (
        F.least(t.o, t.c) > F.least(p1.o, p1.c)
    )
    bull = p1.bear & p1.long_body & inside & t.bull
    bear = p1.bull & p1.long_body & inside & t.bear
    return _signal(_warm(cs, 1), bull, bear)


def cdlharamicross(o, h, l, c, w) -> Column:
    """Harami with a doji second bar — pattern.rs:896."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    inside = (F.greatest(t.o, t.c) < F.greatest(p1.o, p1.c)) & (
        F.least(t.o, t.c) > F.least(p1.o, p1.c)
    )
    bull = p1.bear & p1.long_body & inside & t.doji
    bear = p1.bull & p1.long_body & inside & t.doji
    return _signal(_warm(cs, 1), bull, bear)


def cdldojistar(o, h, l, c, w) -> Column:
    """Doji gapping away from a long body — pattern.rs:578."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    bull = p1.bear & p1.long_body & t.doji & (F.greatest(t.o, t.c) < p1.c)
    bear = p1.bull & p1.long_body & t.doji & (F.least(t.o, t.c) > p1.c)
    return _signal(_warm(cs, 1), bull, bear)


def cdlpiercing(o, h, l, c, w) -> Column:
    """Bull bar opening below prior low, closing above prior body midpoint —
    pattern.rs:1519."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    cond = p1.bear & p1.long_body & t.bull & (t.o < p1.l) & (t.c > p1.mid) & (t.c < p1.o)
    return _signal(_warm(cs, 1), cond, None)


def cdldarkcloudcover(o, h, l, c, w) -> Column:
    """Bear bar opening above prior high, closing below prior body midpoint —
    pattern.rs:519."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    cond = p1.bull & p1.long_body & t.bear & (t.o > p1.h) & (t.c < p1.mid) & (t.c > p1.o)
    return _signal(_warm(cs, 1), None, cond)


def cdlcounterattack(o, h, l, c, w) -> Column:
    """Opposite long bodies closing equal — pattern.rs:487."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    bull = p1.bear & p1.long_body & t.bull & t.long_body & t.equal(t.c, p1.c)
    bear = p1.bull & p1.long_body & t.bear & t.long_body & t.equal(t.c, p1.c)
    return _signal(_warm(cs, 1), bull, bear)


def cdlseparatinglines(o, h, l, c, w) -> Column:
    """Opposite bodies sharing the open, trend resumes — pattern.rs:1647."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    bull = p1.bear & t.bull & t.long_body & t.equal(t.o, p1.o) & t.vshort_dn_shadow
    bear = p1.bull & t.bear & t.long_body & t.equal(t.o, p1.o) & t.vshort_up_shadow
    return _signal(_warm(cs, 1), bull, bear)


def cdlkicking(o, h, l, c, w) -> Column:
    """Two opposite marubozu with a gap — pattern.rs:1141."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]

    def maru(x: Candle) -> Column:
        return x.long_body & x.vshort_up_shadow & x.vshort_dn_shadow

    bull = maru(p1) & p1.bear & maru(t) & t.bull & (t.l > p1.h)
    bear = maru(p1) & p1.bull & maru(t) & t.bear & (t.h < p1.l)
    return _signal(_warm(cs, 1), bull, bear)


def cdlkickingbylength(o, h, l, c, w) -> Column:
    """Kicking, signal by the longer marubozu — pattern.rs:1183 (same detect,
    polarity by which body is longer)."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]

    def maru(x: Candle) -> Column:
        return x.long_body & x.vshort_up_shadow & x.vshort_dn_shadow

    detect_up = maru(p1) & p1.bear & maru(t) & t.bull & (t.l > p1.h)
    detect_dn = maru(p1) & p1.bull & maru(t) & t.bear & (t.h < p1.l)
    longer_cur = t.body >= p1.body
    bull = (detect_up & longer_cur) | (detect_dn & ~longer_cur)
    bear = (detect_dn & longer_cur) | (detect_up & ~longer_cur)
    return _signal(_warm(cs, 1), bull, bear)


def cdlmatchinglow(o, h, l, c, w) -> Column:
    """Two bear bars closing equal — pattern.rs:1349."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    cond = p1.bear & t.bear & t.equal(t.c, p1.c)
    return _signal(_warm(cs, 1), cond, None)


def cdlhomingpigeon(o, h, l, c, w) -> Column:
    """Small bear body inside prior long bear body — pattern.rs:1021."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    cond = p1.bear & p1.long_body & t.bear & t.short_body & (t.o < p1.o) & (t.c > p1.c)
    return _signal(_warm(cs, 1), cond, None)


def cdlinneck(o, h, l, c, w) -> Column:
    """Bull bar closing slightly into prior bear close — pattern.rs:1083."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    cond = p1.bear & p1.long_body & t.bull & (t.o < p1.l) & (t.c >= p1.c) & t.near(t.c, p1.c)
    return _signal(_warm(cs, 1), None, cond)


def cdlonneck(o, h, l, c, w) -> Column:
    """Bull bar closing at prior low — pattern.rs:1490."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    cond = p1.bear & p1.long_body & t.bull & (t.o < p1.l) & t.equal(t.c, p1.l)
    return _signal(_warm(cs, 1), None, cond)


def cdlthrusting(o, h, l, c, w) -> Column:
    """Bull bar closing between prior close and midpoint — pattern.rs:1894."""
    cs = candles(o, h, l, c, w, 1)
    t, p1 = cs[0], cs[1]
    cond = p1.bear & p1.long_body & t.bull & (t.o < p1.l) & (t.c > p1.c) & (t.c < p1.mid)
    return _signal(_warm(cs, 1), None, cond)


# --- 3-bar patterns ---------------------------------------------------------


def cdl3whitesoldiers(o, h, l, c, w) -> Column:
    """Three long bull bars, each opening within and closing above the prior
    body — pattern.rs:234."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    cond = (
        p2.bull & p2.long_body
        & p1.bull & p1.long_body & (p1.o > p2.o) & (p1.o < p2.c) & (p1.c > p2.c)
        & t.bull & t.long_body & (t.o > p1.o) & (t.o < p1.c) & (t.c > p1.c)
    )
    return _signal(_warm(cs, 2), cond, None)


def cdl3blackcrows(o, h, l, c, w) -> Column:
    """Three long bear bars stepping down — pattern.rs:43."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    cond = (
        p2.bear & p2.long_body
        & p1.bear & p1.long_body & (p1.o < p2.o) & (p1.o > p2.c) & (p1.c < p2.c)
        & t.bear & t.long_body & (t.o < p1.o) & (t.o > p1.c) & (t.c < p1.c)
    )
    return _signal(_warm(cs, 2), None, cond)


def cdlidentical3crows(o, h, l, c, w) -> Column:
    """Three bear bars each opening at the prior close — pattern.rs:1048."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    cond = (
        p2.bear & p1.bear & t.bear
        & p1.equal(p1.o, p2.c) & t.equal(t.o, p1.c)
    )
    return _signal(_warm(cs, 2), None, cond)


def cdl2crows(o, h, l, c, w) -> Column:
    """Up bar, gap-up bear bar, bear bar closing into the first body —
    pattern.rs:10."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    cond = (
        p2.bull & p2.long_body
        & p1.bear & (F.least(p1.o, p1.c) > p2.c)
        & t.bear & (t.o < p1.o) & (t.o > p1.c) & (t.c < p2.c) & (t.c > p2.o)
    )
    return _signal(_warm(cs, 2), None, cond)


def cdlupsidegap2crows(o, h, l, c, w) -> Column:
    """Two crows above a gap, second engulfing first, close still above bar-1
    close — pattern.rs:1997."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    cond = (
        p2.bull & p2.long_body
        & p1.bear & (F.least(p1.o, p1.c) > p2.c)
        & t.bear & (t.o > p1.o) & (t.c < p1.c) & (t.c > p2.c)
    )
    return _signal(_warm(cs, 2), None, cond)


def cdl3inside(o, h, l, c, w) -> Column:
    """Harami then confirmation bar — pattern.rs:76."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    inside_up = (
        p2.bear & p2.long_body & p1.bull
        & (F.greatest(p1.o, p1.c) < p2.o) & (F.least(p1.o, p1.c) > p2.c)
    )
    inside_dn = (
        p2.bull & p2.long_body & p1.bear
        & (F.greatest(p1.o, p1.c) < p2.c) & (F.least(p1.o, p1.c) > p2.o)
    )
    bull = inside_up & t.bull & (t.c > p2.o)
    bear = inside_dn & t.bear & (t.c < p2.o)
    return _signal(_warm(cs, 2), bull, bear)


def cdl3outside(o, h, l, c, w) -> Column:
    """Engulfing then confirmation bar — pattern.rs:160."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    eng_up = p1.bull & p2.bear & (p1.c > p2.o) & (p1.o < p2.c)
    eng_dn = p1.bear & p2.bull & (p1.o > p2.c) & (p1.c < p2.o)
    bull = eng_up & t.bull & (t.c > p1.c)
    bear = eng_dn & t.bear & (t.c < p1.c)
    return _signal(_warm(cs, 2), bull, bear)


def cdlmorningstar(o, h, l, c, w, penetration: float = 0.3) -> Column:
    """Long bear, gapped-down short bar, bull bar penetrating the first body —
    pattern.rs:1454. `penetration` accepted for API parity (reference wrappers
    pass it; kernels ignore it — we honor it)."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    cond = (
        p2.bear & p2.long_body
        & p1.short_body & (F.greatest(p1.o, p1.c) < p2.c)
        & t.bull & (t.c > p2.c + penetration * p2.body)
    )
    return _signal(_warm(cs, 2), cond, None)


def cdleveningstar(o, h, l, c, w, penetration: float = 0.3) -> Column:
    """Mirror of morning star — pattern.rs:703."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    cond = (
        p2.bull & p2.long_body
        & p1.short_body & (F.least(p1.o, p1.c) > p2.c)
        & t.bear & (t.c < p2.c - penetration * p2.body)
    )
    return _signal(_warm(cs, 2), None, cond)


def cdlmorningdojistar(o, h, l, c, w, penetration: float = 0.3) -> Column:
    """Morning star with a doji middle bar — pattern.rs:1416."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    cond = (
        p2.bear & p2.long_body
        & p1.doji & (F.greatest(p1.o, p1.c) < p2.c)
        & t.bull & (t.c > p2.c + penetration * p2.body)
    )
    return _signal(_warm(cs, 2), cond, None)


def cdleveningdojistar(o, h, l, c, w, penetration: float = 0.3) -> Column:
    """Evening star with a doji middle bar — pattern.rs:665."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    cond = (
        p2.bull & p2.long_body
        & p1.doji & (F.least(p1.o, p1.c) > p2.c)
        & t.bear & (t.c < p2.c - penetration * p2.body)
    )
    return _signal(_warm(cs, 2), None, cond)


def cdlabandonedbaby(o, h, l, c, w, penetration: float = 0.3) -> Column:
    """Doji island gapped away from both neighbors — pattern.rs:268."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    bull = (
        p2.bear & p2.long_body & p1.doji
        & (p1.h < p2.l) & (p1.h < t.l)
        & t.bull & (t.c > p2.c + penetration * p2.body)
    )
    bear = (
        p2.bull & p2.long_body & p1.doji
        & (p1.l > p2.h) & (p1.l > t.h)
        & t.bear & (t.c < p2.c - penetration * p2.body)
    )
    return _signal(_warm(cs, 2), bull, bear)


def cdltristar(o, h, l, c, w) -> Column:
    """Three dojis, middle one gapped — pattern.rs:1922."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    all_doji = p2.doji & p1.doji & t.doji
    bull = all_doji & (F.greatest(p1.o, p1.c) < F.least(p2.o, p2.c)) & (
        F.greatest(p1.o, p1.c) < F.least(t.o, t.c)
    )
    bear = all_doji & (F.least(p1.o, p1.c) > F.greatest(p2.o, p2.c)) & (
        F.least(p1.o, p1.c) > F.greatest(t.o, t.c)
    )
    return _signal(_warm(cs, 2), bull, bear)


def cdl3starsinsouth(o, h, l, c, w) -> Column:
    """Three shrinking bear bars with long lower shadows — pattern.rs:194."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    cond = (
        p2.bear & p2.long_body & p2.long_dn_shadow
        & p1.bear & (p1.body < p2.body) & (p1.l > p2.l)
        & t.bear & (t.body < p1.body) & (t.l > p1.l)
        & t.vshort_up_shadow & t.vshort_dn_shadow
    )
    return _signal(_warm(cs, 2), cond, None)


def cdladvanceblock(o, h, l, c, w) -> Column:
    """Three bull bars with shrinking bodies and growing upper shadows —
    pattern.rs:309."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    cond = (
        p2.bull & p2.long_body
        & p1.bull & (p1.o > p2.o) & (p1.o < p2.c) & (p1.c > p2.c) & (p1.body < p2.body)
        & t.bull & (t.o > p1.o) & (t.o < p1.c) & (t.c > p1.c) & (t.body < p1.body)
        & (t.upper_shadow > p1.upper_shadow)
    )
    return _signal(_warm(cs, 2), None, cond)


def cdlstalledpattern(o, h, l, c, w) -> Column:
    """Three bull bars, third small and riding the second — pattern.rs:1766."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    cond = (
        p2.bull & p2.long_body
        & p1.bull & p1.long_body & (p1.c > p2.c)
        & t.bull & t.short_body & (t.o >= p1.c - p1.body * 0.2)
    )
    return _signal(_warm(cs, 2), None, cond)


def cdlsticksandwich(o, h, l, c, w) -> Column:
    """Bear/bull/bear with equal first+third closes — pattern.rs:1797."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    cond = p2.bear & p1.bull & (p1.c > p2.c) & t.bear & t.equal(t.c, p2.c)
    return _signal(_warm(cs, 2), cond, None)


def cdlunique3river(o, h, l, c, w) -> Column:
    """Long bear, harami bear with lower low, small bull below — pattern.rs:1964."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    cond = (
        p2.bear & p2.long_body
        & p1.bear & (p1.o < p2.o) & (p1.c > p2.c) & (p1.l < p2.l)
        & t.bull & t.short_body & (t.c < p1.c)
    )
    return _signal(_warm(cs, 2), cond, None)


def cdlgapsidesidewhite(o, h, l, c, w) -> Column:
    """Two similar bull bars beyond a gap — pattern.rs:739."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    up = (
        (F.least(p1.o, p1.c) > p2.h) & p1.bull
        & t.bull & (F.least(t.o, t.c) > p2.h)
        & t.near(t.body, p1.body) & t.near(t.o, p1.o)
    )
    dn = (
        (F.greatest(p1.o, p1.c) < p2.l) & p1.bull
        & t.bull & (F.greatest(t.o, t.c) < p2.l)
        & t.near(t.body, p1.body) & t.near(t.o, p1.o)
    )
    return _signal(_warm(cs, 2), up, dn)


def cdltasukigap(o, h, l, c, w) -> Column:
    """Gap, continuation bar, counter bar closing inside the gap —
    pattern.rs:1856."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    bull = (
        (F.least(p1.o, p1.c) > p2.h) & p1.bull
        & t.bear & (t.o > p1.o) & (t.o < p1.c)
        & (t.c < p1.o) & (t.c > p2.h)
    )
    bear = (
        (F.greatest(p1.o, p1.c) < p2.l) & p1.bear
        & t.bull & (t.o < p1.o) & (t.o > p1.c)
        & (t.c > p1.o) & (t.c < p2.l)
    )
    return _signal(_warm(cs, 2), bull, bear)


def cdlhikkake(o, h, l, c, w) -> Column:
    """Inside bar then false-breakout bar — pattern.rs:956."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    inside = (p1.h < p2.h) & (p1.l > p2.l)
    bull = inside & (t.h < p1.h) & (t.l < p1.l)
    bear = inside & (t.h > p1.h) & (t.l > p1.l)
    return _signal(_warm(cs, 2), bull, bear)


# --- 4/5-bar patterns -------------------------------------------------------


def cdl3linestrike(o, h, l, c, w) -> Column:
    """Three same-direction bars then an engulfing counter bar — pattern.rs:114."""
    cs = candles(o, h, l, c, w, 3)
    t, p1, p2, p3 = cs[0], cs[1], cs[2], cs[3]
    three_up = p3.bull & p2.bull & (p2.c > p3.c) & p1.bull & (p1.c > p2.c)
    three_dn = p3.bear & p2.bear & (p2.c < p3.c) & p1.bear & (p1.c < p2.c)
    bull = three_dn & t.bull & (t.o < p1.c) & (t.c > p3.o)
    bear = three_up & t.bear & (t.o > p1.c) & (t.c < p3.o)
    return _signal(_warm(cs, 3), bull, bear)


def cdlhikkakemod(o, h, l, c, w) -> Column:
    """Modified hikkake: context bar before the inside bar — pattern.rs:987."""
    cs = candles(o, h, l, c, w, 3)
    t, p1, p2, p3 = cs[0], cs[1], cs[2], cs[3]
    inside = (p1.h < p2.h) & (p1.l > p2.l)
    bull = (p3.h >= p2.h) & inside & (t.h < p1.h) & (t.l < p1.l)
    bear = (p3.l <= p2.l) & inside & (t.h > p1.h) & (t.l > p1.l)
    return _signal(_warm(cs, 3), bull, bear)


def cdlconcealbabyswall(o, h, l, c, w) -> Column:
    """Four bear bars, marubozu pair, engulfing finale — pattern.rs:442."""
    cs = candles(o, h, l, c, w, 3)
    t, p1, p2, p3 = cs[0], cs[1], cs[2], cs[3]
    cond = (
        p3.bear & p3.vshort_up_shadow & p3.vshort_dn_shadow
        & p2.bear & p2.vshort_up_shadow & p2.vshort_dn_shadow
        & p1.bear & (p1.o < p2.c) & (p1.h > p2.c)
        & t.bear & (t.o > p1.o) & (t.c < p1.l)
    )
    return _signal(_warm(cs, 3), cond, None)


def cdlbreakaway(o, h, l, c, w) -> Column:
    """Five-bar breakaway — pattern.rs:373."""
    cs = candles(o, h, l, c, w, 4)
    t, p1, p2, p3, p4 = cs[0], cs[1], cs[2], cs[3], cs[4]
    bull = (
        p4.bear & p4.long_body
        & p3.bear & (F.greatest(p3.o, p3.c) < p4.c)
        & p2.bear & (p2.c < p3.c)
        & p1.bear & (p1.c < p2.c)
        & t.bull & t.long_body & (t.c > F.least(p3.o, p3.c)) & (t.c < p4.c)
    )
    bear = (
        p4.bull & p4.long_body
        & p3.bull & (F.least(p3.o, p3.c) > p4.c)
        & p2.bull & (p2.c > p3.c)
        & p1.bull & (p1.c > p2.c)
        & t.bear & t.long_body & (t.c < F.greatest(p3.o, p3.c)) & (t.c > p4.c)
    )
    return _signal(_warm(cs, 4), bull, bear)


def cdlladderbottom(o, h, l, c, w) -> Column:
    """Three stepping bear bars, bear with upper shadow, gapping bull —
    pattern.rs:1229."""
    cs = candles(o, h, l, c, w, 4)
    t, p1, p2, p3, p4 = cs[0], cs[1], cs[2], cs[3], cs[4]
    cond = (
        p4.bear & p3.bear & (p3.c < p4.c) & p2.bear & (p2.c < p3.c)
        & p1.bear & (p1.upper_shadow > p1.body)
        & t.bull & (t.o > p1.o)
    )
    return _signal(_warm(cs, 4), cond, None)


def cdlmathold(o, h, l, c, w, penetration: float = 0.5) -> Column:
    """Long bull, three small pullback bars, bull breakout — pattern.rs:1376."""
    cs = candles(o, h, l, c, w, 4)
    t, p1, p2, p3, p4 = cs[0], cs[1], cs[2], cs[3], cs[4]
    cond = (
        p4.bull & p4.long_body
        & p3.short_body & p3.bear & (F.least(p3.o, p3.c) > p4.c)
        & p2.short_body & (p2.c < p3.c)
        & p1.short_body & (p1.c < p2.c) & (F.least(p1.o, p1.c) > p4.o + p4.body * penetration)
        & t.bull & (t.c > F.greatest(p3.o, p3.c))
    )
    return _signal(_warm(cs, 4), cond, None)


def cdlrisefall3methods(o, h, l, c, w) -> Column:
    """Rising/falling three methods — pattern.rs:1581."""
    cs = candles(o, h, l, c, w, 4)
    t, p1, p2, p3, p4 = cs[0], cs[1], cs[2], cs[3], cs[4]
    rise = (
        p4.bull & p4.long_body
        & p3.short_body & p3.bear & (p3.h < p4.h) & (p3.l > p4.l)
        & p2.short_body & (p2.h < p4.h) & (p2.l > p4.l)
        & p1.short_body & (p1.h < p4.h) & (p1.l > p4.l)
        & t.bull & t.long_body & (t.c > p4.c)
    )
    fall = (
        p4.bear & p4.long_body
        & p3.short_body & p3.bull & (p3.h < p4.h) & (p3.l > p4.l)
        & p2.short_body & (p2.h < p4.h) & (p2.l > p4.l)
        & p1.short_body & (p1.h < p4.h) & (p1.l > p4.l)
        & t.bear & t.long_body & (t.c < p4.c)
    )
    return _signal(_warm(cs, 4), rise, fall)


def cdlxsidegap3methods(o, h, l, c, w) -> Column:
    """Gap, continuation, counter bar closing the gap — pattern.rs:2027."""
    cs = candles(o, h, l, c, w, 2)
    t, p1, p2 = cs[0], cs[1], cs[2]
    bull = (
        p2.bull & p1.bull & (F.least(p1.o, p1.c) > p2.h)
        & t.bear & (t.o > p1.o) & (t.o < p1.c) & (t.c < p2.h) & (t.c > p2.o)
    )
    bear = (
        p2.bear & p1.bear & (F.greatest(p1.o, p1.c) < p2.l)
        & t.bull & (t.o < p1.o) & (t.o > p1.c) & (t.c > p2.l) & (t.c < p2.o)
    )
    return _signal(_warm(cs, 2), bull, bear)


def with_patterns(
    df,
    names: list[str] | None = None,
    partition_by: str = "symbol",
    order_by: str = "t",
    open: str = "open",
    high: str = "high",
    low: str = "low",
    close: str = "close",
    repartition: int | None = None,
):
    """Append pattern signal columns for `names` (default: all 61).

    Materializes the 4 lag depths of OHLC as real columns first, then builds
    every pattern over plain column references — one window pass, a compact
    expression tree, one whole-stage-codegen projection.

    After the lags are materialized every row is self-contained, so the
    CPU-heavy 61-column projection is rebalanced to `repartition` partitions
    (default: cluster parallelism) — this both escapes AQE's size-based
    coalescing (which packs the small symbol shuffle onto one core; CPU cost
    is invisible to it) and neutralizes fat-symbol skew. Pass
    ``repartition=0`` to skip, e.g. over a symbol-bucketed store with many
    uniform symbols.

    The lag/anatomy/pattern Column trees are memoized per column-name
    tuple: they are pure functions of names (unresolved Columns are
    reusable across DataFrames), and building the 61 trees costs ~2 s of
    py4j round-trips — dominant over the ~1 s the query actually runs at
    sf0.1. Repeat calls (the grouped per-family oracle queries, iterative
    notebooks) reuse every tree.
    """
    global _PRECOMPUTED
    names = names or sorted(ALL_PATTERNS)
    ent = _build_entry(partition_by, order_by, open, high, low, close)
    base = df.select("*", *ent["lag_cols"])
    if repartition is None:
        repartition = df.sparkSession.sparkContext.defaultParallelism
    if repartition:
        base = base.repartition(repartition)
    anat = base.select("*", *ent["anat_cols"])
    missing = [n for n in names if n not in ent["patterns"]]
    if missing:
        _PRECOMPUTED = ent["flat"]
        try:
            for n in missing:
                ent["patterns"][n] = (
                    ALL_PATTERNS[n](open, high, low, close, ent["w"]).alias(n)
                )
        finally:
            _PRECOMPUTED = None
    return anat.select(*df.columns, *[ent["patterns"][n] for n in names])


#: (partition_by, order_by, o, h, l, c) → prebuilt Column trees.
_BUILD_CACHE: dict[tuple, dict] = {}


def _build_entry(
    partition_by: str, order_by: str, open: str, high: str, low: str, close: str
) -> dict:
    from pyspark.sql import Window

    key = (partition_by, order_by, open, high, low, close)
    ent = _BUILD_CACHE.get(key)
    if ent is not None:
        return ent
    w = Window.partitionBy(partition_by).orderBy(order_by)
    lag_cols = []
    for k in range(1, 5):
        for c in (open, high, low, close):
            lag_cols.append(F.lag(dcol(c), k).over(w).alias(f"_lag{k}_{c}"))
    cands = [Candle(dcol(open), dcol(high), dcol(low), dcol(close))]
    for k in range(1, 5):
        cands.append(
            Candle(
                F.col(f"_lag{k}_{open}"),
                F.col(f"_lag{k}_{high}"),
                F.col(f"_lag{k}_{low}"),
                F.col(f"_lag{k}_{close}"),
            )
        )
    # Materialize each candle's anatomy as real columns and hand the pattern
    # fns flat references: the 61 pattern trees would otherwise inline
    # `abs(c−o)`-style subtrees thousands of times, pushing the generated
    # projection past the JVM 64 KB method limit (janino gives up and Spark
    # falls back to the interpreted path — ~3× slower and a wasted ~4 s
    # compile attempt per query).
    anat_cols = [
        getattr(cand, nm).alias(f"_a{k}_{nm}")
        for k, cand in enumerate(cands)
        for nm in _DERIVED
    ]
    flat = [
        _FlatCandle(cand.o, cand.h, cand.l, cand.c, tag=str(k))
        for k, cand in enumerate(cands)
    ]
    ent = {"w": w, "lag_cols": lag_cols, "anat_cols": anat_cols, "flat": flat,
           "patterns": {}}
    _BUILD_CACHE[key] = ent
    return ent


#: All implemented CDL patterns: name → fn(o, h, l, c, w[, penetration]) -> Column
ALL_PATTERNS: dict[str, Callable] = {}


def _register():
    import sys

    mod = sys.modules[__name__]
    for name in dir(mod):
        if name.startswith("cdl"):
            ALL_PATTERNS[name] = getattr(mod, name)


_register()
