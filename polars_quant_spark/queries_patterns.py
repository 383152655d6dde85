"""Oracle queries for the remaining candlestick patterns — together with
queries_ext's cdl_onebar/twobar/threebar this hash-checks all 61 patterns.

The SQL twins mirror functions/pattern.py expression-for-expression over a
generated helper CTE carrying per-bar candle features and their lags 1-4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from polars_quant_spark.functions import pattern as pat
from polars_quant_spark.queries import ORACLES, QUERIES
from polars_quant_spark.sources.bars import BARS_CTE, bars

_FEATS = [
    "o", "h", "l", "c", "body", "mid", "midprice", "us", "ls",
    "bull", "bear", "long_body", "short_body", "doji",
    "long_us", "long_ls", "short_us", "short_ls",
    "vshort_us", "vshort_ls", "vlong_ls",
]

_LAG_SELECT = ",\n         ".join(
    f"LAG({f}, {k}) OVER w AS {f}{k}" for k in range(1, 5) for f in _FEATS
)

# candle features exactly as pattern.rs:2068-2143 / functions/pattern.py
_CDL2 = f"""
, cf AS (
  SELECT symbol, t, open AS o, high AS h, low AS l, close AS c,
         ABS(close - open) AS body,
         (open + close) / 2.0 AS mid,
         (high + low) / 2.0 AS midprice,
         high - GREATEST(open, close) AS us,
         LEAST(open, close) - low AS ls,
         close > open AS bull, close < open AS bear,
         ABS(close - open) > 0.05 * ((high + low) / 2.0) AS long_body,
         ABS(close - open) < 0.10 * ((high + low) / 2.0) AS short_body,
         ABS(close - open) <= 0.005 * ((high + low) / 2.0) AS doji,
         high - GREATEST(open, close) > 2.0 * ABS(close - open) AS long_us,
         LEAST(open, close) - low > 2.0 * ABS(close - open) AS long_ls,
         high - GREATEST(open, close) < 0.5 * ABS(close - open) AS short_us,
         LEAST(open, close) - low < 0.5 * ABS(close - open) AS short_ls,
         high - GREATEST(open, close) < 0.1 * ABS(close - open) AS vshort_us,
         LEAST(open, close) - low < 0.1 * ABS(close - open) AS vshort_ls,
         LEAST(open, close) - low > 3.0 * ABS(close - open) AS vlong_ls
  FROM bars
), cg AS (
  SELECT *,
         {_LAG_SELECT}
  FROM cf
  WINDOW w AS (PARTITION BY symbol ORDER BY t)
)
"""


def _sig(warm_lag: int, bull: str | None, bear: str | None) -> str:
    warm = "c IS NULL" if warm_lag == 0 else f"c{warm_lag} IS NULL"
    arms = ""
    if bull:
        arms += f"WHEN {bull} THEN 100 "
    if bear:
        arms += f"WHEN {bear} THEN -100 "
    return f"CAST(CASE WHEN {warm} THEN NULL {arms}ELSE 0 END AS INTEGER)"


# near/equal thresholds scale by the *current* candle's midprice (t.near/t.equal
# in the Python DSL); pN.equal scales by midprice{N}.
def _near(a: str, b: str, mp: str = "midprice") -> str:
    return f"ABS({a} - {b}) < 0.01 * {mp}"


def _eq(a: str, b: str, mp: str = "midprice") -> str:
    return f"ABS({a} - {b}) < 0.001 * {mp}"


_ONEBAR2 = {
    "cdllongline": _sig(0, "long_body AND short_us AND short_ls AND bull",
                        "long_body AND short_us AND short_ls AND bear"),
    "cdlshortline": _sig(0, "short_body AND NOT doji AND short_us AND short_ls AND bull",
                         "short_body AND NOT doji AND short_us AND short_ls AND bear"),
    "cdlhighwave": _sig(0, "short_body AND NOT doji AND long_us AND long_ls AND bull",
                        "short_body AND NOT doji AND long_us AND long_ls AND bear"),
    "cdllongleggeddoji": _sig(0, "doji AND long_us AND long_ls", None),
    "cdlrickshawman": _sig(0, f"doji AND long_us AND long_ls AND {_near('mid', 'midprice')}", None),
}

_MARU = "long_body{k} AND vshort_us{k} AND vshort_ls{k}"

_TWOBAR2 = {
    "cdlharamicross": _sig(
        1,
        "bear1 AND long_body1 AND GREATEST(o, c) < GREATEST(o1, c1) AND LEAST(o, c) > LEAST(o1, c1) AND doji",
        "bull1 AND long_body1 AND GREATEST(o, c) < GREATEST(o1, c1) AND LEAST(o, c) > LEAST(o1, c1) AND doji",
    ),
    "cdldojistar": _sig(
        1,
        "bear1 AND long_body1 AND doji AND GREATEST(o, c) < c1",
        "bull1 AND long_body1 AND doji AND LEAST(o, c) > c1",
    ),
    "cdlcounterattack": _sig(
        1,
        f"bear1 AND long_body1 AND bull AND long_body AND {_eq('c', 'c1')}",
        f"bull1 AND long_body1 AND bear AND long_body AND {_eq('c', 'c1')}",
    ),
    "cdlseparatinglines": _sig(
        1,
        f"bear1 AND bull AND long_body AND {_eq('o', 'o1')} AND vshort_ls",
        f"bull1 AND bear AND long_body AND {_eq('o', 'o1')} AND vshort_us",
    ),
    "cdlkicking": _sig(
        1,
        "long_body1 AND vshort_us1 AND vshort_ls1 AND bear1 AND long_body AND vshort_us AND vshort_ls AND bull AND l > h1",
        "long_body1 AND vshort_us1 AND vshort_ls1 AND bull1 AND long_body AND vshort_us AND vshort_ls AND bear AND h < l1",
    ),
    "cdlkickingbylength": _sig(
        1,
        "(long_body1 AND vshort_us1 AND vshort_ls1 AND bear1 AND long_body AND vshort_us AND vshort_ls AND bull AND l > h1 AND body >= body1)"
        " OR (long_body1 AND vshort_us1 AND vshort_ls1 AND bull1 AND long_body AND vshort_us AND vshort_ls AND bear AND h < l1 AND NOT body >= body1)",
        "(long_body1 AND vshort_us1 AND vshort_ls1 AND bull1 AND long_body AND vshort_us AND vshort_ls AND bear AND h < l1 AND body >= body1)"
        " OR (long_body1 AND vshort_us1 AND vshort_ls1 AND bear1 AND long_body AND vshort_us AND vshort_ls AND bull AND l > h1 AND NOT body >= body1)",
    ),
    "cdlhomingpigeon": _sig(1, "bear1 AND long_body1 AND bear AND short_body AND o < o1 AND c > c1", None),
    "cdlinneck": _sig(1, None, f"bear1 AND long_body1 AND bull AND o < l1 AND c >= c1 AND {_near('c', 'c1')}"),
    "cdlonneck": _sig(1, None, f"bear1 AND long_body1 AND bull AND o < l1 AND {_eq('c', 'l1')}"),
    "cdlthrusting": _sig(1, None, "bear1 AND long_body1 AND bull AND o < l1 AND c > c1 AND c < mid1"),
    "cdlinvertedhammer": _sig(1, "short_body AND NOT doji AND long_us AND vshort_ls AND bear1", None),
    "cdlshootingstar": _sig(1, None, "short_body AND NOT doji AND long_us AND vshort_ls AND bull1 AND LEAST(o, c) > c1"),
}

_THREEBAR2 = {
    "cdlidentical3crows": _sig(
        2, None,
        f"bear2 AND bear1 AND bear AND {_eq('o1', 'c2', 'midprice1')} AND {_eq('o', 'c1')}",
    ),
    "cdl2crows": _sig(
        2, None,
        "bull2 AND long_body2 AND bear1 AND LEAST(o1, c1) > c2 AND bear AND o < o1 AND o > c1 AND c < c2 AND c > o2",
    ),
    "cdlupsidegap2crows": _sig(
        2, None,
        "bull2 AND long_body2 AND bear1 AND LEAST(o1, c1) > c2 AND bear AND o > o1 AND c < c1 AND c > c2",
    ),
    "cdl3inside": _sig(
        2,
        "bear2 AND long_body2 AND bull1 AND GREATEST(o1, c1) < o2 AND LEAST(o1, c1) > c2 AND bull AND c > o2",
        "bull2 AND long_body2 AND bear1 AND GREATEST(o1, c1) < c2 AND LEAST(o1, c1) > o2 AND bear AND c < o2",
    ),
    "cdl3outside": _sig(
        2,
        "bull1 AND bear2 AND c1 > o2 AND o1 < c2 AND bull AND c > c1",
        "bear1 AND bull2 AND o1 > c2 AND c1 < o2 AND bear AND c < c1",
    ),
    "cdlmorningdojistar": _sig(
        2, "bear2 AND long_body2 AND doji1 AND GREATEST(o1, c1) < c2 AND bull AND c > c2 + 0.3 * body2", None,
    ),
    "cdleveningdojistar": _sig(
        2, None, "bull2 AND long_body2 AND doji1 AND LEAST(o1, c1) > c2 AND bear AND c < c2 - 0.3 * body2",
    ),
    "cdlabandonedbaby": _sig(
        2,
        "bear2 AND long_body2 AND doji1 AND h1 < l2 AND h1 < l AND bull AND c > c2 + 0.3 * body2",
        "bull2 AND long_body2 AND doji1 AND l1 > h2 AND l1 > h AND bear AND c < c2 - 0.3 * body2",
    ),
    "cdl3starsinsouth": _sig(
        2,
        "bear2 AND long_body2 AND long_ls2 AND bear1 AND body1 < body2 AND l1 > l2"
        " AND bear AND body < body1 AND l > l1 AND vshort_us AND vshort_ls",
        None,
    ),
    "cdladvanceblock": _sig(
        2, None,
        "bull2 AND long_body2 AND bull1 AND o1 > o2 AND o1 < c2 AND c1 > c2 AND body1 < body2"
        " AND bull AND o > o1 AND o < c1 AND c > c1 AND body < body1 AND us > us1",
    ),
    "cdlstalledpattern": _sig(
        2, None,
        "bull2 AND long_body2 AND bull1 AND long_body1 AND c1 > c2 AND bull AND short_body AND o >= c1 - body1 * 0.2",
    ),
    "cdlsticksandwich": _sig(2, f"bear2 AND bull1 AND c1 > c2 AND bear AND {_eq('c', 'c2')}", None),
    "cdlunique3river": _sig(
        2, "bear2 AND long_body2 AND bear1 AND o1 < o2 AND c1 > c2 AND l1 < l2 AND bull AND short_body AND c < c1", None,
    ),
    "cdlgapsidesidewhite": _sig(
        2,
        f"LEAST(o1, c1) > h2 AND bull1 AND bull AND LEAST(o, c) > h2 AND {_near('body', 'body1')} AND {_near('o', 'o1')}",
        f"GREATEST(o1, c1) < l2 AND bull1 AND bull AND GREATEST(o, c) < l2 AND {_near('body', 'body1')} AND {_near('o', 'o1')}",
    ),
    "cdltasukigap": _sig(
        2,
        "LEAST(o1, c1) > h2 AND bull1 AND bear AND o > o1 AND o < c1 AND c < o1 AND c > h2",
        "GREATEST(o1, c1) < l2 AND bear1 AND bull AND o < o1 AND o > c1 AND c > o1 AND c < l2",
    ),
    "cdlhikkake": _sig(
        2,
        "h1 < h2 AND l1 > l2 AND h < h1 AND l < l1",
        "h1 < h2 AND l1 > l2 AND h > h1 AND l > l1",
    ),
    "cdlxsidegap3methods": _sig(
        2,
        "bull2 AND bull1 AND LEAST(o1, c1) > h2 AND bear AND o > o1 AND o < c1 AND c < h2 AND c > o2",
        "bear2 AND bear1 AND GREATEST(o1, c1) < l2 AND bull AND o < o1 AND o > c1 AND c > l2 AND c < o2",
    ),
}

_MULTIBAR = {
    "cdl3linestrike": _sig(
        3,
        "bear3 AND bear2 AND c2 < c3 AND bear1 AND c1 < c2 AND bull AND o < c1 AND c > o3",
        "bull3 AND bull2 AND c2 > c3 AND bull1 AND c1 > c2 AND bear AND o > c1 AND c < o3",
    ),
    "cdlhikkakemod": _sig(
        3,
        "h3 >= h2 AND h1 < h2 AND l1 > l2 AND h < h1 AND l < l1",
        "l3 <= l2 AND h1 < h2 AND l1 > l2 AND h > h1 AND l > l1",
    ),
    "cdlconcealbabyswall": _sig(
        3,
        "bear3 AND vshort_us3 AND vshort_ls3 AND bear2 AND vshort_us2 AND vshort_ls2"
        " AND bear1 AND o1 < c2 AND h1 > c2 AND bear AND o > o1 AND c < l1",
        None,
    ),
    "cdlbreakaway": _sig(
        4,
        "bear4 AND long_body4 AND bear3 AND GREATEST(o3, c3) < c4 AND bear2 AND c2 < c3"
        " AND bear1 AND c1 < c2 AND bull AND long_body AND c > LEAST(o3, c3) AND c < c4",
        "bull4 AND long_body4 AND bull3 AND LEAST(o3, c3) > c4 AND bull2 AND c2 > c3"
        " AND bull1 AND c1 > c2 AND bear AND long_body AND c < GREATEST(o3, c3) AND c > c4",
    ),
    "cdlladderbottom": _sig(
        4,
        "bear4 AND bear3 AND c3 < c4 AND bear2 AND c2 < c3 AND bear1 AND us1 > body1 AND bull AND o > o1",
        None,
    ),
    "cdlmathold": _sig(
        4,
        "bull4 AND long_body4 AND short_body3 AND bear3 AND LEAST(o3, c3) > c4"
        " AND short_body2 AND c2 < c3 AND short_body1 AND c1 < c2 AND LEAST(o1, c1) > o4 + body4 * 0.5"
        " AND bull AND c > GREATEST(o3, c3)",
        None,
    ),
    "cdlrisefall3methods": _sig(
        4,
        "bull4 AND long_body4 AND short_body3 AND bear3 AND h3 < h4 AND l3 > l4"
        " AND short_body2 AND h2 < h4 AND l2 > l4 AND short_body1 AND h1 < h4 AND l1 > l4"
        " AND bull AND long_body AND c > c4",
        "bear4 AND long_body4 AND short_body3 AND bull3 AND h3 < h4 AND l3 > l4"
        " AND short_body2 AND h2 < h4 AND l2 > l4 AND short_body1 AND h1 < h4 AND l1 > l4"
        " AND bear AND long_body AND c < c4",
    ),
}


def _register(qname: str, defs: dict[str, str]) -> None:
    cols = ",\n  ".join(f"{expr} AS {name}" for name, expr in defs.items())
    ORACLES[qname] = BARS_CTE + _CDL2 + f"\nSELECT symbol, t,\n  {cols}\nFROM cg\n"

    def spark_fn(spark: SparkSession, sf_dir: str, _names=sorted(defs)) -> DataFrame:
        return pat.with_patterns(bars(spark, sf_dir), _names).select("symbol", "t", *_names)

    QUERIES[qname] = spark_fn


_register("cdl_onebar2", _ONEBAR2)
_register("cdl_twobar2", _TWOBAR2)
_register("cdl_threebar2", _THREEBAR2)
_register("cdl_multibar", _MULTIBAR)


def _register_all_patterns_oracle() -> None:
    """Full SQL twin for cdl_all_patterns: join the seven grouped oracles
    (which together cover all 61 patterns exactly once) on (symbol, t).
    DuckDB allows WITH inside subqueries, so each group's complete CTE
    chain nests as one derived table — no new pattern SQL to keep in sync;
    this is the same text the per-group hash checks run."""
    import re

    groups = [
        "cdl_onebar", "cdl_twobar", "cdl_threebar",
        "cdl_onebar2", "cdl_twobar2", "cdl_threebar2", "cdl_multibar",
    ]
    cols: list[str] = []
    seen: set[str] = set()
    froms: list[str] = []
    for i, g in enumerate(groups):
        sql = ORACLES[g]
        names = re.findall(r"AS (cdl\w+)", sql)
        assert names and not (set(names) & seen), g
        seen.update(names)
        alias = f"g{i}"
        if i == 0:
            froms.append(f"({sql}) {alias}")
        else:
            froms.append(
                f"JOIN ({sql}) {alias} ON {alias}.symbol = g0.symbol AND {alias}.t = g0.t"
            )
        cols += [f"{alias}.{n} AS {n}" for n in names]
    assert len(seen) == len(pat.ALL_PATTERNS), (len(seen), len(pat.ALL_PATTERNS))
    ORACLES["cdl_all_patterns"] = (
        "SELECT g0.symbol, g0.t,\n  "
        + ",\n  ".join(sorted(cols, key=lambda s: s.split(" AS ")[1]))
        + "\nFROM "
        + "\n".join(froms)
    )


_register_all_patterns_oracle()


# ---------------------------------------------------------------------------
# Pattern efficacy: fires + forward-return stats per one-bar pattern
# ---------------------------------------------------------------------------

import re as _re_eff  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

from polars_quant_spark.functions._util import round6 as _r6_eff  # noqa: E402
from polars_quant_spark.oracle import floor_rounds as _fr_eff  # noqa: E402

_ONEBAR_NAMES = sorted(set(_re_eff.findall(r"AS (cdl\w+)", ORACLES["cdl_onebar"])))


def cdl_efficacy(spark, sf_dir):
    """Pattern-efficacy report for the one-bar patterns: how often each
    fires (by signal direction) and the average next-bar return after a
    fire — the evidence table behind 'does this candle mean anything'.
    Composes the pattern DSL, native unpivot and a lead window; forward
    returns micro-quantize before the mean."""
    from pyspark.sql import Window as W

    from polars_quant_spark.sources.bars import bars as bars_src

    b = pat.with_patterns(bars_src(spark, sf_dir))
    w = W.partitionBy("symbol").orderBy("t")
    fwd = F.floor(
        (F.lead("close").over(w) / F.col("close") - 1.0) * 1000000.0 + F.lit(0.5)
    ).cast("long")
    melted = (
        b.select("symbol", "t", fwd.alias("fwd_m"), *_ONEBAR_NAMES)
        .where(F.col("fwd_m").isNotNull())
        .unpivot(["symbol", "t", "fwd_m"], _ONEBAR_NAMES, "pattern", "val")
        .where(F.col("val") != 0)
    )
    return (
        melted.groupBy(
            "pattern", F.when(F.col("val") > 0, 1).otherwise(-1).alias("signal")
        )
        .agg(
            F.count(F.lit(1)).alias("n_fires"),
            F.sum("fwd_m").alias("_sm"),
        )
        .select(
            "pattern",
            "signal",
            "n_fires",
            _r6_eff(
                F.col("_sm").cast("double") / 1000000.0 / F.col("n_fires")
            ).alias("avg_fwd_ret"),
        )
        .orderBy("pattern", "signal")
    )


_EFF_MELT = " UNION ALL ".join(
    f"SELECT symbol, t, '{n}' AS pattern, {n} AS val FROM patq WHERE {n} != 0"
    for n in _ONEBAR_NAMES
)

QUERIES["cdl_efficacy"] = cdl_efficacy
ORACLES["cdl_efficacy"] = _fr_eff(f"""
WITH patq AS ({ORACLES["cdl_onebar"]}),
fwd AS (
  SELECT symbol, t,
         CAST(FLOOR((LEAD(close) OVER (PARTITION BY symbol ORDER BY t) / close - 1.0)
                    * 1000000.0 + 0.5) AS BIGINT) AS fwd_m
  FROM ({BARS_CTE} SELECT symbol, t, close FROM bars) zz
),
melted AS (
  {_EFF_MELT}
)
SELECT m.pattern,
       CASE WHEN m.val > 0 THEN 1 ELSE -1 END AS signal,
       COUNT(*) AS n_fires,
       ROUND(CAST(SUM(f.fwd_m) AS DOUBLE) / 1000000.0 / COUNT(*), 6) AS avg_fwd_ret
FROM melted m JOIN fwd f ON f.symbol = m.symbol AND f.t = m.t
WHERE f.fwd_m IS NOT NULL
GROUP BY 1, 2
ORDER BY pattern, signal
""")


# Keep the driver's 50-slot capture window intact regardless of which query
# module was the import entry point (see queries.reorder_registration).
from polars_quant_spark.queries import reorder_registration as _ro  # noqa: E402

_ro()
