"""Skewed-symbol scale smoke: one fat symbol holding 50% of all rows.

The even-replica smoke (tools/scale_smoke.py) grows every symbol's history
uniformly; this one builds the PATHOLOGICAL window-partitioning case — a
universe where a single symbol owns half the corpus — and measures the
bounded-lookback indicator chain three ways:

* ``plain``   — ``Window.partitionBy(symbol)``: the fat symbol is ONE task,
  the wall clock is its serial scan regardless of cluster size;
* ``chunked`` — ``with_chunked_windows``: (symbol, block) halo chunks lift
  the fat symbol onto #blocks tasks (bit-identical output, proved by the
  ``ind_chunked_expr`` oracle);
* ``auto``    — ``auto_chunk_windows``: must pick chunked here (max
  rows-per-key ≫ threshold) and plain on the even base data.

Build: 'click' is replicated ``4n`` times, every other symbol ``n`` times
(ts shifted past the original range per replica, same scheme as
scale_smoke), so click = 4n·B/(4n·B + 4n·B) = 50% of rows exactly when the
base has 5 equal symbols of B rows.

Usage::

    python tools/skew_smoke.py [n] [--rebuild]   # default n=4

Writes parquet under ``.scratch/skew{n}/`` (gitignored) and prints one
JSON line; the measured crossover documents AUTO_CHUNK_THRESHOLD
(operators/chunked.py) and feeds docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from polars_quant_spark.functions import momentum as mo  # noqa: E402
from polars_quant_spark.functions import overlap as ov  # noqa: E402
from polars_quant_spark.operators.chunked import (  # noqa: E402
    auto_chunk_windows,
    with_chunked_windows,
)
from polars_quant_spark.session import get_spark  # noqa: E402
from polars_quant_spark.sources.bars import bars, load_table, ts_us_expr  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FAT = "click"


def build(spark, n: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    ev0 = load_table(spark, SF_DIR, "events")
    ev = ev0.withColumn("_ts_us", ts_us_expr(ev0))
    lo, hi = ev.agg(F.min("_ts_us"), F.max("_ts_us")).first()
    span_us = (hi - lo) + 3_600_000_000
    reps = F.when(F.col("event_type") == FAT, F.lit(4 * n)).otherwise(F.lit(n))
    fan = F.explode(F.sequence(F.lit(0).cast("long"), (reps - 1).cast("long"))).alias(
        "_r"
    )
    ev.select("*", fan).select(
        (F.col("event_id") + F.col("_r") * F.lit(1_000_000_000)).alias("event_id"),
        F.timestamp_micros(F.col("_ts_us") + F.col("_r") * F.lit(span_us)).alias("ts"),
        *[c for c in ev0.columns if c not in ("event_id", "ts")],
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")


def _builders():
    def bb(i):
        return lambda w: ov.bbands("close", 20, 2, 2, w)[i]

    return {
        "sma": lambda w: ov.sma("close", 20, w),
        "wma": lambda w: ov.wma("close", 10, w),
        "midpoint": lambda w: ov.midpoint("close", 14, w),
        "midprice": lambda w: ov.midprice("high", "low", 14, w),
        "bb_up": bb(0),
        "bb_lo": bb(2),
        "mom": lambda w: mo.mom("close", 10, w),
        "roc": lambda w: mo.roc("close", 10, w),
        "willr": lambda w: mo.willr("high", "low", "close", 14, w),
        "cmo": lambda w: mo.cmo("close", 14, w),
        "ultosc": lambda w: mo.ultosc("high", "low", "close", 7, 14, 28, w),
        "mfi": lambda w: mo.mfi("high", "low", "close", "volume", 14, w),
    }


def _plain(b):
    w = Window.partitionBy("symbol").orderBy("t")
    return b.select("*", *[fn(w).alias(k) for k, fn in _builders().items()])


def _chunked(b):
    return with_chunked_windows(b, _builders(), lookback=28, chunk=4096)


def _auto(b, max_rows: int):
    return auto_chunk_windows(
        b, _builders(), lookback=28, chunk=4096, max_rows_per_key=max_rows
    )


def best2(df_fn) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        df_fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4
    rebuild = "--rebuild" in sys.argv
    out = os.path.join(REPO, ".scratch", f"skew{n}")
    spark = get_spark("skew-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    if rebuild and os.path.exists(out):
        shutil.rmtree(out)
    if not os.path.exists(os.path.join(out, "events.parquet")):
        build(spark, n, out)

    results: dict[str, dict] = {}
    for tag, sf_dir in [("even_base", SF_DIR), ("skewed", out)]:
        b = bars(spark, sf_dir)
        per_key = {
            r["symbol"]: r["count"]
            for r in b.groupBy("symbol").count().collect()
        }
        mx, total = max(per_key.values()), sum(per_key.values())
        auto_picked = "chunked" if mx > 100_000 else "plain"
        results[tag] = {
            "rows": total,
            "max_rows_per_key": mx,
            "fat_share": round(mx / total, 3),
            "plain_s": best2(lambda: _plain(b)),
            "chunked_s": best2(lambda: _chunked(b)),
            "auto_s": best2(lambda: _auto(b, mx)),
            "auto_picks": auto_picked,
        }
        r = results[tag]
        r["chunked_speedup"] = round(r["plain_s"] / r["chunked_s"], 2)
        print(json.dumps({tag: r}), flush=True)
    print(json.dumps({"metric": "skew_smoke", "n": n, "queries": results}))


if __name__ == "__main__":
    main()
