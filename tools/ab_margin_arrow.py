"""Interleaved same-session A/B of the margin fold's Arrow vs pandas arms
at a replica decade (round-14 §4b landing evidence, VERDICT r13 #3).

Runs ``bt_margin_curve`` alternately on the applyInArrow default and with
``backtest.margin._FORCE_PANDAS_ARM = True`` (the applyInPandas spec arm),
warm best-of-N per arm, noop sink, arms interleaved a,p,a,p,... so box
drift cancels — the same protocol as tools/ab_segmented_arrow.py.

The replica is EVENTS-ONLY (bt_margin_curve reads only the bars view,
which derives from events.parquet): the verbatim events arm of
``tools/scale_smoke.build`` — per-symbol histories extended N×, ts
shifted past the original range — written to ``.scratch/events{N}x``
(gitignored, reused unless --rebuild). Run 1024× under the smoke heap
(``SPARK_DRIVER_MEMORY=48g``, optionally ``SPARK_GRAFT_XMS=48g``).

Usage::

    SPARK_DRIVER_MEMORY=48g python tools/ab_margin_arrow.py [N] [reps] [--rebuild]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from polars_quant_spark.backtest import margin as margin_mod  # noqa: E402
from polars_quant_spark.session import get_spark, released  # noqa: E402
from polars_quant_spark.sources.bars import load_table, ts_us_expr  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_events_only(spark, n: int, out: str) -> None:
    """Verbatim events arm of tools/scale_smoke.build: replicas extend each
    symbol's bar history N× (ts shifted past the original range), the
    skew-adversarial axis for a group-serial fold."""
    os.makedirs(out, exist_ok=True)
    rep = F.broadcast(spark.range(n).select(F.col("id").alias("_r")))
    ev0 = load_table(spark, SF_DIR, "events")
    ev = ev0.withColumn("_ts_us", ts_us_expr(ev0))
    lo, hi = ev.agg(F.min("_ts_us"), F.max("_ts_us")).first()
    span_us = (hi - lo) + 3_600_000_000  # +1h gap between replicas
    ev.crossJoin(rep).select(
        (F.col("event_id") + F.col("_r") * F.lit(1_000_000_000)).alias("event_id"),
        F.timestamp_micros(F.col("_ts_us") + F.col("_r") * F.lit(span_us)).alias("ts"),
        *[c for c in ev0.columns if c not in ("event_id", "ts")],
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1024
    reps = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 2
    rebuild = "--rebuild" in sys.argv
    out = os.path.join(REPO, ".scratch", f"events{n}x")
    spark = get_spark("ab-margin-arrow")
    spark.sparkContext.setLogLevel("ERROR")
    if rebuild and os.path.exists(out):
        shutil.rmtree(out)
    if not os.path.exists(os.path.join(out, "events.parquet")):
        build_events_only(spark, n, out)

    from polars_quant_spark.queries import QUERIES  # noqa: E402

    fn = QUERIES["bt_margin_curve"]
    # one untimed warmup rep (arrow arm) to warm JIT/page cache
    with released(spark):
        fn(spark, out).write.format("noop").mode("overwrite").save()
    times: dict[str, list[float]] = {"arrow": [], "pandas": []}
    for r in range(reps):
        for arm in ("arrow", "pandas"):
            margin_mod._FORCE_PANDAS_ARM = arm == "pandas"
            try:
                spark.sparkContext.setJobDescription(f"bt_margin_curve:{arm}:{r}")
                t0 = time.time()
                with released(spark):
                    fn(spark, out).write.format("noop").mode("overwrite").save()
                times[arm].append(round(time.time() - t0, 2))
            finally:
                margin_mod._FORCE_PANDAS_ARM = False
                spark.sparkContext.setJobDescription(None)
            print(json.dumps({"arm": arm, "rep": r, "s": times[arm][-1]}), flush=True)
    print(
        json.dumps(
            {
                "query": "bt_margin_curve",
                "scale": n,
                "reps": reps,
                "arrow": times["arrow"],
                "pandas": times["pandas"],
                "arrow_best": min(times["arrow"]),
                "pandas_best": min(times["pandas"]),
                "speedup_best": round(min(times["pandas"]) / min(times["arrow"]), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
