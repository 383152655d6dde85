"""Interleaved same-session A/B of the fused multi-indicator family sweep
(round-14, VERDICT r13 #5) vs composing the four per-op segmented calls.

Shape under test: the combined multi-indicator request — RSI(14) +
ATR(14) + the DMI/ADX(14) family + T3(5) over the bars table. The per-op
composition pays 4 base checkpoints, 4 max(_rn) actions, 4 x n_segments
group passes and 4 join-backs; ``indicator_family_segmented`` pays ONE of
each (per-chain (p, alpha) sweep). Bit-equality between the two is pinned
in tests/test_segmented.py; this tool is the wall-clock evidence. Arms
interleaved f,p,f,p,... so box drift cancels; noop sink; warm best-of-N.

Usage::

    python tools/ab_family_sweep.py [sf_dir] [reps] [segment_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from polars_quant_spark.session import get_spark, released  # noqa: E402
from polars_quant_spark.sources.bars import bars  # noqa: E402
from polars_quant_spark.operators.segmented import (  # noqa: E402
    adx_family_segmented,
    atr_segmented,
    indicator_family_segmented,
    rsi_segmented,
    t3_segmented,
)

OUT_COLS = [
    "rsi", "atr", "plus_dm", "minus_dm", "plus_di", "minus_di",
    "dx", "adx", "adxr", "t3",
]


def per_op(b, segment_rows):
    out = rsi_segmented(b, "close", 14, out="rsi", segment_rows=segment_rows)
    out = atr_segmented(out, p=14, out="atr", segment_rows=segment_rows)
    out = adx_family_segmented(out, p=14, segment_rows=segment_rows)
    out = t3_segmented(out, "close", 5, out="t3", segment_rows=segment_rows)
    return out.select("symbol", "t", *OUT_COLS)


def fused(b, segment_rows):
    return indicator_family_segmented(b, segment_rows=segment_rows).select(
        "symbol", "t", *OUT_COLS
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    seg_rows = sys.argv[3] if len(sys.argv) > 3 else "auto"
    if seg_rows != "auto":
        seg_rows = int(seg_rows)
    spark = get_spark("ab-family-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    b = bars(spark, sf_dir)
    arms = {"fused": fused, "per_op": per_op}
    # one untimed warmup rep (fused arm) to warm JIT/page cache
    with released(spark):
        fused(b, seg_rows).write.format("noop").mode("overwrite").save()
    times: dict[str, list[float]] = {a: [] for a in arms}
    for r in range(reps):
        for arm, build in arms.items():
            spark.sparkContext.setJobDescription(f"family:{arm}:{r}")
            t0 = time.time()
            with released(spark):
                build(b, seg_rows).write.format("noop").mode("overwrite").save()
            times[arm].append(round(time.time() - t0, 2))
            spark.sparkContext.setJobDescription(None)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "reps": reps,
                "segment_rows": seg_rows,
                "fused": times["fused"],
                "per_op": times["per_op"],
                "fused_best": min(times["fused"]),
                "per_op_best": min(times["per_op"]),
                "speedup": round(min(times["per_op"]) / min(times["fused"]), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
