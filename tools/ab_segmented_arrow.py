"""Interleaved same-session A/B of the segmented sweeps' Arrow vs pandas
arms (round-13 §6.4 landing evidence).

Runs each named query alternately on the applyInArrow default and with
``segmented._FORCE_PANDAS_ARM = True`` (the applyInPandas spec arm), warm
best-of-N per arm, noop sink, arms interleaved a,p,a,p,... so box drift
cancels.

Usage::

    python tools/ab_segmented_arrow.py [sf_dir] [reps] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from polars_quant_spark.session import get_spark, released  # noqa: E402
from polars_quant_spark.operators import segmented as seg_mod  # noqa: E402

QUERIES = ["ind_rsi_seg_14", "ind_atr_seg_14", "ind_adx_seg_14", "ind_t3_seg_5"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    queries = sys.argv[3:] or QUERIES
    spark = get_spark("ab-segmented-arrow")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    results = {}
    for name in queries:
        fn = qs[name]
        # one untimed warmup rep (arrow arm) to warm JIT/page cache
        with released(spark):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times = {"arrow": [], "pandas": []}
        for r in range(reps):
            for arm in ("arrow", "pandas"):
                seg_mod._FORCE_PANDAS_ARM = arm == "pandas"
                try:
                    spark.sparkContext.setJobDescription(f"{name}:{arm}:{r}")
                    t0 = time.time()
                    with released(spark):
                        fn(spark, sf_dir).write.format("noop").mode(
                            "overwrite"
                        ).save()
                    times[arm].append(round(time.time() - t0, 2))
                finally:
                    seg_mod._FORCE_PANDAS_ARM = False
                    spark.sparkContext.setJobDescription(None)
        results[name] = {
            "arrow": times["arrow"],
            "pandas": times["pandas"],
            "arrow_best": min(times["arrow"]),
            "pandas_best": min(times["pandas"]),
        }
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "results": results}))


if __name__ == "__main__":
    main()
