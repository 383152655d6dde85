"""Time the SPARK side of every declared query (no oracle) at a given SF.

The correctness harness times Spark+DuckDB together; this isolates the
engine so slow outliers in the declared surface are visible. Each query
runs once through the noop sink (cold, no best-of — we're hunting order-
of-magnitude outliers, not benchmarking).

Usage::

    python tools/time_all.py [sf_dir]        # default /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from polars_quant_spark.session import get_spark, released  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("time-all")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    out = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            # released(): persist-on-return operators (segmented, dedup,
            # token-edit) otherwise accumulate pins across the 394-query
            # single-session sweep (VERDICT r11 #7); each query is fully
            # consumed by the noop sink inside the block
            with released(spark):
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 2)
        except Exception:
            out[name] = None
            traceback.print_exc()
        print(json.dumps({name: out[name]}), flush=True)
    ok = {k: v for k, v in out.items() if v is not None}
    top = sorted(ok.items(), key=lambda kv: -kv[1])[:15]
    print(json.dumps({"sf_dir": sf_dir, "n": len(out), "total_s": round(sum(ok.values()), 1), "slowest": top}))


if __name__ == "__main__":
    main()
