"""Run the driver-style oracle comparison with per-query timing.

Usage: python tests/run_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from polars_quant_spark.session import get_spark, released  # noqa: E402
from tests.harness import compare, duck_con  # noqa: E402

import __spark_entry__ as E  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("verify")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf)
    qs, oracles = E.queries(), E.oracle_sql()
    print(f"{len(qs)} queries, {len(oracles)} oracles", flush=True)
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # released(): the 394-query single-session sweep otherwise
            # accumulates persist-on-return pins (segmented/dedup ops);
            # compare()/count() fully consume the frame inside the block
            with released(spark):
                df = fn(spark, sf)
                if name in oracles:
                    errs = compare(df, con, oracles[name], name)
                else:
                    errs = None
                    nrows = df.count()
            if name in oracles:
                dt = time.time() - t0
                if errs:
                    fails += 1
                    print(f"FAIL {name} ({dt:.1f}s)", flush=True)
                    for e in errs[:4]:
                        print("   ", e, flush=True)
                else:
                    print(f"PASS {name} ({dt:.1f}s)", flush=True)
            else:
                print(f"ROWS {name} {nrows} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as ex:  # noqa: BLE001
            fails += 1
            print(f"ERROR {name} ({time.time() - t0:.1f}s) {ex!r}"[:400], flush=True)
    if not only:
        t0 = time.time()
        print("entry rows:", E.entry(spark).count(), f"({time.time() - t0:.1f}s)", flush=True)
    print("fails:", fails, flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
