"""Pin sf0.001 result fingerprints for every registered query (VERDICT r6 #3).

Runs each __spark_entry__ query Spark-only at sf0.001, fingerprints the
result (tools/golden_hashes.py — dtype-faithful, order-insensitive) and
writes golden/query_hashes_sf0.001.json. tests/test_golden_hashes.py
re-derives the fingerprints and fails on any drift, giving every
rotated-OUT-of-the-driver-window query a cheap regression lock: a semantic
change fails CI the round it is introduced instead of waiting for the next
full DuckDB harness sweep.

Regenerate (and eyeball the diff — every changed hash must be an INTENDED
semantics change) whenever a query's output legitimately changes:

    python tools/make_golden_hashes.py

Wall-clock: Spark-side only, no DuckDB, ~4 min on local[32].
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from polars_quant_spark.session import get_spark  # noqa: E402
from tools.golden_hashes import fingerprint  # noqa: E402

import __spark_entry__ as E  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
OUT = "golden/query_hashes_sf0.001.json"


def main() -> int:
    only = set(sys.argv[1:])
    spark = get_spark("golden-hashes")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        old = json.load(open(OUT))
    except FileNotFoundError:
        old = {}
    out = dict(old) if only else {}
    fails = 0
    t_all = time.time()
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            out[name] = fingerprint(fn(spark, SF_DIR))
            mark = (
                "NEW"
                if name not in old
                else ("SAME" if old[name] == out[name] else "CHANGED")
            )
            print(f"{mark:7s} {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as ex:  # noqa: BLE001
            fails += 1
            print(f"ERROR  {name} {ex!r}"[:300], flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"wrote {OUT}: {len(out)} queries in {time.time() - t_all:.0f}s, "
        f"{fails} errors",
        flush=True,
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
