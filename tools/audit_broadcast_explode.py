"""Audit: find joins whose BROADCAST side contains an explode.

The round-7 64× scale run caught the bootstrap's probes↔prefix join
OOMing because Catalyst's size estimate does not grow through Generate
(explode) nodes: a frame that fans out from a tiny aggregate keeps its
tiny estimate, wins the broadcast, and dies when the real row count
scales with the data. That signature — a BroadcastExchange whose subtree
contains a Generate — is mechanically detectable in the plan tree, so
this tool scans EVERY registered query's physical plan and flags the
pattern for human review (a flagged plan is not automatically wrong: an
explode of a bounded array over a fixed-size frame is fine; an explode
that scales with the fact table is the bug).

Usage::

    python tools/audit_broadcast_explode.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from polars_quant_spark.session import get_spark  # noqa: E402

import __spark_entry__ as E  # noqa: E402


def _indent(line: str) -> int:
    """Tree depth of a simple-mode plan line (':'/'+'/'-'/' ' prefix)."""
    i = 0
    while i < len(line) and line[i] in " :+-*(":
        i += 1
    return i


def broadcast_explode_sites(plan: str) -> list[str]:
    """Return flagged BroadcastExchange lines whose subtree (deeper
    indentation until the tree pops back) contains either dangerous shape:

    * a ``Generate`` (explode) node — the r7 bootstrap signature: size
      estimates do not grow through Generate, so a fanned-out frame keeps
      a tiny estimate and wins the broadcast; or
    * a ``localCheckpoint``/RDD scan (``Scan ExistingRDD``) — the r8
      pagerank blind spot: checkpointing TRUNCATES lineage, so whatever
      scale-with-data pipeline produced the frame is invisible to the
      first signature, while a forced hint (or a stale estimate) can
      still broadcast it inside an iterative operator.
    """
    lines = plan.splitlines()
    flagged = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        d = _indent(ln)
        for nxt in lines[i + 1 :]:
            nd = _indent(nxt)
            if nxt.strip() and nd <= d:
                break
            if "Generate" in nxt:
                flagged.append("[explode] " + ln.strip()[:100])
                break
            if "Scan ExistingRDD" in nxt or "LogicalRDD" in nxt:
                flagged.append("[checkpoint] " + ln.strip()[:100])
                break
    return flagged


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("audit-bx")
    spark.sparkContext.setLogLevel("ERROR")
    hits = {}
    for name, fn in E.queries().items():
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
            sites = broadcast_explode_sites(plan)
            if sites:
                hits[name] = sites
                print(f"FLAG {name}: {len(sites)} site(s)", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR {name}: {ex!r}"[:200], flush=True)
    print(f"\n{len(hits)} flagged of {len(E.queries())}")
    for k, v in hits.items():
        print(f"  {k}: {v[0]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
