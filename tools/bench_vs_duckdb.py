"""Reproducible Spark-vs-DuckDB parity protocol for the bench queries.

Times each bench entry on Spark (noop sink, same session/config as
bench.py) and its oracle-SQL counterpart(s) on DuckDB (fetchall), strictly
back-to-back and best-of-N on BOTH engines, so ambient load hits both sides
equally. BASELINE.md's parity table is regenerated from this output — do
not hand-edit its numbers.

DuckDB sides:
* most bench entries map to one declared oracle (emb_cosine_topk,
  cdl_all_patterns, doc_text_stats, ...);
* ``indicators_expr`` has no single twin — it times the individual
  indicator oracles that cover the same 15-op set (DuckDB rescans per
  statement; that is how a SQL engine would run them);
* ``indicators_rec`` / ``backtest`` have recursive-CTE twins that take
  >120 s / have no sane SQL form — reported as None and excluded from the
  comparable subset, as in BASELINE.md.

Usage::

    python tools/bench_vs_duckdb.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from polars_quant_spark.queries import ORACLES  # noqa: E402
from polars_quant_spark.session import get_spark, released  # noqa: E402
from tests.harness import duck_con  # noqa: E402

# bench entry -> list of oracle names whose SQL covers the same work
DUCK_TWINS: dict[str, list[str] | None] = {
    "q1": ["rel_q1_pricing_summary"],
    "q3": ["rel_q3_shipping_priority"],
    "q5": ["rel_q5_region_revenue"],
    "events_daily": ["agg_events_daily"],
    "indicators_expr": [
        "ind_sma_20", "ind_wma_10", "ind_midpoint_midprice_14",
        "ind_bbands_20", "ind_mom_roc_10", "ind_willr_14", "ind_cmo_14",
        "ind_ultosc", "ind_mfi_14", "ind_bop", "price_transforms",
        "vol_ad_obv",
    ],
    "indicators_chunked": ["ind_chunked_expr"],
    "indicators_rec": None,  # recursive CTEs, >120 s — not comparable
    "patterns": ["cdl_all_patterns"],
    "backtest": None,  # no sane SQL form
    "dedup_minhash": ["doc_minhash_pairs"],
    "ann_topk": ["emb_cosine_topk"],
    "text_stats": ["doc_text_stats"],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("bench-vs-duckdb")
    spark.sparkContext.setLogLevel("ERROR")
    cache = bench._relayout_cache(spark, sf_dir)
    total_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(cache)
        for f in fs
    )
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(8, min(4096, total_bytes // (64 * 1024 * 1024)))),
    )
    con = duck_con(sf_dir)

    rows = []
    spark_subset = duck_subset = 0.0
    for name, fn in bench.BENCH.items():
        # warm both sides once, then best-of-N back-to-back; released()
        # drops the pins persist-on-return operators (dedup_minhash et al.)
        # leave behind, so the census memory profile stays flat across
        # queries (VERDICT r11 #7)
        with released(spark):
            bench._force(fn(spark, cache))
        twins = DUCK_TWINS.get(name)
        if twins:
            for t in twins:
                con.execute(ORACLES[t]).fetchall()
        s_best = d_best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            with released(spark):
                bench._force(fn(spark, cache))
            s_best = min(s_best, time.time() - t0)
            if twins:
                t0 = time.time()
                for t in twins:
                    con.execute(ORACLES[t]).fetchall()
                d_best = min(d_best, time.time() - t0)
        duck = round(d_best, 3) if twins else None
        ratio = round(s_best / d_best, 2) if twins else None
        rows.append(
            {"query": name, "spark_s": round(s_best, 3), "duckdb_s": duck, "ratio": ratio}
        )
        if twins:
            spark_subset += s_best
            duck_subset += d_best
        print(json.dumps(rows[-1]), flush=True)

    summary = {
        "sf_dir": sf_dir,
        "reps": reps,
        "comparable_spark_s": round(spark_subset, 2),
        "comparable_duckdb_s": round(duck_subset, 2),
        "comparable_ratio": round(spark_subset / duck_subset, 2),
    }
    print(json.dumps(summary))

    # Persist the full protocol output so BASELINE.md's parity table is
    # regenerated from a committed artifact, not a scrollback paste
    # (VERDICT r10 #5). Overwritten on every run; commit alongside any
    # BASELINE.md table refresh.
    out_path = os.path.join(REPO, "docs", "BENCH_VS_DUCKDB.json")
    with open(out_path, "w") as fh:
        json.dump({"summary": summary, "rows": rows}, fh, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
