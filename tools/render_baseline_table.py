"""Render BASELINE.md's parity table from docs/BENCH_VS_DUCKDB.json.

One-command regeneration (VERDICT r10 #5): run the committed protocol,
then render —

    python tools/bench_vs_duckdb.py          # writes docs/BENCH_VS_DUCKDB.json
    python tools/render_baseline_table.py    # prints the markdown table

Paste the output over BASELINE.md's table block; the JSON artifact stays
committed next to it so the numbers are auditable without scrollback.
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

NOTES = {
    "indicators_rec": "recursive CTEs",
    "backtest": "recursive-CTE fold",
}


def main() -> None:
    with open(os.path.join(ROOT, "docs", "BENCH_VS_DUCKDB.json")) as f:
        data = json.load(f)
    print("| query | Spark | DuckDB | ratio |")
    print("|---|---|---|---|")
    for r in data["rows"]:
        name, s = r["query"], r["spark_s"]
        if r["duckdb_s"] is None:
            note = NOTES.get(name, "no sane SQL form")
            print(f"| {name} | {s:.2f} s | n/a ({note}) | **≪1× — Spark faster** |")
            continue
        d, ratio = r["duckdb_s"], r["ratio"]
        flag = f" | **{ratio}× — Spark faster**" if ratio < 1 else f" | {ratio}×"
        print(f"| {name} | {s:.2f} s | {d:.2f} s{flag} |")
    sm = data["summary"]
    print(
        f"| **comparable subset aggregate** | **{sm['comparable_spark_s']} s** "
        f"| **{sm['comparable_duckdb_s']} s** | **{sm['comparable_ratio']}×** |"
    )


if __name__ == "__main__":
    main()
