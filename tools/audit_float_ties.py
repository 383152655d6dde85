"""Audit the oracle surface for float-tie-sensitive comparisons.

The class that broke mkt_breadth in round 3: a discrete flag or filter
(`CASE WHEN x > agg`, `WHERE x >= agg`) whose right side is an
association-order-sensitive float aggregate — `AVG/SUM/STDDEV/VAR(double)
OVER w` or a grouped AVG/SUM of doubles. Spark's bounded-frame recompute
and DuckDB's segment-tree accumulation can differ in the last ulp, so a
value sitting exactly on the boundary flips sides between engines and the
driver hash diverges even though both engines are "right". Round-4 fixes
re-expressed every such comparison as cross-multiplied INTEGER micro-unit
sums (mkt_breadth, the 5/20 crossover signal family, the Selector MA
screens).

NOT in the class (deterministic; allowlisted below with reasons):
* comparisons of two raw stored doubles (LAG/LEAD/MIN/MAX/LEAST/GREATEST
  reproduce a stored value bit-exactly in any order);
* recursive-CTE state (both engines execute the same sequential FP ops);
* integer aggregates (COUNT, SUM of ints / cents / micro-quantized longs);
* a sum of NON-NEGATIVE terms compared to 0 (zero iff every term is zero —
  order-insensitive);
* aggregates only feeding ROUND'd *output* columns (a last-ulp drift there
  needs the value to sit exactly on a 1e-6 FLOOR-round boundary of a
  continuous measure — the repo-wide rounding convention both engines
  share);
* degenerate-only guards (STDDEV > 0 flips only when the column is
  constant, which the driver data is not).

Usage: python tools/audit_float_ties.py   # exits 1 on NON-allowlisted hits
pytest gate: tests/test_float_tie_audit.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

AGG = r"(?:AVG|STDDEV(?:_POP|_SAMP)?|VAR(?:_POP|_SAMP)?|SUM|CORR|COVAR(?:_POP|_SAMP)?|REGR_[A-Z]+)"

CMP_AFTER = re.compile(rf"[<>]=?\s*{AGG}\s*\(", re.I)
CMP_BEFORE = re.compile(
    rf"{AGG}\s*\(([^()]|\([^()]*\))*\)(\s+OVER\s+[\w(]+[^<>=!]*)?\s*[<>]=?", re.I
)

INT_ARG = re.compile(r"\(\s*(?:q[a-z_]+|CAST\s*\(\s*FLOOR|COUNT|1\b|[a-z_]*cnt|[a-z_]*_n\b)", re.I)

# Queries my regex flags whose comparisons are triaged SAFE. Every entry
# carries the reason; a new query that introduces a float-agg comparison
# must either quantize it or argue its way in here.
ALLOW: dict[str, str] = {
    "factor_fama_macbeth": "STDDEV_SAMP(b) > 0 guard — flips only if every "
    "periodic slope is identical (degenerate, not driver data); outputs are "
    "ROUND'd means/t-stats, not flags",
    "clean_winsor_zscore": "winsor clamp LEAST/GREATEST against QUANTILE_CONT "
    "bounds and (x-mu)/sd z-scores feed continuous ROUND'd outputs only — a "
    "last-ulp drift moves the output by ~1 ulp, absorbed by FLOOR-round; no "
    "discrete flag derives from the comparison",
    "ind_cmo_14": "SUM(ups)+SUM(downs) = 0 guard: terms are non-negative, so "
    "the sum is 0 iff all terms are 0 — order-insensitive",
    "ind_mfi_14": "same non-negative-sum-vs-0 guard as CMO",
    "ind_chunked_expr": "same non-negative-sum-vs-0 RSI/CMO guard inside the "
    "chunked twin",
    "ind_vortex_14": "SUM(tr) OVER w > 0 with tr >= 0 — order-insensitive",
    "vol_cmf_20": "SUM(volume) OVER w > 0 with volume >= 0 — order-insensitive",
    "ind_choppiness_14": "MAX(high) > MIN(low) compares raw stored values; "
    "SUM(tr) > 0 is the non-negative-sum guard",
    "rel_customer_concentration": "rev is SUM of BIGINT cents; the top-1% cut "
    "is integer cross-multiplication r*100 <= n — all integer-exact",
    "rel_q18_large_orders": "HAVING SUM(l_quantity) > 150: quantities are "
    "small integers stored as doubles; integer-valued double sums are exact "
    "in any association order below 2^53",
    "doc_token_budget": "SUM(n_tokens) cumulative cut — integer tokens",
    "stream_source_quota": "SUM(n_tokens) quota cut — integer tokens",
    "events_slo_burn": "windowed SUMs of integer counts",
    "doc_bloom_filter": "COUNT(*) - SUM(is_true) > 0 — integer flags",
    "rel_abc_analysis": "cumulative SUM(rev_cents) — integer cents",
    "ops_bucketed_sma": "AVG feeds the FLOOR-ROUND'd output column directly; "
    "no comparison/flag derives from it (repo-wide rounding convention)",
}


def risky_spans(sql: str) -> list[str]:
    out = []
    for m in list(CMP_AFTER.finditer(sql)) + list(CMP_BEFORE.finditer(sql)):
        start = max(0, m.start() - 60)
        span = sql[start : m.end() + 80].replace("\n", " ")
        tail = sql[m.start() : m.end() + 40]
        # SUM over an already-integer expression is exact — skip.
        if re.search(r"SUM\s*\(", tail, re.I) and INT_ARG.search(tail):
            continue
        if re.search(r"SUM\s*\(\s*CASE\s+WHEN[^)]*THEN\s+1\b", tail, re.I):
            continue  # conditional count — integer
        out.append(span.strip())
    return out


def audit() -> dict[str, list[str]]:
    """All flagged queries (allowlisted or not) → offending spans."""
    import __spark_entry__ as E

    return {n: s for n, s in ((n, risky_spans(q)) for n, q in E.oracle_sql().items()) if s}


def main() -> int:
    findings = audit()
    bad = {n: s for n, s in findings.items() if n not in ALLOW}
    stale = [n for n in ALLOW if n not in findings]
    for name, spans in bad.items():
        print(f"== NOT ALLOWLISTED: {name}")
        for s in spans[:6]:
            print("   ", s[:160])
    if stale:
        print(f"stale allowlist entries (no longer flagged): {stale}")
    print(f"{len(findings)} flagged, {len(bad)} not allowlisted, of {len(audit())} total")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
