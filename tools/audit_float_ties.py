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

Two detection passes (round 5 closed the alias blind spot ADVICE r4 called
out): the ADJACENCY pass flags comparisons textually next to an aggregate
call (`x > AVG(c) OVER w`); the ALIAS pass first collects every column
alias bound to a float-aggregate expression (`AVG(close) OVER w AS sma20`,
including aliases defined in an earlier CTE) and then flags comparisons
against those names (`close > sma20`, `s5 > s20`) — the form 3 of the 4
round-4 fixes actually used, which the adjacency pass cannot see.

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
  share). These are NOT silent: the INFO tier below enumerates every such
  query so that if the driver ever flips one, the triage (and the
  integer-surface rewrite template from mkt_breadth) is already written;
* degenerate-only guards (STDDEV > 0 flips only when the column is
  constant, which the driver data is not).

Usage: python tools/audit_float_ties.py           # exits 1 on NON-allowlisted hits
       python tools/audit_float_ties.py --info    # also print the INFO tier
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

# Float-aggregate expression bound to a column alias: `AVG(x) OVER w AS sma`,
# `SUM(ret) / COUNT(*) AS mean_ret`, with bounded paren nesting. The alias
# pass flags later comparisons against these names.
ALIAS_DEF = re.compile(
    rf"({AGG}\s*\((?:[^()]|\([^()]*\))*\)"
    rf"(?:\s*OVER\s*(?:\((?:[^()]|\([^()]*\))*\)|\w+))?)"
    rf"[^,\n]{{0,60}}?\bAS\s+([a-zA-Z_]\w*)",
    re.I,
)

# Names used in ROUND(...)-style output positions only; a comparison is a
# `<`/`>`/`<=`/`>=` with the alias on either side.
def _alias_cmp(alias: str) -> re.Pattern[str]:
    return re.compile(rf"(?:\b{alias}\b\s*[<>]=?|[<>]=?\s*\b{alias}\b)", re.I)


# Loose-by-design (INFO tier only): an aggregate call within the first
# ~200 chars of a ROUND/FLOOR output wrapper, unbalanced parens tolerated.
ROUND_OUT = re.compile(rf"(?:ROUND|FLOOR)\s*\(.{{0,200}}?{AGG}\s*\(", re.I | re.S)

# Queries my regexes flag whose comparisons are triaged SAFE. Every entry
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

# Alias-pass additions: comparisons against a float-aggregate ALIAS that are
# nonetheless deterministic. Same contract as ALLOW — reason required.
# (Most integer-sum aliases are cleared automatically by the int-name
# inference below; these are the cases the inference can't see.)
ALLOW_ALIAS: dict[str, str] = {
    "rel_q17_small_qty_revenue": "l_quantity < 0.2*AVG(l_quantity): "
    "quantities are small integer-valued doubles, so the per-partkey SUM is "
    "exact in any order (< 2^53); AVG = exact_sum/n and ×0.2 are single "
    "IEEE ops both engines execute identically — deterministic",
    "ind_kama_10": "vol := Σ|Δx| over the window with |Δx| ≥ 0; the only "
    "comparison is vol > 0, the non-negative-sum-vs-0 guard "
    "(order-insensitive)",
    "ind_adx_family_14": "str := AVG(tr) OVER warm-up seed with tr ≥ 0; "
    "str > 0 is the non-negative-sum guard; pdi/mdi feed ROUND'd outputs "
    "and the Wilder recursion (recursive-CTE twin), not flags",
    "ind_adx_seg_14": "same oracle SQL as ind_adx_family_14 verbatim "
    "(the segmented query reuses the DMI recursive-CTE twin) — same "
    "non-negative-sum str > 0 guard rationale",
    "ind_kama_seg_10": "same oracle SQL as ind_kama_10 verbatim (the "
    "segmented query reuses the KAMA recursive-CTE twin) — same "
    "non-negative Σ|Δx| vol > 0 guard rationale",
    "bars_pairs_spread": "sd := STDDEV_POP of integer micro-unit spreads; "
    "sd > 0 flips only if all 60 window values are identical (degenerate); "
    "z is a FLOOR-rounded output, not a filter",
    "events_burstiness": "sa/sb := Σ of inter-arrival gaps in integer "
    "microseconds (ts_us differences); the variance-positivity guards are "
    "integer-exact cross-multiplications",
    "rel_replenishment_cycle": "gap_days := integer day differences "
    "(date_diff); Σ and variance guards integer-exact",
    "bars_lead_lag": "rbl := LAG/LEAD of rb (micro-quantized BIGINT "
    "returns) at an integer offset k from unnest(range(...)) — shifted "
    "stored integers, so Σ(rbl) and the variance guards are integer-exact; "
    "the int-name inference can't see through the unnest(range()) offset",
}


# ---------------------------------------------------------------------------
# Integer-name inference: names bound to expressions that are integer by
# construction, so SUM(name)/variance-guard comparisons over them are exact
# in any accumulation order. Seeds: CAST(... AS BIGINT/INTEGER) AS name,
# COUNT(...) AS name, SUM(CASE WHEN ... THEN 1 ...) AS name, ±1/0 sign
# CASEs. A short fixpoint then propagates through SUM/LAG/ABS/+/-/* of
# already-integer names (no '/', no float literal). Conservative: an
# unknown identifier blocks the inference.
# ---------------------------------------------------------------------------

INT_SEEDS = [
    re.compile(r"AS\s+(?:BIGINT|INTEGER)\s*\)[^,\n]{0,40}?\bAS\s+(\w+)", re.I),
    re.compile(r"COUNT\s*\((?:[^()]|\([^()]*\))*\)\s*(?:OVER\s*(?:\([^()]*\)|\w+)\s*)?AS\s+(\w+)", re.I),
    re.compile(r"(?:ROW_NUMBER|RANK|DENSE_RANK|NTILE)\s*\([^)]*\)\s*OVER[^,\n]{0,80}?AS\s+(\w+)", re.I),
]

SQL_KEYWORDS = frozenset(
    """case when then else end null is not and or over partition by order rows
    between preceding current row following unbounded desc asc cast as bigint
    integer double sum count lag lead abs min max coalesce greatest least
    floor round avg filter where distinct select from in exists true false""".split()
)

IDENT = re.compile(r"[A-Za-z_]\w*")
OVER_CLAUSE = re.compile(r"\bOVER\s*(?:\((?:[^()]|\([^()]*\))*\)|\w+)", re.I)
QUALIFIER = re.compile(r"\b\w+\.")
NESTED = r"(?:[^()]|\((?:[^()]|\([^()]*\))*\))"
PROPAGATE = re.compile(
    rf"((?:SUM|LAG|LEAD|ABS|MIN|MAX|COALESCE|GREATEST|LEAST)\s*\({NESTED}*?\)"
    rf"(?:\s*OVER\s*(?:\((?:[^()]|\([^()]*\))*\)|\w+))?"
    rf"|[\w\s+*-]+?)\s+AS\s+(\w+)",
    re.I,
)
CASE_ALIAS = re.compile(
    rf"(?:(?:SUM|MIN|MAX)\s*\(\s*)?(CASE\s+WHEN{NESTED}*?\bEND)\s*\)?"
    rf"\s*(?:OVER\s*(?:\((?:[^()]|\([^()]*\))*\)|\w+)\s*)?AS\s+(\w+)",
    re.I,
)
CASE_BRANCH = re.compile(
    rf"\b(?:THEN|ELSE)\s+({NESTED}+?)(?=\s+WHEN\b|\s+ELSE\b|\s+END\b)", re.I | re.S
)


def _idents(expr: str) -> set[str]:
    expr = OVER_CLAUSE.sub(" ", expr)
    expr = QUALIFIER.sub("", expr)
    return {
        i.lower()
        for i in IDENT.findall(expr)
        if i.lower() not in SQL_KEYWORDS and not i.isdigit()
    }


def _float_free(expr: str) -> bool:
    return "/" not in expr and not re.search(r"\d\.\d|::\s*DOUBLE|AS\s+DOUBLE", expr, re.I)


def _int_names(sql: str) -> set[str]:
    names: set[str] = set()
    for seed in INT_SEEDS:
        names.update(m.group(1).lower() for m in seed.finditer(sql))
    for _ in range(4):  # fixpoint over chained aliases
        grew = False
        for m in PROPAGATE.finditer(sql):
            expr, name = m.group(1), m.group(2).lower()
            if name in names or not _float_free(expr):
                continue
            idents = _idents(expr)
            if idents and idents <= names:
                names.add(name)
                grew = True
        # CASE aliases (bare or inside SUM/MIN/MAX): integer iff every
        # THEN/ELSE branch value is integer-by-construction or a literal int
        for m in CASE_ALIAS.finditer(sql):
            body, name = m.group(1), m.group(2).lower()
            if name in names:
                continue
            branches = CASE_BRANCH.findall(body)
            if not branches:
                continue
            ok = True
            for b in branches:
                if b.strip().upper() == "NULL":
                    continue
                if not _float_free(b):
                    ok = False
                    break
                bi = _idents(b)
                if bi and not bi <= names:
                    ok = False
                    break
            if ok:
                names.add(name)
                grew = True
        if not grew:
            break
    return names


def _int_sum(span: str) -> bool:
    """SUM over an already-integer expression is exact — skip."""
    if not re.search(r"SUM\s*\(", span, re.I):
        return False
    return bool(
        INT_ARG.search(span)
        or re.search(r"SUM\s*\(\s*CASE\s+WHEN[^)]*THEN\s+1\b", span, re.I)
    )


def risky_spans(sql: str) -> list[str]:
    """ADJACENCY pass: comparisons textually next to an aggregate call."""
    out = []
    for m in list(CMP_AFTER.finditer(sql)) + list(CMP_BEFORE.finditer(sql)):
        start = max(0, m.start() - 60)
        span = sql[start : m.end() + 80].replace("\n", " ")
        tail = sql[m.start() : m.end() + 40]
        if _int_sum(tail):
            continue
        out.append(span.strip())
    return out


def alias_spans(sql: str) -> list[str]:
    """ALIAS pass: comparisons against a name bound to a float aggregate
    anywhere earlier in the statement (CTE-crossing by construction, since
    the whole statement is scanned as one string)."""
    out = []
    ints = _int_names(sql)
    for dm in ALIAS_DEF.finditer(sql):
        expr, alias = dm.group(1), dm.group(2)
        if _int_sum(expr):
            continue
        if alias.lower() in ints:
            continue  # integer-by-construction (seeded or inferred) — exact
        if re.match(r"SUM\s*\(", expr, re.I) and _float_free(expr):
            idents = _idents(re.sub(r"^SUM\s*\(", "", expr, flags=re.I))
            if idents and idents <= ints:
                continue  # SUM over integer-by-construction names — exact
        cmp_re = _alias_cmp(alias)
        for cm in cmp_re.finditer(sql):
            # skip hits inside the defining expression itself
            if dm.start() <= cm.start() < dm.end():
                continue
            start = max(0, cm.start() - 60)
            span = sql[start : cm.end() + 60].replace("\n", " ")
            out.append(f"[alias {alias} := {expr[:60]}] {span.strip()}")
    return out


def info_round_outputs(sql: str) -> int:
    """INFO tier: float aggregates feeding ROUND/FLOOR-rounded OUTPUT
    columns — triaged safe repo-wide (see module docstring) but enumerated
    so a future driver flip has its candidate list ready."""
    return len(ROUND_OUT.findall(sql))


def audit() -> dict[str, list[str]]:
    """All flagged queries (allowlisted or not) → offending spans."""
    import __spark_entry__ as E

    res: dict[str, list[str]] = {}
    for n, q in E.oracle_sql().items():
        spans = risky_spans(q) + alias_spans(q)
        if spans:
            res[n] = spans
    return res


def info_tier() -> dict[str, int]:
    import __spark_entry__ as E

    return {
        n: c
        for n, c in ((n, info_round_outputs(q)) for n, q in E.oracle_sql().items())
        if c
    }


def main() -> int:
    findings = audit()
    allowed = {**ALLOW, **ALLOW_ALIAS}
    bad = {n: s for n, s in findings.items() if n not in allowed}
    stale = [n for n in allowed if n not in findings]
    for name, spans in bad.items():
        print(f"== NOT ALLOWLISTED: {name}")
        for s in spans[:6]:
            print("   ", s[:160])
    if stale:
        print(f"stale allowlist entries (no longer flagged): {stale}")
    if "--info" in sys.argv:
        info = info_tier()
        print(f"-- INFO tier: {len(info)} queries with ROUND'd float-agg outputs")
        for n, c in sorted(info.items()):
            print(f"   INFO {n}: {c} rounded float-agg output(s)")
    print(f"{len(findings)} flagged, {len(bad)} not allowlisted, of {len(findings)} total")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
