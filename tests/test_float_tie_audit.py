"""Regression gate for the float-tie comparison class (r3 mkt_breadth bug).

Every oracle whose SQL compares a value against an association-order-
sensitive float aggregate — whether textually adjacent (`x > AVG(c) OVER w`)
or through a column ALIAS bound to the aggregate (`close > sma20`, the form
the r4 ADVICE flagged as the audit's blind spot) — must either quantize the
comparison to integer micro-units (the repo convention) or carry a triaged
reason in tools/audit_float_ties.ALLOW / ALLOW_ALIAS. A new query
re-introducing the class fails here, not in the driver's hash three rounds
later."""

from __future__ import annotations

from tools.audit_float_ties import ALLOW, ALLOW_ALIAS, audit, info_tier


def _allowed() -> dict[str, str]:
    return {**ALLOW, **ALLOW_ALIAS}


def test_no_unallowlisted_float_tie_comparisons():
    findings = audit()
    allowed = _allowed()
    bad = {n: s[:2] for n, s in findings.items() if n not in allowed}
    assert not bad, f"quantize these comparisons or allowlist with a reason: {bad}"


def test_allowlist_not_stale():
    findings = audit()
    stale = [n for n in _allowed() if n not in findings]
    assert not stale, f"remove stale allowlist entries: {stale}"


def test_no_name_in_both_allowlists():
    dup = set(ALLOW) & set(ALLOW_ALIAS)
    assert not dup, f"one allowlist entry per query: {dup}"


def test_info_tier_enumerates_rounded_float_agg_outputs():
    """The INFO tier (VERDICT r4 #8) is the triage list for the
    clean_mad_neutralize class: float aggregates feeding ROUND'd output
    columns. It must be non-empty (the repo has many such queries by
    design) and include the canonical example."""
    info = info_tier()
    assert info, "INFO tier unexpectedly empty"
    assert "clean_mad_neutralize" in info
