"""Regression gate for the float-tie comparison class (r3 mkt_breadth bug).

Every oracle whose SQL compares a value against an association-order-
sensitive float aggregate must either quantize the comparison to integer
micro-units (the repo convention) or carry a triaged reason in
tools/audit_float_ties.ALLOW. A new query re-introducing the class fails
here, not in the driver's hash three rounds later."""

from __future__ import annotations

from tools.audit_float_ties import ALLOW, audit


def test_no_unallowlisted_float_tie_comparisons():
    findings = audit()
    bad = {n: s[:2] for n, s in findings.items() if n not in ALLOW}
    assert not bad, f"quantize these comparisons or allowlist with a reason: {bad}"


def test_allowlist_not_stale():
    findings = audit()
    stale = [n for n in ALLOW if n not in findings]
    assert not stale, f"remove stale allowlist entries: {stale}"
