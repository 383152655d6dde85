"""Machine audit of the driver-coverage rotation protocol (VERDICT r6 #2).

Through round 6 the driver-verified union (which queries have ever been
hash-verified by the round driver, and when) lived only in prose and in
ad-hoc diffs of the CORRECTNESS_r*.json artifacts. These tests make the
protocol self-auditing:

1. the committed ledger (docs/coverage_ledger.json) must equal what the
   artifacts actually say (regenerate with tools/make_coverage_ledger.py);
2. every registered query has a ledger row (so coverage gaps are
   enumerable, not inferred);
3. the current PRIORITY window spends no slot on an already-verified query
   beyond the declared rule-(b) carryovers — the failure mode that stalled
   coverage in rounds 3-4;
4. rule (a): any query whose LATEST driver row is red must be pinned in the
   window until it goes green.
"""

from __future__ import annotations

import json
import os

from polars_quant_spark.queries import (
    PRIORITY_50,
    PRIORITY_CARRYOVERS,
    PRIORITY_FRESH,
    QUERIES,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER_PATH = os.path.join(ROOT, "docs", "coverage_ledger.json")


def _ledger() -> dict[str, dict]:
    with open(LEDGER_PATH) as f:
        return json.load(f)


def test_ledger_matches_artifacts():
    """The committed ledger must be exactly what the CORRECTNESS artifacts
    derive — a stale or hand-edited ledger fails here, not in a judge's
    re-derivation."""
    import sys

    sys.path.insert(0, ROOT)
    from tools.make_coverage_ledger import build_ledger

    derived = build_ledger(ROOT)
    committed = _ledger()
    if committed != derived:
        changed = sorted(
            k
            for k in set(committed) | set(derived)
            if committed.get(k) != derived.get(k)
        )
        raise AssertionError(
            "docs/coverage_ledger.json is stale (expected at the start of "
            "every round once the new CORRECTNESS_r*.json lands). "
            f"{len(changed)} entries differ, e.g. {changed[:5]} — regenerate "
            "with `python tools/make_coverage_ledger.py`, then rebuild "
            "PRIORITY_CARRYOVERS/PRIORITY_FRESH for the new round."
        )


def test_every_registered_query_has_a_ledger_row():
    ledger = _ledger()
    missing = [k for k in QUERIES if k not in ledger]
    assert not missing, f"queries absent from the coverage ledger: {missing}"


def test_window_structure():
    assert PRIORITY_50 == PRIORITY_CARRYOVERS + PRIORITY_FRESH
    assert len(PRIORITY_50) == len(set(PRIORITY_50)) == 50


def test_carryovers_are_ledger_green():
    """Rule (b): a carryover slot exists to re-exercise an ALREADY-verified
    family, so every carryover must have a green ledger history."""
    ledger = _ledger()
    not_green = [
        k for k in PRIORITY_CARRYOVERS if ledger[k]["first_green"] is None
    ]
    assert not not_green, f"carryover slots never driver-verified: {not_green}"


def test_fresh_slots_are_never_driver_verified():
    """The coverage-growth invariant: outside carryovers (and rule-(a)
    pins, which are by definition ledger-seen-but-red), every window slot
    must be spent on a query the driver has NEVER verified. Re-spending a
    slot on a union member is what stalled coverage in rounds 3-4."""
    ledger = _ledger()
    wasted = [
        k
        for k in PRIORITY_FRESH
        if ledger[k]["first_green"] is not None
        # rule-(a) pins: seen but latest-red queries MUST hold a slot
        and ledger[k]["last_green"] is not False
    ]
    assert not wasted, (
        f"window slots re-spent on already-green queries: {wasted} — "
        "either move them to PRIORITY_CARRYOVERS (rule b) or swap in "
        "never-verified queries (regenerate the ledger first if a new "
        "CORRECTNESS artifact just landed)"
    )


def test_latest_red_queries_are_pinned():
    """Rule (a): a red row holds its slot until the driver confirms the
    fix. Round 7 starts with zero reds; this guards every future round."""
    ledger = _ledger()
    reds = [
        k
        for k, v in ledger.items()
        if v["last_seen"] is not None and v["last_green"] is False
    ]
    unpinned = [k for k in reds if k not in PRIORITY_50]
    assert not unpinned, f"latest-red queries missing from the window: {unpinned}"


def test_window_proposal_tool_satisfies_invariants():
    """tools/propose_window.py must emit a window that would pass this
    suite's audits verbatim: 50 unique slots, canaries ledger-green (or
    never-yet-seen only in a hypothetical fresh repo), every red pinned,
    every non-canary slot never-driver-verified."""
    import sys

    sys.path.insert(0, ROOT)
    from tools.propose_window import CANARIES, WINDOW, propose

    carry, fresh = propose()
    ledger = _ledger()
    assert carry[: len(CANARIES)] == CANARIES
    # saturation rounds pad carry with stalest-green names; every pad
    # must be ledger-green (a rule-(b) carryover, never a wasted slot)
    for k in carry[len(CANARIES):]:
        assert ledger[k]["first_green"] is not None
    assert len(carry) + len(fresh) == WINDOW
    assert len(set(carry + fresh)) == WINDOW
    reds = {
        k
        for k, v in ledger.items()
        if v["last_seen"] is not None and v["last_green"] is False
    }
    assert reds <= set(fresh), "latest-red queries must be pinned"
    for k in fresh:
        if k in reds:
            continue
        assert ledger[k]["first_green"] is None, (
            f"proposal re-spends a slot on already-green {k}"
        )


def test_window_proposal_saturation_pads_to_fifty(tmp_path, monkeypatch):
    """When the never-verified pool is smaller than the fresh budget (the
    round-11 endgame: 37 left), the proposal must still emit EXACTLY 50
    slots — the driver hash-verifies list(QUERIES)[:50] — padding the
    carryovers with the STALEST ledger-green names (oldest last_seen), so
    the spare slots buy drift re-verification instead of going dark."""
    import json

    from tools import propose_window as pw
    from tools.propose_window import CANARIES, WINDOW

    ledger = _ledger()
    # Synthesize the endgame ledger instead of deriving it from the LIVE
    # window (an earlier version marked PRIORITY_FRESH green, which goes
    # degenerate the round the real pool empties): everything green except
    # a fixed-size pool of 10 never-verified names.
    sim = {
        k: {"first_green": 1, "last_green": True, "last_seen": (i % 9) + 1}
        for i, k in enumerate(sorted(ledger))
    }
    never_left = sorted(k for k in ledger if k not in CANARIES)[:10]
    for k in never_left:
        sim[k] = {"first_green": None, "last_green": None, "last_seen": None}
    assert 0 < len(never_left) < WINDOW - len(CANARIES)

    sim_path = tmp_path / "coverage_ledger.json"
    sim_path.write_text(json.dumps(sim))
    real_open = open
    monkeypatch.setattr(
        "builtins.open",
        lambda p, *a, **kw: real_open(
            sim_path if str(p).endswith("coverage_ledger.json") else p, *a, **kw
        ),
    )
    carry, fresh = pw.propose()
    assert len(carry) + len(fresh) == WINDOW
    assert set(fresh) == set(never_left)
    for k in carry[len(CANARIES):]:  # pads are green and stalest-first
        assert sim[k]["first_green"] is not None
    pad_seen = [sim[k]["last_seen"] for k in carry[len(CANARIES):]]
    assert pad_seen == sorted(pad_seen)


def _simulate_ledger(monkeypatch, tmp_path, sim: dict) -> None:
    sim_path = tmp_path / "coverage_ledger.json"
    sim_path.write_text(json.dumps(sim))
    real_open = open
    monkeypatch.setattr(
        "builtins.open",
        lambda p, *a, **kw: real_open(
            sim_path if str(p).endswith("coverage_ledger.json") else p, *a, **kw
        ),
    )


def test_window_proposal_full_saturation(tmp_path, monkeypatch):
    """The steady state from round 12 on: the never-verified pool is EMPTY.
    The proposal must still emit exactly 50 slots, spending every non-canary
    slot on the stalest ledger-green names (ascending last_seen, then
    registration order) so each query re-proves within ~9 rounds."""
    from tools import propose_window as pw
    from tools.propose_window import CANARIES, WINDOW

    ledger = _ledger()
    sim = {
        k: {"first_green": 1, "last_green": True, "last_seen": (i % 11) + 1}
        for i, k in enumerate(sorted(ledger))
    }
    _simulate_ledger(monkeypatch, tmp_path, sim)
    carry, fresh = pw.propose()
    assert fresh == []  # nothing never-verified, nothing red
    assert len(carry) == WINDOW
    assert carry[: len(CANARIES)] == CANARIES
    pads = carry[len(CANARIES):]
    assert len(pads) == len(set(pads)) == WINDOW - len(CANARIES)
    pad_seen = [sim[k]["last_seen"] for k in pads]
    assert pad_seen == sorted(pad_seen)
    # the pads are THE stalest: no non-canary green outside the pad set may
    # be strictly staler than the newest pad
    newest_pad = max(pad_seen)
    outside = [
        k for k in sim if k not in set(carry) and k not in CANARIES
    ]
    assert all(sim[k]["last_seen"] >= newest_pad for k in outside) or min(
        sim[k]["last_seen"] for k in outside
    ) == newest_pad  # ties at the boundary are allowed either side


def test_post_saturation_staleness_bound():
    """Once the never-verified pool is empty (round 12+ steady state), the
    stalest-first pad rotation guarantees every rotating query re-proves
    within ceil(n_rotating / pad_slots) rounds. Assert the live ledger
    honors a one-round slack over that bound; inactive (skipped) while any
    never-verified names remain, so the test cannot fire during the
    saturation ramp."""
    import math

    import pytest

    ledger = _ledger()
    never = [k for k in QUERIES if ledger[k]["first_green"] is None]
    if never:
        pytest.skip(f"pool not yet saturated ({len(never)} never-verified)")
    pad_slots = 50 - len(PRIORITY_CARRYOVERS[:5])
    rotating = [k for k in QUERIES if k not in PRIORITY_CARRYOVERS[:5]]
    bound = math.ceil(len(rotating) / pad_slots) + 1  # one round of slack
    current = max(v["last_seen"] for v in ledger.values() if v["last_seen"])
    stale = [
        k
        for k in rotating
        if ledger[k]["last_seen"] is not None
        and current - ledger[k]["last_seen"] > bound
    ]
    assert not stale, (
        f"queries unverified for more than {bound} rounds: {stale[:8]} — "
        "the stalest-first pad rotation is not being applied"
    )
