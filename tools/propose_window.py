"""Propose the next round's driver window from the coverage ledger.

Rounds 7-9 built PRIORITY_CARRYOVERS/PRIORITY_FRESH by hand from
docs/coverage_ledger.json; the rules are mechanical, so this tool emits a
candidate window that already satisfies every invariant the suite audits
(tests/test_coverage_ledger.py, tests/test_registration_order.py):

* rule (a): every latest-red query is pinned first;
* rule (b): the five standing dtype-diverse canaries keep their slots
  (they guard driver-hash semantic drift across type classes);
* the remaining slots go to never-driver-verified names, allocated
  proportionally to each family's remaining pool (largest remainder),
  so no unsaturated family loses its window slot.

Usage (after the new CORRECTNESS_r*.json lands and the ledger is
regenerated)::

    python tools/make_coverage_ledger.py
    python tools/propose_window.py            # prints the two lists

The output is a PROPOSAL to paste into polars_quant_spark/queries.py —
the builder still reviews it (e.g. to finish a small family early the
way round 9 finished ind_/emb_), and the pytest invariants re-audit
whatever lands.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WINDOW = 50

CANARIES = [
    "cdl_all_patterns",    # 61 int flags + string symbol in one hash
    "price_transforms",    # pure float columns
    "loader_grid_fill",    # date grid x symbols, timestamp axis
    "sketch_kmv_users",    # bigint estimate (the r3-r5 red class shape)
    "sel_info",            # 15-column mixed-type latest-bar summary
]


def propose() -> tuple[list[str], list[str]]:
    with open(os.path.join(ROOT, "docs", "coverage_ledger.json")) as f:
        ledger = json.load(f)
    from polars_quant_spark.queries import QUERIES

    reg = list(QUERIES)
    reds = [
        k
        for k in reg
        if ledger.get(k, {}).get("last_seen") is not None
        and ledger[k]["last_green"] is False
    ]
    never = [
        k for k in reg if ledger.get(k, {}).get("first_green") is None
        and k not in reds
    ]
    fresh_budget = WINDOW - len(CANARIES) - len(reds)
    if fresh_budget < 0:
        raise SystemExit(
            f"{len(reds)} red pins exceed the window after canaries — "
            "drop canaries manually this round"
        )
    # family = prefix up to the first underscore (the convention every
    # registered name follows); largest-remainder proportional allocation
    fams: dict[str, list[str]] = {}
    for k in never:
        fams.setdefault(k.split("_")[0], []).append(k)
    total = len(never)
    picks: list[str] = []
    extra_carry: list[str] = []
    if total <= fresh_budget:
        picks = list(never)  # saturation round: take everything left
        # The driver contract is EXACTLY 50 slots (list(QUERIES)[:50] —
        # tests/test_registration_order.py), so leftover slots re-spend
        # as rule-(b) carryovers on the STALEST ledger-green names
        # (oldest last_seen round): the driver re-verifies what it has
        # not looked at for the longest, maximizing drift coverage
        # without violating the fresh-slots-are-never-verified invariant.
        pad = fresh_budget - total
        if pad:
            greens = [
                k
                for k in reg
                if k not in CANARIES
                and k not in reds
                and k not in never
                and ledger.get(k, {}).get("first_green") is not None
            ]
            greens.sort(key=lambda k: (ledger[k]["last_seen"], reg.index(k)))
            extra_carry = greens[:pad]
    else:
        quotas = {
            f: (len(v) * fresh_budget) / total for f, v in fams.items()
        }
        base = {f: int(q) for f, q in quotas.items()}
        leftover = fresh_budget - sum(base.values())
        for f in sorted(
            quotas, key=lambda f: quotas[f] - base[f], reverse=True
        )[:leftover]:
            base[f] += 1
        for f, members in sorted(fams.items()):
            picks.extend(members[: base[f]])
    return CANARIES + extra_carry, reds + picks


def main() -> None:
    carry, fresh = propose()
    print("PRIORITY_CARRYOVERS = [")
    for k in carry:
        print(f'    "{k}",')
    print("]\nPRIORITY_FRESH = [")
    for k in fresh:
        print(f'    "{k}",')
    print("]")
    print(
        f"# window {len(carry) + len(fresh)} "
        f"({len([k for k in fresh])} fresh)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
