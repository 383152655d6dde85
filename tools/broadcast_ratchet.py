"""Forced-broadcast ratchet (VERDICT r7 'Next round' #1).

Round 7 proved that a forced ``F.broadcast``/``hint("broadcast")`` on a
frame whose true size scales with the data is the repo's one recurring
scale-killer class (bootstrap r7, pagerank r8) — and that the hint escapes
both plan-level nets when lineage is truncated (``localCheckpoint``) or the
module simply isn't scanned. This tool is the SOURCE-level net over the
whole package: it inventories every forced-broadcast site as
``{"<relpath>::<target-prefix>": count}`` and pins the inventory in
``docs/broadcast_ratchet.json``.

``tests/test_plans.py::test_forced_broadcast_ratchet`` recomputes the
inventory and fails on any NEW key or any count INCREASE — so every new
forced-broadcast site anywhere in ``polars_quant_spark/`` forces a written
triage (docs/BROADCAST_TRIAGE.md) plus a deliberate regeneration:

    python tools/broadcast_ratchet.py --write

Counts that DECREASE also fail (stale snapshot) so removals are recorded —
the ratchet is an exact inventory, not a ceiling.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(ROOT, "docs", "broadcast_ratchet.json")

# `F.broadcast(df.agg(...))`-style inline targets keep their leading callee
# name; attribute chains record the base variable.
_SITE = re.compile(r"""(?:F\.broadcast\(|\.hint\(\s*["']broadcast["'])\s*([A-Za-z_][A-Za-z_0-9]*)?""")


def inventory(root: str = ROOT) -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(
        glob.glob(os.path.join(root, "polars_quant_spark", "**", "*.py"), recursive=True)
    ):
        rel = os.path.relpath(path, root)
        for m in _SITE.finditer(open(path).read()):
            key = f"{rel}::{m.group(1) or '<expr>'}"
            out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    inv = inventory()
    if "--write" in sys.argv:
        with open(SNAPSHOT, "w") as f:
            json.dump(inv, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {SNAPSHOT}: {sum(inv.values())} sites, {len(inv)} keys")
        return 0
    frozen = json.load(open(SNAPSHOT))
    new = {k: v for k, v in inv.items() if k not in frozen}
    grew = {k: (frozen[k], v) for k, v in inv.items() if k in frozen and v > frozen[k]}
    gone = {k: v for k, v in frozen.items() if inv.get(k, 0) < v}
    for label, d in (("NEW", new), ("GREW", grew), ("STALE", gone)):
        for k, v in sorted(d.items()):
            print(f"{label:6s} {k} {v}")
    return 1 if (new or grew or gone) else 0


if __name__ == "__main__":
    raise SystemExit(main())
