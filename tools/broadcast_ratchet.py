"""Forced-broadcast ratchet (VERDICT r7 'Next round' #1; hardened per
ADVICE r8).

Round 7 proved that a forced ``F.broadcast``/``hint("broadcast")`` on a
frame whose true size scales with the data is the repo's one recurring
scale-killer class (bootstrap r7, pagerank r8) — and that the hint escapes
both plan-level nets when lineage is truncated (``localCheckpoint``) or the
module simply isn't scanned. This tool is the SOURCE-level net over the
whole package: it inventories every forced-broadcast site as
``{"<relpath>::<enclosing-function>::<receiver>": count}`` and pins the
inventory in ``docs/broadcast_ratchet.json``.

ADVICE r8 fixes (tools/broadcast_ratchet.py:34 in the r8 tree): the old
regex (a) could never capture the receiver of a ``.hint("broadcast")``
call (the group sat after the closing quote), collapsing all such sites to
one ``<expr>`` key, and (b) matched text inside comments/docstrings, so a
forced broadcast MOVED to a different frame in the same file under the
same key+count passed unnoticed. This version parses the AST instead:
comments and string literals can't match, ``.hint`` receivers are resolved
to their base identifier, and the key carries the enclosing function name
so a site moving between functions always shows as NEW+STALE.

``tests/test_plans.py::test_forced_broadcast_ratchet`` recomputes the
inventory and fails on any NEW key or any count INCREASE — so every new
forced-broadcast site anywhere in ``polars_quant_spark/`` forces a written
triage (docs/BROADCAST_TRIAGE.md) plus a deliberate regeneration:

    python tools/broadcast_ratchet.py --write

Counts that DECREASE also fail (stale snapshot) so removals are recorded —
the ratchet is an exact inventory, not a ceiling.
"""

from __future__ import annotations

import ast
import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT = os.path.join(ROOT, "docs", "broadcast_ratchet.json")


def _base_name(node: ast.AST) -> str:
    """Walk an attribute/call/subscript chain down to its base identifier —
    the variable the broadcast is forced onto (``df.alias("x")`` → ``df``,
    ``F.broadcast(q.agg(...))`` → ``q``)."""
    while True:
        if isinstance(node, ast.Name):
            return node.id
        if isinstance(node, ast.Attribute):
            node = node.value
        elif isinstance(node, ast.Call):
            node = node.func
        elif isinstance(node, ast.Subscript):
            node = node.value
        else:
            return "<expr>"


class _Visitor(ast.NodeVisitor):
    def __init__(self) -> None:
        self.sites: list[tuple[str, str]] = []  # (enclosing_fn, receiver)
        self._fn_stack: list[str] = ["<module>"]
        # bare-call names that mean pyspark broadcast: the literal name
        # plus any alias bound by `from pyspark.sql.functions import
        # broadcast as X` (round-10 review: an alias was invisible)
        self._broadcast_names: set[str] = {"broadcast"}

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        if node.module and node.module.endswith("functions"):
            for alias in node.names:
                if alias.name == "broadcast" and alias.asname:
                    self._broadcast_names.add(alias.asname)
        self.generic_visit(node)

    def _visit_fn(self, node) -> None:
        self._fn_stack.append(node.name)
        self.generic_visit(node)
        self._fn_stack.pop()

    visit_FunctionDef = _visit_fn
    visit_AsyncFunctionDef = _visit_fn

    def visit_Call(self, node: ast.Call) -> None:
        fn = node.func
        if isinstance(fn, ast.Attribute):
            # F.broadcast(target) / functions.broadcast(target)
            if fn.attr == "broadcast" and node.args:
                self.sites.append(
                    (self._fn_stack[-1], _base_name(node.args[0]))
                )
            # target.hint("broadcast", ...) — receiver is fn.value
            elif (
                fn.attr == "hint"
                and node.args
                and isinstance(node.args[0], ast.Constant)
                and node.args[0].value == "broadcast"
            ):
                self.sites.append(
                    (self._fn_stack[-1], _base_name(fn.value))
                )
        # bare broadcast(target) via `from pyspark.sql.functions import
        # broadcast [as alias]` — the most idiomatic spelling was
        # invisible to the net (round-10 advisor; the alias form via the
        # round-10 review). Matched unconditionally on the bare name: a
        # false positive from an unrelated local `broadcast` function
        # would only ADD a site to triage, never hide one.
        elif (
            isinstance(fn, ast.Name)
            and fn.id in self._broadcast_names
            and node.args
        ):
            self.sites.append(
                (self._fn_stack[-1], _base_name(node.args[0]))
            )
        self.generic_visit(node)


def inventory(root: str = ROOT) -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(
        glob.glob(
            os.path.join(root, "polars_quant_spark", "**", "*.py"),
            recursive=True,
        )
    ):
        rel = os.path.relpath(path, root)
        v = _Visitor()
        v.visit(ast.parse(open(path).read(), filename=rel))
        for fn, receiver in v.sites:
            key = f"{rel}::{fn}::{receiver}"
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
