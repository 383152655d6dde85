"""Golden-hash regression locks for ALL registered queries (VERDICT r6 #3).

Every query's sf0.001 Spark result is fingerprinted (dtype-faithful,
order-insensitive — tools/golden_hashes.py) and pinned in
golden/query_hashes_sf0.001.json. Once a query rotates out of the 50-slot
driver window, this tier is what catches semantic drift the round it is
introduced — without DuckDB, without the recursive-CTE oracle twins that
dominate the full harness's ~12 min.

Cost: Spark-only evaluation of all 385 queries (~4 min), so the full sweep
is OPT-IN for local iteration:

    RUN_GOLDEN_HASHES=1 python -m pytest tests/test_golden_hashes.py -q

The default pytest run still executes a 12-query smoke slice (one per
major family, biased to rotated-out queries) so a gross breakage — an
import error, a changed loader contract, a renamed column — fails every
CI run, not just the opt-in sweep. A deliberate semantics change:
regenerate with `python tools/make_golden_hashes.py` and review the diff
(every CHANGED line must be intended).
"""

from __future__ import annotations

import json
import os

import pytest

import __spark_entry__ as E
from tools.golden_hashes import fingerprint

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_PATH = os.path.join(ROOT, "golden", "query_hashes_sf0.001.json")
SF_DIR = "/root/testdata/sf0.001"

# Always-on smoke slice: one rotated-out representative per family (these
# have driver-green history but no round-7 window slot, i.e. exactly the
# queries the lock exists for — cdl_all_patterns/sketch_kmv_users were
# swapped out when they became PRIORITY_CARRYOVERS canaries).
SMOKE = [
    "rel_q1_pricing_summary",
    "ind_rsi_14",
    "cdl_efficacy",
    "bt_vectorized_curve",
    "doc_minhash_pairs",
    "emb_cosine_topk",
    "events_funnel",
    "bars_vwap",
    "factor_ic",
    "media_features",
    "sketch_sample_quantiles",
    "vol_cmf_20",
]


def _golden() -> dict[str, dict]:
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def test_golden_file_covers_every_registered_query():
    golden = _golden()
    missing = [k for k in E.queries() if k not in golden]
    assert not missing, (
        f"queries without a golden hash: {missing} — run "
        "`python tools/make_golden_hashes.py` after registering a query"
    )


def _check(names: list[str], spark) -> None:
    golden = _golden()
    qs = E.queries()
    drifted = []
    try:
        for name in names:
            got = fingerprint(qs[name](spark, SF_DIR))
            if got != golden[name]:
                drifted.append(
                    f"{name}: rows {golden[name]['rows']}->{got['rows']}, "
                    f"hash {golden[name]['sha256'][:12]}->{got['sha256'][:12]}"
                )
    finally:
        # some pipelines cache intermediate frames (e.g. exploded shingles);
        # a live cache makes Spark splice InMemoryRelations into LATER tests'
        # identical subplans, changing their textual plan shape (the
        # plan-assertion tests in test_plans.py count exchanges). Leave the
        # shared session the way we found it.
        spark.catalog.clearCache()
    assert not drifted, (
        "result drift vs golden/query_hashes_sf0.001.json (regenerate ONLY "
        "for intended semantics changes):\n" + "\n".join(drifted)
    )


def test_golden_hash_smoke_slice(spark):
    golden = _golden()
    assert all(k in golden for k in SMOKE)
    _check(SMOKE, spark)


@pytest.mark.skipif(
    not os.environ.get("RUN_GOLDEN_HASHES"),
    reason="full all-query sweep is opt-in: RUN_GOLDEN_HASHES=1 (~4 min)",
)
def test_golden_hash_full_sweep(spark):
    _check(list(E.queries()), spark)
