"""Regression guard for the driver's 50-query capture window.

The correctness driver hash-verifies exactly ``list(QUERIES)[:50]``. The
PRIORITY_50 block at the end of ``queries.py`` curates that window to cover
one representative per SURVEY.md §2 family; these tests fail if a future
append (or an import-order change) pushes any family back out of the window,
or if the priority list drifts from what is actually registered.
"""

from __future__ import annotations

from polars_quant_spark.queries import ORACLES, PRIORITY_50, QUERIES

WINDOW = 50

# Every family tag that must own at least one slot in the driver window.
REQUIRED_FAMILIES = [
    "bars_",
    "rel_",
    "agg_",
    "price_",
    "vol_",
    "ind_",
    "cdl_",
    "asof_",
    "range_",
    "interval_",
    "bt_",
    "doc_",
    "emb_",
    "factor_",
    "sel_",
    "loader_",
    "stream_",
    "ols_",
    "clean_",
    "media_",
    "sketch_",
    "events_",
    "mkt_",
    "text_",
]

# Specific shapes that must be driver-verified, not just family-covered.
REQUIRED_QUERIES = [
    "rel_q4_priority_semi",  # left-semi join
    "rel_q22_inactive_anti",  # left-anti join
    "rel_rollup_revenue",  # ROLLUP grouping sets
    "bt_vectorized_curve",
    "bt_metrics",
    "doc_minhash_pairs",
    "doc_dedup_components",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "loader_grid_fill",
    "stream_ema_stateful",
]


def test_priority_list_is_window_sized():
    assert len(PRIORITY_50) == WINDOW
    assert len(set(PRIORITY_50)) == WINDOW


def test_priority_list_leads_registration():
    assert list(QUERIES)[:WINDOW] == PRIORITY_50


def test_window_covers_every_family():
    window = list(QUERIES)[:WINDOW]
    missing = [
        fam
        for fam in REQUIRED_FAMILIES
        if not any(k.startswith(fam) for k in window)
    ]
    assert not missing, f"families pushed out of the driver window: {missing}"


def test_window_covers_required_shapes():
    window = set(list(QUERIES)[:WINDOW])
    missing = [q for q in REQUIRED_QUERIES if q not in window]
    assert not missing, f"required queries missing from driver window: {missing}"


def test_every_window_query_has_an_oracle():
    window = list(QUERIES)[:WINDOW]
    missing = [k for k in window if k not in ORACLES]
    assert not missing, f"driver-window queries without oracle SQL: {missing}"
