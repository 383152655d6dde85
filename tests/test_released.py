"""session.released(): scoped release of operator-internal cache pins.

ADVICE r10 (low): minhash_dedup_pairs/token_edit_pairs persist internal
frames and the segmented operators pin DISK_ONLY pieces that feed their
returned lazy results — the caller holds no handle, so a long-lived
session accumulates cache blocks. ``released`` snapshots the persistent-
RDD id set on entry and unpersists every NEW id on exit, leaving
pre-existing pins untouched.
"""

from __future__ import annotations

from pyspark.storagelevel import StorageLevel

from polars_quant_spark.session import released


def _pinned_ids(spark) -> set[int]:
    return {
        int(i)
        for i in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def test_released_drops_pins_created_inside(spark):
    before = _pinned_ids(spark)
    with released(spark):
        df = spark.range(1000).persist(StorageLevel.DISK_ONLY)
        assert df.count() == 1000
        assert len(_pinned_ids(spark) - before) >= 1
    assert _pinned_ids(spark) <= before


def test_released_preserves_preexisting_pins(spark):
    outer = spark.range(500).persist()
    try:
        assert outer.count() == 500
        held = _pinned_ids(spark)
        with released(spark):
            inner = spark.range(100).persist()
            assert inner.count() == 100
        after = _pinned_ids(spark)
        assert held <= after  # outer pin survived
        assert outer.storageLevel.useMemory  # still marked persistent
    finally:
        outer.unpersist()


def test_released_covers_operator_internal_pins(spark):
    """token_edit_pairs pins its exploded key frame internally (the ADVICE
    site, dedup.py): consuming the result inside released() must drop it."""
    import pandas as pd

    from polars_quant_spark.operators.dedup import token_edit_pairs

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": ["alpha beta gamma", "alpha beta delta", "unrelated"],
            }
        )
    )
    before = _pinned_ids(spark)
    with released(spark):
        pairs = token_edit_pairs(docs)
        assert pairs.count() >= 1
        assert len(_pinned_ids(spark) - before) >= 1  # the internal pin
    assert _pinned_ids(spark) <= before


def test_released_propagates_exceptions_and_still_cleans(spark):
    import pytest

    before = _pinned_ids(spark)
    with pytest.raises(RuntimeError):
        with released(spark):
            df = spark.range(10).persist()
            df.count()
            raise RuntimeError("boom")
    assert _pinned_ids(spark) <= before
