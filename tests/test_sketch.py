"""Deterministic-sketch unit tests (operators/sketch.py): KMV estimate
properties, the two-level min-k equivalence, sampler determinism, and
quantile parity with numpy on the same sample."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from polars_quant_spark.operators import sketch
from polars_quant_spark.sources.bars import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_kmv_small_group_is_exact(spark, events):
    """Groups with fewer than k distinct keys report the exact count."""
    exact = {
        r[0]: r[1]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id"))
        .collect()
    }
    big_k = max(exact.values()) + 10
    est = {
        r[0]: r[1]
        for r in sketch.kmv_distinct(
            events, "user_id", by=["event_type"], k=big_k
        ).collect()
    }
    assert est == {k: float(v) for k, v in exact.items()}


def test_kmv_estimate_within_error_bound(spark, events):
    """KMV standard error is ~1/sqrt(k-2); assert within 4 sigma."""
    k = 64
    exact = {
        r[0]: r[1]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id"))
        .collect()
    }
    est = {
        r[0]: r[1]
        for r in sketch.kmv_distinct(events, "user_id", by=["event_type"], k=k).collect()
    }
    sigma = 4.0 / np.sqrt(k - 2)
    for g, n in exact.items():
        if n >= k:
            assert abs(est[g] - n) / n < sigma, (g, est[g], n)


def test_kmv_two_level_equals_single_level(spark, events):
    """The per-partition pre-prune must not change the k-th smallest hash."""
    k = 32
    two = sketch.kmv_distinct(events, "user_id", by=["event_type"], k=k)
    # single-level reference: rank the full distinct hash set per group
    d = events.select(
        "event_type", sketch.hash_lane("user_id").alias("_h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("_h")
    ranked = d.withColumn("_rn", F.row_number().over(w))
    agg = ranked.groupBy("event_type").agg(
        F.max("_rn").alias("_n"),
        F.max(F.when(F.col("_rn") == k, F.col("_h"))).alias("_kth"),
    )
    from polars_quant_spark.functions._util import round6

    est = F.when(F.col("_n") < k, F.col("_n").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("_kth").cast("double") / F.lit(sketch.KMV_SCALE))
    )
    single = agg.select("event_type", round6(est).alias("est_distinct"))
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, single.collect()))


def test_deterministic_sample_is_stable_and_sized(spark, events):
    s1 = sketch.deterministic_sample(events, "event_id", 0.1)
    s2 = sketch.deterministic_sample(events, "event_id", 0.1)
    ids1 = sorted(r[0] for r in s1.select("event_id").collect())
    ids2 = sorted(r[0] for r in s2.select("event_id").collect())
    assert ids1 == ids2
    n = events.count()
    # Bernoulli(0.1): allow 5 sigma
    assert abs(len(ids1) - 0.1 * n) < 5 * np.sqrt(n * 0.1 * 0.9)
    # frac=1 keeps everything
    assert sketch.deterministic_sample(events, "event_id", 1.0).count() == n


def test_sampled_quantiles_match_numpy(spark, events):
    out = {
        r["event_type"]: (r["n_sample"], r["q_0_25"], r["q_0_5"], r["q_0_75"])
        for r in sketch.sampled_quantiles(
            events, "value", [0.25, 0.5, 0.75], by=["event_type"],
            key="event_id", frac=0.1,
        ).collect()
    }
    samp = sketch.deterministic_sample(events, "event_id", 0.1).toPandas()
    for g, grp in samp.groupby("event_type"):
        v = grp["value"].to_numpy()
        n, q25, q50, q75 = out[g]
        assert n == len(v)
        for got, p in [(q25, 25), (q50, 50), (q75, 75)]:
            want = np.floor(np.percentile(v, p) * 1e6 + 0.5) / 1e6
            assert got == pytest.approx(want, abs=1e-9), (g, p)


def test_stratified_sample_rates_and_drops(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fracs = {"src0": 1.0, "src1": 0.5}
    samp = sketch.stratified_sample(docs, "doc_id", fracs, "source")
    got = {r[0]: r[1] for r in samp.groupBy("source").count().collect()}
    totals = {r[0]: r[1] for r in docs.groupBy("source").count().collect()}
    # unlisted sources are dropped entirely
    assert set(got) <= {"src0", "src1"}
    # frac=1 keeps every row of its stratum
    assert got.get("src0") == totals["src0"]
    # frac=0.5 keeps a Bernoulli share (5 sigma)
    n = totals["src1"]
    assert abs(got.get("src1", 0) - 0.5 * n) < 5 * np.sqrt(n * 0.25) + 1
    # determinism
    again = {r[0]: r[1] for r in
             sketch.stratified_sample(docs, "doc_id", fracs, "source")
             .groupBy("source").count().collect()}
    assert again == got


def test_hash_split_partitions_and_is_stable(spark, sf_dir):
    from polars_quant_spark.sources.bars import load_table

    docs = load_table(spark, sf_dir, "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = sketch.hash_split(docs, "doc_id", w)
    rows = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    # every row assigned, only the declared names
    assert set(rows.values()) <= set(w)
    # proportions within 5 sigma of the weights
    n = len(rows)
    from collections import Counter
    c = Counter(rows.values())
    for name, frac in w.items():
        assert abs(c[name] - frac * n) < 5 * np.sqrt(n * frac * (1 - frac)) + 1
    # stability under corpus growth: a subset's assignments are unchanged
    sub = sketch.hash_split(docs.limit(50), "doc_id", w)
    for r in sub.select("doc_id", "split").collect():
        assert rows[r["doc_id"]] == r["split"]
    # invalid weights rejected
    with pytest.raises(ValueError):
        sketch.hash_split(docs, "doc_id", {"a": 0.9, "b": 0.3})


def test_mixture_resample(spark, sf_dir):
    """Acceptance rates derived from observed counts: the binding group
    keeps every row, shares land near the target mixture, excluded groups
    vanish, and the selection is deterministic across invocations."""
    docs = load_table(spark, sf_dir, "documents")
    target = {"en": 0.5, "zh": 0.25, "es": 0.25}
    out = sketch.mixture_resample(docs, "doc_id", "lang", target)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= set(target)
    base = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # binding group (min n/t) keeps everything
    binding = min(target, key=lambda g: base[g] / target[g])
    assert counts[binding] == base[binding]
    # shares within 5 sigma of the recipe
    n = sum(counts.values())
    for g, t in target.items():
        assert abs(counts[g] - t * n) < 5 * np.sqrt(n * t * (1 - t)) + 1
    # deterministic: second run selects the identical doc_ids
    ids1 = {r["doc_id"] for r in out.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in sketch.mixture_resample(
        docs, "doc_id", "lang", target).select("doc_id").collect()}
    assert ids1 == ids2


def test_shuffle_shards_and_writer(spark, sf_dir, tmp_path):
    """(shard, pos) is a bijective deterministic address; the writer lays
    each shard down as one file whose row order is the shard's pos order."""
    docs = load_table(spark, sf_dir, "documents")
    out = sketch.shuffle_shards(docs, "doc_id", 4)
    n = docs.count()
    rows = out.select("doc_id", "shard", "pos").collect()
    assert len(rows) == n
    addr = {(r["shard"], r["pos"]) for r in rows}
    assert len(addr) == n  # bijection: no two rows share an address
    for s in range(4):
        ps = sorted(p for sh, p in addr if sh == s)
        assert ps == list(range(1, len(ps) + 1))  # dense rank per shard
    # writer: one shard=K/ dir per shard, ONE file each, written in pos order
    path = str(tmp_path / "shards")
    sketch.write_training_shards(docs, path, "doc_id", 4)
    import glob
    import pyarrow.parquet as pq
    dirs = sorted(glob.glob(path + "/shard=*"))
    assert len(dirs) == 4
    seen = 0
    for d in dirs:
        files = glob.glob(d + "/*.parquet")
        assert len(files) == 1
        t = pq.read_table(files[0], columns=["pos"]).to_pydict()
        assert t["pos"] == sorted(t["pos"])
        seen += len(t["pos"])
    assert seen == n
