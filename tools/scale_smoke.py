"""Scale smoke: replicate the sf0.1 tables N× and measure how the headline
plans scale.

The correctness gate runs at small SF; this tool is the evidence that the
plan *shapes* hold when the data grows — each bench query is timed at 1×
and N× and the ratio is compared to N (ratio/N ≈ 1.0 = linear scaling,
< 1 = fixed costs amortizing, ≫ 1 = a stage that will not survive 100 TB).

Replication is adversarial where it matters:

* ``events`` — replicas extend each symbol's bar history N× (ts shifted
  past the original range), so every window/recurrence runs over N×-longer
  per-symbol sequences: the skew-sensitive case, since a symbol is
  inherently sequential.
* ``documents`` — doc ids shift and each replica's text goes through a
  rotated-alphabet substitution, so replicas are NOT near-duplicates of
  each other: the LSH candidate volume scales with the corpus instead of
  quadratically exploding on artificial cross-replica dup clusters.
* ``lineitem``/``orders`` — order keys shift per replica; dimension tables
  stay fixed (that is what dimensions do at scale).
* ``embeddings`` — vec ids shift; ANN scan cost is content-independent.

Usage::

    python tools/scale_smoke.py [N] [--rebuild] [--subset=a,b,c]  # default N=8

``--subset`` restricts the timed queries (the replica build still covers
every table) — used for the round-7 64× run, where the full 22-entry
sweep would be wall-clock-prohibitive but the top-5 heavy pipelines are
the scale evidence that matters (VERDICT r6 #5).

Writes replicated parquet under ``.scratch/scale{N}x/`` (gitignored,
reused unless --rebuild) and prints one JSON line with per-query
{t_1x, t_Nx, ratio, efficiency}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from polars_quant_spark.session import get_spark  # noqa: E402
from polars_quant_spark.sources.bars import load_table, ts_us_expr  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ALPHA = "abcdefghijklmnopqrstuvwxyz"

# Tables the smoke-tested queries read but that stay fixed-size (dimensions).
COPY_TABLES = ["region", "nation", "customer", "supplier", "part"]


def _rep(spark, n: int):
    return F.broadcast(spark.range(n).select(F.col("id").alias("_r")))


def build(spark, n: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t in COPY_TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copy(os.path.join(SF_DIR, f"{t}.parquet"), dst)
    rep = _rep(spark, n)

    ev0 = load_table(spark, SF_DIR, "events")
    # normalize ts to exact epoch-µs (robust to the driver's int64-ns vs
    # timestamp physical types — see sources.bars.ts_us_expr), shift replicas
    # past the original range, and write back as a µs timestamp.
    ev = ev0.withColumn("_ts_us", ts_us_expr(ev0))
    lo, hi = ev.agg(F.min("_ts_us"), F.max("_ts_us")).first()
    span_us = (hi - lo) + 3_600_000_000  # +1h gap between replicas
    ev.crossJoin(rep).select(
        (F.col("event_id") + F.col("_r") * F.lit(1_000_000_000)).alias("event_id"),
        F.timestamp_micros(F.col("_ts_us") + F.col("_r") * F.lit(span_us)).alias("ts"),
        *[c for c in ev0.columns if c not in ("event_id", "ts")],
    ).write.mode("overwrite").parquet(f"{out}/events.parquet")

    li = load_table(spark, SF_DIR, "lineitem")
    okey_shift = F.col("_r") * F.lit(100_000_000)
    li.crossJoin(rep).select(
        (F.col("l_orderkey") + okey_shift).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    ).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    orders = load_table(spark, SF_DIR, "orders")
    orders.crossJoin(rep).select(
        (F.col("o_orderkey") + okey_shift).alias("o_orderkey"),
        *[c for c in orders.columns if c != "o_orderkey"],
    ).write.mode("overwrite").parquet(f"{out}/orders.parquet")

    docs = load_table(spark, SF_DIR, "documents")
    # rotated-alphabet substitution: replica r maps a→alpha[r%26], b→… —
    # expr because the mapping string depends on _r
    sub = F.expr(
        "translate(text, '"
        + ALPHA
        + "', concat(substring('"
        + ALPHA + ALPHA
        + "', cast(_r % 26 as int) + 1, 26)))"
    )
    docs.crossJoin(rep).select(
        (F.col("doc_id") + F.col("_r") * F.lit(10_000_000)).alias("doc_id"),
        sub.alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text")],
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = load_table(spark, SF_DIR, "embeddings")
    emb.crossJoin(rep).select(
        (F.col("vec_id") + F.col("_r") * F.lit(10_000_000)).alias("vec_id"),
        *[c for c in emb.columns if c != "vec_id"],
    ).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 8
    rebuild = "--rebuild" in sys.argv
    out = os.path.join(REPO, ".scratch", f"scale{n}x")
    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    if rebuild and os.path.exists(out):
        shutil.rmtree(out)
    if not os.path.exists(os.path.join(out, "events.parquet")):
        build(spark, n, out)

    import bench  # noqa: E402  (repo root on sys.path)

    from polars_quant_spark.operators import dedup, text  # noqa: E402

    def _packing(spark_, sf_dir):
        return text.pack_documents(
            load_table(spark_, sf_dir, "documents"), budget=64, shards=4
        )

    def _token_freq(spark_, sf_dir):
        return text.token_frequencies(load_table(spark_, sf_dir, "documents"))

    def _contamination(spark_, sf_dir):
        docs = load_table(spark_, sf_dir, "documents")
        probes = docs.where(F.col("doc_id") % 50 == 7).select(
            F.col("doc_id").alias("probe_id"), "text"
        )
        return dedup.contamination(docs, probes, min_shared=2)

    def _chunking(spark_, sf_dir):
        return text.chunk_documents(
            load_table(spark_, sf_dir, "documents"), size=64, stride=48
        )

    def _bpe(spark_, sf_dir):
        return text.bpe_merges(load_table(spark_, sf_dir, "documents"), rounds=3)

    def _rebalance(spark_, sf_dir):
        from polars_quant_spark.backtest.rebalance import rebalance_backtest
        from polars_quant_spark.sources.bars import bars

        b = bars(spark_, sf_dir)
        syms = ["click", "error", "purchase", "signup", "view"]
        return rebalance_backtest(b, {s: 0.2 for s in syms}, every=21)

    def _bootstrap(spark_, sf_dir):
        from polars_quant_spark.backtest.bootstrap import bootstrap_bands
        from polars_quant_spark.sources.bars import bars

        return bootstrap_bands(bars(spark_, sf_dir), paths=64, block=16)

    def _sweep(spark_, sf_dir):
        from polars_quant_spark.backtest.sweep import parameter_sweep
        from polars_quant_spark.backtest.vectorized import BacktestParams
        from polars_quant_spark.sources.bars import bars

        return parameter_sweep(
            bars(spark_, sf_dir), [(5, 20), (10, 30), (8, 40), (20, 60)],
            params=BacktestParams(),
        )

    from polars_quant_spark.queries import QUERIES  # noqa: E402

    EXTRA = {
        "packing": _packing,
        "token_freq": _token_freq,
        "contamination": _contamination,
        "chunking": _chunking,
        "bpe_merges": _bpe,
        "rebalance": _rebalance,
        "bootstrap": _bootstrap,
        "param_sweep": _sweep,
        # round-2 heavy additions: the LM-eval join chain, the broadcast
        # knn eval, the interval sweep, and the moment-ladder aggregate
        "bigram_ppl": QUERIES["doc_bigram_perplexity"],
        "knn_eval": QUERIES["emb_knn_classify"],
        "concurrency": QUERIES["events_peak_concurrency"],
        "hurst": QUERIES["bars_hurst"],
        # round-8: the iterative graph op whose forced degree broadcast was
        # removed this round (VERDICT r7 #1) — not in the default subset;
        # run with --subset=pagerank for the before/after scale evidence
        "pagerank": QUERIES["doc_pagerank"],
        # round-8: a representative of the per-t cross-sectional frames
        # whose forced broadcasts were dropped (AQE now decides)
        "updown_beta": QUERIES["bars_updown_beta"],
        # round-9 (VERDICT r8 #2): the SemDeDup-style keep/drop decision —
        # its per-IVF-block self-join is exactly the quadratic-risk shape
        # the smoke exists to watch (blocks shrink as the corpus grows,
        # but the n²/b term must stay sublinear in practice)
        "semantic_dedup": QUERIES["emb_semantic_dedup"],
        # round-9 additions: the two remaining heavy doc_* shapes without
        # a smoke row — cross-source LSH (minhash pipeline + source
        # anti-self filter) and the second iterative-free graph op
        # (triangle count over the dup graph's merge-pinned joins)
        "cross_source_dupes": QUERIES["doc_cross_source_dupes"],
        "triangle_count": QUERIES["doc_triangle_count"],
        # round-10 (VERDICT r9 #2): the declared-query variants of the
        # loop-carried / GEMM / prefix-sum shapes. The earlier `bpe_merges`
        # and `packing` fixtures exercised the operators with smoke-local
        # parameters; these run the EXACT registered queries the driver
        # verifies, so the smoke watches the same plans the gate does.
        "doc_bpe_merges": QUERIES["doc_bpe_merges"],
        "doc_packing": QUERIES["doc_packing"],
        "doc_shuffle_shards": QUERIES["doc_shuffle_shards"],
        "walk_forward": QUERIES["bt_walk_forward"],
        "emb_gram": QUERIES["emb_gram"],
        "pca_power": QUERIES["emb_pca_power"],
        # round-10: the promoted cohort/funnel family (operators/events.py)
        # — every new package operator gets a scale row the round it lands.
        # The 64x events replica extends per-user histories, so these watch
        # the user-exchange + distribution-collapse shapes directly.
        # round-10: one-token-edit dedup — the delete-one key explode is a
        # Σ(n_tokens+1) blow-up whose bucket sizes must track true near-dup
        # cluster sizes, not corpus size (the rotated-alphabet replicas keep
        # cross-replica content disjoint, so candidate volume is the honest
        # per-replica pair count).
        "token_edit": QUERIES["doc_token_edit_pairs"],
        "k_anonymize": QUERIES["events_k_anonymized"],
        # round-10: the train-free LSH ANN — bucket-join candidate volume
        # must track (planes+1)/2^planes of the corpus, and the signature
        # explode (rows × dims) is the same cost class as minhash shingles
        "rp_lsh": QUERIES["emb_rp_lsh_topk"],
        # round-10: the custom join family (events-based, content-safe on
        # the standard replicas) — as-of's union+window single shuffle and
        # the binned range/interval equi-joins must hold their plan shape
        # as per-symbol history grows
        # round-11 (VERDICT r10 #4): the one real readStream drain >5 s in
        # the census — the stream-stream interval join's state store must
        # scale with the WATERMARK HORIZON's row volume, not the corpus;
        # the replica's per-user histories are 64/256x longer, so this
        # watches both the state-store footprint and the drain batch count
        "stream_attribution": QUERIES["stream_attribution_join"],
        # round-13 (§3 event-driven margin fold): the leverage/interest/
        # margin-call fold's distributed row — per-symbol histories grow
        # 64/256x, so this watches the fold's group-serial wall and the
        # curve join, same protocol as "backtest"
        "margin": QUERIES["bt_margin_curve"],
        "asof": QUERIES["asof_bars_marks"],
        "range_join": QUERIES["range_bars_windows"],
        "interval_join": QUERIES["interval_overlap_bars"],
        "funnel": QUERIES["events_funnel"],
        "kaplan_meier": QUERIES["events_kaplan_meier"],
        "cohort_ltv": QUERIES["events_cohort_ltv"],
        "decile_migration": QUERIES["events_decile_migration"],
        "top_paths": QUERIES["events_top_paths"],
        "cohort_retention": QUERIES["events_cohort_retention"],
    }

    subset_arg = next(
        (a.split("=", 1)[1] for a in sys.argv if a.startswith("--subset=")), None
    )
    subset = subset_arg.split(",") if subset_arg else [
        "q1",
        "q5",
        "indicators_expr",
        "indicators_chunked",
        "indicators_rec",
        "patterns",
        "backtest",
        "dedup_minhash",
        "ann_topk",
        "text_stats",
        "packing",
        "token_freq",
        "contamination",
        "chunking",
        "bpe_merges",
        "rebalance",
        "bootstrap",
        "param_sweep",
        "bigram_ppl",
        "knn_eval",
        "concurrency",
        "hurst",
    ]

    def best2(fn, sf_dir: str) -> float:
        from polars_quant_spark.session import released

        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            # released(): persist-on-return pins would otherwise stack
            # across the 22-entry sweep at Nx sizes (VERDICT r11 #7)
            with released(spark):
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    # warm the JVM on the 1× data
    load_table(spark, SF_DIR, "lineitem").count()
    results = {}
    for name in subset:
        fn = bench.BENCH.get(name) or EXTRA[name]
        t1 = best2(fn, SF_DIR)
        tn = best2(fn, out)
        results[name] = {
            "t_1x": t1,
            f"t_{n}x": tn,
            "ratio": round(tn / t1, 2) if t1 > 0 else None,
            "efficiency": round((tn / t1) / n, 3) if t1 > 0 else None,
        }
        print(json.dumps({name: results[name]}), flush=True)
    print(
        json.dumps(
            {"metric": "scale_smoke", "n": n, "sf_base": SF_DIR, "queries": results}
        )
    )


if __name__ == "__main__":
    main()
