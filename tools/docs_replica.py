"""Build an N× documents replica and measure the dedup pipelines on it
(VERDICT r12 #5: the docs corpus topped out at 256× while backtest/events
had 1024× rows, and the probe-first CC had never been measured at a scale
where a deep component actually triggers pointer jumps outside the
synthetic chain test).

Build (``.scratch/docs{N}x``, gitignored, reused unless --rebuild):

* Replica r's text goes through a DISTINCT seeded a-z bijection
  (``random.Random(1000+r)`` shuffle; distinctness asserted). The r10
  256× build used the 312-map affine family (26 rotations × 12 coprime
  strides), which aliases past 312 replicas; seeded permutations extend
  the same disjoint-content property to any N. Corpus words are pure
  alpha, so translated replicas share no shingle with each other (modulo
  the astronomically unlikely permutation collision we assert against)
  and LSH candidate volume grows with content, not with artificial
  cross-replica dup clusters. Bijections preserve length → ``n_chars``
  stays correct. doc_id shifts by r·10⁷ (same convention as scale_smoke).
* A planted SLIDING-WINDOW CHAIN of ``--chain`` docs (default 3072,
  +0.06% rows at 1024×) in a reserved id range (2·10¹⁰+i): doc i =
  tokens q{2i}..q{2i+61} (62 digit-bearing tokens, stride 2), so the
  exact trigram-shingle Jaccard between docs at distance d is
  (60−2d)/(60+2d) — ≥ 0.5 exactly for d ≤ 10, with J₁ = 58/62 ≈ 0.935.
  MinHash misses are CORRELATED along the chain (adjacent docs share
  most shingles, so band minima shift at common breakpoints where pairs
  at every distance can miss together), so the chain deterministically
  fragments into a family of deep PATH components rather than one giant
  one — measured standalone at the default length: 95 components,
  largest 190 contiguous docs (≥19 edge-hop diameter), CC stats
  6 rounds / 3 jump rounds / converged, identical to the in-corpus
  1024× observation. That is exactly the shape that forces
  connected_components' on-demand pointer jumps (operators/dedup.py:410)
  to fire at corpus scale — plain propagation alone would need tens of
  rounds. Digit tokens cannot collide with the pure-alpha corpus/replica
  shingles.

Measure (--measure): times QUERIES["doc_minhash_pairs"] and
QUERIES["doc_dedup_components"] (count-forced) on the replica dir and on
the 1× SF dir, prints one JSON line with timings, pair/component counts,
and ``dedup.last_cc_stats`` (rounds / jump_rounds / converged) for BOTH
scales. Run with SPARK_DRIVER_MEMORY=48g for N=1024 (the r11/r12 smoke
heap protocol).

Usage::

    python tools/docs_replica.py [N] [--chain=3072] [--rebuild] [--measure]
"""

from __future__ import annotations

import json
import os
import random
import shutil
import string
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ALPHA = string.ascii_lowercase
ID_SHIFT = 10_000_000
CHAIN_BASE = 20_000_000_000
CHAIN_LEN_TOKENS = 62  # tokens per chain doc; stride 2 → J_d = (60-2d)/(60+2d)
CHAIN_STRIDE = 2


def _bijections(n: int) -> list[dict[int, int]]:
    """n distinct seeded a-z permutations as str.translate tables."""
    seen: set[str] = set()
    out: list[dict[int, int]] = []
    for r in range(n):
        seed = 1000 + r
        while True:
            letters = list(ALPHA)
            random.Random(seed).shuffle(letters)
            key = "".join(letters)
            if key not in seen:
                seen.add(key)
                break
            seed += n * 7919  # permutation collision: re-seed deterministically
        out.append(str.maketrans(ALPHA, key))
    return out


def build(n: int, out: str, chain: int) -> None:
    """Driver-side pyarrow build: 5k base docs × n replicas is a few-GB
    write — the per-replica seeded permutation cannot be a Spark
    ``translate`` literal (it varies per replica), and a 1024-branch CASE
    defeats codegen, so the honest build is a local loop (same spirit as
    the r10 hand-built docs256x, now committed and reproducible)."""
    os.makedirs(out, exist_ok=True)
    base = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    ids = base.column("doc_id").to_pylist()
    texts = base.column("text").to_pylist()
    langs = base.column("lang").to_pylist()
    srcs = base.column("source").to_pylist()
    nchars = base.column("n_chars").to_pylist()
    schema = base.schema
    tables = _bijections(n)
    dst = os.path.join(out, "documents.parquet")
    writer = pq.ParquetWriter(dst, schema)
    batch_ids: list[int] = []
    batch_txt: list[str] = []
    batch_lang: list[str] = []
    batch_src: list[str] = []
    batch_nch: list[int] = []

    def _flush() -> None:
        if not batch_ids:
            return
        writer.write_table(
            pa.table(
                {
                    "doc_id": batch_ids,
                    "text": batch_txt,
                    "lang": batch_lang,
                    "source": batch_src,
                    "n_chars": batch_nch,
                },
                schema=schema,
            )
        )
        batch_ids.clear(); batch_txt.clear(); batch_lang.clear()
        batch_src.clear(); batch_nch.clear()

    for r in range(n):
        tbl = tables[r]
        shift = r * ID_SHIFT
        batch_ids.extend(i + shift for i in ids)
        batch_txt.extend(t.translate(tbl) if t is not None else None for t in texts)
        batch_lang.extend(langs)
        batch_src.extend(srcs)
        batch_nch.extend(nchars)
        if (r + 1) % 64 == 0:
            _flush()
    _flush()
    # planted deep chain (see module docstring)
    for i in range(chain):
        lo = i * CHAIN_STRIDE
        txt = " ".join(f"q{j}" for j in range(lo, lo + CHAIN_LEN_TOKENS))
        batch_ids.append(CHAIN_BASE + i)
        batch_txt.append(txt)
        batch_lang.append("en")
        batch_src.append("chain")
        batch_nch.append(len(txt))
        if len(batch_ids) >= 65536:
            _flush()
    _flush()
    writer.close()


def _measure(spark, sf_dir: str) -> dict:
    """Same-session best-of-2 (the r10–r12 smoke protocol): the first pass
    through a fresh 48 g JVM pays JIT + heap-growth + GC-sizing storms that
    can dominate by 10× (observed: the first 1024× pair pass read 1218 s
    while the components pipeline recomputed the identical pair subtree in
    121.8 s once the JVM had stabilized) — both reps are reported so the
    warm-up cost stays visible."""
    from polars_quant_spark.operators import dedup
    from polars_quant_spark.queries import QUERIES
    from polars_quant_spark.session import released

    res: dict = {}
    for key, qname in (
        ("minhash_pairs", "doc_minhash_pairs"),
        ("components", "doc_dedup_components"),
    ):
        reps = []
        for _ in range(2):
            with released(spark):
                t0 = time.time()
                rows = QUERIES[qname](spark, sf_dir).count()
                reps.append(round(time.time() - t0, 1))
        res[f"{key}_rows"] = rows
        res[f"{key}_s"] = min(reps)
        res[f"{key}_reps"] = reps
        if key == "components":
            res["cc_stats"] = dict(dedup.last_cc_stats)
    return res


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1024
    chain = 3072
    for a in sys.argv[1:]:
        if a.startswith("--chain="):
            chain = int(a.split("=", 1)[1])
    out = os.path.join(REPO, ".scratch", f"docs{n}x")
    if "--rebuild" in sys.argv and os.path.exists(out):
        shutil.rmtree(out)
    if not os.path.exists(os.path.join(out, "documents.parquet")):
        t0 = time.time()
        build(n, out, chain)
        print(f"built {out} in {time.time() - t0:.1f}s", file=sys.stderr)
    if "--measure" not in sys.argv:
        return
    from polars_quant_spark.session import get_spark

    spark = get_spark("docs-replica-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    row = {"n": n, "chain": chain}
    row["at_1x"] = _measure(spark, SF_DIR)
    row["at_nx"] = _measure(spark, out)
    for q in ("minhash_pairs", "components"):
        r = row["at_nx"][f"{q}_s"] / max(row["at_1x"][f"{q}_s"], 1e-9)
        row[f"{q}_ratio"] = round(r, 1)
        row[f"{q}_efficiency"] = round(r / n, 3)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
