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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_quant_spark.functions._util import widen


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
    bounded by queries×k rows."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = widen(corpus).select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


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


def embedding_near_dupes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold).

    Brute-force all-pairs here (fine for verification corpora); the 100 TB
    path blocks by ``ivf_assign`` buckets first so only same-bucket pairs
    join."""
    df = widen(df)
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast argmin via
    struct-max over the centroid array). Adds ``bucket``."""
    cent = centroids.select(
        F.col(centroid_id).alias("_cid"), F.col(centroid_vec).alias("_cvec")
    )
    joined = df.crossJoin(F.broadcast(cent)).select(
        *df.columns,
        F.struct(
            cosine(F.col(vec_col), F.col("_cvec")).alias("sim"),
            (-F.col("_cid")).alias("neg_cid"),
        ).alias("_cand"),
    )
    w = Window.partitionBy(id_col)
    best = joined.withColumn("_best", F.max("_cand").over(w)).where(
        F.col("_cand") == F.col("_best")
    )
    return best.select(*df.columns, (-F.col("_best.neg_cid")).alias("bucket"))


def hash_centroids(df: DataFrame, n: int = 16, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic pseudo-centroids: the n corpus vectors with the smallest
    md5(id) — a training-free stand-in that keeps the IVF plumbing honest."""
    ranked = df.select(
        F.col(id_col), F.col(vec_col), F.md5(F.col(id_col).cast("string")).alias("_h")
    ).orderBy("_h").limit(n)
    w = Window.orderBy("_h")
    return ranked.select(
        (F.row_number().over(w) - 1).alias("centroid_id"), F.col(vec_col).alias("centroid")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-bucketed approximate top-k: corpus bucketed once by nearest
    centroid; each query scans only its `nprobe` nearest buckets."""
    corpus = widen(corpus)
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
    probes = qc.withColumn("_r", F.row_number().over(wq)).where(F.col("_r") <= nprobe).select(
        "query_id", "_qvec", "bucket"
    )
    scored = probes.join(
        bucketed.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec"), "bucket"),
        "bucket",
    ).select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("_qvec"), F.col("_cvec")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )
