"""Similarity search over an embedding column (array<float>).

Two paths:
- brute-force cosine top-k: exact baseline. Query side is broadcast (k
  queries × N corpus rows — a map-side nested loop, no shuffle of the
  corpus), dot products in one NumPy GEMM per Arrow batch, then a
  windowed top-k. Right plan up to ~10^4 queries; at 100 TB the corpus
  scan dominates and parallelizes linearly.
- IVF-style bucketed ANN: assign every vector to its nearest of C
  centroids (sign-hash projection centroids — deterministic, no training
  loop needed for a first-cut recall path; a k-means refinement can drop
  in), then search only matching buckets (+ optional probes). Turns the
  all-pairs scan into an equi join on bucket id.

Cosine assumes unit-norm vectors (our encoder guarantees it; normalize
externally-supplied embeddings with ``l2_normalize_col``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def l2_normalize_col(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    norm = F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(norm > 0, F.transform(c, lambda x: x / norm)).otherwise(c)


def _gemm_topk_udf(queries: np.ndarray, qids: np.ndarray, k: int,
                   dtype=np.float32):
    """mapInPandas kernel: for each corpus batch, GEMM against all queries
    and emit (qid, corpus id, score) for the per-batch top-k per query.
    Per-batch top-k keeps the shuffle tiny; the global window finishes it."""

    def fn(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            corpus = np.asarray(pdf["embedding"].tolist(), dtype=dtype)
            ids = pdf["vec_id"].to_numpy()
            scores = queries @ corpus.T  # (Q, B)
            kk = min(k, scores.shape[1])
            idx = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            out = {
                "query_id": np.repeat(qids, kk),
                "vec_id": ids[idx].ravel(),
                "score": np.take_along_axis(scores, idx, axis=1).ravel().astype(np.float64),
            }
            yield pd.DataFrame(out)

    return fn


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dtype: str = "float32",
) -> DataFrame:
    """Exact cosine top-k: DataFrame[query_id, vec_id, score, rank].

    ``queries`` is collected and broadcast inside the Arrow kernel (bounded:
    ANN queries are per-request small); the corpus is never shuffled — one
    scan, map-side GEMM, then a top-k window over Q×k×partitions rows.
    ``dtype='float64'`` makes scores bit-comparable with double-precision
    oracles; float32 is the fast path at scale.
    """
    np_dtype = np.float64 if dtype == "float64" else np.float32
    qrows = queries.select(query_id_col, vec_col).collect()
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], schema="query_id long, vec_id long, score double, rank int"
        )
    qmat = np.asarray([r[vec_col] for r in qrows], dtype=np_dtype)
    qids = np.asarray([r[query_id_col] for r in qrows])

    partial = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    ).mapInPandas(
        _gemm_topk_udf(qmat, qids, k, np_dtype),
        schema="query_id long, vec_id long, score double",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF / LSH-bucketed ANN
# ---------------------------------------------------------------------------


def signed_projection_bucket(vec_col: str, planes: int = 8, seed: int = 99) -> F.Column:
    """LSH bucket id: sign of ``planes`` pseudo-random hyperplane
    projections, packed into an int. Hyperplane j weight for dim i is a
    deterministic ±1 from xxhash64(i, j, seed) — computed in Catalyst, so
    bucketing is a pure column expression (scan-time, no Python)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0)
    for j in range(planes):
        proj = F.aggregate(
            F.zip_with(
                c,
                F.sequence(F.lit(0), F.size(c) - 1),
                lambda x, i: F.when(
                    F.pmod(F.xxhash64(i, F.lit(j), F.lit(seed)), F.lit(2)) == 0, x
                ).otherwise(-x),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 99,
) -> DataFrame:
    """ANN top-k: bucket corpus + queries by signed projections, equi-join
    on bucket, exact cosine inside the bucket, windowed top-k.

    Recall < 1 by construction (single-probe); raise recall with fewer
    planes or by probing neighbor buckets. The join is an equi join on
    bucket — the 100 TB plan is scan + shuffle-on-bucket, never all-pairs.
    """
    cb = corpus.withColumn("_bucket", signed_projection_bucket(vec_col, planes, seed))
    qb = queries.withColumn("_bucket", signed_projection_bucket(vec_col, planes, seed))
    qside = qb.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        "_bucket",
    )
    joined = cb.join(F.broadcast(qside), "_bucket")
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("_qvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = joined.select(
        "query_id", F.col(id_col).alias("vec_id"), dot.alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 99,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucket self-join:
    DataFrame[a, b, score] with cosine >= threshold (single-probe recall)."""
    b = vectors.withColumn("_bucket", signed_projection_bucket(vec_col, planes, seed))
    left = b.select("_bucket", F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    right = b.select("_bucket", F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        left.join(right, "_bucket")
        .where(F.col("a") < F.col("b"))
        .withColumn("score", dot)
        .where(F.col("score") >= threshold)
        .select("a", "b", "score")
        .distinct()
    )
