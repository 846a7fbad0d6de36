"""Embedding encoder + vector math (reference S4/F9/F10).

The reference fetches embeddings from a remote service with chunked,
retried, 20-way-parallel HTTP (reference R/get_embeddings.R:21-197) and
computes all-pairs cosine with a dense BLAS GEMM, relying on the vectors
being unit-norm so dot == cosine (reference R/get_similarity_matrix.R:34-42,
R/dot.R:11-13).

Here the service is replaced by a **deterministic local encoder**: hashed
character-n-gram projection into ``dim`` buckets with ±1 signs, then
L2-normalized. Determinism gives resumability and testability; the encoder
runs as an Arrow-batched pandas UDF over *distinct* keys only (the reference
also embeds unique strings only, R/fuzzylink.R:93).

The encoder is a drop-in: any ``DataFrame[key string] -> DataFrame[key,
embedding array<float>]`` stage (e.g. a real model server client) can
replace it without touching the rest of the plan.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def l2_normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return mat / norms


_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)
_POLY_B = np.uint64(1099511628211)  # FNV prime as the rolling base


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — avalanche the rolling polynomial hash."""
    h = h + _MIX1
    h ^= h >> np.uint64(30)
    h *= _MIX2
    h ^= h >> np.uint64(27)
    h *= _MIX3
    h ^= h >> np.uint64(31)
    return h


def embed_strings(
    strings: list[str],
    dim: int = 256,
    ngrams: tuple[int, ...] = (2, 3, 4),
    seed: int = 1234,
) -> np.ndarray:
    """Deterministic hashed-n-gram embedding; rows are L2-normalized so that
    dot product == cosine similarity (the contract the reference's GEMM
    relies on, R/get_similarity_matrix.R:34-42).

    Fully vectorized: the batch becomes one padded byte matrix; each n-gram
    size is a rolling polynomial hash (a handful of uint64 ops over the
    whole matrix) finalized with splitmix64, then a scatter-add of ±1 signs
    into the hash buckets. ~2 orders of magnitude faster than per-n-gram
    Python hashing — fast enough to run inside every GEMM tile.
    """
    n = len(strings)
    out = np.zeros((n, dim), dtype=np.float32)
    if n == 0:
        return out
    enc = [b"\x01" + s.lower().encode("utf-8") + b"\x02" if s else b""
           for s in strings]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=n)
    maxlen = int(lens.max())
    if maxlen == 0:
        return out
    mat = np.zeros((n, maxlen), dtype=np.uint64)
    for i, e in enumerate(enc):
        if e:
            mat[i, : len(e)] = np.frombuffer(e, dtype=np.uint8)
    rows = np.arange(n)
    sseed = np.uint64(seed)
    for g in ngrams:
        width = maxlen - g + 1
        if width <= 0:
            continue
        h = np.full((n, width), sseed, dtype=np.uint64)
        for j in range(g):
            h = h * _POLY_B + mat[:, j : j + width]
        h = _mix64(h)
        valid = (np.arange(width)[None, :] < (lens - g + 1)[:, None])
        bucket = ((h >> np.uint64(1)) % np.uint64(dim)).astype(np.int64)
        sign = ((h & np.uint64(1)).astype(np.float32) * 2.0 - 1.0) * valid
        np.add.at(out, (np.repeat(rows, width), bucket.ravel()), sign.ravel())
    return l2_normalize(out)


def embed_udf(dim: int = 256, ngrams: tuple[int, ...] = (2, 3, 4), seed: int = 1234):
    """Series→Series pandas UDF: string -> array<float> embedding."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(keys: pd.Series) -> pd.Series:
        mat = embed_strings(keys.fillna("").tolist(), dim=dim, ngrams=ngrams, seed=seed)
        return pd.Series(list(mat))

    return _embed


def embed_keys(df_keys: DataFrame, key_col: str = "key", dim: int = 256,
               ngrams: tuple[int, ...] = (2, 3, 4), seed: int = 1234) -> DataFrame:
    """Distinct-key embedding table: DataFrame[key, embedding array<float>].

    Spark analogue of the reference's string-keyed embedding matrix
    (R/get_embeddings.R:188-196).
    """
    return (
        df_keys.select(F.col(key_col).alias("key"))
        .where(F.col("key").isNotNull())
        .distinct()
        .withColumn("embedding", embed_udf(dim, ngrams, seed)(F.col("key")))
    )


@F.pandas_udf(T.DoubleType())
def cosine_pairs_udf(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Batched row-wise dot product over two array<float> columns.

    Because embeddings are unit-norm, this IS cosine similarity — the same
    shortcut as the reference's ``Tcrossprod`` GEMM
    (R/get_similarity_matrix.R:38). NumPy einsum over the whole Arrow batch:
    one BLAS-like pass, no per-row Python.
    """
    a = np.asarray(va.tolist(), dtype=np.float32)
    b = np.asarray(vb.tolist(), dtype=np.float32)
    if a.size == 0:
        return pd.Series([], dtype="float64")
    return pd.Series(np.einsum("ij,ij->i", a, b).astype(np.float64))


def dot_col(a_col: str, b_col: str):
    """Pure-Catalyst dot product over two array columns (reference
    ``dot()``, R/dot.R:11-13) — used where staying JVM-side beats Arrow
    transfer (short vectors / already-narrow plans)."""
    return F.aggregate(
        F.zip_with(F.col(a_col), F.col(b_col), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
