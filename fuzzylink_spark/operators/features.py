"""Pair featurization: cosine similarity + lexical distances in one pass.

Replaces the reference's per-block dense GEMM + melt
(R/fuzzylink.R:113-172) and the stringdist feature mutate
(R/fuzzylink.R:174-186). The Spark formulation never materializes a
matrix: candidate pairs join their embeddings (two hash joins on the
distinct-key embedding table) and a single Arrow batch pass computes the
NumPy dot products; JW (and optionally the full RF feature set) runs in the
same candidate partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzylink_spark.functions.strdist import jaro_winkler_cross, jaro_winkler_udf, pair_features_udf, soundex_neq_col
from fuzzylink_spark.functions.vectors import cosine_pairs_udf


def attach_embeddings(pairs: DataFrame, emb: DataFrame) -> DataFrame:
    """Join the distinct-key embedding table onto both sides of the pair
    table. ``emb`` is DataFrame[key, embedding]; it is usually much smaller
    than the pair table (distinct strings only) — broadcast when it fits,
    else two shuffle hash joins on the key."""
    ea = emb.select(F.col("key").alias("A"), F.col("embedding").alias("_emb_a"))
    eb = emb.select(F.col("key").alias("B"), F.col("embedding").alias("_emb_b"))
    return pairs.join(ea, "A").join(eb, "B")


def score_pairs(pairs_with_emb: DataFrame, full_features: bool = False) -> DataFrame:
    """Compute ``sim`` (cosine, F10) and ``jw`` (F2) — plus the full
    RF feature set (F3-F8) when ``full_features`` — and drop the vectors.

    Output: pair table (A, B, block_key, sim, jw[, osa, cosine_qgram,
    jaccard_qgram, lcs, qgram, soundex_neq]) — the reference's central IR
    (R/fuzzylink.R:165-186).
    """
    df = pairs_with_emb.withColumn(
        "sim", cosine_pairs_udf(F.col("_emb_a"), F.col("_emb_b"))
    )
    if full_features:
        df = df.withColumn("_feat", pair_features_udf(F.col("A"), F.col("B")))
        df = (
            df.withColumn("jw", F.col("_feat.jw"))
            .withColumn("osa", F.col("_feat.osa"))
            .withColumn("cosine_qgram", F.col("_feat.cosine_qgram"))
            .withColumn("jaccard_qgram", F.col("_feat.jaccard_qgram"))
            .withColumn("lcs", F.col("_feat.lcs"))
            .withColumn("qgram", F.col("_feat.qgram"))
            .withColumn("soundex_neq", soundex_neq_col("A", "B"))
            .drop("_feat")
        )
    else:
        df = df.withColumn("jw", jaro_winkler_udf(F.col("A"), F.col("B")))
    return df.drop("_emb_a", "_emb_b")


# ---------------------------------------------------------------------------
# cogrouped per-block GEMM (the production hot path)
# ---------------------------------------------------------------------------


def _gemm_melt(key, a_pdf: pd.DataFrame, b_pdf: pd.DataFrame) -> pd.DataFrame:
    """One (block, salt) cell: GEMM over the two unique-key embedding sets,
    melt to long pairs, JW per pair — everything in a single Arrow batch.
    This IS the reference's per-block dense matrix + melt
    (R/fuzzylink.R:113-172) without ever shuffling per-pair vectors."""
    if len(a_pdf) == 0 or len(b_pdf) == 0:
        return pd.DataFrame(
            {"block_key": [], "A": [], "B": [], "sim": [], "jw": []}
        )
    A = np.asarray(a_pdf["embedding"].tolist(), dtype=np.float32)
    B = np.asarray(b_pdf["embedding"].tolist(), dtype=np.float32)
    sims = (A @ B.T).astype(np.float64).ravel()
    na, nb = len(a_pdf), len(b_pdf)
    a_keys = a_pdf["key"].tolist()
    b_keys = b_pdf["key"].tolist()
    a_low = [k.lower() for k in a_keys]
    b_low = [k.lower() for k in b_keys]
    jw = jaro_winkler_cross(a_low, b_low).ravel()
    return pd.DataFrame(
        {
            "block_key": np.repeat(key[0], na * nb),
            "A": np.repeat(a_keys, nb),
            "B": np.tile(b_keys, na),
            "sim": sims,
            "jw": jw,
        }
    )


def _salted_side(u: DataFrame, emb: DataFrame, block_k: DataFrame,
                 replicate: bool) -> DataFrame:
    """Attach embeddings + a salt column to one distinct-key side.

    ``block_k`` maps block_key -> k (number of sub-cells). The A side is
    split by hash(key) % k; the B side is replicated k ways, so every
    (a, b) pair meets in exactly one (block, salt) cell."""
    side = u.join(emb, "key")
    flagged = side.join(F.broadcast(block_k), "block_key", "left").na.fill({"k": 1})
    if replicate:
        return (
            flagged.withColumn(
                "_salt_raw", F.explode(F.sequence(F.lit(0), F.col("k") - 1))
            )
            .withColumn("salt", F.col("_salt_raw").cast("int"))
            .drop("k", "_salt_raw")
        )
    salt = F.pmod(F.xxhash64(F.col("key")), F.col("k"))
    return flagged.withColumn("salt", salt.cast("int")).drop("k")


def block_salt_plan(uA: DataFrame, uB: DataFrame, pair_budget: int = 50_000,
                    max_salt: int = 4096) -> DataFrame:
    """Adaptive salting plan: per block, k = ceil(|uA|x|uB| / pair_budget),
    clamped. Bounds every GEMM cell's pair count (task skew AND peak
    memory) no matter how skewed the blocking key distribution is —
    lang='en' at web scale becomes thousands of uniform cells."""
    ca = uA.groupBy("block_key").agg(F.count("*").alias("n_a"))
    cb = uB.groupBy("block_key").agg(F.count("*").alias("n_b"))
    return (
        ca.join(cb, "block_key")
        .select(
            "block_key",
            F.least(
                F.greatest(
                    F.ceil(F.col("n_a") * F.col("n_b") / F.lit(pair_budget)),
                    F.lit(1),
                ),
                F.lit(max_salt),
            ).cast("int").alias("k"),
        )
    )


def cogrouped_pair_features(
    uA: DataFrame,
    uB: DataFrame,
    emb: DataFrame,
    pair_budget: int = 50_000,
    max_salt: int = 4096,
) -> DataFrame:
    """Candidate generation + cosine + JW in ONE cogrouped Arrow pass.

    Inputs are distinct (block_key, key) sides and the distinct-key
    embedding table. Shuffle volume is |unique keys| × dim per side (the
    embeddings; B-side keys replicate k times for split blocks), never
    |pairs| × dim: pairs and their features are *born* inside the
    per-(block, salt) GEMM cell. Every block is adaptively split so no
    cell exceeds ``pair_budget`` pairs — uniform tasks, bounded memory.
    """
    # fresh projections (new expr ids) so the shared emb plan doesn't
    # trigger ambiguous-self-join resolution across the two cogroup sides
    def _fresh(df: DataFrame) -> DataFrame:
        return df.select(*[F.col(c).alias(c) for c in df.columns])

    block_k = block_salt_plan(uA, uB, pair_budget, max_salt)
    a = _salted_side(_fresh(uA), _fresh(emb), _fresh(block_k), replicate=False)
    b = _salted_side(_fresh(uB), _fresh(emb), _fresh(block_k), replicate=True)
    return (
        a.groupby("block_key", "salt")
        .cogroup(b.groupby("block_key", "salt"))
        .applyInPandas(
            _gemm_melt,
            schema="block_key string, A string, B string, sim double, jw double",
        )
    )
