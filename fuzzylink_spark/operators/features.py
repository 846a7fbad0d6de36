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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzylink_spark.functions.strdist import jaro_winkler_udf, pair_features_udf, soundex_neq_col
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
