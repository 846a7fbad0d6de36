"""Reference-parity API surface.

The reference exports 8 functions (NAMESPACE:3-10): ``fuzzylink``,
``get_embeddings``, ``get_similarity_matrix``, ``check_match``, ``dot``,
and 4 credential installers. This module mirrors the four dataflow
entry points with Spark-native signatures so a user of the reference can
switch call-by-call; credential installers have no equivalent by design
(no external services — the encoder is local and deterministic, the
labeler pluggable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fuzzylink_spark.functions.vectors import embed_keys

__all__ = ["get_embeddings", "get_similarity_matrix", "check_match", "dot"]


def get_embeddings(spark: SparkSession, text: list[str] | DataFrame,
                   dimensions: int = 256, key_col: str = "key") -> DataFrame:
    """Reference ``get_embeddings(text, model, dimensions)``
    (R/get_embeddings.R:21): returns DataFrame[key, embedding array<float>]
    over the distinct input strings, unit-normalized. The remote service is
    replaced by the deterministic local encoder (S4')."""
    if isinstance(text, DataFrame):
        keys = text.select(F.col(key_col).alias("key"))
    else:
        keys = spark.createDataFrame([(t,) for t in text], "key string")
    return embed_keys(keys, "key", dim=dimensions)


def get_similarity_matrix(
    spark: SparkSession,
    embeddings: DataFrame,
    strings_a: list[str] | None = None,
    strings_b: list[str] | None = None,
) -> DataFrame:
    """Reference ``get_similarity_matrix(embeddings, strings_a, strings_b)``
    (R/get_similarity_matrix.R:16-42): all-pairs cosine, returned in melted
    long form DataFrame[A, B, sim] — the dense matrix never materializes
    (its melt at R/fuzzylink.R:165 is the true relational semantics).

    BOUNDED INPUTS ONLY (like ``brute_force_topk``): the crossJoin below
    is deliberate reference parity for the exported all-pairs helper —
    output is |A| x |B| rows. For large sides use the blocking pipeline
    (``fuzzylink``) or the ANN operators instead of this helper."""
    ea = embeddings
    eb = embeddings
    if strings_a is not None:
        ea = embeddings.join(
            spark.createDataFrame([(s,) for s in strings_a], "key string"), "key",
            "left_semi",
        )
    if strings_b is not None:
        eb = embeddings.join(
            spark.createDataFrame([(s,) for s in strings_b], "key string"), "key",
            "left_semi",
        )
    from fuzzylink_spark.functions.vectors import cosine_pairs_udf

    a = ea.select(F.col("key").alias("A"), F.col("embedding").alias("_ea"))
    b = eb.select(F.col("key").alias("B"), F.col("embedding").alias("_eb"))
    return (
        a.crossJoin(b)
        .withColumn("sim", cosine_pairs_udf(F.col("_ea"), F.col("_eb")))
        .select("A", "B", "sim")
    )


def check_match(
    spark: SparkSession,
    string1: list[str],
    string2: list[str],
    labeler=None,
) -> DataFrame:
    """Reference ``check_match(string1, string2, model, ...)``
    (R/check_match.R:21): Yes/No labels per aligned pair, with the
    exact-match short-circuit (:59-63) and first-word/title-case reply
    normalization (:119). ``labeler`` defaults to the exact-only labeler;
    pass GoldLabeler/CallbackLabeler for oracle-backed labeling."""
    if len(string1) != len(string2):
        raise ValueError("string1 and string2 must have equal length "
                         "(reference check_match.R:28-30)")
    pairs = spark.createDataFrame(
        list(zip(string1, string2)), "A string, B string"
    )
    if labeler is None:
        from fuzzylink_spark.operators.labeling import ExactLabeler

        labeler = ExactLabeler()
    return labeler.label_pairs(pairs)


def dot(v1, v2):
    """Reference ``dot(v1, v2)`` (R/dot.R:11-13). Accepts two Python
    sequences (returns float) or two column names (returns a Column
    expression for use in selects)."""
    if isinstance(v1, str) and isinstance(v2, str):
        from fuzzylink_spark.functions.vectors import dot_col

        return dot_col(v1, v2)
    return float(sum(float(x) * float(y) for x, y in zip(v1, v2)))
