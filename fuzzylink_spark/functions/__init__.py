"""Scalar/vector function kernels: string distances, encoder, vector math.

All heavy kernels are exposed two ways:
- a pure-Python/NumPy function (unit-testable, used inside UDFs), and
- an Arrow-batched pandas UDF factory for use in DataFrame plans.
"""

from fuzzylink_spark.functions.strdist import (
    jaro_winkler,
    jaro_winkler_udf,
    lcs_distance,
    osa_distance,
    pair_features_udf,
    qgram_cosine_dist,
    qgram_dist,
    qgram_jaccard_dist,
)
from fuzzylink_spark.functions.vectors import (
    cosine_pairs_udf,
    embed_strings,
    embed_udf,
    l2_normalize,
)

__all__ = [
    "jaro_winkler",
    "jaro_winkler_udf",
    "osa_distance",
    "lcs_distance",
    "qgram_dist",
    "qgram_jaccard_dist",
    "qgram_cosine_dist",
    "pair_features_udf",
    "embed_strings",
    "embed_udf",
    "l2_normalize",
    "cosine_pairs_udf",
]
