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
#
# The melt IR is NUMERIC: (block_id, a_id, b_id, sim, jw, exact) — ids are
# xxhash64 of the key strings, computed in Catalyst on the O(n) sides
# before the cogroup. The O(n^2) melted pair rows therefore carry five
# fixed-width columns instead of three strings, which cuts the dominant
# Arrow-serialize + JVM row-decode cost (round-1 measured 15-20 core-µs/
# pair on string melt vs ~8 µs of kernel work) AND every downstream
# shuffle/persist of the pair table. Strings rejoin via the (small)
# distinct-key dictionary only where a consumer needs them
# (``attach_pair_strings``). 64-bit id collisions merge two keys with
# probability ~n^2/2^65 — negligible below ~10^9 distinct keys per run.
# ---------------------------------------------------------------------------

PAIR_IR_SCHEMA = ("block_id long, a_id long, b_id long, "
                  "sim double, jw double, exact boolean")

_EMPTY_MELT = pd.DataFrame(
    {"block_id": pd.Series([], dtype="int64"),
     "a_id": pd.Series([], dtype="int64"),
     "b_id": pd.Series([], dtype="int64"),
     "sim": pd.Series([], dtype="float64"),
     "jw": pd.Series([], dtype="float64"),
     "exact": pd.Series([], dtype="bool")}
)


def _gemm_melt_factory(encoder=None):
    """Build the per-cell kernel. With ``encoder`` (list[str] -> unit-norm
    np.ndarray), cells carry only key strings and embeddings are computed
    in place — the shuffle never moves a vector. Without it, cells carry
    an ``embedding`` column (external/pretrained embeddings path)."""

    def _gemm_melt(key, a_pdf: pd.DataFrame, b_pdf: pd.DataFrame) -> pd.DataFrame:
        """One (block, sa, sb) tile: GEMM over the two unique-key embedding
        sets, melt to long pairs, batched JW — one Arrow batch end to end.
        This IS the reference's per-block dense matrix + melt
        (R/fuzzylink.R:113-172) without ever shuffling per-pair vectors;
        the melt emits int ids (computed upstream in Catalyst), never the
        strings themselves."""
        if len(a_pdf) == 0 or len(b_pdf) == 0:
            return _EMPTY_MELT
        a_keys = a_pdf["key"].tolist()
        b_keys = b_pdf["key"].tolist()
        if encoder is not None:
            A = encoder(a_keys)
            B = encoder(b_keys)
        else:
            A = np.asarray(a_pdf["embedding"].tolist(), dtype=np.float32)
            B = np.asarray(b_pdf["embedding"].tolist(), dtype=np.float32)
        sims = (A @ B.T).astype(np.float64).ravel()
        na, nb = len(a_pdf), len(b_pdf)
        a_low = [k.lower() for k in a_keys]
        b_low = [k.lower() for k in b_keys]
        jw = jaro_winkler_cross(a_low, b_low).ravel()
        a_rep = np.repeat(a_pdf["id"].to_numpy(np.int64), nb)
        b_rep = np.tile(b_pdf["id"].to_numpy(np.int64), na)
        exact = np.repeat(a_pdf["ci"].to_numpy(np.int64), nb) == np.tile(
            b_pdf["ci"].to_numpy(np.int64), na
        )
        return pd.DataFrame(
            {
                "block_id": np.full(na * nb, key[0], dtype=np.int64),
                "a_id": a_rep,
                "b_id": b_rep,
                "sim": sims,
                "jw": jw,
                "exact": exact,
            }
        )

    return _gemm_melt


def _salted_side(u: DataFrame, emb: DataFrame | None, block_k: DataFrame,
                 own: str, other: str, case_insensitive: bool = True) -> DataFrame:
    """Attach int ids + 2-D tile coordinates (and, on the external-
    embedding path, the vectors) to one distinct-key side.

    ``block_k`` maps block_key -> (ka, kb): the within-block pair matrix is
    tiled ka × kb (blocked-GEMM style). Each side hashes into its own
    coordinate and replicates across the other's — so replication is
    O(sqrt(cells)) per side instead of O(cells) on one side, which keeps
    the shuffled volume near-minimal for any block size.

    Ids computed here (Catalyst, O(n) side rows — never per pair):
    ``block_id``/``id`` = xxhash64 of block key / key; ``ci`` = xxhash64 of
    the lowercased key, so the kernel's exact-match flag is an int compare
    (case-sensitive mode hashes the raw key, reference parity)."""
    side = u.join(emb, "key") if emb is not None else u
    flagged = side.join(F.broadcast(block_k), "block_key", "left").na.fill(
        {"ka": 1, "kb": 1}
    )
    ci = F.xxhash64(F.lower(F.col("key"))) if case_insensitive else F.xxhash64(F.col("key"))
    own_salt = F.pmod(F.xxhash64(F.col("key")), F.col(own)).cast("int")
    return (
        flagged.withColumn("block_id", F.xxhash64(F.col("block_key")))
        .withColumn("id", F.xxhash64(F.col("key")))
        .withColumn("ci", ci)
        .withColumn("_own", own_salt)
        .withColumn("_other_raw", F.explode(F.sequence(F.lit(0), F.col(other) - 1)))
        .withColumn("_other", F.col("_other_raw").cast("int"))
        .drop("ka", "kb", "_other_raw", "block_key")
    )


def block_salt_plan(uA: DataFrame, uB: DataFrame, pair_budget: int = 50_000,
                    max_salt: int = 4096) -> DataFrame:
    """Adaptive 2-D tiling plan: per block, split the |uA| x |uB| pair
    matrix into ~(|uA|x|uB|/pair_budget) cells arranged as a ka x kb grid
    with roughly square tiles. Bounds every GEMM cell's pair count (task
    skew AND peak memory) for any blocking-key skew — lang='en' at web
    scale becomes thousands of uniform tiles."""
    ca = uA.groupBy("block_key").agg(F.count("*").alias("n_a"))
    cb = uB.groupBy("block_key").agg(F.count("*").alias("n_b"))
    cells = F.least(
        F.greatest(
            F.ceil(F.col("n_a") * F.col("n_b") / F.lit(pair_budget)), F.lit(1)
        ),
        F.lit(max_salt),
    )
    # square-ish grid: ka/kb proportional to side sizes, ka*kb >= cells
    ka = F.least(
        F.greatest(F.ceil(F.sqrt(cells * F.col("n_a") / F.greatest(F.col("n_b"), F.lit(1)))), F.lit(1)),
        F.greatest(F.col("n_a"), F.lit(1)),
    )
    kb = F.greatest(F.ceil(cells / ka), F.lit(1))
    return ca.join(cb, "block_key").select(
        "block_key", ka.cast("int").alias("ka"), kb.cast("int").alias("kb")
    )


def cogrouped_pair_features(
    uA: DataFrame,
    uB: DataFrame,
    emb: DataFrame | None = None,
    encoder=None,
    pair_budget: int = 250_000,
    max_salt: int = 4096,
    case_insensitive: bool = True,
) -> DataFrame:
    """Candidate generation + cosine + JW in ONE cogrouped Arrow pass,
    emitting the NUMERIC pair IR (block_id, a_id, b_id, sim, jw, exact).

    Inputs are distinct (block_key, key) sides, plus either ``encoder``
    (deterministic local encoder: keys are embedded inside each tile, so
    the shuffle moves only strings) or ``emb`` (external embedding table,
    joined on and shuffled with the sides). Pairs and their features are
    *born* inside the per-(block, sa, sb) GEMM tile — shuffle volume never
    includes a per-pair vector, and the melted O(n^2) rows never include a
    string (join them back with ``attach_pair_strings`` where needed).
    Every block is adaptively 2-D tiled so no tile exceeds ``pair_budget``
    pairs: uniform tasks, bounded memory.
    """
    if emb is None and encoder is None:
        raise ValueError("need an encoder or an embedding table")

    # fresh projections (new expr ids) so shared plans don't trigger
    # ambiguous-self-join resolution across the two cogroup sides
    def _fresh(df: DataFrame | None) -> DataFrame | None:
        if df is None:
            return None
        return df.select(*[F.col(c).alias(c) for c in df.columns])

    emb_used = None if encoder is not None else emb
    block_k = block_salt_plan(uA, uB, pair_budget, max_salt).persist()
    # Partition count must track TILES, not bytes: the cogroup input is a
    # few MB of strings but each tile is seconds of kernel compute, so
    # AQE's size-based coalescing would collapse it to one partition (a
    # measured 30x slowdown). An explicit repartition-by-num on the tile
    # key pins the layout — AQE leaves user-specified counts alone.
    row = block_k.agg(F.sum(F.col("ka").cast("long") * F.col("kb")).alias("c")).first()
    total_cells = int(row["c"] or 1)
    sc = uA.sparkSession.sparkContext
    # 4 partition slots per tile: tiles are seconds of kernel compute, so
    # two tiles hash-colliding into one partition creates a straggler that
    # caps scaling (measured: 99 tiles in 64 partitions left 32 cores ~40%
    # idle). Extra empty partitions cost only empty-task launches.
    n_part = int(min(max(sc.defaultParallelism * 2, total_cells * 4), 65536))

    # A side: own coordinate = row tile (ka), replicate across column tiles
    a = _salted_side(_fresh(uA), _fresh(emb_used), _fresh(block_k), own="ka",
                     other="kb", case_insensitive=case_insensitive)
    a = a.withColumnRenamed("_own", "sa").withColumnRenamed("_other", "sb")
    a = a.repartition(n_part, "block_id", "sa", "sb")
    # B side: own coordinate = column tile (kb), replicate across row tiles
    b = _salted_side(_fresh(uB), _fresh(emb_used), _fresh(block_k), own="kb",
                     other="ka", case_insensitive=case_insensitive)
    b = b.withColumnRenamed("_own", "sb").withColumnRenamed("_other", "sa")
    b = b.repartition(n_part, "block_id", "sa", "sb")
    return (
        a.groupby("block_id", "sa", "sb")
        .cogroup(b.groupby("block_id", "sa", "sb"))
        .applyInPandas(_gemm_melt_factory(encoder), schema=PAIR_IR_SCHEMA)
    )


def pair_dictionaries(uA: DataFrame, uB: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(key_dict, block_dict): the id -> string dictionaries for the pair
    IR, built from the distinct sides (O(distinct keys), tiny relative to
    the O(n^2) pair table)."""
    keys = uA.select("key").unionByName(uB.select("key")).distinct()
    key_dict = keys.select(F.xxhash64("key").alias("id"), "key")
    blocks = uA.select("block_key").unionByName(uB.select("block_key")).distinct()
    block_dict = blocks.select(
        F.xxhash64("block_key").alias("block_id"), "block_key"
    )
    return key_dict, block_dict


def attach_pair_strings(pairs: DataFrame, key_dict: DataFrame,
                        block_dict: DataFrame | None = None) -> DataFrame:
    """Join A/B key strings (and block_key) back onto the numeric pair IR.

    The dictionaries are the DISTINCT key sets — orders of magnitude
    smaller than the pair table — so AQE turns these into broadcast hash
    joins whenever they fit (no hint: at extreme key cardinality it
    falls back to a shuffle join instead of OOMing the driver). Column
    pruning drops the string columns from any downstream consumer that
    doesn't project them."""
    ka = key_dict.select(F.col("id").alias("a_id"), F.col("key").alias("A"))
    kb = key_dict.select(F.col("id").alias("b_id"), F.col("key").alias("B"))
    out = pairs.join(ka, "a_id", "left").join(kb, "b_id", "left")
    if block_dict is not None:
        out = out.join(F.broadcast(block_dict), "block_id", "left")
    return out
