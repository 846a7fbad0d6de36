"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline figure for BASELINE purposes is candidate-pairs/sec through
the full featurization path (blocking -> salted candidate join -> embedding
join -> cosine GEMM + Jaro-Winkler in Arrow batches) — reported in the
extra key ``pairs_per_sec``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from fuzzylink_spark.config import LinkConfig  # noqa: E402
from fuzzylink_spark.session import get_spark  # noqa: E402


def tile_control(iters: int = 14) -> float:
    """Fixed-work tile-kernel control: `iters` rounds of the pipeline's own
    per-tile computation (deterministic encoder + f32 GEMM + batched JW +
    narrow-IR melt) on a constant 400x600 fixture, single process. The
    wall time measures THIS session's effective host speed — the sandbox
    box's DVFS/steal epochs swing per-core speed 2-3x between sessions, so
    BENCH comparisons divide query walls by ``control_s`` (min of the
    pre/post runs) to deflate by measured silicon speed (r4 verdict #4)."""
    import random

    import numpy as np
    import pandas as pd

    from fuzzylink_spark.functions.strdist import jaro_winkler_cross
    from fuzzylink_spark.functions.vectors import embed_strings

    rng = random.Random(0)
    words = ("key agg row scan slow fast table value part hash batch "
             "window spark order data column").split()
    xs = [" ".join(rng.choice(words) for _ in range(8))[:48] for _ in range(400)]
    ys = [" ".join(rng.choice(words) for _ in range(8))[:48] for _ in range(600)]
    ids_a = np.arange(len(xs), dtype=np.int64)
    ids_b = np.arange(len(ys), dtype=np.int64)
    na, nb = len(xs), len(ys)
    t0 = time.time()
    for _ in range(iters):
        A = embed_strings(xs, dim=128)
        B = embed_strings(ys, dim=128)
        sims = (A @ B.T).ravel()
        jw = jaro_winkler_cross([x.lower() for x in xs],
                                [y.lower() for y in ys]).ravel().astype(np.float32)
        pd.DataFrame({
            "block_id": np.zeros(na * nb, dtype=np.int32),
            "a_id": np.repeat(ids_a, nb),
            "b_id": np.tile(ids_b, na),
            "sim": sims.astype(np.float32),
            "jw": jw,
            "exact": np.repeat(ids_a, nb) == np.tile(ids_b, na),
        })
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("fuzzylink_bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb_table = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    docs.count()  # warm the scan

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    control_pre = tile_control()

    def timed_min(name: str, fn, reps: int = 2) -> None:
        """min-of-N wall time for fn() — EVERY query, not just q1/q8: this
        sandbox host's effective per-core speed swings 2-3x between DVFS
        epochs (same-session repeats of one job measured 7.0s vs 14.4s),
        so single-shot numbers are unattributable round over round;
        min-of-2 reports steady-state throughput. fn must do equal work
        each rep (no cross-rep caching)."""
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = best

    from fuzzylink_spark.pipeline import build_scored_pairs

    key = F.substring(F.col("text"), 1, 48).alias("name")
    side = F.pmod(F.xxhash64("source"), F.lit(2))
    dfa = docs.where(side == 0).select(key, "lang", "doc_id")
    dfb = docs.where(side == 1).select(key, "lang", "doc_id")
    cfg = LinkConfig(by="name", blocking_keys=["lang"], embedding_dim=128,
                 blocks_are_small=True)  # lang: declared low-cardinality

    # Warm-up: one tiny end-to-end featurize (500 docs) so whole-stage
    # codegen compilation and Python-worker startup are paid once, outside
    # the timers — q1 reports STEADY-STATE throughput, which is what a
    # long-running cluster job sees (the one-time JVM warmup is ~10 s
    # regardless of data size and would otherwise dominate small SFs).
    docs500 = docs.limit(500)
    wa = docs500.where(side == 0).select(key, "lang", "doc_id")
    wb = docs500.where(side == 1).select(key, "lang", "doc_id")
    _warm = build_scored_pairs(spark, wa, wb, cfg, attach_strings=False)
    _warm.df.count()
    _warm.release_intermediates()

    # q1: full candidate featurization (the pipeline hot path). Measures
    # the production IR: the numeric (block_id, a_id, b_id, sim, jw, exact)
    # pair table — strings rejoin from the distinct-key dictionaries only
    # at assemble/sink, never in the per-pair hot path.
    # Best of 2 runs: this sandbox shares a host whose effective per-core
    # speed swings 2-3x between epochs (same-session repeats measured 7.0s
    # and 14.4s); min-of-2 reports steady-state throughput instead of
    # whichever DVFS epoch the single shot landed in.
    t_q1, sp, pairs, n_pairs = None, None, None, 0
    for rep in range(2):
        if sp is not None:  # drop rep-0 caches so rep 1 does equal work
            pairs.unpersist()
            sp.release_intermediates()
        t0 = time.time()
        sp = build_scored_pairs(spark, dfa, dfb, cfg, attach_strings=False)
        pairs = sp.df.persist()
        n_pairs = pairs.count()
        dt = time.time() - t0
        t_q1 = dt if t_q1 is None or dt < t_q1 else t_q1
    timings["q1_candidate_featurize"] = t_q1
    extras["n_candidate_pairs"] = float(n_pairs)
    extras["pairs_per_sec"] = n_pairs / timings["q1_candidate_featurize"]

    # q2: EM calibration + cutoff + accept (driver loop + histogram program)
    from fuzzylink_spark.operators.cutoff import accepted_matches, expected_f1_cutoff
    from fuzzylink_spark.pipeline import fit_and_score

    def q2():
        scored, _ = fit_and_score(pairs, cfg)
        cutoff = expected_f1_cutoff(scored, bins=cfg.cutoff_bins)
        extras["n_accepted"] = float(accepted_matches(scored, cutoff).count())

    timed_min("q2_calibrate_cutoff", q2)
    pairs.unpersist()
    sp.release_intermediates()

    # q3: MinHash-LSH near-dup candidates over all documents
    from fuzzylink_spark.operators.dedup import lsh_candidate_pairs

    def q3():
        extras["n_lsh_pairs"] = float(
            lsh_candidate_pairs(docs, num_hashes=32, bands=16, shingle=5).count())

    timed_min("q3_minhash_lsh", q3)

    # q4: exact dedup
    from fuzzylink_spark.operators.dedup import exact_dedup

    timed_min("q4_exact_dedup", lambda: exact_dedup(docs).count())

    # q5: brute-force cosine top-10, 32 queries over the embeddings table
    from fuzzylink_spark.operators.similarity_search import brute_force_topk

    queries_df = emb_table.where(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    timed_min("q5_cosine_topk",
              lambda: brute_force_topk(emb_table, queries_df, k=10).count())

    # q6: near-dup clustering — LSH bucket-star edges (O(n) per bucket, not
    # O(n^2)) -> connected components with driver-finished tail
    from fuzzylink_spark.operators.clustering import connected_components
    from fuzzylink_spark.operators.dedup import lsh_bucket_star_edges

    def q6():
        edges = lsh_bucket_star_edges(docs, num_hashes=16, bands=8, shingle=5)
        connected_components(edges).count()

    timed_min("q6_connected_components", q6)

    # q7: text analysis sweep (lang id + quality + tokens + fingerprint)
    from fuzzylink_spark.functions.text import (
        lang_id,
        quality_score,
        rolling_fingerprint,
        token_count,
    )

    timed_min("q7_text_analysis", lambda: docs.select(
        "doc_id",
        token_count("text").alias("n_tok"),
        lang_id("text").alias("lang_pred"),
        quality_score("text").alias("q"),
        rolling_fingerprint("text").alias("fp"),
    ).count())

    # q8: two-pass linkage (histogram-first calibration + in-kernel accept
    # filter) — the 10^12-pair plan where the pair table never materializes.
    # Best of 2 (same DVFS-noise rationale as q1).
    from fuzzylink_spark.pipeline import fuzzylink_twopass

    t_q8 = None
    for rep in range(2):
        t0 = time.time()
        res = fuzzylink_twopass(spark, dfa, dfb, by="name",
                                blocking_keys=["lang"], config=cfg)
        extras["n_accepted_twopass"] = float(res.metrics["n_accepted"])
        dt = time.time() - t0
        t_q8 = dt if t_q8 is None or dt < t_q8 else t_q8
        res.pairs.unpersist()
    timings["q8_twopass_link"] = t_q8

    control_post = tile_control()
    extras["control_s"] = min(control_pre, control_post)
    total = sum(timings.values())
    out = {
        "metric": "bench_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "cpus": int(cpus),
        **{k: round(v, 3) for k, v in extras.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
