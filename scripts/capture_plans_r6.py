"""Capture .explain('formatted') for every bench query's main DataFrame.

Usage: python scripts/capture_plans_r6.py <repo_root> <out_dir> <suffix>
Run once from the round-start worktree (suffix=before) and once from the
optimized tree (suffix=after). Plans only — no actions are executed
except the tiny ones some operators need to BUILD their plan (salt-plan
stats, CC checkpoint).
"""
import io
import contextlib
import os
import sys

repo, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, repo)
os.makedirs(out_dir, exist_ok=True)

from pyspark.sql import functions as F  # noqa: E402

from fuzzylink_spark.config import LinkConfig  # noqa: E402
from fuzzylink_spark.session import get_spark  # noqa: E402

spark = get_spark("plans_r6", master="local[8]", shuffle_partitions=8)
sf_dir = "/root/testdata/sf0.1"
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
emb_table = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))

key = F.substring(F.col("text"), 1, 48).alias("name")
side = F.pmod(F.xxhash64("source"), F.lit(2))
dfa = docs.where(side == 0).select(key, "lang", "doc_id")
dfb = docs.where(side == 1).select(key, "lang", "doc_id")
cfg = LinkConfig(by="name", blocking_keys=["lang"], embedding_dim=128,
                 blocks_are_small=True)


def dump(name, df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    txt = buf.getvalue()
    print(f"{name}: exchanges={txt.count('Exchange')} "
          f"py_nodes={txt.count('EvalPython') + txt.count('MapInArrow') + txt.count('FlatMapCoGroupsIn')}")


# q1: the scored-pair IR plan
from fuzzylink_spark.pipeline import build_scored_pairs  # noqa: E402

sp = build_scored_pairs(spark, dfa, dfb, cfg, attach_strings=False)
dump("q1_candidate_featurize", sp.df)

# q2: accepted-matches plan over the (not persisted here) pair table
from fuzzylink_spark.operators.cutoff import accepted_matches  # noqa: E402
from fuzzylink_spark.pipeline import fit_and_score  # noqa: E402

pairs = sp.df.persist()
pairs.count()
scored, _model = fit_and_score(pairs, cfg)
dump("q2_calibrate_cutoff", accepted_matches(scored, 0.5))
pairs.unpersist()
sp.release_intermediates()

# q3
from fuzzylink_spark.operators.dedup import exact_dedup, lsh_bucket_star_edges, lsh_candidate_pairs  # noqa: E402

dump("q3_minhash_lsh", lsh_candidate_pairs(docs, num_hashes=32, bands=16, shingle=5))

# q4
dump("q4_exact_dedup", exact_dedup(docs))

# q5
from fuzzylink_spark.operators.similarity_search import brute_force_topk  # noqa: E402

queries_df = emb_table.where(F.col("vec_id") < 32).select(
    F.col("vec_id").alias("query_id"), "embedding")
dump("q5_cosine_topk", brute_force_topk(emb_table, queries_df, k=10))

# q6: the edge plan (CC's output plan depends on runtime driver-finish)
dump("q6_star_edges", lsh_bucket_star_edges(docs, num_hashes=16, bands=8, shingle=5))

# q7
from fuzzylink_spark.functions.text import lang_id, quality_score, rolling_fingerprint, token_count  # noqa: E402

dump("q7_text_analysis", docs.select(
    "doc_id", token_count("text").alias("n_tok"), lang_id("text").alias("lang_pred"),
    quality_score("text").alias("q"), rolling_fingerprint("text").alias("fp")))

# q8: the pass-1 histogram plan + the pass-2 accept plan shape
from fuzzylink_spark.operators.blocking import add_block_key, drop_incomplete  # noqa: E402
from fuzzylink_spark.operators.candidates import unique_keys_per_block  # noqa: E402
from fuzzylink_spark.operators.features import block_salt_plan, cogrouped_pair_features, cogrouped_pair_histogram  # noqa: E402
from fuzzylink_spark.functions.vectors import embed_strings  # noqa: E402

a = add_block_key(drop_incomplete(dfa, "name", ["lang"], warn=False), ["lang"])
b = add_block_key(drop_incomplete(dfb, "name", ["lang"], warn=False), ["lang"])
uA = unique_keys_per_block(a, "name").persist()
uB = unique_keys_per_block(b, "name").persist()
uA.count(); uB.count()
plan = block_salt_plan(uA, uB, cfg.salt_pair_threshold, target_cells=24).persist()
plan.count()


def enc(kb):
    return embed_strings(kb, dim=128, ngrams=cfg.encoder_ngrams, seed=cfg.encoder_seed)


dump("q8_twopass_hist", cogrouped_pair_histogram(
    uA, uB, encoder=enc, bins=200, pair_budget=cfg.salt_pair_threshold,
    salt_plan=plan))
dump("q8_twopass_accept", cogrouped_pair_features(
    uA, uB, encoder=enc, pair_budget=cfg.salt_pair_threshold,
    accept=(lambda x, y: x, 0.5), salt_plan=plan))
spark.stop()
