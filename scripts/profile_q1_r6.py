"""Round-6 q1 decomposition: time each driver-visible phase of
build_scored_pairs at sf0.1 (guide §1: measure first). Run:

  python scripts/profile_q1_r6.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fuzzylink_spark.config import LinkConfig  # noqa: E402
from fuzzylink_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("fuzzylink_profile", master=f"local[{cpus}]",
                  shuffle_partitions=int(cpus))
sc = spark.sparkContext

docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
docs.count()

key = F.substring(F.col("text"), 1, 48).alias("name")
side = F.pmod(F.xxhash64("source"), F.lit(2))
dfa = docs.where(side == 0).select(key, "lang", "doc_id")
dfb = docs.where(side == 1).select(key, "lang", "doc_id")
cfg = LinkConfig(by="name", blocking_keys=["lang"], embedding_dim=128,
                 blocks_are_small=True)

# warm-up identical to bench.py
from fuzzylink_spark.pipeline import build_scored_pairs  # noqa: E402

docs500 = docs.limit(500)
wa = docs500.where(side == 0).select(key, "lang", "doc_id")
wb = docs500.where(side == 1).select(key, "lang", "doc_id")
_warm = build_scored_pairs(spark, wa, wb, cfg, attach_strings=False)
_warm.df.count()
_warm.release_intermediates()

# --- decomposed run ------------------------------------------------------
from fuzzylink_spark.operators.blocking import (  # noqa: E402
    add_block_key,
    distinct_blocks,
    drop_incomplete,
    semi_join_blocks,
)
from fuzzylink_spark.operators.candidates import unique_keys_per_block  # noqa: E402
from fuzzylink_spark.operators.features import (  # noqa: E402
    block_salt_plan,
    cogrouped_pair_features,
)
from fuzzylink_spark.functions.vectors import embed_strings  # noqa: E402

for rep in range(2):
    marks = []
    t00 = time.time()

    def mark(name):
        marks.append((name, time.time() - t00))

    a_src = drop_incomplete(dfa, "name", ["lang"], name="dfA")
    a = add_block_key(a_src, ["lang"])
    blocks = distinct_blocks(dfa, ["lang"]).persist()
    b_src = drop_incomplete(dfb, "name", ["lang"], name="dfB")
    b = semi_join_blocks(b_src, blocks, ["lang"],
                         broadcast_threshold=cfg.broadcast_threshold_rows,
                         known_small=True)
    uA = unique_keys_per_block(a, "name").persist()
    uB = unique_keys_per_block(b, "name").persist()
    mark("plan_build(lazy)")
    uA.count(); uB.count()
    mark("uA/uB distinct+persist")
    sc.setJobDescription("salt_plan")
    salt_plan = block_salt_plan(
        uA, uB, cfg.salt_pair_threshold,
        target_cells=sc.defaultParallelism * 3).persist()
    salt_plan.count()
    mark("salt_plan (stats agg + rank)")
    multi_keys = (
        uA.select("block_key", "key").union(uB.select("block_key", "key"))
        .groupBy("key").agg(F.countDistinct("block_key").alias("nb"))
        .where(F.col("nb") > 1).select("key")
    )
    sc.setJobDescription("multi_keys")
    n_multi = multi_keys.count()
    mark(f"multi_keys count (n={n_multi})")

    dim, ngrams, eseed = cfg.embedding_dim, cfg.encoder_ngrams, cfg.encoder_seed

    def encoder(keys_batch):
        return embed_strings(keys_batch, dim=dim, ngrams=ngrams, seed=eseed)

    sc.setJobDescription("melt")
    scored = cogrouped_pair_features(
        uA, uB, encoder=encoder, pair_budget=cfg.salt_pair_threshold,
        case_insensitive=True, salt_plan=salt_plan)
    n = scored.count()
    mark(f"cogroup melt count (n={n})")
    sc.setJobDescription("melt_persist")
    p = scored.persist()
    n2 = p.count()
    mark("melt persist+count (2nd pass)")
    p.unpersist()
    for d in (blocks, uA, uB, salt_plan):
        d.unpersist()
    prev = 0.0
    print(f"--- rep {rep} ---")
    for name, t in marks:
        print(f"{t - prev:7.3f}s  {name}")
        prev = t
    print(f"{t:7.3f}s  TOTAL")
spark.stop()
