"""Round-6 scale probe: the bench q1/q8 shapes at ~16x the sf0.1 pair
count (replicated key space), so the round's optimizations are evidenced
beyond the 1.5M-pair bench fixture. Replication suffixes the keys (4
variants per side), so blocks grow 4x per side => ~16x pairs per block —
the same tiling/kernel path, bigger tiles.

Usage: python scripts/scale_probe_r6.py [replicas]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fuzzylink_spark.config import LinkConfig  # noqa: E402
from fuzzylink_spark.session import get_spark  # noqa: E402

REP = int(sys.argv[1]) if len(sys.argv) > 1 else 4
spark = get_spark("scale_probe_r6", master="local[32]", shuffle_partitions=32)
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
docs.count()

key = F.substring(F.col("text"), 1, 48)
side = F.pmod(F.xxhash64("source"), F.lit(2))
variants = F.explode(F.array(*[F.lit(f"#{i}") for i in range(REP)])).alias("sfx")
base_a = docs.where(side == 0).select(key.alias("k"), "lang", "doc_id")
base_b = docs.where(side == 1).select(key.alias("k"), "lang", "doc_id")
dfa = base_a.select("*", variants).select(
    F.concat("k", "sfx").alias("name"), "lang", "doc_id")
dfb = base_b.select("*", variants).select(
    F.concat("k", "sfx").alias("name"), "lang", "doc_id")
cfg = LinkConfig(by="name", blocking_keys=["lang"], embedding_dim=128,
                 blocks_are_small=True)

from fuzzylink_spark.pipeline import build_scored_pairs, fuzzylink_twopass  # noqa: E402

# warm
w = build_scored_pairs(spark, dfa.limit(400), dfb.limit(400), cfg,
                       attach_strings=False)
w.df.count()
w.release_intermediates()

for rep in range(2):
    t0 = time.time()
    sp = build_scored_pairs(spark, dfa, dfb, cfg, attach_strings=False)
    n = sp.df.count()
    dt = time.time() - t0
    print(f"q1-shape rep{rep}: {n} pairs in {dt:.2f}s = "
          f"{n/dt/1e6:.2f} M pairs/s (32 cores)")
    sp.release_intermediates()

for rep in range(2):
    t0 = time.time()
    res = fuzzylink_twopass(spark, dfa, dfb, by="name",
                            blocking_keys=["lang"], config=cfg)
    dt = time.time() - t0
    print(f"q8-shape rep{rep}: cand={res.metrics['n_candidate_pairs']:.0f} "
          f"accepted={res.metrics['n_accepted']} in {dt:.2f}s = "
          f"{res.metrics['n_candidate_pairs']/dt/1e6:.2f} M pairs/s/pass-pair")
    res.pairs.unpersist()
spark.stop()
