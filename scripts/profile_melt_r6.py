"""Round-6 melt isolation: what share of the q1 melt job is upstream
planning, Python kernel compute, Arrow->JVM decode, and count/persist.
Monkeypatches the kernel factory with cheaper variants (guide §1.4 noop).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from fuzzylink_spark.config import LinkConfig  # noqa: E402
from fuzzylink_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark("fuzzylink_profile_melt", master=f"local[{cpus}]",
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

from fuzzylink_spark.operators.blocking import add_block_key, drop_incomplete  # noqa: E402
from fuzzylink_spark.operators.candidates import unique_keys_per_block  # noqa: E402
from fuzzylink_spark.operators import features as feat  # noqa: E402
from fuzzylink_spark.functions.vectors import embed_strings  # noqa: E402

a = add_block_key(drop_incomplete(dfa, "name", ["lang"], name="dfA"), ["lang"])
b = add_block_key(drop_incomplete(dfb, "name", ["lang"], name="dfB"), ["lang"])
uA = unique_keys_per_block(a, "name").persist()
uB = unique_keys_per_block(b, "name").persist()
uA.count(); uB.count()
salt_plan = feat.block_salt_plan(uA, uB, cfg.salt_pair_threshold,
                                 target_cells=sc.defaultParallelism * 3).persist()
salt_plan.count()

dim, ngrams, eseed = cfg.embedding_dim, cfg.encoder_ngrams, cfg.encoder_seed


def encoder(keys_batch):
    return embed_strings(keys_batch, dim=dim, ngrams=ngrams, seed=eseed)


def timeit(name, df, action="noop", reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        if action == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"{best:7.3f}s  {name}")


melt = feat.cogrouped_pair_features(
    uA, uB, encoder=encoder, pair_budget=cfg.salt_pair_threshold,
    case_insensitive=True, salt_plan=salt_plan)
timeit("full melt -> noop", melt)
timeit("full melt -> count", melt, action="count")

# pandas kernel variant
melt_pd = feat.cogrouped_pair_features(
    uA, uB, encoder=encoder, pair_budget=cfg.salt_pair_threshold,
    case_insensitive=True, salt_plan=salt_plan, arrow_melt=False)
timeit("pandas melt -> noop", melt_pd)

# upstream only: cogroup with a kernel that reads nothing, returns empty
import pyarrow as pa  # noqa: E402

_empty = pa.table({
    "block_id": pa.array([], type=pa.int32()),
    "a_id": pa.array([], type=pa.int64()),
    "b_id": pa.array([], type=pa.int64()),
    "sim": pa.array([], type=pa.float32()),
    "jw": pa.array([], type=pa.float32()),
    "exact": pa.array([], type=pa.bool_()),
})

orig_arrow_factory = feat._gemm_melt_arrow_factory


def empty_factory(encoder):
    def _melt(key, a_tbl, b_tbl):
        return _empty
    return _melt


feat._gemm_melt_arrow_factory = empty_factory
melt_empty = feat.cogrouped_pair_features(
    uA, uB, encoder=encoder, pair_budget=cfg.salt_pair_threshold,
    case_insensitive=True, salt_plan=salt_plan)
timeit("empty-kernel -> noop (upstream+task+py roundtrip)", melt_empty)


# kernel compute but rows emitted without jw (zeros): isolates JW
def nojw_factory(encoder):
    from fuzzylink_spark.operators.features import _gemm_melt_arrow_factory as _f

    def _melt(key, a_tbl, b_tbl):
        na, nb = a_tbl.num_rows, b_tbl.num_rows
        if na == 0 or nb == 0:
            return _empty
        a_keys = a_tbl.column("key").to_pylist()
        b_keys = b_tbl.column("key").to_pylist()
        A = encoder(a_keys)
        B = encoder(b_keys)
        sims = (A @ B.T).ravel()
        jw = np.zeros_like(sims)
        a_ci = a_tbl.column("ci").to_numpy(zero_copy_only=False)
        b_ci = b_tbl.column("ci").to_numpy(zero_copy_only=False)
        exact = np.repeat(a_ci, nb) == np.tile(b_ci, na)
        n = na * nb
        return pa.table({
            "block_id": pa.array(np.full(n, int(key[0].as_py()), dtype=np.int32)),
            "a_id": pa.array(np.repeat(a_tbl.column("id").to_numpy(zero_copy_only=False), nb)),
            "b_id": pa.array(np.tile(b_tbl.column("id").to_numpy(zero_copy_only=False), na)),
            "sim": pa.array(sims),
            "jw": pa.array(jw.astype(np.float32)),
            "exact": pa.array(exact),
        })
    return _melt


feat._gemm_melt_arrow_factory = nojw_factory
melt_nojw = feat.cogrouped_pair_features(
    uA, uB, encoder=encoder, pair_budget=cfg.salt_pair_threshold,
    case_insensitive=True, salt_plan=salt_plan)
timeit("no-JW kernel -> noop (all but JW)", melt_nojw)

feat._gemm_melt_arrow_factory = orig_arrow_factory
# persist+count on top of full melt
p = melt.persist()
t0 = time.time(); p.count(); print(f"{time.time()-t0:7.3f}s  full melt -> persist+count")
p.unpersist()
spark.stop()
