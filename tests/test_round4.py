"""Round-4 regression tests: anchor-extend exact-substring verify,
winnowing bucket-drop signalling, narrow pair IR, streaming edge guard."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_anchor_vs_dp_parity(spark):
    """Both verify kernels must emit the same pairs with the same
    common_len whenever the shared substring clears min_len (anchor
    extension equals the true LCS above the k+w-1 guarantee)."""
    import random

    from fuzzylink_spark.operators.dedup import exact_substring_pairs

    rng = random.Random(11)
    alphabet = "abcdefghij mnopqrstuv"
    shared = ["".join(rng.choice(alphabet) for _ in range(ln))
              for ln in (30, 45, 80)]
    rows = []
    did = 0
    for s in shared:
        for _ in range(2):
            pre = "".join(rng.choice(alphabet) for _ in range(rng.randrange(5, 60)))
            suf = "".join(rng.choice(alphabet) for _ in range(rng.randrange(5, 60)))
            rows.append((did, pre + s + suf))
            did += 1
    # decoys with no long shared run
    for _ in range(6):
        rows.append((did, "".join(rng.choice(alphabet) for _ in range(90))))
        did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(min_len=25, k=8, w=16)
    anchor = {(r["a"], r["b"]): r["common_len"]
              for r in exact_substring_pairs(docs, verify="anchor", **kw).collect()}
    dp = {(r["a"], r["b"]): r["common_len"]
          for r in exact_substring_pairs(docs, verify="dp", **kw).collect()}
    assert anchor == dp
    assert len(anchor) >= 3  # every planted pair found


def test_anchor_extend_scales_to_long_docs(spark):
    """Two ~100 KB documents sharing a planted 1 KB slice: the anchor
    path must verify in seconds (the DP kernel would need ~10^10 cell
    updates per pair)."""
    import random
    import time

    from fuzzylink_spark.operators.dedup import exact_substring_pairs

    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyz "
    blob = lambda n: "".join(rng.choice(alphabet) for _ in range(n))  # noqa: E731
    slice_1k = blob(1000)
    rows = [
        (1, blob(50_000) + slice_1k + blob(50_000)),
        (2, blob(60_000) + slice_1k + blob(40_000)),
        (3, blob(100_000)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(4)
    t0 = time.monotonic()
    out = {(r["a"], r["b"]): r["common_len"]
           for r in exact_substring_pairs(docs, min_len=200, k=10, w=16).collect()}
    wall = time.monotonic() - t0
    assert (1, 2) in out and out[(1, 2)] >= 1000
    assert all(p == (1, 2) for p in out)
    assert wall < 60, f"anchor verify took {wall:.1f}s on 100 KB docs"


def test_winnowing_oversized_bucket_signal(spark, caplog):
    """Fingerprints concentrated past max_bucket must WARN (not vanish
    silently), raise under on_oversized='error', and survive intact with
    max_bucket=None."""
    from fuzzylink_spark.operators.dedup import winnowing_candidate_pairs

    boiler = "this exact license boilerplate paragraph is shared verbatim"
    rows = [(i, f"doc number {i} distinct filler {boiler}") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    import logging

    with caplog.at_level(logging.WARNING, logger="fuzzylink_spark.operators.dedup"):
        bounded = winnowing_candidate_pairs(docs, k=8, w=16, max_bucket=3)
        n_bounded = bounded.count()
    assert any("max_bucket=3" in r.message and "dropped" in r.message
               for r in caplog.records)

    with pytest.raises(ValueError, match="max_bucket=3"):
        winnowing_candidate_pairs(docs, k=8, w=16, max_bucket=3,
                                  on_oversized="error").count()

    full = winnowing_candidate_pairs(docs, k=8, w=16, max_bucket=None)
    assert full.count() == 8 * 7 // 2  # all pairs share the boilerplate
    assert n_bounded < full.count()


def test_short_doc_hash_no_overflow_warning(spark):
    """The sub-k-length hashed fingerprint path must not emit numpy
    overflow RuntimeWarnings (wraps via masked Python ints)."""
    import warnings

    from fuzzylink_spark.operators.dedup import winnowing_udf

    udf_fn = winnowing_udf(k=8, w=16, hashed=True)
    # call the kernel logic directly through a local Spark run with
    # warnings-as-errors on the driver-side reference implementation
    import pandas as pd

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        docs = spark.createDataFrame(
            [(1, "short"), (2, "ab"), (3, "")], "doc_id long, text string")
        out = docs.select("doc_id", udf_fn(F.col("text")).alias("fps")).collect()
    assert all(len(r["fps"]) == 1 for r in out)


def test_pair_ir_is_narrow(spark):
    """The melt IR must stay 29 B/pair: int32 block_id, int64 ids,
    float32 sim/jw — the hot-path bandwidth contract."""
    from fuzzylink_spark.functions.vectors import embed_strings
    from fuzzylink_spark.operators.blocking import add_block_key
    from fuzzylink_spark.operators.candidates import unique_keys_per_block
    from fuzzylink_spark.operators.features import cogrouped_pair_features

    rows = [(f"name {i}", "en") for i in range(30)]
    df = add_block_key(
        spark.createDataFrame(rows, "key string, lang string"), ["lang"])
    u = unique_keys_per_block(df, "key")
    out = cogrouped_pair_features(
        u, u, encoder=lambda ks: embed_strings(ks, dim=16), pair_budget=1000)
    sch = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert sch == {"block_id": "int", "a_id": "bigint", "b_id": "bigint",
                   "sim": "float", "jw": "float", "exact": "boolean"}
    got = out.where(~F.col("exact")).limit(5).collect()
    assert got and all(-1.001 <= r["sim"] <= 1.001 for r in got)


def test_dense_block_ids_distinct_per_block(spark):
    """Salt-plan block ids are dense, distinct, and cover one-sided
    blocks (full-outer stats) — the collision-free grouping contract."""
    from fuzzylink_spark.operators.features import block_salt_plan

    uA = spark.createDataFrame(
        [("b1", "x"), ("b2", "y"), ("only_a", "z")], "block_key string, key string")
    uB = spark.createDataFrame(
        [("b1", "x"), ("b2", "q"), ("only_b", "r")], "block_key string, key string")
    plan = block_salt_plan(uA, uB).collect()
    ids = [r["block_id"] for r in plan]
    keys = {r["block_key"] for r in plan}
    assert len(ids) == len(set(ids)) == 4
    assert keys == {"b1", "b2", "only_a", "only_b"}
    assert sorted(ids) == [1, 2, 3, 4]


def test_cluster_update_batch_guard(spark, tmp_path):
    """The incremental cluster maintainer collects each batch's edges to
    the driver; an oversized batch must fail LOUDLY at the configured cap,
    not silently OOM."""
    from fuzzylink_spark.streaming.incremental import make_cluster_update_fn

    fn = make_cluster_update_fn(spark, str(tmp_path / "assign"),
                                max_batch_edges=10)
    small = spark.range(5).select(
        F.col("id").alias("src"), (F.col("id") + 100).alias("dst"))
    fn(small, 0)  # within the cap: fine
    big = spark.range(20).select(
        F.col("id").alias("src"), (F.col("id") + 100).alias("dst"))
    with pytest.raises(ValueError, match="max_batch_edges"):
        fn(big, 1)


def test_iceberg_reader_surface(spark, monkeypatch):
    """Pin the Iceberg reader plumbing without the runtime jars: format
    string, path, and option passthrough (snapshot-id time travel) must
    reach the DataFrameReader."""
    from pyspark.sql.readwriter import DataFrameReader

    from fuzzylink_spark.sources.tables import read_table

    captured = {}

    def fake_options(self, **opts):
        captured.setdefault("options", {}).update(opts)
        return self

    def fake_format(self, fmt):
        captured["format"] = fmt
        return self

    def fake_load(self, path):
        captured["path"] = path
        return spark.range(1).select(F.col("id").alias("repo"))

    monkeypatch.setattr(DataFrameReader, "options", fake_options)
    monkeypatch.setattr(DataFrameReader, "format", fake_format)
    monkeypatch.setattr(DataFrameReader, "load", fake_load)
    df = read_table(spark, "warehouse.db.repo_files", fmt="iceberg",
                    required=["repo"], **{"snapshot-id": "1234"})
    assert captured["format"] == "iceberg"
    assert captured["path"] == "warehouse.db.repo_files"
    assert captured["options"].get("snapshot-id") == "1234"
    assert df.columns == ["repo"]


def _mini_linkage_frames(spark):
    rows_a = [("alice johnson", "tx"), ("bob smith", "ca"),
              ("carol danvers", "ny"), ("dan brown", "tx")]
    rows_b = [("alice johnson", "tx"), ("bob smyth", "ca"),
              ("karol danvers", "ny"), ("daniel brown", "tx")]
    a = spark.createDataFrame(rows_a, "name string, state string")
    b = spark.createDataFrame(rows_b, "name string, state string")
    return a, b


def test_progress_callback_stage_order(spark):
    """fuzzylink/fuzzylink_twopass fire the per-stage progress callback in
    pipeline order with wall times and counts (reference `verbose`
    parity), and stay silent by default."""
    from fuzzylink_spark.config import LinkConfig
    from fuzzylink_spark.pipeline import fuzzylink, fuzzylink_twopass

    a, b = _mini_linkage_frames(spark)
    cfg = LinkConfig(embedding_dim=32)
    seen = []
    res = fuzzylink(spark, a, b, by="name", blocking_keys=["state"],
                    config=cfg,
                    progress=lambda st, w, info: seen.append((st, w, info)))
    assert [s for s, _, _ in seen] == [
        "validate", "block+featurize", "score+calibrate", "accept+assemble"]
    assert all(w >= 0 for _, w, _ in seen)
    assert seen[2][2]["cutoff"] == res.cutoff
    assert seen[3][2]["n_accepted"] == res.metrics["n_accepted"]
    res.release()

    seen2 = []
    res2 = fuzzylink_twopass(spark, a, b, by="name", blocking_keys=["state"],
                             config=cfg,
                             progress=lambda st, w, info: seen2.append((st, w, info)))
    assert [s for s, _, _ in seen2] == [
        "pass1_hist+calibrate", "pass2_accept+assemble"]
    assert seen2[0][2]["cutoff"] == res2.metrics["cutoff"]
    assert seen2[1][2]["n_accepted"] == res2.metrics["n_accepted"]
    res2.pairs.unpersist()


def test_exact_substring_dedup_one_call(spark):
    """Transitive exact-substring grouping: A~B and B~C share different
    slices, so {A,B,C} collapse to one min-id representative."""
    from fuzzylink_spark.operators.dedup import exact_substring_dedup

    s1 = "alpha beta gamma delta epsilon zeta eta theta"   # 45 chars
    s2 = "one two three four five six seven eight nine"    # 44 chars
    rows = [
        (1, f"doc a {s1} tail one"),
        (2, f"doc b {s1} and also {s2} tail two"),
        (3, f"doc c {s2} tail three"),
        (4, "completely unrelated text with nothing shared at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_substring_dedup(docs, min_len=30).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {1, 4}          # 1 represents {1,2,3}; 4 alone
    assert by_id[1]["n_dupes"] == 3
    assert by_id[4]["n_dupes"] == 1


def test_anchor_bucket_counts_docs_not_positions(spark):
    """max_bucket bounds DISTINCT DOCUMENTS per fingerprint on the anchor
    path (parity with the dp path), not position rows — a doc repeating a
    fingerprint at many positions must not trip the bucket bound."""
    from fuzzylink_spark.operators.dedup import exact_substring_pairs

    shared = "the quick brown fox jumps over the lazy dog today yes"
    rep = ("zkx qpw " * 40)  # self-repetitive filler: many repeated grams
    rows = [(1, rep + shared), (2, shared + " " + rep)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # max_bucket=2 docs: every fingerprint is shared by at most 2 docs, so
    # NOTHING may be dropped even though position rows per fp can exceed 2
    out = exact_substring_pairs(docs, min_len=30, max_bucket=2,
                                on_oversized="error").collect()
    assert {(r["a"], r["b"]) for r in out} == {(1, 2)}


def test_anchor_extend_short_identical_docs(spark):
    """Whole-doc anchors of sub-k documents must report the TRUE common
    length, not an overshoot past both string ends."""
    from fuzzylink_spark.operators.dedup import anchor_extend_udf

    df = spark.createDataFrame(
        [("abc", "abc", [{"pa": 0, "pb": 0}]),
         ("abcdef", "xabcdefy", [{"pa": 0, "pb": 1}])],
        "a string, b string, anchors array<struct<pa:int,pb:int>>")
    # k=8 > len("abc"): the whole-doc anchor must report 3, not k;
    # truncated-UNEQUAL slices (case 2 at k=8) are collision-rejected
    got8 = [r["n"] for r in df.select(
        anchor_extend_udf(8)("a", "b", "anchors").alias("n")).collect()]
    assert got8 == [3, 0]
    # k=6: case-2 slices align exactly and extend to the true length 6
    got6 = [r["n"] for r in df.select(
        anchor_extend_udf(6)("a", "b", "anchors").alias("n")).collect()]
    assert got6 == [3, 6]


def test_on_oversized_validated_regardless_of_bucket(spark):
    from fuzzylink_spark.operators.dedup import exact_substring_pairs

    docs = spark.createDataFrame([(1, "x" * 40)], "doc_id long, text string")
    with pytest.raises(ValueError, match="on_oversized"):
        exact_substring_pairs(docs, max_bucket=None, on_oversized="eror")


def test_block_ids_stable_across_parallelism(spark):
    """Dense block ids depend only on the block-key set — NOT on
    target_cells/pair_budget (which vary with cluster size) — so a
    checkpoint written at one parallelism resumes correctly at another."""
    from fuzzylink_spark.operators.features import block_salt_plan

    rows = [(f"b{i % 7}", f"k{i}") for i in range(50)]
    uA = spark.createDataFrame(rows, "block_key string, key string")
    uB = spark.createDataFrame(rows[10:], "block_key string, key string")
    m1 = {r["block_key"]: r["block_id"]
          for r in block_salt_plan(uA, uB, pair_budget=50_000).collect()}
    m2 = {r["block_key"]: r["block_id"]
          for r in block_salt_plan(uA, uB, pair_budget=1_000_000,
                                   target_cells=256).collect()}
    assert m1 == m2
