"""Round-2 fixes: P1 observe warning, broadcast guard, fmla features,
one-class fit errors, labeler reply validation, checkpoint data identity,
exact-match case config."""

from __future__ import annotations

import logging

import pytest
from pyspark.sql import functions as F

from fuzzylink_spark.operators.blocking import (
    drop_incomplete,
    p1_drop_warning,
    semi_join_blocks,
)


def test_p1_drop_warning_observed(spark, caplog):
    df = spark.createDataFrame(
        [("a", "x"), (None, "y"), ("c", None), ("d", "z")],
        "name string, state string",
    )
    out = drop_incomplete(df, "name", ["state"], name="dfA")
    assert out.count() == 2  # action completes the observation
    with caplog.at_level(logging.WARNING, logger="fuzzylink_spark.operators.blocking"):
        n = p1_drop_warning(out)
    assert n == 2
    assert any("Dropping 2 observation(s) with missing values from dfA" in r.message
               for r in caplog.records)


def test_p1_no_warning_when_clean(spark, caplog):
    df = spark.createDataFrame([("a", "x")], "name string, state string")
    out = drop_incomplete(df, "name", ["state"])
    assert out.count() == 1
    with caplog.at_level(logging.WARNING):
        assert p1_drop_warning(out) == 0
    assert not any("missing values" in r.message for r in caplog.records)


def test_semi_join_broadcast_guard(spark, caplog):
    dfB = spark.createDataFrame(
        [(f"k{i}", f"b{i % 7}") for i in range(50)], "name string, blk string"
    )
    blocks = spark.createDataFrame(
        [(f"b{i}",) for i in range(5)], "block_key string"
    )
    with caplog.at_level(logging.WARNING, logger="fuzzylink_spark.operators.blocking"):
        guarded = semi_join_blocks(dfB, blocks, ["blk"], broadcast_threshold=2)
    assert any("shuffle semi join" in r.message for r in caplog.records)
    plain = semi_join_blocks(dfB, blocks, ["blk"])
    assert sorted(r["name"] for r in guarded.collect()) == sorted(
        r["name"] for r in plain.collect()
    )


@pytest.fixture()
def labeled_pairs(spark):
    import random

    rng = random.Random(3)
    rows = []
    for i in range(200):
        match = i % 2 == 0
        sim = rng.uniform(0.7, 1.0) if match else rng.uniform(0.0, 0.5)
        jw = rng.uniform(0.8, 1.0) if match else rng.uniform(0.2, 0.7)
        rows.append((f"a{i}", f"b{i}", sim, jw, "Yes" if match else "No"))
    return spark.createDataFrame(
        rows, "A string, B string, sim double, jw double, match string"
    )


def test_fmla_logit_interaction(labeled_pairs):
    """fmla-style expression features: match ~ sim + jw + sim*jw
    (reference fmla arg, R/fuzzylink.R:42)."""
    from fuzzylink_spark.operators.scoring import fit_logit

    model = fit_logit(labeled_pairs, ["sim", "jw", "sim*jw"])
    assert len(model.coef) == 4
    scored = labeled_pairs.withColumn("p", model.score_col())
    agg = scored.agg(
        F.avg(F.when(F.col("match") == "Yes", F.col("p"))).alias("p_yes"),
        F.avg(F.when(F.col("match") == "No", F.col("p"))).alias("p_no"),
    ).first()
    assert agg["p_yes"] > 0.9 > 0.1 > agg["p_no"]


def test_fmla_rf_expression(labeled_pairs):
    from fuzzylink_spark.operators.scoring import fit_rf

    model = fit_rf(labeled_pairs, ["sim", "jw", "sim*jw"], num_trees=20)
    scored = model.transform_probability(labeled_pairs)
    assert "match_probability" in scored.columns
    assert "_fx2" not in scored.columns  # temp expression columns dropped
    agg = scored.agg(
        F.avg(F.when(F.col("match") == "Yes", F.col("match_probability"))).alias("py"),
        F.avg(F.when(F.col("match") == "No", F.col("match_probability"))).alias("pn"),
    ).first()
    assert agg["py"] > 0.8 > 0.2 > agg["pn"]


def test_fit_logit_one_class_raises(spark):
    from fuzzylink_spark.operators.scoring import fit_logit

    df = spark.createDataFrame(
        [("a", "a", 1.0, 1.0, "Yes")] * 5,
        "A string, B string, sim double, jw double, match string",
    )
    with pytest.raises(ValueError, match="no \\['No'\\] rows"):
        fit_logit(df, ["sim", "jw"])


def test_fit_rf_one_class_raises(spark):
    from fuzzylink_spark.operators.scoring import fit_rf

    df = spark.createDataFrame(
        [("a", "b", 0.2, 0.3, "No")] * 5,
        "A string, B string, sim double, jw double, match string",
    )
    with pytest.raises(ValueError, match="no \\['Yes'\\] rows"):
        fit_rf(df, ["sim", "jw"])


def test_callback_labeler_reply_count_mismatch(spark):
    from fuzzylink_spark.operators.labeling import CallbackLabeler

    pairs = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "A string, B string"
    )
    lab = CallbackLabeler(lambda batch: ["Yes"])  # 1 reply for 2 pairs
    with pytest.raises(ValueError, match="1 replies for 2 pairs"):
        lab.label_pairs(pairs)


def test_exact_match_case_sensitivity(spark):
    from fuzzylink_spark.operators.labeling import exact_match_col

    df = spark.createDataFrame(
        [("Smith", "smith"), ("Smith", "Smith"), ("Smith", "Jones")],
        "A string, B string",
    )
    ci = [r[0] for r in df.select(exact_match_col(True)).collect()]
    cs = [r[0] for r in df.select(exact_match_col(False)).collect()]
    assert ci == [True, True, False]
    assert cs == [False, True, False]  # reference parity (R/check_match.R:59-63)


def test_data_fingerprint_distinguishes_inputs(spark, tmp_path):
    from fuzzylink_spark.plans.checkpoint import data_fingerprint

    p1, p2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    spark.range(10).withColumn("v", F.lit("x")).write.parquet(p1)
    spark.range(20).withColumn("v", F.lit("y")).write.parquet(p2)
    d1, d1b = spark.read.parquet(p1), spark.read.parquet(p1)
    d2 = spark.read.parquet(p2)
    assert data_fingerprint(d1) == data_fingerprint(d1b)
    assert data_fingerprint(d1) != data_fingerprint(d2)
    # same files, different filter with different counts -> different
    assert data_fingerprint(d2.where("id < 5")) != data_fingerprint(d2)
    # non-file-backed inputs fall back to schema+count
    m1 = spark.createDataFrame([(1,)], "x long")
    m2 = spark.createDataFrame([(1,), (2,)], "x long")
    assert data_fingerprint(m1) != data_fingerprint(m2)


def test_checkpoint_invalidates_on_new_input(spark, tmp_path):
    """Same work_dir + config, different dfA/dfB: stages must recompute,
    not resume the previous dataset's parquet (ADVICE round 1)."""
    from fuzzylink_spark.config import LinkConfig
    from fuzzylink_spark.pipeline import build_scored_pairs

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("alpha", "s1"), ("beta", "s1"), ("gamma", "s2")],
        "name string, state string",
    ).write.parquet(src + "/a1")
    spark.createDataFrame(
        [("alpha", "s1"), ("delta", "s2")], "name string, state string"
    ).write.parquet(src + "/b1")
    spark.createDataFrame(
        [("zeta", "s3"), ("eta", "s3")], "name string, state string"
    ).write.parquet(src + "/a2")
    spark.createDataFrame(
        [("zeta", "s3"),], "name string, state string"
    ).write.parquet(src + "/b2")

    cfg = LinkConfig(by="name", blocking_keys=["state"], embedding_dim=32,
                     work_dir=str(tmp_path / "wd"))
    r1 = build_scored_pairs(
        spark, spark.read.parquet(src + "/a1"), spark.read.parquet(src + "/b1"), cfg
    ).df
    keys1 = {r["A"] for r in r1.select("A").collect()}
    r2 = build_scored_pairs(
        spark, spark.read.parquet(src + "/a2"), spark.read.parquet(src + "/b2"), cfg
    ).df
    keys2 = {r["A"] for r in r2.select("A").collect()}
    assert keys1 and keys2
    assert keys1.isdisjoint(keys2)  # r2 must NOT be a resumed copy of r1


def test_twopass_matches_classic(spark):
    """fuzzylink_twopass (histogram-first calibration + in-kernel accept
    filtering; the pair table never materializes) must reproduce the
    classic path's accepted set."""
    from pyspark.sql import functions as F

    from fuzzylink_spark.config import LinkConfig
    from fuzzylink_spark.operators.cutoff import accepted_matches, expected_f1_cutoff
    from fuzzylink_spark.pipeline import build_scored_pairs, fit_and_score, fuzzylink_twopass

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    key = F.substring(F.col("text"), 1, 48).alias("name")
    side = F.pmod(F.xxhash64("source"), F.lit(2))
    dfa = docs.where(side == 0).select(key, "lang", "doc_id")
    dfb = docs.where(side == 1).select(key, "lang", "doc_id")
    cfg = LinkConfig(by="name", blocking_keys=["lang"], embedding_dim=64)

    pairs = build_scored_pairs(spark, dfa, dfb, cfg).df
    scored, _model = fit_and_score(pairs, cfg)
    cut = expected_f1_cutoff(scored, bins=cfg.cutoff_bins)
    classic = {(r["A"], r["B"])
               for r in accepted_matches(scored, cut).select("A", "B").collect()}

    res = fuzzylink_twopass(spark, dfa, dfb, by="name", blocking_keys=["lang"],
                            config=cfg)
    tp = {(r["A"], r["B"]) for r in res.pairs.select("A", "B").collect()}
    union = classic | tp
    jac = len(classic & tp) / max(len(union), 1)
    # histogram quantization can flip boundary pairs; the sets must agree
    # almost everywhere
    assert jac >= 0.95, (len(classic), len(tp), jac)
    assert "match_probability" in res.pairs.columns
    # linked output keeps every dfA row
    assert res.linked.select("name").distinct().count() == dfa.select("name").distinct().count()


def test_semi_join_known_small_declaration(spark):
    """blocks_are_small declaration skips the cardinality probe but keeps
    identical semantics in both directions."""
    dfB = spark.createDataFrame(
        [(f"k{i}", f"b{i % 5}") for i in range(30)], "name string, blk string"
    )
    blocks = spark.createDataFrame([(f"b{i}",) for i in range(3)], "block_key string")
    base = sorted(r["name"] for r in semi_join_blocks(dfB, blocks, ["blk"]).collect())
    small = sorted(r["name"] for r in
                   semi_join_blocks(dfB, blocks, ["blk"], known_small=True).collect())
    big = sorted(r["name"] for r in
                 semi_join_blocks(dfB, blocks, ["blk"], known_small=False).collect())
    assert base == small == big
