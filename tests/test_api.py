"""Reference-parity API surface (the reference's exported functions)."""

from __future__ import annotations

import numpy as np
import pytest

from fuzzylink_spark.api import check_match, dot, get_embeddings, get_similarity_matrix


def test_get_embeddings(spark):
    emb = get_embeddings(spark, ["Joe Biden", "Joe Biden", "Donald Trump"],
                         dimensions=64)
    rows = {r["key"]: r["embedding"] for r in emb.collect()}
    assert set(rows) == {"Joe Biden", "Donald Trump"}  # distinct, like unique()
    assert len(rows["Joe Biden"]) == 64
    assert np.linalg.norm(rows["Joe Biden"]) == pytest.approx(1.0, abs=1e-4)


def test_get_similarity_matrix_melted(spark):
    emb = get_embeddings(spark, ["joe biden", "joseph biden", "donald trump"], 128)
    sim = get_similarity_matrix(spark, emb,
                                strings_a=["joe biden"],
                                strings_b=["joseph biden", "donald trump"])
    got = {(r["A"], r["B"]): r["sim"] for r in sim.collect()}
    assert len(got) == 2
    assert got[("joe biden", "joseph biden")] > got[("joe biden", "donald trump")]


def test_check_match_exact_short_circuit(spark):
    out = check_match(spark, ["Apple", "Pear"], ["apple", "Orange"])
    got = {(r["A"], r["B"]): r["match"] for r in out.collect()}
    assert got[("Apple", "apple")] == "Yes"   # case-insensitive exact (:59-63)
    assert got[("Pear", "Orange")] is None    # no oracle -> unlabeled

    with pytest.raises(ValueError, match="equal length"):
        check_match(spark, ["a"], ["b", "c"])


def test_check_match_callback_normalization(spark):
    from fuzzylink_spark.operators.labeling import CallbackLabeler

    # free-text replies normalized to first word, title case (check_match.R:119)
    labeler = CallbackLabeler(lambda pairs: ["yes, definitely", "NO way"], spark)
    out = check_match(spark, ["a", "b"], ["x", "y"], labeler=labeler)
    got = {r["A"]: r["match"] for r in out.collect()}
    assert got == {"a": "Yes", "b": "No"}


def test_dot(spark):
    assert dot([1, 2, 3], [4, 5, 6]) == 32.0
    df = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0])], "u array<double>, v array<double>"
    )
    assert df.select(dot("u", "v").alias("d")).first()["d"] == 11.0


def test_fuzzylink_validates_columns(spark):
    from fuzzylink_spark import fuzzylink
    from fuzzylink_spark.sources.synth import presidents

    dfa, dfb, _ = presidents(spark)
    with pytest.raises(ValueError, match="missing required column"):
        fuzzylink(spark, dfa.drop("name"), dfb, by="name")
