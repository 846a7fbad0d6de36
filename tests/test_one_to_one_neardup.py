"""Mutual-best 1:1 matching and the one-call near-dup dedup wrapper."""

from __future__ import annotations

from pyspark.sql import functions as F

from fuzzylink_spark.operators.cutoff import mutual_best_matches
from fuzzylink_spark.operators.dedup import near_dup_dedup


def test_mutual_best_kills_second_best(spark):
    rows = [
        ("a1", "b1", 0.95),   # mutual best  -> kept
        ("a1", "b2", 0.90),   # a1's 2nd     -> dropped
        ("a2", "b2", 0.92),   # mutual best  -> kept
        ("a3", "b2", 0.80),   # b2's 2nd     -> dropped
        ("a4", "b4", 0.70),   # only pair    -> kept
    ]
    df = spark.createDataFrame(rows, "A string, B string, match_probability double")
    got = {(r["A"], r["B"]) for r in mutual_best_matches(df).collect()}
    assert got == {("a1", "b1"), ("a2", "b2"), ("a4", "b4")}


def test_mutual_best_deterministic_on_ties(spark):
    rows = [("a1", "b1", 0.9), ("a1", "b0", 0.9)]  # tie -> smaller B wins
    df = spark.createDataFrame(rows, "A string, B string, match_probability double")
    got = [(r["A"], r["B"]) for r in mutual_best_matches(df).collect()]
    assert got == [("a1", "b0")]


def test_near_dup_dedup_wrapper(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base), (1, base),                           # exact dup
        (2, base.replace("quick", "quik")),             # near dup
        (3, "completely unrelated text about spark aqe and shuffle skew"),
        (4, "another unique document talking about watermarks and state"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = near_dup_dedup(df, jaccard_threshold=0.6)
    kept = {r["doc_id"]: (r["dup_cluster"], r["n_dupes"]) for r in out.collect()}
    assert set(kept) == {0, 3, 4}          # 1 and 2 folded into 0's cluster
    assert kept[0][1] == 3                 # cluster of three
    assert kept[3][1] == 1 and kept[4][1] == 1
