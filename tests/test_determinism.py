"""Determinism: two identical runs produce byte-identical results
(SURVEY.md §5 requirement — seeded kernels, stable keys, no wall-clock or
partition-order dependence in any output value)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fuzzylink_spark.config import LinkConfig
from fuzzylink_spark.pipeline import build_scored_pairs, fit_and_score
from fuzzylink_spark.sources.synth import voters


def test_pipeline_two_runs_identical(spark):
    dfa, dfb, _ = voters(spark, n_base=80, seed=3)
    cfg = LinkConfig(by="full_name", blocking_keys=["city"])

    def run():
        pairs = build_scored_pairs(spark, dfa, dfb, cfg).df
        scored, _m = fit_and_score(pairs, cfg)
        return sorted(
            map(tuple, scored.select(
                "A", "B", "block_key",
                F.round("sim", 9), F.round("jw", 9),
                F.round("match_probability", 9),
            ).collect())
        )

    assert run() == run()


def test_fixtures_deterministic(spark):
    a1, b1, g1 = voters(spark, n_base=40, seed=9)
    a2, b2, g2 = voters(spark, n_base=40, seed=9)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    assert sorted(map(tuple, g1.collect())) == sorted(map(tuple, g2.collect()))
