"""North-rule flagship tests: repo-file entity resolution end to end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuzzylink_spark.operators.clustering import clusters_to_pairs, pairwise_f1
from fuzzylink_spark.repo_linkage import link_repo_files
from fuzzylink_spark.sources.synth import repo_files


@pytest.fixture(scope="module")
def linked(spark):
    files, gold_pairs, gold_assign = repo_files(spark, n_clusters=60)
    res = link_repo_files(spark, files)
    return files, gold_pairs, res


def test_repo_files_pairwise_f1(spark, linked):
    """BASELINE metric on the north-rule input shape, no oracle: pairwise
    F1 >= 0.99 at the fixed blocking key (lang)."""
    _files, gold_pairs, res = linked
    pred_pairs = clusters_to_pairs(
        res["assignment"].select(
            F.col("file_id").alias("id"), F.col("cluster").alias("component")
        )
    )
    m = pairwise_f1(pred_pairs, gold_pairs)
    assert m["f1"] >= 0.99, m


def test_repo_files_sha256_preserved(spark, linked):
    """input_hint per-row invariant: sha2(content,256) equality through the
    pipeline (every input row appears once, hash unchanged)."""
    files, _gold, res = linked
    orig = files.select("file_id", F.sha2("content", 256).alias("h"))
    out = res["assignment"].select("file_id", F.col("content_sha256").alias("h"))
    assert orig.count() == out.count()
    assert orig.exceptAll(out).count() == 0


def test_repo_files_every_file_assigned(spark, linked):
    files, _gold, res = linked
    assert res["assignment"].where(F.col("cluster").isNull()).count() == 0
    assert res["assignment"].count() == files.count()


def test_repo_files_twopass_f1(spark):
    """Two-pass mode (no materialized pair table) must hit the same
    pairwise-F1 gate on the north-rule input shape."""
    files, gold_pairs, _gold_assign = repo_files(spark, n_clusters=60)
    res = link_repo_files(spark, files, twopass=True)
    pred_pairs = clusters_to_pairs(
        res["assignment"].select(
            F.col("file_id").alias("id"), F.col("cluster").alias("component")
        )
    )
    m = pairwise_f1(pred_pairs, gold_pairs)
    assert m["f1"] >= 0.99, m
