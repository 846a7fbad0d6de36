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


def test_repo_files_twopass_al_f1(spark):
    """Round-3: the oracle-in-the-loop accuracy mode composed with the
    two-pass scale mode on the north-rule input shape — pairwise F1 gate
    with the pair table never materializing."""
    from fuzzylink_spark import LinkConfig
    from fuzzylink_spark.operators.labeling import GoldLabeler
    from fuzzylink_spark.repo_linkage import file_key

    files, gold_pairs, _gold_assign = repo_files(spark, n_clusters=30)
    idn = files.withColumn("name", file_key()).select("file_id", "name")
    gold_names = (
        gold_pairs
        .join(idn.withColumnRenamed("file_id", "a")
              .withColumnRenamed("name", "a_name"), "a")
        .join(idn.withColumnRenamed("file_id", "b")
              .withColumnRenamed("name", "b_name"), "b")
        .select("a_name", "b_name")
    )
    gold_sym = gold_names.unionByName(
        gold_names.select(F.col("b_name").alias("a_name"),
                          F.col("a_name").alias("b_name")))
    res = link_repo_files(
        spark, files, config=LinkConfig(learner="logit", max_labels=2000),
        twopass=True, labeler=GoldLabeler(gold_sym))
    pred_pairs = clusters_to_pairs(
        res["assignment"].select(
            F.col("file_id").alias("id"), F.col("cluster").alias("component")
        )
    )
    m = pairwise_f1(pred_pairs, gold_pairs)
    assert m["f1"] >= 0.99, m
