"""Streaming operators + checkpoint/resume semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fuzzylink_spark.config import LinkConfig
from fuzzylink_spark.operators.scoring import LogitModel
from fuzzylink_spark.pipeline import build_scored_pairs
from fuzzylink_spark.plans.checkpoint import CheckpointManager
from fuzzylink_spark.sources.synth import presidents
from fuzzylink_spark.streaming.incremental import stream_exact_dedup, stream_link


def test_stream_exact_dedup(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    rows1 = [(1, "2024-01-01 00:00:00", "same content"),
             (2, "2024-01-01 00:00:10", "same content"),
             (3, "2024-01-01 00:00:20", "other content")]
    spark.createDataFrame(rows1, "id long, ts string, content string") \
        .withColumn("ts", F.to_timestamp("ts")).write.parquet(src, mode="append")
    stream = spark.readStream.schema("id long, ts timestamp, content string").parquet(src)
    dedup = stream_exact_dedup(stream, watermark_delay="1 hour")
    q = (dedup.writeStream.format("memory").queryName("dedup_out")
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination(120)
    out = spark.sql("select * from dedup_out").collect()
    contents = sorted(r["content"] for r in out)
    assert contents == ["other content", "same content"]


def test_stream_link_microbatch(spark, tmp_path):
    dfa, dfb, _gold = presidents(spark)
    src = str(tmp_path / "stream_a")
    dfa.write.parquet(src)
    stream = spark.readStream.schema(dfa.schema).parquet(src)

    cfg = LinkConfig(by="name", blocking_keys=["state"])
    # fixed calibrator: high sim+jw -> match (streaming uses a pre-fit model)
    model = LogitModel(features=["sim", "jw"], coef=[-10.0, 6.0, 8.0])
    collected = []

    def sink(batch_id, matches):
        collected.extend(
            (r["A"], r["B"]) for r in matches.select("A", "B").collect()
        )

    q = stream_link(stream, dfb, cfg, model, cutoff=0.5, sink_fn=sink,
                    checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    got = set(collected)
    # convention: A = static reference side, B = streamed new records
    assert ("Barack Hussein Obama", "Barack Obama") in got
    # Trump blocked away (NY vs FL): no pair may involve him on either side
    assert not any("Trump" in a or "Trump" in b for a, b in got)


def test_checkpoint_resume_identical(spark, tmp_path):
    dfa, dfb, _gold = presidents(spark)
    cfg = LinkConfig(by="name", blocking_keys=["state"],
                     work_dir=str(tmp_path / "work"))

    ckpt1 = CheckpointManager(spark, cfg.work_dir, resume=True)
    out1 = build_scored_pairs(spark, dfa, dfb, cfg, ckpt=ckpt1).df
    rows1 = sorted(map(tuple, out1.select("A", "B", "block_key").collect()))
    assert all(not r["resumed"] for r in ckpt1.runs)

    # second run resumes from the persisted stage outputs
    ckpt2 = CheckpointManager(spark, cfg.work_dir, resume=True)
    out2 = build_scored_pairs(spark, dfa, dfb, cfg, ckpt=ckpt2).df
    rows2 = sorted(map(tuple, out2.select("A", "B", "block_key").collect()))
    assert rows1 == rows2
    pair_runs = [r for r in ckpt2.runs if r["stage"] == "pairs"]
    assert pair_runs and all(r["resumed"] for r in pair_runs)

    # changed config -> different fingerprint -> recompute, not stale reuse
    cfg3 = LinkConfig(by="name", blocking_keys=["state"],
                      work_dir=cfg.work_dir, embedding_dim=64)
    ckpt3 = CheckpointManager(spark, cfg.work_dir, resume=True)
    build_scored_pairs(spark, dfa, dfb, cfg3, ckpt=ckpt3)
    pair_runs3 = [r for r in ckpt3.runs if r["stage"] == "pairs"]
    assert pair_runs3 and all(not r["resumed"] for r in pair_runs3)


def test_lineage_table_written(spark, tmp_path):
    dfa, dfb, _gold = presidents(spark)
    cfg = LinkConfig(by="name", work_dir=str(tmp_path / "work"))
    ckpt = CheckpointManager(spark, cfg.work_dir, resume=True)
    build_scored_pairs(spark, dfa, dfb, cfg, ckpt=ckpt)
    ckpt.write_lineage()
    lineage = spark.read.parquet(os.path.join(cfg.work_dir, "_lineage"))
    stages = {r["stage"] for r in lineage.collect()}
    assert "pairs" in stages and "embeddings" in stages
    assert lineage.where("wall_s < 0").count() == 0


def test_stream_static_side_scanned_once(spark, tmp_path):
    """The static (entity) side must be materialized once, not re-scanned
    per micro-batch (round-1 verdict): an accumulator inside a mapInPandas
    wrapper over the static side counts physical scans across two batches."""
    from fuzzylink_spark.streaming.incremental import make_link_batch_fn

    dfa, dfb, _gold = presidents(spark)
    n_static = dfb.count()
    acc = spark.sparkContext.accumulator(0)

    def counting(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    static = dfb.mapInPandas(counting, schema=dfb.schema)
    cfg = LinkConfig(by="name", blocking_keys=["state"])
    model = LogitModel(features=["sim", "jw"], coef=[-10.0, 6.0, 8.0])
    batch_fn = make_link_batch_fn(static, cfg, model, cutoff=0.5,
                                  sink_fn=lambda bid, df: df.count())
    after_setup = acc.value
    assert after_setup == n_static  # eager persist scanned it exactly once
    batch_fn(dfa, 0)
    batch_fn(dfa, 1)
    assert acc.value == n_static  # two batches: zero additional scans


def test_stream_dedup_with_counts_stateful(spark, tmp_path):
    """applyInPandasWithState operator: per-content-hash user state
    (first_seen_id, n_seen) survives across micro-batches and emits
    running duplicate counts."""
    from fuzzylink_spark.streaming.incremental import stream_dedup_with_counts

    src = str(tmp_path / "in")
    os.makedirs(src)
    ckpt = str(tmp_path / "ck")

    collected = []

    def run_batch(rows):
        spark.createDataFrame(rows, "id long, ts string, content string") \
            .withColumn("ts", F.to_timestamp("ts")).write.parquet(src, mode="append")
        stream = spark.readStream.schema("id long, ts timestamp, content string").parquet(src)
        out = stream_dedup_with_counts(stream, id_col="id")
        q = (out.writeStream.foreachBatch(
                lambda df, bid: collected.extend(df.collect()))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).outputMode("update").start())
        q.awaitTermination(120)

    run_batch([(5, "2024-01-01 00:00:00", "dup content"),
               (2, "2024-01-01 00:00:05", "dup content"),
               (9, "2024-01-01 00:00:10", "unique one")])
    run_batch([(7, "2024-01-01 00:01:00", "dup content")])

    rows = collected
    # last emitted state per hash wins
    latest = {}
    for r in rows:
        latest[r["h"]] = (r["first_id"], max(r["n_seen"],
                                             latest.get(r["h"], (0, 0))[1]))
    by_count = sorted(latest.values())
    assert (2, 3) in by_count     # 'dup content': first id 2, seen 3x across batches
    assert (9, 1) in by_count     # 'unique one'


def test_incremental_cluster_maintenance(spark, tmp_path):
    """Streaming union-find sink: components merge correctly across
    micro-batches, touching only changed components per batch."""
    from fuzzylink_spark.streaming.incremental import (
        compact_cluster_assignment,
        make_cluster_update_fn,
        read_cluster_assignment,
    )

    adir = str(tmp_path / "assign")
    fn = make_cluster_update_fn(spark, adir)

    def batch(edges, bid):
        fn(spark.createDataFrame(edges, "src long, dst long"), bid)

    batch([(1, 2), (3, 4)], 0)          # {1,2}, {3,4}
    a = {r["id"]: r["component"]
         for r in read_cluster_assignment(spark, adir).collect()}
    assert a == {1: 1, 2: 1, 3: 3, 4: 3}

    batch([(2, 3)], 1)                   # merge -> {1,2,3,4}
    a = {r["id"]: r["component"]
         for r in read_cluster_assignment(spark, adir).collect()}
    assert a == {1: 1, 2: 1, 3: 1, 4: 1}

    batch([(10, 11), (4, 10)], 2)        # extend the merged component
    a = {r["id"]: r["component"]
         for r in read_cluster_assignment(spark, adir).collect()}
    assert a == {1: 1, 2: 1, 3: 1, 4: 1, 10: 1, 11: 1}

    compact_cluster_assignment(spark, adir)
    log_rows = spark.read.parquet(adir).count()
    assert log_rows == 6  # one row per id after compaction
    a = {r["id"]: r["component"]
         for r in read_cluster_assignment(spark, adir).collect()}
    assert a == {1: 1, 2: 1, 3: 1, 4: 1, 10: 1, 11: 1}
