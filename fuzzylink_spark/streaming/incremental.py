"""Streaming operators: incremental linkage and streaming deduplication.

The reference is batch-only (R/fuzzylink.R:32-493 — no watermarks, no
event-time state), so these are engine extensions for the production
surface: a repo-file firehose that must be deduplicated and linked against
the existing entity table as it lands.

Two patterns:
- ``stream_exact_dedup``: watermark + dropDuplicatesWithinWatermark on the
  content hash — streaming-native state, bounded by the watermark delay;
- ``stream_link``: micro-batch incremental linkage via ``foreachBatch``.
  Each micro-batch runs the SAME batch featurization (cogrouped GEMM +
  JW) of the new records against the static reference side, scores with a
  pre-fit calibrator (broadcast coefficients), and appends accepted
  matches to the sink. foreachBatch is the right tool here: the per-batch
  logic is a multi-stage join pipeline, not a streaming aggregation, and
  reusing the batch operators keeps streaming/batch semantics identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzylink_spark.config import LinkConfig
from fuzzylink_spark.operators.blocking import add_block_key, drop_incomplete
from fuzzylink_spark.operators.candidates import unique_keys_per_block
from fuzzylink_spark.operators.cutoff import accepted_matches
from fuzzylink_spark.operators.features import cogrouped_pair_features
from fuzzylink_spark.operators.scoring import with_match_probability


def stream_exact_dedup(
    stream: DataFrame,
    content_col: str = "content",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each content hash within
    the watermark horizon survives. State is bounded: hashes older than
    the watermark are evicted (late duplicates beyond the delay pass
    through — the horizon is the contract)."""
    hashed = stream.withColumn("_h", F.sha2(F.col(content_col), 256))
    return hashed.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        ["_h"]
    ).drop("_h")


def stream_dedup_with_counts(
    stream: DataFrame,
    content_col: str = "content",
    id_col: str = "id",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
    evict_after_ms: int = 600_000,
):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per content hash, track (first_seen_id, n_seen) across micro-batches
    and emit an updated row whenever a batch touches the hash.

    Unlike ``dropDuplicatesWithinWatermark`` (engine-managed state, binary
    keep/drop), this keeps USER state — the canonical representative and a
    running duplicate count, i.e. streaming exact-dedup bookkeeping for a
    training-data pipeline. State is bounded: an event-time timeout evicts
    hashes ``evict_after_ms`` past the watermark (late duplicates beyond
    the horizon restart their count — the horizon is the contract, exactly
    as in ``stream_exact_dedup``)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # timestamps arrive in the Arrow batch as tz-naive values localized to
    # the SESSION timezone; capture it so the event-time anchor converts
    # to true epoch ms (a +9h session tz would otherwise hold state 9h
    # past the documented horizon)
    session_tz = stream.sparkSession.conf.get("spark.sql.session.timeZone",
                                              "UTC") or "UTC"

    # the watermark column must SURVIVE into the stateful operator (the
    # engine derives event-time timeouts from it) — keep it projected
    hashed = (
        stream.withColumn("_h", F.sha2(F.col(content_col), 256))
        .withWatermark(ts_col, watermark_delay)
        .select("_h", id_col, ts_col)
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        first, count = state.get if state.exists else (None, 0)
        max_event_ms = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            batch_min = int(pdf[id_col].min())
            first = batch_min if first is None else min(first, batch_min)
            count += len(pdf)
            ts_max = pd.Timestamp(pdf[ts_col].max())
            if ts_max.tzinfo is None:
                ts_max = ts_max.tz_localize(session_tz)
            max_event_ms = max(max_event_ms, int(ts_max.timestamp() * 1000))
        state.update((int(first), int(count)))
        # anchor the eviction to EVENT time, not the (one-batch-lagging)
        # watermark: at the first batch the watermark is still epoch 0 and
        # a watermark-relative timeout would evict everything immediately
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), max_event_ms) + evict_after_ms
        )
        yield pd.DataFrame({"h": [key[0]], "first_id": [first], "n_seen": [count]})

    return hashed.groupBy("_h").applyInPandasWithState(
        update,
        outputStructType="h string, first_id long, n_seen long",
        stateStructType="first_id long, n_seen long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def make_link_batch_fn(
    static_side: DataFrame,
    config: LinkConfig,
    model,
    cutoff: float,
    sink_fn,
):
    """Build the foreachBatch callback: score a micro-batch of new records
    against the static reference side and hand accepted matches to
    ``sink_fn(batch_id, matches_df)``.

    ``static_side`` must carry (key column named by config.by + blocking
    columns); it is typically the deduplicated entity table, reused across
    batches. The calibrator is pre-fit (batch pipeline or EM on history):
    micro-batches are too small to refit per batch, and a fixed model keeps
    streaming output deterministic and replayable.
    """
    a = add_block_key(
        drop_incomplete(static_side, config.by, config.blocking_keys),
        config.blocking_keys,
    )
    # Materialize the static side ONCE: without this, every micro-batch
    # re-evaluates the lazy plan (full scan + distinct shuffle of the
    # entity table per batch). persist + eager count pins it in cache for
    # the lifetime of the stream; at cluster scale swap for a parquet
    # checkpoint if the entity table exceeds cluster memory.
    uA = unique_keys_per_block(a, config.by).persist()
    uA.count()

    from fuzzylink_spark.functions.vectors import embed_strings

    dim, ngrams, seed = (config.embedding_dim, config.encoder_ngrams,
                         config.encoder_seed)

    def encoder(keys):
        return embed_strings(keys, dim=dim, ngrams=ngrams, seed=seed)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        b = add_block_key(
            drop_incomplete(batch_df, config.by, config.blocking_keys),
            config.blocking_keys,
        )
        uB = unique_keys_per_block(b, config.by)
        from fuzzylink_spark.operators.features import (
            attach_pair_strings,
            block_salt_plan,
            pair_dictionaries,
        )

        # per-batch tile plan, owned HERE: persisted for the batch's two
        # consumers (melt + block dictionary), released in finally so a
        # long-running stream never accumulates cached plans
        sc = uA.sparkSession.sparkContext
        plan = block_salt_plan(
            uA, uB, config.salt_pair_threshold,
            target_cells=sc.defaultParallelism * 3).persist()
        try:
            pairs = cogrouped_pair_features(
                uA, uB, encoder=encoder, pair_budget=config.salt_pair_threshold,
                case_insensitive=config.exact_case_insensitive,
                salt_plan=plan,
            )
            scored = with_match_probability(
                pairs.withColumn("score", (F.col("sim") + F.col("jw")) / 2.0), model
            )
            # filter on the numeric IR FIRST, then join strings back onto
            # the (small) accepted set only
            matches = accepted_matches(scored, cutoff, label_col="__none__")
            key_dict, block_dict = pair_dictionaries(uA, uB, plan)
            sink_fn(batch_id, attach_pair_strings(matches, key_dict, block_dict))
        finally:
            plan.unpersist()

    return process_batch


def make_cluster_update_fn(spark, assignment_dir: str,
                           max_batch_edges: int = 5_000_000):
    """foreachBatch callback maintaining an INCREMENTAL connected-components
    assignment table (id -> component, component = min id) under
    ``assignment_dir`` as accepted-match edges stream in.

    Per micro-batch (edges DataFrame[src, dst]):
      1. map both endpoints through the current assignment (unknown ids
         root themselves);
      2. union-find on the DELTA root pairs on the driver — bounded by the
         batch size, not the graph size;
      3. rewrite only the rows of components whose root changed, plus the
         new ids, appended with the batch id (latest batch wins on read).

    Per-batch cost is O(batch + members of touched components); the
    append-only layout means reads resolve the latest version per id
    (``read_cluster_assignment``) and ``compact_cluster_assignment``
    rewrites it to one row per id. At cluster scale, partition the
    assignment table by a component hash so step 3 prunes partitions.

    Step 2 COLLECTS the batch's edges to the driver — bounded by the
    micro-batch size by contract, and ENFORCED by ``max_batch_edges``:
    a batch larger than that fails loudly (with the cure: smaller
    trigger intervals / maxOffsetsPerTrigger, or the batch
    ``connected_components`` + a merge) instead of silently OOMing the
    driver."""
    from fuzzylink_spark.operators.clustering import _driver_union_find

    def process_batch(edges: DataFrame, batch_id: int) -> None:
        if edges.isEmpty():
            return
        capped = [r for r in edges.select("src", "dst")
                  .limit(max_batch_edges + 1).collect()]
        if len(capped) > max_batch_edges:
            raise ValueError(
                f"micro-batch {batch_id} exceeds max_batch_edges="
                f"{max_batch_edges}: the incremental cluster maintainer "
                "union-finds each batch's edges on the driver, which is "
                "only safe for batch-bounded edge counts. Shrink the "
                "trigger interval / source rate limit, raise "
                "max_batch_edges if driver memory allows, or run the "
                "batch connected_components operator and merge."
            )
        batch_edges = [(r["src"], r["dst"]) for r in capped]
        endpoints = sorted({n for e in batch_edges for n in e})
        try:
            current = read_cluster_assignment(spark, assignment_dir)
        except Exception:  # first batch: no table yet
            current = None
        if current is not None:
            ep_df = spark.createDataFrame([(n,) for n in endpoints], "id long")
            cur_ep = {
                r["id"]: r["component"]
                for r in current.join(F.broadcast(ep_df), "id").collect()
            }
        else:
            cur_ep = {}
        # union-find over the DELTA root pairs only (bounded by the batch)
        root_pairs = [
            (cur_ep.get(s, s), cur_ep.get(d, d)) for s, d in batch_edges
        ]
        merged = dict(_driver_union_find(root_pairs))  # old root -> new root
        changed = {old: new for old, new in merged.items() if old != new}
        new_rows = [
            (n, merged.get(cur_ep.get(n, n), cur_ep.get(n, n)))
            for n in endpoints if n not in cur_ep
        ]
        appends = []
        if changed and current is not None:
            # rewrite ONLY the members of components whose root changed —
            # a broadcast join against the (batch-bounded) remap table,
            # never a full-table collect
            remap = spark.createDataFrame(
                list(changed.items()), "component long, _new long"
            )
            appends.append(
                current.join(F.broadcast(remap), "component")
                .select("id", F.col("_new").alias("component"),
                        F.lit(batch_id).cast("long").alias("batch_id"))
            )
        if new_rows:
            appends.append(spark.createDataFrame(
                [(n, c, batch_id) for n, c in new_rows],
                schema="id long, component long, batch_id long",
            ))
        if appends:
            out = appends[0]
            for df in appends[1:]:
                out = out.unionByName(df)
            out.write.mode("append").parquet(assignment_dir)

    return process_batch


def read_cluster_assignment(spark, assignment_dir: str) -> DataFrame:
    """Latest (id, component) per id from the append-only assignment log."""
    from pyspark.sql import Window

    log_df = spark.read.parquet(assignment_dir)
    w = Window.partitionBy("id").orderBy(F.desc("batch_id"))
    return (
        log_df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("id", "component")
    )


def compact_cluster_assignment(spark, assignment_dir: str) -> None:
    """Rewrite the append-only assignment log to one row per id (run
    periodically so read-time version resolution stays cheap).

    Fully DISTRIBUTED: the deduped frame is written to a sibling temp
    directory (breaking the read-overwrite-same-path cycle), then swapped
    in with Hadoop FileSystem renames — works on HDFS/local alike and
    never collects the assignment table to the driver (at 10^9 ids the
    old collect()-based rewrite was a guaranteed driver OOM).

    Crash recovery: a death between the two renames leaves the complete
    table under the ``__compact_old`` sibling; re-running compaction (or
    any call to this function) restores it first. Readers racing the
    swap window can observe a missing directory for the instant between
    the renames — schedule compaction off the read path, as with any
    non-transactional table layout (Iceberg/Delta commits remove even
    that window on a real deployment)."""
    tmp_dir = assignment_dir.rstrip("/") + "__compact_tmp"
    old_dir = assignment_dir.rstrip("/") + "__compact_old"
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def _path(p):
        return jvm.org.apache.hadoop.fs.Path(p)

    fs = _path(assignment_dir).getFileSystem(conf)
    # heal a previous crash between the renames: the old dir holds the
    # last complete table
    if not fs.exists(_path(assignment_dir)) and fs.exists(_path(old_dir)):
        if not fs.rename(_path(old_dir), _path(assignment_dir)):
            raise OSError(
                f"compact: recovery rename {old_dir} -> {assignment_dir} failed")
    latest = read_cluster_assignment(spark, assignment_dir).withColumn(
        "batch_id", F.lit(-1).cast("long")
    )
    latest.write.mode("overwrite").parquet(tmp_dir)
    # swap: current -> old, tmp -> current, drop old
    fs.delete(_path(old_dir), True)
    if not fs.rename(_path(assignment_dir), _path(old_dir)):
        raise OSError(f"compact: rename {assignment_dir} -> {old_dir} failed")
    if not fs.rename(_path(tmp_dir), _path(assignment_dir)):
        # roll back so the table stays readable
        fs.rename(_path(old_dir), _path(assignment_dir))
        raise OSError(f"compact: rename {tmp_dir} -> {assignment_dir} failed")
    fs.delete(_path(old_dir), True)


def stream_link(
    stream: DataFrame,
    static_side: DataFrame,
    config: LinkConfig,
    model,
    cutoff: float,
    sink_fn,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Wire the incremental linkage onto a stream: returns the started
    StreamingQuery. ``checkpoint_dir`` gives exactly-once micro-batch
    replay (the engine re-runs an interrupted batch; sink_fn must be
    idempotent on batch_id, e.g. overwrite-by-batch parquet)."""
    writer = (
        stream.writeStream.foreachBatch(
            make_link_batch_fn(static_side, config, model, cutoff, sink_fn)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
