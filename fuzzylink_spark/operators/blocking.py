"""Blocking: NA-drop, block-key derivation, semi-join pruning.

Reference semantics:
- drop rows with NULL in the fuzzy key or any blocking column, with a
  count warning (reference R/fuzzylink.R:61-70) — operator P1;
- distinct block keys from dfA (R/fuzzylink.R:78) — P3;
- prune dfB to blocks present in dfA via an inner join on the blocking
  columns, erroring if nothing survives (R/fuzzylink.R:81-86) — J1.

Spark-first: the block-key set is usually tiny relative to the inputs, so
J1 defaults to a broadcast LEFT SEMI join — guarded by a bounded count so
a high-cardinality blocking key falls back to a shuffle semi join instead
of OOMing the driver. The P1 drop count rides an ``observe`` node (free
with the first full pass over the data — no extra scan at 10^12 rows),
mirroring the reference's eager warning without its eager count.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from fuzzylink_spark.functions.text import norm_key

log = logging.getLogger(__name__)


def drop_incomplete(df: DataFrame, by: str, blocking_keys: list[str],
                    warn: bool = True, name: str = "input") -> DataFrame:
    """P1: NA-drop on by + blocking columns (R/fuzzylink.R:61-70).

    With ``warn`` (default) an ``Observation`` is attached BEFORE the
    filter, so the dropped-row count is measured by whichever action first
    scans the data — no eager count at 10^12 scale. Read it back with
    ``p1_drop_warning`` after a full-scan action; the observation object is
    exposed as ``result._p1_observation``.
    """
    subset = [by, *blocking_keys]
    if not warn:
        return df.na.drop(subset=subset)
    # na.drop also removes NaN rows for float columns — count them too,
    # or the warning under-reports on numeric blocking keys
    float_cols = {f.name for f in df.schema.fields
                  if f.dataType.typeName() in ("float", "double")}
    null_any = F.lit(False)
    for c in subset:
        cond = F.col(c).isNull()
        if c in float_cols:
            cond = cond | F.isnan(F.col(c))
        null_any = null_any | cond
    obs = Observation()
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(null_any.cast("long")).alias("n_dropped"),
    )
    out = observed.na.drop(subset=subset)
    out._p1_observation = obs
    out._p1_name = name
    return out


def p1_drop_warning(df: DataFrame) -> int | None:
    """Emit the reference's P1 warning ('Dropping N observation(s) with
    missing values from <name>.', R/fuzzylink.R:61-70) from the observation
    attached by ``drop_incomplete``. Call ONLY after an action has fully
    scanned the observed plan (``Observation.get`` blocks until then).
    Returns the dropped count, or None when no observation is attached."""
    obs = getattr(df, "_p1_observation", None)
    if obs is None:
        return None
    try:
        vals = obs.get
    except Exception:  # noqa: BLE001
        # best-effort by design: when the observed subtree was elided at
        # runtime (e.g. AQE empty-relation propagation after a blocking
        # semi-join leaves the side empty), the observation yields an
        # empty metrics row and the JVM-side conversion asserts — the
        # warning is cosmetic, never worth failing the pipeline for
        log.debug("P1 drop observation unavailable for %s",
                  getattr(df, "_p1_name", "input"))
        return None
    n = int(vals.get("n_dropped") or 0)
    if n > 0:
        log.warning("Dropping %d observation(s) with missing values from %s.",
                    n, getattr(df, "_p1_name", "input"))
    return n


def add_block_key(df: DataFrame, blocking_keys: list[str],
                  out_col: str = "block_key") -> DataFrame:
    """Derive a single normalized blocking key column from the blocking
    variables. No blocking variables -> constant key (global block), which
    reproduces the reference's no-blocking cross join (R/fuzzylink.R:108-111)."""
    if not blocking_keys:
        return df.withColumn(out_col, F.lit("__all__"))
    parts = [norm_key(k) for k in blocking_keys]
    return df.withColumn(out_col, F.concat_ws("\x1f", *parts))


def distinct_blocks(dfA: DataFrame, blocking_keys: list[str]) -> DataFrame:
    """P3: distinct block keys observed in dfA (R/fuzzylink.R:78)."""
    return add_block_key(dfA, blocking_keys).select("block_key").distinct()


def semi_join_blocks(dfB: DataFrame, blocks: DataFrame,
                     blocking_keys: list[str],
                     broadcast_threshold: int = 1_000_000,
                     known_small: bool | None = None) -> DataFrame:
    """J1: prune dfB to dfA's block keys (R/fuzzylink.R:81-86).

    ``blocks`` is a distinct key set — usually small, so the default is a
    broadcast LEFT SEMI join (no shuffle of dfB). A count of the distinct
    set (one aggregate over the already-deduped keys; a plain count, NOT
    limit(n).count(), whose incremental-partition execution is slower than
    the full aggregate) guards the broadcast: blocking on a
    high-cardinality key (e.g. a near-unique column) falls back to a
    shuffle semi join instead of collecting millions of keys onto the
    driver.

    ``known_small`` skips the probe entirely: True -> broadcast hint
    (caller declares low cardinality, e.g. blocking on a language code),
    False -> plain shuffle semi join.
    """
    withkey = add_block_key(dfB, blocking_keys)
    if known_small is True:
        return withkey.join(F.broadcast(blocks), on="block_key", how="left_semi")
    if known_small is False:
        return withkey.join(blocks, on="block_key", how="left_semi")
    n_bounded = blocks.count()
    if n_bounded > broadcast_threshold:
        log.warning(
            "blocking key set exceeds %d distinct values; using a shuffle "
            "semi join instead of a broadcast", broadcast_threshold,
        )
        return withkey.join(blocks, on="block_key", how="left_semi")
    return withkey.join(F.broadcast(blocks), on="block_key", how="left_semi")
