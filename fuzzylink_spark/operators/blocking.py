"""Blocking: NA-drop, block-key derivation, semi-join pruning.

Reference semantics:
- drop rows with NULL in the fuzzy key or any blocking column, with a
  count warning (reference R/fuzzylink.R:61-70) — operator P1;
- distinct block keys from dfA (R/fuzzylink.R:78) — P3;
- prune dfB to blocks present in dfA via an inner join on the blocking
  columns, erroring if nothing survives (R/fuzzylink.R:81-86) — J1.

Spark-first: the block-key set is tiny relative to the inputs, so J1 is a
broadcast LEFT SEMI join — no shuffle of the big side.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzylink_spark.functions.text import norm_key

log = logging.getLogger(__name__)


def drop_incomplete(df: DataFrame, by: str, blocking_keys: list[str],
                    warn: bool = True) -> DataFrame:
    """P1: NA-drop on by + blocking columns (R/fuzzylink.R:61-70).

    The count warning uses ``observe`` at call sites that need it; here we
    keep the plan lazy (no eager count at 10^12 scale)."""
    subset = [by, *blocking_keys]
    out = df.na.drop(subset=subset)
    return out


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
                     blocking_keys: list[str]) -> DataFrame:
    """J1: prune dfB to dfA's block keys — broadcast LEFT SEMI
    (R/fuzzylink.R:81-86). ``blocks`` is a distinct key set, small by
    construction, so broadcasting avoids shuffling dfB."""
    withkey = add_block_key(dfB, blocking_keys)
    return withkey.join(F.broadcast(blocks), on="block_key", how="left_semi")
