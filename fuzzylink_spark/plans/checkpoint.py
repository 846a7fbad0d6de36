"""Stage checkpointing + lineage/metrics side tables (north-rule additions).

The reference is a single in-memory run; our contract adds
resume-from-checkpoint batch semantics: every pipeline stage persists its
output as parquet under ``work_dir/<stage>/`` keyed by a fingerprint of
(stage name, config, INPUT identity via ``data_fingerprint``, upstream
fingerprints). Re-running with the same fingerprint reads the table back
instead of recomputing; changing any upstream — including the input data
itself — invalidates everything downstream (the fingerprint chains).

Two side tables are maintained:
- ``_lineage``: one row per stage run (stage, fingerprint, parent
  fingerprints, row count, wall seconds, timestamp);
- ``_metrics``: free-form per-stage metrics (e.g. per-block pair counts).

Writes go through a _SUCCESS-gated parquet directory, so a killed run never
leaves a half-written stage that a resume would trust.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


def fingerprint(*parts) -> str:
    blob = json.dumps([str(p) for p in parts], sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def data_fingerprint(df: DataFrame) -> str:
    """Cheap input-identity fingerprint, chained into the stage
    fingerprints so re-running the same config and work_dir against
    DIFFERENT inputs invalidates the checkpoints instead of silently
    resuming the previous dataset's stages.

    File-backed inputs: source files + schema + the logical plan's
    ``semanticHash`` (normalized expr ids — stable across sessions,
    distinguishes different filters/projections of the same files) —
    pure metadata, NO scan even at 10^12 rows. Known limitation: a file
    overwritten IN PLACE under the same name is not detected (neither
    mtime nor content is hashed) — use fresh paths or snapshot ids for
    mutable locations. In-memory inputs (createDataFrame) use schema +
    count + an order-insensitive content checksum (they are driver-local,
    so the scan is trivially cheap)."""
    from pyspark.sql import functions as F

    files = sorted(df.inputFiles())
    schema = df.schema.simpleString()
    if files:
        return fingerprint("files", schema, files, df.semanticHash())
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal accumulator: a long sum of 2^63-range hashes overflows
        # under ANSI mode
        F.sum(F.xxhash64(F.to_json(F.struct(*df.columns)))
              .cast("decimal(38,0)")).alias("h"),
    ).first()
    return fingerprint("checksum", schema, row["n"], row["h"])


@dataclass
class CheckpointManager:
    spark: SparkSession
    work_dir: str | None = None
    resume: bool = True
    runs: list[dict] = field(default_factory=list)

    def _path(self, stage: str, fp: str) -> str:
        return os.path.join(self.work_dir, stage, fp)

    def has(self, stage: str, fp: str) -> bool:
        if not (self.work_dir and self.resume):
            return False
        p = self._path(stage, fp)
        return os.path.exists(os.path.join(p, "_SUCCESS"))

    def materialize(self, stage: str, fp: str, df: DataFrame,
                    parents: list[str] | None = None,
                    repartition_cols: list[str] | None = None) -> DataFrame:
        """Persist ``df`` for ``stage`` (or read the prior run back).

        Without a work_dir this degrades to a no-op passthrough — the plan
        stays lazy and lineage is cut only where operators localCheckpoint.
        """
        if not self.work_dir:
            return df
        path = self._path(stage, fp)
        t0 = time.time()
        if self.has(stage, fp):
            out = self.spark.read.parquet(path)
            self.runs.append({"stage": stage, "fingerprint": fp, "resumed": True,
                              "parents": parents or [], "wall_s": 0.0,
                              "ts": time.time()})
            return out
        writer = df
        if repartition_cols:
            writer = df.repartition(*repartition_cols)
        writer.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        self.runs.append({"stage": stage, "fingerprint": fp, "resumed": False,
                          "parents": parents or [],
                          "wall_s": round(time.time() - t0, 3),
                          "ts": time.time()})
        return out

    def write_lineage(self) -> None:
        """Flush the lineage table (one row per stage run this session)."""
        if not (self.work_dir and self.runs):
            return
        rows = [
            (r["stage"], r["fingerprint"], json.dumps(r["parents"]),
             bool(r["resumed"]), float(r["wall_s"]), float(r["ts"]))
            for r in self.runs
        ]
        df = self.spark.createDataFrame(
            rows,
            schema="stage string, fingerprint string, parents string, "
                   "resumed boolean, wall_s double, ts double",
        )
        df.coalesce(1).write.mode("append").parquet(
            os.path.join(self.work_dir, "_lineage")
        )

    def write_metrics(self, stage: str, metrics_df: DataFrame) -> None:
        if not self.work_dir:
            return
        metrics_df.write.mode("append").parquet(
            os.path.join(self.work_dir, "_metrics", stage)
        )
