"""Table input with schema validation (reference S1/S2).

The reference takes in-memory data.frames and validates that the fuzzy key
column exists (R/fuzzylink.R:48-53). Here inputs are parquet (or, on a real
cluster, Iceberg) tables; ``read_table`` validates required columns before
any plan is built, and ``read_repo_files`` asserts the north-rule input
shape (repo, path, commit, lang, content).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REPO_FILES_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def validate_columns(df: DataFrame, required: list[str], name: str = "input") -> DataFrame:
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(
            f"{name} is missing required column(s) {missing}; has {df.columns}"
        )
    return df


def read_table(spark: SparkSession, path: str, required: list[str] | None = None,
               fmt: str = "parquet", **options) -> DataFrame:
    """S1 source reader. Formats:

    - ``parquet`` (default) / ``orc``: columnar scans with predicate +
      projection pushdown — the production formats;
    - ``iceberg``: table-format load (partition pruning + snapshots; needs
      the runtime jars on a real cluster);
    - ``csv`` / ``json``: ingestion-side formats. Schema inference costs an
      extra pass — pass ``schema=`` (a DDL string or StructType, applied
      via ``DataFrameReader.schema`` and disabling inference) at scale,
      and convert to parquet/Iceberg before iterative workloads (no
      pushdown, full-row text parsing on every scan).

    ``options`` pass through to the reader; csv defaults
    (header/inferSchema true) are overridable.
    """
    schema = options.pop("schema", None)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "iceberg":
        # options pass through (snapshot-id / as-of-timestamp / branch —
        # the time-travel surface); needs iceberg-spark-runtime jars
        df = reader.options(**options).format("iceberg").load(path)
    elif fmt == "csv":
        opts = {"header": "true",
                "inferSchema": "false" if schema is not None else "true"}
        opts.update(options)
        df = reader.options(**opts).csv(path)
    elif fmt in ("json", "orc"):
        df = getattr(reader.options(**options), fmt)(path)
    else:
        df = reader.options(**options).parquet(path)
    if required:
        validate_columns(df, required, name=path)
    return df


def read_repo_files(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """North-rule input table; adds the per-row sha256 invariant column."""
    df = read_table(spark, path, required=REPO_FILES_COLUMNS, fmt=fmt)
    return df.withColumn("content_sha256", F.sha2(F.col("content"), 256))
