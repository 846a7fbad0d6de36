"""spark-submit entry point for the repo-file linkage pipeline.

Cluster launch (the north-rule deployment shape):

    spark-submit --py-files fuzzylink_spark.zip \
        scripts/submit_link_job.py \
        --input  s3://bucket/repo_files/        \
        --output s3://bucket/entity_clusters/   \
        --format iceberg --work-dir s3://bucket/link_ckpt/

Local smoke:

    spark-submit scripts/submit_link_job.py \
        --input /tmp/repo_files.parquet --output /tmp/clusters

Reads the (repo, path, commit, lang, content) table, runs blocking ->
tiled GEMM featurization -> EM calibration -> expected-F1 cutoff ->
connected components, writes the cluster assignment (file_id, cluster,
content_sha256) plus lineage/metrics when --work-dir is given.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description="fuzzylink-spark repo-file linkage")
    p.add_argument("--input", required=True, help="input table path")
    p.add_argument("--output", required=True, help="output assignment path")
    p.add_argument("--format", default="parquet", choices=["parquet", "iceberg"])
    p.add_argument("--work-dir", default=None, help="checkpoint/lineage root")
    p.add_argument("--id-col", default="file_id")
    p.add_argument("--embedding-dim", type=int, default=256)
    p.add_argument("--pair-budget", type=int, default=250_000)
    p.add_argument("--learner", default="em", choices=["em", "em1d", "logit", "rf"])
    p.add_argument("--twopass", action="store_true",
                   help="histogram-first calibration + in-kernel accept "
                        "filter: the pair table never materializes "
                        "(recommended at 10^11+ candidate pairs)")
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from fuzzylink_spark.config import LinkConfig
    from fuzzylink_spark.repo_linkage import link_repo_files
    from fuzzylink_spark.sources.tables import read_repo_files

    spark = SparkSession.builder.appName("fuzzylink_link_job").getOrCreate()
    t0 = time.time()
    files = read_repo_files(spark, args.input, fmt=args.format)
    if args.id_col not in files.columns:
        # derive a stable surrogate id when the table has none
        files = files.withColumn(
            args.id_col,
            F.xxhash64("repo", "path", "commit"),
        )
    cfg = LinkConfig(
        work_dir=args.work_dir,
        embedding_dim=args.embedding_dim,
        salt_pair_threshold=args.pair_budget,
        learner=args.learner,
    )
    res = link_repo_files(spark, files, cfg, id_col=args.id_col,
                          twopass=args.twopass)
    res["assignment"].write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    summary = {
        "rows": out.count(),
        "clusters": out.select("cluster").distinct().count(),
        "cutoff": res["cutoff"],
        "wall_s": round(time.time() - t0, 1),
        "output": args.output,
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
