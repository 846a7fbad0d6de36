"""North-rule flagship: entity resolution over repo-file tables.

Input shape (input_hint): ``(repo, path, commit, lang, content)``. The
entity surface form is the file's basename stem; blocking is the language.
Pipeline: derive keys -> fuzzylink scoring (blocking + tiled GEMM cosine +
JW + EM calibration + expected-F1 cutoff) -> accepted key pairs -> expand
to file ids -> transitive clustering via large-star/small-star connected
components -> per-file cluster assignment, preserving sha2(content, 256)
per row.

Self-linkage semantics: dfA == dfB == the distinct (key, lang) set; the
exact-match short-circuit (P7) makes identical stems trivially linked, the
scorer decides near-miss stems (clone families renamed `_v2` etc.).
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fuzzylink_spark.config import LinkConfig
from fuzzylink_spark.operators.clustering import connected_components
from fuzzylink_spark.operators.cutoff import accepted_matches, expected_f1_cutoff
from fuzzylink_spark.pipeline import build_scored_pairs, fit_and_score


def file_key(path_col: str = "path", content_col: str = "content",
             body_chars: int = 48) -> F.Column:
    """Entity key: lowercased basename stem + a normalized body prefix.

    The stem alone is ambiguous (unrelated files share names like
    ``utils`` or ``index``); clone families share near-identical content,
    so a body prefix disambiguates: clones keep jw/sim high, same-named
    strangers diverge after the stem."""
    base = F.element_at(F.split(F.col(path_col), "/"), -1)
    stem = F.lower(F.regexp_replace(base, r"\.[^.]*$", ""))
    body = F.lower(
        F.substring(
            F.regexp_replace(F.regexp_replace(F.col(content_col), r"//[^\n]*\n", " "),
                             r"\s+", " "),
            1, body_chars,
        )
    )
    return F.concat_ws(" ", stem, F.trim(body))


def link_repo_files(
    spark: SparkSession,
    files: DataFrame,
    config: LinkConfig | None = None,
    id_col: str = "file_id",
    twopass: bool = False,
    labeler=None,
) -> dict:
    """Cluster repo files into entities. Returns dict with:
    - ``assignment``: DataFrame[file_id, cluster, content_sha256]
    - ``pairs``: the scored key-pair table
    - ``cutoff``: chosen probability cutoff

    ``twopass=True`` routes through ``fuzzylink_twopass`` (histogram-first
    calibration + in-kernel accept filter): at 10^12 files the scored
    key-pair table never materializes — only accepted pairs do.
    ``labeler`` enables the oracle-in-the-loop accuracy mode on either
    path (classic: AL + recall search over the scored pair table;
    twopass with ``config.learner='logit'``: the bounded band/top-k pool).
    """
    config = replace(config or LinkConfig(), by="name", blocking_keys=["lang"])
    keyed = files.withColumn("name", file_key()).withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )
    sides = keyed.select("name", "lang").distinct()

    sp = None
    if twopass:
        from fuzzylink_spark.pipeline import fuzzylink_twopass

        res = fuzzylink_twopass(spark, sides, sides, by="name",
                                blocking_keys=["lang"], config=config,
                                labeler=labeler)
        scored, model, cutoff = res.pairs, res.model, res.cutoff
        accepted = scored  # pass 2 emits only accepted pairs
    else:
        sp = build_scored_pairs(spark, sides, sides, config,
                                labeler=labeler)
        scored, model = fit_and_score(sp.df, config, labeler)
        scored = scored.persist()
        # exclude trivial self-pairs from the cutoff search (accepted by
        # construction; they would skew the histogram) — the IR's `exact`
        # flag avoids a per-row string compare
        nontrivial = scored.where(~F.col("exact")) if "exact" in scored.columns \
            else scored.where(F.lower(F.col("A")) != F.lower(F.col("B")))
        cutoff = expected_f1_cutoff(nontrivial, bins=config.cutoff_bins,
                                    fallback=config.fallback_cutoff,
                                    strict_parity=config.cutoff_strict_parity)
        accepted = accepted_matches(scored, cutoff)

    # key pairs -> file-id edges: two joins against the (key -> id) map
    idmap = keyed.select(
        F.col(id_col).alias("fid"),
        F.lower(F.col("name")).alias("lname"),
        F.lower(F.col("lang")).alias("bk"),
    )
    acc = accepted.select(
        F.lower(F.col("A")).alias("ka"), F.lower(F.col("B")).alias("kb"),
        F.col("block_key").alias("bk"),
    )
    m1 = idmap.select(F.col("fid").alias("src"), F.col("lname").alias("ka"), "bk")
    m2 = idmap.select(F.col("fid").alias("dst"), F.col("lname").alias("kb"), "bk")
    edges_ab = (
        acc.join(m1, ["ka", "bk"]).join(m2, ["kb", "bk"])
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
    )
    # same-key same-block files are the same entity (exact key duplicates)
    from pyspark.sql import Window
    w = Window.partitionBy("lname", "bk").orderBy("fid")
    edges_same = (
        idmap.withColumn("root", F.first("fid").over(w))
        .where(F.col("fid") != F.col("root"))
        .select(F.col("root").alias("src"), F.col("fid").alias("dst"))
    )
    edges = edges_ab.unionByName(edges_same)

    assign = connected_components(edges)
    all_files = keyed.select(F.col(id_col).alias("id"), "content_sha256")
    assignment = (
        all_files.join(assign, "id", "left")
        .withColumn("cluster", F.coalesce(F.col("component"), F.col("id")))
        .select(F.col("id").alias(id_col), "cluster", "content_sha256")
    )
    if sp is not None:
        # release the upstream side/plan caches LAST: connected_components
        # has materialized every edge action over `scored` by now, so
        # nothing downstream can fall back to the un-cached upstream plan
        # and re-run the featurize GEMM (r4 advice: releasing right after
        # the cutoff search left that window open under memory pressure)
        sp.release_intermediates()
    result = {
        "assignment": assignment,
        "pairs": scored,
        "cutoff": cutoff,
        "model": model,
    }
    return result
