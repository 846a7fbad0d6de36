"""Sampling operators (reference O2/O3/O4 + A2 top-k seeding).

- grouped top-k (A2): k highest-sim candidates per A record seed the
  initial training set (R/fuzzylink.R:209-211);
- uniform exact-n sample (O2): caps the initial training set at 500
  (R/fuzzylink.R:213);
- kernel-weighted sample without replacement (O3/O4): active-learning
  batches drawn with probability ∝ N(logit(p); 0, sd) and zero weight on
  already-labeled rows (R/fuzzylink.R:268-282, :411-433). Implemented as
  Efraimidis-Spirakis weighted reservoir: key = U^(1/w), take top-n by key
  — one pass, fully distributed, seeded rand for determinism.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(df: DataFrame, group_col: str, order_col: str, k: int,
                    desc: bool = True,
                    tiebreak_cols: tuple[str, ...] = ("A", "B"),
                    rank_col: str | None = None) -> DataFrame:
    """A2: slice_max(order_col, n=k) per group (R/fuzzylink.R:209-211).

    ``tiebreak_cols`` makes the row_number deterministic on ties;
    ``rank_col`` optionally keeps the within-group rank in the output."""
    order = F.col(order_col).desc() if desc else F.col(order_col).asc()
    ties = [F.col(c).asc() for c in tiebreak_cols if c in df.columns]
    w = Window.partitionBy(group_col).orderBy(order, *ties)
    rn = rank_col or "_rn"
    out = df.withColumn(rn, F.row_number().over(w)).where(F.col(rn) <= k)
    return out if rank_col else out.drop(rn)


def uniform_sample_n(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """O2: exact-n uniform sample without replacement
    (slice_sample(n), R/fuzzylink.R:213)."""
    return df.orderBy(F.rand(seed), F.col("A"), F.col("B")).limit(n)


def kernel_weight_col(p_col: str = "match_probability", sd: float = 0.2,
                      label_col: str = "match") -> F.Column:
    """O4: dnorm(qlogis(p), 0, sd), zero where labeled
    (R/fuzzylink.R:269-272). Probabilities are clamped away from {0,1}."""
    p = F.least(F.greatest(F.col(p_col), F.lit(1e-9)), F.lit(1.0 - 1e-9))
    logit = F.log(p / (F.lit(1.0) - p))
    dens = F.exp(-(logit ** 2) / F.lit(2.0 * sd * sd)) / F.lit(sd * math.sqrt(2.0 * math.pi))
    return F.when(F.col(label_col).isNull(), dens).otherwise(F.lit(0.0))


def weighted_sample_n(df: DataFrame, weight_col: F.Column | str, n: int,
                      seed: int = 42) -> DataFrame:
    """O3: weighted sampling without replacement (Efraimidis-Spirakis).

    key = rand^(1/w); top-n keys are the sample. Zero/negative weights are
    excluded (matches sample(prob=0) never drawing those rows).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    keyed = df.withColumn("_w", w).where(F.col("_w") > 0)
    keyed = keyed.withColumn(
        "_skey", F.pow(F.rand(seed), F.lit(1.0) / F.col("_w"))
    )
    return (
        keyed.orderBy(F.col("_skey").desc(), F.col("A"), F.col("B"))
        .limit(n)
        .drop("_w", "_skey")
    )


def groups_without_matches(pairs: DataFrame, cutoff: float,
                           group_cols: list[str] | None = None,
                           p_col: str = "match_probability",
                           label_col: str = "match") -> DataFrame:
    """A3 recall-search group filter: keep rows of (A, block) groups with NO
    accepted match yet, then only the unlabeled rows
    (R/fuzzylink.R:399-405)."""
    group_cols = group_cols or ["A", "block_key"]
    accepted = (
        (F.col(label_col) == "Yes") | (F.col(p_col) > F.lit(cutoff))
    ).cast("int")
    w = Window.partitionBy(*group_cols)
    return (
        pairs.withColumn("_acc", F.sum(F.coalesce(accepted, F.lit(0))).over(w))
        .where((F.col("_acc") == 0) & F.col(label_col).isNull())
        .drop("_acc")
    )
