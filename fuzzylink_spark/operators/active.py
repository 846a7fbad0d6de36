"""Active-learning (M6) and recall-search (M7) driver loops.

Reference semantics:
- M6 (R/fuzzylink.R:249-334): repeat { score all pairs; draw a batch of
  ``al_batch`` unlabeled pairs weighted by a Gaussian kernel over
  logit(p) (most mass near p=0.5, i.e. the model's uncertainty band);
  label them with the oracle; refit; stop when the rolling mean of the
  last 5 max-abs-probability-gradients < tol, or the label budget is
  spent, or nothing is left to label }.
- M7 (R/fuzzylink.R:393-459): fix the model; repeat { find (A, block)
  groups with NO accepted match; kernel-sample unlabeled pairs from them;
  label; upsert (no refit) } until no candidates or the budget is spent.
  This spends remaining labels on recall: A-records the model currently
  leaves unmatched.

Spark shape: each iteration is a handful of DataFrame jobs; the evolving
pair table is localCheckpoint()ed per iteration to keep the upsert-join
lineage flat. Sampling uses seeded rand -> deterministic runs.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzylink_spark.config import LinkConfig
from fuzzylink_spark.operators.cutoff import expected_f1_cutoff
from fuzzylink_spark.operators.labeling import upsert_labels
from fuzzylink_spark.operators.sampling import (
    groups_without_matches,
    kernel_weight_col,
    weighted_sample_n,
)
from fuzzylink_spark.operators.scoring import LogitModel, fit_logit, fit_rf, with_match_probability

log = logging.getLogger(__name__)


def _labeled_count(pairs: DataFrame) -> int:
    return pairs.where(F.col("match").isNotNull()).count()


def _fit_model(pairs: DataFrame, config: LinkConfig):
    """Learner dispatch for the AL loop: glm or ranger, as in the
    reference (R/fuzzylink.R:233-245)."""
    if config.learner == "rf":
        return fit_rf(pairs, config.features, seed=config.seed)
    return fit_logit(pairs, config.features)


def active_learning_loop(
    pairs: DataFrame,
    labeler,
    config: LinkConfig,
    max_rounds: int = 50,
) -> tuple[DataFrame, LogitModel, list[float]]:
    """M6. ``pairs`` must carry features + a partially-filled ``match``
    column (the seed labels). Returns (labeled pairs, final model,
    gradient trace)."""
    model = _fit_model(pairs, config)
    scored = with_match_probability(pairs, model).localCheckpoint(eager=True)
    grads: list[float] = []
    for rnd in range(max_rounds):
        n_labeled = _labeled_count(scored)
        if n_labeled >= config.max_labels:
            break
        budget = min(config.al_batch, config.max_labels - n_labeled)
        w = kernel_weight_col("match_probability", config.al_kernel_sd)
        batch = weighted_sample_n(scored, w, budget, seed=config.seed + rnd)
        if batch.limit(1).count() == 0:
            break
        labels = labeler.label_pairs(batch)
        scored = upsert_labels(scored, labels)
        model = _fit_model(scored, config)
        rescored = with_match_probability(
            scored.withColumnRenamed("match_probability", "_p_old"), model
        )
        grad_row = rescored.where(F.col("match").isNull()).agg(
            F.max(F.abs(F.col("_p_old") - F.col("match_probability"))).alias("g")
        ).first()
        grad = float(grad_row["g"]) if grad_row and grad_row["g"] is not None else 0.0
        grads.append(grad)
        scored = rescored.drop("_p_old").localCheckpoint(eager=True)
        window = grads[-config.al_rolling_window:]
        if (len(window) >= config.al_rolling_window
                and sum(window) / len(window) < config.al_grad_tol):
            break
    return scored, model, grads


def recall_search_loop(
    scored: DataFrame,
    labeler,
    config: LinkConfig,
    cutoff: float | None = None,
    max_rounds: int = 50,
) -> DataFrame:
    """M7. ``scored`` carries match_probability + match. Labels are
    upserted without refitting (the reference refits only in M6)."""
    if cutoff is None:
        cutoff = expected_f1_cutoff(scored, bins=config.cutoff_bins,
                                    fallback=config.fallback_cutoff)
    for rnd in range(max_rounds):
        n_labeled = _labeled_count(scored)
        if n_labeled >= config.max_labels:
            break
        cands = groups_without_matches(scored, cutoff)
        if cands.limit(1).count() == 0:
            break
        budget = min(config.al_batch, config.max_labels - n_labeled)
        w = kernel_weight_col("match_probability", config.al_kernel_sd)
        # dnorm underflows to exactly 0 at extreme p (|logit| > ~6 at
        # sd=0.2), which would make confidently-mis-scored pairs (the
        # recall search's whole point) permanently undrawable; a floor
        # keeps unlabeled rows drawable — E-S keys pow(U, 1/1e-300)
        # collapse to 0, so floored rows sort AFTER every
        # positive-weight row and are drawn only as budget allows
        w = w + F.when(F.col("match").isNull(), F.lit(1e-300)).otherwise(F.lit(0.0))
        batch = weighted_sample_n(cands, w, budget, seed=config.seed + 1000 + rnd)
        if batch.limit(1).count() == 0:
            break
        labels = labeler.label_pairs(batch)
        scored = upsert_labels(scored, labels).localCheckpoint(eager=True)
    return scored
