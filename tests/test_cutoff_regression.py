"""Regression: the expected-F1 cutoff must count UNLABELED rows.

Under SQL three-valued logic, (NULL == 'Yes') is NULL, and a NULL term
voids the whole sum contribution — which silently dropped every unlabeled
pair from the tp/fp/fn running sums and made the cutoff degenerate
(accept-everything). Pin the fixed behavior on a sharply bimodal mix of
labeled and unlabeled rows."""

from __future__ import annotations

import pytest

from fuzzylink_spark.operators.cutoff import accepted_matches, expected_f1_cutoff


@pytest.fixture()
def bimodal(spark):
    rows = [(f"a{i}", f"b{i}", 0.0005, None) for i in range(2000)]
    rows += [(f"c{i}", f"d{i}", 0.99, None) for i in range(150)]
    rows += [(f"e{i}", f"e{i}", 1.0, "Yes") for i in range(10)]
    return spark.createDataFrame(
        rows, "A string, B string, match_probability double, match string"
    )


def test_cutoff_lands_in_the_gap(spark, bimodal):
    for kwargs in ({"exact": True}, {"bins": 2000}):
        cut = expected_f1_cutoff(bimodal, **kwargs)
        # the filter is strict (p > cutoff), so the boundary may sit ON the
        # low mode; what matters is the accepted set = the high mode
        assert 0.0005 <= cut <= 0.99, (kwargs, cut)
        kept = accepted_matches(bimodal, cut)
        assert kept.count() == 160, kwargs  # 150 high-p unlabeled + 10 Yes


def test_mixture2d_recovers_small_match_component(spark):
    """K=3 2-D EM with prevalence-informed restarts isolates a 1.5%-mass
    match cloud instead of splitting the majority cloud."""
    import numpy as np

    from fuzzylink_spark.operators.scoring import fit_mixture2d_em

    rng = np.random.default_rng(5)
    noise = np.column_stack([rng.normal(0.1, 0.08, 8000), rng.normal(0.55, 0.08, 8000)])
    near = np.column_stack([rng.normal(0.4, 0.1, 800), rng.normal(0.75, 0.08, 800)])
    match = np.column_stack([rng.normal(0.85, 0.05, 120), rng.normal(0.96, 0.02, 120)])
    X = np.vstack([noise, near, match])
    bins, lo, hi = 200, -1.0, 1.0
    w = (hi - lo) / bins
    from collections import Counter

    c = Counter(
        (int(min(max((x - lo) / w, 0), bins - 1)), int(min(max((y - lo) / w, 0), bins - 1)))
        for x, y in X
    )
    hist = np.array([(lo + (a + 0.5) * w, lo + (b + 0.5) * w, n) for (a, b), n in c.items()])
    model = fit_mixture2d_em(hist, k=3, prevalence_hint=120 / len(X))
    top = model.top
    assert model.pis[top] == pytest.approx(120 / len(X), rel=0.5)
    assert model.mus[top][0] == pytest.approx(0.85, abs=0.06)
    assert model.mus[top][1] == pytest.approx(0.96, abs=0.04)


def test_cutoff_from_hist_matches_spark_program(spark):
    """Two-pass mode's driver-side NumPy cutoff must agree with the Spark
    running-sum program on the same weighted histogram."""
    import random

    from fuzzylink_spark.operators.cutoff import expected_f1_cutoff_from_hist

    rng = random.Random(9)
    cells = [(round(rng.random(), 3), rng.randint(1, 50)) for _ in range(300)]
    ps = [c[0] for c in cells]
    ws = [c[1] for c in cells]
    rows = [(f"a{i}", f"b{i}", p) for i, (p, w) in enumerate(cells) for _ in range(w)]
    df = spark.createDataFrame(rows, "A string, B string, match_probability double")
    spark_cut = expected_f1_cutoff(df, label_col=None, exact=True)
    np_cut = expected_f1_cutoff_from_hist(ps, ws)
    assert abs(spark_cut - np_cut) < 1e-12, (spark_cut, np_cut)


def test_cutoff_from_hist_yes_mass_matches_labeled_program(spark):
    """With exact/labeled-Yes pairs folded in as yes_mass, the driver-side
    cutoff must match the Spark labeled running-sum program."""
    import random

    from fuzzylink_spark.operators.cutoff import expected_f1_cutoff_from_hist

    rng = random.Random(4)
    cells = [(round(rng.uniform(0.01, 0.99), 3), rng.randint(1, 30))
             for _ in range(200)]
    n_yes = 500
    rows = [(f"a{i}", f"b{i}", p, None)
            for i, (p, w) in enumerate(cells) for _ in range(w)]
    rows += [(f"e{i}", f"e{i}", 1.0, "Yes") for i in range(n_yes)]
    df = spark.createDataFrame(
        rows, "A string, B string, match_probability double, match string"
    )
    spark_cut = expected_f1_cutoff(df, exact=True)
    np_cut = expected_f1_cutoff_from_hist(
        [c[0] for c in cells], [c[1] for c in cells], yes_mass=n_yes
    )
    assert abs(spark_cut - np_cut) < 1e-12, (spark_cut, np_cut)
