"""String-distance kernels pinned against independent implementations
(DuckDB's jaro_winkler_similarity / levenshtein as external goldens)."""

from __future__ import annotations

import duckdb
import pytest

from fuzzylink_spark.functions.strdist import (
    jaro,
    jaro_winkler,
    lcs_distance,
    osa_distance,
    qgram_cosine_dist,
    qgram_dist,
    qgram_jaccard_dist,
)

PAIRS = [
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("joe biden", "joseph robinette biden"),
    ("", "abc"),
    ("abc", "abc"),
    ("duane", "dwayne"),
    ("a", "b"),
]


@pytest.mark.parametrize("a,b", PAIRS)
def test_jaro_winkler_matches_duckdb(a, b):
    got = jaro_winkler(a, b)
    want = duckdb.sql(
        "select jaro_winkler_similarity(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert got == pytest.approx(want, abs=1e-12), (a, b)


def test_jaro_winkler_empty_matches_stringdist():
    # R stringdist::stringsim('', '', method='jw') == 1 (identical strings);
    # DuckDB returns 0 here — we follow the reference's stringdist semantics
    # (R/fuzzylink.R:174-175).
    assert jaro_winkler("", "") == 1.0


def test_jaro_known_values():
    assert jaro("martha", "marhta") == pytest.approx(0.9444444444, abs=1e-9)
    assert jaro("dixon", "dicksonx") == pytest.approx(0.7666666667, abs=1e-9)


def test_osa_vs_duckdb_levenshtein_when_no_transpositions():
    # without adjacent transpositions OSA == Levenshtein
    for a, b in [("kitten", "sitting"), ("abc", "abcd"), ("", "xyz")]:
        want = duckdb.sql("select levenshtein(?, ?)", params=[a, b]).fetchone()[0]
        assert osa_distance(a, b) == float(want)


def test_osa_transposition_cheaper_than_levenshtein():
    assert osa_distance("ab", "ba") == 1.0          # one transposition
    lev = duckdb.sql("select levenshtein('ab','ba')").fetchone()[0]
    assert lev == 2


def test_lcs_distance():
    assert lcs_distance("abcde", "ace") == 2.0       # 5+3-2*3
    assert lcs_distance("abc", "abc") == 0.0
    assert lcs_distance("abc", "xyz") == 6.0


def test_qgram_family():
    assert qgram_dist("abc", "abd") == 2.0           # c vs d differ
    assert qgram_jaccard_dist("abc", "abc") == 0.0
    assert qgram_jaccard_dist("abc", "xyz") == 1.0
    assert 0.0 < qgram_cosine_dist("abc", "abd") < 1.0
    assert qgram_cosine_dist("same", "same") == 0.0
