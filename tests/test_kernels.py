"""Property + golden tests for the string-similarity kernels.

The bit-parallel LCS is checked against a classic O(n*m) DP; Jaro-Winkler
and Levenshtein are checked against DuckDB's built-in implementations on a
string corpus (both derive from the same published algorithms the
reference's jellyfish dependency implements)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from address_matcher_spark import kernels as K

ALPHA = "ab c1"  # tiny alphabet maximizes collisions / edge cases


def lcs_dp(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            if a[i - 1] == b[j - 1]:
                dp[i][j] = dp[i - 1][j - 1] + 1
            else:
                dp[i][j] = max(dp[i - 1][j], dp[i][j - 1])
    return dp[m][n]


@settings(max_examples=300, deadline=None)
@given(st.text(ALPHA, max_size=40), st.text(ALPHA, max_size=40))
def test_lcs_bitparallel_matches_dp(a, b):
    assert K._lcs_len(a, b) == lcs_dp(a, b)


@settings(max_examples=200, deadline=None)
@given(st.text(ALPHA, max_size=30), st.text(ALPHA, max_size=30))
def test_ratio_bounds_and_symmetry(a, b):
    r = K.ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == pytest.approx(K.ratio(b, a))
    if a == b:
        assert r == 100.0


def test_token_set_ratio_golden():
    # Hand-computed from the published rapidfuzz token_set_ratio algorithm.
    assert K.token_set_ratio("", "") == 0.0
    assert K.token_set_ratio("a", "") == 0.0
    assert K.token_set_ratio("fuzzy was a bear", "fuzzy fuzzy was a bear") == 100.0
    # identical sets, different multiplicity/order
    assert K.token_set_ratio("a b c", "c b a") == 100.0
    # subset with non-empty intersection
    assert K.token_set_ratio("flat 2 maple road", "2 maple road") == 100.0
    # disjoint tokens fall back to plain ratio of sorted diffs
    assert K.token_set_ratio("abcd", "wxyz") == K.ratio("abcd", "wxyz")


def test_token_set_ratio_example_values():
    # Worked example: s1="new york mets", s2="new york yankees"
    # intersect={new,york}, diff_ab={mets}, diff_ba={yankees}
    # sect_len=8, ab=4, ba=7
    # sect_ab_ratio = 1 - 5/(8+13) ; sect_ba_ratio = 1 - 8/(8+16)
    s = K.token_set_ratio("new york mets", "new york yankees")
    sect_ab = (1 - 5 / 21) * 100
    sect_ba = (1 - 8 / 24) * 100
    r = K.ratio("mets", "yankees")
    assert s == pytest.approx(max(r, sect_ab, sect_ba))


def test_token_set_cutoff():
    s = K.token_set_ratio("1 ash road", "2 beech lane")
    assert s < 85
    assert K.token_set_ratio_cutoff("1 ash road", "2 beech lane", 85.0) == 0.0
    assert K.token_set_ratio_cutoff("flat 2 maple road", "2 maple road", 85.0) == 100.0


CORPUS = [
    "flat 2 maple road",
    "2 maple road",
    "12 high street",
    "basement flat 12 high st",
    "martha house",
    "marhta huose",
    "dixon",
    "dicksonx",
    "jellyfish",
    "smellyfish",
    "",
    "a",
    "ab",
    "duane",
    "dwayne",
    "1 ash park road se54 3hb",
]


def test_jaro_winkler_matches_duckdb():
    con = duckdb.connect()
    for a in CORPUS:
        for b in CORPUS:
            if not a or not b:
                continue  # engines differ on empty-string convention
            expected = con.execute(
                "select jaro_winkler_similarity(?, ?)", [a, b]
            ).fetchone()[0]
            assert K.jaro_winkler_similarity(a, b) == pytest.approx(
                expected, abs=1e-9
            ), (a, b)


def test_jaro_golden():
    assert K.jaro_similarity("martha", "marhta") == pytest.approx(17 / 18)
    assert K.jaro_winkler_similarity("martha", "marhta") == pytest.approx(0.9611111111)
    assert K.jaro_winkler_similarity("dwayne", "duane") == pytest.approx(0.84)


def test_levenshtein_matches_duckdb():
    con = duckdb.connect()
    for a in CORPUS:
        for b in CORPUS:
            expected = con.execute("select levenshtein(?, ?)", [a, b]).fetchone()[0]
            assert K.levenshtein(a, b) == expected, (a, b)


def test_batch_matches_scalar():
    left = np.array(CORPUS * 3, dtype=object)
    rng = np.random.RandomState(42)
    right = np.array([CORPUS[i] for i in rng.randint(0, len(CORPUS), len(left))], dtype=object)
    got = K.token_set_ratio_batch(left, right)
    want = np.array([K.token_set_ratio(a, b) for a, b in zip(left, right)])
    np.testing.assert_allclose(got, want)
    got = K.jaro_winkler_batch(left, right)
    want = np.array([K.jaro_winkler_similarity(a, b) for a, b in zip(left, right)])
    np.testing.assert_allclose(got, want)
