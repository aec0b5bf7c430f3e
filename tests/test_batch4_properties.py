"""Property tests for the round-5 continuation integer kernels
(batches 4–11): the census-window Mann-Whitney identity, Kendall's
pair partition and sign-symmetric division, Spearman doubled
midranks, the runs-test E[R] formula, the four-fifths and SRM exact
integer verdicts, CUPED's truncating θ, and t-closeness's scaled
variational distance — each against a naive reference over
adversarial inputs (the test_batch3_properties posture)."""

from __future__ import annotations

from collections import Counter
from fractions import Fraction

from hypothesis import given
from hypothesis import strategies as st

vals = st.lists(st.integers(0, 50), min_size=1, max_size=60)


def _trunc_div(a: int, b: int) -> int:
    """Truncate-toward-zero division — Spark `div` / DuckDB `//`."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@given(vals, vals)
def test_mann_whitney_census_equals_brute(a, b):
    """The (value census + cumulative-below window) formulation of
    2·U equals the O(na·nb) pairwise definition."""
    ca, cb = Counter(a), Counter(b)
    wins = ties = 0
    cumb = 0
    for v in sorted(set(a) | set(b)):
        wins += ca.get(v, 0) * cumb
        ties += ca.get(v, 0) * cb.get(v, 0)
        cumb += cb.get(v, 0)
    u2_census = 2 * wins + ties
    u2_brute = sum(
        2 if x > y else (1 if x == y else 0) for x in a for y in b
    )
    assert u2_census == u2_brute
    assert 0 <= u2_census <= 2 * len(a) * len(b)


@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 1000)),
                min_size=2, max_size=40))
def test_kendall_partition_and_sign_symmetric_div(pairs):
    """C + D + T = n(n−1)/2, and sign(C−D)·(|C−D|·10⁶ div n0) equals
    truncate-toward-zero division of the signed numerator (the
    property that makes Spark div and DuckDB // agree on negatives)."""
    n = len(pairs)
    C = D = T = 0
    for i in range(n):
        for j in range(i + 1, n):
            dn = pairs[j][0] - pairs[i][0]
            dc = pairs[j][1] - pairs[i][1]
            if dn * dc > 0:
                C += 1
            elif dn * dc < 0:
                D += 1
            else:
                T += 1
    n0 = n * (n - 1) // 2
    assert C + D + T == n0
    sym = (1 if C > D else (-1 if C < D else 0)) * (abs(C - D) * 10**6 // n0)
    assert sym == _trunc_div((C - D) * 10**6, n0)


@given(vals)
def test_spearman_doubled_midranks_are_exact(xs):
    """2·rank_min + ties − 1 equals twice the average midrank for
    every element — so d2sum is exactly 4·Σd²."""
    sorted_xs = sorted(xs)
    for v in set(xs):
        first = sorted_xs.index(v) + 1
        cnt = sorted_xs.count(v)
        avg_rank = Fraction(first + (first + cnt - 1), 2)
        assert 2 * first + cnt - 1 == 2 * avg_rank


@given(st.integers(0, 10**6), st.integers(0, 10**6))
def test_runs_expected_value_formula(n1, n2):
    """e_runs_ppm = 10⁶ + 2·n1·n2·10⁶ div (n1+n2) matches the
    textbook E[R] = 1 + 2n1n2/(n1+n2) within one truncation ulp."""
    if n1 + n2 == 0:
        return
    got = 10**6 + (2 * n1 * n2 * 10**6) // (n1 + n2)
    exact = Fraction(10**6) * (1 + Fraction(2 * n1 * n2, n1 + n2))
    assert 0 <= exact - got < 1


@given(st.integers(0, 10**6), st.integers(1, 10**6),
       st.integers(0, 10**6), st.integers(1, 10**6))
def test_four_fifths_cross_multiplication_exact(pg, ng, pb, nb):
    """pass_g·n_b·5 ≥ pass_b·n_g·4 iff rate_g ≥ 0.8·rate_b as exact
    rationals — no rounding can flip the verdict."""
    pg, pb = min(pg, ng), min(pb, nb)
    got = pg * nb * 5 >= pb * ng * 4
    want = Fraction(pg, ng) >= Fraction(4, 5) * Fraction(pb, nb)
    assert got == want


@given(st.integers(0, 10**7), st.integers(0, 10**7))
def test_srm_integer_verdict_equals_chi2_threshold(a, b):
    """(a−b)²·1000 > 3841·(a+b) iff χ² = (a−b)²/(a+b) > 3.841
    exactly (the scaling clears the decimal without any float)."""
    if a + b == 0:
        return
    got = (a - b) ** 2 * 1000 > 3841 * (a + b)
    want = Fraction((a - b) ** 2, a + b) > Fraction(3841, 1000)
    assert got == want


@given(st.lists(st.tuples(st.integers(0, 10**4), st.integers(0, 10**4)),
                min_size=2, max_size=30))
def test_cuped_theta_truncates_rational_slope(xy):
    """θ_ppm (integer div) is within one of the exact rational
    10⁶·cov/var whenever var > 0 — the weekly_trend convention."""
    n = len(xy)
    sx = sum(x for x, _ in xy)
    sy = sum(y for _, y in xy)
    sxy = sum(x * y for x, y in xy)
    sxx = sum(x * x for x, _ in xy)
    den = n * sxx - sx * sx
    if den == 0:
        return
    num = (n * sxy - sx * sy) * 10**6
    got = _trunc_div(num, den)
    exact = Fraction(num, den)
    assert abs(exact - got) < 1


@given(st.lists(st.lists(st.integers(0, 20), min_size=5, max_size=5),
                min_size=1, max_size=8))
def test_t_closeness_scaled_distance_is_variational(groups):
    """Σᵢ|cntᵢ·N − Cᵢ·n| div (2·n·N) equals the variational distance
    ½Σ|p−q| as an exact rational (before the single ppm truncation),
    and is bounded by 1."""
    total = [sum(g[i] for g in groups) for i in range(5)]
    N = sum(total)
    if N == 0:
        return
    for g in groups:
        n = sum(g)
        if n == 0:
            continue
        dist = sum(abs(g[i] * N - total[i] * n) for i in range(5))
        exact = Fraction(1, 2) * sum(
            abs(Fraction(g[i], n) - Fraction(total[i], N)) for i in range(5)
        )
        assert Fraction(dist, 2 * n * N) == exact
        assert exact <= 1


def test_shapley_weights_integrate_to_one():
    """Σ over the 8 subsets of w12/12 = 1 per group — the weights are
    a probability distribution over orderings (n=4)."""
    from math import comb

    w12 = {0: 3, 1: 1, 2: 1, 3: 3}
    assert sum(comb(3, k) * w12[k] for k in range(4)) == 12
