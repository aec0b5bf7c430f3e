"""Property tests for the round-5 close-out integer kernels.

These pin the pure-integer formulas the new queries rely on against
naive reference implementations over adversarial inputs — the same
hypothesis posture as test_formatting_properties / test_pq_properties.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given
from hypothesis import strategies as st


@given(st.integers(0, 10**12), st.integers(1, 10**9))
def test_half_up_integer_division_formula(num, den):
    """(2000·n + d) div (2·d) == round-half-up(1000·n/d) exactly —
    the rake_keywords / markov_attribution credit formula."""
    got = (2000 * num + den) // (2 * den)
    frac = Fraction(1000 * num, den)
    want = int(frac) + (1 if frac - int(frac) >= Fraction(1, 2) else 0)
    assert got == want


@given(st.integers(0, 2**60 - 1))
def test_trailing_zero_rank_formula(x):
    """bit_count((x & −x) − 1) == trailing-zero count (64 when x = 0) —
    the HyperBall register rank."""
    got = bin(((x & -x) - 1) & ((1 << 64) - 1)).count("1")
    if x == 0:
        assert got == 64
    else:
        tz = 0
        while (x >> tz) & 1 == 0:
            tz += 1
        assert got == tz


@given(st.integers(0, 2**63 - 1))
def test_streak_fold_matches_island_scan(mask):
    """The 63-step fold (activity_bitmaps) == longest run of set bits."""
    best = cur = 0
    for i in range(63):
        cur = cur + 1 if (mask >> i) & 1 else 0
        best = max(best, cur)
    runs = [len(r) for r in bin(mask & ((1 << 63) - 1))[2:].split("0") if r]
    assert best == (max(runs) if runs else 0)


@given(st.integers(0, 10**9), st.integers(2, 12))
def test_hrw_minimal_disruption_any_resize(key, n):
    """On any n → n+1 resize, an HRW key either keeps its shard or
    moves to the newcomer — never between old shards."""
    import hashlib

    def hrw(k, m):
        return max(
            range(m),
            key=lambda s: (
                int(hashlib.md5(f"{k}:s{s}".encode()).hexdigest()[:8], 16),
                s,
            ),
        )

    a, b = hrw(key, n), hrw(key, n + 1)
    assert b == a or b == n


@given(st.lists(st.integers(0, 62), min_size=1, max_size=40))
def test_mask_sum_distinct_equals_bit_or(days):
    """sum(DISTINCT 1<<d) == OR of day bits — why the census aggregate
    is a valid bitmap build."""
    via_sum = sum({1 << d for d in days})
    via_or = 0
    for d in days:
        via_or |= 1 << d
    assert via_sum == via_or
