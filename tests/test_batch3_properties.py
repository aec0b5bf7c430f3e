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


@given(
    st.lists(st.integers(1, 10**6), min_size=2, max_size=30),
    st.integers(1, 99),
)
def test_water_filling_prefix_criterion(demands, pct):
    """The ascending-order criterion d_k·(n−k+1) ≤ B − cum_{k−1} marks
    a PREFIX (monotone: once false, false forever) and allocations
    min(d, λ)-shape: every capped source ends with the same base
    share ±1 and no satisfied demand exceeds any capped allocation+1."""
    items = sorted(demands)
    total = sum(items)
    budget = total * pct // 100
    n = len(items)
    flags, cum = [], 0
    for rn, d in enumerate(items, start=1):
        ok = d * (n - rn + 1) <= budget - cum
        flags.append(ok)
        cum += d
    # prefix property
    seen_false = False
    for f in flags:
        if not f:
            seen_false = True
        assert not (seen_false and f)
    k = sum(flags)
    cum_sat = sum(d for d, f in zip(items, flags) if f)
    m = n - k
    if m:
        rem = budget - cum_sat
        base = rem // m
        allocs = [base + (1 if i <= rem % m else 0) for i in range(1, m + 1)]
        assert cum_sat + sum(allocs) == budget
        if k:
            assert max(items[:k]) <= min(allocs) + 1


@given(st.integers(1, 10**6))
def test_conformal_rank_formula(n):
    """(9n+9) div 10 == ceil(0.9 n) exactly."""
    import math

    assert (9 * n + 9) // 10 == math.ceil(0.9 * n) or (
        # float ceil can be off at huge n; the integer form is the spec
        (9 * n + 9) // 10 == -((-9 * n) // 10)
    )
    assert (9 * n + 9) // 10 == -((-9 * n) // 10)  # exact integer ceil


@given(st.lists(st.lists(st.integers(1, 1000), min_size=2, max_size=5),
                min_size=2, max_size=5))
def test_ipf_milli_grid_invariants(table):
    """The operator's REAL invariants (hypothesis rejected two
    stronger drafts: structural zeros make targets unachievable, and
    6 rounds need not converge on ill-conditioned tables — [[1,1],
    [1,66]] is 2% off): (a) immediately after a ROW half-round every
    row margin hits its target within the grid quantum × row width;
    (b) the row-margin L1 error never increases across double-rounds
    beyond grid slack."""
    width = min(len(r) for r in table)
    agg = {
        (i, j): row[j]
        for i, row in enumerate(table)
        for j in range(width)
    }
    rows_ = sorted({k[0] for k in agg})
    cols_ = sorted({k[1] for k in agg})
    total = sum(agg.values())
    w = {k: v * 1000 for k, v in agg.items()}

    def half(axis, m):
        groups = {}
        for k in w:
            groups.setdefault(k[axis], []).append(k)
        for _, keys in groups.items():
            s_ = sum(w[k] for k in keys)
            for k in keys:
                w[k] = (2 * w[k] * total * 1000 + m * s_) // (2 * m * s_)

    def row_err():
        t = total * 1000 / len(rows_)
        return sum(
            abs(sum(w[k] for k in w if k[0] == r) - t) for r in rows_
        )

    grid_slack = len(rows_) * (width + 1)
    errs = []
    for _ in range(6):
        half(0, len(rows_))
        # (a) row margins exact within grid right after the row scale
        assert row_err() <= grid_slack, row_err()
        half(1, len(cols_))
        errs.append(row_err())
    for a, b in zip(errs, errs[1:]):
        assert b <= a + grid_slack, (errs,)
