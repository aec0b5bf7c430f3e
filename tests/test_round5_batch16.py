"""Round-5 sixteenth batch: weekly-revenue autocorrelation (ACF).

Oracle parity runs in test_oracle_parity; this pins the exact-integer
moment formulation against a brute Python replay and the
Cauchy-Schwarz bound.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import timedelta
from decimal import Decimal

from manipula_o_de_dataframes_spark.queries import QUERIES
from manipula_o_de_dataframes_spark.sources.io import read_table

from .conftest import SF_SMOKE


def test_corpus_health_member_agreement(spark):
    """Each report column re-derives from the member queries' exact
    counts (never their rounded display ratios)."""
    dr = {r["source"]: r for r in QUERIES["dedup_rate_by_source"](spark, SF_SMOKE).collect()}
    vg = {
        r["source"]: r
        for r in QUERIES["vocab_growth"](spark, SF_SMOKE).collect()
        if r["decile"] == 10
    }
    out = QUERIES["corpus_health"](spark, SF_SMOKE).collect()
    assert {r["source"] for r in out} == set(dr) & set(vg)
    for r in out:
        m = dr[r["source"]]
        assert r["n_docs"] == m["n_docs"]
        assert r["exact_dup_ppm"] == (
            (m["n_docs"] - m["n_exact_distintos"]) * 1_000_000 // m["n_docs"]
        )
        v = vg[r["source"]]
        assert r["vocab_per_mtok"] == v["cum_vocab"] * 1_000_000 // v["cum_tokens"]
        assert 0 <= r["gopher_pass_ppm"] <= 1_000_000


def test_bpe_fertility_member_agreement(spark):
    """Per-lang sums re-derive from the member's per-doc counts;
    fertility <= 1e6 (merges only fuse) and > 0."""
    member = {r["doc_id"]: r for r in QUERIES["bpe_apply"](spark, SF_SMOKE).collect()}
    langs = {
        r["doc_id"]: r["lang"]
        for r in read_table(spark, SF_SMOKE, "documents").collect()
    }
    agg = defaultdict(lambda: [0, 0, 0])
    for doc_id, r in member.items():
        a = agg[langs[doc_id]]
        a[0] += 1
        a[1] += r["n_tok_before"]
        a[2] += r["n_tok_after"]
    out = QUERIES["bpe_fertility"](spark, SF_SMOKE).collect()
    assert {r["lang"] for r in out} == set(agg)
    for r in out:
        n, before, after = agg[r["lang"]]
        assert (r["n_docs"], r["tok_before"], r["tok_after"]) == (n, before, after)
        assert r["fertility_ppm"] == after * 1_000_000 // before
        assert 0 < r["fertility_ppm"] <= 1_000_000


def test_ccf_brute_and_lag_symmetry(spark):
    """Both beta columns equal the exact-integer replay at every lag;
    lag 0 betas have the sign of the covariance; the beta product
    never exceeds 1e12 (Cauchy-Schwarz: r^2 <= 1)."""
    orders = read_table(spark, SF_SMOKE, "orders").collect()
    weekly = defaultdict(lambda: [0, 0])
    for r in orders:
        d = r["o_orderdate"].date()
        wk = d - timedelta(days=d.weekday())
        cents = int(Decimal(str(r["o_totalprice"])).quantize(Decimal("0.01")) * 100)
        weekly[wk][0] += 1
        weekly[wk][1] += cents
    xs = [weekly[w][0] for w in sorted(weekly)]
    ys = [weekly[w][1] for w in sorted(weekly)]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    dx = [n * x - sx for x in xs]
    dy = [n * y - sy for y in ys]
    dxx = sum(d * d for d in dx)
    dyy = sum(d * d for d in dy)

    def trunc_div(a, b):
        return abs(a) // b * (1 if a >= 0 else -1)

    out = {r["lag"]: r for r in QUERIES["ccf_weekly"](spark, SF_SMOKE).collect()}
    for lag in range(-3, 4):
        if n <= abs(lag) + 2:
            assert lag not in out
            continue
        a = sum(
            dx[t] * dy[t + lag]
            for t in range(n)
            if 0 <= t + lag < n
        )
        r = out[lag]
        assert r["n_weeks"] == n
        assert r["beta_y_on_x_ppm"] == trunc_div(a * 1_000_000, dxx), lag
        assert r["beta_x_on_y_ppm"] == trunc_div(a * 1_000_000, dyy), lag
        assert r["beta_y_on_x_ppm"] * r["beta_x_on_y_ppm"] <= 10**12 + 1


def test_acf_brute_integer_replay(spark):
    """acf_ppm equals the exact-integer minimax-free replay
    trunc(A_k*1e6 / D) with A_k, D built from (n*x - S) deviations;
    |acf_ppm| <= 1e6 (Cauchy-Schwarz); short series filtered."""
    orders = read_table(spark, SF_SMOKE, "orders").collect()
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in read_table(spark, SF_SMOKE, "customer").collect()
    }
    weekly = defaultdict(lambda: defaultdict(int))
    for r in orders:
        d = r["o_orderdate"].date()
        wk = d - timedelta(days=d.weekday())
        cents = int(Decimal(str(r["o_totalprice"])).quantize(Decimal("0.01")) * 100)
        weekly[cust[r["o_custkey"]]][wk] += cents
    expected = {}
    for nat, by_wk in weekly.items():
        xs = [by_wk[w] for w in sorted(by_wk)]
        n, s = len(xs), sum(xs)
        dev = [n * x - s for x in xs]
        den = sum(d * d for d in dev)
        for lag in range(1, 5):
            if n <= lag + 2:
                continue
            num = sum(dev[t] * dev[t + lag] for t in range(n - lag))
            q = num * 1_000_000
            # truncation toward zero
            ppm = abs(q) // den * (1 if q >= 0 else -1)
            expected[(nat, lag)] = (n, ppm)
    out = {(r["nationkey"], r["lag"]): r for r in QUERIES["acf_weekly"](spark, SF_SMOKE).collect()}
    assert set(out) == set(expected)
    for k, (n, ppm) in expected.items():
        assert out[k]["n_weeks"] == n
        assert out[k]["acf_ppm"] == ppm, k
        assert abs(out[k]["acf_ppm"]) <= 1_000_000
