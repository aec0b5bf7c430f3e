"""Round-5 fifth batch: NDCG@10 with inlined discount literals, replay
policy evaluation, diff-in-differences, Wald–Wolfowitz runs test.

Oracle parity runs in test_oracle_parity; these pin the literal-table
derivation (the whole point of the convention — the literals must BE
round(1e9/log2(pos+1)), not just match across engines), replay
accounting identities, the DiD decomposition, and run-count bounds.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.queries import QUERIES, _NDCG_W_E9
from manipula_o_de_dataframes_spark.sources.io import read_table

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------------ NDCG


def test_ndcg_literal_table_derivation():
    """The inlined discounts must equal round(1e9/log2(pos+1)) — and
    the oracle's SQL literal list must be the same numbers (the
    Benford convention's integrity check)."""
    assert _NDCG_W_E9 == [
        round(1e9 / math.log2(pos + 1)) for pos in range(1, 11)
    ]
    from manipula_o_de_dataframes_spark.oracles import ORACLES

    for w in _NDCG_W_E9:
        assert str(w) in ORACLES["ndcg_eval"]


def test_ndcg_bounds_and_ranker_order(spark):
    """0 ≤ ndcg_ppm ≤ 10⁶ for both arms; the overlap ranker (which
    ranks by the same signal the grades derive from) must dominate
    the naive length prior."""
    rows = {r["ranker"]: r for r in QUERIES["ndcg_eval"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"overlap", "length"}
    for r in rows.values():
        assert 0 <= r["ndcg_ppm"] <= 1_000_000, r
        assert r["dcg_e9"] <= r["idcg_e9"], r
    assert rows["overlap"]["ndcg_ppm"] >= rows["length"]["ndcg_ppm"]


# ---------------------------------------------------------------- replay


def test_bandit_replay_accounting(spark):
    """fixed:* match counts partition the log; logged row sees every
    event; md5 policy matches a subset; every mean is reward//n."""
    rows = {r["policy"]: r for r in QUERIES["bandit_replay"](spark, SF_SMOKE).collect()}
    logged = rows["logged"]
    fixed = [r for p, r in rows.items() if p.startswith("fixed:")]
    assert sum(r["n_matched"] for r in fixed) == logged["n_matched"]
    assert sum(r["reward_cents"] for r in fixed) == logged["reward_cents"]
    assert 0 < rows["md5"]["n_matched"] < logged["n_matched"]
    for r in rows.values():
        assert r["mean_reward_cents"] == r["reward_cents"] // r["n_matched"]


# ------------------------------------------------------------------- DiD


def test_diff_in_diff_decomposition(spark):
    """did_cents must equal the stated four-mean arithmetic for every
    nation (the estimator is its own audit trail)."""
    rows = QUERIES["diff_in_diff"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["did_cents"] == (
            r["treated_post_cents"] - r["treated_pre_cents"]
        ) - (r["control_post_cents"] - r["control_pre_cents"]), r


# ------------------------------------------------------------- runs test


def test_runs_bounds(spark):
    """1 ≤ R ≤ n₁+n₂; R ≥ 2 whenever both signs occur; E[R] ppm is
    ≥ 10⁶ (the +1 floor) and ≤ (1 + (n₁+n₂)/2)·10⁶."""
    for r in QUERIES["runs_test"](spark, SF_SMOKE).collect():
        n = r["n_above"] + r["n_below"]
        assert 1 <= r["runs"] <= n, r
        if r["n_above"] > 0 and r["n_below"] > 0:
            assert r["runs"] >= 2, r
        assert 1_000_000 <= r["e_runs_ppm"] <= (1 + n / 2) * 1_000_000, r


def test_runs_brute(spark):
    """Run count equals a driver-side replay of the sign sequence for
    every nation."""
    from manipula_o_de_dataframes_spark.queries import _weekly_nation_census

    census = sorted(
        _weekly_nation_census(spark, SF_SMOKE).collect(),
        key=lambda r: (r["nation"], r["wk"]),
    )
    by_nation: dict[str, list] = {}
    for r in census:
        by_nation.setdefault(r["nation"], []).append(r["cents"])
    got = {r["nation"]: r for r in QUERIES["runs_test"](spark, SF_SMOKE).collect()}
    for nation, cents in by_nation.items():
        med = sorted(cents)[(len(cents) + 1) // 2 - 1]
        signs = [1 if c > med else 0 for c in cents]
        runs = 1 + sum(
            1 for a, b in zip(signs, signs[1:]) if a != b
        )
        assert got[nation]["runs"] == runs, nation
        assert got[nation]["n_above"] == sum(signs), nation


# ----------------------------------------------------------- plan shapes


def test_batch5_plan_shapes(spark):
    """No Python in any plan; NDCG's rankers are bounded top-10 sorts
    (TakeOrderedAndProject); DiD's grand cell is a broadcast."""
    for name in ("ndcg_eval", "bandit_replay", "diff_in_diff", "runs_test"):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, name
    p = _plan(QUERIES["ndcg_eval"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in p
    p = _plan(QUERIES["diff_in_diff"](spark, SF_SMOKE))
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p
