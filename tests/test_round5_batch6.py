"""Round-5 sixth batch: exact Shapley data valuation, greedy
max-coverage selection, Pocock group-sequential monitor.

Oracle parity runs in test_oracle_parity; these pin the Shapley
axioms (efficiency, the subadditivity of coverage values), the greedy
trajectory against a driver-side brute replay, and the monitor's
cumulative accounting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.operators import dedup as dd
from manipula_o_de_dataframes_spark.queries import QUERIES
from manipula_o_de_dataframes_spark.sources.io import read_table

from .conftest import SF_SMOKE


def _shingle_sets(spark) -> dict[str, set]:
    d = read_table(spark, SF_SMOKE, "documents")
    rows = d.select(
        "source", F.explode(dd.shingles(F.col("text"))).alias("sh")
    ).collect()
    out: dict[str, set] = {}
    for r in rows:
        out.setdefault(r["source"], set()).add(r["sh"])
    return out


# ---------------------------------------------------------------- shapley


def test_shapley_efficiency_and_brute(spark):
    """Σφ·12 = 12·v(grand) (efficiency — the axiom that makes Shapley
    a valuation, not a score); each φ·12 matches a driver-side brute
    enumeration of all 8 subsets per group."""
    from itertools import combinations

    rows = QUERIES["source_shapley"](spark, SF_SMOKE).collect()
    assert len(rows) == 4
    v_grand = rows[0]["v_grand"]
    assert sum(r["shapley_x12"] for r in rows) == 12 * v_grand

    sets = _shingle_sets(spark)
    groups: dict[int, set] = {g: set() for g in range(4)}
    for src, sh in sets.items():
        groups[int(src[3:]) % 4] |= sh

    def v(S):
        out = set()
        for g in S:
            out |= groups[g]
        return len(out)

    w12 = {0: 3, 1: 1, 2: 1, 3: 3}
    for r in rows:
        g = r["source_group"]
        others = [x for x in range(4) if x != g]
        phi12 = 0
        for k in range(4):
            for S in combinations(others, k):
                phi12 += w12[k] * (v(set(S) | {g}) - v(set(S)))
        assert phi12 == r["shapley_x12"], (g, phi12, r["shapley_x12"])
        assert r["v_solo"] == v({g})


# ----------------------------------------------------------- max coverage


def test_max_coverage_greedy_brute(spark):
    """The emitted trajectory equals a driver-side greedy replay on
    the exact shingle sets (same tie-break), and covered_total equals
    the union size of the selected sources at each step."""
    sets = _shingle_sets(spark)
    rows = QUERIES["max_coverage_select"](spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= 5
    covered: set = set()
    chosen: list[str] = []
    for r in sorted(rows, key=lambda r: r["pick_order"]):
        best = min(
            (s for s in sets if s not in chosen),
            key=lambda s: (-len(sets[s] - covered), s),
        )
        assert best == r["source"], (r["pick_order"], best, r["source"])
        gain = len(sets[best] - covered)
        assert gain == r["gain"]
        covered |= sets[best]
        chosen.append(best)
        assert len(covered) == r["covered_total"]


def test_max_coverage_diminishing_gains(spark):
    """Greedy gains are non-increasing — submodularity's fingerprint
    on the trajectory."""
    rows = sorted(
        QUERIES["max_coverage_select"](spark, SF_SMOKE).collect(),
        key=lambda r: r["pick_order"],
    )
    gains = [r["gain"] for r in rows]
    assert gains == sorted(gains, reverse=True)


# ------------------------------------------------------------------ pocock


def test_pocock_cumulative_accounting(spark):
    """Cumulative contingencies are non-decreasing across looks, the
    final look's totals equal the full event census, and looks are
    1..K over the distinct weeks."""
    rows = sorted(
        QUERIES["pocock_monitor"](spark, SF_SMOKE).collect(),
        key=lambda r: r["look"],
    )
    assert [r["look"] for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        for col in ("a_conv", "a_nonconv", "b_conv", "b_nonconv"):
            assert a[col] <= b[col], col
    last = rows[-1]
    total = (
        last["a_conv"] + last["a_nonconv"] + last["b_conv"] + last["b_nonconv"]
    )
    assert total == read_table(spark, SF_SMOKE, "events").count()


def test_pocock_crossed_is_deterministic_boolean(spark):
    """crossed ∈ {0,1} and recomputes identically (the double-compare
    convention's determinism claim, exercised)."""
    a = [r["crossed"] for r in QUERIES["pocock_monitor"](spark, SF_SMOKE).collect()]
    b = [r["crossed"] for r in QUERIES["pocock_monitor"](spark, SF_SMOKE).collect()]
    assert a == b and set(a) <= {0, 1}
