"""Round-5 fifteenth batch: seed-based common-neighbor link
prediction and business-day SLA compliance.

Oracle parity runs in test_oracle_parity; these pin the link
predictor's exactness against a brute graph replay and the
closed-form business-day deadline against a walking calendar.
"""

from __future__ import annotations

from collections import defaultdict
from datetime import date, timedelta

from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.queries import QUERIES
from manipula_o_de_dataframes_spark.sources.io import read_table

from .conftest import SF_SMOKE


def _brute_graph(spark):
    li = (
        read_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                adj[u].add(v)
                adj[v].add(u)
    return adj


def test_link_prediction_brute_replay(spark):
    """Each emitted (seed, candidate) is non-adjacent, its
    common-neighbor count and Jaccard ppm match set arithmetic on the
    brute adjacency, and ranks are the top-3 under (common DESC,
    candidate ASC) among ALL non-adjacent 2-hop candidates."""
    adj = _brute_graph(spark)
    seeds = sorted(adj, key=lambda u: (-len(adj[u]), u))[:20]
    out = QUERIES["link_prediction"](spark, SF_SMOKE).collect()
    by_seed = defaultdict(list)
    for r in out:
        by_seed[r["seed_part"]].append(r)
    assert set(by_seed) <= set(seeds)
    for s in seeds:
        cands = []
        for b in {x for w in adj[s] for x in adj[w]} - adj[s] - {s}:
            common = len(adj[s] & adj[b])
            cands.append((-common, b))
        cands.sort()
        expected = cands[:3]
        got = sorted(by_seed.get(s, []), key=lambda r: r["rank"])
        assert len(got) == len(expected), s
        for r, (negc, b) in zip(got, expected):
            assert r["candidate_part"] == b
            assert r["common_neighbors"] == -negc
            union = len(adj[s]) + len(adj[b]) - (-negc)
            assert r["jaccard_ppm"] == (-negc) * 1_000_000 // union
            assert b not in adj[s], "adjacent pair leaked"


def _add_business_days(d: date, n: int) -> date:
    while d.weekday() >= 5:
        d += timedelta(days=1)
    added = 0
    while added < n:
        d += timedelta(days=1)
        if d.weekday() < 5:
            added += 1
    return d


def test_sla_closed_form_matches_walking_calendar(spark):
    """The closed-form deadline equals a day-by-day business-day walk
    for every (start dow, sla) combination in range, and the per-
    priority census matches a brute replay."""
    # exhaustive closed-form check across all weekdays x slas
    for day0 in range(7300, 7321):  # three weeks of start days
        for sla in (3, 5, 10, 15, 20):
            dow0 = (day0 + 3) % 7
            start = day0 + (2 if dow0 == 5 else 1 if dow0 == 6 else 0)
            dow_s = (start + 3) % 7
            rem = sla % 5
            deadline = start + (sla // 5) * 7 + rem + (2 if dow_s + rem >= 5 else 0)
            walked = _add_business_days(date(1970, 1, 1) + timedelta(days=day0), sla)
            assert deadline == (walked - date(1970, 1, 1)).days, (day0, sla)
    # census replay
    orders = {
        r["o_orderkey"]: r
        for r in read_table(spark, SF_SMOKE, "orders").collect()
    }
    sla_map = {
        "1-URGENT": 3,
        "2-HIGH": 5,
        "3-MEDIUM": 10,
        "4-NOT SPECIFIED": 15,
        "5-LOW": 20,
    }
    li = read_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect()
    stats = defaultdict(lambda: [0, 0, 0])
    for r in li:
        o = orders[r["l_orderkey"]]
        pr = o["o_orderpriority"]
        dl = _add_business_days(o["o_orderdate"].date(), sla_map.get(pr, 20))
        ship = r["l_shipdate"].date()
        st = stats[pr]
        st[0] += 1
        over = (ship - dl).days
        if over > 0:
            st[1] += 1
        st[2] = max(st[2], max(over, 0))
    out = QUERIES["sla_compliance"](spark, SF_SMOKE).collect()
    assert {r["priority"] for r in out} == set(stats)
    for r in out:
        n, breach, mx = stats[r["priority"]]
        assert r["n_lines"] == n
        assert r["n_breach"] == breach
        assert r["breach_ppm"] == breach * 1_000_000 // n
        assert r["max_overrun_days"] == mx


def test_duplicate_payments_brute_gaps(spark):
    """Every (custkey, band) repeat group matches a brute replay:
    count, tightest consecutive same-band gap, and the <=7-day flag;
    singleton groups never appear."""
    from decimal import Decimal

    orders = read_table(spark, SF_SMOKE, "orders").collect()
    groups = defaultdict(list)
    for r in orders:
        cents = int(Decimal(str(r["o_totalprice"])).quantize(Decimal("0.01")) * 100)
        day = (r["o_orderdate"].date() - date(1970, 1, 1)).days
        groups[(r["o_custkey"], cents // 100000)].append((day, r["o_orderkey"]))
    expected = {}
    for k, v in groups.items():
        if len(v) < 2:
            continue
        v.sort()
        gaps = [b[0] - a[0] for a, b in zip(v, v[1:])]
        expected[k] = (len(v), min(gaps))
    out = {(r["custkey"], r["amount_band"]): r
           for r in QUERIES["duplicate_payments"](spark, SF_SMOKE).collect()}
    assert set(out) == set(expected)
    for k, (n, gap) in expected.items():
        assert out[k]["n_orders"] == n
        assert out[k]["min_gap_days"] == gap
        assert out[k]["suspicious"] == int(gap <= 7)


def test_batch15_plan_shapes(spark):
    """JVM-side only; link_prediction's wedge join is seed-bounded
    (no CartesianProduct) and sla_compliance is one key join plus a
    census aggregate — no window, no explode."""

    def plan(name):
        return QUERIES[name](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()

    for name in ("link_prediction", "sla_compliance"):
        p = plan(name)
        assert "EvalPython" not in p and "InPandas" not in p, f"{name}\n{p}"
        assert "CartesianProduct" not in p, f"{name}\n{p}"
    p = plan("sla_compliance")
    assert "Window" not in p and "Generate" not in p, p
