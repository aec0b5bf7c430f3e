"""Round-5 twelfth batch: inverted-index materialization,
Fellegi-Sunter entity resolution, and multi-source BFS distances.

Oracle parity runs in test_oracle_parity; these pin the posting-cap
and df semantics, the blocking recall guarantee and integer scoring,
and BFS's triangle-inequality / frontier properties — plus the plan
shapes (no Python eval, bounded shuffles).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.queries import QUERIES
from manipula_o_de_dataframes_spark.sources.io import read_table

from .conftest import SF_SMOKE


def test_inverted_index_cap_df_and_brute(spark):
    """Postings hold ≤ 8 entries ordered (tf DESC, doc_id ASC); df
    counts ALL postings docs (cap never shrinks df); every (doc, tf)
    rendered matches a brute-force Python count; df=1 terms absent."""
    rows = QUERIES["inverted_index"](spark, SF_SMOKE).collect()
    docs = read_table(spark, SF_SMOKE, "documents").filter(
        F.col("text").isNotNull()
    ).collect()
    tf = defaultdict(lambda: defaultdict(int))
    for d in docs:
        for t in d["text"].split(" "):
            if t:
                tf[t][d["doc_id"]] += 1
    assert rows, "empty index"
    seen = set()
    for r in rows:
        seen.add(r["term"])
        entries = r["postings"].split(",")
        assert 1 <= len(entries) <= 8
        parsed = [(int(e.split(":")[0]), int(e.split(":")[1])) for e in entries]
        # order: tf DESC then doc ASC
        keys = [(-t, d) for d, t in parsed]
        assert keys == sorted(keys), r["term"]
        for doc_id, t in parsed:
            assert tf[r["term"]][doc_id] == t
        assert r["df"] == len(tf[r["term"]])
        assert r["total_tf"] == sum(tf[r["term"]].values())
        assert r["df"] >= 2
    # hapax exclusion is real: no df-1 term leaks in
    for term, postings in tf.items():
        if len(postings) >= 2:
            assert term in seen, term


def test_entity_resolution_blocking_recall_and_score(spark):
    """The overlapping two-pass banding finds EVERY same-nation pair
    within 25 000 cents (the documented recall guarantee), and each
    emitted score is the exact integer weight sum recomputed from the
    customer rows."""
    cust = {
        r["c_custkey"]: r
        for r in read_table(spark, SF_SMOKE, "customer")
        .select(
            "c_custkey",
            "c_nationkey",
            "c_mktsegment",
            (F.col("c_acctbal").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .collect()
    }
    out = QUERIES["entity_resolution"](spark, SF_SMOKE).collect()
    emitted = {(r["key_a"], r["key_b"]): r for r in out}

    def score(a, b):
        s = 1609 if a["c_mktsegment"] == b["c_mktsegment"] else -223
        s += 2303 if abs(a["cents"] - b["cents"]) <= 10000 else -105
        s += 2996 if a["cents"] % 100 == b["cents"] % 100 else -51
        return s

    # brute-force: every same-nation pair within the recall radius
    # whose score clears the POSSIBLE floor must be emitted
    by_nation = defaultdict(list)
    for r in cust.values():
        by_nation[r["c_nationkey"]].append(r)
    expected = 0
    for rows in by_nation.values():
        rows.sort(key=lambda r: r["c_custkey"])
        for i, a in enumerate(rows):
            for b in rows[i + 1 :]:
                if abs(a["cents"] - b["cents"]) <= 25000:
                    s = score(a, b)
                    if s >= 1000:
                        expected += 1
                        got = emitted.get((a["c_custkey"], b["c_custkey"]))
                        assert got is not None, (a["c_custkey"], b["c_custkey"])
                        assert got["score_milli"] == s
                        assert got["tier"] == ("MATCH" if s >= 4000 else "POSSIBLE")
    assert expected > 0, "fixture produced no linkable pairs"
    # every emitted pair's score/tier re-derives exactly
    for (ka, kb), r in emitted.items():
        s = score(cust[ka], cust[kb])
        assert r["score_milli"] == s and s >= 1000


def test_bfs_distances_frontier_properties(spark):
    """hop ∈ [0,3]; exactly 3 seeds at hop 0 (the top-3 degree hubs);
    every hop-k node (k ≥ 1) has at least one edge to a hop-(k−1)
    node and none to any strictly smaller hop − 1 (minimality)."""
    rows = QUERIES["bfs_distances"](spark, SF_SMOKE).collect()
    hop = {r["part"]: r["hop"] for r in rows}
    assert all(0 <= h <= 3 for h in hop.values())
    assert sum(1 for h in hop.values() if h == 0) == 3
    # rebuild the symmetric edge list brute-force from lineitem
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
    # seed check: top-3 by (degree DESC, part ASC)
    seeds = sorted(adj, key=lambda u: (-len(adj[u]), u))[:3]
    assert sorted(p for p, h in hop.items() if h == 0) == sorted(seeds)
    # BFS minimality: hop(v) == min over neighbors u of hop(u)+1
    for v, h in hop.items():
        if h == 0:
            continue
        nbr = [hop[u] for u in adj[v] if u in hop]
        assert h == min(nbr) + 1, (v, h)
    # degree column matches the brute adjacency
    for r in rows:
        assert r["degree"] == len(adj[r["part"]])


def test_batch12_plan_shapes(spark):
    """No Python eval anywhere; inverted_index's posting cap runs as
    a census-row window (spillable sort — NOT a collect-then-slice
    data-proportional array) and the df/total_tf aggregates ride the
    same window partition, so the tf census is scanned once (no
    second aggregate branch re-shuffling td)."""
    def plan(name):
        return QUERIES[name](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()

    for name in ("inverted_index", "entity_resolution", "bfs_distances"):
        p = plan(name)
        assert "EvalPython" not in p, f"{name} fell off the JVM\n{p}"
    p = plan("inverted_index")
    assert "Window" in p, f"posting cap lost its census window\n{p}"
    # one tf-census exchange + one term-window exchange — the plan
    # must not grow a second aggregate branch over td
    assert p.count("Exchange hashpartitioning") <= 2, p
