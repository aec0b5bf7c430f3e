"""Round-5 second batch: proration, interval sweep, skyline, column
profile, MV refresh, prefix-filtered exact Jaccard join.

Each query's oracle parity runs in test_oracle_parity; these tests pin
the INVARIANTS parity alone can't see (conservation, dominance
correctness vs brute force, zero false negatives, plan shapes).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.functions.formatting import MONEY
from manipula_o_de_dataframes_spark.queries import QUERIES
from manipula_o_de_dataframes_spark.sources.io import read_table

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_revenue_recognition_conserves_cents(spark):
    """The largest-remainder split must re-sum to EXACTLY the corpus's
    total line cents — no cent created or destroyed by the proration."""
    out = QUERIES["revenue_recognition"](spark, SF_SMOKE)
    recognized = out.agg(F.sum("recognized_cents")).collect()[0][0]
    li = read_table(spark, SF_SMOKE, "lineitem")
    o = read_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    total = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select((F.col("l_extendedprice").cast(MONEY) * 100).cast("long").alias("c"))
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    assert recognized == total


def test_revenue_recognition_weeks_are_mondays(spark):
    rows = QUERIES["revenue_recognition"](spark, SF_SMOKE).select("semana").collect()
    import datetime

    assert rows
    for r in rows:
        d = datetime.date.fromisoformat(r[0])
        assert d.weekday() == 0, r[0]


def test_open_order_concurrency_matches_brute_force(spark):
    """The sweep's peak must equal the brute-force day-explode count of
    open intervals (computed here per nation at smoke scale)."""
    out = {
        r["nationkey"]: (r["peak_open"], r["peak_date"])
        for r in QUERIES["open_order_concurrency"](spark, SF_SMOKE).collect()
    }
    li = read_table(spark, SF_SMOKE, "lineitem")
    o = read_table(spark, SF_SMOKE, "orders")
    c = read_table(spark, SF_SMOKE, "customer")
    close = li.groupBy("l_orderkey").agg(
        F.date_trunc("day", F.max("l_shipdate")).cast("date").alias("closed")
    )
    spans = (
        o.join(close, o["o_orderkey"] == close["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_nationkey",
            F.date_trunc("day", "o_orderdate").cast("date").alias("opened"),
            "closed",
        )
        .select(
            "c_nationkey", "opened", F.greatest("closed", "opened").alias("closed")
        )
    )
    days = spans.select(
        "c_nationkey",
        F.explode(F.expr("sequence(opened, closed, interval 1 day)")).alias("d"),
    )
    brute = (
        days.groupBy("c_nationkey", "d")
        .agg(F.count(F.lit(1)).alias("n_open"))
        .groupBy("c_nationkey")
        .agg(F.max("n_open").alias("peak"))
        .collect()
    )
    assert brute
    for r in brute:
        assert out[r["c_nationkey"]][0] == r["peak"], r


def test_pareto_frontier_matches_brute_force(spark):
    """Window-based skyline == the O(n²) NOT EXISTS dominance scan."""
    out = QUERIES["pareto_frontier"](spark, SF_SMOKE)
    got = {(r["p_brand"], r["p_partkey"]) for r in out.collect()}
    p = read_table(spark, SF_SMOKE, "part").select(
        "p_brand",
        "p_partkey",
        F.col("p_size").cast("long").alias("size"),
        (F.col("p_retailprice").cast(MONEY) * 100).cast("long").alias("pc"),
    )
    a, b = p.alias("a"), p.alias("b")
    dominated = (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("b.pc") <= F.col("a.pc"))
            & (F.col("b.size") >= F.col("a.size"))
            & ((F.col("b.pc") < F.col("a.pc")) | (F.col("b.size") > F.col("a.size"))),
            "left_semi",
        )
        .select("p_brand", "p_partkey")
        .collect()
    )
    dom = {(r["p_brand"], r["p_partkey"]) for r in dominated}
    allkeys = {(r["p_brand"], r["p_partkey"]) for r in p.collect()}
    assert got == allkeys - dom
    assert got, "smoke frontier should be non-empty"


def test_column_profile_covers_all_five_columns(spark):
    rows = {r["col_name"]: r for r in QUERIES["column_profile"](spark, SF_SMOKE).collect()}
    assert set(rows) == {
        "o_orderstatus",
        "o_orderpriority",
        "o_custkey",
        "o_orderdate",
        "o_totalprice_cents",
    }
    n = read_table(spark, SF_SMOKE, "orders").count()
    for r in rows.values():
        assert r["n_nonnull"] == n
        assert 1 <= r["n_distinct"] <= n
        assert 0 < r["top_share_ppm"] <= 1_000_000
    # status is low-cardinality, custkey is near-key — the profile
    # must expose that spread
    assert rows["o_orderstatus"]["n_distinct"] < 10
    assert rows["o_custkey"]["n_distinct"] > rows["o_orderstatus"]["n_distinct"]


def test_mv_refresh_base_and_delta_both_nonempty(spark):
    """The pivot must actually split the data — otherwise the merge
    degenerates to a recompute and proves nothing."""
    o = read_table(spark, SF_SMOKE, "orders")
    before = o.filter(F.col("o_orderdate") < F.lit("1998-01-01")).count()
    after = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01")).count()
    assert before > 0 and after > 0, (before, after)


def test_prefix_jaccard_zero_false_negatives(spark):
    """AllPairs' guarantee: every sampled pair with exact Jaccard ≥ 0.9
    appears in the output (brute-force all-pairs over the 1/8 sample)."""
    out = {
        (r["id_a"], r["id_b"]): r["jaccard_ppm"]
        for r in QUERIES["prefix_jaccard_join"](spark, SF_SMOKE).collect()
    }
    d = (
        read_table(spark, SF_SMOKE, "documents")
        .filter(F.col("text").isNotNull())
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
        )
        .select("doc_id", F.array_distinct(F.split("text", " ")).alias("toks"))
        .select(
            "doc_id", F.filter("toks", lambda t: t != "").alias("toks")
        )
        .collect()
    )
    docs = {r["doc_id"]: set(r["toks"]) for r in d}
    ids = sorted(docs)
    expected = {}
    for i, x in enumerate(ids):
        for y in ids[i + 1 :]:
            inter = len(docs[x] & docs[y])
            union = len(docs[x] | docs[y])
            if union and 10 * inter >= 9 * union:
                expected[(x, y)] = inter * 1_000_000 // union
    assert out == expected
    assert expected, "smoke sample should contain at least one 0.9-pair"


def test_round5_batch2_plan_shapes(spark):
    """No Python in any hot path; joins/aggs shuffle where they must
    and nowhere else; dimension attaches broadcast."""

    def shape(name):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        return p

    # proration: the orderkey co-partition join (2 exchanges) + the
    # weekly census (1) + the output sort; explode must be map-side
    # (a Generate with no exchange between join and aggregate).
    p = shape("revenue_recognition")
    assert "Generate explode" in p, p
    assert p.count("Exchange hashpartitioning") <= 3, p

    # sweep: the spans build (orderkey close-agg + orders join +
    # customer broadcast) moved into the session `_order_spans` spool
    # (r10-opt); the serve plan is spool scan → boundary union → daily
    # census → per-nation windows — never a day-level explode, and the
    # spool must be the only source (no fact re-scan).
    p = shape("open_order_concurrency")
    assert "Generate" not in p, f"sweep must not explode days\n{p}"
    assert "spark_graft_spool" in p, f"spans not served from the spool\n{p}"
    assert "lineitem" not in p, f"fact scan leaked past the spans spool\n{p}"

    # skyline: two windows over the same brand partition; no self-join.
    p = shape("pareto_frontier")
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p, (
        f"skyline regressed to a dominance self-join\n{p}"
    )

    # profiler: the (col,val) census + per-col rollup; the stack
    # unpivot must fuse into the scan stage (no exchange before the
    # first partial aggregate).
    p = shape("column_profile")
    assert p.count("Exchange hashpartitioning") <= 4, p

    # MV refresh: two map-side-combined aggs + the MV-row merge; the
    # full-outer join touches only census rows.
    p = shape("mv_refresh")
    assert p.count("Exchange hashpartitioning") <= 4, p

    # AllPairs: token-keyed candidate join + pair verify; all
    # expression-side. The tokenize explode runs ONCE in the spooled
    # token-artifact build (r8), so the final plan reads the spool —
    # a parquet scan of the spool dir — instead of containing the
    # Generate. Pinned structurally (no explode + spool-root scan)
    # rather than on the Spark-rendered schema string, which is
    # coupled to plan-string formatting and spool column order
    # (ADVICE r8).
    p = shape("prefix_jaccard_join")
    assert "Generate explode" not in p, f"tokenize explode re-entered the serve plan\n{p}"
    assert "spark_graft_spool" in p, f"serve plan no longer reads the token spool\n{p}"


def test_hazard_weekly_risk_set_accounting(spark):
    """at_risk(min week) == total users; at_risk is non-increasing in
    k; every user terminates exactly once (churn + censored == users)."""
    rows = QUERIES["hazard_weekly"](spark, SF_SMOKE).collect()
    users = (
        read_table(spark, SF_SMOKE, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[0]["at_risk"] == users
    risks = [r["at_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)
    assert sum(r["n_churned"] + r["n_censored"] for r in rows) == users
    for r in rows:
        assert 0 <= r["hazard_ppm"] <= 1_000_000


def test_key_gap_islands_are_maximal_runs(spark):
    """Each reported island is a contiguous all-'F' key run whose
    neighbors (start-1, end+1) are NOT status 'F'."""
    rows = QUERIES["key_gap_islands"](spark, SF_SMOKE).collect()
    assert rows
    fkeys = {
        r["o_orderkey"]
        for r in read_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
        .collect()
    }
    for r in rows:
        s, e = r["start_key"], r["end_key"]
        assert r["island_len"] == e - s + 1
        assert all(k in fkeys for k in range(s, e + 1))
        assert s - 1 not in fkeys and e + 1 not in fkeys
    # n_islands is a corpus-wide constant across rows
    assert len({r["n_islands"] for r in rows}) == 1


def test_join_size_estimate_actual_is_true_join_size(spark):
    """f2_actual must equal the real row count of the self-join."""
    row = QUERIES["join_size_estimate"](spark, SF_SMOKE).collect()[0]
    e = read_table(spark, SF_SMOKE, "events").select("user_id")
    true_size = e.alias("a").join(e.alias("b"), "user_id").count()
    assert row["f2_actual"] == true_size
    assert row["n_sampled"] <= row["n_keys"]


def test_weekday_seasonality_dow_formula(spark):
    """The integer dow formula must agree with Python's isoweekday on
    the actual event timestamps."""
    rows = QUERIES["weekday_seasonality"](spark, SF_SMOKE).collect()
    n_total = read_table(spark, SF_SMOKE, "events").count()
    assert sum(r["n_events"] for r in rows) == n_total
    sample = (
        read_table(spark, SF_SMOKE, "events").select("ts").limit(50).collect()
    )
    from collections import Counter

    got_by_dow = {r["dow_iso"]: r for r in rows}
    py = Counter(t["ts"].isoweekday() for t in sample)
    for dow in py:
        assert dow in got_by_dow
    # index averages to ~1e6 across the census (weighted by count)
    wsum = sum(r["index_ppm"] * r["n_events"] for r in rows)
    assert abs(wsum / n_total - 1_000_000) < 2_000


def test_state_snapshot_diff_census_accounts_for_every_user(spark):
    rows = QUERIES["state_snapshot_diff"](spark, SF_SMOKE).collect()
    users = read_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == users
    kinds = {r["change_kind"] for r in rows}
    assert kinds <= {"added", "changed", "unchanged"}
    for r in rows:
        if r["change_kind"] == "added":
            assert r["old_state"] == "<none>"
        if r["change_kind"] == "changed":
            assert r["old_state"] != r["new_state"]
        if r["change_kind"] == "unchanged":
            assert r["old_state"] == r["new_state"]


def test_zipf_audit_rank_is_true_frequency_order(spark):
    rows = QUERIES["zipf_audit"](spark, SF_SMOKE).collect()
    assert rows
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    for r in rows:
        assert r["rf_product"] == r["rank"] * r["freq"]
    # median row has dev_ppm == 0 by construction
    assert any(r["dev_ppm"] == 0 for r in rows)


def test_tpch_q3_revenue_is_exact_decimal(spark):
    """Each order's revenue must equal the per-line exact decimal sum."""
    rows = QUERIES["tpch_q3"](spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10
    li = read_table(spark, SF_SMOKE, "lineitem")
    from decimal import Decimal

    for r in rows[:3]:
        lines = (
            li.filter(
                (F.col("l_orderkey") == r["l_orderkey"])
                & (F.col("l_shipdate") > F.lit("1998-06-01"))
            )
            .select("l_extendedprice", "l_discount")
            .collect()
        )
        expect = sum(
            Decimal(str(x["l_extendedprice"])).quantize(Decimal("0.01"))
            * (1 - Decimal(str(x["l_discount"])).quantize(Decimal("0.01")))
            for x in lines
        )
        assert float(expect) == r["revenue"], (r, expect)


def test_round5_batch4_plan_shapes(spark):
    def shape(name):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        return p

    # Q3: customer broadcasts, ONE shuffle join edge max
    # (lineitem-orders), top-10 via TakeOrderedAndProject (no global
    # sort), both date filters pushed to the scans.
    p = shape("tpch_q3")
    assert "BroadcastExchange" in p, p
    assert "TakeOrderedAndProject" in p, f"top-10 regressed to a global sort\n{p}"
    assert "PushedFilters" in p, p

    # Q5: every dimension broadcasts; lineitem-orders is the only
    # shuffle join.
    p = shape("tpch_q5")
    assert p.count("BroadcastHashJoin") >= 3, f"dims not broadcast\n{p}"
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") <= 1, p

    # snapshot diff: both snapshots share one scan lineage; shuffles
    # carry (user, state) pairs.
    p = shape("state_snapshot_diff")
    assert "Generate" not in p, p

    # zipf: one token census shuffle; everything else on <=50 rows.
    p = shape("zipf_audit")
    assert "Generate explode" in p, p


def test_stream_running_totals_crosses_batch_boundary(spark):
    """Final n must be exactly 2x the snapshot count per type (two
    staged deliveries), proving the state survived the batch split."""
    rows = {r["key"]: r for r in QUERIES["stream_running_totals"](spark, SF_SMOKE).collect()}
    batch = {
        r["event_type"]: r["n"]
        for r in read_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(rows) == set(batch)
    for k, r in rows.items():
        assert r["n"] == 2 * batch[k], (k, r["n"], batch[k])


def test_capped_balance_matches_python_fold(spark):
    out = {
        r["user_id"]: (r["final_cents"], r["peak_cents"], r["n_weeks"])
        for r in QUERIES["capped_balance"](spark, SF_SMOKE).collect()
    }
    import manipula_o_de_dataframes_spark.operators.temporal as tmp

    raw = (
        read_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            "event_type",
            F.floor(tmp.seconds_since_origin("ts") / F.lit(604800)).alias("wk"),
            (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("c"),
        )
        .collect()
    )
    from collections import defaultdict

    weekly = defaultdict(int)
    for r in raw:
        sign = 1 if r["event_type"] == "purchase" else -1
        weekly[(r["user_id"], r["wk"])] += sign * r["c"]
    per_user = defaultdict(list)
    for (u, wk), net in weekly.items():
        per_user[u].append((wk, net))
    for u, pairs in per_user.items():
        bal, peak = 0, 0
        for _, net in sorted(pairs):
            bal = max(0, bal + net)
            peak = max(peak, bal)
        assert out[u] == (bal, peak, len(pairs)), u
    assert set(out) == set(per_user)


def test_ltv_cohorts_cumulative_is_monotone_and_complete(spark):
    rows = QUERIES["ltv_cohorts"](spark, SF_SMOKE).collect()
    from collections import defaultdict

    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort_week"]].append(r)
    for _, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age_weeks"])
        run = 0
        for r in rs:
            run += r["rev_cents"]
            assert r["cum_cents"] == run
            assert r["n_active"] <= r["cohort_users"]
        # age 0 always exists (the first purchase defines the cohort)
        assert rs[0]["age_weeks"] == 0


def test_topk_with_ties_keeps_whole_tie_groups(spark):
    rows = QUERIES["topk_with_ties"](spark, SF_SMOKE).collect()
    li = read_table(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", F.col("l_quantity").cast("long").alias("q")
    )
    p = read_table(spark, SF_SMOKE, "part").select("p_partkey", "p_brand")
    qty = {
        (r["p_brand"], r["p_partkey"]): r["tq"]
        for r in li.groupBy("l_partkey")
        .agg(F.sum("q").alias("tq"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .collect()
    }
    from collections import defaultdict

    per_brand = defaultdict(list)
    for (b, pk), tq in qty.items():
        per_brand[b].append((tq, pk))
    expected = set()
    for b, vals in per_brand.items():
        top3 = sorted({tq for tq, _ in vals}, reverse=True)[:3]
        for tq, pk in vals:
            if tq in top3:
                expected.add((b, pk, tq))
    got = {(r["p_brand"], r["p_partkey"], r["total_qty"]) for r in rows}
    assert got == expected


def test_tpch_classics_plan_shapes(spark):
    """Plan pins for the Q1/Q4/Q6/Q18 additions — each exists to
    demonstrate one specific 100 TB posture, so the plan IS the test."""

    def shape(name):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        return p

    # Q1: one scan, map-side partial agg, ONE exchange carrying 6
    # partial rows, shipdate pushed to the reader.
    p = shape("tpch_q1")
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "PushedFilters" in p, p
    assert "HashAggregate" in p, p

    # Q4: LEFT SEMI on orderkey (each order counted once), never
    # join-then-distinct; the 1996 window pushes to the orders scan.
    p = shape("tpch_q4")
    assert "LeftSemi" in p, f"EXISTS did not stay a semi-join\n{p}"
    assert "Distinct" not in p, p
    assert "PushedFilters" in p, p

    # Q6: pure scan probe — zero joins, scalar agg, quantity+date
    # pushed down (the cent-grid discount band is a cast so it
    # filters post-scan; quantity and shipdate must reach the reader).
    p = shape("tpch_q6")
    assert "Join" not in p, p
    assert "PushedFilters: [" in p and "l_shipdate" in p.split("PushedFilters")[1][:300], p

    # Q18: aggregate-then-join — the HAVING agg must sit BELOW the
    # orders join, customer broadcasts, top-100 never global-sorts.
    p = shape("tpch_q18")
    assert "BroadcastHashJoin" in p, p
    assert "TakeOrderedAndProject" in p, f"top-100 regressed to a global sort\n{p}"
    join_pos = p.find("SortMergeJoin")
    if join_pos == -1:
        join_pos = p.find("ShuffledHashJoin")
    agg_pos = p.rfind("HashAggregate")
    assert agg_pos > join_pos >= 0 or join_pos == -1, (
        f"quantity agg not below the orders join\n{p}"
    )


def test_tpch_q1_averages_are_exact_division(spark):
    """avg = exact-decimal numerator / exact count, one IEEE divide."""
    rows = QUERIES["tpch_q1"](spark, SF_SMOKE).collect()
    assert len(rows) == 6  # 3 returnflags x 2 linestatuses
    for r in rows:
        assert r["avg_qty"] == r["sum_qty"] / r["count_order"]
        assert r["avg_price"] == r["sum_base_price"] / r["count_order"]
        assert r["sum_charge"] >= r["sum_disc_price"] >= 0


def test_tpch_q18_threshold_is_strict(spark):
    rows = QUERIES["tpch_q18"](spark, SF_SMOKE).collect()
    assert rows, "sf0.001 has 25 orders above 250"
    assert all(r["sum_qty"] > 250 for r in rows)
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_round5_continuation_trio_plan_shapes(spark):
    def shape(name):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        assert "CartesianProduct" not in p, f"{name}:\n{p}"
        return p

    # overlap matrix: distinct census + shingle window + pair agg —
    # the self-join must ride the shingle key, never nested-loop.
    p = shape("source_overlap_matrix")
    assert "BroadcastNestedLoop" not in p, p
    assert p.count("Exchange hashpartitioning") <= 6, p

    # zone-map audit: one scan feeding both layouts via explode, a
    # 128-group aggregate, a 2-row rollup; min/max attach broadcasts.
    p = shape("zonemap_prune_audit")
    assert p.count("Exchange hashpartitioning") <= 4, p
    assert "BroadcastExchange" in p, p
    assert "Generate explode" in p, p

    # MAD: census-keyed shuffles only, both stat tables broadcast back.
    p = shape("mad_outliers")
    assert p.count("Exchange hashpartitioning") <= 4, p
    assert p.count("BroadcastHashJoin") >= 2, p


def test_zonemap_clustered_layout_actually_skips(spark):
    """The audit's whole point: range layout prunes, hash layout
    can't (every hash bucket spans the full date range)."""
    rows = {r["layout"]: r for r in QUERIES["zonemap_prune_audit"](spark, SF_SMOKE).collect()}
    assert set(rows) == {"hash_orderkey", "range_shipdate"}
    assert rows["range_shipdate"]["skip_ppm"] > rows["hash_orderkey"]["skip_ppm"]
    assert rows["range_shipdate"]["n_pruned"] > 0
    for r in rows.values():
        assert r["rows_skipped"] <= r["rows_total"]
        assert r["n_pruned"] <= r["n_buckets"] <= 64


def test_mad_outliers_fence_is_robust(spark):
    rows = QUERIES["mad_outliers"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_outliers"] <= r["n"]
        assert r["mad_cents"] >= 0
        assert r["outlier_ppm"] == r["n_outliers"] * 1000000 // r["n"]


def test_source_overlap_matrix_bounds(spark):
    rows = QUERIES["source_overlap_matrix"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert r["shared_grams"] <= min(r["n_a"], r["n_b"])
        assert 0 <= r["containment_a_ppm"] <= 1_000_000
        assert 0 <= r["containment_b_ppm"] <= 1_000_000


def test_round5_batch6_plan_shapes(spark):
    def shape(name):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        assert "CartesianProduct" not in p, f"{name}:\n{p}"
        return p

    # bloom prune: bitmap rides a one-row broadcast; the probe is a
    # scan-side expression (no join on the probe path); exact truth is
    # a LEFT SEMI.
    p = shape("bloom_join_prune")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
    assert "LeftSemi" in p, p

    # FD discovery: per-candidate lhs-keyed census aggregates, a
    # post-aggregation union, no joins at all.
    p = shape("fd_discovery")
    assert "Join" not in p or "Union" in p, p
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p, p

    # l-diversity: dims broadcast, one fact shuffle for the census,
    # top-20 via TakeOrderedAndProject.
    p = shape("l_diversity_audit")
    assert p.count("BroadcastHashJoin") >= 2, p
    assert "TakeOrderedAndProject" in p, p

    # interpolation: the two IGNORE NULLS windows run over the bounded
    # calendar spine AFTER the weekly aggregate — the window input is
    # post-aggregation, so no Window node consumes raw order rows.
    p = shape("interpolate_weeks")
    assert "Window" in p, p

    # join-MV delta: dims broadcast on every path, nation-keyed
    # partial-sum shuffles only.
    p = shape("mv_join_delta")
    assert p.count("BroadcastHashJoin") >= 4, p


def test_bloom_join_prune_guarantees(spark):
    r = QUERIES["bloom_join_prune"](spark, SF_SMOKE).collect()[0]
    # no false negatives, bounded false positives, sane ppm
    assert r["exact_match"] <= r["bloom_pass"] <= r["n_fact_rows"]
    assert r["fp_rows"] == r["bloom_pass"] - r["exact_match"]
    assert 0 < r["pass_ppm"] < 1_000_000  # selective predicate prunes most rows
    assert r["n_dim_keys"] > 0


def test_fd_discovery_key_fd_holds(spark):
    rows = {(r["table_name"], r["lhs"], r["rhs"]): r for r in QUERIES["fd_discovery"](spark, SF_SMOKE).collect()}
    key_fd = rows[("orders", "o_orderkey", "o_orderstatus")]
    assert key_fd["holds"] == 1 and key_fd["n_viol_lhs"] == 0 and key_fd["max_rhs"] == 1
    seg = rows[("customer", "c_nationkey", "c_mktsegment")]
    assert seg["holds"] == 0 and seg["max_rhs"] > 1


def test_interpolate_weeks_is_piecewise_linear(spark):
    rows = QUERIES["interpolate_weeks"](spark, SF_SMOKE).collect()
    assert rows
    # observed weeks keep their exact value; gaps lie between their
    # neighbors' values (monotone segment bound)
    vals = [(r["semana"], r["observed"], r["cents"]) for r in rows]
    assert any(o == 0 for _, o, _ in vals), "fixture should have gaps"
    for i, (_, o, c) in enumerate(vals):
        if o == 0 and 0 < i < len(vals) - 1:
            assert c is not None


def test_mv_join_delta_all_nations_match(spark):
    rows = QUERIES["mv_join_delta"](spark, SF_SMOKE).collect()
    assert rows
    assert all(r["match"] == 1 for r in rows)
    assert all(r["merged_cents"] == r["base_cents"] + r["delta_cents"] for r in rows)


def test_round5_batch7_plan_shapes(spark):
    def shape(name):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        assert "CartesianProduct" not in p, f"{name}:\n{p}"
        return p

    # Theil–Sen: the census build (fact shuffle + broadcast dims)
    # moved into the session `_weekly_nation_census` spool (r10-opt);
    # the quadratic self-join runs on the nation-keyed CENSUS read
    # from the spool — no nested loop, no fact re-scan.
    p = shape("theilsen_trend")
    assert "BroadcastNestedLoop" not in p, p
    assert "spark_graft_spool" in p, f"census not served from the spool\n{p}"
    assert "orders" not in p, f"fact scan leaked past the census spool\n{p}"

    # χ²: one user census shuffle, then single-row arithmetic.
    p = shape("ab_contingency_chi2")
    assert p.count("Exchange hashpartitioning") <= 2, p
    assert "Join" not in p, p

    # paths: ONE user-keyed window cascade (sessionize + leads share
    # the partition), census agg, top-20 via TakeOrderedAndProject.
    p = shape("event_paths")
    assert p.count("Exchange hashpartitioning") <= 2, p
    assert "TakeOrderedAndProject" in p, p


def test_theilsen_median_is_an_actual_slope(spark):
    """Rank selection returns an element, not an interpolation: the
    reported slope must appear in the recomputed pairwise slope set."""
    rows = QUERIES["theilsen_trend"](spark, SF_SMOKE).collect()
    assert rows
    census = {}
    import collections
    from manipula_o_de_dataframes_spark.queries import read_table
    o = read_table(spark, SF_SMOKE, "orders")
    c = read_table(spark, SF_SMOKE, "customer")
    n = read_table(spark, SF_SMOKE, "nation")
    df = (
        o.join(c, o["o_custkey"] == c["c_custkey"]) 
        .join(n, c["c_nationkey"] == n["n_nationkey"]) 
        .select("n_name", F.expr("floor(datediff(o_orderdate, '1970-01-01') / 7)").cast("long").alias("wk"),
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).alias("cents"))
        .groupBy("n_name", "wk").agg(F.sum("cents").cast("bigint").alias("cents"))
        .collect()
    )
    per = collections.defaultdict(list)
    for r in df:
        per[r["n_name"]].append((r["wk"], r["cents"]))
    for row in rows:
        pts = sorted(per[row["nation"]])
        slopes = sorted(
            (float(cb - ca) / float(wb - wa), wa, wb)
            for i, (wa, ca) in enumerate(pts)
            for (wb, cb) in pts[i + 1:]
        )
        assert row["n_pairs"] == len(slopes)
        lower_median = slopes[(len(slopes) + 1) // 2 - 1][0]
        assert row["ts_slope_cents_per_week"] == lower_median


def test_ab_chi2_cells_partition_users(spark):
    r = QUERIES["ab_contingency_chi2"](spark, SF_SMOKE).collect()[0]
    from manipula_o_de_dataframes_spark.queries import read_table
    n_users = read_table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
    assert r["a"] + r["b"] + r["c"] + r["d"] == n_users
    assert r["chi2_micro"] >= 0


def test_event_paths_counts_are_session_bounded(spark):
    rows = QUERIES["event_paths"](spark, SF_SMOKE).collect()
    assert rows
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(r["path"].count(">") == 2 for r in rows)


def test_round5_batch8_plan_shapes(spark):
    def shape(name):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        assert "CartesianProduct" not in p, f"{name}:\n{p}"
        return p

    # latency deciles: user-keyed aggregates + bounded census windows.
    p = shape("conversion_latency")
    assert "BroadcastNestedLoop" not in p, p

    # backlog aging: the Q18 aggregate-then-join discipline — the
    # lineitem max-shipdate agg must sit BELOW the orders join.
    p = shape("backlog_aging")
    join_pos = max(p.find("SortMergeJoin"), p.find("ShuffledHashJoin"), p.find("BroadcastHashJoin"))
    agg_pos = p.rfind("HashAggregate")
    assert agg_pos > join_pos >= 0, f"last-ship agg not below the join\n{p}"


def test_stream_late_drop_really_drops(spark):
    """The drop path must engage: the measured numRowsDroppedByWatermark
    equals the late rows whose hour window was finalized, and no late
    row leaks into any emitted count."""
    import duckdb
    from manipula_o_de_dataframes_spark.streaming.stateful import late_drop_drained

    rows = {r["janela"]: r["n"] for r in QUERIES["stream_late_drop"](spark, SF_SMOKE).collect()}
    assert rows
    con = duckdb.connect()
    # the metric counts map-side-combined PARTIALS, i.e. one row per
    # distinct finalized late window (all 117 late input rows at this
    # SF collapse to their 107 distinct hour windows before the state
    # store applies the watermark filter)
    expected_drops = con.execute(f"""
      WITH tagged AS (
        SELECT ts,
          (('0x' || substr(md5('late:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 8 = 0) AS is_late
        FROM read_parquet('{SF_SMOKE}/events.parquet')
      ), wm AS (SELECT MAX(ts) - INTERVAL 30 MINUTE AS wm FROM tagged WHERE NOT is_late)
      SELECT COUNT(DISTINCT date_trunc('hour', t.ts)) FROM tagged t, wm
      WHERE t.is_late AND date_trunc('hour', t.ts) + INTERVAL 1 HOUR <= wm.wm
    """).fetchone()[0]
    assert late_drop_drained.last_dropped == expected_drops > 0
    # emitted counts are pure on-time: totals must equal on-time rows
    # in finalized windows, strictly fewer than the full snapshot
    total = con.execute(f"SELECT COUNT(*) FROM read_parquet('{SF_SMOKE}/events.parquet')").fetchone()[0]
    assert sum(rows.values()) < total


def test_conversion_latency_ranks_are_exact(spark):
    rows = QUERIES["conversion_latency"](spark, SF_SMOKE).collect()
    assert [r["pct"] for r in rows] == [10, 25, 50, 75, 90]
    n = rows[0]["n_users"]
    for r in rows:
        assert r["rank"] == (r["pct"] * n + 99) // 100
        assert r["n_users"] == n
    deltas = [r["delta_min"] for r in rows]
    assert deltas == sorted(deltas)


def test_backlog_aging_buckets_partition_open_orders(spark):
    rows = QUERIES["backlog_aging"](spark, SF_SMOKE).collect()
    assert rows
    edges = {"00-030d": 30, "031-090d": 90, "091-180d": 180, "181-365d": 365}
    for r in rows:
        if r["age_bucket"] in edges:
            assert r["oldest_days"] <= edges[r["age_bucket"]]
        assert r["n_orders"] > 0 and r["value_cents"] > 0


def test_round5_batch9_plan_shapes(spark):
    def shape(name):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        assert "CartesianProduct" not in p, f"{name}:\n{p}"
        return p

    # dim profile: posexplode → ONE 64-group map-combined aggregate.
    p = shape("embedding_dim_profile")
    assert p.count("Exchange hashpartitioning") <= 1, p
    assert "Generate" in p, p

    # split points: boundaries ride a one-row broadcast; assignment is
    # a scan-side expression; one census shuffle closes it.
    p = shape("range_split_points")
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p, p

    # grouping sets: ONE Expand + one aggregate, never three scans.
    p = shape("grouping_sets_rollup")
    assert "Expand" in p, p
    assert p.count("Scan parquet") <= 2, p  # customer + nation


def test_range_split_points_buckets_are_balanced_up_to_ties(spark):
    rows = QUERIES["range_split_points"](spark, SF_SMOKE).collect()
    assert [r["bucket"] for r in rows] == list(range(32))
    total = sum(r["n_bucket"] for r in rows)
    from manipula_o_de_dataframes_spark.queries import read_table
    assert total == read_table(spark, SF_SMOKE, "orders").count()
    # price cents at this SF are near-unique → every bucket within 10%
    ideal = total // 32
    for r in rows:
        assert abs(r["n_bucket"] - ideal) <= max(2, ideal // 10), rows


def test_grouping_sets_levels_are_consistent(spark):
    rows = QUERIES["grouping_sets_rollup"](spark, SF_SMOKE).collect()
    grand = [r for r in rows if r["gid"] == 3]
    assert len(grand) == 1
    per_nation = {r["nation"]: r for r in rows if r["gid"] == 1}
    cells = [r for r in rows if r["gid"] == 0]
    assert grand[0]["n_customers"] == sum(r["n_customers"] for r in per_nation.values())
    for nat, nrow in per_nation.items():
        sub = [r for r in cells if r["nation"] == nat]
        assert nrow["n_customers"] == sum(r["n_customers"] for r in sub)
        assert nrow["acctbal_cents"] == sum(r["acctbal_cents"] for r in sub)


def test_embedding_dim_profile_bounds(spark):
    rows = QUERIES["embedding_dim_profile"](spark, SF_SMOKE).collect()
    assert [r["dim"] for r in rows] == list(range(64))
    for r in rows:
        assert r["min_micro"] <= r["mean_micro"] <= r["max_micro"]


def test_round5_batch10_plan_shapes(spark):
    def shape(name):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        assert "CartesianProduct" not in p, f"{name}:\n{p}"
        return p

    # weighted median: dims broadcast; the nation sort-window is the
    # one honest heavy stage.
    p = shape("weighted_median_price")
    assert p.count("BroadcastHashJoin") >= 2, p

    # TWAB: window and groupBy share the user key — ONE fact shuffle.
    p = shape("twab_balance")
    assert p.count("Exchange hashpartitioning") <= 1, p

    # Gini: custkey census shuffle + census rank; no joins.
    p = shape("order_count_gini")
    assert "Join" not in p, p


def test_weighted_median_dominates_by_quantity(spark):
    """The reported element must be a real price and sit at the
    weighted midpoint: quantity strictly below it < half total."""
    rows = QUERIES["weighted_median_price"](spark, SF_SMOKE).collect()
    assert rows
    li = read_table(spark, SF_SMOKE, "lineitem")
    o = read_table(spark, SF_SMOKE, "orders")
    c = read_table(spark, SF_SMOKE, "customer")
    n = read_table(spark, SF_SMOKE, "nation")
    full = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"]) 
        .join(c, o["o_custkey"] == c["c_custkey"]) 
        .join(n, c["c_nationkey"] == n["n_nationkey"]) 
        .select("n_name", (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
                F.col("l_quantity").cast("long").alias("qty"))
        .collect()
    )
    import collections
    per = collections.defaultdict(list)
    for r in full:
        per[r["n_name"]].append((r["cents"], r["qty"]))
    for row in rows:
        pts = per[row["nation"]]
        total = sum(q for _, q in pts)
        assert total == row["total_qty"]
        below = sum(q for cents, q in pts if cents < row["wmedian_cents"])
        at_or_below = sum(q for cents, q in pts if cents <= row["wmedian_cents"])
        assert below * 2 < total <= at_or_below * 2


def test_twab_matches_python_fold(spark):
    rows = {r["user_id"]: r for r in QUERIES["twab_balance"](spark, SF_SMOKE).collect()}
    assert rows
    import manipula_o_de_dataframes_spark.operators.temporal as tmp_mod
    e = read_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "event_type",
        tmp_mod.seconds_since_origin("ts").alias("t"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    ).collect()
    import collections
    per = collections.defaultdict(list)
    for r in e:
        per[r["user_id"]].append((r["t"], r["event_id"], r["event_type"], r["cents"]))
    for uid, evs in per.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        bal, num, dur, peak = 0, 0, 0, None
        for i, (t, _, typ, cents) in enumerate(evs):
            bal += cents if typ == "purchase" else (-cents if typ == "error" else 0)
            if i + 1 < len(evs):
                dt = evs[i + 1][0] - t
                num += dt * bal
                dur += dt
                peak = bal if peak is None else max(peak, bal)
        if dur == 0:
            assert uid not in rows or rows[uid]["obs_seconds"] == 0
            continue
        r = rows[uid]
        assert r["obs_seconds"] == dur
        assert r["twab_cents"] == num / dur
        assert r["peak_cents"] == peak


def test_gini_bounds_and_moments(spark):
    r = QUERIES["order_count_gini"](spark, SF_SMOKE).collect()[0]
    assert 0 <= r["gini_micro"] < 1_000_000
    assert r["total_orders"] >= r["n_customers"] > 0


def test_round5_batch11_plan_shapes(spark):
    def shape(name):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        return p

    # KS drift: census-grid windows; the sources×values cross is the
    # bounded dense grid, not a data blow-up.
    p = shape("ks_length_drift")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p

    # PIT join: versioned dim broadcasts, range predicates ride the
    # custkey equi-join — never a nested loop over facts.
    p = shape("scd2_pit_join")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p


def test_scd2_pit_join_each_order_matches_one_version(spark):
    rows = QUERIES["scd2_pit_join"](spark, SF_SMOKE).collect()
    total = sum(r["n_orders"] for r in rows)
    assert total == read_table(spark, SF_SMOKE, "orders").count()
    # v2 only exists for %3==0 customers after the cut
    assert any(r["ver"] == "v2" for r in rows)


def test_ks_length_drift_is_exact_vs_python(spark):
    rows = {r["source"]: r for r in QUERIES["ks_length_drift"](spark, SF_SMOKE).collect()}
    docs = read_table(spark, SF_SMOKE, "documents").select("source", "n_chars").collect()
    import collections
    per = collections.defaultdict(list)
    allv = []
    for r in docs:
        if r["n_chars"] is not None:
            per[r["source"]].append(r["n_chars"])
            allv.append(r["n_chars"])
    for src, vals in per.items():
        rest = [v for s, lst in per.items() if s != src for v in lst]
        ns, nr = len(vals), len(rest)
        best = 0
        for v in sorted(set(allv)):
            cs = sum(1 for x in vals if x <= v)
            cr = sum(1 for x in rest if x <= v)
            best = max(best, abs(cs * nr - cr * ns))
        assert rows[src]["ks_d_ppm"] == best * 1_000_000 // (ns * nr)


def test_round5_batch12_plan_shapes(spark):
    def shape(name):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        assert "CartesianProduct" not in p, f"{name}:\n{p}"
        return p

    # audience overlap: no self-join — pairs explode from per-user
    # type sets; only census shuffles after.
    p = shape("audience_overlap")
    assert "BroadcastNestedLoop" not in p, p
    assert "Generate explode" in p, p

    # co-occurrence: the interval self-join must ride the user
    # equi-key (hash join with the band as predicate).
    p = shape("event_cooccurrence")
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p, p

    # migration: census ntiles + full outer on custkey.
    p = shape("rfm_migration")
    assert "FullOuter" in p, p


def test_audience_overlap_jaccard_identities(spark):
    rows = QUERIES["audience_overlap"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["t_a"] < r["t_b"]
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
        union = r["n_a"] + r["n_b"] - r["n_both"]
        assert r["jaccard_ppm"] == r["n_both"] * 1_000_000 // union


def test_event_cooccurrence_matches_brute_force(spark):
    rows = {(r["t_a"], r["t_b"]): r["n_pairs"] for r in QUERIES["event_cooccurrence"](spark, SF_SMOKE).collect()}
    assert rows
    import collections
    import manipula_o_de_dataframes_spark.operators.temporal as tmp_mod
    evs = read_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "event_type", tmp_mod.seconds_since_origin("ts").alias("t")
    ).collect()
    per = collections.defaultdict(list)
    for r in evs:
        per[r["user_id"]].append((r["t"], r["event_id"], r["event_type"]))
    expect = collections.Counter()
    for lst in per.values():
        for (ta, ia, tya) in lst:
            for (tb, ib, tyb) in lst:
                if (tb > ta or (tb == ta and ib > ia)) and tb - ta <= 300:
                    expect[(tya, tyb)] += 1
    assert rows == dict(expect)


def test_rfm_migration_conserves_customers(spark):
    rows = QUERIES["rfm_migration"](spark, SF_SMOKE).collect()
    from manipula_o_de_dataframes_spark.queries import read_table
    total_customers = (
        read_table(spark, SF_SMOKE, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == total_customers
    assert not any(r["tier_h1"] == "ABSENT" and r["tier_h2"] == "ABSENT" for r in rows)


def test_round5_batch13_plan_shapes(spark):
    def shape(name):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        assert "CartesianProduct" not in p, f"{name}:\n{p}"
        return p

    # manifest: one map-combined census, no joins.
    p = shape("shard_manifest")
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") <= 2, p

    # decayed rank: census decay + broadcast part names + top-20.
    p = shape("decayed_item_rank")
    assert "TakeOrderedAndProject" in p, p
    assert "BroadcastHashJoin" in p, p

    # attribution: user-keyed interval join, per-purchase window.
    p = shape("position_attribution")
    assert "BroadcastNestedLoop" not in p, p


def test_shard_manifest_fingerprint_flips_on_move(spark):
    """Moving one doc between shards must flip exactly the two
    affected shards' fingerprints (xor algebra)."""
    base = {r["shard"]: r["fingerprint"] for r in QUERIES["shard_manifest"](spark, SF_SMOKE).collect()}
    assert len(base) == 8
    # recompute with one doc's shard reassigned (+1 mod 8) in python
    import duckdb
    con = duckdb.connect()
    rows = con.execute(f"""
      SELECT ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard,
             ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp, doc_id
      FROM read_parquet('{SF_SMOKE}/documents.parquet') WHERE text IS NOT NULL ORDER BY doc_id
    """).fetchall()
    import collections
    fps = collections.defaultdict(int)
    for shard, fp, _ in rows:
        fps[shard] ^= fp
    assert fps == base
    moved = dict(fps)
    s0, fp0, _ = rows[0]
    moved[s0] ^= fp0
    moved[(s0 + 1) % 8] = moved.get((s0 + 1) % 8, 0) ^ fp0
    diff = {s for s in set(moved) | set(fps) if moved.get(s, 0) != fps.get(s, 0)}
    assert diff == {s0, (s0 + 1) % 8}


def test_decayed_rank_is_monotone_in_recency(spark):
    """A part's decayed score is bounded by 1024x its raw quantity and
    strictly positive only if it shipped within the clamp horizon."""
    rows = QUERIES["decayed_item_rank"](spark, SF_SMOKE).collect()
    assert rows
    scores = [r["decayed_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)


def test_position_attribution_conserves_weight(spark):
    rows = {r["position"]: r for r in QUERIES["position_attribution"](spark, SF_SMOKE).collect()}
    assert rows
    # every journey's ppm sums to exactly 1e6: total weight across
    # classes == 1e6 * number of attributed purchases
    import duckdb
    con = duckdb.connect()
    n_buys = con.execute(f"""
      WITH buys AS (SELECT user_id, event_id, date_diff('second', TIMESTAMP '1990-01-01', ts) AS tb
                    FROM read_parquet('{SF_SMOKE}/events.parquet') WHERE event_type='purchase'),
      views AS (SELECT user_id, date_diff('second', TIMESTAMP '1990-01-01', ts) AS tv
                FROM read_parquet('{SF_SMOKE}/events.parquet') WHERE event_type='view')
      SELECT COUNT(DISTINCT b.event_id) FROM buys b JOIN views v
      ON b.user_id = v.user_id AND v.tv <= b.tb AND b.tb - v.tv <= 3600
    """).fetchone()[0]
    total_ppm = sum(r["total_weight_ppm"] for r in rows.values())
    assert total_ppm == 1_000_000 * n_buys


def test_round5_batch14_plan_shapes(spark):
    def shape(name):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        assert "CartesianProduct" not in p, f"{name}:\n{p}"
        return p

    # depth profile: one user window + census rollups.
    p = shape("session_depth_profile")
    assert p.count("Exchange hashpartitioning") <= 3, p

    # band backtest: calendar census passes only; the one-row mid
    # attach is a broadcast nested loop BY DESIGN (bounded), so only
    # a true cartesian is banned (shape() already asserts that).
    shape("seasonal_band_breaches")

    # rounding audit: co-partitioned join, dims broadcast.
    p = shape("rounding_drift_audit")
    assert p.count("BroadcastHashJoin") >= 2, p


def test_session_depth_shares_sum_to_million(spark):
    rows = QUERIES["session_depth_profile"](spark, SF_SMOKE).collect()
    assert rows
    total = sum(r["share_ppm"] for r in rows)
    # integer floor division loses at most (bands-1) ppm
    assert 1_000_000 - len(rows) < total <= 1_000_000
    n_events = sum(r["n_events"] for r in rows)
    assert n_events == read_table(spark, SF_SMOKE, "events").count()


def test_seasonal_bands_are_ordered(spark):
    rows = QUERIES["seasonal_band_breaches"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["p10_cents"] <= r["p90_cents"]
        assert r["n_below"] + r["n_above"] <= r["n_days"]
        assert 1 <= r["dow"] <= 7


def test_rounding_drift_is_bounded_by_half_cent_per_line(spark):
    """|invoice − ledger| ≤ n_lines/2 cents — each line's rounding
    moves at most half a cent."""
    rows = QUERIES["rounding_drift_audit"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert abs(r["drift_cents"]) * 2 <= r["n_lines"], r


def test_round5_batch15_plan_shapes(spark):
    def shape(name):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        assert "CartesianProduct" not in p, f"{name}:\n{p}"
        return p

    # Q10: flag+date pushed to the scans, dims broadcast, top-20 TOaP.
    p = shape("tpch_q10")
    assert "TakeOrderedAndProject" in p, p
    assert p.count("BroadcastHashJoin") >= 2, p
    assert "PushedFilters" in p, p

    # Q14: ONE aggregate over ONE broadcast join — never two scans.
    p = shape("tpch_q14")
    assert p.count("Scan parquet") == 2, p  # lineitem + part
    assert "BroadcastHashJoin" in p, p

    # MAPE: census windows only — the census build (broadcast dims)
    # moved into the session `_weekly_nation_census` spool (r10-opt);
    # the serve plan windows over the spool read, no fact re-scan.
    p = shape("naive_forecast_mape")
    assert "spark_graft_spool" in p, f"census not served from the spool\n{p}"
    assert "orders" not in p, f"fact scan leaked past the census spool\n{p}"


def test_tpch_q14_share_is_consistent(spark):
    r = QUERIES["tpch_q14"](spark, SF_SMOKE).collect()[0]
    assert 0 < r["promo_cents"] < r["total_cents"]
    assert r["promo_ppm"] == r["promo_cents"] * 1_000_000 // r["total_cents"]


def test_naive_mape_median_is_a_member(spark):
    rows = QUERIES["naive_forecast_mape"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["median_ape_ppm"] >= 0
        assert r["n_evals"] > 0


def test_round5_batch16_plan_shapes(spark):
    def shape(name):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        assert "CartesianProduct" not in p, f"{name}:\n{p}"
        return p

    # ABC-XYZ: census moments + census ntiles; no joins at all.
    p = shape("abc_xyz_matrix")
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p, p

    # like-for-like: custkey census join + broadcast dims.
    p = shape("same_customer_growth")
    assert p.count("BroadcastHashJoin") >= 2, p


def test_abc_xyz_covers_all_parts_once(spark):
    rows = QUERIES["abc_xyz_matrix"](spark, SF_SMOKE).collect()
    li = read_table(spark, SF_SMOKE, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r["n_parts"] for r in rows) == n_parts
    assert {r["abc"] for r in rows} <= {"A", "B", "C"}
    assert {r["xyz"] for r in rows} <= {"X", "Y", "Z"}


def test_same_customer_growth_base_is_subset(spark):
    rows = QUERIES["same_customer_growth"](spark, SF_SMOKE).collect()
    assert rows
    o = read_table(spark, SF_SMOKE, "orders")
    total_cust = o.select("o_custkey").distinct().count()
    assert sum(r["n_comparable"] for r in rows) <= total_cust
    for r in rows:
        assert r["h1_cents"] > 0
        expected = (r["h2_cents"] - r["h1_cents"]) * 1_000_000
        got = r["samecust_growth_ppm"]
        # truncation toward zero on both engines
        assert got == int(expected / r["h1_cents"]) or got == expected // r["h1_cents"]


def test_watermarked_join_evicts_state_and_matches_unwatermarked(spark):
    """The production posture proven: state rows are genuinely
    removed (eviction engaged) AND the pair set is identical to the
    drain-everything variant — time-ordered deliveries mean no pair
    is lost to the eviction that bounds state."""
    from manipula_o_de_dataframes_spark.streaming.joins import (
        attribution_pairs_stream,
        attribution_pairs_watermarked,
    )

    wm = QUERIES["attribution_stream_wm"](spark, SF_SMOKE)
    got = {(r["compra"], r["visita"]) for r in wm.collect()}
    assert attribution_pairs_watermarked.last_removed > 0
    plain = attribution_pairs_stream(spark, SF_SMOKE)
    assert got == {(r["compra"], r["visita"]) for r in plain.collect()}
    assert got, "smoke snapshot should produce pairs"


def test_holt_trend_matches_python_fold(spark):
    rows = {r["nation"]: r for r in QUERIES["holt_trend"](spark, SF_SMOKE).collect()}
    assert rows
    import duckdb
    data = duckdb.connect().execute(f"""
      SELECT n.n_name, date_diff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)) // 7 AS wk,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
      FROM read_parquet('{SF_SMOKE}/orders.parquet') o
      JOIN read_parquet('{SF_SMOKE}/customer.parquet') c ON o.o_custkey = c.c_custkey
      JOIN read_parquet('{SF_SMOKE}/nation.parquet') n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchall()
    import collections
    per = collections.defaultdict(list)
    for nat, _, cents in data:
        per[nat].append(cents)
    for nat, xs in per.items():
        l, b = xs[0], 0
        for x in xs[1:]:
            err = x - l - b
            l, b = l + b + (err >> 2), b + (err >> 4)
        r = rows[nat]
        assert (r["level_cents"], r["trend_cents"]) == (l, b), nat
        assert r["forecast_cents"] == l + b


def test_duckdb_list_reduce_struct_bug_still_present():
    """Documents WHY holt's oracle uses a recursive CTE: DuckDB 1.0
    list_reduce updates struct fields in place mid-step. If this
    starts returning 14, the workaround can be retired."""
    import duckdb
    (got,) = duckdb.connect().execute("""
      SELECT list_reduce(list_transform([1,2,3], x -> {'v': CAST(x AS BIGINT), 'w': CAST(x AS BIGINT)}),
        (acc, e) -> {'v': acc.v * 10 + e.v, 'w': acc.v + acc.w})
    """).fetchone()
    correct = {"v": 123, "w": 14}
    assert got["v"] == 123
    if got == correct:
        raise AssertionError(
            "DuckDB fixed list_reduce struct lambdas — holt_trend's "
            "recursive-CTE oracle can be simplified back to list_reduce"
        )


def test_transition_steady_state_conserves_mass(spark):
    rows = QUERIES["transition_steady_state"](spark, SF_SMOKE).collect()
    assert rows
    total = sum(r["steady_ppm"] for r in rows)
    # per-term integer floors lose a bounded number of ppm per step:
    # at most |census| per iteration, 3 iterations
    assert 900_000 < total <= 1_000_000
    assert all(r["steady_ppm"] >= 0 for r in rows)


def test_discount_elasticity_covers_grid(spark):
    rows = QUERIES["discount_elasticity"](spark, SF_SMOKE).collect()
    assert [r["disc_pct"] for r in rows] == sorted(r["disc_pct"] for r in rows)
    li_count = read_table(spark, SF_SMOKE, "lineitem").count()
    assert sum(r["n_lines"] for r in rows) == li_count
    for r in rows:
        assert 0 <= r["disc_pct"] <= 10
        assert r["avg_qty_milli"] == r["total_qty"] * 1000 // r["n_lines"]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None)
@given(
    xs=st.lists(
        st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=12
    )
)
def test_holt_fold_expression_matches_python_on_adversarial_series(spark, xs):
    """The Holt fold's shift arithmetic must match Python's arithmetic
    (floor) shifts on ANY series — negatives, collapses, spikes —
    not just the fixture's. Exercises the exact expression the query
    uses, applied to a literal array."""
    lifted = F.transform(
        F.expr("xs"),
        lambda x: F.struct(x.alias("l"), F.lit(0).cast("bigint").alias("b")),
    )
    state = F.aggregate(
        F.slice(lifted, 2, F.greatest(F.size(lifted) - 1, F.lit(0))),
        F.element_at(lifted, 1),
        lambda acc, e: F.struct(
            (acc["l"] + acc["b"] + F.shiftright(e["l"] - acc["l"] - acc["b"], 2)).alias("l"),
            (acc["b"] + F.shiftright(e["l"] - acc["l"] - acc["b"], 4)).alias("b"),
        ),
    )
    df = spark.createDataFrame([(xs,)], "xs array<long>").select(
        state["l"].alias("l"), state["b"].alias("b")
    )
    got = df.collect()[0]
    l, b = xs[0], 0
    for x in xs[1:]:
        err = x - l - b
        l, b = l + b + (err >> 2), b + (err >> 4)
    assert (got["l"], got["b"]) == (l, b), xs
