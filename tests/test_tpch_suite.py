"""Round-5 TPC-H completion batch (q2/q7/q8/q9/q11/q12/q13/q15/q16/
q17/q19/q20/q21/q22 — the suite is now 22/22 with documented fixture
adaptations where partsupp/shipmode/comment/phone don't exist).

Oracle parity runs in test_oracle_parity; these tests pin the plan
shapes (broadcast discipline, single fact shuffle, no Python in the
path) and the invariants parity can't see (conservation, threshold
boundary exactness, tie semantics).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.queries import QUERIES
from manipula_o_de_dataframes_spark.sources.io import read_table

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_plans_have_no_python_or_cartesian(spark):
    """None of the 14 new TPC-H plans may fall off the JVM fast path;
    the only cross joins allowed are against broadcast one-row
    aggregates (q11/q17/q20/q22's scalar thresholds)."""
    for name in (
        "tpch_q2",
        "tpch_q7",
        "tpch_q8",
        "tpch_q9",
        "tpch_q11",
        "tpch_q12",
        "tpch_q13",
        "tpch_q15",
        "tpch_q16",
        "tpch_q17",
        "tpch_q19",
        "tpch_q20",
        "tpch_q21",
        "tpch_q22",
    ):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, f"{name}: Python in the hot path\n{p}"
        assert "CartesianProduct" not in p, f"{name}: unplanned cartesian\n{p}"
        # scalar-threshold cross joins must be broadcast nested loop
        # against a one-row side, never a shuffle
        if "BroadcastNestedLoopJoin" in p:
            assert name in ("tpch_q11", "tpch_q17", "tpch_q20", "tpch_q22"), (
                f"{name}: unexpected nested-loop join\n{p}"
            )


def test_tpch_star_queries_single_fact_shuffle_join(spark):
    """q5's broadcast discipline generalizes: in q7/q8/q9 every
    dimension (part, supplier, customer, nation, region) broadcasts,
    so the ONLY shuffle join is lineitem⋈orders on orderkey."""
    for name in ("tpch_q7", "tpch_q8", "tpch_q9"):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        smj = p.count("SortMergeJoin") + p.count("ShuffledHashJoin")
        assert smj <= 1, f"{name}: {smj} shuffle joins (dims not broadcast?)\n{p}"
        assert p.count("BroadcastHashJoin") >= 2, f"{name}: dims not broadcast\n{p}"


def test_tpch_q21_single_fact_shuffle(spark):
    """The windowed reformulation's point: ONE orderkey shuffle of the
    (orderkey, suppkey) aggregate serves the exists + not-exists pair
    that the spec writes as three correlated scans."""
    p = _plan(QUERIES["tpch_q21"](spark, SF_SMOKE))
    assert p.count("Exchange hashpartitioning") <= 3, p
    assert "EvalPython" not in p


def test_tpch_q13_conserves_customers_and_orders(spark):
    """The distribution must re-sum to every customer (zero bucket
    included) and every qualifying order."""
    out = QUERIES["tpch_q13"](spark, SF_SMOKE)
    agg = out.agg(
        F.sum("custdist").alias("cust"),
        F.sum(F.col("custdist") * F.col("c_count")).alias("orders"),
    ).collect()[0]
    n_cust = read_table(spark, SF_SMOKE, "customer").count()
    n_orders = (
        read_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .count()
    )
    assert agg["cust"] == n_cust
    assert agg["orders"] == n_orders


def test_tpch_q15_returns_exactly_the_argmax_set(spark):
    """Every returned supplier carries the same (maximal) revenue, and
    no other supplier reaches it."""
    rows = QUERIES["tpch_q15"](spark, SF_SMOKE).collect()
    assert rows
    top = {r["total_cents"] for r in rows}
    assert len(top) == 1
    li = read_table(spark, SF_SMOKE, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    per = (
        li.groupBy("l_suppkey")
        .agg(
            (
                F.round(
                    F.sum(
                        F.col("l_extendedprice").cast("decimal(12,2)")
                        * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)"))
                    ),
                    2,
                )
                * 100
            )
            .cast("bigint")
            .alias("c")
        )
        .agg(F.max("c"))
        .collect()[0][0]
    )
    assert per == top.pop()


def test_tpch_q17_integer_threshold_matches_float_formulation(spark):
    """5·qty·cnt < sum_qty must select EXACTLY the lines the spec's
    qty < 0.2·avg(qty) float formulation selects (quantity integral,
    so the cross-multiplication is lossless)."""
    p = read_table(spark, SF_SMOKE, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 10)
    ).select("p_partkey")
    li = (
        read_table(spark, SF_SMOKE, "lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", F.col("l_quantity").cast("bigint").alias("qty"))
    )
    stats = li.groupBy(F.col("p_partkey").alias("pk")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("qty").alias("s")
    )
    j = li.join(stats, F.col("p_partkey") == F.col("pk"))
    exact = j.filter(F.lit(5) * F.col("qty") * F.col("cnt") < F.col("s")).count()
    floaty = j.filter(
        F.col("qty").cast("double")
        < 0.2 * (F.col("s").cast("double") / F.col("cnt").cast("double"))
    ).count()
    assert exact == floaty
    n_small = QUERIES["tpch_q17"](spark, SF_SMOKE).collect()[0]["n_small_lines"]
    assert n_small == exact


def test_tpch_q19_disjunction_equals_union_of_branches(spark):
    """The single disjunctive plan must count exactly the lines the
    three branch queries count separately (branches are disjoint by
    brand, so the sum is exact)."""
    out = QUERIES["tpch_q19"](spark, SF_SMOKE).collect()[0]
    p = read_table(spark, SF_SMOKE, "part")
    li = read_table(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", F.col("l_quantity").cast("bigint").alias("qty")
    )
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    total = 0
    for brand, smax, qlo, qhi in (
        ("Brand#5", 5, 1, 11),
        ("Brand#15", 10, 10, 20),
        ("Brand#25", 15, 20, 30),
    ):
        total += j.filter(
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, smax)
            & F.col("qty").between(qlo, qhi)
        ).count()
    assert out["n_lines"] == total


def test_tpch_q21_flagged_orders_are_multi_supplier_sole_latest(spark):
    """Brute-force re-derivation at smoke scale: every counted wait
    must come from an order with ≥2 suppliers whose max shipdate is
    achieved by exactly one supplier."""
    li = read_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    rows = li.collect()
    from collections import defaultdict

    per = defaultdict(dict)
    for r in rows:
        k = (r["l_orderkey"], r["l_suppkey"])
        d = per[r["l_orderkey"]]
        d[r["l_suppkey"]] = max(d.get(r["l_suppkey"], r["l_shipdate"]), r["l_shipdate"])
    expected = defaultdict(int)
    for ok, supps in per.items():
        if len(supps) < 2:
            continue
        mx = max(supps.values())
        latest = [s for s, v in supps.items() if v == mx]
        if len(latest) == 1:
            expected[latest[0]] += 1
    got = {
        r["s_name"]: r["numwait"]
        for r in QUERIES["tpch_q21"](spark, SF_SMOKE).collect()
    }
    s_names = {
        r["s_suppkey"]: r["s_name"]
        for r in read_table(spark, SF_SMOKE, "supplier").collect()
    }
    exp_named = sorted(
        ((v, s_names[k]) for k, v in expected.items()), key=lambda t: (-t[0], t[1])
    )[:20]
    assert got == {n: v for v, n in exp_named}


def test_tpch_q22_kept_customers_are_dormant_and_wealthy(spark):
    """Every counted customer must beat the positive-balance average
    (strict) and have zero post-2000 orders."""
    out = QUERIES["tpch_q22"](spark, SF_SMOKE)
    codes = [1, 3, 5, 7, 9, 11, 13, 15, 17, 19, 21, 23]
    c = read_table(spark, SF_SMOKE, "customer").filter(
        F.col("c_nationkey").isin(*codes)
    ).select("c_custkey", F.col("c_acctbal").cast("decimal(12,2)").alias("bal"))
    pos = c.filter(F.col("bal") > 0).agg(
        F.sum("bal").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    recent = read_table(spark, SF_SMOKE, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    ).select("o_custkey")
    brute = (
        c.filter(F.col("bal") * pos["n"] > pos["s"])
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .count()
    )
    assert out.agg(F.sum("numcust")).collect()[0][0] == brute


def test_tpch_q11_threshold_boundary_is_exact(spark):
    """Kept parts all clear value·1000 > total strictly; the heaviest
    dropped part must NOT clear it — the boundary is integer-sharp."""
    out = QUERIES["tpch_q11"](spark, SF_SMOKE)
    kept = [r["value_cents"] for r in out.collect()]
    assert kept, "q11 empty at smoke scale"
    s = (
        read_table(spark, SF_SMOKE, "supplier")
        .join(
            read_table(spark, SF_SMOKE, "nation").filter(F.col("n_name") == "NATION_3"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        read_table(spark, SF_SMOKE, "lineitem")
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum((F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("bigint")).alias(
                "v"
            )
        )
    )
    total = per_part.agg(F.sum("v")).collect()[0][0]
    for v in kept:
        assert v * 1000 > total
    dropped_max = (
        per_part.filter(~(F.col("v") * 1000 > F.lit(total)))
        .agg(F.max("v"))
        .collect()[0][0]
    )
    if dropped_max is not None:
        assert dropped_max * 1000 <= total
