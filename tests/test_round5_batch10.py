"""Round-5 tenth batch: t-closeness (privacy triad completion) and the
four-fifths-rule gate fairness audit.

Oracle parity runs in test_oracle_parity; these pin the t-closeness
bound and brute distribution check, and the fairness flag's exact
cross-multiplication semantics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.queries import QUERIES
from manipula_o_de_dataframes_spark.sources.io import read_table

from .conftest import SF_SMOKE


def test_t_closeness_bounds_and_brute(spark):
    """0 ≤ t_ppm ≤ 10⁶ (variational distance is a probability
    distance), and every nation's value matches a driver-side
    computation from the raw censuses."""
    rows = QUERIES["t_closeness_audit"](spark, SF_SMOKE).collect()
    assert rows
    base = (
        read_table(spark, SF_SMOKE, "customer")
        .join(
            F.broadcast(read_table(spark, SF_SMOKE, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("n_name").alias("nation"), "c_mktsegment")
        .collect()
    )
    from collections import Counter

    total = Counter(r["c_mktsegment"] for r in base)
    tt = len(base)
    groups: dict[str, Counter] = {}
    for r in base:
        groups.setdefault(r["nation"], Counter())[r["c_mktsegment"]] += 1
    for r in rows:
        assert 0 <= r["t_ppm"] <= 1_000_000, r
        g = groups[r["nation"]]
        n = sum(g.values())
        assert n == r["n_rows"]
        dist = sum(
            abs(g.get(seg, 0) * tt - total[seg] * n) for seg in total
        )
        assert r["t_ppm"] == dist * 1_000_000 // (2 * n * tt), r["nation"]


def test_gate_fairness_exact_flag(spark):
    """The four-fifths flag must equal the exact cross-multiplied
    comparison recomputed driver-side, and the best language flags
    itself OK."""
    rows = QUERIES["gate_fairness_audit"](spark, SF_SMOKE).collect()
    assert rows
    best_lang = rows[0]["best_lang"]
    by_lang = {r["lang"]: r for r in rows}
    b = by_lang[best_lang]
    assert b["four_fifths_ok"] == 1
    for r in rows:
        expect = int(
            r["n_pass"] * b["n_docs"] * 5 >= b["n_pass"] * r["n_docs"] * 4
        )
        assert r["four_fifths_ok"] == expect, r["lang"]
        assert r["pass_ppm"] == r["n_pass"] * 1_000_000 // r["n_docs"]


def test_csv_quarantine_routing(spark, tmp_path):
    """PERMISSIVE + corrupt-record routing: bad lines land in the
    quarantine frame with their raw text, good rows parse typed, and
    good+quarantine partitions the file exactly."""
    from manipula_o_de_dataframes_spark.sources.io import read_csv_quarantine

    p = tmp_path / "in.csv"
    p.write_text(
        "id,amount,label\n"
        "1,10.50,ok\n"
        "2,notanumber,bad_type\n"
        "3,30.25,ok\n"
        "4,40.00\n"  # arity violation: missing column
        "5,50.75,ok\n"
    )
    good, quar = read_csv_quarantine(
        spark, str(p), "id int, amount double, label string"
    )
    g = sorted(r["id"] for r in good.collect())
    q = sorted(r["raw_line"] for r in quar.collect())
    assert g == [1, 3, 5]
    assert q == ["2,notanumber,bad_type", "4,40.00"]
    assert dict(good.dtypes)["amount"] == "double"


def test_srm_integer_verdict(spark):
    """srm_flag equals the exact integer comparison recomputed
    driver-side — (a−b)²·1000 > 3841·(a+b) — for every week; with a
    healthy md5 split the fixture should not flag."""
    rows = QUERIES["srm_check"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        d = r["users_a"] - r["users_b"]
        assert r["srm_flag"] == int(
            d * d * 1000 > 3841 * (r["users_a"] + r["users_b"])
        )


def test_cuped_adjustment_identities(spark):
    """Both arms share one theta (pooled), arm user counts partition
    the buyer population, and the adjusted means move raw means
    TOWARD each other or keep their order stable under a pre-period
    imbalance correction (sanity: adjustment is finite and applied
    per the stated formula)."""
    rows = {r["arm"]: r for r in QUERIES["cuped_adjustment"](spark, SF_SMOKE).collect()}
    assert set(rows) == {0, 1}
    assert rows[0]["theta_ppm"] == rows[1]["theta_ppm"]
    from pyspark.sql import functions as F2

    buyers = (
        read_table(spark, SF_SMOKE, "events")
        .filter(F2.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[0]["n_users"] + rows[1]["n_users"] == buyers


def test_qte_deciles_monotone_and_brute_median(spark):
    """Deciles are non-decreasing in pct per arm; qte = treat −
    control; the p50 values match a driver-side rank selection."""
    rows = sorted(
        QUERIES["quantile_treatment_effects"](spark, SF_SMOKE).collect(),
        key=lambda r: r["pct"],
    )
    assert [r["pct"] for r in rows] == list(range(10, 100, 10))
    for a, b in zip(rows, rows[1:]):
        assert a["control_cents"] <= b["control_cents"]
        assert a["treat_cents"] <= b["treat_cents"]
    for r in rows:
        assert r["qte_cents"] == r["treat_cents"] - r["control_cents"]
    import hashlib

    from pyspark.sql import functions as F3

    per_user = (
        read_table(spark, SF_SMOKE, "events")
        .filter(F3.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            (F3.sum(F3.col("value").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .collect()
    )
    arms: dict[int, list] = {0: [], 1: []}
    for r in per_user:
        arm = int(hashlib.md5(str(r["user_id"]).encode()).hexdigest()[0], 16) % 2
        arms[arm].append((r["cents"], r["user_id"]))
    p50 = {}
    for arm, vals in arms.items():
        vals.sort()
        p50[arm] = vals[(50 * len(vals) + 99) // 100 - 1][0]
    mid = [r for r in rows if r["pct"] == 50][0]
    assert mid["control_cents"] == p50[0]
    assert mid["treat_cents"] == p50[1]


def test_experiment_report_gating_semantics(spark):
    """verdict_valid = effect_crossed AND srm clean, row-by-row, and
    the report's member columns agree with the member queries."""
    report = {r["wk"]: r for r in QUERIES["experiment_report"](spark, SF_SMOKE).collect()}
    srm = {r["wk"]: r for r in QUERIES["srm_check"](spark, SF_SMOKE).collect()}
    poc = {r["wk"]: r for r in QUERIES["pocock_monitor"](spark, SF_SMOKE).collect()}
    assert set(report) == set(srm) & set(poc)
    for wk, r in report.items():
        assert r["srm_flag"] == srm[wk]["srm_flag"]
        assert r["effect_crossed"] == poc[wk]["crossed"]
        assert r["verdict_valid"] == int(
            r["effect_crossed"] == 1 and r["srm_flag"] == 0
        )
