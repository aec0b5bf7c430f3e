"""Round-5 ninth batch: CEP pattern matching (sequence + time window
+ negation).

Oracle parity (incl. the São Paulo fence) runs in test_oracle_parity;
these pin the match semantics against a brute per-user replay and the
census accounting.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.operators import temporal as tmp
from manipula_o_de_dataframes_spark.queries import QUERIES
from manipula_o_de_dataframes_spark.sources.io import read_table

from .conftest import SF_SMOKE


def test_cep_census_accounting(spark):
    """matched + vetoed ≤ signups per week (signups with no
    qualifying purchase are neither), and Σ signups equals the raw
    signup count."""
    rows = QUERIES["cep_pattern_match"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_matched"] + r["n_vetoed"] <= r["n_signups"], r
        assert r["match_ppm"] == r["n_matched"] * 1_000_000 // r["n_signups"]
    total = sum(r["n_signups"] for r in rows)
    raw = (
        read_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "signup")
        .count()
    )
    assert total == raw


def test_cep_brute_replay(spark):
    """Weekly matched/vetoed counts equal a driver-side replay of the
    rule: first purchase in (s, s+600], no error strictly between."""
    ev = (
        read_table(spark, SF_SMOKE, "events")
        .select(
            "user_id",
            "event_type",
            tmp.seconds_since_origin("ts").alias("s"),
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")) / 7
            ).cast("long").alias("wk"),
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    matched: dict[int, int] = {}
    vetoed: dict[int, int] = {}
    for user, evs in by_user.items():
        purchases = sorted(e["s"] for e in evs if e["event_type"] == "purchase")
        errors = [e["s"] for e in evs if e["event_type"] == "error"]
        for e in evs:
            if e["event_type"] != "signup":
                continue
            cand = [p for p in purchases if e["s"] < p <= e["s"] + 600]
            if not cand:
                continue
            fp = min(cand)
            if any(e["s"] < x < fp for x in errors):
                vetoed[e["wk"]] = vetoed.get(e["wk"], 0) + 1
            else:
                matched[e["wk"]] = matched.get(e["wk"], 0) + 1
    got = {r["wk"]: r for r in QUERIES["cep_pattern_match"](spark, SF_SMOKE).collect()}
    for wk, r in got.items():
        assert r["n_matched"] == matched.get(wk, 0), wk
        assert r["n_vetoed"] == vetoed.get(wk, 0), wk


def test_cep_plan_no_python_no_cartesian(spark):
    p = (
        QUERIES["cep_pattern_match"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p
