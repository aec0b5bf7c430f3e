"""Round-5 seventh batch: SRE burn-rate alerting and incident
MTTR/MTBF accounting.

Oracle parity runs in test_oracle_parity (including the São Paulo
fence); these pin the multi-window alert semantics (page ⊆ ticket,
window-sum consistency) and the incident partition identities.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.queries import QUERIES
from manipula_o_de_dataframes_spark.sources.io import read_table

from .conftest import SF_SMOKE


def test_burn_rate_window_consistency(spark):
    """err_7d/tot_7d must equal the sum of the trailing ≤7 daily
    cells (replayed driver-side), and page_alert ⇒ ticket_alert
    (the two-tier policy is nested by construction)."""
    rows = sorted(
        QUERIES["burn_rate_alerts"](spark, SF_SMOKE).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    daily = {r["day"]: (r["err_1d"], r["tot_1d"]) for r in rows}
    for r in rows:
        window = [
            daily[d] for d in range(r["day"] - 6, r["day"] + 1) if d in daily
        ]
        assert r["err_7d"] == sum(e for e, _ in window), r["day"]
        assert r["tot_7d"] == sum(t for _, t in window), r["day"]
        if r["page_alert"]:
            assert r["ticket_alert"], r["day"]
        assert r["burn_1d_milli"] == r["err_1d"] * 1_000_000_000 // (
            r["tot_1d"] * 200000
        )


def test_incident_partition_identities(spark):
    """Error events partition exactly into incidents
    (Σ n_error_events = error count); downtime ≥ 0; MTTR·incidents ≤
    downtime < (MTTR+1)·incidents (the truncating-division bracket)."""
    rows = QUERIES["incident_metrics"](spark, SF_SMOKE).collect()
    assert rows
    n_err = (
        read_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "error")
        .count()
    )
    assert sum(r["n_error_events"] for r in rows) == n_err
    for r in rows:
        assert r["n_incidents"] >= 1
        assert r["downtime_s"] >= 0
        assert (
            r["mttr_s"] * r["n_incidents"]
            <= r["downtime_s"]
            < (r["mttr_s"] + 1) * r["n_incidents"]
        )
        assert r["mtbf_s"] == 604800 // r["n_incidents"]


def test_incident_gap_semantics(spark):
    """A driver-side replay of the per-day 600 s gap rule reproduces
    the weekly incident counts exactly."""
    from manipula_o_de_dataframes_spark.operators import temporal as tmp

    ev = (
        read_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "error")
        .select(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01")).alias(
                "day"
            ),
            tmp.seconds_since_origin("ts").alias("s"),
            "event_id",
        )
        .collect()
    )
    by_day: dict[int, list] = {}
    for r in ev:
        by_day.setdefault(r["day"], []).append((r["s"], r["event_id"]))
    weekly: dict[int, int] = {}
    for day, evs in by_day.items():
        evs.sort()
        incidents = 1 + sum(
            1 for (a, _), (b, _) in zip(evs, evs[1:]) if b - a > 600
        )
        weekly[day // 7] = weekly.get(day // 7, 0) + incidents
    got = {
        r["wk"]: r["n_incidents"]
        for r in QUERIES["incident_metrics"](spark, SF_SMOKE).collect()
    }
    assert got == weekly
