"""Replicates the driver's correctness gate locally at sf0.001.

Every queries() entry must match its oracle_sql() on row count, column
set, and exact (bit-level for floats) order-insensitive values — the
same bar as CORRECTNESS_r{N}.json, caught before the driver runs.
"""

from __future__ import annotations

import pytest

from manipula_o_de_dataframes_spark.oracles import ORACLES
from manipula_o_de_dataframes_spark.parity import compare, run_oracle
from manipula_o_de_dataframes_spark.queries import NO_ORACLE, QUERIES

from .conftest import SF_SMOKE


def test_every_query_has_an_oracle():
    assert set(ORACLES) == set(QUERIES) - NO_ORACLE


@pytest.mark.parametrize("name", sorted(set(QUERIES) - NO_ORACLE))
def test_parity(spark, name):
    result = QUERIES[name](spark, SF_SMOKE)
    oracle = run_oracle(ORACLES[name], SF_SMOKE)
    issues = compare(result, oracle)
    assert not issues, f"{name}: " + " | ".join(issues)


@pytest.mark.parametrize("name", sorted(NO_ORACLE))
def test_no_oracle_rows_only(spark, name):
    """Sketch queries: the driver's weaker check — runs, stable schema, >0 rows."""
    result = QUERIES[name](spark, SF_SMOKE)
    assert len(result.columns) > 0
    assert result.count() > 0


TZ_SENSITIVE = [
    # timestamp-rendering / date-cursor / week-bucketing queries — the
    # surface where a session-tz literal or cast silently shifts rows
    "keyset_page", "date_slice_metrics", "weekly_snapshots",
    "retention_cohorts", "drift_weekly_kl", "event_attribution",
    "growth_accounting", "sessionize_events", "ewma_weekly",
    "hazard_weekly", "weekday_seasonality", "revenue_recognition",
    "open_order_concurrency", "mv_refresh", "state_snapshot_diff",
    "tpch_q3", "tpch_q5", "capped_balance", "ltv_cohorts",
    "tpch_q1", "tpch_q4", "tpch_q18", "zonemap_prune_audit",
    "interpolate_weeks", "mv_join_delta", "theilsen_trend", "event_paths",
    "conversion_latency", "backlog_aging", "stream_late_drop",
    "twab_balance", "scd2_pit_join", "rfm_migration",
    "seasonal_band_breaches", "session_depth_profile", "decayed_item_rank",
    "tpch_q10", "tpch_q14", "naive_forecast_mape", "abc_xyz_matrix",
    "same_customer_growth", "attribution_stream_wm",
    # TPC-H completion batch — every member filters or derives from
    # order/ship timestamps (q7/q9 extract year; q12 datediffs the
    # two; q13/q16 are date-free but ride along for the join shapes)
    "tpch_q2", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q11", "tpch_q12",
    "tpch_q13", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q19",
    "tpch_q20", "tpch_q21", "tpch_q22",
    # round-5 close-out batch members that derive from event timestamps
    "behavioral_cohort", "leakage_safe_features", "markov_attribution",
    "activity_bitmaps", "mix_rate_bridge", "mrr_waterfall", "littles_law_audit",
    "conformal_coverage",
    # batch-4..7: week/day-bucketed and epoch-second-derived members
    "kendall_tau", "spearman_corr", "forecast_tournament", "runs_test",
    "diff_in_diff", "sequence_mining", "bandit_replay", "pocock_monitor",
    "burn_rate_alerts", "incident_metrics", "restatement_audit",
    "cep_pattern_match", "srm_check", "cuped_adjustment",
    "quantile_treatment_effects", "experiment_report",
    # batch-12..16: week/day-bucketed and epoch-second-derived members
    "weekly_ohlc", "acf_weekly", "ccf_weekly", "sla_compliance",
    "duplicate_payments", "burst_detection", "km_survival",
    # r6 global_rank_scaled rewrites that rank on epoch-derived longs
    # or render timestamps
    "rfm_segments", "balanced_shards", "key_gap_islands",
    "seasonal_decompose", "forecast_pinball", "holt_winters",
    # r7 causal family — exposure/outcome windows are o_orderdate bounds
    "ipw_ate", "mantel_haenszel", "cmh_test",
]


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_parity_under_non_utc_session(spark, name):
    """The driver's session timezone is unknown; every timestamp edge
    must hold under a non-UTC session. This caught a real bug in r5:
    F.lit(<collected datetime>) infers session-tz TimestampType, and
    comparing it against a TIMESTAMP_NTZ column shifts by the session
    offset — keyset_page silently re-included its cursor row under
    America/Sao_Paulo while staying green under the suite's UTC."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Sao_Paulo")
    try:
        result = QUERIES[name](spark, SF_SMOKE)
        oracle = run_oracle(ORACLES[name], SF_SMOKE)
        issues = compare(result, oracle)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert not issues, f"{name} under SP tz: " + " | ".join(issues)


def test_compare_flags_int_vs_float_dtype_skew(spark):
    """The r5 km_survival red class: identical VALUES, bigint on the
    Spark side vs float64 on the oracle side (DuckDB HUGEINT via
    pandas). The driver's value hash is dtype-sensitive, so the local
    gate must flag this even though every value compares equal —
    pre-r6 it silently widened both sides to float64 and blessed a
    guaranteed driver red."""
    import pandas as pd

    sdf = spark.createDataFrame([(1, 46666), (2, 0)], "k int, hazard_ppm bigint")
    oracle = pd.DataFrame({"k": [1, 2], "hazard_ppm": [46666.0, 0.0]})
    issues = compare(sdf, oracle)
    assert issues and "DTYPE-SKEW" in issues[0], issues
    # and the clean case still passes
    ok = pd.DataFrame({"k": pd.array([1, 2], dtype="int32"),
                       "hazard_ppm": pd.array([46666, 0], dtype="int64")})
    assert compare(sdf, ok) == []
