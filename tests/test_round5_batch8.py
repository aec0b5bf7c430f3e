"""Round-5 eighth batch: streaming MERGE sink, join-order audit,
bitemporal restatement audit.

Oracle parity runs in test_oracle_parity (stream_upsert shares the
BATCH upsert oracle — kappa parity for MERGE); these pin the sink's
idempotence under re-delivery, the audit's plan-invariance identity,
and the restatement monotonicity.
"""

from __future__ import annotations

import tempfile

from manipula_o_de_dataframes_spark.queries import QUERIES

from .conftest import SF_SMOKE


def test_stream_upsert_idempotent_redelivery(spark):
    """Draining the same staged feed TWICE into the same state dir
    must leave the state unchanged — last-writer-wins by key is what
    makes a foreachBatch MERGE sink safe under Spark's at-least-once
    re-delivery."""
    from manipula_o_de_dataframes_spark.streaming.upsert_sink import (
        upsert_drained,
    )

    with tempfile.TemporaryDirectory() as d:
        state = d + "/state"
        once = sorted(map(tuple, upsert_drained(spark, SF_SMOKE, state).collect()))
        twice = sorted(map(tuple, upsert_drained(spark, SF_SMOKE, state).collect()))
    assert once == twice
    assert once, "merged state should be non-empty"


def test_stream_upsert_provenance_counts(spark):
    """Every 7th order is 'atualizado', the rest 'original' — the
    update batch's coverage is exact."""
    rows = QUERIES["stream_upsert"](spark, SF_SMOKE).collect()
    upd = [r for r in rows if r["origem"] == "atualizado"]
    assert len(upd) == sum(1 for r in rows if r["pedido"] % 7 == 0)
    assert all(r["situacao"] == "F" for r in upd)


def test_join_order_plan_invariance(spark):
    """All four plans produce the same final count (join order and
    filter placement change the WORK, never the ANSWER), and pushed
    intermediates are never larger than late-filter ones within the
    same order."""
    rows = {r["plan"]: r for r in QUERIES["join_order_audit"](spark, SF_SMOKE).collect()}
    assert len(rows) == 4
    finals = {r["final_rows"] for r in rows.values()}
    assert len(finals) == 1
    assert (
        rows["fact_first_pushed"]["intermediate_rows"]
        <= rows["fact_first_late_filter"]["intermediate_rows"]
    )
    # the dim-first intermediate is the customer⋈nation size in both
    # variants (the filter lives on the fact side)
    assert (
        rows["dim_first_pushed"]["intermediate_rows"]
        == rows["dim_first_late_filter"]["intermediate_rows"]
    )


def test_restatement_monotone_knowledge(spark):
    """Knowledge can only grow: known_1996 ≤ known_1997 ≤ final per
    week, and the restatement column is exactly final − known_1996."""
    rows = QUERIES["restatement_audit"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert (
            0
            <= r["known_1996_cents"]
            <= r["known_1997_cents"]
            <= r["final_cents"]
        ), r
        assert (
            r["restated_since_1996_cents"]
            == r["final_cents"] - r["known_1996_cents"]
        )
