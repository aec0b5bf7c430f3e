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
