"""Edge-adapter wrappers (S4/S5/S9, O5) — trivial by design, but each
one is reference surface (SURVEY §2.1/§2.7), so pin the contract."""

from __future__ import annotations

from manipula_o_de_dataframes_spark.operators.sorting import head
from manipula_o_de_dataframes_spark.sources.io import (
    from_records,
    header_probe,
    preview,
    read_table,
)

from .conftest import SF_SMOKE


def test_header_probe_names_without_scan(spark):
    df = read_table(spark, SF_SMOKE, "region")
    assert header_probe(df) == ["r_regionkey", "r_name"]


def test_preview_first_n(spark):
    df = read_table(spark, SF_SMOKE, "nation")
    assert preview(df, 3).count() == 3
    assert preview(df).count() == 5  # default n


def test_from_records_roundtrip(spark):
    recs = [{"cliente": "A", "valor": 1.5}, {"cliente": "B", "valor": None}]
    df = from_records(spark, recs, schema="cliente string, valor double")
    got = {r["cliente"]: r["valor"] for r in df.collect()}
    assert got == {"A": 1.5, "B": None}


def test_head_limit(spark):
    df = read_table(spark, SF_SMOKE, "customer")
    assert head(df, 7).count() == 7
    # limit past the table size returns everything, not an error
    assert head(df.limit(3), 10).count() == 3


def test_partitioned_write_prunes(spark, tmp_path):
    from manipula_o_de_dataframes_spark.sources.io import write_partitioned

    e = read_table(spark, SF_SMOKE, "events")
    out = str(tmp_path / "events_by_type")
    write_partitioned(e, out, ("event_type",))

    back = spark.read.parquet(out)
    clicks = back.filter(back["event_type"] == "click")
    plan = clicks._jdf.queryExecution().executedPlan().toString()
    # the filter must become directory pruning, not a row-level filter
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:120]
    assert clicks.count() == e.filter(e["event_type"] == "click").count()
    # non-partition columns round-trip intact
    assert back.count() == e.count()


def test_xlsx_sheet_name_with_quotes_roundtrips(tmp_path):
    # regression: escape() leaves '"' alone — attribute context needs
    # quoteattr, else the workbook XML is corrupt
    from manipula_o_de_dataframes_spark.sources import xlsx_lite

    path = str(tmp_path / "q.xlsx")
    rows = [["col"], ["v1"]]
    xlsx_lite.write_sheets(path, {'Report "Q1" & more': rows})
    assert xlsx_lite.sheet_names(path) == ['Report "Q1" & more']
    assert xlsx_lite.read_rows(path, 'Report "Q1" & more') == rows
