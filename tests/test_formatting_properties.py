"""Property tests: rendering expressions vs the reference's Python
formatting (X2/X3, APC:122/126-127), over generated inputs.

Values are quantized to cents (the reference formats money that went
through DECIMAL(18,2) sums), which is exactly the domain brl()/pct()
promise to render identically to "{:,.2f}".format(x).
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.functions.formatting import brl, pct

cents = st.integers(min_value=-10**15, max_value=10**15)


@given(st.lists(cents, min_size=1, max_size=20))
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_brl_matches_python_format(spark, cents_list):
    rows = [(i, Decimal(c) / 100) for i, c in enumerate(cents_list)]
    df = spark.createDataFrame(rows, "i int, v decimal(18,2)")
    got = {r["i"]: r["s"] for r in df.select("i", brl("v").alias("s")).collect()}
    for i, c in enumerate(cents_list):
        expected = "R$ {:,.2f}".format(c / 100 if abs(c) < 2**52 else Decimal(c) / 100)
        assert got[i] == expected, f"{c}: {got[i]!r} != {expected!r}"


@given(st.lists(cents, min_size=1, max_size=20))
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_pct_matches_python_format(spark, cents_list):
    rows = [(i, Decimal(c) / 100) for i, c in enumerate(cents_list)]
    df = spark.createDataFrame(rows, "i int, v decimal(18,2)")
    got = {r["i"]: r["s"] for r in df.select("i", pct("v").alias("s")).collect()}
    for i, c in enumerate(cents_list):
        expected = "{:,.2f}%".format(c / 100 if abs(c) < 2**52 else Decimal(c) / 100)
        assert got[i] == expected, f"{c}: {got[i]!r} != {expected!r}"


def test_null_renders_empty(spark):
    df = spark.createDataFrame([(1, None)], "i int, v decimal(18,2)")
    row = df.select(brl("v").alias("b"), pct("v").alias("p")).collect()[0]
    assert row["b"] == "" and row["p"] == ""


# XML-hostile strings: markup chars, quotes, unicode, whitespace runs.
# (Control chars < 0x20 are excluded — raw XML cannot carry them and
# the codec targets tabular exports, not binary payloads.)
_cell_text = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), min_codepoint=0x20
    ),
    max_size=40,
)
_num = st.floats(allow_nan=False, allow_infinity=False, width=64)


@given(
    st.lists(
        st.tuples(_cell_text, _num, st.booleans()), min_size=1, max_size=8
    )
)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_xlsx_lite_roundtrip_property(tmp_path_factory, rows):
    """write_sheets → read_rows is identity for strings (incl. XML
    markup and unicode), finite floats, and booleans."""
    from manipula_o_de_dataframes_spark.sources import xlsx_lite

    path = str(tmp_path_factory.mktemp("xlsx") / "prop.xlsx")
    data = [["s", "x", "b"]] + [list(r) for r in rows]
    xlsx_lite.write_sheets(path, {"T": data})
    back = xlsx_lite.read_rows(path, "T")
    assert back[0] == ["s", "x", "b"]
    for want, got in zip(rows, back[1:]):
        s, x, b = want
        # empty-string cells round-trip as missing (None) — same as Excel
        assert (got[0] or "") == s
        assert got[1] == x and got[2] is b
