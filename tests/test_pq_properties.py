"""Property tests for the PQ primitives — pure Python (no Spark
session), so hypothesis can run hundreds of examples cheaply."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from manipula_o_de_dataframes_spark.operators.similarity import (
    pq_codebook,
    pq_distance_table,
)

CB = pq_codebook()


def test_codebook_shape_and_distinctness():
    assert len(CB) == 8 * 16
    for m in range(8):
        vs = [tuple(cv) for mm, c, cv in CB if mm == m]
        assert len(vs) == 16 and len(set(vs)) == 16
        assert all(len(v) == 8 for v in vs)
        assert all(-1.0 <= x <= 1.0 for v in vs for x in v)


@given(st.lists(st.floats(-2.0, 2.0, allow_nan=False, width=32),
                min_size=64, max_size=64))
@settings(max_examples=200, deadline=None)
def test_distance_table_entries_are_nonneg_and_exact_on_centroids(vec):
    table = pq_distance_table(vec, CB)
    assert set(table) == set(range(8))
    for m, dists in table.items():
        assert len(dists) == 16
        assert all(d >= 0.0 for d in dists)


@given(st.integers(0, 15), st.integers(0, 7))
@settings(max_examples=64, deadline=None)
def test_distance_table_zero_iff_query_slice_is_the_centroid(code, m):
    cv = next(v for mm, c, v in CB if mm == m and c == code)
    query = [0.123] * 64
    query[m * 8:(m + 1) * 8] = cv
    table = pq_distance_table(query, CB)
    assert table[m][code] == 0.0
    # every OTHER centroid in this subspace is strictly farther
    assert all(table[m][c] > 0.0 for c in range(16) if c != code)


@given(st.lists(st.floats(-2.0, 2.0, allow_nan=False, width=32),
                min_size=64, max_size=64))
@settings(max_examples=100, deadline=None)
def test_distance_table_matches_naive_reference(vec):
    table = pq_distance_table(vec, CB)
    for m, code, cv in CB:
        ref = 0.0
        for i, c in enumerate(cv):
            d = float(vec[m * 8 + i]) - c
            ref = ref + d * d
        assert table[m][code] == ref  # bit-identical, not approx


def test_sql_rendered_pq_matches_column_built_spec(spark):
    """pq_code/pq_adc render the argmin as SQL text (one F.expr parse —
    r5, after profiling showed the ~7 s 'compile constant' was really
    ~4k py4j round-trips of Column building on the DRIVER). _sub_score
    stays as the executable Column-API spec; this test pins the two
    forms bit-identical on real vectors, so the fast path can never
    drift from the spec."""
    from pyspark.sql import functions as F

    from manipula_o_de_dataframes_spark.operators import similarity as sim

    e = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")

    def spec_code(vec, m):
        rows = [(c, cv) for (mm_, c, cv) in sim.pq_codebook() if mm_ == m]
        best = F.least(
            *[
                F.struct(
                    sim._sub_score(vec, m * 8, cv).alias("d"),
                    F.lit(c).alias("c"),
                )
                for c, cv in rows
            ]
        )
        return best["c"].cast("int")

    cb = sim.pq_codebook()
    fast = e.select(
        "vec_id",
        *[sim.pq_code("embedding", m, cb).alias(f"code_{m}") for m in range(8)],
    )
    spec = e.select(
        "vec_id",
        *[spec_code(F.col("embedding"), m).alias(f"code_{m}") for m in range(8)],
    )
    assert fast.exceptAll(spec).count() == 0
    assert spec.exceptAll(fast).count() == 0

    qvec = [((i * 7) % 13 - 6) / 6.0 for i in range(64)]
    spec_exact = None
    for i, qv in enumerate(qvec):
        d = F.element_at(F.col("embedding"), i + 1).cast("double") - F.lit(qv)
        spec_exact = d * d if spec_exact is None else spec_exact + d * d
    both = e.select(
        F.round(sim.exact_sqdist("embedding", qvec), 9).alias("fast"),
        F.round(spec_exact, 9).alias("spec"),
    )
    assert both.filter(F.col("fast") != F.col("spec")).count() == 0


def test_sql_rendered_ivf_cell_matches_column_built_spec(spark):
    """ivf_cell renders its argmax-cosine as SQL text (same py4j
    rationale as pq_code); ivf_cell_spec is the Column-API spec. The
    two must assign bit-identical cells on real vectors."""
    from pyspark.sql import functions as F

    from manipula_o_de_dataframes_spark.operators import similarity as sim

    e = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    cents = sim.fixed_centroids()
    both = e.select(
        sim.ivf_cell("embedding", cents).alias("fast"),
        sim.ivf_cell_spec(F.col("embedding"), cents).alias("spec"),
    )
    assert both.filter(F.col("fast") != F.col("spec")).count() == 0


def test_dlit_renders_bit_exact_doubles(spark):
    """_dlit is the load-bearing brick of every SQL-rendered model
    expression: the parsed double must be BIT-identical to F.lit for
    adversarial floats — subnormals, extremes, exponent forms,
    negative zero (hypothesis over the interesting strata plus the
    canonical nasties)."""
    import math
    import struct

    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from manipula_o_de_dataframes_spark.operators.similarity import _dlit

    nasties = [
        0.0, -0.0, 1.0, -1.0, 0.1, -0.36363636363636365, 1e-300, 1e300,
        5e-324, -5e-324, 2.2250738585072014e-308, 1.7976931348623157e308,
        1e20, 3.3966942148760331, 123456789.123456789,
    ]
    exprs = [F.expr(_dlit(v)).alias(f"c{i}") for i, v in enumerate(nasties)]
    row = spark.range(1).select(*exprs).collect()[0]
    for i, v in enumerate(nasties):
        got = row[f"c{i}"]
        assert struct.pack("<d", got) == struct.pack("<d", v), (v, got)

    @given(st.floats(allow_nan=False, allow_infinity=False))
    @settings(max_examples=300, deadline=None)
    def rendered_roundtrips(v):
        # driver-side round trip: repr -> float is already exact by
        # Python contract; the JVM-parse leg is pinned by the batch
        # above, so here assert the renderer never mangles the text
        assert float(_dlit(v)[:-1]) == v or (v == 0.0)

    rendered_roundtrips()

    import pytest as _pytest

    for bad in (float("nan"), float("inf"), float("-inf")):
        with _pytest.raises(ValueError, match="non-finite"):
            _dlit(bad)


def test_vec_sql_backquotes_and_rejects_nonsimple(spark):
    """The SQL renderers must keep working when the vector column is a
    reserved word (backquoted) and fail LOUDLY for derived Columns —
    an unquoted 'order' would misparse, a toString'd expression would
    inject garbage SQL."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from manipula_o_de_dataframes_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(1, [float(i) for i in range(64)])], "vec_id long, order array<float>"
    )
    cb = sim.pq_codebook()
    row = df.select(sim.pq_code("order", 0, cb).alias("c")).collect()[0]
    assert 0 <= row["c"] < 16

    assert sim._vec_sql(F.col("embedding")) == "`embedding`"
    with _pytest.raises(ValueError, match="simple column name"):
        sim._vec_sql("a b")
    with _pytest.raises(ValueError, match="simple column name"):
        sim._vec_sql(F.col("e")["v"])
