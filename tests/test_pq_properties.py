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
