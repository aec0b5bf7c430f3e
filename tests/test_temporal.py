"""Temporal operators: as-of join and bounded interval join.

The oracle queries already hash-check both against DuckDB at sf0.01;
these tests pin the semantic edges (ties, empty matches, bucket
boundaries) on hand-built frames where every expected row is knowable
by eye.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.operators.temporal import (
    asof_join,
    asof_join_directed,
    interval_neighbors,
)

from .conftest import SF_SMOKE


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "a"),
         (1, _ts("2024-01-01T12:00:00"), "b"),
         (2, _ts("2024-01-01T09:00:00"), "c")],
        "k long, ts timestamp_ntz, payload string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:30:00"), 100),
         (1, _ts("2024-01-01T11:00:00"), 101),
         (2, _ts("2024-01-01T09:30:00"), 102)],  # after the only left row
        "k long, ts timestamp_ntz, rid long",
    )
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        attrs={"rid_asof": "rid"}, right_order="rid",
    )
    got = {r["payload"]: r["rid_asof"] for r in out.collect()}
    assert got == {"a": 100, "b": 101, "c": None}


def test_asof_join_equal_ts_and_tie_semantics(spark):
    t = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame([(1, t, "x")], "k long, ts timestamp_ntz, payload string")
    right = spark.createDataFrame(
        [(1, t, 7), (1, t, 9), (1, _ts("2024-01-01T09:00:00"), 5)],
        "k long, ts timestamp_ntz, rid long",
    )
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        attrs={"rid_asof": "rid"}, right_order="rid",
    )
    # at-or-before includes equal ts; ties at equal ts break to max rid
    assert out.collect()[0]["rid_asof"] == 9


def test_interval_neighbors_matches_naive_join(spark):
    from manipula_o_de_dataframes_spark.sources.io import read_table

    e = read_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "ts")
    fast = interval_neighbors(e, key="user_id", ts="ts", lookback_secs=3600)

    a, b = e.alias("a"), e.alias("b")
    naive = (
        a.join(
            b,
            on=[
                F.col("a.user_id") == F.col("b.user_id"),
                F.col("b.ts") < F.col("a.ts"),
                F.col("b.ts") >= F.col("a.ts") - F.expr("INTERVAL 1 HOUR"),
            ],
            how="left",
        )
        .groupBy(F.col("a.event_id").alias("event_id"))
        .agg(F.count(F.col("b.ts")).alias("n_naive"))
    )
    diff = (
        fast.select("event_id", "n_vizinhos")
        .join(naive, "event_id")
        .filter(F.col("n_vizinhos") != F.col("n_naive"))
    )
    assert diff.count() == 0
    # the events table genuinely exercises the operator
    assert fast.filter(F.col("n_vizinhos") > 0).count() > 0


def test_interval_neighbors_bucket_boundary(spark):
    # neighbor exactly lookback seconds earlier is INCLUDED (>=); one
    # second past it is not; same-instant rows are not (strict <).
    base = _ts("2024-01-01T12:00:00")
    rows = [
        (1, 10, base - dt.timedelta(seconds=3601)),  # too old
        (2, 10, base - dt.timedelta(seconds=3600)),  # boundary: counts
        (3, 10, base - dt.timedelta(seconds=1)),     # counts
        (4, 10, base),                               # probe
        (5, 10, base),                               # same instant: no
        (6, 11, base - dt.timedelta(seconds=5)),     # other key
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz")
    out = {r["event_id"]: r["n_vizinhos"] for r in
           interval_neighbors(df, "user_id", "ts", 3600).collect()}
    assert out[4] == 2 and out[5] == 2
    assert out[6] == 0


def test_salted_join_spreads_keys_and_matches_plain(spark):
    from manipula_o_de_dataframes_spark.operators.joins import salted_join
    from manipula_o_de_dataframes_spark.sources.io import read_table

    li = read_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_orderkey").alias("chave"), "l_extendedprice"
    )
    o = read_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("chave"), "o_orderpriority"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = salted_join(li, o, "chave", salt=4)
        plan = salted._jdf.queryExecution().executedPlan().toString()
        # with broadcast off, the join must shuffle on (key, salt)
        assert "BroadcastHashJoin" not in plan
        assert "__salt" in plan
        plain = li.join(o, "chave")
        assert salted.count() == plain.count()
        a = salted.groupBy("o_orderpriority").count().collect()
        b = plain.groupBy("o_orderpriority").count().collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# small key/time domains force collisions: equal timestamps across and
# within sides, multiple rights per left, empty sides
_row = st.tuples(
    st.integers(min_value=0, max_value=2),    # key
    st.integers(min_value=0, max_value=20),   # seconds offset
)


@given(st.lists(_row, max_size=12), st.lists(_row, max_size=12))
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_join_matches_python_model(spark, lefts, rights):
    base = _ts("2024-01-01T00:00:00")
    lrows = [(k, base + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(lefts)]
    rrows = [(k, base + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(rights)]
    left = spark.createDataFrame(
        lrows or [(None, None, None)], "k long, ts timestamp_ntz, lid long"
    ).filter(F.col("lid").isNotNull())
    right = spark.createDataFrame(
        rrows or [(None, None, None)], "k long, ts timestamp_ntz, rid long"
    ).filter(F.col("rid").isNotNull())
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        attrs={"rid_asof": "rid"}, right_order="rid",
    )
    got = {r["lid"]: r["rid_asof"] for r in out.collect()}

    expected = {}
    for k, ts, lid in lrows:
        cands = [(rts, rid) for rk, rts, rid in rrows if rk == k and rts <= ts]
        expected[lid] = max(cands)[1] if cands else None
    assert got == expected


def test_row_salt_spreads_a_single_hot_key(spark):
    # regression: a key-derived salt sent every hot-key row to ONE
    # partition — the salt must vary WITHIN a key
    from manipula_o_de_dataframes_spark.operators.joins import _row_salt

    hot = spark.range(1000).select(F.lit(7).alias("k"), F.col("id"))
    n_salts = hot.select(_row_salt(4).alias("s")).distinct().count()
    assert n_salts > 1


def test_asof_join_null_attr_does_not_resurrect_stale_row(spark):
    # regression: per-attr last(ignorenulls) skipped a NULL attr on the
    # latest right row and returned a STALE older value
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:30:00"), "probe")],
        "k long, ts timestamp_ntz, payload string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 1, 5.0),
         (1, _ts("2024-01-01T10:00:00"), 2, None)],  # latest: price NULL
        "k long, ts timestamp_ntz, rid long, price double",
    )
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        attrs={"rid_asof": "rid", "price_asof": "price"}, right_order="rid",
    ).collect()[0]
    assert out["rid_asof"] == 2
    assert out["price_asof"] is None  # NOT 5.0 from the stale 09:00 row


def test_null_text_docs_never_pair_in_lsh(spark):
    # regression: NULL text used to launder into the md5('')-phantom
    # signature (concat_ws over a NULL slice) and all NULL docs paired
    from manipula_o_de_dataframes_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h i j"),
         (3, None), (4, None)],
        "doc_id long, text string",
    )
    mh = dd.near_dup_pairs(df, "text", "doc_id", n_hashes=8, rows_per_band=2)
    assert [(r["id_a"], r["id_b"]) for r in mh.collect()] == [(1, 2)]
    sh = dd.simhash_near_dup(df, "text", "doc_id")
    assert [(r["id_a"], r["id_b"]) for r in sh.collect()] == [(1, 2)]


def test_null_doc_parity_across_engines(spark, tmp_path):
    """Cross-engine NULL contract: a corpus containing NULL documents
    must hash-match the DuckDB oracles for every signature/text query
    (regression for the concat_ws/CASE laundering family)."""
    import os

    from manipula_o_de_dataframes_spark.oracles import ORACLES
    from manipula_o_de_dataframes_spark.parity import compare, run_oracle
    from manipula_o_de_dataframes_spark.queries import QUERIES
    from manipula_o_de_dataframes_spark.sources.io import TPCH_TABLES

    sf = str(tmp_path)
    for t in TPCH_TABLES:
        if t != "documents":
            os.symlink(f"{SF_SMOKE}/{t}.parquet", f"{sf}/{t}.parquet")
    import duckdb

    duckdb.sql(
        """COPY (SELECT * FROM (VALUES
             (1, 'a b c d e f g h i j', 'en', 's', 19),
             (2, 'a b c d e f g h i j', 'en', 's', 19),
             (3, CAST(NULL AS VARCHAR), 'en', 's', 0),
             (4, CAST(NULL AS VARCHAR), 'en', 's', 0))
           t(doc_id, text, lang, source, n_chars))
           TO '{}' (FORMAT PARQUET)""".format(f"{sf}/documents.parquet")
    )

    for name in ["text_stats", "fingerprint_dedup", "minhash_signatures",
                 "simhash", "near_dup_jaccard", "near_dup_jaccard_banded",
                 "simhash_near_dup", "dedup_clusters", "doc_dedup_exact"]:
        errs = compare(QUERIES[name](spark, sf), run_oracle(ORACLES[name], sf))
        assert not errs, f"{name}: {errs}"


def test_asof_directed_forward_picks_earliest_at_or_after(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "a"),
         (1, _ts("2024-01-01T11:30:00"), "b"),
         (2, _ts("2024-01-01T09:00:00"), "c")],  # key with no future right
        "k long, ts timestamp_ntz, payload string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:30:00"), 100),
         (1, _ts("2024-01-01T12:00:00"), 101),
         (3, _ts("2024-01-01T10:00:00"), 102)],
        "k long, ts timestamp_ntz, rid long",
    )
    out = asof_join_directed(
        left, right, key="k", left_ts="ts", right_ts="ts",
        attrs={"rid_next": "rid"}, right_order="rid", direction="forward",
    )
    got = {r["payload"]: r["rid_next"] for r in out.collect()}
    assert got == {"a": 100, "b": 101, "c": None}


def test_asof_directed_forward_equal_ts_tie_breaks_to_max_order(spark):
    t = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame([(1, t, "x")], "k long, ts timestamp_ntz, payload string")
    right = spark.createDataFrame(
        [(1, t, 7), (1, t, 9), (1, _ts("2024-01-01T11:00:00"), 5)],
        "k long, ts timestamp_ntz, rid long",
    )
    out = asof_join_directed(
        left, right, key="k", left_ts="ts", right_ts="ts",
        attrs={"rid_next": "rid"}, right_order="rid", direction="forward",
    )
    # at-or-after includes equal ts; ties at equal ts break to max rid
    assert out.collect()[0]["rid_next"] == 9


def test_asof_directed_tolerance_nulls_far_matches(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "near"),
         (2, _ts("2024-01-01T10:00:00"), "far")],
        "k long, ts timestamp_ntz, payload string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:30:00"), 100),     # 30 min away
         (2, _ts("2024-01-01T12:30:00"), 200)],    # 2.5 h away
        "k long, ts timestamp_ntz, rid long",
    )
    out = asof_join_directed(
        left, right, key="k", left_ts="ts", right_ts="ts",
        attrs={"rid_next": "rid"}, right_order="rid",
        direction="forward", tolerance_secs=3600,
    )
    got = {r["payload"]: r["rid_next"] for r in out.collect()}
    assert got == {"near": 100, "far": None}


def test_asof_directed_backward_matches_asof_join(spark):
    """direction='backward' must be drop-in identical to asof_join."""
    import random

    rng = random.Random(7)
    base = _ts("2024-01-01T00:00:00")
    lefts = [(rng.randint(1, 4), base + dt.timedelta(seconds=rng.randint(0, 5000)), i)
             for i in range(60)]
    rights = [(rng.randint(1, 4), base + dt.timedelta(seconds=rng.randint(0, 5000)), 1000 + i)
              for i in range(60)]
    l = spark.createDataFrame(lefts, "k long, ts timestamp_ntz, lid long")
    r = spark.createDataFrame(rights, "k long, ts timestamp_ntz, rid long")
    a = asof_join(l, r, key="k", left_ts="ts", right_ts="ts",
                  attrs={"rid_asof": "rid"}, right_order="rid")
    b = asof_join_directed(l, r, key="k", left_ts="ts", right_ts="ts",
                           attrs={"rid_asof": "rid"}, right_order="rid",
                           direction="backward")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


@given(st.lists(_row, max_size=12), st.lists(_row, max_size=12),
       st.sampled_from([None, 5]))
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_directed_forward_matches_python_model(spark, lefts, rights, tol):
    """Forward + tolerance vs the obvious python model: nearest right at
    or after each left ts (ties to max rid), NULLed when beyond
    tolerance. Small domains force equal-ts pileups and empty sides."""
    base = _ts("2024-01-01T00:00:00")
    lrows = [(k, base + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(lefts)]
    rrows = [(k, base + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(rights)]
    left = spark.createDataFrame(
        lrows or [(None, None, None)], "k long, ts timestamp_ntz, lid long"
    ).filter(F.col("lid").isNotNull())
    right = spark.createDataFrame(
        rrows or [(None, None, None)], "k long, ts timestamp_ntz, rid long"
    ).filter(F.col("rid").isNotNull())
    out = asof_join_directed(
        left, right, key="k", left_ts="ts", right_ts="ts",
        attrs={"rid_next": "rid"}, right_order="rid",
        direction="forward", tolerance_secs=tol,
    )
    got = {r["lid"]: r["rid_next"] for r in out.collect()}

    expected = {}
    for k, ts, lid in lrows:
        cands = [(rts, rid) for rk, rts, rid in rrows if rk == k and rts >= ts]
        if not cands:
            expected[lid] = None
            continue
        nearest_ts = min(rts for rts, _ in cands)
        pick = max(rid for rts, rid in cands if rts == nearest_ts)
        within = tol is None or (nearest_ts - ts).total_seconds() <= tol
        expected[lid] = pick if within else None
    assert got == expected


def test_asof_null_timestamps_never_match(spark):
    """NULL-ts rows have no position on the time axis (ADVICE r3):
    a NULL-ts LEFT row gets NULL attrs in every direction (forward's
    desc scan must not let it sort last and inherit the key's earliest
    right row), and a NULL-ts RIGHT row is never a match candidate
    (it must not become the running-last carry for early left rows)."""
    left = spark.createDataFrame(
        [(1, None, "null_ts"),
         (1, _ts("2024-01-01T08:00:00"), "early")],  # before every right row
        "k long, ts timestamp_ntz, payload string",
    )
    right = spark.createDataFrame(
        [(1, None, 666),                              # must never match
         (1, _ts("2024-01-01T10:00:00"), 100)],
        "k long, ts timestamp_ntz, rid long",
    )
    for direction, want_early in [("backward", None), ("forward", 100)]:
        out = asof_join_directed(
            left, right, key="k", left_ts="ts", right_ts="ts",
            attrs={"rid_m": "rid"}, right_order="rid", direction=direction,
        )
        got = {r["payload"]: r["rid_m"] for r in out.collect()}
        assert got == {"null_ts": None, "early": want_early}, direction

    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="ts",
        attrs={"rid_m": "rid"}, right_order="rid",
    )
    got = {r["payload"]: r["rid_m"] for r in out.collect()}
    assert got == {"null_ts": None, "early": None}
