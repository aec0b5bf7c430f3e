"""Round-6 additions (N233 roc_auc, N234 seasonal_decompose):
semantic checks independent of the DuckDB mirrors — brute pairwise
AUC and a pandas recompute of the decomposition, both at sf0.001.
"""

from __future__ import annotations

import pandas as pd

from manipula_o_de_dataframes_spark.queries import QUERIES

from .conftest import SF_SMOKE


def test_roc_auc_matches_brute_pairwise(spark):
    """The rank-sum identity vs the DEFINITION: AUC = mean over all
    (pos, neg) pairs of [z_pos > z_neg] + 0.5·[z_pos == z_neg]. O(n²)
    on the smoke corpus — the independent check the oracle (also
    rank-sum) can't provide."""
    row = QUERIES["roc_auc"](spark, SF_SMOKE).collect()[0]

    # rebuild z/label via the engine's own feature expressions (the
    # statistic under test is the PAIRING, not the features)
    from pyspark.sql import functions as F

    from manipula_o_de_dataframes_spark.functions.text import (
        dup_token_ratio,
        mean_token_len,
        quality_score,
        stopword_hits,
        token_count,
    )
    from manipula_o_de_dataframes_spark.sources.io import read_table

    d = read_table(spark, SF_SMOKE, "documents").filter(F.col("text").isNotNull())
    q = F.round(quality_score("text"), 9)
    dup = F.round(dup_token_ratio("text"), 9)
    mlen = F.round(mean_token_len("text"), 9)
    n_tok = token_count("text")
    z = F.round(
        F.lit(-2.0) + F.lit(6.0) * q + F.lit(-3.0) * dup + F.lit(0.25) * mlen
        + F.lit(0.002) * n_tok.cast("double"), 9)
    gopher = (
        n_tok.between(10, 1000) & mlen.between(2.0, 10.0) & (dup <= 0.6)
        & (stopword_hits("text") >= 2)
    )
    pdf = d.select(z.alias("z"), gopher.alias("pos")).toPandas()
    pos = pdf[pdf["pos"]]["z"].to_numpy()
    neg = pdf[~pdf["pos"]]["z"].to_numpy()
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    wins = halves = 0
    for zp in pos:
        wins += int((zp > neg).sum())
        halves += int((zp == neg).sum())
    brute_ppm = (2 * wins + halves) * 1_000_000 // (2 * len(pos) * len(neg))
    assert row["auc_ppm"] == brute_ppm
    assert row["gini_ppm"] == 2 * row["auc_ppm"] - 1_000_000
    # On THIS fixture the logistic score is ANTI-correlated with the
    # gate (AUC 0.36): z rewards length (+0.002/token) while the gate
    # caps tokens at 1000, so long docs score high and fail. The audit
    # exists to surface exactly this; assert it is far from random in
    # either direction, not that it flatters the score.
    assert abs(row["auc_ppm"] - 500_000) > 50_000


def test_seasonal_decompose_matches_pandas_recompute(spark):
    """Full integer recompute of trend/seasonal/remainder in pandas
    (truncating divisions via int(), matching Spark div / DuckDB //
    toward-zero semantics) — 7 rows, exact equality."""
    got = {
        r["dow_iso"]: r
        for r in QUERIES["seasonal_decompose"](spark, SF_SMOKE).collect()
    }
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    ev = ev[ev["event_type"] == "purchase"].copy()
    origin = pd.Timestamp("1990-01-01")
    secs = ((ev["ts"] - origin).dt.total_seconds()).astype("int64")
    day = secs // 86400  # non-negative: floor == trunc
    cents = (ev["value"].map(lambda v: round(v, 2)) * 100).round().astype("int64")
    daily = (
        pd.DataFrame({"day": day, "cents": cents}).groupby("day")["cents"].sum()
    )
    detr: dict[int, list[int]] = {}
    for dcur, c in daily.items():
        window = [daily.get(dcur + k) for k in range(-3, 4)]
        if any(w is None for w in window):
            continue
        trend7 = int(sum(window) * 1000 / 7) if sum(window) >= 0 else -int(
            -sum(window) * 1000 / 7
        )
        dow = int(dcur % 7 + 1)
        detr.setdefault(dow, []).append(int(c) * 1000 - trend7)
    def trunc_div(a: int, b: int) -> int:
        qd = abs(a) // b
        return qd if a >= 0 else -qd
    assert sorted(got) == sorted(detr)
    for dow, ds in detr.items():
        s = trunc_div(sum(ds), len(ds))
        mar = trunc_div(sum(abs(x - s) for x in ds), len(ds))
        r = got[dow]
        assert r["n_days"] == len(ds), dow
        assert r["seasonal_milli"] == s, dow
        assert r["mean_abs_remainder_milli"] == mar, dow


def test_neardup_screen_batch_is_idempotent_under_redelivery(spark):
    """foreachBatch is at-least-once: replaying a batch with the same
    batch_id must leave the admissions log and index byte-identical
    (batch-keyed overwrite paths), and a retried batch must never
    screen against its own earlier write."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from manipula_o_de_dataframes_spark.sources.io import read_table
    from manipula_o_de_dataframes_spark.streaming.neardup_stream import screen_batch

    root = tempfile.mkdtemp(prefix="neardup_idem_")
    index_dir = os.path.join(root, "index")
    out_dir = os.path.join(root, "adm")
    os.makedirs(index_dir)
    docs = read_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    seed = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    screen_batch(index_dir, out_dir, seed, 0)
    assert not os.path.exists(out_dir)  # seeding produces no admissions
    screen_batch(index_dir, out_dir, batch, 1)
    first = sorted(
        (r["doc_id"], r["n_candidates"], r["is_dup"])
        for r in spark.read.parquet(out_dir + "/b*").collect()
    )
    # redeliver BOTH batches (same ids) — results must not change
    screen_batch(index_dir, out_dir, seed, 0)
    screen_batch(index_dir, out_dir, batch, 1)
    again = sorted(
        (r["doc_id"], r["n_candidates"], r["is_dup"])
        for r in spark.read.parquet(out_dir + "/b*").collect()
    )
    assert first == again
    # batch 1's docs are in the index now, but its own retry excluded
    # them: no doc may report itself as its best match
    self_hits = [
        r
        for r in spark.read.parquet(out_dir + "/b*").collect()
        if r["best_match"] == r["doc_id"]
    ]
    assert not self_hits


def test_forecast_pinball_identities(spark):
    """Pinball-loss identities the formula must satisfy: at q=50 the
    loss is exactly 50·|e| (so total_50 = 50·Σ|e|), and q10+q90 =
    100·|e| − 80·e per week, so total_10 + total_90 relates to the
    raw error sums — check both from an independent error recompute."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from manipula_o_de_dataframes_spark.functions.formatting import MONEY
    from manipula_o_de_dataframes_spark.sources.io import read_table

    rows = QUERIES["forecast_pinball"](spark, SF_SMOKE).collect()
    got = {(r["nation"], r["pct"]): r for r in rows}

    o = read_table(spark, SF_SMOKE, "orders")
    wk = F.floor(F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")) / 7).cast("long")
    c = read_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_nationkey")
    n = read_table(spark, SF_SMOKE, "nation").select("n_nationkey", "n_name")
    census = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), wk.alias("wk"))
        .agg((F.sum(F.col("o_totalprice").cast(MONEY)) * 100).cast("bigint").alias("cents"))
    )
    w = Window.partitionBy("nation").orderBy("wk")
    errs = (
        census.select("nation", (F.col("cents") - F.lag("cents").over(w)).alias("e"))
        .filter(F.col("e").isNotNull())
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.abs("e")).alias("sum_abs"),
            F.sum("e").alias("sum_e"),
        )
        .collect()
    )
    for r in errs:
        nat = r["nation"]
        assert got[(nat, 50)]["n_weeks"] == r["n"]
        assert got[(nat, 50)]["total_pinball_centicents"] == 50 * r["sum_abs"], nat
        # q10 + q90 per week: max(10e,-90e) + max(90e,-10e) = 100|e|
        # (e>=0: 10e + 90e = 100e; e<0: -90e + -10e = 100|e|).
        assert (
            got[(nat, 10)]["total_pinball_centicents"]
            + got[(nat, 90)]["total_pinball_centicents"]
            == 100 * r["sum_abs"]
        ), nat


def test_holt_winters_matches_python_recompute(spark):
    """Full integer recompute of the Holt-Winters fold in plain Python
    (truncating divisions toward zero, matching Spark div / DuckDB //)
    from the same daily census — exact equality on all 14 output rows,
    independently of either engine's HOF/recursive-CTE machinery."""
    rows = QUERIES["holt_winters"](spark, SF_SMOKE).collect()
    ev = pd.read_parquet(SF_SMOKE + "/events.parquet")
    ev = ev[ev["event_type"] == "purchase"].copy()
    origin = pd.Timestamp("1990-01-01")
    secs = ((ev["ts"] - origin).dt.total_seconds()).astype("int64")
    ev["day"] = secs // 86400
    ev["v"] = ev["value"].map(lambda x: round(x, 2))
    daily = (ev.groupby("day")["v"].sum() * 100).round().astype("int64").sort_index()
    ys = [(int(d), int(c)) for d, c in daily.items()]

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // b
        return q if a >= 0 else -q

    l = tdiv(sum(c for _, c in ys[:7]) * 1000, 7)
    b = 0
    s = [c * 1000 - l for _, c in ys[:7]]
    out = []
    for t, (day, c) in enumerate(ys[7:], start=8):
        i = (t - 1) % 7
        fc = l + b + s[i]
        l_new = tdiv((c * 1000 - s[i]) + 7 * (l + b), 8)
        b = tdiv((l_new - l) + 15 * b, 16)
        s[i] = tdiv((c * 1000 - l_new) + 3 * s[i], 4)
        l = l_new
        out.append((day, c, fc, l, b))
    expect = out[-14:]
    got = [
        (r["day"], r["cents"], r["forecast_milli"], r["level_milli"], r["trend_milli"])
        for r in rows
    ]
    assert got == expect


def test_orc_roundtrip_and_pushdown(spark):
    """S18: ORC sink/scan — values survive a roundtrip bit-exactly
    (decimal, long, string, timestamp_ntz) and a filter on re-read
    reaches the ORC scan as a pushed predicate."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from manipula_o_de_dataframes_spark.sources.io import (
        read_orc,
        read_table,
        write_orc,
    )

    src = read_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("total"),
        "o_orderdate",
    )
    out = tempfile.mkdtemp(prefix="orc_rt_") + "/orders_orc"
    try:
        write_orc(src, out)
        back = read_orc(spark, out)
        assert back.schema == src.schema
        assert back.exceptAll(src).count() == 0
        assert src.exceptAll(back).count() == 0

        filtered = back.filter(F.col("o_orderkey") == 42).select("o_orderkey")
        plan = filtered._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "o_orderkey" in plan.split(
            "PushedFilters"
        )[1].split("]")[0], plan

        # partitioned layout: directory keys + partition pruning
        part_out = out + "_bystatus"
        write_orc(src, part_out, partition_by=("o_orderstatus",))
        pruned = read_orc(spark, part_out).filter(F.col("o_orderstatus") == "F")
        pplan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in pplan and "o_orderstatus" in pplan, pplan
        n_f = src.filter(F.col("o_orderstatus") == "F").count()
        assert pruned.count() == n_f
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(out + "_bystatus", ignore_errors=True)
