"""Round-5 fourteenth batch: Heaps'-law vocabulary growth and the
per-user RANGE-frame burst detector.

Oracle parity runs in test_oracle_parity; these pin the growth
curve's invariants against brute replays and the RANGE-frame burst
semantics (trailing 3600 s inclusive, earliest-peak tie-break).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.queries import QUERIES
from manipula_o_de_dataframes_spark.sources.io import read_table

from .conftest import SF_SMOKE


def test_vocab_growth_invariants_and_brute(spark):
    """Per source: 10 deciles, cum_tokens and cum_vocab non-decreasing,
    decile-10 vocab equals the source's true distinct-term count, and
    every checkpoint matches a brute ingest-order replay."""
    rows = QUERIES["vocab_growth"](spark, SF_SMOKE).collect()
    docs = sorted(
        read_table(spark, SF_SMOKE, "documents")
        .filter(F.col("text").isNotNull())
        .collect(),
        key=lambda r: (r["source"], r["doc_id"]),
    )
    by_src = defaultdict(list)
    for d in docs:
        by_src[d["source"]].append([t for t in d["text"].split(" ") if t])
    got = defaultdict(dict)
    for r in rows:
        got[r["source"]][r["decile"]] = r
    for src, doclists in by_src.items():
        n = len(doclists)
        assert sorted(got[src]) == list(range(1, 11)), src
        cum_tok, vocab = 0, set()
        checkpoints = {}
        for i, toks in enumerate(doclists, start=1):
            cum_tok += len(toks)
            vocab.update(toks)
            checkpoints[i] = (cum_tok, len(vocab))
        for dec in range(1, 11):
            r = got[src][dec]
            rank = (dec * n + 9) // 10
            assert r["n_docs"] == rank
            assert (r["cum_tokens"], r["cum_vocab"]) == checkpoints[rank], (src, dec)
        # monotone
        seq = [got[src][dec] for dec in range(1, 11)]
        for a, b in zip(seq, seq[1:]):
            assert a["cum_tokens"] <= b["cum_tokens"]
            assert a["cum_vocab"] <= b["cum_vocab"]


def test_burst_detection_brute_range_frame(spark):
    """max_burst_1h equals a brute per-user trailing-3600s-inclusive
    count maximum; peak_sec is the EARLIEST second achieving it;
    n_events is the user's full event count."""
    ev = read_table(spark, SF_SMOKE, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    ).collect()
    from datetime import datetime

    origin = datetime(1990, 1, 1)
    per_user = defaultdict(list)
    for r in ev:
        per_user[r["user_id"]].append(int((r["ts"] - origin).total_seconds()))
    expected = {}
    for u, secs in per_user.items():
        secs.sort()
        best, best_sec = 0, None
        for i, s in enumerate(secs):
            c = sum(1 for x in secs if s - 3599 <= x <= s)
            if c > best:
                best, best_sec = c, s
        expected[u] = (len(secs), best, best_sec)
    out = {r["user_id"]: r for r in QUERIES["burst_detection"](spark, SF_SMOKE).collect()}
    for u, (n, mx, sec) in expected.items():
        if mx >= 2:
            assert u in out, u
            assert out[u]["n_events"] == n
            assert out[u]["max_burst_1h"] == mx
            assert out[u]["peak_sec"] == sec
        else:
            assert u not in out
    assert set(out) <= {u for u, (_, mx, _) in expected.items() if mx >= 2}


def test_weekly_ohlc_brute_candles(spark):
    """Every candle's open/close match a brute (day, orderkey, cents)
    ordering replay; high >= open/close >= low; volume = sum."""
    o = read_table(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    ).collect()
    c = {
        r["c_custkey"]: r["c_nationkey"]
        for r in read_table(spark, SF_SMOKE, "customer").collect()
    }
    n = {
        r["n_nationkey"]: r["n_name"]
        for r in read_table(spark, SF_SMOKE, "nation").collect()
    }
    from datetime import date, timedelta
    from decimal import Decimal

    groups = defaultdict(list)
    for r in o:
        d = r["o_orderdate"].date()
        wk = d - timedelta(days=d.weekday())
        cents = int(Decimal(str(r["o_totalprice"])).quantize(Decimal("0.01")) * 100)
        day = (d - date(1970, 1, 1)).days
        groups[(n[c[r["o_custkey"]]], wk.isoformat())].append(
            (day, r["o_orderkey"], cents)
        )
    out = QUERIES["weekly_ohlc"](spark, SF_SMOKE).collect()
    assert len(out) == len(groups)
    for r in out:
        g = sorted(groups[(r["nation"], r["week"])])
        assert r["open_cents"] == g[0][2]
        assert r["close_cents"] == g[-1][2]
        assert r["high_cents"] == max(x[2] for x in g)
        assert r["low_cents"] == min(x[2] for x in g)
        assert r["volume_cents"] == sum(x[2] for x in g)
        assert r["n_orders"] == len(g)
        assert r["low_cents"] <= min(r["open_cents"], r["close_cents"])
        assert r["high_cents"] >= max(r["open_cents"], r["close_cents"])


def test_batch14_plan_shapes(spark):
    """JVM-side only; burst_detection's RANGE frame is a window scan,
    not a time-band self-join."""

    def plan(name):
        return QUERIES[name](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()

    for name in ("vocab_growth", "burst_detection"):
        p = plan(name)
        assert "EvalPython" not in p and "InPandas" not in p, f"{name}\n{p}"
    p = plan("burst_detection")
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p, (
        f"burst regressed to a self-join\n{p}"
    )
    assert "Window" in p, p
