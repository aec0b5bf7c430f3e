"""Round-5 third batch: Apriori triples, bitmap activity census,
leakage-safe feature assembly, RLE sort-key planner.

Oracle parity runs in test_oracle_parity; these pin the invariants
parity can't see (downward closure, bit-twiddling vs relational
reimplementation, embargo correctness vs a brute join, the planner's
bound against a physical sorted rewrite) and the plan shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.queries import QUERIES
from manipula_o_de_dataframes_spark.sources.io import read_table

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- apriori


def _pair_supports(spark):
    li = (
        read_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    return {
        (r["u"], r["v"]): r["n"]
        for r in a.join(b, "o")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_apriori_downward_closure(spark):
    """Every emitted triple's three sub-pairs must be frequent (≥2) —
    the Apriori invariant, checked against a brute pair census."""
    rows = QUERIES["apriori_triples"](spark, SF_SMOKE).collect()
    assert rows, "smoke fixture should yield pair-frequent triples"
    pairs = _pair_supports(spark)
    for r in rows:
        a, b, c = r["part_a"], r["part_b"], r["part_c"]
        assert a < b < c
        for p in ((a, b), (a, c), (b, c)):
            assert pairs.get(p, 0) >= 2, (r, p, pairs.get(p, 0))


def test_apriori_support_matches_brute_triple_count(spark):
    """Expression-side generation from sorted basket arrays must count
    exactly what a three-way self-join counts."""
    li = (
        read_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    cols = lambda n: li.select(  # noqa: E731
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias(n)
    )
    brute = {
        (r["x"], r["y"], r["z"]): r["n"]
        for r in cols("x")
        .join(cols("y"), "o")
        .join(cols("z"), "o")
        .filter((F.col("x") < F.col("y")) & (F.col("y") < F.col("z")))
        .groupBy("x", "y", "z")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in QUERIES["apriori_triples"](spark, SF_SMOKE).collect():
        assert brute[(r["part_a"], r["part_b"], r["part_c"])] == r["support"]


def test_apriori_plan_shape(spark):
    """One basket collect + one census shuffle; the three sub-pair
    prunes are broadcast LEFT SEMI joins (the bounded-L2 posture); no
    Python, no cartesian anywhere."""
    p = _plan(QUERIES["apriori_triples"](spark, SF_SMOKE))
    assert "EvalPython" not in p and "CartesianProduct" not in p, p
    assert p.count("BroadcastHashJoin") >= 3, p
    assert "LeftSemi" in p, p


# ---------------------------------------------------------- activity bitmaps


def test_bitmap_streak_matches_python_fold(spark):
    """The 64-step JVM mask fold vs an independent Python popscan."""
    rows = QUERIES["activity_bitmaps"](spark, SF_SMOKE).collect()
    assert rows

    def streak(mask: int) -> int:
        best = cur = 0
        for i in range(63):
            cur = cur + 1 if (mask >> i) & 1 else 0
            best = max(best, cur)
        return best

    for r in rows:
        assert r["n_active_days"] == bin(r["day_mask"]).count("1"), r
        assert r["longest_streak"] == streak(r["day_mask"]), r
        assert 0 < r["day_mask"] < (1 << 63)


def test_bitmap_plan_is_jvm_only(spark):
    p = _plan(QUERIES["activity_bitmaps"](spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "TakeOrderedAndProject" in p, p


# ---------------------------------------------------- leakage-safe features


def test_leakage_features_match_brute_join(spark):
    """The range-frame features must equal an independent brute
    formulation: aggregate every (label, prior-event) pair with
    prior.sec ≤ label.sec − embargo via an explicit join."""
    out = QUERIES["leakage_safe_features"](spark, SF_SMOKE)
    e = read_table(spark, SF_SMOKE, "events")
    sec = F.expr("timestampdiff(SECOND, TIMESTAMP_NTZ'1990-01-01 00:00:00', ts)")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("long")
    base = e.select(
        "user_id", "event_id", "event_type", sec.alias("s"), cents.alias("c")
    )
    labels = base.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("lu"),
        F.col("event_id").alias("label_event"),
        F.col("s").alias("ls"),
    )
    joined = labels.join(
        base.select(F.col("user_id").alias("lu"), "s", "c"),
        ["lu"],
        "left",
    ).withColumn("__ok", F.col("s") <= F.col("ls") - 3 * 86400)
    brute = joined.groupBy("lu", "label_event", "ls").agg(
        F.sum(F.when(F.col("__ok"), 1).otherwise(0)).alias("n_prior"),
        F.coalesce(
            F.sum(F.when(F.col("__ok"), F.col("c"))), F.lit(0)
        ).alias("cents_prior"),
        F.max(F.when(F.col("__ok"), F.col("s"))).alias("last_s"),
    )
    brute = brute.select(
        F.col("lu").alias("user_id"),
        "label_event",
        F.col("n_prior").cast("long"),
        F.col("cents_prior").cast("long"),
        F.coalesce(F.col("ls") - F.col("last_s"), F.lit(-1))
        .cast("long")
        .alias("recency_gap_s"),
    )
    diff = out.exceptAll(brute).count() + brute.exceptAll(out).count()
    assert diff == 0


def test_leakage_plan_single_user_shuffle(spark):
    """One user-keyed window cascade; no join, no Python."""
    p = _plan(QUERIES["leakage_safe_features"](spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


# ------------------------------------------------------- RLE sort planner


def test_rle_self_key_equals_distinct_count(spark):
    """A column clustered by itself compresses to exactly its distinct
    count — the planner's sanity anchor."""
    out = {
        (r["sort_key"], r["column_name"]): r["est_runs"]
        for r in QUERIES["rle_sort_key_planner"](spark, SF_SMOKE).collect()
    }
    o = read_table(spark, SF_SMOKE, "orders")
    for key in ("o_orderstatus", "o_orderpriority", "o_custkey"):
        nd = o.select(key).distinct().count()
        assert out[(key, key)] == nd, (key, out[(key, key)], nd)


def test_rle_estimate_bounds_physical_rewrite(spark):
    """actual ≤ est ≤ actual + (groups − 1): the estimate must bracket
    a REAL sorted rewrite's run count (lag-change census over the
    physically sorted frame) for every (key, column) cell."""
    import duckdb

    est = {
        (r["sort_key"], r["column_name"]): r["est_runs"]
        for r in QUERIES["rle_sort_key_planner"](spark, SF_SMOKE).collect()
    }
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW orders AS SELECT *,"
        f" CAST(FLOOR(date_diff('second', TIMESTAMP '1990-01-01', o_orderdate)"
        f" / 604800.0) AS BIGINT) AS order_week"
        f" FROM '{SF_SMOKE}/orders.parquet'"
    )
    for key in ("o_orderstatus", "o_orderpriority", "o_custkey"):
        n_groups = con.sql(
            f"SELECT COUNT(DISTINCT {key}) FROM orders"
        ).fetchone()[0]
        for col in ("o_custkey", "o_orderstatus", "o_orderpriority", "order_week"):
            actual = con.sql(
                f"""
                SELECT 1 + SUM(CASE WHEN chg THEN 1 ELSE 0 END) FROM (
                  SELECT {col} IS DISTINCT FROM
                         LAG({col}) OVER (ORDER BY {key}, {col}, o_orderkey)
                         AND LAG({col}) OVER (ORDER BY {key}, {col}, o_orderkey)
                             IS NOT NULL AS chg
                  FROM orders
                ) WHERE chg IS NOT NULL
                """
            ).fetchone()[0]
            e = est[(key, col)]
            assert actual <= e <= actual + n_groups - 1, (key, col, actual, e)


def test_rle_planner_plan_shape(spark):
    """Three census aggregates, each with partial (map-side) expand —
    no sort of the fact table anywhere in the plan."""
    p = _plan(QUERIES["rle_sort_key_planner"](spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    # the only Sort allowed is the 12-row output ordering
    assert p.count("Sort ") <= 1, p


# ------------------------------------------------------ shapley channels


def test_shapley_matches_python_brute_force(spark):
    """credit_x24 must equal an independent Python Shapley over the
    16-subset lattice built from collected per-user touchsets."""
    from itertools import combinations
    from math import factorial

    e = read_table(spark, SF_SMOKE, "events").select("user_id", "event_type")
    rows = e.collect()
    touch, conv = {}, {}
    bits = {"click": 1, "error": 2, "signup": 4, "view": 8}
    for r in rows:
        u = r["user_id"]
        touch.setdefault(u, 0)
        if r["event_type"] in bits:
            touch[u] |= bits[r["event_type"]]
        if r["event_type"] == "purchase":
            conv[u] = 1

    def v(smask: int) -> int:
        return sum(
            conv.get(u, 0) for u, t in touch.items() if (t & ~smask) == 0
        )

    k = 4
    expected = {}
    for name, b in bits.items():
        others = [x for x in bits.values() if x != b]
        phi24 = 0
        for sz in range(k):
            for combo in combinations(others, sz):
                s = sum(combo)
                w = factorial(sz) * factorial(k - 1 - sz)
                phi24 += w * (v(s | b) - v(s))
        expected[name] = phi24

    out = {
        r["channel"]: r["credit_x24"]
        for r in QUERIES["shapley_channels"](spark, SF_SMOKE).collect()
    }
    assert out == expected

    # efficiency: total credit = 24 * (v(all) - v(empty))
    assert sum(out.values()) == 24 * (v(15) - v(0))


def test_shapley_plan_no_data_crossjoin(spark):
    """Every join after the user census is against a broadcast bounded
    lattice frame; no Python, no row-proportional cartesian."""
    p = _plan(QUERIES["shapley_channels"](spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "CartesianProduct" not in p, p


# --------------------------------------------------------- rake keywords


def test_rake_matches_python_reimplementation(spark):
    """Top-20 phrases and scores vs an independent Python RAKE with the
    same pooled integer scoring."""
    from collections import Counter

    from manipula_o_de_dataframes_spark.functions.text import STOPWORDS

    docs = (
        read_table(spark, SF_SMOKE, "documents")
        .filter(F.col("text").isNotNull())
        .select("text")
        .collect()
    )
    deg, freq, pcount = Counter(), Counter(), Counter()
    for r in docs:
        phrase, phrases = [], []
        for t in r["text"].split(" "):
            if t in STOPWORDS:
                if phrase:
                    phrases.append(" ".join(phrase))
                phrase = []
            else:
                phrase.append(t)
        if phrase:
            phrases.append(" ".join(phrase))
        for p in phrases:
            ws = p.split(" ")
            pcount[p] += 1
            for w in ws:
                deg[w] += len(ws)
                freq[w] += 1
    scored = []
    for p, n in pcount.items():
        ws = p.split(" ")
        sd = sum(deg[w] for w in ws)
        sf = sum(freq[w] for w in ws)
        scored.append((p, n, (2000 * sd + sf) // (2 * sf)))
    scored.sort(key=lambda t: (-t[2], t[0]))
    expected = scored[:20]
    out = [
        (r["phrase"], r["n_occ"], r["score_milli"])
        for r in QUERIES["rake_keywords"](spark, SF_SMOKE).collect()
    ]
    assert out == expected


def test_rake_plan_is_jvm_only(spark):
    p = _plan(QUERIES["rake_keywords"](spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "TakeOrderedAndProject" in p, p


# --------------------------------------------------- quantile normalize


def test_quantile_normalize_matches_python_brute(spark):
    """Per-doc rank_ppm and as-of mapped global length vs a Python
    reimplementation from the raw rows."""
    d = read_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "n_chars"
    )
    rows = d.collect()
    by_src = {}
    all_lens = []
    for r in rows:
        by_src.setdefault(r["source"], []).append(r["n_chars"])
        all_lens.append(r["n_chars"])
    all_sorted = sorted(all_lens)
    n = len(all_sorted)

    def gppm(length: int) -> int:
        below = sum(1 for x in all_sorted if x < length)
        return (below * 1_000_000) // (n - 1) if n > 1 else 0

    glob = sorted({(gppm(v), v) for v in all_lens})
    expected = {}
    for r in rows:
        vals = by_src[r["source"]]
        m = len(vals)
        below = sum(1 for x in vals if x < r["n_chars"])
        rp = (below * 1_000_000) // (m - 1) if m > 1 else 0
        norm = max(v for g, v in glob if g <= rp)
        expected[r["doc_id"]] = (r["source"], r["n_chars"], rp, norm)

    out = QUERIES["quantile_normalize"](spark, SF_SMOKE).collect()
    assert len(out) == len(expected)
    for r in out:
        assert expected[r["doc_id"]] == (
            r["source"],
            r["n_chars"],
            r["rank_ppm"],
            r["norm_chars"],
        ), r


def test_quantile_normalize_monotone_within_source(spark):
    """Longer doc ⇒ norm_chars never smaller (rank preservation)."""
    out = QUERIES["quantile_normalize"](spark, SF_SMOKE).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append((r["n_chars"], r["norm_chars"]))
    for vals in by_src.values():
        vals.sort()
        for (l1, n1), (l2, n2) in zip(vals, vals[1:]):
            assert n1 <= n2, (l1, n1, l2, n2)


# -------------------------------------------------------- hyperball 2-hop


def test_hyperball_estimates_track_exact_ball2(spark):
    """m=16 registers ⇒ ~26% per-node σ; across the graph the MEDIAN
    est/exact ratio must land well inside [0.6, 1.7], and estimates
    must correlate with exact sizes (bigger ball ⇒ bigger estimate on
    aggregate)."""
    est = {
        r["node"]: r["est_ball2"]
        for r in QUERIES["hyperball_2hop"](spark, SF_SMOKE).collect()
    }
    li = (
        read_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "o").filter(F.col("u") != F.col("v")).select("u", "v").distinct()
    )
    adj = {}
    for r in edges.collect():
        adj.setdefault(r["u"], set()).add(r["v"])
    exact = {}
    for n, nbrs in adj.items():
        ball = {n} | nbrs
        for w in nbrs:
            ball |= adj[w]
        exact[n] = len(ball)
    assert set(est) == set(exact)
    ratios = sorted(est[n] / exact[n] for n in exact)
    med = ratios[len(ratios) // 2]
    assert 0.6 <= med <= 1.7, med


def test_hyperball_plan_shape(spark):
    p = _plan(QUERIES["hyperball_2hop"](spark, SF_SMOKE))
    assert "EvalPython" not in p and "CartesianProduct" not in p, p


# -------------------------------------------------------- weighted sample


def test_weighted_sample_matches_python(spark):
    """Exact top-50 equality vs hashlib md5 + Python division."""
    import hashlib

    docs = (
        read_table(spark, SF_SMOKE, "documents")
        .filter(F.col("n_chars") > 0)
        .select("doc_id", "source", "n_chars")
        .collect()
    )
    scored = []
    for r in docs:
        u = int(hashlib.md5(f"ws:{r['doc_id']}".encode()).hexdigest()[:8], 16)
        scored.append((u / r["n_chars"], r["doc_id"], r["source"], r["n_chars"], u))
    scored.sort(key=lambda t: (t[0], t[1]))
    expected = [(d, s, n, u) for _, d, s, n, u in scored[:50]]
    out = [
        (r["doc_id"], r["source"], r["n_chars"], r["u_hash"])
        for r in QUERIES["weighted_sample"](spark, SF_SMOKE).collect()
    ]
    assert out == expected


def test_weighted_sample_biases_toward_long_docs(spark):
    """Size-biased sampling: the sample's mean length must exceed the
    corpus mean (that is the point of weighting by n_chars)."""
    d = read_table(spark, SF_SMOKE, "documents").filter(F.col("n_chars") > 0)
    corpus_mean = d.agg(F.avg("n_chars")).collect()[0][0]
    out = QUERIES["weighted_sample"](spark, SF_SMOKE)
    sample_mean = out.agg(F.avg("n_chars")).collect()[0][0]
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_weighted_sample_plan_is_topk(spark):
    p = _plan(QUERIES["weighted_sample"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in p, p
    assert "Exchange hashpartitioning" not in p, p


# ----------------------------------------------------- markov attribution


def test_markov_attribution_matches_independent_python(spark):
    """Full reimplementation from raw events — journeys built by
    Python sort (not window lag), same 12-round integer chain solve;
    all four channel rows must match exactly. Also pins removal ≥ 0
    (an edge-subset chain can never convert MORE — monotone under
    per-edge floor division by induction on rounds)."""
    e = (
        read_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user = {}
    for r in e:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    census = {}
    for evs in by_user.values():
        evs.sort()
        prev = "start"
        converted = False
        for _, _, t in evs:
            census[(prev, t)] = census.get((prev, t), 0) + 1
            if t == "purchase":
                converted = True
                break
            prev = t
        if not converted:
            census[(prev, "null")] = census.get((prev, "null"), 0) + 1
    rowtot = {}
    for (de, _), n in census.items():
        rowtot[de] = rowtot.get(de, 0) + n

    def conv(drop):
        edges = [
            (de, para, n)
            for (de, para), n in census.items()
            if drop is None or (de != drop and para != drop)
        ]
        mass, absorbed = {"start": 1_000_000}, 0
        for _ in range(12):
            nxt = {}
            for de, para, n in edges:
                if de in mass:
                    nxt[para] = nxt.get(para, 0) + (mass[de] * n) // rowtot[de]
            absorbed += nxt.pop("purchase", 0)
            nxt.pop("null", None)
            mass = nxt
        return absorbed

    pf = conv(None)
    chans = ["click", "error", "signup", "view"]
    rem = {c: pf - conv(c) for c in chans}
    tot = sum(rem.values())
    expected = [
        (c, pf, rem[c], (2_000_000 * rem[c] + tot) // (2 * tot) if tot else None)
        for c in chans
    ]
    out = [
        (r["channel"], r["conv_full_ppm"], r["removal_ppm"], r["credit_ppm"])
        for r in QUERIES["markov_attribution"](spark, SF_SMOKE).collect()
    ]
    assert out == expected
    for _, _, r_ppm, _ in out:
        assert r_ppm >= 0


# ----------------------------------------------------- rendezvous sharding


def test_hrw_moves_only_into_new_shard(spark):
    """The HRW minimal-disruption theorem, checked key-by-key: on the
    8→9 resize a key either keeps its shard or lands on shard 8 (the
    newcomer) — never migrates between old shards — and the moved
    fraction sits near the theoretical 1/9."""
    import hashlib

    keys = [
        r["c_custkey"]
        for r in read_table(spark, SF_SMOKE, "customer")
        .select("c_custkey")
        .collect()
    ]

    def hrw(k, n):
        return max(
            range(n),
            key=lambda s: (
                int(hashlib.md5(f"{k}:s{s}".encode()).hexdigest()[:8], 16),
                s,
            ),
        )

    moved = 0
    for k in keys:
        s8, s9 = hrw(k, 8), hrw(k, 9)
        if s8 != s9:
            assert s9 == 8, (k, s8, s9)
            moved += 1
    frac = moved / len(keys)
    assert 0.03 <= frac <= 0.25, frac  # E = 1/9 ≈ 0.11, smoke-scale noise

    out = {
        r["shard"]: (r["n_keys"], r["moved_in"])
        for r in QUERIES["rendezvous_sharding"](spark, SF_SMOKE).collect()
    }
    # engine result must agree with the Python reimplementation exactly
    exp = {}
    for k in keys:
        s9 = hrw(k, 9)
        n, m = exp.get(s9, (0, 0))
        exp[s9] = (n + 1, m + (1 if hrw(k, 8) != s9 else 0))
    assert out == exp
    # and the invariant surfaces in the census: only shard 8 gains movers
    for shard, (_, m) in out.items():
        if shard != 8:
            assert m == 0, (shard, m)


def test_hrw_plan_single_census_shuffle(spark):
    p = _plan(QUERIES["rendezvous_sharding"](spark, SF_SMOKE))
    assert "EvalPython" not in p and "Join" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p


# ----------------------------------------------------- association rules


def test_association_rules_match_python_brute(spark):
    """Exact top-20 vs a Python reimplementation from raw baskets;
    lift must be direction-symmetric by construction."""
    li = (
        read_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = {}
    for r in li:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    nb = len(baskets)
    from collections import Counter

    ni, nuv = Counter(), Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for p in ps:
            ni[p] += 1
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                nuv[(u, v)] += 1
    rules = []
    for (u, v), n in nuv.items():
        if n < 2:
            continue
        for a, c in ((u, v), (v, u)):
            rules.append(
                (
                    a,
                    c,
                    n,
                    (n * 1_000_000) // ni[a],
                    (n * nb * 1000) // (ni[a] * ni[c]),
                )
            )
    rules.sort(key=lambda t: (-t[4], t[0], t[1]))
    expected = rules[:20]
    out = [
        (
            r["antecedent"],
            r["consequent"],
            r["support"],
            r["confidence_ppm"],
            r["lift_milli"],
        )
        for r in QUERIES["association_rules"](spark, SF_SMOKE).collect()
    ]
    assert out == expected
    lifts = {(a, c): l for a, c, _, _, l in rules}
    for (a, c), l in lifts.items():
        assert lifts[(c, a)] == l


def test_association_rules_plan_shape(spark):
    """Item/total attach by broadcast; no cartesian against data."""
    p = _plan(QUERIES["association_rules"](spark, SF_SMOKE))
    assert "EvalPython" not in p and "CartesianProduct" not in p, p
    assert p.count("BroadcastHashJoin") >= 2, p
    assert "TakeOrderedAndProject" in p, p


# --------------------------------------------------- neighborhood function


def test_neighborhood_function_monotone_and_anchored(spark):
    """N(r) must be monotone in r (registers only grow), the radius-4
    share must be 1e6 by construction, and N(1) must track the exact
    answer nodes + 2·edges (every node's 1-ball = itself + neighbors)
    within HLL tolerance."""
    rows = {
        r["radius"]: (r["n_pairs_est"], r["frac_of_r4_ppm"])
        for r in QUERIES["neighborhood_function"](spark, SF_SMOKE).collect()
    }
    assert sorted(rows) == [1, 2, 3, 4]
    ests = [rows[r][0] for r in (1, 2, 3, 4)]
    assert ests == sorted(ests), ests
    assert rows[4][1] == 1_000_000
    li = (
        read_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    e = (
        a.join(b, "o")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    n_edges = e.count()
    n_nodes = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .distinct()
        .count()
    )
    exact_n1 = n_nodes + 2 * n_edges
    assert 0.5 * exact_n1 <= rows[1][0] <= 2.0 * exact_n1, (rows[1][0], exact_n1)


def test_neighborhood_function_plan_spools_rounds(spark):
    """No Python, no cartesian; the spooled rounds keep radius-4 from
    re-running rounds 1-3 (plan reads parquet spools, asserted by the
    scan count exceeding the fixture-table scans)."""
    df = QUERIES["neighborhood_function"](spark, SF_SMOKE)
    p = _plan(df)
    assert "EvalPython" not in p and "CartesianProduct" not in p, p


# ------------------------------------------------------ behavioral cohort


def test_behavioral_cohort_matches_python_brute(spark):
    """Exclusion-funnel semantics vs a Python event-scan: first view,
    earliest purchase within 7d after it, zero errors strictly
    between. Every emitted row AND every non-emitted user checked."""
    e = (
        read_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    import datetime

    origin = datetime.datetime(1990, 1, 1)
    by_user = {}
    for r in e:
        s = int((r["ts"] - origin).total_seconds())
        by_user.setdefault(r["user_id"], []).append((s, r["event_type"]))
    expected = {}
    for u, evs in by_user.items():
        views = [s for s, t in evs if t == "view"]
        if not views:
            continue
        fv = min(views)
        purs = [s for s, t in evs if t == "purchase" and fv < s <= fv + 604800]
        if not purs:
            continue
        pur = min(purs)
        errs = [s for s, t in evs if t == "error" and fv < s < pur]
        if errs:
            continue
        expected[u] = (fv, pur, pur - fv)
    out = {
        r["user_id"]: (r["first_view_sec"], r["purchase_sec"], r["gap_s"])
        for r in QUERIES["behavioral_cohort"](spark, SF_SMOKE).collect()
    }
    assert out == expected
    assert expected, "smoke fixture should qualify some users"


def test_behavioral_cohort_single_shuffle(spark):
    """Three conditional windows, one user Exchange, no join."""
    p = _plan(QUERIES["behavioral_cohort"](spark, SF_SMOKE))
    assert "EvalPython" not in p and "Join" not in p, p
    assert p.count("Exchange hashpartitioning") <= 2, p  # windows + distinct


# -------------------------------------------------------- mix/rate bridge


def test_mix_rate_bridge_conserves_and_matches_brute(spark):
    """volume + rate must equal delta EXACTLY for every nation (the
    rate effect is defined as the integer remainder), and the volume
    effect must match a Python recomputation from raw rows."""
    out = QUERIES["mix_rate_bridge"](spark, SF_SMOKE).collect()
    assert out
    o = read_table(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_totalprice", F.year("o_orderdate").alias("y")
    )
    c = read_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_nationkey")
    n = read_table(spark, SF_SMOKE, "nation").select("n_nationkey", "n_name")
    rows = (
        o.filter(F.col("y").isin(1999, 2000))
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "y", "o_totalprice")
        .collect()
    )
    from decimal import Decimal

    agg = {}
    for r in rows:
        k = r["n_name"]
        nb, nc, cb, cc = agg.get(k, (0, 0, 0, 0))
        cents = int(
            (Decimal(str(r["o_totalprice"])).quantize(Decimal("0.01"))) * 100
        )
        if r["y"] == 1999:
            nb, cb = nb + 1, cb + cents
        else:
            nc, cc = nc + 1, cc + cents
        agg[k] = (nb, nc, cb, cc)
    for r in out:
        nb, nc, cb, cc = agg[r["nation"]]
        assert (r["n_base"], r["n_cur"], r["cents_base"], r["cents_cur"]) == (
            nb, nc, cb, cc,
        )
        assert r["volume_effect_cents"] + r["rate_effect_cents"] == r["delta_cents"]
        import math

        ve = (nc - nb) * (cb / nb)
        want = math.floor(ve + 0.5) if ve >= 0 else math.ceil(ve - 0.5)
        assert r["volume_effect_cents"] == want, (r["nation"], ve)


# ----------------------------------------------------- fair token budget


def test_fair_budget_conserves_and_is_maxmin(spark):
    """Σ allocated == budget exactly (largest-remainder), allocations
    match a from-scratch Python water-filler, and the max-min property
    holds: every capped allocation ≥ every satisfied demand − 1."""
    rows = QUERIES["fair_token_budget"](spark, SF_SMOKE).collect()
    assert rows
    demands = {r["source"]: r["demand_tokens"] for r in rows}
    total = sum(demands.values())
    budget = total // 2
    assert sum(r["allocated_tokens"] for r in rows) == budget

    # independent water-filler
    items = sorted(demands.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(items)
    alloc, cum, k = {}, 0, 0
    for rn, (src, d) in enumerate(items, start=1):
        if d * (n - rn + 1) <= budget - cum:
            alloc[src] = d
            cum += d
            k += 1
        else:
            break  # satisfied set is the maximal PREFIX (see docstring proof)
    m = n - k
    rem = budget - cum
    capped = [src for src, _ in items if src not in alloc]
    for i, src in enumerate(capped, start=1):
        alloc[src] = rem // m + (1 if i <= rem % m else 0)
    for r in rows:
        assert alloc[r["source"]] == r["allocated_tokens"], r
        assert r["fully_satisfied"] == (alloc[r["source"]] == demands[r["source"]])
    sat_d = [r["demand_tokens"] for r in rows if r["fully_satisfied"]]
    cap_a = [r["allocated_tokens"] for r in rows if not r["fully_satisfied"]]
    assert cap_a, "budget = half demand must cap someone"
    if sat_d:
        assert min(cap_a) >= max(sat_d) - 1


# -------------------------------------------------------- mrr waterfall


def test_mrr_waterfall_identity(spark):
    """The bridge identity: per month, new + expansion − contraction −
    churned must equal the exact month-over-month revenue change
    (classes partition the same integer deltas)."""
    from collections import defaultdict

    out = QUERIES["mrr_waterfall"](spark, SF_SMOKE).collect()
    assert out
    by_m = defaultdict(dict)
    for r in out:
        by_m[r["month_idx"]][r["classe"]] = r["delta_cents"]

    o = read_table(spark, SF_SMOKE, "orders").select(
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("c"),
        F.floor(
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ'1990-01-01 00:00:00',"
                " o_orderdate)"
            )
            / F.lit(30 * 86400)
        )
        .cast("long")
        .alias("m"),
    )
    rows = o.groupBy("o_custkey", "m").agg(F.sum("c").alias("cents")).collect()
    rev = defaultdict(lambda: defaultdict(int))
    for r in rows:
        rev[r["o_custkey"]][r["m"]] = r["cents"]
    months = sorted({r["m"] for r in rows})
    mx = months[-1]
    net = defaultdict(int)
    for cust, mm in rev.items():
        touched = sorted(set(mm) | {m + 1 for m in mm if m + 1 <= mx})
        for m in touched:
            net[m] += mm.get(m, 0) - mm.get(m - 1, 0)
    for m, classes in by_m.items():
        lhs = (
            classes.get("new", 0)
            + classes.get("expansion", 0)
            + classes.get("reactivation", 0)
            - classes.get("contraction", 0)
            - classes.get("churned", 0)
        )
        assert lhs == net[m], (m, dict(classes), net[m])


# -------------------------------------------------- credibility smoothing


def test_credibility_shrinks_toward_region(spark):
    """Partial-pooling invariants: smoothed always lies between raw
    and region rates (inclusive, ±1 ppm rounding slack); bigger n ⇒
    higher credibility; and credibility_milli = round(1000·n/(n+200))."""
    rows = QUERIES["credibility_smoothing"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        lo, hi = sorted((r["raw_ppm"], r["region_ppm"]))
        assert lo - 1 <= r["smoothed_ppm"] <= hi + 1, r
        want_z = round(1000 * r["n_lines"] / (r["n_lines"] + 200))
        assert abs(r["credibility_milli"] - want_z) <= 1, r
    by_n = sorted(rows, key=lambda r: r["n_lines"])
    for a, b in zip(by_n, by_n[1:]):
        assert a["credibility_milli"] <= b["credibility_milli"]


# ------------------------------------------------------ little's law audit


def test_littles_law_identity_holds(spark):
    """order_days_direct == order_days_swept for every nation — the
    conservation the query exists to prove — and both equal a Python
    day-count from raw spans."""
    rows = QUERIES["littles_law_audit"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["order_days_direct"] == r["order_days_swept"], r

    li = read_table(spark, SF_SMOKE, "lineitem").groupBy("l_orderkey").agg(
        F.date_trunc("day", F.max("l_shipdate")).cast("date").alias("cl")
    )
    o = read_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey",
        F.date_trunc("day", "o_orderdate").cast("date").alias("op"),
    )
    c = read_table(spark, SF_SMOKE, "customer").select("c_custkey", "c_nationkey")
    spans = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select("c_nationkey", "op", F.greatest("cl", "op").alias("cl"))
        .collect()
    )
    from collections import defaultdict

    want = defaultdict(int)
    for r in spans:
        want[r["c_nationkey"]] += (r["cl"] - r["op"]).days + 1
    for r in rows:
        assert want[r["nationkey"]] == r["order_days_direct"], r


# --------------------------------------------------------- survey raking


def test_raking_converges_both_margins(spark):
    """After 6 double-rounds each nation margin and each segment
    margin is within 0.1% of its uniform target; all weights > 0."""
    rows = QUERIES["survey_raking"](spark, SF_SMOKE).collect()
    assert rows
    from collections import defaultdict

    total = sum(r["n_customers"] for r in rows)
    nations = {r["nationkey"] for r in rows}
    segs = {r["mktsegment"] for r in rows}
    row_m, col_m = defaultdict(float), defaultdict(float)
    for r in rows:
        assert r["weight_ppm"] > 0
        mass = r["n_customers"] * r["weight_ppm"] / 1e6
        row_m[r["nationkey"]] += mass
        col_m[r["mktsegment"]] += mass
    rt, ct = total / len(nations), total / len(segs)
    for v in row_m.values():
        assert abs(v - rt) / rt < 1e-3, (v, rt)
    for v in col_m.values():
        assert abs(v - ct) / ct < 1e-3, (v, ct)


# ----------------------------------------------------- brier decomposition


def test_murphy_identity_within_rounding(spark):
    """REL − RES + UNC ≈ Brier: exact when computed with rational bin
    means, so the ppm-mean version must agree within the per-bin
    rounding budget (10 bins × sub-ppm² slack)."""
    rows = QUERIES["brier_decomposition"](spark, SF_SMOKE).collect()
    assert rows
    n = rows[0]["n_total"]
    x = rows[0]["n_pass_total"]
    brier = rows[0]["sq_err_sum"] / n / 1e12
    rel = sum(r["reliability_term"] for r in rows) / n / 1e12
    res = sum(r["resolution_term"] for r in rows) / n / 1e12
    wbv = sum(r["within_var_term"] for r in rows) / n / 1e12
    cov = sum(r["within_cov_term"] for r in rows) / n / 1e12
    obar = x / n
    unc = obar * (1 - obar)
    # per-bin ppm rounding perturbs means by ≤0.5e-6 → terms by ~1e-6
    assert abs((rel - res + unc + wbv - 2 * cov) - brier) < 1e-5, (
        rel, res, unc, wbv, cov, brier,
    )
    assert 0 <= brier <= 0.25 + 1e-9 or brier <= 1.0
    # resolution cannot exceed uncertainty (forecast-verification bound)
    assert res <= unc + 1e-4, (res, unc)


# ---------------------------------------------------- conformal coverage


def test_conformal_coverage_near_nominal(spark):
    """Aggregate held-out coverage must sit near the 90% nominal level
    (finite-sample slack per nation; the conformal guarantee is
    ≥ 0.9 − 1/(n_cal+1) in expectation), and the radius must cover
    exactly ⌈0.9·n⌉ of the calibration residuals by construction."""
    rows = QUERIES["conformal_coverage"](spark, SF_SMOKE).collect()
    assert rows
    covered = sum(r["coverage_ppm"] * r["n_test"] for r in rows)
    n_test = sum(r["n_test"] for r in rows)
    agg = covered / n_test / 1e6
    assert 0.75 <= agg <= 1.0, agg
    for r in rows:
        assert r["q90_resid_cents"] > 0
        assert r["n_cal"] > 0 and r["n_test"] > 0


# ------------------------------------------------- banding recall audit


def test_banding_recall_monotone_s_curve(spark):
    """Recall must be monotone non-decreasing in the similarity band
    and high at the top band — the empirical S-curve the production
    banding's docstrings argue from theory."""
    rows = QUERIES["banding_recall_audit"](spark, SF_SMOKE).collect()
    assert rows
    by_band = sorted((r["sim_band"], r["recall_ppm"], r["n_reference"]) for r in rows)
    recalls = [rp for _, rp, _ in by_band]
    for a, b in zip(recalls, recalls[1:]):
        assert b >= a - 50_000, by_band  # monotone within small-n noise
    top_band, top_recall, top_n = by_band[-1]
    assert top_band == 9
    if top_n >= 10:
        assert top_recall >= 900_000, by_band
    for _, _, n in by_band:
        assert n > 0


# ------------------------------------------------------- ivf probe sweep


def test_ivf_probe_sweep_monotone(spark):
    """Recall and scanned-vector cost must both be monotone
    non-decreasing in nprobe; hits bounded by k; the nprobe axis is
    exactly 1..4."""
    rows = sorted(
        QUERIES["ivf_probe_sweep"](spark, SF_SMOKE).collect(),
        key=lambda r: r["nprobe"],
    )
    assert [r["nprobe"] for r in rows] == [1, 2, 3, 4]
    for r in rows:
        assert 0 <= r["hits_at_10"] <= 10
        assert r["recall_ppm"] == r["hits_at_10"] * 100000
    for a, b in zip(rows, rows[1:]):
        assert b["hits_at_10"] >= a["hits_at_10"], rows
        assert b["scanned_vecs"] >= a["scanned_vecs"], rows
