"""Round-7 continuation additions: Good–Turing unseen mass,
Neyman-optimal eval-budget allocation, the causal family
(IPW ATE / Mantel–Haenszel / CMH chi-squared), and the
schema-evolution ingest edge.

Each gets (a) an independent plain-Python recompute on the smoke
fixture, (b) its structural identities, and (c) plan pins — the
r5/r6 one-commit convention."""

from __future__ import annotations

import os
import shutil
import tempfile
from collections import Counter

from manipula_o_de_dataframes_spark.queries import QUERIES

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------------------------
# good_turing_mass


def _py_good_turing(rows):
    """Plain-Python Good–Turing recompute from (doc text) rows."""
    grams = Counter()
    for (text,) in rows:
        ts = text.split(" ")
        for i in range(len(ts) - 2):
            grams[" ".join(ts[i : i + 3])] += 1
    fof = Counter(grams.values())
    big_n = sum(f * n for f, n in fof.items())
    n1, n2 = fof.get(1, 0), fof.get(2, 0)
    out = []
    for r in range(6):
        n_types = (n1 * (n1 - 1)) // (2 * (n2 + 1)) if r == 0 else fof.get(r, 0)
        raw = 0 if r == 0 else (r * fof.get(r, 0) * 1_000_000) // big_n
        gt = ((r + 1) * fof.get(r + 1, 0) * 1_000_000) // big_n
        out.append((r, n_types, raw, gt))
    return out


def test_good_turing_matches_python_recompute(spark):
    rows = (
        spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
        .filter("text IS NOT NULL")
        .select("text")
        .collect()
    )
    expected = _py_good_turing([(r["text"],) for r in rows])
    got = [
        (r["freq_r"], r["n_types"], r["raw_mass_ppm"], r["gt_mass_ppm"])
        for r in QUERIES["good_turing_mass"](spark, SF_SMOKE).collect()
    ]
    assert got == expected


def test_good_turing_class_mass_identity(spark):
    """(r+1)·N_{r+1}/N is BOTH the GT mass of class r and the raw mass
    of class r+1 — one uniform formula, so adjacent rows must chain:
    gt_mass_ppm(r) == raw_mass_ppm(r+1). The unseen row (r=0) must
    carry zero raw mass and a non-trivial tail on this fixture."""
    rows = {
        r["freq_r"]: r
        for r in QUERIES["good_turing_mass"](spark, SF_SMOKE).collect()
    }
    assert sorted(rows) == [0, 1, 2, 3, 4, 5]
    for r in range(5):
        assert rows[r]["gt_mass_ppm"] == rows[r + 1]["raw_mass_ppm"], r
    assert rows[0]["raw_mass_ppm"] == 0
    # the fixture's trigram tail is real: >10% unseen mass, hapax-rich
    assert rows[0]["gt_mass_ppm"] > 100_000
    assert rows[1]["n_types"] > 0


def test_good_turing_plan_is_jvm_side(spark):
    p = _plan(QUERIES["good_turing_mass"](spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "CartesianProduct" not in p, p


# --------------------------------------------------------------------------
# neyman_allocation


def _py_neyman(doc_rows, budget=1000):
    """Brute-force recompute: pairwise-|Δ| GMD, Hamilton apportionment."""
    strata: dict[str, list[int]] = {}
    for source, text in doc_rows:
        strata.setdefault(source, []).append(len(text.split(" ")))
    names = sorted(strata)
    wts, gmds = {}, {}
    for s in names:
        xs = strata[s]
        n = len(xs)
        if n < 2:
            gmds[s], wts[s] = 0, 1
            continue
        pair_sum = sum(
            abs(a - b) for i, a in enumerate(xs) for b in xs[i + 1 :]
        )
        gmds[s] = (2000 * pair_sum) // (n * (n - 1))
        wts[s] = (2000 * pair_sum) // (n - 1) + 1

    def hamilton(weights):
        tw = sum(weights.values())
        base = {s: (budget * w) // tw for s, w in weights.items()}
        rem = {s: budget * w - base[s] * tw for s, w in weights.items()}
        short = budget - sum(base.values())
        for s in sorted(names, key=lambda s: (-rem[s], s))[:short]:
            base[s] += 1
        return base

    ney = hamilton(wts)
    prop = hamilton({s: len(strata[s]) for s in names})
    return {
        s: (len(strata[s]), gmds[s], ney[s], prop[s]) for s in names
    }


def test_neyman_matches_bruteforce_pairwise_gmd(spark):
    """The rank-identity GMD must equal the O(n²) pairwise definition,
    and the full allocation must match an independent Hamilton
    recompute — on the real fixture strata."""
    rows = (
        spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
        .filter("text IS NOT NULL")
        .select("source", "text")
        .collect()
    )
    expected = _py_neyman([(r["source"], r["text"]) for r in rows])
    got = {
        r["source"]: (r["n_docs"], r["gmd_milli"], r["neyman_n"], r["prop_n"])
        for r in QUERIES["neyman_allocation"](spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_neyman_budget_sums_exactly(spark):
    out = QUERIES["neyman_allocation"](spark, SF_SMOKE).collect()
    assert sum(r["neyman_n"] for r in out) == 1000
    assert sum(r["prop_n"] for r in out) == 1000
    assert all(r["neyman_n"] >= 0 and r["prop_n"] >= 0 for r in out)


def test_neyman_degenerate_strata_stay_total(spark):
    """Singleton and constant strata carry zero spread; the +1 milli
    floor must keep the apportionment well-defined and the high-spread
    stratum must take (nearly) the whole Neyman budget."""
    docs = (
        [(1, "solo doc here", "s_singleton")]
        + [(10 + i, "same same same same", "s_constant") for i in range(5)]
        + [(100 + i, " ".join("w" for _ in range(3 + 7 * i)), "s_spread")
           for i in range(5)]
    )
    tmp = tempfile.mkdtemp(prefix="neyman_test_")
    spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    ).write.parquet(os.path.join(tmp, "documents.parquet"))
    try:
        out = {
            r["source"]: r
            for r in QUERIES["neyman_allocation"](spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert sum(r["neyman_n"] for r in out.values()) == 1000
    assert sum(r["prop_n"] for r in out.values()) == 1000
    assert out["s_singleton"]["gmd_milli"] == 0
    assert out["s_constant"]["gmd_milli"] == 0
    # floor weights are 1 milli vs a real spread of thousands
    assert out["s_spread"]["neyman_n"] >= 998
    # proportional arm ignores spread entirely (equal n ⇒ equal shares
    # up to the one largest-remainder unit, which ties break by source)
    assert abs(out["s_constant"]["prop_n"] - out["s_spread"]["prop_n"]) <= 1


def test_neyman_rank_window_is_source_partitioned(spark):
    """The only data-proportional window must be partitioned by source;
    census windows (≤ #sources rows) are the documented bounded edge."""
    p = _plan(QUERIES["neyman_allocation"](spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "CartesianProduct" not in p, p
    for ln in p.splitlines():
        if "windowspecdefinition(__x" in ln or "windowspecdefinition(doc_id" in ln:
            raise AssertionError(f"rank window lost its partition:\n{ln}")


# --------------------------------------------------------------------------
# ipw_ate / mantel_haenszel


def _tdiv(n: int, d: int) -> int:
    """Integer division truncating toward zero — Spark `div` / DuckDB
    `//` semantics. Python's `//` FLOORS, which differs on inexact
    negative quotients (−7//2 = −4 vs trunc −3), so any recompute of
    a possibly-negative engine division must use this."""
    q = n // d
    if q < 0 and q * d != n:
        q += 1
    return q


def _py_obs_frame(cust_rows, order_rows):
    """Pure-Python rebuild of _obs_customer_frame from raw rows."""
    per = {
        ck: {"t": 0, "nmid": 0, "y": 0, "y2": 0} for (ck,) in cust_rows
    }
    for ck, od, cents in order_rows:
        u = per[ck]
        if od < "1996-01-01":
            u["t"] = 1
        elif od < "2001-01-01":
            u["nmid"] += 1
        else:
            u["y"] += cents
            u["y2"] = 1
    return [
        (min(u["nmid"] // 3, 3), u["t"], u["y"], u["y2"])
        for u in per.values()
    ]


def _load_obs_rows(spark, sf_dir):
    cust = [
        (r["c_custkey"],)
        for r in spark.read.parquet(
            os.path.join(sf_dir, "customer.parquet")
        ).select("c_custkey").collect()
    ]
    orders = [
        (r["o_custkey"], r["o_orderdate"].strftime("%Y-%m-%d"),
         int(round(float(r["o_totalprice"]) * 100)))
        for r in spark.read.parquet(
            os.path.join(sf_dir, "orders.parquet")
        ).select("o_custkey", "o_orderdate", "o_totalprice").collect()
    ]
    return cust, orders


def _py_ipw(frame):
    """From-scratch IPW recompute: per-tier rows, (wsum, nsum), naive."""
    strata: dict[int, list] = {}
    for tier, t, y, _ in frame:
        strata.setdefault(tier, []).append((t, y))
    expected = {}
    wsum = nsum = 0
    for tier, rows in strata.items():
        n = len(rows)
        n1 = sum(t for t, _ in rows)
        s1 = sum(y for t, y in rows if t == 1)
        s0 = sum(y for t, y in rows if t == 0)
        m1 = (s1 * 1000) // n1 if n1 else None
        m0 = (s0 * 1000) // (n - n1) if n - n1 else None
        valid = 1 if (n1 > 0 and n - n1 > 0) else 0
        dte = m1 - m0 if valid else None
        expected[tier] = (n, n1, m1, m0, dte, valid)
        if valid:
            wsum += n * dte
            nsum += n
    s1t = sum(y for _, t, y, _ in frame if t == 1)
    s0t = sum(y for _, t, y, _ in frame if t == 0)
    n1t = sum(t for _, t, _, _ in frame)
    n0t = len(frame) - n1t
    naive = (s1t * 1000) // n1t - (s0t * 1000) // n0t
    return expected, wsum, nsum, naive


def test_ipw_ate_matches_python_recompute(spark):
    """Stratum means, the positivity-filtered weighted ATE, and the
    naive contrast must all match a from-scratch Python recompute."""
    expected, wsum, nsum, naive = _py_ipw(
        _py_obs_frame(*_load_obs_rows(spark, SF_SMOKE))
    )
    ate = _tdiv(wsum, nsum)  # wsum can be negative — trunc, not floor
    from manipula_o_de_dataframes_spark.queries import QUERIES

    out = QUERIES["ipw_ate"](spark, SF_SMOKE).collect()
    for r in out:
        exp = expected[r["tier"]]
        got = (r["n_custs"], r["n_treated"], r["mean1_millicents"],
               r["mean0_millicents"], r["dte_millicents"], r["valid"])
        assert got == exp, (r["tier"], got, exp)
        assert r["ate_millicents"] == ate
        assert r["naive_millicents"] == naive


def test_ipw_ate_negative_inexact_ate_truncates_toward_zero(spark):
    """sf0.01's weighted ATE sum is negative and inexact — exactly
    where Python floor and engine truncation diverge by one (a review
    caught the first recompute using floor; both engines truncate).
    Pin that the engine result is the TRUNCATED quotient."""
    expected, wsum, nsum, _ = _py_ipw(
        _py_obs_frame(*_load_obs_rows(spark, "/root/testdata/sf0.01"))
    )
    assert wsum < 0 and wsum % nsum != 0, (wsum, nsum)
    from manipula_o_de_dataframes_spark.queries import QUERIES

    got = QUERIES["ipw_ate"](spark, "/root/testdata/sf0.01").first()[
        "ate_millicents"
    ]
    assert got == _tdiv(wsum, nsum)
    assert got == (wsum // nsum) + 1  # floor would be off by one here


def test_mantel_haenszel_matches_python_recompute(spark):
    frame = _py_obs_frame(*_load_obs_rows(spark, SF_SMOKE))
    cells: dict[int, list] = {}
    for tier, t, _, y2 in frame:
        cells.setdefault(tier, [0, 0, 0, 0, 0])
        k = {(1, 1): 0, (1, 0): 1, (0, 1): 2, (0, 0): 3}[(t, y2)]
        cells[tier][k] += 1
        cells[tier][4] += 1
    num = den = 0
    expected = {}
    for tier, (a, b, c, d, n) in cells.items():
        or_ppm = (a * d * 1_000_000) // (b * c) if b * c > 0 else None
        expected[tier] = (n, a, b, c, d, or_ppm)
        num += (a * d * 1000) // n
        den += (b * c * 1000) // n
    mh = (num * 1_000_000) // den
    from manipula_o_de_dataframes_spark.queries import QUERIES

    out = QUERIES["mantel_haenszel"](spark, SF_SMOKE).collect()
    for r in out:
        exp = expected[r["tier"]]
        got = (r["n_custs"], r["a"], r["b"], r["c"], r["d"], r["or_ppm"])
        assert got == exp, (r["tier"], got, exp)
        assert r["mh_or_ppm"] == mh
        assert r["a"] + r["b"] + r["c"] + r["d"] == r["n_custs"]


def test_mantel_haenszel_null_guard_and_ipw_positivity(spark):
    """Synthetic frame: a stratum with an empty 2x2 cell reports a
    NULL crude OR but still feeds the MH sums; a stratum missing an
    arm entirely is excluded from the ATE (valid=0) yet listed."""
    import datetime as dt

    custs = [(i,) for i in range(1, 13)]
    d_pre, d_late = dt.datetime(1995, 6, 1), dt.datetime(2001, 3, 1)
    d_mid = dt.datetime(1998, 6, 1)
    orders, oid = [], 0

    def add(ck, when, price="100.00"):
        nonlocal oid
        oid += 1
        orders.append((oid, ck, when, price))

    # tier 0 (no mid orders): custs 1-4 — treated all with outcome
    # (b=0 -> NULL or), controls split
    for ck in (1, 2):
        add(ck, d_pre)
        add(ck, d_late)
    add(3, d_late)   # control with outcome
    # cust 4: control, no outcome
    # tier 1 (3+ mid orders): custs 5-8 ALL TREATED -> valid=0 stratum
    for ck in (5, 6, 7, 8):
        add(ck, d_pre)
        for _ in range(3):
            add(ck, d_mid)
    add(5, d_late, "200.00")
    # custs 9-12: tier 0 extras to keep both arms alive there
    add(9, d_pre)
    add(10, d_pre)

    tmp = tempfile.mkdtemp(prefix="mh_test_")
    spark.createDataFrame(custs, "c_custkey long").write.parquet(
        os.path.join(tmp, "customer.parquet")
    )
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz,"
        " o_totalprice string"
    ).write.parquet(os.path.join(tmp, "orders.parquet"))
    from manipula_o_de_dataframes_spark.queries import QUERIES

    try:
        mh = {r["tier"]: r for r in QUERIES["mantel_haenszel"](spark, tmp).collect()}
        ipw = {r["tier"]: r for r in QUERIES["ipw_ate"](spark, tmp).collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # tier 0: treated {1,2,9,10} all with b>0? a=2 (1,2), b=2 (9,10),
    # c=1 (3), d=3 (4,11,12) — live OR
    assert mh[0]["or_ppm"] == (2 * 3 * 1_000_000) // (2 * 1)
    # tier 1: all treated -> c=d=0 -> b*c=0 -> NULL crude OR
    assert mh[1]["or_ppm"] is None
    assert mh[1]["mh_or_ppm"] == mh[0]["mh_or_ppm"]  # pooled is global
    # ipw: tier 1 has no controls -> valid=0, excluded from ATE
    assert ipw[1]["valid"] == 0
    assert ipw[0]["valid"] == 1
    assert ipw[0]["ate_millicents"] == ipw[0]["dte_millicents"]


def test_causal_pair_plans_are_jvm_side(spark):
    from manipula_o_de_dataframes_spark.queries import QUERIES

    for name in ("ipw_ate", "mantel_haenszel"):
        p = _plan(QUERIES[name](spark, SF_SMOKE))
        assert "EvalPython" not in p, name
        assert "CartesianProduct" not in p, name


# --------------------------------------------------------------------------
# schema_evolution_ingest


def test_schema_evolution_merged_nulls_and_schema(spark):
    """Early-batch rows must surface the late-added column as NULL;
    late rows carry the derived tag; the RAW merged parquet schema
    (before any projection) contains the evolved column exactly once
    alongside the base columns."""
    from manipula_o_de_dataframes_spark.queries import _schema_evolution_dir

    d = _schema_evolution_dir(spark, SF_SMOKE)
    raw = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(d, "batch1"), os.path.join(d, "batch2")
    )
    assert raw.schema.fieldNames().count("ingest_tag") == 1, raw.schema
    assert set(raw.schema.fieldNames()) == {
        "n_nationkey", "n_name", "n_regionkey", "ingest_tag"
    }
    rows = QUERIES["schema_evolution_ingest"](spark, SF_SMOKE).collect()
    assert rows, "nation fixture empty?"
    for r in rows:
        if r["n_nationkey"] < 13:
            assert r["ingest_tag"] is None, r
        else:
            assert r["ingest_tag"] == f"b2-{r['n_name']}", r


def test_schema_evolution_filter_pushes_down_through_merge(spark):
    """Schema merge is footer metadata only — a key filter must still
    reach the parquet scan as a pushed filter (column-presence pin,
    the repo's version-robust pushdown idiom)."""
    from manipula_o_de_dataframes_spark.queries import _schema_evolution_dir

    d = _schema_evolution_dir(spark, SF_SMOKE)
    merged = (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(d, "batch1"), os.path.join(d, "batch2"))
        .filter("n_nationkey >= 13")
        .select("n_nationkey", "ingest_tag")
    )
    p = _plan(merged)
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert pushed and any("n_nationkey" in ln for ln in pushed), p
    assert "EvalPython" not in p


# --------------------------------------------------------------------------
# cmh_test


def test_cmh_matches_python_recompute_and_exact_rational(spark):
    """Per-stratum E/V on their milli/micro grids must match a plain
    recompute, and the final milli statistic must sit within 2 milli
    of the EXACT rational CMH value (Fraction arithmetic) — the grid
    truncation bound."""
    from fractions import Fraction

    frame = _py_obs_frame(*_load_obs_rows(spark, SF_SMOKE))
    cells: dict[int, list] = {}
    for tier, t, _, y2 in frame:
        c = cells.setdefault(tier, [0, 0, 0, 0])  # n, n1, a, m1
        c[0] += 1
        c[1] += t
        c[2] += t & y2
        c[3] += y2
    expected, T, Em, Vm = {}, 0, 0, 0
    eT, eE, eV = 0, Fraction(0), Fraction(0)
    for tier, (n, n1, a, m1) in cells.items():
        e_milli = (n1 * m1 * 1000) // n
        v_micro = (
            (n1 * (n - n1) * m1 * (n - m1) * 1_000_000)
            // (n * n * (n - 1))
            if n >= 2
            else 0
        )
        expected[tier] = (n, a, e_milli, v_micro)
        T, Em, Vm = T + a, Em + e_milli, Vm + v_micro
        eT += a
        eE += Fraction(n1 * m1, n)
        eV += Fraction(n1 * (n - n1) * m1 * (n - m1), n * n * (n - 1))
    stat_milli = _tdiv((T * 1000 - Em) ** 2 * 1000, Vm)
    exact_milli = float((eT - eE) ** 2 / eV) * 1000
    out = QUERIES["cmh_test"](spark, SF_SMOKE).collect()
    for r in out:
        assert (r["n_custs"], r["a"], r["e_milli"], r["v_micro"]) == expected[
            r["tier"]
        ], r
        assert r["cmh_stat_milli"] == stat_milli
        assert abs(r["cmh_stat_milli"] - exact_milli) <= 2, (
            r["cmh_stat_milli"],
            exact_milli,
        )


def test_cmh_plan_is_jvm_side(spark):
    p = _plan(QUERIES["cmh_test"](spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "CartesianProduct" not in p, p


def test_cmh_survives_the_bigint_overflow_regime(spark):
    """Regression for the 10x-probe overflow: a single ~60k-customer
    stratum puts the hypergeometric variance product at n^4*1e6 ~
    1.3e25 — far past BIGINT — which the first formulation raised on.
    The DECIMAL(38,0) path must return the exact recomputed value."""
    n = 60_000
    import datetime as dt

    d_pre, d_late = dt.datetime(1995, 6, 1), dt.datetime(2001, 3, 1)
    rows = []
    for ck in range(1, n + 1):
        if ck % 3 == 0:
            rows.append((ck, d_pre))      # treated
        if ck % 2 == 0:
            rows.append((ck, d_late))     # outcome
    custs = spark.range(1, n + 1).selectExpr("id as c_custkey")
    orders = spark.createDataFrame(
        [(i + 1, ck, when, "10.00") for i, (ck, when) in enumerate(rows)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp_ntz,"
        " o_totalprice string",
    )
    tmp = tempfile.mkdtemp(prefix="cmh_big_")
    custs.write.parquet(os.path.join(tmp, "customer.parquet"))
    orders.write.parquet(os.path.join(tmp, "orders.parquet"))
    try:
        out = QUERIES["cmh_test"](spark, tmp).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    # everyone has 0 mid-period orders -> one tier-0 stratum of n rows
    assert len(out) == 1 and out[0]["n_custs"] == n
    n1 = n // 3                     # treated: ck % 3 == 0
    a = sum(1 for ck in range(1, n + 1) if ck % 3 == 0 and ck % 2 == 0)
    m1 = n // 2
    e_milli = (n1 * m1 * 1000) // n
    v_micro = (n1 * (n - n1) * m1 * (n - m1) * 1_000_000) // (
        n * n * (n - 1)
    )
    assert out[0]["a"] == a
    assert out[0]["e_milli"] == e_milli
    assert out[0]["v_micro"] == v_micro
    d = a * 1000 - e_milli
    assert out[0]["cmh_stat_milli"] == (d * d * 1000) // v_micro


# --------------------------------------------------------------------------
# kish_ess


def test_kish_ess_matches_exact_recompute_from_clusters(spark):
    """The ESS/DEFF/retention algebra must match a Python big-int
    recompute from the (oracle-verified) cluster labels joined to
    sources — same truncating divisions, no floats anywhere."""
    labels = {
        r["doc_id"]: r["cluster"]
        for r in QUERIES["dedup_clusters"](spark, SF_SMOKE).collect()
    }
    src = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(
            os.path.join(SF_SMOKE, "documents.parquet")
        ).select("doc_id", "source").collect()
    }
    sizes = Counter(labels.values())
    per: dict[str, list[int]] = {}
    for doc, cl in labels.items():
        per.setdefault(src[doc], []).append(1_000_000 // sizes[cl])
    expected = {}
    for s, ws in per.items():
        n, sw, sww = len(ws), sum(ws), sum(w * w for w in ws)
        expected[s] = (
            n,
            (sw * sw * 1000) // sww,
            (n * sww * 1000) // (sw * sw),
            (sw * sw * 1_000_000) // (n * sww),
        )
    got = {
        r["source"]: (r["n_docs"], r["ess_milli"], r["deff_milli"],
                      r["retention_ppm"])
        for r in QUERIES["kish_ess"](spark, SF_SMOKE).collect()
    }
    assert got == expected
    # the fixture has real near-dup clusters: some source must pay
    assert any(v[3] < 1_000_000 for v in got.values())


def test_kish_ess_uniform_weights_read_full_retention(spark):
    """Kish ESS prices weight VARIANCE, not downweighting: a source of
    all-singletons reads ESS = n exactly, and so does a source whose
    docs all sit in same-size clusters (equal weights). Only MIXED
    weights drag retention below 10^6 ppm."""
    docs = (
        [(i, f"unique text number {i} " + " ".join(f"u{i}w{j}" for j in range(12)),
          "s_single") for i in range(1, 6)]
        # two exact-duplicate pairs -> all weights 1/2 (equal)
        + [(10 + i, "pair one " + " ".join(f"p1w{j}" for j in range(12)), "s_pairs")
           for i in range(2)]
        + [(20 + i, "pair two " + " ".join(f"p2w{j}" for j in range(12)), "s_pairs")
           for i in range(2)]
        # mixed: one singleton + one duplicate pair
        + [(30, "lonely " + " ".join(f"mw{j}" for j in range(12)), "s_mixed")]
        + [(40 + i, "dup here " + " ".join(f"dw{j}" for j in range(12)), "s_mixed")
           for i in range(2)]
    )
    tmp = tempfile.mkdtemp(prefix="kish_test_")
    spark.createDataFrame(
        docs, "doc_id long, text string, source string"
    ).write.parquet(os.path.join(tmp, "documents.parquet"))
    try:
        out = {
            r["source"]: r for r in QUERIES["kish_ess"](spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert out["s_single"]["retention_ppm"] == 1_000_000
    assert out["s_single"]["ess_milli"] == 5000
    assert out["s_pairs"]["retention_ppm"] == 1_000_000  # equal 1/2 weights
    assert out["s_pairs"]["ess_milli"] == 4000
    assert out["s_mixed"]["retention_ppm"] < 1_000_000   # 1 vs 1/2 mix
    assert out["s_mixed"]["deff_milli"] > 1000


def test_kish_ess_plan_is_jvm_side(spark):
    p = _plan(QUERIES["kish_ess"](spark, SF_SMOKE))
    assert "EvalPython" not in p, p
    assert "CartesianProduct" not in p, p
