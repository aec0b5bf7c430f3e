"""Round-7 continuation additions: Good–Turing unseen mass and
Neyman-optimal eval-budget allocation.

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
