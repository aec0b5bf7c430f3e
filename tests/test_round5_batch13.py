"""Round-5 thirteenth batch: isotonic (PAV) calibration fit,
Kaplan-Meier product-limit survival, and order/lineitem money
reconciliation.

Oracle parity runs in test_oracle_parity; these pin the PAV minimax
identity against a brute replay, KM's fold recurrence and bounds,
and the reconciliation's exact-micros arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.queries import QUERIES
from manipula_o_de_dataframes_spark.sources.io import read_table

from .conftest import SF_SMOKE


def test_isotonic_monotone_and_brute_minimax(spark):
    """iso_rate_ppm is non-decreasing in decile, reproduces the
    minimax identity replayed brute-force in Python over the member
    census, and the pooled flag marks exactly the changed rows."""
    cal = sorted(
        QUERIES["quality_calibration"](spark, SF_SMOKE).collect(),
        key=lambda r: r["decile"],
    )
    out = sorted(
        QUERIES["isotonic_calibration"](spark, SF_SMOKE).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in out] == [r["decile"] for r in cal]
    n = len(cal)
    passes = [r["n_gopher_pass"] for r in cal]
    docs = [r["n_docs"] for r in cal]

    def mean_ppm(j, k):
        return sum(passes[j : k + 1]) * 1_000_000 // sum(docs[j : k + 1])

    brute = [
        max(min(mean_ppm(j, k) for k in range(i, n)) for j in range(i + 1))
        for i in range(n)
    ]
    for i, r in enumerate(out):
        assert r["iso_rate_ppm"] == brute[i], (i, r)
        assert r["raw_rate_ppm"] == cal[i]["pass_rate_ppm"]
        assert r["pooled"] == int(r["iso_rate_ppm"] != r["raw_rate_ppm"])
    for a, b in zip(out, out[1:]):
        assert a["iso_rate_ppm"] <= b["iso_rate_ppm"], "PAV fit not monotone"


def test_km_survival_fold_and_bounds(spark):
    """survival_ppm is the exact integer fold of the hazard census
    (s <- s*(r-c) div r, ascending weeks), non-increasing, in
    [0, 1e6], and the passthrough columns equal hazard_weekly's."""
    haz = sorted(
        QUERIES["hazard_weekly"](spark, SF_SMOKE).collect(), key=lambda r: r["week_k"]
    )
    km = sorted(
        QUERIES["km_survival"](spark, SF_SMOKE).collect(), key=lambda r: r["week_k"]
    )
    assert [r["week_k"] for r in km] == [r["week_k"] for r in haz]
    s = 1_000_000
    prev = 1_000_000
    for h, k in zip(haz, km):
        s = (s * (h["at_risk"] - h["n_churned"])) // h["at_risk"]
        assert k["survival_ppm"] == s
        assert 0 <= s <= 1_000_000
        assert s <= prev, "survival increased"
        prev = s
        for col in ("at_risk", "n_churned", "n_censored", "hazard_ppm"):
            assert k[col] == h[col]


def test_order_reconciliation_brute_micros(spark):
    """Per-status counts and the max |delta| in micros match a brute
    Python replay of the exact integer arithmetic."""
    from collections import defaultdict
    from decimal import Decimal

    li = read_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_tax"
    ).collect()
    orders = read_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).collect()

    def cents(x):
        return int(
            Decimal(str(x)).quantize(Decimal("0.01"))
            * 100
        )

    calc = defaultdict(int)
    for r in li:
        calc[r["l_orderkey"]] += (
            cents(r["l_extendedprice"])
            * (100 - cents(r["l_discount"]))
            * (100 + cents(r["l_tax"]))
        )
    stats = defaultdict(lambda: [0, 0, 0, 0])  # n, no_lines, mismatch, maxabs
    for o in orders:
        st = stats[o["o_orderstatus"]]
        st[0] += 1
        if o["o_orderkey"] not in calc:
            st[1] += 1
        else:
            d = calc[o["o_orderkey"]] - cents(o["o_totalprice"]) * 10000
            if d != 0:
                st[2] += 1
            st[3] = max(st[3], abs(d))
    out = QUERIES["order_reconciliation"](spark, SF_SMOKE).collect()
    assert {r["o_orderstatus"] for r in out} == set(stats)
    for r in out:
        n, no_lines, mism, mx = stats[r["o_orderstatus"]]
        assert r["n_orders"] == n
        assert r["n_no_lines"] == no_lines
        assert r["n_mismatch"] == mism
        assert r["mismatch_ppm"] == mism * 1_000_000 // n
        # brute maxabs only covers orders WITH lines (None otherwise)
        if n > no_lines:
            assert r["max_abs_delta_micros"] == mx


def test_batch13_plan_shapes(spark):
    """isotonic and reconciliation stay JVM-side; km_survival's ONE
    Python stage is the documented census-bounded applyInPandas fold
    (exactly one ArrowEvalPython/FlatMapGroupsInPandas node, fed by
    the hazard census, never the fact table)."""

    def plan(name):
        return QUERIES[name](spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()

    for name in ("isotonic_calibration", "order_reconciliation"):
        p = plan(name)
        assert "EvalPython" not in p and "InPandas" not in p, f"{name}\n{p}"
    p = plan("km_survival")
    assert p.count("FlatMapGroupsInPandas") == 1, p
