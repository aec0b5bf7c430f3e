"""Round-8 consolidation invariants: the shared-MinHash shelf and the
agreement-flag banding derivation.

The r8 rewrites rest on two structural claims, each pinned here
against the operator implementations themselves (not just oracle
parity, which would also pass for a luckily-compensating bug):

1. `_minhash_sig4` (the first four columns of the 8-hash spool) is
   BIT-IDENTICAL to `minhash_signature(d, 4, keep_shingles=True)` —
   hash i of the md5-slice family is the same expression whatever
   n_hashes is, so the 4-hash shelf may ride the 8-hash artifact.
2. The r=2 banded pair set derived as an EXPRESSION over the r=1
   candidates' kept per-hash agreement flags equals the pair set the
   real r=2 banding pipeline emits (a matched r-row band implies each
   constituent hash matched, so stricter arms are a subset of the
   r=1 candidates).

Plus plan pins for the rewritten audits: one LSH band join in
banding_recall_audit (the second pipeline is gone), and
quantile_treatment_effects touching its events scan once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.operators import dedup as dd
from manipula_o_de_dataframes_spark.queries import (
    QUERIES,
    _docs_parallel,
    _minhash_sig4,
    _minhash_sig8,
)

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sig4_view_bit_identical_to_direct_4hash_signature(spark):
    d = _docs_parallel(spark, SF_SMOKE)
    direct = {
        r["doc_id"]: (tuple(r["__sh"] or []), r["mh0"], r["mh1"], r["mh2"], r["mh3"])
        for r in dd.minhash_signature(
            d, "text", "doc_id", 4, keep_shingles=True
        ).collect()
    }
    view = {
        r["doc_id"]: (tuple(r["__sh"] or []), r["mh0"], r["mh1"], r["mh2"], r["mh3"])
        for r in _minhash_sig4(spark, SF_SMOKE).collect()
    }
    assert direct == view


def test_sig8_prefix_is_the_4hash_signature(spark):
    # the subset claim at the hash level: mh0..mh3 of the 8-hash frame
    # equal the 4-hash signature column-for-column (same rows too)
    d = _docs_parallel(spark, SF_SMOKE)
    sig4 = {
        r["doc_id"]: (r["mh0"], r["mh1"], r["mh2"], r["mh3"])
        for r in dd.minhash_signature(d, "text", "doc_id", 4).collect()
    }
    sig8 = {
        r["doc_id"]: (r["mh0"], r["mh1"], r["mh2"], r["mh3"])
        for r in _minhash_sig8(spark, SF_SMOKE)
        .select("doc_id", "mh0", "mh1", "mh2", "mh3")
        .collect()
    }
    assert sig4 == sig8


def test_agreement_flag_banding_equals_real_r2_pipeline(spark):
    sig = _minhash_sig8(spark, SF_SMOKE).drop("__sh")
    # the real r=2 pipeline
    real = {
        (r["id_a"], r["id_b"])
        for r in dd.near_dup_pairs_from_sig(
            sig, "doc_id", 8, rows_per_band=2
        ).collect()
    }
    # the expression derivation over r=1 candidates
    cand = dd.near_dup_pairs_from_sig(sig, "doc_id", 8, keep_agreement=True)
    fires = None
    for j in range(4):
        band = (F.col(f"eq{2 * j}") == 1) & (F.col(f"eq{2 * j + 1}") == 1)
        fires = band if fires is None else (fires | band)
    derived = {
        (r["id_a"], r["id_b"]) for r in cand.filter(fires).collect()
    }
    assert derived == real
    # and the subset claim itself: every r=2 pair is an r=1 candidate
    allcand = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert real <= allcand


def test_keep_agreement_flags_match_n_agree(spark):
    rows = dd.near_dup_pairs_from_sig(
        _minhash_sig8(spark, SF_SMOKE).drop("__sh"),
        "doc_id",
        8,
        keep_agreement=True,
    ).collect()
    assert rows, "smoke fixture should band at least one pair"
    for r in rows:
        assert sum(r[f"eq{s}"] for s in range(8)) == r["n_agree"]


def test_banding_recall_audit_has_one_band_join(spark):
    # the rewrite's point: ONE explode/self-join LSH stage, not two.
    # The band self-join is the only equi-join on a 'band' column;
    # count its SortMergeJoin/ShuffledHashJoin occurrences via the
    # band-key exchange signature.
    p = _plan(QUERIES["banding_recall_audit"](spark, SF_SMOKE))
    assert p.count("hashpartitioning(band") <= 2, p  # two sides of ONE join
    assert "EvalPython" not in p, p
    assert "CartesianProduct" not in p, p


def test_qte_single_scan(spark):
    # eleven subtree re-runs collapsed to one: the events scan appears
    # once in the executed plan.
    p = _plan(QUERIES["quantile_treatment_effects"](spark, SF_SMOKE))
    assert p.count("events.parquet") <= 1, p
    assert "EvalPython" not in p, p
