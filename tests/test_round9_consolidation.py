"""Round-9 consolidation invariants.

1. `dedup_clusters` gained a threshold-gated small-graph path (driver
   union-find over the checkpointed edge list when it is at most
   `local_cc_max_edges`). The two paths must be LABEL-IDENTICAL —
   union-by-min makes every union-find root its component minimum,
   which is exactly the star-contraction fixed point — so the gate is
   a pure cost decision, never a semantics one.

2. The incremental-dedup production shape (VERDICT r8 #5): candidate
   pairing in `incremental_near_dups` is new×index ONLY — never
   index×index — which is what makes per-ingest admission linear in
   the batch while the persisted index grows. Pinned STRUCTURALLY on
   the executed plan: with batch and index features read from two
   distinct parquet paths, the index path is scanned exactly twice
   (band side + shingle-verify side) and the batch path exactly three
   times (bands + shingles + the row-preserving anchor). The deliberate
   regression — pairing over the UNION of both sides and filtering
   back to the batch — is constructed inline below and shown to
   VIOLATE the pin (extra index scans), so the assertion genuinely
   discriminates; an output-level check cannot (the regressed plan
   emits identical rows, only its intermediate pair volume explodes
   quadratically in the index).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from manipula_o_de_dataframes_spark.operators import dedup as dd

_ROWS = [
    (0, "the quick brown fox jumps over the lazy dog again and again ok"),
    (1, "the quick brown fox jumps over the lazy dog again and again yes"),
    (2, "the quick brown fox jumps over the lazy dog again and again yes sir"),
    (3, "completely different text about spark catalyst optimizer internals here"),
    (4, "another unrelated document mentioning parquet row groups and arrow"),
    (5, "final text on union find connected components and lsh banding"),
]


def _docs(spark):
    return spark.createDataFrame(_ROWS, "doc_id bigint, text string")


def test_dedup_clusters_local_path_matches_star_fixpoint(spark):
    """Default (local union-find) vs forced star contraction
    (local_cc_max_edges=0): identical labels, including the transitive
    chain 0≈1≈2 collapsing to min-id 0 and singletons self-labeled."""
    df = _docs(spark)
    local = {
        (r["doc_id"], r["cluster"])
        for r in dd.dedup_clusters(df, "text", "doc_id", jaccard_threshold=0.3).collect()
    }
    star = {
        (r["doc_id"], r["cluster"])
        for r in dd.dedup_clusters(
            df, "text", "doc_id", jaccard_threshold=0.3, local_cc_max_edges=0
        ).collect()
    }
    assert local == star
    assert (2, 0) in local, local  # the chain really merged
    assert (5, 5) in local, local  # singleton self-labeled


def _feature_paths(spark, tmp_path):
    # SHORT paths directly under the system temp dir: Spark truncates
    # long plan fields (Location: ... strings), and the pytest
    # tmp_path prefix is long enough to push the distinctive leaf name
    # past the cut — the pin counts path substrings in the plan text.
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    df = _docs(spark)
    root = tempfile.mkdtemp(prefix="r9pin")
    bp = os.path.join(root, "batchfeat")
    ip = os.path.join(root, "indexfeat")
    dd.minhash_signature(
        df.filter("doc_id < 2"), "text", "doc_id", 4, keep_shingles=True
    ).write.parquet(bp)
    dd.minhash_signature(
        df.filter("doc_id >= 2"), "text", "doc_id", 4, keep_shingles=True
    ).write.parquet(ip)
    import atexit  # noqa: PLC0415

    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return spark.read.parquet(bp), spark.read.parquet(ip)


def test_incremental_dedup_pairing_is_batch_bounded(spark, tmp_path):
    batch_feats, index_feats = _feature_paths(spark, tmp_path)
    out = dd.incremental_near_dups(
        None,
        None,
        "text",
        "doc_id",
        index_features=index_feats,
        new_features=batch_feats,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("indexfeat") == 2, (
        "index side must appear exactly twice (bands + verify); more "
        "scans means index×index pairing re-entered the plan\n" + plan
    )
    assert plan.count("batchfeat") == 3, plan
    assert "Union" not in plan, (
        "a Union of batch+index features means the candidate join went "
        "symmetric (union self-pairing) — the index side must only ever "
        "sit on one side of the band join\n" + plan
    )
    # anchor property: every batch doc exactly once, no index-side rows
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [0, 1], ids


def test_batch_bounded_pin_catches_union_pairing_regression(spark, tmp_path):
    """Red-team: build the FULL regressed pipeline — the deliberate
    "swap the filter" edit where the candidate stage bands the UNION of
    both sides, self-joins, and filters back to batch ids, while the
    verify joins and the anchor stay as-is — and confirm the structural
    pin above rejects it on BOTH prongs: the index path is scanned more
    than twice (candidate union contributes two extra scans on top of
    the verify scan) and a Union node enters the plan. A candidates-only
    comparison would NOT discriminate (the bare regressed candidate
    frame also reads each path twice), which is why the pin is asserted
    against the whole operator output plan."""
    batch_feats, index_feats = _feature_paths(spark, tmp_path)
    both = batch_feats.unionByName(
        index_feats, allowMissingColumns=True
    )

    def bandify(sig):
        keys = [
            F.concat(F.lit(str(j)), F.lit("|"), F.col(f"mh{j}")) for j in range(4)
        ]
        return sig.select(
            F.col("doc_id"), F.explode(F.array(*keys)).alias("band")
        )

    b = bandify(both)
    cand_regressed = (
        b.alias("x")
        .join(b.alias("y"), "band")
        .filter(F.col("x.doc_id") != F.col("y.doc_id"))
        .join(
            batch_feats.select(F.col("doc_id").alias("bid")),
            F.col("x.doc_id") == F.col("bid"),
        )
        .select(
            F.col("x.doc_id").alias("id_new"), F.col("y.doc_id").alias("id_idx")
        )
        .distinct()
    )
    # verify + anchor stages exactly as the real operator runs them
    sh_new = batch_feats.select(
        F.col("doc_id").alias("id_new"), F.col("__sh").alias("__sa")
    )
    sh_idx = index_feats.select(
        F.col("doc_id").alias("id_idx"), F.col("__sh").alias("__sb")
    )
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = F.size(F.array_union("__sa", "__sb")).cast("double")
    scored = (
        cand_regressed.join(sh_new, "id_new")
        .join(sh_idx, "id_idx")
        .select("id_new", "id_idx", F.round(inter / union, 9).alias("__j"))
    )
    out_regressed = batch_feats.select(F.col("doc_id").alias("id_new")).join(
        scored, "id_new", "left"
    )
    plan = out_regressed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("indexfeat") > 2 or "Union" in plan, plan


def test_incremental_candidate_volume_linear_in_index(spark):
    """Behavioral twin of the plan pin: with a FIXED 2-doc batch and
    the index replicated r× (jittered copies of the batch texts), the
    total candidate volume (sum of per-doc n_candidates) grows ∝ r —
    linear in the index because every pair has one batch endpoint. An
    index×index shape would grow the INTERMEDIATE quadratically; this
    documents the output-side contract (exactly linear here since
    every replica matches every batch doc's band)."""
    batch = spark.createDataFrame(
        [(i, f"shared duplicate payload text number {i % 2} end") for i in range(2)],
        "doc_id bigint, text string",
    )

    def index(r):
        return spark.createDataFrame(
            [
                (100 + i, f"shared duplicate payload text number {i % 2} end")
                for i in range(2 * r)
            ],
            "doc_id bigint, text string",
        )

    def vol(r):
        out = dd.incremental_near_dups(batch, index(r), "text", "doc_id")
        return sum(x["n_candidates"] or 0 for x in out.collect())

    v1, v4 = vol(1), vol(4)
    assert v1 > 0
    assert v4 == 4 * v1, (v1, v4)


def test_component_roots_paths_agree_on_random_graphs(spark):
    """Randomized equivalence of the CC core's two paths: for seeded
    random graphs spanning empty/sparse/dense/chain shapes, the driver
    union-find (local path) and the star-contraction fixpoint return
    the identical (node -> component-min) map. Runs on the factored
    `_component_roots` directly, so the graphs are arbitrary — not
    limited to what LSH-verified text pairs can produce."""
    import random

    from manipula_o_de_dataframes_spark.operators.dedup import _component_roots

    rng = random.Random(0xC0FFEE)
    cases = []
    for trial in range(6):
        n = rng.choice([2, 7, 20, 40])
        m = rng.randrange(0, 2 * n)
        edges = {
            tuple(sorted(rng.sample(range(n), 2), reverse=True))
            for _ in range(m)
        }
        cases.append(sorted(edges))
    cases.append([(i + 1, i) for i in range(30)])  # one long chain

    for i, pairs in enumerate(cases):
        e = spark.createDataFrame(
            pairs or [(None, None)], "a bigint, b bigint"
        ).filter(F.col("a").isNotNull())
        local, used_local, _ = _component_roots(e, 50, 10**6)
        star, used_star, _ = _component_roots(e, 50, -1)  # -1: 0-edge case too
        assert used_local and not used_star
        lm = {r["a"]: r["__root"] for r in local.collect()}
        sm = {r["a"]: r["__root"] for r in star.collect()}
        # star roots omit fixed-point roots that only appear as b (the
        # caller's coalesce self-labels them); compare on star's keys
        # plus check local's extras are self-maps
        assert all(lm[k] == v for k, v in sm.items()), (i, pairs, lm, sm)
        assert all(v == k for k, v in lm.items() if k not in sm), (i, lm, sm)
