"""Deduplication operators (north-star LLM-pipeline surface).

No reference counterpart — these are the dedup primitives a training-data
pipeline needs at 100 TB. Everything is expression-level (no Python in
the hot path) and engine-portable: hashing is md5 (identical output in
any engine), minhash is the lexicographic MIN of seeded md5 digests
(uniform over hex strings, so a perfectly valid min-wise hash), and the
pairwise stage only ever runs on LSH-pruned candidates — never all
pairs. Scale shape:

    scan → per-doc signature (one pass, no shuffle)
         → explode bands → shuffle by band bucket (tiny rows)
         → within-bucket pair join → exact Jaccard verify on candidates

which is the standard MinHash-LSH plan: the only quadratic work happens
inside hash buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from .spool import graft_checkpoint as _ckpt
from .spool import spool as _spool

SHINGLE_K = 3


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the lowest-id row per identical text.

    groupBy(md5(text)) + per-column min_by over the id — an aggregate
    with map-side partial combine, so duplicate rows collapse inside
    each map task and at most one survivor per (key, map partition)
    reaches the shuffle. (A row_number window would shuffle and sort
    every payload row.) Same shape as cleaning.dedupe_rows.
    """
    others = [c for c in df.columns if c != id_col]
    kept = df.groupBy(F.md5(F.col(text_col)).alias("__key")).agg(
        F.min(F.col(id_col)).alias(id_col),
        *[F.min_by(F.col(c), F.col(id_col)).alias(c) for c in others],
    )
    return kept.select(*df.columns)


def shingles(col, k: int = SHINGLE_K) -> Column:
    """Word k-shingles as strings; whole text if fewer than k tokens.

    NULL text → NULL (not the md5('')-style phantom shingle that
    concat_ws over a NULL slice would launder in): a NULL signature
    downstream never bands, so NULL docs can't pair as "duplicates".
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.when(c.isNotNull(), F.array_distinct(sh))


def minhash(col, seed: int, k: int = SHINGLE_K) -> Column:
    """One min-wise hash: MIN of seed-prefixed md5 over the shingle set."""
    return F.array_min(
        F.transform(shingles(col, k), lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
    )


def minhash_signature(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 4,
    keep_shingles: bool = False,
) -> DataFrame:
    """Per-document MinHash signature (n_hashes min-wise hashes).

    ``keep_shingles=True`` additionally carries the shingle array
    through as ``__sh`` — the verify half of a persistable near-dup
    index artifact (signatures band, shingles verify), computed in the
    SAME single scan.

    Hash function i is the (i % 4)-th disjoint 8-hex-char (32-bit) slice
    of digest group i // 4 — each slice is an independent uniform hash
    of the shingle, so "min of slice i" is a valid min-wise family at a
    quarter of the hashing cost of one digest per hash (md5 dominates
    this operator's runtime). Digest group 0 is the plain md5 (kept
    un-prefixed for signature stability); group g ≥ 1 is md5('g:' ||
    shingle) — a seeded, independent digest — so n_hashes is unbounded
    at ceil(n/4) md5s per shingle.

    Single scan, single pass, no shuffle — the signature is ~n_hashes×8
    bytes per doc regardless of document size, which is what makes LSH
    dedup feasible at 100 TB (downstream stages never touch the text).
    """
    n_groups = (n_hashes + 3) // 4

    def digest_of(g: int):
        # single-arg lambda: a 2-arg lambda would receive the element index
        if g == 0:
            return lambda s: F.md5(s)
        return lambda s: F.md5(F.concat(F.lit(f"{g}:"), s))

    def slice_of(s: int):
        return lambda h: h.substr(1 + 8 * s, 8)

    # stage shingles once, then materialize each digest array in its own
    # projection so shingle md5s are computed once per row per group,
    # not once per signature column
    staged = df.select(F.col(id_col), shingles(F.col(text_col)).alias("__sh"))
    carry = [F.col("__sh")] if keep_shingles else []
    digests = staged.select(
        F.col(id_col),
        *carry,
        *[
            F.transform(F.col("__sh"), digest_of(g)).alias(f"__hs{g}")
            for g in range(n_groups)
        ],
    )
    return digests.select(
        F.col(id_col),
        *carry,
        *[
            F.array_min(
                F.transform(F.col(f"__hs{i // 4}"), slice_of(i % 4))
            ).alias(f"mh{i}")
            for i in range(n_hashes)
        ],
    )


def near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 4,
    min_matches: int = 1,
    rows_per_band: int = 1,
) -> DataFrame:
    """MinHash-LSH candidate pairs (b bands × r rows) + signature agreement.

    Explode each signature into b = n_hashes / rows_per_band band keys
    (band j concatenates hashes j·r … j·r+r−1), shuffle by band bucket,
    pair up within buckets (a.id < b.id), then score each pair by the
    number of agreeing hashes (the MinHash Jaccard estimate).

    rows_per_band is the precision knob: with r = 1 a single colliding
    hash admits a candidate pair (P[candidate] = 1−(1−j)^b for Jaccard
    j — far too permissive at 100 TB); with r ≥ 2 a band only fires
    when r hashes agree *jointly* (P = 1−(1−j^r)^b), the classic LSH
    S-curve that crushes low-similarity collisions. n_hashes must be a
    multiple of rows_per_band.
    """
    sig = minhash_signature(df, text_col, id_col, n_hashes)
    return near_dup_pairs_from_sig(
        sig, id_col, n_hashes, min_matches=min_matches, rows_per_band=rows_per_band
    )


def near_dup_pairs_from_sig(
    sig: DataFrame,
    id_col: str,
    n_hashes: int,
    min_matches: int = 1,
    rows_per_band: int = 1,
    keep_agreement: bool = False,
) -> DataFrame:
    """``near_dup_pairs`` over a PRECOMPUTED signature frame
    (id_col, mh0..mh{n-1}) — lets callers that build several banding
    arms over the same hashes (``banding_recall_audit``) compute and
    spool the signatures once instead of re-shingling the corpus per
    arm. Semantics identical to ``near_dup_pairs``.

    ``keep_agreement=True`` additionally carries the per-hash equality
    flags ``eq0..eq{n-1}`` through the output. Any coarser banding over
    the SAME hashes is then a pure EXPRESSION on these flags — an r-row
    band j fires iff eq(j·r)…eq(j·r+r−1) all agree — so a banding
    audit derives every stricter arm from the permissive r=1 pair set
    without a second explode/self-join/distinct pipeline (a matched
    r-row band implies each constituent hash matched, so stricter-arm
    pairs are always a subset of the r=1 candidates).

    The flags are coalesced to 0 at this boundary, so they are never
    NULL even if a caller composes band expressions over a frame where
    the surviving-the-band-join non-NULL argument no longer applies
    (filtered/unioned candidate frames): inside this operator a band
    match already implies both signatures are fully non-NULL (a
    non-NULL band key needs its hashes, and any non-empty shingle set
    yields ALL hashes), so the coalesce is an identity here — it exists
    to make the eq-column contract hold unconditionally downstream."""
    assert n_hashes % rows_per_band == 0, "n_hashes must be a multiple of rows_per_band"
    n_bands = n_hashes // rows_per_band
    # F.concat (NOT concat_ws, which SKIPS null args): a NULL signature
    # slot must poison its band key so the row never buckets — matching
    # the oracle's NULL-propagating '||' concatenation.
    def _band_key(j: int):
        parts = [F.lit(str(j))]
        for k in range(rows_per_band):
            parts += [F.lit("|"), F.col(f"mh{j * rows_per_band + k}")]
        return F.concat(*parts)

    band_keys = [_band_key(j) for j in range(n_bands)]
    bands = sig.select(
        F.col(id_col),
        *[F.col(f"mh{s}") for s in range(n_hashes)],
        F.explode(F.array(*band_keys)).alias("band"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(b, (F.col(f"a.band") == F.col(f"b.band")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *[
                F.coalesce(
                    (F.col(f"a.mh{s}") == F.col(f"b.mh{s}")).cast("int"), F.lit(0)
                ).alias(f"eq{s}")
                for s in range(n_hashes)
            ],
        )
        .distinct()
    )
    agree = sum(F.col(f"eq{s}") for s in range(n_hashes))
    out = pairs.withColumn("n_agree", agree.cast("long"))
    if min_matches > 1:
        # Only filter when it prunes: a band match already implies
        # n_agree >= 1, and a redundant filter here is poison — Catalyst
        # folds it into the join condition, infers isnotnull() on every
        # signature column, and pushes those below the repartition into
        # the (single-split) scan, re-evaluating the whole minhash
        # pipeline serially per predicate (~5× slower end-to-end).
        out = out.filter(F.col("n_agree") >= min_matches)
    if keep_agreement:
        return out.select(
            "id_a", "id_b", "n_agree", *[f"eq{s}" for s in range(n_hashes)]
        )
    return out.select("id_a", "id_b", "n_agree")


def jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, candidates: DataFrame
) -> DataFrame:
    """Exact n-gram Jaccard, verified only on LSH candidate pairs.

    Carries every candidate column through (e.g. n_agree) so the caller
    gets one plan — no re-join against the candidate subtree, which
    would execute the LSH stage twice.
    """
    sh = df.select(F.col(id_col), shingles(F.col(text_col)).alias("sh"))
    out = (
        candidates.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return out.select(*candidates.columns, (inter / union).alias("jaccard"))


def containment_pairs(
    df: DataFrame, text_col: str, id_col: str, candidates: DataFrame
) -> DataFrame:
    """Exact max-containment |A∩B| / min(|A|,|B|) on candidate pairs.

    Jaccard under-scores subset duplicates: a document embedded verbatim
    in one 5× larger has j ≈ 0.2 — below any dedup bar — yet that is
    precisely the boilerplate-wrapped / quote-expanded duplicate a
    training pipeline must catch. Normalizing the intersection by the
    SMALLER shingle set scores a full subset 1.0 whatever the size
    ratio. Both set sizes ride along so callers see the asymmetry
    (which side is the fragment). Same one-plan shape as jaccard_pairs:
    the verify touches candidates only, texts never shuffle — shingle
    arrays do, once, joined to the pruned pair list.
    """
    sh = df.select(F.col(id_col), shingles(F.col(text_col)).alias("sh"))
    out = candidates.join(
        sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a"
    ).join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    smaller = F.least(F.size("sh_a"), F.size("sh_b")).cast("double")
    return out.select(
        *candidates.columns,
        F.size("sh_a").cast("long").alias("n_sh_a"),
        F.size("sh_b").cast("long").alias("n_sh_b"),
        (inter / smaller).alias("containment"),
    )


def simhash_near_dup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_bits: int = 32,
    max_hamming: int = 3,
    n_bands: int = 4,
    features: str = "shingles",
) -> DataFrame:
    """SimHash near-dup pairs: banded candidates + exact Hamming verify.

    Pigeonhole blocking: split the n_bits fingerprint into n_bands
    contiguous slices — any pair with Hamming distance ≤ n_bands − 1
    shares at least one intact band, so banding with max_hamming ≤
    n_bands − 1 has PERFECT recall (unlike MinHash banding, which is
    probabilistic). Candidates join on (band_idx, band_bits) equality;
    survivors get the exact bitwise Hamming count. Same scale shape as
    MinHash-LSH: signatures are bytes per doc, only within-bucket pairs
    are scored. Defaults are the discriminative setup: 32 bits (8-bit
    bands = 256 buckets each) over shingle features — unigram-token
    SimHash collapses on template corpora where docs share vocabulary.
    """
    assert max_hamming <= n_bands - 1, "pigeonhole recall needs max_hamming < n_bands"
    assert n_bits % n_bands == 0
    width = n_bits // n_bands
    # Spool the signatures (one long per doc): the band self-join plans
    # one side as a broadcast, and without the spool BOTH sides would
    # recompute the full md5/shingle pipeline (no exchange reuse across
    # a broadcast boundary; a forced shuffle-hash join reuses nothing at
    # runtime either and measured 2× slower). NOTE: this makes query
    # CONSTRUCTION eager — the signature job runs when the DataFrame is
    # built, which is also when the quantile probes of the scaled
    # cumsum run; a plan-only inspection pays one signature pass.
    sig = _spool(simhash_long(df, text_col, id_col, n_bits, features=features))
    # Numeric band keys: key = band_idx·2^width + the band's bit slice
    # (shift/mask — no string render). NULL fingerprints propagate to
    # NULL keys, which never satisfy the equality join: NULL docs don't
    # bucket anywhere.
    band_keys = [
        F.shiftright("simhash_fp", (n_bands - 1 - j) * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        + F.lit(j << width)
        for j in range(n_bands)
    ]
    bands = sig.select(
        F.col(id_col), F.col("simhash_fp"), F.explode(F.array(*band_keys)).alias("band")
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash_fp").alias("__fa"),
            F.col("b.simhash_fp").alias("__fb"),
        )
        .distinct()
    )
    # Exact verify: one xor + popcount per candidate pair (VERDICT r2 #4
    # — replaces n_bits per-character string compares).
    ham = F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb")))
    return (
        pairs.withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def dedup_clusters(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 8,
    rows_per_band: int = 2,
    jaccard_threshold: float = 0.5,
    max_iter: int = 50,
    local_cc_max_edges: int = 1_000_000,
) -> DataFrame:
    """Near-dup clustering: connected components over verified pairs,
    canonical doc = the component's minimum id.

    The step real dedup pipelines run after pair generation: pairwise
    near-dups are transitive in intent (A≈B, B≈C ⇒ one cluster), so
    keep-one-per-cluster needs components, not pairs. Edges = banded
    MinHash-LSH candidates verified by exact Jaccard ≥ threshold;
    components by ALTERNATING LARGE-STAR / SMALL-STAR contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — each round rewires every node toward its neighborhood
    minimum, collapsing chains by doubling, so convergence is
    O(log n) rounds regardless of component DIAMETER. The r3 min-label
    propagation was O(diameter) rounds: on the 200k-doc probe's
    ~98%-duplicate giant components the fixpoint alone took 100.8 s of
    a 110 s pipeline; star contraction replaces that tail.

      large-star(u): m = min(N(u) ∪ {u}); rewire every STRICTLY LARGER
        neighbor v > u to m — emits (v, m), v > m always.
      small-star(u): over edges already oriented larger→smaller,
        m = min(N⁻(u) ∪ {u}); rewire u and its smaller neighbors to m.

    Both are one groupBy-min + one join per round; per-round state is
    checkpointed (``spool.graft_checkpoint``: reliable HDFS/S3
    checkpoint when ``spark.graft.checkpoint.dir`` /
    ``SPARK_GRAFT_CHECKPOINT_DIR`` is set — required off local mode,
    where executor-local blocks would make an executor loss
    mid-fixpoint unrecoverable — else localCheckpoint on local[*])
    so lineage stays O(1). Convergence = the edge
    multiset signature (count + xxhash64 sum) repeats — at the fixed
    point every edge is (node, component-min) and both stars are
    no-ops. The driver only ever sees the scalar signature, and the
    final labels are verified in one pass over the ORIGINAL edge list
    (every edge's endpoints must share a label — a stronger check than
    the old improvability probe), so a wrong fixpoint is a loud error,
    never a confusing oracle hash diff. Deterministic integer output —
    unlike float k-means this IS oracle-checkable (DuckDB mirrors it
    with a recursive transitive closure).

    SMALL-GRAPH FAST PATH (r9): the verified edge list is orders of
    magnitude smaller than the corpus (LSH banding + Jaccard verify
    already collapsed it — measured 107 edges from a 2,137-doc gated
    corpus at sf0.1, where each star round still pays ~1 s of fixed
    job-scheduling cost). When the oriented edge count is at most
    ``local_cc_max_edges`` the components are computed by driver-side
    union-find over the Arrow-collected pairs — the classic
    filter-then-local posture production dedup pipelines use for the
    post-LSH component step — and the distributed star contraction
    runs only above the bound. The collect is threshold-bounded BY
    CONSTRUCTION (``limit(bound+1).toPandas()`` is both the gate and,
    when local, already the data — ONE bounded job; at the default
    1M-edge bound the Arrow transfer is ~16 MB of int64 pairs —
    string ids scale that by their length, so size the bound to driver
    memory if ids are long strings, and the roots frame it broadcasts
    is at most 2×bound rows),
    union-by-min keeps every root the component
    minimum, so labels are bit-identical on both paths (pinned by
    test); duplicate-heavy corpora whose within-cluster pair volume is
    quadratic still take the star path, which stays O(log n) rounds.
    """
    # ONE feature scan (r10): the r9 shape evaluated the shingle+md5
    # subtree ~4x — the band self-join computes its build subtree on
    # BOTH sides, and the Jaccard verify re-shingled the corpus for
    # each pair side. Materializing (id, __sh, mh0..n) once — the same
    # persisted feature-index posture `incremental_near_dups` uses —
    # lets banding read signatures and the verify read shingles from
    # the spool; the text is scanned exactly once. Semantics are
    # unchanged: near_dup_pairs IS near_dup_pairs_from_sig over this
    # signature frame, and the verify's shingle expression is the
    # identical `shingles(text)` the signature staging carries as __sh.
    feat = _spool(
        minhash_signature(df, text_col, id_col, n_hashes, keep_shingles=True)
    )
    cands = near_dup_pairs_from_sig(
        feat.drop("__sh"), id_col, n_hashes, rows_per_band=rows_per_band
    )
    sh = feat.select(F.col(id_col), F.col("__sh"))
    paired = cands.join(
        sh.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a")), "id_a"
    ).join(
        sh.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b")), "id_b"
    )
    jac = F.size(F.array_intersect("__sh_a", "__sh_b")).cast("double") / F.size(
        F.array_union("__sh_a", "__sh_b")
    ).cast("double")
    edges = (
        paired.filter(jac >= jaccard_threshold)
        .select("id_a", "id_b")
    )

    # Work on edges oriented (a=larger, b=smaller); self-loops dropped.
    # The raw verified pairs are NOT checkpointed separately (r10): the
    # oriented/distinct view is the only consumer — orientation drops
    # only self-loops (which satisfy any label check trivially) and
    # distinct only collapses duplicates, so the star post-check below
    # runs against the oriented view with identical coverage. On the
    # local path the bounded gate collect inside _component_roots is
    # the ONLY evaluation of this subtree; the star path pays the
    # early-exiting probe plus one checkpoint of it.
    e = (
        edges.select(
            F.greatest("id_a", "id_b").alias("a"), F.least("id_a", "id_b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )

    roots, used_local, e_base = _component_roots(e, max_iter, local_cc_max_edges)
    labels = (
        df.select(F.col(id_col).alias("node"))
        .join(
            F.broadcast(roots) if used_local else roots,
            F.col("node") == F.col("a"),
            "left",
        )
        .select("node", F.coalesce(F.col("__root"), F.col("node")).alias("label"))
    )

    if not used_local:
        # Loud post-check against the verified pairs (the checkpointed
        # oriented view — same coverage as the raw pair list, see the
        # orientation comment above): connected endpoints must agree.
        # One join pass over materialized blocks; catches any star-
        # contraction bug as an error instead of an oracle hash
        # mismatch. The local path needs none — union-find agreement on
        # every edge holds by construction (both endpoints resolve
        # through find()), and path equivalence is pinned by randomized
        # test against the star fixpoint.
        la = labels.select(F.col("node").alias("a"), F.col("label").alias("__la"))
        lb = labels.select(F.col("node").alias("b"), F.col("label").alias("__lb"))
        bad = (
            e_base.join(la, "a")
            .join(lb, "b")
            .filter(F.col("__la") != F.col("__lb"))
            .count()
        )
        if bad:
            raise RuntimeError(
                f"dedup_clusters: {bad} verified near-dup edges ended with "
                "differing labels — star contraction produced a wrong fixpoint"
            )
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster"))


def _component_roots(
    e: DataFrame, max_iter: int, local_cc_max_edges: int
) -> tuple[DataFrame, bool, DataFrame | None]:
    """Connected-component root map over an oriented edge frame —
    the CC core of ``dedup_clusters``, factored out so BOTH paths are
    directly testable on arbitrary graphs (randomized equivalence test
    in tests/test_round9_consolidation.py).

    ``e``: (a, b) rows with a > b, distinct, self-loop-free. Returns
    ``(roots, used_local, e_base)``: ``roots`` maps every node
    APPEARING IN AN EDGE to its component minimum as (a, __root) —
    isolated nodes are absent and label themselves via the caller's
    coalesce; ``used_local`` says which path ran, so the caller can
    broadcast the (bounded) local result and skip the star post-check
    where correctness holds by construction; ``e_base`` is the
    CHECKPOINTED oriented edge view on the star path (None on the
    local path) so the caller's post-check reads materialized blocks
    instead of recomputing the LSH-verify subtree. Union-by-min keeps
    every union-find root the component minimum — exactly the
    star-contraction fixed point — so the two paths are
    label-identical.

    Gate shape (r10): ``limit(bound+1).toPandas()`` — ONE bounded job
    that both decides the path and, when local, already holds the
    edges; the r9 shape (count, then collect) evaluated the edge view
    twice on the local path and paid a full count as pure overhead on
    the star path. The probe's driver transfer is capped at bound+1
    rows BY CONSTRUCTION on either path; on the star path it
    early-exits at the cap and the view is then checkpointed once for
    the iteration.

    ``SPARK_GRAFT_CC_FORCE_STAR`` (env) forces the distributed star
    path regardless of edge count, so oracle-verified runs can keep
    the star contraction AND its loud edge-consistency post-check
    exercised even though real post-LSH graphs almost always fit the
    local bound (the guard must not go dormant just because the fast
    path usually wins).
    """
    import os  # noqa: PLC0415

    if os.environ.get("SPARK_GRAFT_CC_FORCE_STAR"):
        local_cc_max_edges = -1
    if local_cc_max_edges >= 0:
        pdf = e.limit(local_cc_max_edges + 1).toPandas()
    if local_cc_max_edges >= 0 and len(pdf) <= local_cc_max_edges:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:
                parent[x], x = root, parent[x]
            return root

        for a_val, b_val in zip(pdf["a"].tolist(), pdf["b"].tolist()):
            ra, rb = find(a_val), find(b_val)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        nodes = sorted(set(pdf["a"].tolist()) | set(pdf["b"].tolist()))
        id_type = e.schema["a"].dataType.simpleString()
        schema = f"a {id_type}, __root {id_type}"
        if not nodes:
            return e.sparkSession.createDataFrame([], schema=schema), True, None
        # pandas in, pandas out: createDataFrame from a pandas frame
        # takes the Arrow batch path — a tuple list would round-trip
        # every row through pickle, ~2M driver objects at the default
        # bound (ADVICE r9).
        import pandas as pd  # noqa: PLC0415

        roots = e.sparkSession.createDataFrame(
            pd.DataFrame({"a": nodes, "__root": [find(n) for n in nodes]}),
            schema=schema,
        )
        return roots, True, None

    # Star path: materialize the oriented view once — iteration base,
    # lineage truncation for the LSH subtree, and the caller's
    # edge-consistency post-check all read these blocks.
    e = _ckpt(e)
    e_base = e
    prev_sig: tuple | None = None
    converged = False
    for _ in range(max_iter):
        # LARGE-STAR over the undirected view: per node u, min neighbor
        # (capped by u itself), rewire strictly-larger neighbors to it.
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("__mn"))
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("a"),
                F.least(F.col("u"), F.col("__mn")).alias("b"),
            )
            .distinct()
        )
        # SMALL-STAR over the larger→smaller orientation: per node a,
        # m = min of its smaller neighbors; a and every smaller
        # neighbor ≠ m rewire to m.
        smins = ls.groupBy("a").agg(F.min("b").alias("__mn"))
        # The convergence signature rides the localCheckpoint job as an
        # OBSERVED metric — one action per round, not two (measured:
        # per-round fixed cost, not data volume, dominates small/shallow
        # graphs). Decimal sum: a long sum of 2^63-scale hashes
        # overflows under ANSI mode; decimal(38,0) absorbs any count.
        from pyspark.sql import Observation  # noqa: PLC0415

        obs = Observation()
        e = (
            ls.join(smins, "a")
            .filter(F.col("b") != F.col("__mn"))
            .select(F.col("b").alias("a"), F.col("__mn").alias("b"))
            .unionAll(smins.select(F.col("a"), F.col("__mn").alias("b")))
            .distinct()
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
            )
        )
        e = _ckpt(e)
        sig = (obs.get["n"], obs.get["h"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"dedup_clusters: star contraction did not reach a fixed point in "
            f"{max_iter} rounds; raise max_iter (needs O(log n) rounds — this "
            "should never trip on real corpora)"
        )

    # At the fixed point e holds (node, component-min) stars; nodes
    # absent from the edge list are singletons labeled by themselves.
    # min(b) per a guards against a transient non-star duplicate.
    return e.groupBy("a").agg(F.min("b").alias("__root")), False, e_base


def simhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_bits: int = 16,
    features: str = "tokens",
) -> DataFrame:
    """Per-document SimHash rendered as an n-bit 0/1 string.

    Bit j is the majority vote over the feature set: a feature votes +1
    iff hex nibble j of its md5 has the high bit set (digit in
    '89abcdef'), and the bit is 1 when +1 votes win strictly.
    ``features`` picks the feature set: 'tokens' (distinct words — the
    classic Charikar setup; weak on template corpora where docs share
    vocabulary) or 'shingles' (3-word shingles — order-sensitive, the
    discriminative choice for near-dup detection).

    Bit j = votes[j] > 0, which equals the 2·hi > n majority rule
    (votes via the codegen'd explode/aggregate in ``_simhash_votes``).
    Integer adds ⇒ order-independent; portable to any engine with md5
    (the DuckDB oracle mirrors it).
    """
    staged = _simhash_votes(df, text_col, id_col, n_bits, features)
    bits = [
        F.when(F.element_at(F.col("__votes"), j) > 0, F.lit("1")).otherwise(F.lit("0"))
        for j in range(1, n_bits + 1)
    ]
    # NULL votes (NULL text → NULL feature set) must yield a NULL
    # simhash, not an all-zeros one — `NULL > 0` is NULL and the
    # otherwise('0') would silently launder it
    return staged.select(
        F.col(id_col),
        F.when(F.col("__votes").isNotNull(), F.concat(*bits)).alias("simhash"),
    )


def _simhash_votes(
    df: DataFrame, text_col: str, id_col: str, n_bits: int, features: str
) -> DataFrame:
    """(id, __votes): the elementwise ±1 vote sums behind both renders.

    One fold over the digest array: each digest contributes an n_bits-
    wide ±1 vote vector, summed elementwise (zip_with inside aggregate)
    — a single map pass, no shuffle, no join. (An explode → groupBy
    n_bits-CASE-sums rewrite was measured 5× SLOWER here despite being
    codegen-friendly: it trades a cheap interpreted fold over ~50
    features/doc for an exchange + final agg + re-join; keep the fold.)
    Integer adds ⇒ fold-order-independent; portable to any engine with
    md5 (the DuckDB oracle mirrors it).
    """
    assert features in ("tokens", "shingles")
    feats = (
        F.array_distinct(tokens(F.col(text_col)))
        if features == "tokens"
        else shingles(F.col(text_col))
    )
    staged = df.select(
        F.col(id_col), F.transform(feats, lambda t: F.md5(t)).alias("__hs")
    )

    def vote_vec(h):
        # h.substr needs Column args for a dynamic position; contains()
        # accepts a Column needle
        return F.transform(
            F.sequence(F.lit(1), F.lit(n_bits)),
            lambda i: F.when(
                F.lit("89abcdef").contains(h.substr(i, F.lit(1))), F.lit(1)
            ).otherwise(F.lit(-1)),
        )

    votes = F.aggregate(
        F.col("__hs"),
        F.array_repeat(F.lit(0), n_bits),
        lambda acc, h: F.zip_with(acc, vote_vec(h), lambda a, b: a + b),
    )
    return staged.select(F.col(id_col), votes.alias("__votes"))


def simhash_long(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_bits: int = 32,
    features: str = "shingles",
) -> DataFrame:
    """SimHash rendered as ONE bigint (bit j of the string render = bit
    n_bits−j of the integer, i.e. the string read MSB-first).

    The integer render is what the pair pipeline wants: Hamming distance
    is a single ``bit_count(a ^ b)`` JVM instruction instead of n_bits
    string compares, and band keys are shift/mask arithmetic (VERDICT r2
    #4). Requires n_bits ≤ 63 (signed long). NULL text → NULL
    fingerprint, same contract as the string render.
    """
    assert n_bits <= 63
    staged = _simhash_votes(df, text_col, id_col, n_bits, features)
    fp = sum(
        (
            F.when(F.element_at(F.col("__votes"), j) > 0, F.lit(1 << (n_bits - j)))
            .otherwise(F.lit(0))
            .cast("long")
            for j in range(1, n_bits + 1)
        ),
        F.lit(0).cast("long"),
    )
    return staged.select(
        F.col(id_col),
        F.when(F.col("__votes").isNotNull(), fp).alias("simhash_fp"),
    )


def incremental_near_dups(
    new: DataFrame,
    index: DataFrame | None,
    text_col: str,
    id_col: str,
    n_hashes: int = 4,
    jaccard_threshold: float = 0.5,
    rows_per_band: int = 1,
    index_features: DataFrame | None = None,
    new_features: DataFrame | None = None,
) -> DataFrame:
    """Incremental dedup: screen a NEW batch against an existing corpus
    index — the posture a production pipeline runs per ingest, where
    re-pairing the full corpus (near_dup_pairs over old ∪ new) would
    redo quadratic-in-corpus work for a linear-in-batch question.

    Plan: MinHash bands for both sides, candidates from the band
    equi-join (new × index only — no new×new, no index×index pairs),
    exact Jaccard verify on candidates, then one per-new-doc reduction:
    candidate count, best-matching index doc (ties at equal Jaccard to
    the lowest index id), and the admit/reject flag. Every new doc
    comes back exactly once (zero-candidate docs with n=0/NULL match),
    so the output is directly the batch admission decision.

    At 100 TB the index side's features are a precomputed artifact
    (signatures band, shingles verify — persisted once, passed in via
    ``index_features``, the frame ``minhash_signature(...,
    keep_shingles=True)`` produces); only the new batch computes
    features from text, and the shuffle carries (id, band) pairs —
    never text. The streaming admission gate
    (`streaming/neardup_stream.py`) exercises exactly that artifact
    handoff; with ``index_features=None`` the features are derived
    from ``index`` in-plan (the batch posture). NULL text → NULL
    signature → no bands (engine-wide contract), surfacing as
    n_candidates=0.
    """
    feats_new = (
        new_features
        if new_features is not None
        else minhash_signature(new, text_col, id_col, n_hashes, keep_shingles=True)
    )
    feats_idx = (
        index_features
        if index_features is not None
        else minhash_signature(index, text_col, id_col, n_hashes, keep_shingles=True)
    )

    assert n_hashes % rows_per_band == 0, "n_hashes must be a multiple of rows_per_band"
    n_bands = n_hashes // rows_per_band

    def bandify(sig: DataFrame, out_id: str) -> DataFrame:
        # b bands of r hashes; r >= 2 is the scale knob: a band admits a
        # candidate only when r hashes agree JOINTLY (the LSH S-curve),
        # which collapses the candidate volume on duplicate-heavy
        # corpora (measured 34M -> ~1/20th at r=2 on a 40-replica
        # probe). F.concat (not concat_ws) so a NULL signature poisons
        # the band key and the row never buckets.
        keys = []
        for j in range(n_bands):
            parts = [F.lit(str(j))]
            for r in range(rows_per_band):
                parts += [F.lit("|"), F.col(f"mh{j * rows_per_band + r}")]
            keys.append(F.concat(*parts))
        return sig.select(
            F.col(id_col).alias(out_id), F.explode(F.array(*keys)).alias("band")
        )

    cand = (
        bandify(feats_new, "id_new")
        .join(bandify(feats_idx, "id_idx"), "band")
        .select("id_new", "id_idx")
        .distinct()
    )
    sh_new = feats_new.select(
        F.col(id_col).alias("id_new"), F.col("__sh").alias("__sa")
    )
    sh_idx = feats_idx.select(
        F.col(id_col).alias("id_idx"), F.col("__sh").alias("__sb")
    )
    inter = F.size(F.array_intersect("__sa", "__sb")).cast("double")
    union = F.size(F.array_union("__sa", "__sb")).cast("double")
    scored = (
        cand.join(sh_new, "id_new")
        .join(sh_idx, "id_idx")
        .select("id_new", "id_idx", F.round(inter / union, 9).alias("__j"))
    )
    w = Window.partitionBy("id_new").orderBy(F.col("__j").desc(), F.col("id_idx").asc())
    best = (
        scored.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("id_new")))
        .filter(F.col("__rn") == 1)
        .select("id_new", "id_idx", "__j", "__n")
    )
    return (
        # anchor on the FEATURES frame (row-preserving projection of
        # `new`): every new doc comes back exactly once, including
        # NULL-text docs (NULL signature → no bands → n_candidates=0),
        # and the anchor works when only new_features was passed
        feats_new.select(F.col(id_col).alias("id_new"))
        .join(best, "id_new", "left")
        .select(
            F.col("id_new").alias(id_col),
            F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_candidates"),
            F.col("id_idx").alias("best_match"),
            F.col("__j").alias("best_jaccard"),
            F.coalesce(F.col("__j") >= jaccard_threshold, F.lit(False)).alias("is_dup"),
        )
    )
