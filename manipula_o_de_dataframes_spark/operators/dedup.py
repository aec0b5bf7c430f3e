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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

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
    """Word k-shingles as strings; whole text if fewer than k tokens."""
    toks = tokens(col)
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_distinct(sh)


def minhash(col, seed: int, k: int = SHINGLE_K) -> Column:
    """One min-wise hash: MIN of seed-prefixed md5 over the shingle set."""
    return F.array_min(
        F.transform(shingles(col, k), lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s)))
    )


def minhash_signature(df: DataFrame, text_col: str, id_col: str, n_hashes: int = 4) -> DataFrame:
    """Per-document MinHash signature (n_hashes min-wise hashes).

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
    digests = staged.select(
        F.col(id_col),
        *[
            F.transform(F.col("__sh"), digest_of(g)).alias(f"__hs{g}")
            for g in range(n_groups)
        ],
    )
    return digests.select(
        F.col(id_col),
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
    assert n_hashes % rows_per_band == 0, "n_hashes must be a multiple of rows_per_band"
    n_bands = n_hashes // rows_per_band
    sig = minhash_signature(df, text_col, id_col, n_hashes)
    band_keys = [
        F.concat_ws(
            "|",
            F.lit(str(j)),
            *[F.col(f"mh{j * rows_per_band + k}") for k in range(rows_per_band)],
        )
        for j in range(n_bands)
    ]
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
                (F.col(f"a.mh{s}") == F.col(f"b.mh{s}")).cast("int").alias(f"eq{s}")
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


def simhash(df: DataFrame, text_col: str, id_col: str, n_bits: int = 16) -> DataFrame:
    """Per-document SimHash rendered as an n-bit 0/1 string.

    Bit j is the majority vote over the distinct tokens: a token votes
    +1 iff hex nibble j of md5(token) has its high bit set (digit in
    '89abcdef'), and the bit is 1 when +1 votes win strictly. Pure
    array-filter + length arithmetic — single scan, no shuffle, and
    portable to any engine with md5 (the DuckDB oracle mirrors it).
    """
    def vote(j: int):
        # single-arg lambda: a 2-arg lambda would receive the element INDEX
        # as its second argument from F.filter
        return lambda h: F.instr(F.lit("89abcdef"), h.substr(j, 1)) > 0

    # hash each token ONCE in a staged projection; the per-bit votes read
    # nibbles of the cached digests (md5 inside the bit loop would hash
    # every token n_bits times)
    toks = F.array_distinct(tokens(F.col(text_col)))
    staged = df.select(
        F.col(id_col), F.transform(toks, lambda t: F.md5(t)).alias("__hs")
    )
    n = F.size(F.col("__hs"))
    exprs = []
    for j in range(1, n_bits + 1):
        hi = F.size(F.filter(F.col("__hs"), vote(j)))
        exprs.append(F.when(hi * 2 > n, F.lit("1")).otherwise(F.lit("0")))
    return staged.select(F.col(id_col), F.concat(*exprs).alias("simhash"))
