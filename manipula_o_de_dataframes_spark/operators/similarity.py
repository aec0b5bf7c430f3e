"""Similarity search over embedding columns (north-star surface).

Embeddings are ``array<float>`` columns. All vector math happens in
JVM-side higher-order functions (``zip_with`` + ``aggregate``) — no
Python, no UDF serde, stays in whole-stage codegen. Floats are cast to
double *before* any arithmetic and folds run in array order, so results
are bit-reproducible across engines.

Two strategies, as the north star asks:

- **brute-force top-k** — broadcast the query vector, one scan computing
  cosine, TakeOrderedAndProject for the top-k. The exact baseline; at
  100 TB this is one full scan, embarrassingly parallel, zero shuffle.
- **sign-LSH bucketed** — quantize each vector to a bucket key from the
  sign bits of its leading dimensions (a fixed, data-independent set of
  hyperplanes), shuffle only within buckets, search inside the probe's
  bucket. Trades recall for touching ~1/2^b of the data — the IVF-style
  scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    """Dot product of two float arrays, folded in order, in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a) -> Column:
    """L2 norm in double."""
    sq = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.sqrt(sq)


def cosine(a, b) -> Column:
    """Cosine similarity, rounded to 9 dp to absorb fold-order ulps."""
    return F.round(dot(a, b) / (norm(a) * norm(b)), 9)


def brute_force_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_id: int,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k against the vector with id ``query_id``.

    The 1-row query side is broadcast (a crossJoin with a broadcast hint
    → BroadcastNestedLoopJoin over one row ≡ a map-side constant); the
    scan side never shuffles and top-k plans as TakeOrderedAndProject.
    """
    q = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("__qv"))
    scored = (
        df.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), cosine(F.col(vec_col), F.col("__qv")).alias("cos_sim"))
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def batch_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_ids: list[int],
    k: int = 10,
) -> DataFrame:
    """Multi-probe exact ANN: per-query cosine top-k in ONE scan.

    The real serving shape — Q probes at once, not one query per job.
    The probe set broadcasts (Q rows); each data row scores against all
    Q probes inside one map stage. The Q× fan-out exists only as
    (query_id, id, score) triples — the shuffle for the per-probe
    top-k carries ~24-byte tuples, never vectors, and the window
    partitions by query_id so the k-selection runs Q-wide in parallel.
    """
    q = df.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    scored = (
        df.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col),
            cosine(F.col(vec_col), F.col("__qv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def sign_bucket(vec, n_bits: int = 6) -> Column:
    """Sign-LSH bucket key: '1'/'0' per leading dimension's sign."""
    bits = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)


def lsh_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_id: int,
    k: int = 10,
    n_bits: int = 6,
) -> DataFrame:
    """Approximate top-k: search only the query's sign-LSH bucket.

    Same scoring as brute force but the scan is pre-filtered to the
    probe bucket — at scale the bucket key is a partition/cluster column
    so the filter prunes files before any I/O.
    """
    with_b = df.withColumn("__bucket", sign_bucket(F.col(vec_col), n_bits))
    q = with_b.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qv"), F.col("__bucket").alias("__qb")
    )
    scored = (
        with_b.crossJoin(F.broadcast(q))
        .filter((F.col("__bucket") == F.col("__qb")) & (F.col(id_col) != query_id))
        .select(F.col(id_col), cosine(F.col(vec_col), F.col("__qv")).alias("cos_sim"))
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def bucket_histogram(df: DataFrame, vec_col: str, n_bits: int = 6) -> DataFrame:
    """Bucket occupancy report — the recall/selectivity tuning view."""
    return (
        df.withColumn("bucket", sign_bucket(F.col(vec_col), n_bits))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
) -> DataFrame:
    """Exact all-pairs embedding near-dup: id_a < id_b, cosine ≥ threshold.

    The O(n²) correctness baseline. Norms are computed once per row
    *before* the pair join (n norm folds, not 2n²), then each pair costs
    one dot product; the build side is broadcast so the probe side never
    shuffles. At 100 TB use ``cosine_near_dup_blocked`` — same scoring
    expression, candidates from sign-bucket equality, candidate set
    shrinks ~2^bits. Precomputing norms does not change the float
    result: the per-pair expression round(dot/(na*nb), 9) performs the
    identical operations.
    """
    withn = df.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("__n")
    )
    a = withn.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = withn.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    scored = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 9
            ).alias("cos_sim"),
        )
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def cosine_near_dup_blocked(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    n_bits: int = 6,
) -> DataFrame:
    """Blocked embedding near-dup: candidates from sign-LSH bucket
    equality, scored with the EXACT same expression as the all-pairs
    baseline (round(dot/(na·nb), 9) ≥ threshold).

    This is the 100 TB shape the baseline's docstring promises: instead
    of an O(n²) cartesian, pairs join on the sign_bucket key — an
    equi-join that shuffles each (id, vec, norm, bucket) row once and
    scores only within-bucket pairs, ~n²/2^bits of the pair space.
    Recall < 1 by construction (a near-dup pair split across buckets is
    never scored — that is the deal LSH makes); precision is exact
    because surviving pairs are scored with the full cosine. Norms are
    computed once per row before the pair join, identical to the
    baseline, so matched pairs carry bit-identical cos_sim.
    """
    withb = df.select(
        F.col(id_col),
        F.col(vec_col),
        norm(F.col(vec_col)).alias("__n"),
        sign_bucket(F.col(vec_col), n_bits).alias("__b"),
    )
    a = withb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__n").alias("__na"),
        F.col("__b").alias("__ba"),
    )
    b = withb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__n").alias("__nb"),
        F.col("__b").alias("__bb"),
    )
    scored = a.join(
        b, (F.col("__ba") == F.col("__bb")) & (F.col("id_a") < F.col("id_b"))
    ).select(
        "id_a",
        "id_b",
        F.round(
            dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")), 9
        ).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def fixed_centroids(k: int = 4, dims: int = 64) -> list[tuple[int, list[float]]]:
    """Deterministic literal centroids shared by the ``kmeans_assign``
    query and its DuckDB oracle (oracles.py renders its VALUES list from
    this same function, so the constants cannot drift): values
    ((cid·31 + i·7) mod 13 − 6)/6 ∈ [−1, 1] — small dyadic-free
    rationals that parse/print identically in both engines."""
    return [
        (cid, [((cid * 31 + i * 7) % 13 - 6) / 6.0 for i in range(dims)])
        for cid in range(k)
    ]


def ivf_cell_spec(vec, centroids: list[tuple[int, list[float]]]) -> Column:
    """Column-API executable spec of ``ivf_cell`` (argmax-cosine
    centroid, ties to the lowest cid, running ``greatest`` over
    (cosine, −cid) structs — lexicographic struct order makes max
    cosine win and the smaller cid win ties). The production
    ``ivf_cell`` renders the identical operations as SQL text; a test
    pins the two bit-equal so the fast path cannot drift."""
    best = None
    for cid, cvec in centroids:
        lit_vec = F.array(*[F.lit(float(x)) for x in cvec])
        cand = F.struct(
            cosine(vec, lit_vec).alias("cc"), F.lit(-cid).alias("neg_cid")
        )
        best = cand if best is None else F.greatest(best, cand)
    return (-best["neg_cid"]).cast("int")


def _cosine_sql(a_sql: str, b_sql: str) -> str:
    """``cosine`` rendered as SQL text — the same zip_with/aggregate
    fold in the same order, so parsed values are bit-equal."""
    dot = (
        f"aggregate(zip_with({a_sql}, {b_sql}, (x, y) -> "
        f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )
    na = (
        f"sqrt(aggregate(transform({a_sql}, x -> "
        f"CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0.0D, (acc, x) -> acc + x))"
    )
    nb = (
        f"sqrt(aggregate(transform({b_sql}, x -> "
        f"CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0.0D, (acc, x) -> acc + x))"
    )
    return f"round({dot} / ({na} * {nb}), 9)"


def ivf_cell(vec, centroids: list[tuple[int, list[float]]]) -> Column:
    """IVF cell id: argmax-cosine centroid, ties broken to the lowest cid.

    Centroids are a driver-side model artifact (k rows by construction —
    the output of k-means training), inlined as literal arrays so that
    assignment is a pure map-side expression: zero shuffle, inside
    whole-stage codegen, and file-prunable once the cell is written as a
    partition column at ingest. Implemented as a running ``greatest``
    over (cosine, -cid) structs — struct comparison is lexicographic, so
    max cosine wins and the smaller cid wins ties. Rendered as one SQL
    string parsed by a single ``F.expr`` (a k×dims Column build is
    hundreds of py4j round-trips of driver overhead per plan — the
    ``_score_sql`` profile); ``ivf_cell_spec`` is the Column-API spec
    the bit-identity test pins this against.
    """
    vec_sql = _vec_sql(vec)
    best = None
    for cid, cvec in centroids:
        arr = "array(" + ", ".join(_dlit(float(x)) for x in cvec) + ")"
        cand = (
            f"named_struct('cc', {_cosine_sql(vec_sql, arr)}, "
            f"'neg_cid', {-cid})"
        )
        best = cand if best is None else f"greatest({best}, {cand})"
    return F.expr(f"CAST(-(({best}).neg_cid) AS INT)")


def kmeans_lite(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Lloyd's k-means over an embedding column, Spark-iteration style.

    Each training round is ONE Arrow-batched ``mapInPandas`` pass that
    emits per-partition partials — (cell, count, sum-vector), i.e.
    p×k rows of d+2 numbers — combined into new centroids on the
    driver; the loop lives on the driver. Init = the first k vectors by
    id (deterministic).

    Why the Python escape hatch in *training*: the all-expression
    variant (k×d centroid literals + d avg() buffers) re-compiles
    whole-stage codegen on every iteration because the literals change,
    and at 64 dims the compile dominates the pass (measured ~2.6 s/iter
    vs ~0.3 s for the numpy partials at sf0.1). The *serving* path —
    final assignment — keeps the zero-shuffle ``ivf_cell`` literal
    expression, compiled once. Row-level float math is reassociation-
    sensitive either way, so cluster quality is stable but boundary
    assignments are implementation-defined — hence no value-hash oracle
    (rows-only check).
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    init = (
        df.filter(F.col(id_col) < k).select(id_col, vec_col).orderBy(id_col).collect()
    )
    cids = [int(r[0]) for r in init]
    cmat = np.array([[float(x) for x in r[1]] for r in init])  # k×d
    for _ in range(iters):
        cunit = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

        def partials(batches, cunit=cunit, n_cells=len(cids)):
            for pdf in batches:
                if not len(pdf):
                    continue
                vecs = np.stack(pdf["__v"].to_numpy())
                # |v| is constant per row → argmax cosine ≡ argmax dot
                # with unit centroids; np.argmax ties to the lowest
                # index = lowest cid, matching ivf_cell's tie rule.
                cell = np.argmax(vecs @ cunit.T, axis=1)
                sums = np.zeros((n_cells, vecs.shape[1]))
                np.add.at(sums, cell, vecs)
                cnts = np.bincount(cell, minlength=n_cells)
                live = np.flatnonzero(cnts)
                yield pd.DataFrame(
                    {"cell": live, "n": cnts[live], "s": list(sums[live])}
                )

        rows = (
            df.select(F.col(vec_col).alias("__v"))
            .mapInPandas(partials, "cell int, n long, s array<double>")
            .collect()
        )
        tot_n = np.zeros(len(cids))
        tot_s = np.zeros_like(cmat)
        for r in rows:
            tot_n[r["cell"]] += r["n"]
            tot_s[r["cell"]] += np.array(r["s"])
        live = tot_n > 0
        cmat[live] = tot_s[live] / tot_n[live, None]  # empty cell keeps its centroid
    cents = [(cid, [float(x) for x in cmat[i]]) for i, cid in enumerate(cids)]
    return df.withColumn("cell", ivf_cell(F.col(vec_col), cents)).select(
        F.col(id_col), F.col("cell")
    )


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_id: int,
    k: int = 10,
    n_centroids: int = 8,
) -> DataFrame:
    """IVF-style ANN: assign every vector to a cell, search only the
    query's cell.

    Deterministic stand-in for k-means training: the vectors with
    id < n_centroids serve as centroids (a bounded driver-side collect,
    exactly how trained centroids would arrive). Search touches ~1/k of
    the data; the exact baseline is ``brute_force_topk``.
    """
    cents = [
        (r[0], list(r[1]))
        for r in df.filter(F.col(id_col) < n_centroids)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    ]
    cells = df.withColumn("__cell", ivf_cell(F.col(vec_col), cents))
    q = cells.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("__qv"), F.col("__cell").alias("__qc")
    )
    scored = (
        cells.crossJoin(F.broadcast(q))
        .filter((F.col("__cell") == F.col("__qc")) & (F.col(id_col) != query_id))
        .select(F.col(id_col), cosine(F.col(vec_col), F.col("__qv")).alias("cos_sim"))
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


# --- product quantization (Jégou, Douze & Schmid 2011) --------------------


def pq_codebook(
    n_sub: int = 8, n_codes: int = 16, sub_dims: int = 8
) -> list[tuple[int, int, list[float]]]:
    """Deterministic literal PQ codebook shared by the ``pq_codes`` /
    ``pq_topk`` queries and their DuckDB oracles (oracles.py renders its
    VALUES list from this same function, so the constants cannot
    drift — the ``fixed_centroids`` convention).

    Rows are (subspace m, code c, sub_dims-dim centroid). Values
    ((m·29 + c·31 + i·7) mod 23 − 11)/11 ∈ [−1, 1]; 31 is invertible
    mod 23, so all 16 codes within a subspace have distinct centroids
    (no degenerate argmin ties by construction — and if a tie ever did
    occur, both engines break it to the lowest code).
    """
    return [
        (m, c, [((m * 29 + c * 31 + i * 7) % 23 - 11) / 11.0 for i in range(sub_dims)])
        for m in range(n_sub)
        for c in range(n_codes)
    ]


def _sub_score(vec, start: int, centroid: list[float]) -> Column:
    """The FACTORED argmin key: ‖c‖² − 2·x·c, rounded to 9 dp.

    Ordering-equivalent to the squared distance (they differ by the
    per-(vector, subspace) constant ‖x‖², so equal scores ⇔ equal
    distances pre-round), with ~40% fewer expression nodes. ‖c‖² is a
    Python-summed literal (left-assoc IEEE doubles, identical to the
    oracle's rendered constant); the dot product sums left-associated
    in element order.

    This Column-API builder is the EXECUTABLE SPEC: ``pq_code``/
    ``pq_adc`` render the same expression as a SQL string (one
    ``F.expr`` parse instead of ~25 py4j round-trips per candidate —
    see ``_score_sql``), and a property test asserts the two forms are
    bit-identical on real vectors, so the fast path can never drift
    from this definition.
    """
    c2 = None
    for c in centroid:
        c2 = c * c if c2 is None else c2 + c * c
    dot = None
    for i, c in enumerate(centroid):
        t = F.element_at(vec, start + i + 1).cast("double") * F.lit(float(c))
        dot = t if dot is None else dot + t
    return F.round(F.lit(float(c2)) - F.lit(2.0) * dot, 9)


def _vec_sql(vec) -> str:
    """Resolve the vector argument of a SQL-rendered expression to a
    backquoted column reference. Accepts a column NAME (str) or a
    plain named Column (``F.col("embedding")``); anything else —
    derived Columns, dotted paths — is a loud error, because
    ``_jc.toString()`` of a non-attribute Column is not valid SQL and
    an unquoted reserved word ('order') would misparse silently."""
    import re as _re  # noqa: PLC0415

    name = vec if isinstance(vec, str) else vec._jc.toString()
    if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(
            "SQL-rendered vector expressions need a simple column name; "
            f"got {name!r} — select/alias the vector to a plain column first"
        )
    return f"`{name}`"


def _dlit(x: float) -> str:
    """Render a Python float as a Spark SQL DOUBLE literal: ``repr``
    is the shortest round-trip decimal and Java's parseDouble is
    correctly rounded, so the parsed double is bit-identical to the
    ``F.lit(float(x))`` the Column API would build. The ``D`` suffix
    forces DOUBLE — a bare decimal literal would parse as DECIMAL.
    Non-finite values are a loud error: ``repr`` gives 'inf'/'nan',
    which the SQL lexer would reject with a far less useful message
    (and no PQ/IVF model artifact may legitimately contain them)."""
    v = float(x)
    if v != v or v in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite model constant cannot be inlined: {v!r}")
    return f"{v!r}D"


def _score_sql(vec_sql: str, start: int, centroid: list[float]) -> str:
    """``_sub_score`` rendered as SQL text — same operations in the
    same left-associated order, so the analyzed expression tree (and
    therefore every generated double) is identical to the Column form.

    Why text: building the 8×16-candidate argmin through the Column
    API costs ~4k py4j round-trips ≈ 6.6 s of DRIVER time per plan —
    profiled at sf0.1: expression build 6.61 s, Catalyst plan 0.11 s,
    execution 0.15 s. The r4 bench blamed Janino compile for the ~7 s
    PQ constant; the profile shows codegen was innocent — the cost was
    Python building Columns one JVM call at a time. One ``F.expr``
    parse of the rendered string is ~30 ms for the whole plan.
    """
    c2 = None
    for c in centroid:
        c2 = c * c if c2 is None else c2 + c * c
    dot = " + ".join(
        f"(CAST(element_at({vec_sql}, {start + i + 1}) AS DOUBLE) * {_dlit(c)})"
        for i, c in enumerate(centroid)
    )
    return f"round({_dlit(c2)} - 2.0D * ({dot}), 9)"


def _pq_code_sql(
    vec_sql: str, m: int, codebook: list[tuple[int, int, list[float]]]
) -> str:
    """``pq_code`` as SQL text (see ``_score_sql`` for why text)."""
    rows = [(c, cv) for (mm_, c, cv) in codebook if mm_ == m]
    sub_dims = len(rows[0][1])
    structs = ", ".join(
        f"named_struct('d', {_score_sql(vec_sql, m * sub_dims, cv)}, 'c', {c})"
        for c, cv in rows
    )
    return f"CAST((least({structs})).c AS INT)"


def pq_code(
    vec, m: int, codebook: list[tuple[int, int, list[float]]]
) -> Column:
    """The subspace-``m`` PQ code: argmin (rounded, factored) distance
    score over that subspace's literal centroids, ties to the lowest
    code. ``vec`` is a column name (or a simple named Column).

    A pure map-side expression (zero shuffle, whole-stage codegen) — at
    100 TB encoding is a single scan that compresses each vector to
    n_sub small ints, the representation ADC search and storage use.
    Implemented as a running ``least`` over (score, code) structs —
    lexicographic struct order makes min-score win and the lower code
    win ties, matching the oracle's ORDER BY score, code. Rendered as
    one SQL string and parsed once (``_score_sql`` explains the ~6.6 s
    of py4j round-trips this avoids per plan).
    """
    vec_sql = _vec_sql(vec)
    return F.expr(_pq_code_sql(vec_sql, m, codebook))


def pq_distance_table(
    query: list[float], codebook: list[tuple[int, int, list[float]]]
) -> dict[int, list[float]]:
    """The per-query ADC lookup table: for each subspace m, the squared
    L2 distance from the query's slice to each of the 16 sub-centroids —
    computed ONCE per query on the driver (8×16 doubles; the same
    bounded-model-artifact posture as collecting k-means centroids),
    which is exactly how production ADC works: the table is built per
    query, the billion-row scan does lookups only.

    Python floats are IEEE doubles and the sum is left-associated in
    element order, so each entry is bit-identical to the in-plan
    expression the DuckDB oracle computes from the embeddings table
    (rounding to 9 dp happens in the ENGINE via F.round on the literal,
    keeping HALF_UP semantics aligned with DuckDB — Python's round()
    half-even is never used).
    """
    n_sub = max(m for m, _, _ in codebook) + 1
    sub_dims = len(codebook[0][2])
    table: dict[int, list[float]] = {}
    for m in range(n_sub):
        rows = [(c, cv) for (mm_, c, cv) in codebook if mm_ == m]
        dists = []
        for _c, cv in rows:
            s = None
            for i, cval in enumerate(cv):
                d = float(query[m * sub_dims + i]) - cval
                s = d * d if s is None else s + d * d
            dists.append(s)
        table[m] = dists
    return table


def pq_adc(
    data_vec,
    query: list[float],
    codebook: list[tuple[int, int, list[float]]],
) -> Column:
    """Asymmetric-distance (ADC) estimate of ‖query − data‖²: per
    subspace, the code the DATA vector quantizes to (``pq_code``) is
    looked up in the precomputed query→centroid distance table
    (``pq_distance_table``); the 8 rounded terms sum in fixed subspace
    order.

    The scan side therefore pays ONLY the code argmin plus 8 literal-
    array lookups per row — no query-side float math replicated across
    the corpus (an earlier in-plan formulation computed the query
    distances per data row, doubling the fold count for a value that is
    constant per query; the lookup-table form matches both the FAISS
    design and the oracle's CTE exactly).
    """
    n_sub = max(m for m, _, _ in codebook) + 1
    table = pq_distance_table(query, codebook)
    vec_sql = _vec_sql(data_vec)
    terms = []
    for m in range(n_sub):
        lut = ", ".join(f"round({_dlit(v)}, 9)" for v in table[m])
        terms.append(
            f"element_at(array({lut}), ({_pq_code_sql(vec_sql, m, codebook)}) + 1)"
        )
    return F.expr(" + ".join(f"({t})" for t in terms))


def exact_sqdist(vec, query: list[float]) -> Column:
    """Exact squared L2 distance to a literal query vector — the
    full-scan audit arm beside ADC. Rendered as SQL text for the same
    reason as ``_score_sql`` (a 64-dim unrolled Column build is ~256
    py4j round-trips of pure driver overhead per plan); the parsed
    tree performs the identical left-associated (x−q)·(x−q) sum, so
    values are bit-equal to the Column form and the DuckDB mirror."""
    vec_sql = _vec_sql(vec)
    terms = " + ".join(
        f"((CAST(element_at({vec_sql}, {i + 1}) AS DOUBLE) - {_dlit(q)}) * "
        f"(CAST(element_at({vec_sql}, {i + 1}) AS DOUBLE) - {_dlit(q)}))"
        for i, q in enumerate(query)
    )
    return F.expr(terms)


def adc_from_codes(
    table: dict[int, list[float]], code_prefix: str = "code_"
) -> Column:
    """ADC distance over ALREADY-ENCODED code columns (the serve path:
    8 one-byte lookups per row, the embedding column never scanned).
    ``table`` is ``pq_distance_table``'s per-query artifact; each
    subspace term is an ``element_at`` into a literal 16-float array
    indexed by the stored code, summed in fixed subspace order —
    rendered as one SQL expression (see ``_score_sql``)."""
    terms = []
    for m in sorted(table):
        lut = ", ".join(f"round({_dlit(v)}, 9)" for v in table[m])
        terms.append(f"(element_at(array({lut}), {code_prefix}{m} + 1))")
    return F.expr(" + ".join(terms))
