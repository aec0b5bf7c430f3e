"""Temporal joins the reference (eager pandas) has no counterpart for,
but any time-series user of the engine needs: as-of join and bounded
interval (range) join. North-star surface (SURVEY §2.13).

Scale posture — both avoid the naive O(n·m) expansion:

- ``asof_join`` is the union-merge shape (the kdb/Flink temporal-join
  plan): tag both sides, union, one shuffle on the key, and a running
  ``last(ignorenulls)`` inside each key partition carries the most
  recent right-side row forward onto every left row. Cost is one sort
  per key partition — linear, no candidate pairs ever materialize.
- ``interval_neighbors`` is the bucketed interval join (the streaming-
  systems shape): quantize time into buckets the width of the lookback,
  replicate the build side into (bucket, bucket+1), and equi-join on
  (key, bucket) with the exact interval predicate as a residual filter.
  Each build row is probed by at most two buckets, so the join stays a
  hash join on a compound key instead of a per-key cross product.

Time arithmetic uses ``timestampdiff`` against a fixed NTZ literal, so
bucket boundaries are session-timezone-proof (the driver's tz is
unknown; TIMESTAMP_NTZ never passes through an epoch conversion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Fixed NTZ origin for tz-proof second arithmetic. Any constant works;
# this predates every testdata timestamp.
_EPOCH = "TIMESTAMP_NTZ'1990-01-01 00:00:00'"


def seconds_since_origin(ts_col: str) -> F.Column:
    """Seconds between a fixed NTZ origin and ``ts_col`` (bigint).

    ``unix_timestamp``/casts on TIMESTAMP_NTZ are either rejected or
    session-tz-dependent; ``timestampdiff`` on two NTZ values is pure
    wall-clock arithmetic.
    """
    return F.expr(f"timestampdiff(SECOND, {_EPOCH}, {ts_col})")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    attrs: dict[str, str],
    right_order: str,
) -> DataFrame:
    """For each left row, attach attrs of the latest right row with
    ``right_ts <= left_ts`` for the same ``key`` (NULLs when none).

    ``attrs`` maps output name -> right column. Ties on ``right_ts``
    are broken by the largest ``right_order`` (must be unique within
    (key, right_ts) for a deterministic result). Attr output names and
    the helpers ``__t``/``__side``/``__ord`` must not collide with left
    columns.

    Plan: union the tagged sides, shuffle once on ``key``, and run a
    running ``last(struct-of-attrs, ignorenulls=True)`` over
    rows-unbounded-preceding in (ts, side, order) order — right rows
    sort before left rows at equal ts, which yields the at-or-before
    (<=) semantics. Left rows carry a NULL struct so the running last
    skips them, while a right row's struct is non-null even when its
    attr VALUES are null — null attrs of the latest right row surface
    as nulls instead of resurrecting staler rows. No pair expansion, no
    range predicate, one sort per key partition.
    """
    # All attrs ride in ONE struct: the struct is non-null for every
    # right row even when individual attr values are null, so the
    # running last() always carries the genuinely latest right ROW —
    # per-attr last(ignorenulls) would skip a null attr and resurrect a
    # stale value (and could even mix attrs from different rows).
    # A NULL-ts right row has no position on the time axis — it would
    # sort FIRST under asc (Spark asc = NULLS FIRST) and become the
    # running-last match for any left row that precedes every real right
    # row. Drop them: pandas merge_asof likewise never matches NaT rows.
    # NULL-ts LEFT rows also sort first, see no right rows, and
    # correctly surface NULL attrs.
    r = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(key),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_order).cast("long").alias("__ord"),
        F.struct(*[F.col(src).alias(out) for out, src in attrs.items()]).alias("__rrow"),
    )
    l = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").asc_nulls_first(), "__side", "__ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__last", F.last("__rrow", ignorenulls=True).over(w))
    return (
        u.filter(F.col("__side") == 1)
        .withColumns({out: F.col("__last")[out] for out in attrs})
        .drop("__t", "__side", "__ord", "__rrow", "__last")
    )


def asof_join_directed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    attrs: dict[str, str],
    right_order: str,
    direction: str = "backward",
    tolerance_secs: int | None = None,
) -> DataFrame:
    """``asof_join`` with pandas ``merge_asof``'s direction/tolerance
    knobs (SURVEY §2.13; reference has no temporal joins at all —
    north-star surface).

    - ``backward``: latest right row with ``right_ts <= left_ts``.
    - ``forward``: earliest right row with ``right_ts >= left_ts``.
    - ``tolerance_secs``: attrs become NULL when the matched row is
      more than this many seconds away (pandas ``tolerance``).

    Ties on ``right_ts`` break to the largest ``right_order`` in both
    directions (must be unique within (key, right_ts)).

    Same union-merge plan as ``asof_join`` — one shuffle on ``key``,
    a running last(ignorenulls) per key partition, no candidate pairs —
    with the scan order reversed for ``forward`` (descending ts: the
    last right row seen at-or-above a left row is the nearest future
    one). Tolerance is a post-extraction NULL-out of the carried
    struct, not a join predicate, so the plan shape is unchanged.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # NULL-ts rows have no position on the time axis. Right side: drop
    # them (pandas merge_asof never matches NaT). Left side: place NULLs
    # FIRST under BOTH scan orders — Spark's desc default is NULLS LAST,
    # which would let a forward-direction NULL-ts left row sort after
    # every right row and inherit the key's earliest right row as a
    # bogus match; nulls-first makes it see nothing → NULL attrs.
    r = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(key),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_order).cast("long").alias("__ord"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(src).alias(out) for out, src in attrs.items()],
        ).alias("__rrow"),
    )
    l = left.withColumn("__t", F.col(left_ts)).withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    ts_order = (
        F.col("__t").asc_nulls_first()
        if direction == "backward"
        else F.col("__t").desc_nulls_first()
    )
    w = (
        Window.partitionBy(key)
        .orderBy(ts_order, F.col("__side").asc(), F.col("__ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__last", F.last("__rrow", ignorenulls=True).over(w))
    if tolerance_secs is not None:
        # Compare at MICROSECOND precision: timestampdiff(SECOND, …)
        # truncates, so a match 3600.5 s away would survive a 3600 s
        # tolerance — off-by-up-to-1s vs the pandas merge_asof contract
        # (and vs any exact-interval oracle; a real fixture row sat in
        # that gap at sf0.1).
        gap = (
            F.expr(f"timestampdiff(MICROSECOND, __last.__rts, {left_ts})")
            if direction == "backward"
            else F.expr(f"timestampdiff(MICROSECOND, {left_ts}, __last.__rts)")
        )
        u = u.withColumn(
            "__last",
            F.when(gap <= F.lit(int(tolerance_secs) * 1_000_000), F.col("__last")),
        )
    return (
        u.filter(F.col("__side") == 1)
        .withColumns({out: F.col("__last")[out] for out in attrs})
        .drop("__t", "__side", "__ord", "__rrow", "__last")
    )


def interval_neighbors(
    df: DataFrame,
    key: str,
    ts: str,
    lookback_secs: int,
) -> DataFrame:
    """Per row: count of same-``key`` rows strictly earlier within
    ``(ts - lookback, ts)`` — the bounded-interval self-join.

    Contract: rows must be unique (a row id column suffices — the
    count groups by every input column, so full-duplicate rows would
    collapse), and pass a NARROW projection (id, key, ts): the group-by
    key is the whole row, so every selected column rides the shuffle.

    Build side is replicated into its own bucket and the next one
    (a row at time t can only precede probes in buckets b(t) and
    b(t)+1 when the bucket width equals the lookback), probe joins on
    its single bucket, and the exact interval predicate filters the
    at-most-two candidate buckets. The two copies of a build row live
    in different buckets, so no pair is counted twice.
    """
    secs = seconds_since_origin(ts)
    bucket = F.floor(secs / F.lit(lookback_secs))
    build = df.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__bts"),
        F.explode(F.array(bucket, bucket + 1)).alias("__bbucket"),
    )
    probe = df.withColumn("__bucket", bucket)
    joined = probe.join(
        build,
        on=[
            probe[key] == build["__k"],
            probe["__bucket"] == build["__bbucket"],
            build["__bts"] < probe[ts],
            build["__bts"] >= probe[ts] - F.expr(f"INTERVAL {lookback_secs} SECONDS"),
        ],
        how="left",
    )
    group_cols = [probe[c] for c in df.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(F.count(build["__bts"]).alias("__n"))
        .withColumnRenamed("__n", "n_vizinhos")
    )
