"""Cleaning pipeline (SURVEY.md §2.2 P6–P8, §2.12 Q2).

The reference's ``limpar_dataframe`` (manipulacao-analise-comercial.py:
560-634) is a fixed sequence: prune junk columns → dedupe column names →
drop all-null-key rows → fill defaults → parse dates → drop duplicate
rows by key. Column-name work is driver-side (schema ops, not data ops);
row work is lazy DataFrame transforms that fuse into one scan.

Determinism note: pandas ``drop_duplicates`` keeps the *first* row in
file order (MAC:604-605). Spark has no row order, so ``dedupe_rows``
demands an explicit ordering and implements keep-first with
``row_number() == 1`` — same semantics, reproducible at any parallelism.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _exact(name: str) -> F.Column:
    """Column by exact name — backtick-escaped so dots ("UF.1") are not
    parsed as struct field access."""
    return F.col("`" + name.replace("`", "``") + "`")


def prune_unnamed(df: DataFrame, pattern: str = r"^Unnamed") -> DataFrame:
    """P6: drop columns whose name matches the junk pattern (MAC:569)."""
    rx = re.compile(pattern)
    return df.select(*[_exact(c) for c in df.columns if not rx.match(c)])


def dedupe_column_names(df: DataFrame) -> DataFrame:
    """P7: rename ``col.N`` → ``col`` when the base name is free (MAC:574-584)."""
    out, taken = [], set(df.columns)
    for c in df.columns:
        base = re.sub(r"\.\d+$", "", c)
        if base != c and base not in taken:
            taken.add(base)
            out.append(_exact(c).alias(base))
        else:
            out.append(_exact(c))
    return df.select(*out)


def backfill_columns(df: DataFrame, expected: dict[str, object]) -> DataFrame:
    """P8: add expected-but-absent columns with a default (MAC:1085-1088)."""
    missing = {c: v for c, v in expected.items() if c not in df.columns}
    return df.withColumns({c: F.lit(v) for c, v in missing.items()}) if missing else df


def drop_all_null_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """F7: drop rows where every key column is null (MAC:590)."""
    return df.na.drop(how="all", subset=keys)


def dedupe_rows(df: DataFrame, keys: list[str], order_by: list) -> DataFrame:
    """U3 (deterministic): keep the first row per key under an explicit order.

    Reference drop_duplicates keeps first-in-file-order (MAC:604-605);
    Spark's ``dropDuplicates`` keeps an *arbitrary* row, so when the kept
    row matters we pin it explicitly. Implemented as one ``min_by`` per
    payload column over the same order key — an aggregate with map-side
    partial combine, so duplicates collapse before the shuffle (a
    row_number window would shuffle every row and sort each partition).
    String-typed buffers keep the physical plan a SortAggregate (UnsafeRow
    aggregate buffers must be fixed-size mutable types), but the partial/
    final split and early combine still apply. ``order_by`` must be a
    *total* order within each key group (non-null, no duplicates) — that
    is what makes keep-first deterministic at all, and it also guarantees
    all the per-column min_bys pick the same row.
    """
    payload = [c for c in df.columns if c not in keys]
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    # A bare scalar order key is cheaper to compare in the sort-based
    # fallback than a 1-field struct; composite orders need the struct.
    order_key = order_cols[0] if len(order_cols) == 1 else F.struct(*order_cols)
    kept = df.groupBy(*keys).agg(
        *[F.min_by(_exact(c), order_key).alias(c) for c in payload]
    )
    return kept.select(*[_exact(c) for c in df.columns])


def clean(
    df: DataFrame,
    keys: list[str],
    order_by: list | None = None,
    fill_zero: list[str] | None = None,
    date_cols: list[str] | None = None,
) -> DataFrame:
    """Q2: the full reference cleaning pipeline as one fused transform.

    prune junk cols → dedupe col names → drop all-null-key rows →
    fillna(0) on numerics (MAC:593-597) → lenient date parse (MAC:601)
    → deterministic dedupe on keys (MAC:604-605).
    """
    from ..functions.formatting import parse_date  # noqa: PLC0415

    out = dedupe_column_names(prune_unnamed(df))
    out = drop_all_null_keys(out, [k for k in keys if k in out.columns])
    if fill_zero:
        out = out.na.fill(0, subset=[c for c in fill_zero if c in out.columns])
    for c in date_cols or []:
        if c in out.columns:
            # lenient parse: malformed strings → NULL (errors='coerce',
            # APC:261/MAC:270) — a plain cast would throw under ANSI mode
            out = out.withColumn(c, parse_date(F.col(c)))
    if order_by:
        out = dedupe_rows(out, keys, order_by)
    return out
