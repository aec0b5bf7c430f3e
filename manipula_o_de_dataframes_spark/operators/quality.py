"""Data-quality / metadata diagnostics (SURVEY.md §2.12, Q1/Q3).

The reference surfaces correctness to a human (diagnosticar_dados,
MAC:519-557; join-compatibility report MAC:726-774). Here they are
single-pass aggregate plans: per-column null counts are ONE scan with N
conditional counts (not N scans), and the join report reuses the J5
anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .joins import unmatched_keys


def null_report(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Q1: per-column null counts in one pass (MAC:531)."""
    cols = columns or df.columns
    return df.agg(
        *[F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls") for c in cols],
        F.count(F.lit(1)).alias("total_rows"),
    )


def required_columns_check(df: DataFrame, required: list[str]) -> dict[str, bool]:
    """Q1: required-column presence (MAC:252-266) — schema op, driver-side."""
    have = set(df.columns)
    return {c: c in have for c in required}


def join_compatibility(facts: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Q3: unmatched-key count and percentage (MAC:726-774)."""
    total = facts.select(key).distinct().count()
    missing = unmatched_keys(facts, dim, key).count()
    spark = facts.sparkSession
    pct = (100.0 * missing / total) if total else 0.0
    return spark.createDataFrame(
        [(key, total, missing, pct)],
        "key string, fact_keys long, unmatched long, unmatched_pct double",
    )
