"""Deterministic sampling & dataset-split operators (north-star surface).

No reference counterpart (the reference is a sales-analytics toolkit);
these are the corpus-assembly operators a training-data pipeline runs
before anything else: carve a frozen train/val/test split and draw
reproducible per-stratum samples.

Determinism is the whole point — a split must be a pure function of the
row key so that (a) re-running the pipeline on a grown corpus keeps old
rows in their old splits, and (b) any engine (Spark here, DuckDB in the
oracle) computes the same assignment. Both operators therefore key on
``md5(id)`` *hex prefixes* compared lexicographically: fixed-width hex
compare ≡ numeric compare, and md5 is bit-identical everywhere, so no
engine-specific hash or RNG leaks into results.

Scale shape: ``hash_split`` is a pure projection (zero shuffle — at
100 TB it fuses into the scan); ``stratified_sample`` is a per-stratum
top-N (one shuffle on the stratum key; skew-safe for any stratum that
fits a partition's sort, which lang/source-sized strata do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Split boundaries as 2-hex-char md5 prefixes (256 buckets).
# 'cc' = 204/256 = 79.7% train; 'e6' = 230/256 → 10.2% val; rest test.
DEFAULT_BOUNDS = (("train", "cc"), ("val", "e6"))


def split_col(id_col, bounds=DEFAULT_BOUNDS, fallback: str = "test"):
    """Split-assignment expression: md5-bucket the row key.

    ``bounds`` is an ordered list of (label, exclusive upper 2-hex-char
    bound); the first bound whose prefix exceeds the row's md5 prefix
    wins, else ``fallback``. Pure Column expression — codegen-able,
    no shuffle, no RNG.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    prefix = F.substring(F.md5(c.cast("string")), 1, 2)
    out = F.lit(fallback)
    for label, upper in reversed(bounds):
        out = F.when(prefix < F.lit(upper), F.lit(label)).otherwise(out)
    return out


def hash_split(df: DataFrame, id_col: str, bounds=DEFAULT_BOUNDS) -> DataFrame:
    """Attach a deterministic ``split`` column keyed on md5(id)."""
    return df.withColumn("split", split_col(id_col, bounds))


def stratified_sample(
    df: DataFrame, strata_col: str, id_col: str, n_per_stratum: int
) -> DataFrame:
    """Reproducible sample of N rows per stratum: the N smallest
    md5(id) values in each stratum (id as the total-order tiebreak).

    Hash order is uncorrelated with any data column, so this is an
    unbiased-in-practice sample that is stable across runs, engines,
    and corpus growth (a doc stays sampled until N smaller hashes
    arrive in its stratum). Plans as a per-stratum TopK window —
    rank over partitionBy(stratum) — one shuffle on the stratum key.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )
