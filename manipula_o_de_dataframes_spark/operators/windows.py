"""Window semantics (SURVEY.md §2.6, W1–W3; A7/A8).

The ABC cumulative window is *global* (unpartitioned). That is safe by
construction: it always runs on the post-aggregation customer table
(|customers| rows), never on raw facts — at 100 TB the window input is
still only as wide as the customer dimension (SURVEY §4.2). For
pathological cardinality the documented scale-out is two-pass
(per-partition sums → broadcast prefix offsets); not needed here.

Determinism: cumulative sums run over DECIMAL inputs (exact, so the
running values are identical regardless of how the engine associates
the additions) and every ORDER BY carries a unique tie-break column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.formatting import MONEY


def rank_desc(value, tiebreak: list | None = None) -> Column:
    """W1: SQL RANK() ≡ pandas rank(ascending=False, method='min') (APC:103)."""
    order = [F.col(value).desc() if isinstance(value, str) else value.desc()]
    return F.rank().over(Window.orderBy(*order)).cast("long")


def abc_bucket(cum_pct) -> Column:
    """W3: ABC bucketing on cumulative percent (APC:92-94, MAC:482-485).

    <=80 → 'A'; <=95 → 'B'; else 'C'. The reference's two variants
    (apply-lambda vs .loc masks) are semantically identical.
    """
    c = F.col(cum_pct) if isinstance(cum_pct, str) else cum_pct
    return F.when(c <= 80, "A").when(c <= 95, "B").otherwise("C")


def with_pct_and_cum(
    df: DataFrame,
    value_dec: str,
    pct_col: str = "percentual",
    cum_col: str = "percentual_acumulado",
    tiebreak: str | None = None,
) -> DataFrame:
    """A7+A8: percent-of-total and running cumulative percent.

    ``value_dec`` must be a DECIMAL column (exact). Grand total via an
    empty-frame window sum (one broadcast-style exchange over the small
    aggregated input); cumulative via a global ordered window with a
    unique tie-break. Both stay in decimal until the final double cast,
    so the doubles are bit-reproducible.
    """
    order = [F.col(value_dec).desc()] + ([F.col(tiebreak)] if tiebreak else [])
    w_all = Window.partitionBy()
    w_cum = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grand = F.sum(value_dec).over(w_all)
    cum = F.sum(value_dec).over(w_cum)
    return df.withColumns(
        {
            pct_col: F.col(value_dec).cast("double") / grand.cast("double") * 100,
            cum_col: cum.cast("double") / grand.cast("double") * 100,
        }
    )
