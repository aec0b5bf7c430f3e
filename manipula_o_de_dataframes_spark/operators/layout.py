"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB the scan is the query cost, and file/row-group skipping is
what keeps it sublinear: parquet stores per-file and per-row-group
min/max stats, and a reader prunes any unit whose [min, max] misses the
predicate. A layout sorted on ONE column prunes perfectly on that
column and not at all on any other; interleaving the bits of several
columns into one Morton key and range-partitioning + sorting on it
bounds every file's extent in EVERY interleaved dimension — the same
technique Delta Lake's OPTIMIZE ZORDER BY and Iceberg's sort orders
expose (public docs), built here from plain Spark primitives.

The z-value is pure JVM-side bit arithmetic (shift/mask/or — inside
whole-stage codegen, no UDF), so it mirrors exactly in any engine with
integer bit ops; the layout write is repartitionByRange + in-partition
sort, both standard shuffles.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list, bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column.

    Each input is masked to ``bits`` bits first (dimensions beyond the
    mask fold together — acceptable for layout, where the key only has
    to CORRELATE with the dimensions). len(cols)*bits must fit a signed
    long. NULL in any dimension → NULL key (sorts first, clustering all
    null rows together).
    """
    n = len(cols)
    assert n * bits <= 63, "z-value must fit a signed long"
    mask = F.lit((1 << bits) - 1)
    terms = []
    for k, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("long").bitwiseAND(mask)
        terms += [
            F.shiftleft(F.shiftright(cc, i).bitwiseAND(F.lit(1)), i * n + k)
            for i in range(bits)
        ]
    return reduce(lambda a, b: a + b, terms).cast("long")


def zorder_write(
    df: DataFrame, cols: list, path: str, n_files: int, bits: int = 8
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Morton key of ``cols``: range-partition on the key (equal-frequency
    key ranges via Spark's range-partitioner sampling), sort within
    each partition, drop the key. Every output file then covers a
    bounded rectangle-ish region of the dimension space, so min/max
    stats prune scans filtered on ANY of the interleaved columns —
    the property the layout test asserts from the parquet footers.

    Dimensions are min-max scaled to ``bits`` bits BEFORE interleaving:
    a raw interleave is dominated by whichever column has more
    significant bits (a 13-bit day key outvotes an 8-bit customer key
    and the layout degenerates to a single-column sort — measured, the
    unscaled property test fails exactly that way). Production systems
    normalize the same way (Delta's OPTIMIZE ZORDER maps columns to
    range-partition ids first). The min/max pass is one tiny aggregate;
    at scale the numbers would come from table stats instead.
    """
    aggs = []
    for i, c in enumerate(cols):
        cc = F.col(c) if isinstance(c, str) else c
        aggs += [F.min(cc).alias(f"__mn{i}"), F.max(cc).alias(f"__mx{i}")]
    row = df.agg(*aggs).first()
    scaled = []
    for i, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("long")
        mn, mx = int(row[f"__mn{i}"]), int(row[f"__mx{i}"])
        span = max(mx - mn + 1, 1)
        scaled.append(F.floor(((cc - F.lit(mn)) * F.lit(1 << bits)) / F.lit(span)))
    keyed = df.withColumn("__z", zvalue(scaled, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
