"""Structured Streaming variant of the weekly-snapshot ingest (EP2).

The reference's only streaming-ish construct is the ordered multi-file
weekly upload (analise_pendentes.py:29-48) — repeated batch over file
snapshots. There is no reference semantic to match beyond batch parity
(SURVEY §2.10), so this module re-expresses the same pipeline over a
Structured Streaming file source:

- each parquet file dropped into the watched directory is one snapshot;
- the snapshot label derives from ``input_file_name()`` (in streaming
  the file IS the micro-batch identity — positional "Semana -N" labels
  only exist for a user-ordered upload, so file name is the right key);
- event-time weekly tumbling windows + watermark handle late rows;
- ``foreachBatch`` gives the batch-sink escape hatch (e.g. the Excel
  sink for small summaries).

Batch remains the source of truth; this is the scale path for a feed
that keeps producing snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def pending_stream(
    spark: SparkSession,
    watch_dir: str,
    schema,
    status_col: str = "o_orderstatus",
    pending_value: str = "P",
    ts_col: str = "o_orderdate",
    value_col: str = "o_totalprice",
    key_col: str = "o_custkey",
    watermark: str = "14 days",
) -> DataFrame:
    """Streaming pending-consolidation: per (snapshot file, week) metrics."""
    stream = spark.readStream.schema(schema).parquet(watch_dir)
    pending = (
        stream.filter(F.col(status_col) == pending_value)
        .withColumn("snapshot", F.element_at(F.split(F.input_file_name(), "/"), -1))
        .withWatermark(ts_col, watermark)
    )
    return pending.groupBy(
        "snapshot", F.window(F.col(ts_col), "7 days").alias("semana")
    ).agg(
        F.count(F.lit(1)).alias("n_pendentes"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("valor_total"),
        F.approx_count_distinct(key_col).alias("n_clientes_approx"),
    )


def run_available_now(result: DataFrame, sink_fn, checkpoint_dir: str | None = None) -> None:
    """Drain everything currently in the source dir through foreachBatch.

    Trigger availableNow processes all pending files then stops — the
    batch-equivalence mode used by the tests. A fresh checkpoint dir is
    created when none is given (a reused checkpoint would replay offsets
    from a previous, possibly different, query).
    """
    import tempfile  # noqa: PLC0415

    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="manipula_stream_ckpt_")
    (
        result.writeStream.outputMode("update")
        .foreachBatch(lambda df, epoch: sink_fn(df, epoch))
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
        .awaitTermination()
    )
