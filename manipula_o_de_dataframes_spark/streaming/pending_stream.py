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


def pending_stream_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable streaming run: drain one snapshot, return the result.

    The streaming pipeline (file source → filter → epoch-aligned 7-day
    tumbling window → aggregate) executed with trigger availableNow into
    a memory sink, so a batch DataFrame of the final state comes back.
    Event time is TIMESTAMP_NTZ (o_orderdate's parquet type) — window
    boundaries are then pure wall-clock epoch arithmetic, identical
    under any session timezone, which is what makes a DuckDB oracle
    possible at all. No watermark on this path: Spark only accepts
    watermarks on TIMESTAMP, and for a drain-everything availableNow
    trigger in complete mode a watermark would do nothing anyway; the
    live-feed variant (``pending_stream``) keeps one on a TIMESTAMP
    event-time column.
    """
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415
    import uuid  # noqa: PLC0415

    # The file source watches a *directory*; stage the snapshot into a
    # fresh one (symlink — no copy) as a live feed would drop it there.
    # Every resource (watch dir, checkpoint, memory-sink table) is torn
    # down before returning — repeated runs leave nothing behind
    # (ADVICE r1); the small final aggregate is re-hosted in a local
    # DataFrame that outlives the sink table.
    watch_dir = tempfile.mkdtemp(prefix="manipula_stream_in_")
    ckpt_dir = tempfile.mkdtemp(prefix="manipula_stream_ckpt_")
    name = "pending_stream_" + uuid.uuid4().hex
    try:
        os.symlink(os.path.join(sf_dir, "orders.parquet"),
                   os.path.join(watch_dir, "orders.parquet"))
        schema = spark.read.parquet(f"{sf_dir}/orders.parquet").schema
        stream = spark.readStream.schema(schema).parquet(watch_dir)
        pending = (
            stream.filter(F.col("o_orderstatus") == "P")
            .withColumn("snapshot", F.element_at(F.split(F.input_file_name(), "/"), -1))
        )
        agg = pending.groupBy(
            "snapshot", F.window(F.col("o_orderdate"), "7 days").alias("semana")
        ).agg(
            F.count(F.lit(1)).alias("n_pendentes"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("valor_total"),
        )
        out = agg.select(
            "snapshot",
            F.date_format(F.col("semana.start"), "yyyy-MM-dd").alias("semana_inicio"),
            "n_pendentes",
            "valor_total",
        )
        from .joins import drain_shuffle_partitions  # noqa: PLC0415

        with drain_shuffle_partitions(spark):
            (
                out.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt_dir)
                .start()
                .awaitTermination()
            )
        sink = spark.table(name)
        result = spark.createDataFrame(sink.collect(), sink.schema)
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(watch_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)
    return result


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
