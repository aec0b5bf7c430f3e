"""Streaming distribution-drift guard — the governance monitor run off
a live ingest instead of a batch snapshot.

The stream side produces ONLY the (week, type, count) census (a
tumbling 7-day windowed count — fixed-size mergeable state per
(window, type), the cheapest possible streaming aggregate); the
χ²/L1 comparison is the same post-processing the batch query uses
(queries._drift_from_counts), so batch and stream share one oracle —
the kappa-architecture claim ("replay the stream, get the batch
answer") verified by hash, not asserted.

Scale posture: state is |open windows × types| rows regardless of
event volume; a live feed would watermark ts so closed weeks age out
(TIMESTAMP_NTZ drains here run availableNow in COMPLETE mode, the
same documented trade as every other drain in this package).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .joins import _events_stream, drain_shuffle_partitions


def drift_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415
    import uuid  # noqa: PLC0415

    from ..queries import _drift_from_counts  # noqa: PLC0415

    watch_dir = tempfile.mkdtemp(prefix="manipula_stream_drift_in_")
    ckpt_dir = tempfile.mkdtemp(prefix="manipula_stream_drift_ckpt_")
    name = "drift_stream_" + uuid.uuid4().hex
    try:
        os.symlink(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(watch_dir, "events.parquet"),
        )
        counts = (
            _events_stream(spark, watch_dir)
            .groupBy(
                F.window("ts", "7 days")["start"].alias("__wk"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        with drain_shuffle_partitions(spark):
            (
                counts.writeStream.outputMode("complete")
                .format("memory")
                .queryName(name)
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt_dir)
                .start()
                .awaitTermination()
            )
        sink = spark.table(name)
        drained = spark.createDataFrame(sink.collect(), sink.schema)
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(watch_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)
    return _drift_from_counts(drained)
