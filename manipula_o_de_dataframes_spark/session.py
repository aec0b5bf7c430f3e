"""SparkSession factory tuned for this engine.

Local-mode defaults follow the public Spark guidance: shuffle partitions
sized to cores (not the 200 default), AQE enabled for runtime coalescing
and skew-join handling, Arrow enabled for the pandas-UDF slow path, and a
UTC session timezone so timestamp rendering matches a UTC-naive oracle
(DuckDB) bit-for-bit.

At cluster scale the same builder applies minus ``master``; AQE +
broadcast thresholds are the knobs that matter at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "manipula_o_de_dataframes_spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism (driver contract).
    """
    import tempfile  # noqa: PLC0415

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    parts = str(shuffle_partitions or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Local mode defaults to a 1 GiB JVM heap shared by every worker
        # thread — 32 threads spill and GC-thrash on it long before the
        # machine is loaded (measured: a 24M-row sort-merge join OOMs).
        # Only effective at JVM launch, so it must be set here, not after
        # the first session exists.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        .config("spark.sql.shuffle.partitions", parts)
        # saveAsTable targets (bucketed tables) land in a temp warehouse,
        # never in the repo working tree.
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "manipula_spark_warehouse"),
        )
        # events.parquet stores TIMESTAMP(NANOS), which the parquet reader
        # rejects without this legacy flag; declared here (session scope)
        # rather than mutated mid-read. read_table keeps a fallback set
        # for driver-owned sessions built without this factory.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
