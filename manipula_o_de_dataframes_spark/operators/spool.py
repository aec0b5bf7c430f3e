"""Scratch-parquet spooling: compute a frame once, reuse it N times.

The distributed equivalent of "materialize and share" without holding
block-manager memory past the call (persist leaks if ownership can't
outlive the builder; localCheckpoint blocks linger until JVM GC —
measured, not bounded). Executors write the partitions, later stages
re-read them, and the directory is removed at interpreter exit. Local
mode spools to the system temp dir; on a cluster the same call targets
job-scratch storage (HDFS/S3). Decimals, longs, and strings round-trip
parquet exactly, so spooled plans stay bit-identical.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame


def spool(df: DataFrame) -> DataFrame:
    path = os.path.join(tempfile.gettempdir(), "spark_graft_spool", uuid.uuid4().hex)
    df.write.mode("overwrite").parquet(path)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return df.sparkSession.read.parquet(path)
