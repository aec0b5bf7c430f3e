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

import time

from pyspark.sql import DataFrame

_STALE_AFTER_S = 7 * 24 * 3600


def _sweep_stale(root: str) -> None:
    """Remove spool dirs older than a week — atexit never fires on
    SIGKILL/OOM, so crashed runs would otherwise leak copies forever."""
    try:
        cutoff = time.time() - _STALE_AFTER_S
        for name in os.listdir(root):
            p = os.path.join(root, name)
            if os.path.getmtime(p) < cutoff:
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass


def spool(df: DataFrame) -> DataFrame:
    """NOTE: eager — the frame computes and writes at CALL time (that is
    the point: later consumers share the materialization). Callers'
    query construction therefore does real work; each call writes one
    copy, removed at interpreter exit (plus the stale sweep above)."""
    root = os.path.join(tempfile.gettempdir(), "spark_graft_spool")
    _sweep_stale(root)
    path = os.path.join(root, uuid.uuid4().hex)
    df.write.mode("overwrite").parquet(path)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return df.sparkSession.read.parquet(path)
