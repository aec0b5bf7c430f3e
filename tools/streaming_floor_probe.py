"""Measure the Structured-Streaming per-query floor (VERDICT r9 #4).

Each streaming query in the registry pays fixed machinery beyond its
actual computation: query start (checkpoint init, offset log, source
discovery), per-micro-batch trigger overhead, memory-sink collect,
teardown. The bench times queries ONE AT A TIME, so this floor is
shareable only if several registry queries could ride one physical
stream — they cannot (each returns a different result frame and is
timed separately). What CAN be quantified is the floor itself, so it
is priced as a line item instead of hand-waved:

- `identity_1batch`: minimal availableNow parquet->memory stream over
  a 10-row file, stateless identity projection. Everything here is
  machinery; min-of-N in a WARM session (the first start in a session
  pays JIT/classloading once — bench's session reuse already
  amortizes that, so the warm number is the honest per-query floor).
- `identity_2batch`: same with two source files delivered as two
  micro-batches (maxFilesPerTrigger=1) — the marginal cost of one
  extra trigger, which multi-delivery queries (stream_dedup,
  stream_near_dup, attribution_stream_wm) pay per delivery.
- `stateful_1batch`: the identity stream with a windowed count
  (complete mode) — state-store init on top of the stateless floor.

Usage: python tools/streaming_floor_probe.py [n_runs]
Prints one JSON line per probe with runs + min.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import functions as F  # noqa: E402

from manipula_o_de_dataframes_spark.session import get_spark  # noqa: E402


def _stage(spark, watch_dir: str, n_files: int) -> None:
    df = spark.range(10).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
    )
    for i in range(n_files):
        stage = tempfile.mkdtemp(prefix="floorprobe_stage_")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(
            f for f in os.listdir(stage) if f.endswith(".parquet")
        )
        shutil.move(
            os.path.join(stage, part), os.path.join(watch_dir, f"f{i}.parquet")
        )
        shutil.rmtree(stage, ignore_errors=True)


def _drain(spark, watch_dir: str, name: str, stateful: bool, per_file: bool) -> float:
    ckpt = tempfile.mkdtemp(prefix="floorprobe_ckpt_")
    reader = spark.readStream.schema("id bigint, ts timestamp")
    if per_file:
        reader = reader.option("maxFilesPerTrigger", 1)
    src = reader.parquet(watch_dir)
    if stateful:
        out = src.groupBy(F.window("ts", "1 hour").alias("__w")).agg(
            F.count(F.lit(1)).alias("n")
        )
        mode = "complete"
    else:
        out = src.select("id", "ts")
        mode = "append"
    t0 = time.perf_counter()
    (
        out.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
        .awaitTermination()
    )
    spark.table(name).collect()
    dt = time.perf_counter() - t0
    spark.catalog.dropTempView(name)
    shutil.rmtree(ckpt, ignore_errors=True)
    return round(dt, 3)


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("streaming-floor-probe")
    spark.sparkContext.setLogLevel("ERROR")
    w1 = tempfile.mkdtemp(prefix="floorprobe_in1_")
    w2 = tempfile.mkdtemp(prefix="floorprobe_in2_")
    _stage(spark, w1, 1)
    _stage(spark, w2, 2)
    # one throwaway start: the session's FIRST stream pays classload/JIT
    # that bench's session reuse amortizes across the whole run
    _drain(spark, w1, "floor_warmup", False, False)
    probes = {
        "identity_1batch": lambda i: _drain(spark, w1, f"p1_{i}", False, False),
        "identity_2batch": lambda i: _drain(spark, w2, f"p2_{i}", False, True),
        "stateful_1batch": lambda i: _drain(spark, w1, f"p3_{i}", True, False),
    }
    for name, fn in probes.items():
        runs = [fn(i) for i in range(n_runs)]
        print(
            json.dumps(
                {
                    "metric": "streaming_floor_seconds",
                    "probe": name,
                    "min": min(runs),
                    "runs": runs,
                }
            ),
            flush=True,
        )
    shutil.rmtree(w1, ignore_errors=True)
    shutil.rmtree(w2, ignore_errors=True)


if __name__ == "__main__":
    main()
