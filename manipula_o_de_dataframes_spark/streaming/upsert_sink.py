"""Streaming MERGE/upsert sink via ``foreachBatch`` — the production
pattern for applying a CDC feed to a keyed table without a lakehouse
format: each micro-batch is merged into a parquet state directory by
read → full-outer-join → overwrite (the relational core of Delta/
Iceberg MERGE, hand-rolled the way ``q_upsert`` does it for one
batch).

Idempotence note (the real reason foreachBatch sinks are subtle): the
merge is last-writer-wins BY KEY, so re-delivering a batch leaves the
state unchanged — re-run safety is asserted in tests by draining the
same staged feed twice into the same state dir and hashing the result.

Scale shape: state I/O is one keyed full-outer join per micro-batch
(shuffle on the key, or zero-shuffle under bucketed state layout);
nothing driver-side is data-proportional. The read-merge-overwrite
cycle is exactly what a MERGE-capable table format does under the
hood, minus the transaction log.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MERGED_SCHEMA = "pedido long, situacao string, total double, origem string"


def merge_batch(state_dir: str, batch: DataFrame) -> None:
    """MERGE one micro-batch of final-form rows into the parquet
    state: batch rows win on key collision (last-writer-wins), state
    rows survive otherwise. Overwrite goes through a temp dir +
    atomic rename so a crash mid-write can't leave a half state."""
    spark = batch.sparkSession
    b = batch.select("pedido", "situacao", "total", "origem")
    if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
        state = spark.read.schema(MERGED_SCHEMA).parquet(state_dir)
        s = state.select(
            F.col("pedido").alias("__k"),
            F.col("situacao").alias("__sit"),
            F.col("total").alias("__tot"),
            F.col("origem").alias("__org"),
        )
        merged = b.join(s, b["pedido"] == s["__k"], "full_outer").select(
            F.coalesce(F.col("pedido"), F.col("__k")).alias("pedido"),
            F.coalesce(F.col("situacao"), F.col("__sit")).alias("situacao"),
            F.coalesce(F.col("total"), F.col("__tot")).alias("total"),
            F.coalesce(F.col("origem"), F.col("__org")).alias("origem"),
        )
    else:
        merged = b
    tmp_out = state_dir + ".next"
    merged.write.mode("overwrite").parquet(tmp_out)
    old = state_dir + ".old"
    if os.path.exists(state_dir):
        os.rename(state_dir, old)
    os.rename(tmp_out, state_dir)
    shutil.rmtree(old, ignore_errors=True)


def upsert_drained(spark: SparkSession, sf_dir: str, state_dir: str | None = None) -> DataFrame:
    """Drive the MERGE sink across two REAL micro-batches and return
    the final keyed state.

    Delivery 1 = the full orders snapshot in final-row form (origem
    'original'); delivery 2 = the CDC update set (every 7th order,
    repriced +10, status 'F', origem 'atualizado' — the exact
    ``q_upsert`` derivation, so the BATCH upsert oracle verifies the
    streaming path hash-for-hash: kappa parity for MERGE).
    ``maxFilesPerTrigger=1`` forces one micro-batch per delivery, so
    the update batch genuinely merges against persisted state, not
    against co-delivered rows.
    """
    from .joins import drain_shuffle_partitions  # noqa: PLC0415
    from ..functions.formatting import MONEY  # noqa: PLC0415
    from ..sources.io import read_table  # noqa: PLC0415

    watch_dir = tempfile.mkdtemp(prefix="manipula_upsert_in_")
    ckpt_dir = tempfile.mkdtemp(prefix="manipula_upsert_ckpt_")
    own_state = state_dir is None
    if own_state:
        state_dir = tempfile.mkdtemp(prefix="manipula_upsert_state_") + "/state"
    try:
        o = read_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast(MONEY).alias("__t"),
        )
        base = o.select(
            F.col("o_orderkey").alias("pedido"),
            F.col("o_orderstatus").alias("situacao"),
            F.col("__t").cast("double").alias("total"),
            F.lit("original").alias("origem"),
        )
        upd = o.filter(F.col("o_orderkey") % 7 == 0).select(
            F.col("o_orderkey").alias("pedido"),
            F.lit("F").alias("situacao"),
            (F.col("__t") + F.lit(10).cast(MONEY)).cast("double").alias("total"),
            F.lit("atualizado").alias("origem"),
        )
        base.coalesce(1).write.parquet(os.path.join(watch_dir, "d1_base"))
        upd.coalesce(1).write.parquet(os.path.join(watch_dir, "d2_updates"))
        stream = (
            spark.readStream.schema(MERGED_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(watch_dir + "/*")
        )
        name = "upsert_" + uuid.uuid4().hex
        with drain_shuffle_partitions(spark):
            (
                stream.writeStream.foreachBatch(
                    lambda batch, _id: merge_batch(state_dir, batch)
                )
                .queryName(name)
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt_dir)
                .start()
                .awaitTermination()
            )
        final = spark.read.schema(MERGED_SCHEMA).parquet(state_dir)
        # materialize before the state dir is removed
        out = spark.createDataFrame(final.collect(), final.schema)
    finally:
        shutil.rmtree(watch_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        if own_state:
            shutil.rmtree(os.path.dirname(state_dir), ignore_errors=True)
    return out.orderBy("pedido")
