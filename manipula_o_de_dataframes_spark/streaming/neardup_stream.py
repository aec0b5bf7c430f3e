"""Streaming near-dup ADMISSION — the ingest gate a production corpus
pipeline actually runs: each arriving document batch is screened
against the existing corpus index with incremental MinHash-LSH
(operators/dedup.py incremental_near_dups — linear in the batch, never
re-pairing the corpus), decisions are appended to an admissions log,
and the screened batch joins the index for the NEXT delivery.

Kappa parity (the stream_upsert discipline): delivery 1 = the even-id
half of `documents` (the index build), delivery 2 = the odd-id half
(the screened batch) — exactly `q_incremental_dedup`'s split, so the
drained admissions log is hash-verified against the SAME DuckDB
oracle as the batch query. What this adds over the batch twin is the
plumbing proof: state handoff between micro-batches through a parquet
index dir, batch-order robustness via pinned mtimes, idempotent
foreachBatch appends.

Scale posture: at 100 TB the index side's signatures are a persisted
artifact (bytes/doc); per micro-batch only the arriving docs compute
signatures and the shuffle carries (id, band) pairs — never text. The
admissions log is append-only parquet (a Delta/Iceberg append in a
lakehouse deployment).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import incremental_near_dups, minhash_signature
from ..sources.io import read_table
from .joins import drain_shuffle_partitions, pin_increasing_mtimes

DOCS_SCHEMA = "doc_id long, text string"
# The persisted index artifact: banding signatures + verify shingles —
# bytes/doc instead of the raw text, which is what makes the admission
# gate's index side a bounded artifact at 100 TB.
FEATURES_SCHEMA = (
    "doc_id long, __sh array<string>, mh0 string, mh1 string, "
    "mh2 string, mh3 string"
)


def screen_batch(index_dir: str, out_dir: str, batch: DataFrame, batch_id: int) -> None:
    """foreachBatch handler: the first delivery seeds the index; every
    later delivery is screened against everything delivered BEFORE it,
    its admission decisions logged, and its FEATURES (signatures +
    shingles, not text) added to the index artifact.

    IDEMPOTENT under foreachBatch's at-least-once contract: every
    write lands in a batch_id-keyed subdir with mode=overwrite, so a
    redelivered batch replays into the same paths instead of
    double-appending — and "the index" is the parts with batch id
    STRICTLY BELOW mine (compared NUMERICALLY, so the invariant
    survives any batch count — a lexicographic compare on the padded
    names would break at id 100000), so a retry reproduces its
    original decision exactly: a redelivered seed stays a seed even
    though later parts now exist, and no batch can ever screen against
    its own earlier write. The test replays both deliveries and
    asserts the log is unchanged — the ">= my id" formulation it
    replaced failed exactly there."""
    import glob  # noqa: PLC0415

    spark = batch.sparkSession
    # The delivery arrives as ONE file => one input partition, so the
    # MinHash/shingle stages would run at parallelism 1 (measured 3.3s
    # -> 2.1s on the sf0.1 screen with this spread); fan the batch out
    # before the signature work. Sized to the cluster, not a constant:
    # a fixed 8 would serialize the featurize on a 1000-executor
    # deployment.
    b = batch.select("doc_id", "text").repartition(
        spark.sparkContext.defaultParallelism
    )
    part = f"b{batch_id:05d}"
    prior = sorted(
        p
        for p in glob.glob(os.path.join(index_dir, "b*"))
        if int(os.path.basename(p)[1:]) < batch_id
        and os.path.exists(os.path.join(p, "_SUCCESS"))
    )
    # the index artifact is FEATURES (signatures + shingles), computed
    # ONCE at admission time — written first, then read back for this
    # batch's own screening, so the batch's text is featurized exactly
    # once and later batches never re-derive anything from text (the
    # persisted-artifact posture the 100 TB design requires)
    part_path = os.path.join(index_dir, part)
    minhash_signature(b, "text", "doc_id", 4, keep_shingles=True).write.mode(
        "overwrite"
    ).parquet(part_path)
    if prior:
        index_feats = spark.read.schema(FEATURES_SCHEMA).parquet(*prior)
        my_feats = spark.read.schema(FEATURES_SCHEMA).parquet(part_path)
        result = incremental_near_dups(
            None, None, "text", "doc_id", n_hashes=4, jaccard_threshold=0.5,
            index_features=index_feats, new_features=my_feats,
        )
        result.write.mode("overwrite").parquet(os.path.join(out_dir, part))


def neardup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    watch_dir = tempfile.mkdtemp(prefix="manipula_neardup_in_")
    ckpt_dir = tempfile.mkdtemp(prefix="manipula_neardup_ckpt_")
    state_root = tempfile.mkdtemp(prefix="manipula_neardup_state_")
    index_dir = os.path.join(state_root, "index")
    out_dir = os.path.join(state_root, "admissions")
    try:
        docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
        docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(
            os.path.join(watch_dir, "d1_index")
        )
        docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.parquet(
            os.path.join(watch_dir, "d2_batch")
        )
        # FileStreamSource orders by mtime; a tie would screen the
        # index delivery against the batch.
        pin_increasing_mtimes(watch_dir, ("d1_index", "d2_batch"))
        stream = (
            spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(watch_dir + "/*")
        )
        name = "neardup_" + uuid.uuid4().hex
        with drain_shuffle_partitions(spark):
            (
                stream.writeStream.foreachBatch(
                    lambda b, bid: screen_batch(index_dir, out_dir, b, bid)
                )
                .queryName(name)
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt_dir)
                .start()
                .awaitTermination()
            )
        final = spark.read.parquet(out_dir + "/b*")
        out = spark.createDataFrame(final.collect(), final.schema)
    finally:
        shutil.rmtree(watch_dir, ignore_errors=True)
        shutil.rmtree(ckpt_dir, ignore_errors=True)
        shutil.rmtree(state_root, ignore_errors=True)
    return out.orderBy("doc_id")
