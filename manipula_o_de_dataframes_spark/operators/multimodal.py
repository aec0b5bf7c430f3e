"""Multimodal (binary) column plumbing (north-star surface).

Images/audio/video are opaque ``binary`` payload columns with a typed
metadata struct alongside. The Spark-side plumbing — schema, Arrow batch
shape, ``mapInPandas`` signatures, partition sizing — is real and
tested; the actual media decode is STUBBED (the container ships no
image/audio libs): ``decode_features`` computes deterministic
pseudo-features from the bytes, and ``decode_real`` raises
NotImplementedError where a PIL/ffmpeg call would go.

Scale shape: payloads stay in executor-side Arrow batches end-to-end
(never collected), metadata-only queries prune the payload column at the
parquet scan, and per-batch work is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_SCHEMA = "id long, payload binary, meta struct<n_bytes:long, digest:string, format:string>"
FEATURE_SCHEMA = "id long, n_bytes long, digest string, width long, height long"


def as_blob_table(df: DataFrame, id_col: str, bytes_src_col: str, fmt: str = "raw") -> DataFrame:
    """Wrap a source column as (id, payload binary, meta struct).

    In production the payload comes from ``spark.read.format
    ("binaryFile")`` or a parquet binary column; here any string/binary
    column becomes the payload so the plumbing is exercised on testdata.
    """
    payload = F.col(bytes_src_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("digest"),
            F.lit(fmt).alias("format"),
        ).alias("meta"),
    )


def decode_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched pseudo-decode: bytes → deterministic fake features.

    The real decode (PIL.Image.open / av.open) is stubbed; width/height
    are fixed arithmetic on the byte length so the full mapInPandas
    pipeline — schema in, Arrow batches through, schema out — runs and
    verifies against a SQL oracle.
    """
    import hashlib  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # object dtype, not astype("int64"): NULL payloads propagate
            # as None (Arrow renders them as long-with-null)
            n = pdf["payload"].map(lambda b: None if b is None else len(b))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": n,
                    "digest": pdf["payload"].map(
                        lambda b: None if b is None else hashlib.md5(b).hexdigest()
                    ),
                    "width": n.map(lambda v: None if v is None else v % 640),
                    "height": n.map(lambda v: None if v is None else (v * 7) % 480),
                }
            )

    return blobs.mapInPandas(batches, schema=FEATURE_SCHEMA)


def decode_real(blobs: DataFrame) -> DataFrame:  # pragma: no cover
    """Where the real media decode goes (PIL / torchaudio / PyAV).

    Kept as an explicit stub: the execution container has no media
    libraries; swap ``decode_features``'s batch fn for one that opens
    each payload when they are available.
    """
    raise NotImplementedError(
        "media decode libs (PIL/av) are not installed in this container; "
        "use decode_features (deterministic stub) — the Spark plumbing is identical"
    )


RESIZE_SCHEMA = "id long, payload_out binary, n_out long"


def resize_stub(blobs: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Image-resize plumbing: binary in → binary out through Arrow batches.

    The pixel resample (PIL ``Image.resize``) is stubbed as a
    deterministic byte crop to ``target_bytes`` so the binary→binary
    mapInPandas path — the exact shape a real resize kernel uses — is
    exercised and oracle-checkable. Swap the batch body for
    ``Image.open(BytesIO(b)).resize(...)`` when media libs exist.
    """
    import pandas as pd  # noqa: PLC0415

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf["payload"].map(
                lambda b: None if b is None else bytes(b)[:target_bytes]
            )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "payload_out": out,
                    "n_out": out.map(lambda v: None if v is None else len(v)),
                }
            )

    return blobs.mapInPandas(batches, schema=RESIZE_SCHEMA)


def embed_stub(blobs: DataFrame, dims: int = 8) -> DataFrame:
    """Embedding-encoder plumbing: binary → fixed-width float vector.

    The exact shape a CLIP/wav2vec featurizer uses — mapInPandas over
    Arrow batches, payload in, ``dims`` doubles out — with the model
    forward pass stubbed deterministically: dimension c is the sum of
    payload bytes at positions ≡ c (mod dims), L2-normalized. Integer
    byte sums are exact, the norm is one sqrt of an exact integer, and
    each output is one double division — so the result is bit-portable
    and the SQL oracle can mirror it (rounding is left to the CALLER as
    a Spark-side expression: F.round is HALF_UP like DuckDB's round,
    while numpy/python round are HALF_EVEN).
    Output columns: id, d0 … d{dims-1}.
    """
    import math  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    def embed(b: bytes) -> list[float]:
        # NULL payload → NULL vector components (the engine-wide
        # NULL-propagation contract; bytes(None) would raise).
        if b is None:
            return [None] * dims
        arr = np.frombuffer(bytes(b), dtype=np.uint8)
        sums = [int(arr[c::dims].sum()) for c in range(dims)]
        ss = sum(s * s for s in sums)
        if ss == 0:
            return [0.0] * dims
        norm = math.sqrt(ss)
        return [s / norm for s in sums]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = pdf["payload"].map(embed)
            out = {"id": pdf["id"]}
            for c in range(dims):
                out[f"d{c}"] = vecs.map(lambda v, c=c: v[c])
            yield pd.DataFrame(out)

    schema = "id long, " + ", ".join(f"d{c} double" for c in range(dims))
    return blobs.mapInPandas(batches, schema=schema)


def audio_chunk_plan(
    blobs: DataFrame, chunk_ms: int = 10_000, bytes_per_ms: int = 32
) -> DataFrame:
    """Audio segmentation *plan* shape: one blob row → fixed-length
    chunk rows with [start_ms, end_ms) boundaries, last chunk truncated.

    Duration derives from the payload length at a declared byte rate
    (16 kHz mono PCM16 ≡ 32 bytes/ms) — integer arithmetic end to end,
    so the fan-out is exactly reproducible by a SQL oracle. A real
    segmenter swaps the duration probe for a header parse (mutagen/
    ffprobe — not in this container) and keeps this exact plan: explode
    over a computed chunk count, boundary math per index, payload
    untouched until a downstream mapInPandas slices bytes per chunk.
    """
    dur = (F.col("meta.n_bytes") / F.lit(bytes_per_ms)).cast("long")
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        ((dur + F.lit(chunk_ms - 1)) / F.lit(chunk_ms)).cast("long"),
    )
    start = F.col("chunk_idx").cast("long") * chunk_ms
    return (
        blobs.select(
            "id",
            dur.alias("dur_ms"),
            F.posexplode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
                "chunk_idx", "_c"
            ),
        )
        .select(
            "id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            start.alias("inicio_ms"),
            F.least(start + chunk_ms, F.col("dur_ms")).alias("fim_ms"),
        )
    )


def chunk_byte_sums(
    blobs: DataFrame, chunks: DataFrame, dims: int = 8, bytes_per_ms: int = 32
) -> DataFrame:
    """Per-chunk stride byte sums: the downstream mapInPandas stage the
    ``audio_chunk_plan`` docstring promises — slice each chunk's byte
    range [inicio_ms·rate, fim_ms·rate) out of the payload inside an
    Arrow batch, emit EXACT integer sums per interleaved dimension
    (``byte_sums_stub``'s contract, per chunk instead of per blob).
    A real audio featurizer (fbank/wav2vec) swaps the stride sums for
    frames but keeps this exact join → slice → vector shape.
    NULL payloads never reach this stage (callers filter); sums of an
    empty slice (a zero-duration tail) are 0, matching the SQL mirror.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    src = chunks.join(blobs.select("id", "payload"), "id").select(
        "id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.col("inicio_ms") * bytes_per_ms).cast("long").alias("__sb"),
        (F.col("fim_ms") * bytes_per_ms).cast("long").alias("__eb"),
        "payload",
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # One zero-padded (rows × max_chunk_bytes) matrix per Arrow
            # batch: the per-row work is a single slice assign, and the
            # stride sums vectorize across the whole batch (padding
            # can't perturb an integer sum). The row-python variant
            # measured 11.1 s of a 15.8 s sf0.1 wall — the loop, not
            # the arithmetic, was the cost.
            n = len(pdf)
            widths = (pdf["__eb"] - pdf["__sb"]).to_numpy()
            buf = np.zeros((n, int(widths.max()) if n else 0), dtype=np.int64)
            for r, (pay, sb, eb) in enumerate(
                zip(pdf["payload"], pdf["__sb"], pdf["__eb"])
            ):
                sl = np.frombuffer(bytes(pay), dtype=np.uint8)[int(sb) : int(eb)]
                buf[r, : len(sl)] = sl
            out = {"id": pdf["id"], "chunk_idx": pdf["chunk_idx"]}
            for c in range(dims):
                out[f"s{c}"] = buf[:, c::dims].sum(axis=1)
            yield pd.DataFrame(out)

    schema = "id long, chunk_idx long, " + ", ".join(f"s{c} long" for c in range(dims))
    return src.mapInPandas(batches, schema=schema)


def frame_sample_plan(blobs: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* shape: explode K pseudo-frames per blob.

    Demonstrates the fan-out pattern (one blob row → many frame rows)
    with deterministic fakes standing in for actual frame extraction.
    """
    n_frames = (F.col("meta.n_bytes") % 30 + 1).cast("int")
    return blobs.select(
        "id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_f"),
    ).filter(F.col("frame_idx") % every_n == 0).select("id", "frame_idx")


def byte_sums_stub(blobs: DataFrame, dims: int = 8) -> DataFrame:
    """The featurizer's pre-normalization integer sums (id, s0…s{dims-1}).

    Same Arrow mapInPandas plumbing as ``embed_stub`` but emitting the
    EXACT per-dimension byte sums as longs instead of the L2-normalized
    doubles: downstream similarity pipelines that need cross-engine
    bit-parity (centering, sign-bucketing, cosine on centered values)
    can then run entirely in integer arithmetic until one final
    deterministic double expression — no float accumulation anywhere.
    NULL payload → NULL sums (engine-wide NULL contract).
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    def sums(b: bytes) -> list:
        if b is None:
            return [None] * dims
        arr = np.frombuffer(bytes(b), dtype=np.uint8)
        return [int(arr[c::dims].sum()) for c in range(dims)]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vecs = pdf["payload"].map(sums)
            out = {"id": pdf["id"]}
            for c in range(dims):
                out[f"s{c}"] = vecs.map(lambda v, c=c: v[c])
            yield pd.DataFrame(out)

    schema = "id long, " + ", ".join(f"s{c} long" for c in range(dims))
    return blobs.mapInPandas(batches, schema=schema)
