"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
functions via mapInPandas.

The decode step itself is STUBBED (no image/audio libs in this
container — marked NotImplementedError / deterministic fake), but the
Spark-side plumbing is real and tested: schema, batch iteration,
partition sizing, and the metadata projection all behave exactly as
they would with a real codec plugged into `_decode_payload`.

Scale notes: binary payloads dominate partition size — size
spark.sql.files.maxPartitionBytes so one Arrow batch of payloads fits
executor memory; never collect payloads to the driver; push the
metadata-only projections (sha/length/type) down as column expressions
so full binaries are only materialized in the decode stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test-shape helper: treat the utf-8 bytes of a text column as an
    opaque media payload (the container has no real image/audio data).
    Real pipelines read payloads from parquet/sequence files directly.
    """
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("application/octet-stream")
    )


def binary_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Metadata-only projection over a binary column — stays entirely
    JVM-side (sha2/octet_length are codegen expressions), no decode."""
    return df.select(
        F.col(id_col),
        F.octet_length("payload").alias("byte_len"),
        F.sha2(F.col("payload"), 256).alias("sha256"),
    )


def _decode_payload(payload: bytes, media_type: str) -> dict:
    """STUB decode. A real deployment dispatches on media_type to
    PIL/ffmpeg/soundfile. Deterministic fake keeps the plumbing
    testable: 'dimensions' derived from payload length."""
    if media_type.startswith("image/"):
        raise NotImplementedError("image decode requires PIL (not in container)")
    n = len(payload)
    return {"width": int(n % 640), "height": int(n % 480)}


def extract_media_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas media feature extraction: Arrow batches of
    (id, payload, media_type) -> metadata rows. The pattern for any
    decode/resize/frame-sample stage."""
    import hashlib

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                _decode_payload(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(b).hexdigest()
                    ),
                    "width": [d["width"] for d in dims],
                    "height": [d["height"] for d in dims],
                }
            )

    return df.mapInPandas(op, MEDIA_META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_offset_bytes", T.LongType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling stage shape for video payloads: one input row ->
    up to max_frames output rows. The decoder is a deterministic fake
    (fixed-stride byte windows hashed as 'frames'); a real deployment
    swaps in ffmpeg keyframe extraction with the same batch contract.
    The row-expansion (flatMap) shape is what matters for partition
    sizing: output rows ≈ input rows × max_frames."""
    import hashlib

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_index": [], "frame_offset_bytes": [],
                   "frame_sha256": []}
            for did, payload in zip(pdf[id_col], pdf["payload"]):
                n = min(max_frames, max(len(payload) // every_n_bytes, 1))
                for i in range(n):
                    off = i * every_n_bytes
                    chunk = payload[off:off + every_n_bytes]
                    out["doc_id"].append(int(did))
                    out["frame_index"].append(i)
                    out["frame_offset_bytes"].append(off)
                    out["frame_sha256"].append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(op, FRAME_SCHEMA)
