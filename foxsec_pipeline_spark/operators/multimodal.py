"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
functions via mapInPandas.

The decode stage parses real byte layouts pure-python (PNG/JPEG/GIF/
BMP dimensions, WAV rate/channels — no image/audio libs in this
container); full pixel/sample decode (resize, ffmpeg frame
extraction) would dispatch from the same `_decode_payload` seam with
the same batch contract. Unknown formats fall back to a deterministic
length-derived fake so the stage stays total.

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


def _png_dims(payload: bytes) -> dict | None:
    # PNG: 8-byte signature, then IHDR chunk; width/height are
    # big-endian u32 at offsets 16 and 20
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return {"width": w, "height": h}
    return None


def _jpeg_dims(payload: bytes) -> dict | None:
    # JPEG: walk the marker stream to the first SOFn (C0-CF except
    # C4/C8/CC); height/width are big-endian u16 at +5/+7 into the
    # frame segment
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 9 < len(payload):
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = int.from_bytes(payload[i + 5:i + 7], "big")
            w = int.from_bytes(payload[i + 7:i + 9], "big")
            return {"width": w, "height": h}
        i += 2 + seg_len
    return None


def _gif_dims(payload: bytes) -> dict | None:
    # GIF87a/89a: logical screen width/height are little-endian u16
    # at offsets 6 and 8
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return {"width": w, "height": h}
    return None


def _bmp_dims(payload: bytes) -> dict | None:
    # BMP: BITMAPINFOHEADER width/height are little-endian i32 at
    # offsets 18 and 22 (height may be negative for top-down rows)
    if len(payload) >= 26 and payload[:2] == b"BM":
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        return {"width": abs(w), "height": abs(h)}
    return None


def _wav_dims(payload: bytes) -> dict | None:
    # WAV: RIFF/WAVE container; report (sample_rate, channels) in the
    # (width, height) slots — the schema's generic numeric dims
    if len(payload) >= 36 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        i = 12
        while i + 8 <= len(payload):
            chunk_id = payload[i:i + 4]
            chunk_len = int.from_bytes(payload[i + 4:i + 8], "little")
            if chunk_id == b"fmt " and i + 16 <= len(payload):
                channels = int.from_bytes(payload[i + 10:i + 12], "little")
                rate = int.from_bytes(payload[i + 12:i + 16], "little")
                return {"width": rate, "height": channels}
            i += 8 + chunk_len + (chunk_len & 1)
    return None


_CODECS = {
    "image/png": _png_dims,
    "image/jpeg": _jpeg_dims,
    "image/gif": _gif_dims,
    "image/bmp": _bmp_dims,
    "audio/wav": _wav_dims,
    "audio/x-wav": _wav_dims,
}


def _decode_payload(payload: bytes, media_type: str) -> dict:
    """Header-level decode, pure python (no image/audio libs in this
    container): PNG/JPEG/GIF/BMP dimensions and WAV sample-rate/
    channels parsed from the real byte layout. Unknown or corrupt
    payloads fall back to a deterministic length-derived fake so the
    mapInPandas stage stays total (no poison-pill rows kill a batch).
    Full pixel/sample decode (resize, frame extraction) would dispatch
    here to PIL/ffmpeg with the same contract."""
    payload = bytes(payload)
    codec = _CODECS.get(media_type)
    if codec is not None:
        dims = codec(payload)
        if dims is not None:
            return dims
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


def media_phash(
    df: DataFrame, id_col: str = "doc_id", bits: int = 63
) -> DataFrame:
    """Perceptual-hash stage for binary media near-dup: payload ->
    `bits`-wide fingerprint whose bit b is set iff content bucket b
    carries more than its mean share — the average-hash construction
    over ADJACENT-PAIR buckets (cp[i]*31 + cp[i+1], the structural
    analog of pHash's frequency components: a pure value histogram
    collapses homogeneous corpora into one hot bucket, which both
    kills discrimination AND detonates the downstream pair join —
    measured OOM at sf0.1 with the unigram variant). The default 63
    bits keeps every shifted bit positive in an int64 on any engine.

    The deterministic stand-in works on the payload's decoded
    codepoint stream (no pixel decoders in this container); a real
    image pHash (resize -> DCT -> median threshold) swaps in at this
    same mapInPandas seam with the identical (id, payload) ->
    (id, phash int64) contract. Payloads with fewer than 2 codepoints
    are dropped (no pair structure to hash).

    Downstream: `operators.dedup.hamming_pairs` mines exact
    near-duplicates from the fingerprints with the banded pigeonhole
    join — fingerprinting is map-side, pairing bucket-local, the same
    100 TB shape as SimHash text dedup.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, hashes = [], []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                cps = np.array(
                    [ord(c) for c in bytes(payload).decode("utf-8")],
                    dtype=np.int64,
                )
                if cps.size < 2:
                    continue
                pairs = (cps[:-1] * 31 + cps[1:]) % bits
                hist = np.bincount(pairs, minlength=bits)
                total = int(hist.sum())
                ph = 0
                for b in range(bits):
                    if int(hist[b]) * bits > total:
                        ph |= 1 << b
                ids.append(i)
                hashes.append(ph)
            yield pd.DataFrame(
                {
                    id_col: pd.array(ids, dtype="int64"),
                    "phash": pd.array(hashes, dtype="int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        op, schema=f"{id_col} long, phash long"
    )


def featurize_media(
    df: DataFrame, id_col: str = "doc_id", dim: int = 64
) -> DataFrame:
    """Feature-extraction stage: opaque payload bytes -> fixed-dim
    embedding, Arrow batch by Arrow batch. The featurizer here is a
    deterministic L2-normalized byte histogram (no vision/audio models
    in this container); a real CLIP/wav2vec encoder swaps in at the
    same `mapInPandas` seam with the identical (id, payload) ->
    (id, array<double>) contract and batch shape.

    This completes the multimodal training-data path: decode ->
    featurize -> ANN/dedup over the embedding column (the downstream
    operators are the similarity family — see
    test_multimodal_to_ann_pipeline).
    """
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for payload in pdf["payload"]:
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                h = np.bincount(b % dim, minlength=dim).astype(np.float64)
                n = np.linalg.norm(h)
                vecs.append((h / n if n else h).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": vecs})

    return df.select(id_col, "payload").mapInPandas(
        op, schema=f"{id_col} long, embedding array<double>"
    )
