"""Multimodal binary-column plumbing: schema, Arrow batching, stubbed
decode dispatch."""

import hashlib

import pytest
from pyspark.sql import Row

from foxsec_pipeline_spark.operators.multimodal import (
    MEDIA_META_SCHEMA,
    _decode_payload,
    attach_binary_payload,
    binary_metadata,
    extract_media_metadata,
)


def test_binary_metadata_jvm_side(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello")])
    row = binary_metadata(attach_binary_payload(df)).collect()[0]
    assert row.byte_len == 5
    assert row.sha256 == hashlib.sha256(b"hello").hexdigest()


def test_extract_media_metadata_mapinpandas(spark):
    df = attach_binary_payload(
        spark.createDataFrame([Row(doc_id=1, text="hello"), Row(doc_id=2, text="x" * 700)])
    )
    out = extract_media_metadata(df)
    assert out.schema == MEDIA_META_SCHEMA
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].byte_len == 5
    assert rows[1].sha256 == hashlib.sha256(b"hello").hexdigest()
    # deterministic fake dims from the stub codec
    assert rows[2].width == 700 % 640 and rows[2].height == 700 % 480


def _minimal_png(w: int, h: int) -> bytes:
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x06\x00\x00\x00"
    return (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR" + ihdr
            + b"\x00\x00\x00\x00")


def _minimal_jpeg(w: int, h: int) -> bytes:
    # SOI, APP0 (JFIF), SOF0 with one component, EOI
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof0 = (b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
            + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x01\x11\x00")
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _minimal_wav(rate: int, channels: int) -> bytes:
    fmt = (b"fmt " + (16).to_bytes(4, "little") + (1).to_bytes(2, "little")
           + channels.to_bytes(2, "little") + rate.to_bytes(4, "little")
           + b"\x00" * 8)
    body = b"WAVE" + fmt + b"data" + (0).to_bytes(4, "little")
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_decode_real_header_codecs():
    """Header-level byte-layout parsers (no image libs), golden per
    format; corrupt/unknown payloads fall back to the length fake."""
    assert _decode_payload(_minimal_png(640, 480), "image/png") == {
        "width": 640, "height": 480}
    assert _decode_payload(_minimal_jpeg(1920, 1080), "image/jpeg") == {
        "width": 1920, "height": 1080}
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    assert _decode_payload(gif + b"\x00" * 4, "image/gif") == {
        "width": 320, "height": 200}
    bmp = (b"BM" + b"\x00" * 16
           + (800).to_bytes(4, "little", signed=True)
           + (-600).to_bytes(4, "little", signed=True))  # top-down rows
    assert _decode_payload(bmp, "image/bmp") == {"width": 800, "height": 600}
    assert _decode_payload(_minimal_wav(44100, 2), "audio/wav") == {
        "width": 44100, "height": 2}
    # corrupt image -> deterministic fallback, never an exception
    assert _decode_payload(b"\x89PNG", "image/png") == {"width": 4, "height": 4}


def test_decode_real_codecs_through_mapinpandas(spark):
    """The real codecs must run inside the distributed decode stage,
    not just as local functions."""
    rows = [
        Row(doc_id=1, payload=bytearray(_minimal_png(12, 34)),
            media_type="image/png"),
        Row(doc_id=2, payload=bytearray(_minimal_jpeg(56, 78)),
            media_type="image/jpeg"),
        Row(doc_id=3, payload=bytearray(_minimal_wav(16000, 1)),
            media_type="audio/wav"),
    ]
    out = {r.doc_id: r for r in
           extract_media_metadata(spark.createDataFrame(rows)).collect()}
    assert (out[1].width, out[1].height) == (12, 34)
    assert (out[2].width, out[2].height) == (56, 78)
    assert (out[3].width, out[3].height) == (16000, 1)


def test_sample_frames_flatmap_shape(spark):
    from foxsec_pipeline_spark.operators.multimodal import (
        attach_binary_payload,
        sample_frames,
    )
    from foxsec_pipeline_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", "documents")["documents"]
    frames = sample_frames(
        attach_binary_payload(docs.limit(20)), every_n_bytes=64, max_frames=4
    )
    rows = frames.collect()
    assert 20 <= len(rows) <= 80  # 1..4 frames per doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for did, fr in by_doc.items():
        idx = sorted(f.frame_index for f in fr)
        assert idx == list(range(len(fr)))  # dense frame indices
        assert all(f.frame_sha256 and len(f.frame_sha256) == 64 for f in fr)
    # determinism
    again = sample_frames(
        attach_binary_payload(docs.limit(20)), every_n_bytes=64, max_frames=4
    ).collect()
    assert {(r.doc_id, r.frame_index, r.frame_sha256) for r in rows} == {
        (r.doc_id, r.frame_index, r.frame_sha256) for r in again
    }


def test_multimodal_to_ann_pipeline(spark):
    """The full multimodal training-data path composes end-to-end:
    binary payloads -> Arrow featurize (byte-histogram embedding; a
    real encoder swaps in at the same seam) -> ANN top-k over the
    embedding column. Deterministic across runs."""
    import numpy as np

    from foxsec_pipeline_spark.operators.multimodal import featurize_media
    from foxsec_pipeline_spark.operators.similarity import cosine_topk_arrow
    from foxsec_pipeline_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", "documents")["documents"]
    emb = featurize_media(attach_binary_payload(docs.limit(50)))
    ep = emb.toPandas().sort_values("doc_id")
    # unit-norm embeddings out of the featurizer
    norms = [np.linalg.norm(v) for v in ep["embedding"]]
    assert all(abs(n - 1.0) < 1e-9 for n in norms)
    qp = ep.head(5)
    topk = cosine_topk_arrow(
        np.stack(qp["embedding"].to_numpy()), qp["doc_id"].tolist(),
        emb, id_col="doc_id", k=3,
    )
    rows = topk.collect()
    assert len(rows) == 15  # 5 queries x k=3
    assert all(1 <= r.rank <= 3 and -1.0 <= r.cosine <= 1.0 for r in rows)
    again = {(r.query_id, r.neighbor_id, r.rank) for r in cosine_topk_arrow(
        np.stack(qp["embedding"].to_numpy()), qp["doc_id"].tolist(),
        emb, id_col="doc_id", k=3,
    ).collect()}
    assert {(r.query_id, r.neighbor_id, r.rank) for r in rows} == again


def test_media_phash_near_dup_properties(spark):
    """media_phash + hamming_pairs: identical payloads collapse to
    hamming 0; a small perturbation stays within the mined radius; an
    unrelated payload pairs with neither; sub-2-codepoint payloads
    are dropped."""
    from pyspark.sql import functions as F

    from foxsec_pipeline_spark.operators.dedup import hamming_pairs
    from foxsec_pipeline_spark.operators.multimodal import media_phash

    base = "the quick brown fox jumps over the lazy dog " * 20
    rows = [
        (1, base), (2, base),                       # exact dup
        (3, base[:-9] + "lazy cat "),               # near dup
        (4, "".join(chr(33 + (i * 7) % 90) for i in range(800))),  # far
        (5, "x"),                                   # too short
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
    )
    fp = media_phash(df)
    got = {r["doc_id"]: r["phash"] for r in fp.collect()}
    assert 5 not in got and len(got) == 4
    assert got[1] == got[2]
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in hamming_pairs(
            fp, hash_col="phash", bits=63, bands=3, max_hamming=2
        ).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs
