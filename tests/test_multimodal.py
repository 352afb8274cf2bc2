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


def test_decode_stub_gates_real_codecs():
    with pytest.raises(NotImplementedError):
        _decode_payload(b"\x89PNG", "image/png")


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
