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
