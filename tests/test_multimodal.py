"""Multimodal plumbing: binary payload column, metadata, stubbed decode
feature extraction (deterministic fake — the Spark-side plumbing is real)."""

from __future__ import annotations

from univer_ocr_spark.ops.multimodal import (
    FEATURE_DIM,
    _decode_stub,
    multimodal_features,
    multimodal_meta,
)

SF = "/root/testdata/sf0.001"


def test_decode_stub_deterministic():
    assert _decode_stub(b"abc") == _decode_stub(b"abc")
    assert len(_decode_stub(b"")) == FEATURE_DIM
    assert len(_decode_stub(b"0123456789abcdef")) == FEATURE_DIM


def test_multimodal_meta(spark):
    rows = multimodal_meta(spark, SF).collect()
    assert len(rows) == 500
    r = rows[0]
    assert r["n_bytes"] > 0
    assert r["format"] == "utf8-text"
    assert len(r["header_hex"]) == 8


def test_multimodal_features(spark):
    a = multimodal_features(spark, SF).collect()
    b = multimodal_features(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert all(r["feature_dim"] == FEATURE_DIM for r in a)
    assert any(r["feature_sum"] > 0 for r in a)
