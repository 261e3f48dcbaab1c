"""Multimodal plumbing invariants the oracle can't see: batch shapes,
binary round-trips, deterministic stubs."""

from __future__ import annotations

from dataingestionengineprocess_spark.queries.multimodal import (
    _TARGET_BYTES,
    multimodal_decode_features,
    multimodal_resize_stub,
)


def test_resize_normalizes_every_payload(spark, sf_dir):
    out = multimodal_resize_stub(spark, sf_dir).collect()
    assert out
    assert all(r.n_bytes == _TARGET_BYTES for r in out)
    # deterministic across runs
    again = multimodal_resize_stub(spark, sf_dir).collect()
    assert [r.resized_sha256 for r in out] == [r.resized_sha256 for r in again]


def test_decode_features_deterministic_and_bounded(spark, sf_dir):
    rows = multimodal_decode_features(spark, sf_dir).collect()
    assert rows
    assert all(64 <= r.width <= 255 and 64 <= r.height <= 255 for r in rows)
    assert all(0.0 <= r.mean_luma <= 1.0 for r in rows)
