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


def test_phash_neardup_finds_duplicate_payloads(spark):
    """Identical payloads have hamming distance 0 and a payload with one
    changed block stays within the hamming budget, so both MUST surface
    in the perceptual-hash pairs; an unrelated payload must not."""
    from pyspark.sql import functions as F

    from dataingestionengineprocess_spark.operators.dedup import (
        simhash_neardup_pairs,
    )

    base = " ".join(f"word{i}" for i in range(300))
    # SAME-LENGTH single-byte edit: the block stub frames fixed 4-byte
    # windows, so a length change would shift every downstream block
    # (real pHash is alignment-robust; the stub is not), and a longer
    # payload keeps per-bit vote margins wide so a one-block change
    # stays within the hamming budget.
    near = base.replace("word30 ", "wOrd30 ")
    other = " ".join(f"zz{i} qq{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, other)], ["doc_id", "text"]
    )
    blocks = F.regexp_replace(
        F.lower(F.hex(F.encode("text", "utf-8"))), "(.{8})", "$1 "
    )
    payloads = docs.select("doc_id", F.trim(blocks).alias("block_str"))
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_neardup_pairs(
            payloads, id_col="doc_id", text_col="block_str",
            max_hamming=3).collect()
    }
    assert (1, 2) in got          # exact duplicate payload
    assert (1, 3) in got          # near-duplicate payload
    assert (1, 4) not in got and (2, 4) not in got
