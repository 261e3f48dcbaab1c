"""Multimodal-column surface: opaque binary payloads with typed
metadata, decode/feature-extract via Arrow-batched mapInPandas.

SURVEY.md mandate [C]: image/audio/video as `binary` columns. The
fixtures carry no real media, so the *payload* is the utf-8 encoding
of the document text -- the Spark-side plumbing (binary columns,
metadata extraction, batch-iterator UDF shape, frame fan-out) is real
and oracle-checked where SQL-expressible; the actual media decode is
a clearly marked deterministic stub (the container has no image/audio
libraries).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from . import register

# ---------------------------------------------------------------------------
# Binary metadata: size, content hash, magic-byte prefix -- the typed
# metadata columns a media table carries next to its payload.
# ---------------------------------------------------------------------------

_BINMETA_ORACLE = """
SELECT doc_id,
       octet_length(encode(text))                     AS n_bytes,
       sha256(text)                                   AS payload_sha256,
       lower(hex(encode(substring(text, 1, 4))))      AS magic_hex
FROM documents
"""


@register("multimodal_binary_metadata", oracle=_BINMETA_ORACLE)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    payload = F.encode("text", "utf-8")
    return (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(F.col("text"), 256).alias("payload_sha256"),
            F.lower(F.hex(F.encode(F.substring("text", 1, 4), "utf-8")))
            .alias("magic_hex"),
        )
    )


# ---------------------------------------------------------------------------
# Frame sampling: treat the payload as a fixed-stride media container
# and fan out one row per sampled frame -- pure built-ins, exact oracle.
# ---------------------------------------------------------------------------

_FRAMES_ORACLE = """
SELECT doc_id, unnest(range(0, octet_length(encode(text)) // 256)) AS frame_idx,
       unnest(range(0, octet_length(encode(text)) // 256)) * 256 AS byte_offset
FROM documents
WHERE octet_length(encode(text)) >= 256
"""


@register("multimodal_frame_sample", oracle=_FRAMES_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_frames = F.floor(F.octet_length(F.encode("text", "utf-8")) / 256).cast("long")
    return (
        load(spark, sf_dir, "documents")
        .filter(n_frames >= 1)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn("byte_offset", F.col("frame_idx") * 256)
    )


# ---------------------------------------------------------------------------
# Decode + feature extraction via mapInPandas (rows-only): the real
# Arrow-batched UDF shape. The "decoder" derives deterministic fake
# dimensions from the payload hash -- swap `_stub_decode` for a real
# image/audio decoder when the libraries exist.
# ---------------------------------------------------------------------------


def _stub_decode(payload: bytes) -> tuple[int, int, float]:
    """STUB: deterministic fake of an image decode.

    A real implementation would be e.g. PIL.Image.open(BytesIO(b)).
    Raising NotImplementedError here would fail the pipeline; instead
    return (width, height, mean_luma) derived from the bytes so the
    plumbing is exercised deterministically end to end.
    """
    import hashlib

    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192          # 64..255
    height = 64 + h[1] % 192
    mean_luma = round(h[2] / 255.0, 4)
    return width, height, mean_luma


@register("multimodal_decode_features")
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode: binary in, typed features out.

    mapInPandas keeps the batch iterator shape a real decoder needs
    (decode N images per Arrow batch, never row-at-a-time pickling).
    """
    import pandas as pd

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def decode_batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            decoded = [_stub_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "mean_luma": [d[2] for d in decoded],
            })

    return docs.mapInPandas(
        decode_batches,
        schema="doc_id long, width int, height int, mean_luma double",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Resize plumbing: binary in -> binary out through mapInPandas -- the
# transform-shaped media op (vs. decode's feature-extraction shape).
# The "resize" is a deterministic byte-level stub (truncate/pad to the
# target frame size); a real one swaps _stub_resize for PIL/ffmpeg.
# Rows-only: output bytes are implementation-defined.
# ---------------------------------------------------------------------------

_TARGET_BYTES = 128


def _stub_resize(payload: bytes, target: int = _TARGET_BYTES) -> bytes:
    """STUB for an image/audio resample: deterministic size-normalize
    (truncate or zero-pad) so every output payload is `target` bytes."""
    return payload[:target].ljust(target, b"\0")


@register("multimodal_resize_stub")
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-normalized payloads + before/after metadata. The plumbing
    under test: binary column in AND out of an Arrow batch, with
    metadata computed Spark-side so the Python stage stays minimal."""
    import pandas as pd

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )

    def resize_batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "resized": [_stub_resize(bytes(p)) for p in pdf["payload"]],
            })

    resized = docs.mapInPandas(
        resize_batches, schema="doc_id long, resized binary"
    )
    return (
        resized.select(
            "doc_id",
            F.octet_length("resized").cast("long").alias("n_bytes"),
            F.sha2("resized", 256).alias("resized_sha256"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Perceptual-hash near-dup over binary payloads: the image-dedup shape.
# A real deployment computes pHash/aHash per image inside the decode
# UDF; this container has no image codecs, so the DETERMINISTIC STUB
# hashes fixed-size payload blocks instead (same locality property:
# payloads differing in a few blocks land within a small hamming
# distance). Everything downstream of the hash -- the 64-bit signature,
# the 4x16-bit pigeonhole chunk join, the hamming verification -- is
# the production plan: candidates meet in one shuffle on chunk value,
# never an all-pairs comparison.
# ---------------------------------------------------------------------------


@register("multimodal_phash_neardup")
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import simhash_neardup_pairs

    docs = load(spark, sf_dir, "documents")
    # binary payload -> hex -> fixed 8-hex-char (4-byte) "pixel blocks",
    # space-joined so the simhash machinery treats each block as one
    # feature token (shingle window of 1 block via n=1 tokens is
    # emulated with the default shingle_n=3 over blocks: 3-block
    # patches, the 2-D patch analog).
    blocks = F.regexp_replace(
        F.lower(F.hex(F.encode("text", "utf-8"))), "(.{8})", "$1 "
    )
    payloads = docs.select(
        "doc_id", F.trim(blocks).alias("block_str")
    )
    return simhash_neardup_pairs(
        payloads, id_col="doc_id", text_col="block_str", max_hamming=3,
        repartition_to=spark.sparkContext.defaultParallelism,
    ).orderBy("id_a", "id_b")
