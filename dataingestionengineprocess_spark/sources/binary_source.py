"""Binary-file media source: ingest a directory of image/audio/video
files as a DataFrame of payloads + decoded features.

The multimodal queries synthesize their payload columns from fixture
text (the container has no media fixtures); THIS module is the real
ingestion path those kernels claim to support: `spark.read.format(
"binaryFile")` lists and reads whole files distributed (one row per
file: path, modificationTime, length, content), and the SAME parsers
(`_decode_pgm` / `_decode_wav` / `_decode_y4m`) decode them inside an
Arrow-batched mapInPandas kernel, routed by each payload's magic
bytes.

Scale notes:
- binaryFile parallelizes by file; `pathGlobFilter` prunes listings.
  Whole-file rows mean executor memory bounds max file size -- for
  multi-GB media you'd chunk upstream or store pointers + range-read
  inside the kernel instead.
- Decode failures become rows with kind='error' (message preserved)
  rather than job failures: one corrupt file must not kill a 100 TB
  backfill (same policy as the CSV rejects path).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: Uniform feature schema across modalities; inapplicable fields null.
MEDIA_FEATURES_SCHEMA = (
    "path string, kind string, width long, height long, n_frames long, "
    "sample_rate long, n_values long, mean_value double, error string"
)


def read_binary_dir(spark: SparkSession, path: str,
                    glob: str | None = None,
                    recursive: bool = True) -> DataFrame:
    """One row per file under ``path``: (path, modificationTime,
    length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def _sniff_decode(path: str, b: bytes) -> dict:
    """Route a payload by magic bytes to the matching real parser."""
    from ..queries.multimodal import _decode_pgm, _decode_wav, _decode_y4m

    row = {"path": path, "kind": None, "width": None, "height": None,
           "n_frames": None, "sample_rate": None, "n_values": None,
           "mean_value": None, "error": None}
    try:
        # Any whitespace may follow the P5 magic per the PGM spec;
        # route on the magic alone and let the parser validate.
        if b[:2] == b"P5" and b[2:3] in (b"\n", b" ", b"\t", b"\r"):
            w, h, arr = _decode_pgm(b)
            from ..queries.multimodal import _luma_sum

            row.update(kind="image", width=w, height=h, n_frames=1,
                       n_values=w * h,
                       mean_value=_luma_sum(arr) / (w * h))
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            rate, _bits, s = _decode_wav(b)
            import numpy as np

            row.update(kind="audio", sample_rate=rate, n_values=len(s),
                       mean_value=(float(np.abs(s).mean())
                                   if len(s) else None))
        elif b.startswith(b"YUV4MPEG2 "):
            w, h, frames = _decode_y4m(b)
            total = sum(int(fr.astype("int64").sum()) for fr in frames)
            row.update(kind="video", width=w, height=h,
                       n_frames=len(frames), n_values=w * h * len(frames),
                       mean_value=(total / (w * h * len(frames))
                                   if frames else None))
        else:
            row.update(kind="error", error="unknown container magic")
    except Exception as e:  # noqa: BLE001 -- corrupt file != dead job
        row.update(kind="error", error=f"{type(e).__name__}: {e}")
    return row


def media_features(files: DataFrame, path_col: str = "path",
                   content_col: str = "content") -> DataFrame:
    """Decode every payload into typed features (MEDIA_FEATURES_SCHEMA),
    Arrow-batched, magic-byte routed."""
    import pandas as pd  # noqa: F811

    src = files.select(path_col, content_col)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = [
                _sniff_decode(p, bytes(c))
                for p, c in zip(pdf[path_col], pdf[content_col])
            ]
            yield pd.DataFrame(rows)

    return src.mapInPandas(batches, schema=MEDIA_FEATURES_SCHEMA)
