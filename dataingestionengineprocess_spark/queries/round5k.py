"""Round-4 (continued) additions: audio silence segmentation and the
struct scalar-function battery.

- `multimodal_audio_silence` -- segment-level audio analytics on REAL
  RIFF/WAVE payloads: the same chunk-walking PCM16 parser as
  `multimodal_audio_features` decodes each file inside an
  Arrow-batched mapInPandas kernel, then a numpy run-length pass
  finds the silent segments (|sample| < 6400). The DuckDB oracle
  reconstructs every sample from the synthesis rule and finds the
  SAME runs with the SQL gaps-and-islands idiom over unnested
  samples -- two completely different run-detection implementations
  forced to agree on counts, longest run, and the snapped silence
  ratio. (Voice-activity-style segmentation is the canonical audio
  curation primitive: keep/drop decisions ride exactly these stats.)
- `scalar_struct_funcs` -- closes the Spark 2.7 scalar matrix's
  struct row: struct construction, getField access, array-of-structs
  ordering via array_sort (struct comparison is field-by-field), and
  the posexplode fan-out of a struct array. The oracle computes the
  same VALUES relationally, proving the struct plumbing returns what
  the plain columns say it must.

Reference parity: diagram-only reference (SURVEY.md §0); silence
extends the [C] multimodal mandate, structs the [S] scalar matrix
(BASELINE.json:6).

Registered LAST (queries/__init__._load_all) so the pre-flighted
driver window is never displaced mid-round.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.exact import snap6 as _snap6
from . import register

_SILENCE_T = 6400  # |sample| below this is silence (chars within 25
# ascii codes of 'M'(77) -- letters a..g land silent in the fixture)

# ---------------------------------------------------------------------------
# Silence segments. Spark: real decode + numpy run-length. Oracle:
# synthesis-rule samples, unnest, lag-based run starts, islands for
# the longest run. Empty silent set -> 0 segments, longest 0.
# ---------------------------------------------------------------------------

_SILENCE_ORACLE = f"""
WITH m AS (
  SELECT doc_id, text, 64 + doc_id % 128 AS n, length(text) AS len
  FROM documents
),
v AS (
  SELECT doc_id, n,
         list_transform(range(0, n),
                        i -> (ascii(substring(text, (i % len) + 1, 1))
                              - 77) * 256) AS s
  FROM m
),
x AS (
  SELECT doc_id, n, unnest(range(0, n)) AS idx, s FROM v
),
f AS (
  SELECT doc_id, n, idx,
         CASE WHEN abs(s[idx + 1]) < {_SILENCE_T} THEN 1 ELSE 0 END
           AS silent
  FROM x
),
runs AS (
  SELECT doc_id, n, idx, silent,
         CASE WHEN silent = 1 AND coalesce(lag(silent) OVER (
              PARTITION BY doc_id ORDER BY idx), 0) = 0
              THEN 1 ELSE 0 END AS run_start
  FROM f
),
islands AS (
  SELECT doc_id, count(*) AS run_len
  FROM (
    SELECT doc_id, idx,
           idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx)
             AS grp
    FROM runs WHERE silent = 1
  ) GROUP BY doc_id, grp
),
agg AS (
  SELECT r.doc_id, max(r.n) AS n,
         CAST(sum(r.silent) AS BIGINT) AS n_silent,
         CAST(sum(r.run_start) AS BIGINT) AS n_segments
  FROM runs r GROUP BY r.doc_id
)
SELECT a.doc_id,
       CAST(a.n AS BIGINT) AS n_samples,
       a.n_silent, a.n_segments,
       CAST(coalesce((SELECT max(run_len) FROM islands i
                      WHERE i.doc_id = a.doc_id), 0) AS BIGINT)
         AS longest_run,
       floor(CAST(a.n_silent AS DOUBLE) / a.n * 1e6 + 0.5) / 1e6
         AS silence_ratio_s
FROM agg a
ORDER BY a.doc_id
"""


@register("multimodal_audio_silence", oracle=_SILENCE_ORACLE)
def multimodal_audio_silence(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Silent-segment stats per REAL decoded WAV payload: segment
    count, longest run, snapped silence ratio."""
    import pandas as pd

    from .multimodal import _decode_wav, _wav_payloads

    wavs = _wav_payloads(spark, sf_dir)

    def seg_batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in it:
            out = {"doc_id": pdf["doc_id"], "n_samples": [],
                   "n_silent": [], "n_segments": [], "longest_run": []}
            for p in pdf["payload"]:
                _rate, _bits, s = _decode_wav(bytes(p))
                silent = (np.abs(s) < _SILENCE_T).astype(np.int8)
                out["n_samples"].append(len(s))
                out["n_silent"].append(int(silent.sum()))
                if silent.any():
                    # run-length over the 0/1 mask via change points
                    d = np.diff(np.concatenate(([0], silent, [0])))
                    starts = np.flatnonzero(d == 1)
                    ends = np.flatnonzero(d == -1)
                    out["n_segments"].append(len(starts))
                    out["longest_run"].append(int((ends - starts).max()))
                else:
                    out["n_segments"].append(0)
                    out["longest_run"].append(0)
            yield pd.DataFrame(out)

    return (
        wavs.mapInPandas(
            seg_batches,
            schema="doc_id long, n_samples long, n_silent long, "
                   "n_segments long, longest_run long",
        )
        .select(
            "doc_id", "n_samples", "n_silent", "n_segments",
            "longest_run",
            _snap6(F.col("n_silent").cast("double") / F.col("n_samples"))
            .alias("silence_ratio_s"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Struct battery. The Spark side REALLY routes values through struct
# ops (construct, getField, array_sort of structs, posexplode); the
# oracle states what those values must equal in plain relational
# terms. Struct ordering in Spark is field-by-field, so the sorted
# array's head is the row struct whenever brand < 'ZZZ'.
# ---------------------------------------------------------------------------

_STRUCT_ORACLE = """
WITH p AS (
  SELECT p_partkey, p_brand, p_size FROM part WHERE p_partkey <= 40
)
SELECT p_partkey, CAST(0 AS BIGINT) AS pos,
       p_brand AS brand_out,
       CAST(p_size AS BIGINT) AS size_out
FROM p
UNION ALL
SELECT p_partkey, CAST(1 AS BIGINT) AS pos,
       'ZZZ' AS brand_out,
       CAST(p_size + 1 AS BIGINT) AS size_out
FROM p
ORDER BY p_partkey, pos
"""


@register("scalar_struct_funcs", oracle=_STRUCT_ORACLE)
def scalar_struct_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construct / getField / struct-array sort / posexplode:
    values routed through struct machinery, checked relationally."""
    p = load(spark, sf_dir, "part").where(F.col("p_partkey") <= 40)
    real = F.struct(F.col("p_brand").alias("brand"),
                    F.col("p_size").cast("long").alias("size"))
    sentinel = F.struct(F.lit("ZZZ").alias("brand"),
                        (F.col("p_size") + 1).cast("long").alias("size"))
    # array_sort on structs compares field-by-field: the real row
    # sorts ahead of the 'ZZZ' sentinel, pinning deterministic order
    arr = F.array_sort(F.array(sentinel, real))
    return (
        p.select("p_partkey", F.posexplode(arr).alias("pos", "st"))
        .select(
            "p_partkey", F.col("pos").cast("long").alias("pos"),
            F.col("st").getField("brand").alias("brand_out"),
            F.col("st").getField("size").alias("size_out"),
        )
        .orderBy("p_partkey", "pos")
    )
