"""Multimodal column plumbing (SURVEY north-star: image/audio/video as
opaque binary columns with typed metadata).

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub: ``decode_image``/``decode_audio`` raise
NotImplementedError, and the pipeline runs with ``fake_decode_meta`` — a
deterministic stand-in that derives metadata from the md5 of the bytes. What
IS real and tested is everything Spark-side: the binary column, the typed
metadata schema, Arrow-batched ``mapInPandas`` with correct batch iteration,
and the partition-parallel plan (no driver loops, no collect).

At 100 TB the exact same shape holds: binary payloads stay columnar in
parquet, mapInPandas streams Arrow batches through the Python worker, and
the metadata join back is free because extraction is row-aligned.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query

META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, fmt string, width bigint, height bigint, "
    "n_frames bigint, thumb_width bigint, thumb_height bigint"
)

_FORMATS = ("png", "jpeg", "webp")


def decode_image(content: bytes):
    """Real image decode — deliberately stubbed (no codec libs in this
    environment). The Spark plumbing around it is real and tested with
    fake_decode_meta; swap this in production."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; use fake_decode_meta "
        "for plumbing tests"
    )


def decode_audio(content: bytes):
    """Audio decode stub — see decode_image."""
    raise NotImplementedError("audio codecs unavailable in this environment")


def fake_decode_meta(content: bytes) -> dict:
    """Deterministic stand-in decoder: metadata derived from md5(content).
    Matches the SQL oracle exactly (same 60-bit md5-prefix integer)."""
    h = int(hashlib.md5(content).hexdigest()[:15], 16)
    width = 64 + h % 960
    height = 64 + (h >> 8) % 960
    return {
        "n_bytes": len(content),
        "fmt": _FORMATS[h % 3],
        "width": width,
        "height": height,
        "n_frames": 1 + h % 16,
        "thumb_width": min(width, 256),
        "thumb_height": min(height, 256),
    }


def extract_meta(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over a (doc_id, content: binary)
    frame — the mapInPandas harness any real decoder plugs into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_decode_meta(c) for c in pdf["content"]]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return binary_df.mapInPandas(run, schema=META_SCHEMA)


# --------------------------------------------------------------------------
# The full plumbing as an oracle-checked query: text -> binary column ->
# mapInPandas fake-decode -> typed metadata. The oracle recomputes the same
# md5-derived metadata in SQL, proving the Python batch path is lossless and
# deterministic.
@query(
    "dmm_binary_decode_meta",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               CASE h % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                          ELSE 'webp' END AS fmt,
               64 + h % 960 AS width,
               64 + (h >> 8) % 960 AS height,
               1 + h % 16 AS n_frames,
               LEAST(64 + h % 960, 256) AS thumb_width,
               LEAST(64 + (h >> 8) % 960, 256) AS thumb_height
        FROM (
            SELECT doc_id, text,
                   CAST(CAST('0x' || substr(md5(text), 1, 15) AS UBIGINT) AS BIGINT) AS h
            FROM documents WHERE text <> ''
        ) d
    """,
)
def dmm_binary_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("text") != "")
    binary = d.select("doc_id", F.encode("text", "utf-8").alias("content"))
    return extract_meta(binary)
