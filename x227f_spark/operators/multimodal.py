"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed in Arrow batches via ``mapInPandas``.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked deterministic stub (`_stub_decode`) — but every Spark-side
piece is real and tested: binary column handling, batch iteration, UDF
signature/schema, partition-size control. Swapping `_stub_decode` for a PIL
/ torchaudio call is a one-function change.

The driver corpus has no binary column, so the demo derives one
deterministically (utf-8 payload of ``text``); the oracle recomputes the
same stub features in SQL, making even the stub value-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("doc_id long, n_bytes int, magic string, "
                  "stub_width int, stub_height int, decoded boolean")


def _stub_decode(payload: bytes) -> dict:
    """STUB — stands in for image decode (PIL absent in this container).
    Deterministic fake: 'dimensions' derived from payload bytes. A real
    deployment raises NotImplementedError or calls the codec here."""
    return {
        "stub_width": payload[0] % 256 if payload else 0,
        "stub_height": len(payload) % 1024,
        "decoded": True,
    }


def decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → features through mapInPandas (Arrow batch iterator)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with_bytes = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            feats = [
                {"doc_id": d, "n_bytes": len(p), "magic": p[:4].hex(),
                 **_stub_decode(bytes(p))}
                for d, p in zip(pdf["doc_id"], payloads)
            ]
            yield pd.DataFrame(feats)

    return with_bytes.mapInPandas(batches, FEATURE_SCHEMA)


DECODE_FEATURES_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       lower(to_hex(encode(substr(text, 1, 4)))) AS magic,
       ord(substr(text, 1, 1)) % 256 AS stub_width,
       octet_length(encode(text)) % 1024 AS stub_height,
       true AS decoded
FROM documents
"""


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one binary blob → N deterministic "frame"
    rows (UDTF-style mapInPandas fan-out, the video-decode shape)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with_bytes = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, p in zip(pdf["doc_id"], pdf["payload"]):
                p = bytes(p)
                n_frames = min(len(p) // 100 + 1, 4)
                for f_idx in range(n_frames):
                    chunk = p[f_idx * 100:(f_idx + 1) * 100]
                    rows.append({"doc_id": d, "frame_idx": f_idx,
                                 "frame_bytes": len(chunk)})
            yield pd.DataFrame(rows,
                               columns=["doc_id", "frame_idx", "frame_bytes"])

    return with_bytes.mapInPandas(
        batches, "doc_id long, frame_idx int, frame_bytes int")


FRAME_SAMPLE_SQL = """
WITH d AS (
  SELECT doc_id, octet_length(encode(text)) AS n
  FROM documents
)
SELECT doc_id, f_idx::INT AS frame_idx,
       least(n - f_idx * 100, 100)::INT AS frame_bytes
FROM d, LATERAL unnest(range(0, least(n // 100 + 1, 4))) AS t(f_idx)
"""
