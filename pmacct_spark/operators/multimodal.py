"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode / feature-extract / resize /
frame-sample stages.

Schema convention (the part that matters at 100 TB):

    payload   binary        -- the encoded bytes (never parsed by JVM)
    media     struct<kind string, codec string, width int, height int,
                     duration_ms bigint, sample_rate int>
    content_id bigint       -- stable id for partitioning / joins

Plumbing rules:
  - binary stays opaque to Catalyst; all per-item work happens in
    ``mapInPandas`` (Arrow batches) so Python touches columnar buffers,
    never row objects;
  - partition by ``content_id`` hash before decode so batch sizes are
    uniform (decode cost is per-byte, and skewed batches stall a stage);
  - decode output is a new column, not a mutation — lineage stays
    replayable.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernels are STUBS: ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless ``fake=True``, in which case they emit a
deterministic fake feature vector derived from the payload bytes — the
Spark-side schema, batching, and partitioning are real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

MEDIA_STRUCT = (
    "struct<kind: string, codec: string, width: int, height: int, "
    "duration_ms: bigint, sample_rate: int>"
)

FEATURE_DIM = 8


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder: cheap rolling stats
    over the bytes. Replace with PIL/ffmpeg kernels in a full deploy."""
    if not payload:
        return [0.0] * dim
    out = []
    n = len(payload)
    for j in range(dim):
        acc = 0
        for i in range(j, n, dim):
            acc = (acc * 31 + payload[i]) % 1_000_003
        out.append(acc / 1_000_003.0)
    return out


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    out_col: str = "features",
    fake: bool = False,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode + feature-extract over Arrow batches.

    Adds ``out_col: array<float>``. With ``fake=False`` this raises at
    executor time (codec libs absent here) — the plumbing is what this
    module ships.
    """
    if not fake:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg (not in this container); "
            "pass fake=True for the deterministic stub"
        )
    schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(FloatType()))]
    )
    cols = df.columns

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [
                _fake_features(bytes(p)) if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pdf

    if batch_partitions:
        df = df.repartition(batch_partitions, "content_id")
    return df.mapInPandas(kernel, schema=schema)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (content_id, frame_idx, frame_ts_ms, features). Row-expanding
    mapInPandas — output batch larger than input, which Arrow handles
    natively (no explode of a materialized array needed)."""
    if not fake:
        raise NotImplementedError(
            "real frame sampling requires ffmpeg; pass fake=True for the stub"
        )
    schema = StructType(
        [
            StructField("content_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_ts_ms", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, media, raw in zip(
                pdf["content_id"], pdf["media"], pdf[payload_col]
            ):
                dur = int(media["duration_ms"] or 0)
                payload = bytes(raw) if raw is not None else b""
                for k, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    rows.append(
                        {
                            "content_id": cid,
                            "frame_idx": k,
                            "frame_ts_ms": ts,
                            "features": _fake_features(
                                payload[k % max(len(payload), 1):] if payload else b""
                            ),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(kernel, schema=schema)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from `documents` (text bytes as the
    opaque payload) — exercises the schema/partitioning end-to-end with
    real Arrow batches."""
    return docs.select(
        F.col("doc_id").alias("content_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.expr(
            "named_struct('kind', 'image', 'codec', 'fake', "
            "'width', CAST(n_chars AS INT), 'height', CAST(16 AS INT), "
            "'duration_ms', CAST(n_chars * 10 AS BIGINT), "
            "'sample_rate', CAST(0 AS INT))"
        ).alias("media"),
    )
