"""Multimodal column handling for training-data pipelines.

Contract: media payloads are opaque `binary` columns plus a typed
metadata struct; decode / feature-extraction steps are Arrow-batched
Pandas UDFs over mapInPandas. The Spark-side plumbing (schemas, batch
iteration, partition sizing) is real; the codec calls are STUBBED
because the container ships no image/audio libraries — swap
`_decode_stub` for PIL/ffmpeg adapters in deployment.

Scale notes: media rows are wide (MBs); keep
spark.sql.files.maxPartitionBytes low enough that a partition of
payloads fits executor memory, and never groupBy on the payload column
— only on metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("format", T.StringType()),  # png/jpeg/wav/...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str, media_type: str = "image", fmt: str = "png"
) -> DataFrame:
    """Test-fixture adapter: encode a text column as the binary payload and
    synthesize deterministic metadata (real pipelines read payload bytes
    from object storage)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            (F.octet_length(payload) % 1024).cast("int").alias("width"),
            (F.octet_length(payload) % 768).cast("int").alias("height"),
            F.lit(0).cast("long").alias("duration_ms"),
        ),
    )


def _decode_stub(payload: bytes, fmt: str) -> dict:
    """Deterministic fake decode: derives 'pixels' stats from the bytes.
    Replace with a real codec (PIL.Image.open etc.) in deployment."""
    if not payload:
        return {"n_bytes": 0, "mean_byte": 0.0, "entropy_proxy": 0.0}
    n = len(payload)
    mean = sum(payload) / n
    distinct = len(set(payload))
    return {
        "n_bytes": n,
        "mean_byte": float(mean),
        "entropy_proxy": float(distinct) / 256.0,
    }


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode + feature-extract over media payloads via mapInPandas.

    Output: (id, n_bytes, mean_byte, entropy_proxy). Batches stream
    through Arrow; nothing is collected driver-side.
    """
    schema = f"{id_col} long, n_bytes long, mean_byte double, entropy_proxy double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, m["format"] if isinstance(m, dict) else m)
                for p, m in zip(pdf["payload"], pdf["media_meta"])
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "mean_byte": [f["mean_byte"] for f in feats],
                    "entropy_proxy": [f["entropy_proxy"] for f in feats],
                }
            )

    return df.select(id_col, "payload", "media_meta").mapInPandas(run, schema)


def _resize_stub(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic fake resize: cycle the payload bytes to w·h length.
    Replace with a real codec resample (PIL Image.resize) in deployment —
    the signature (bytes in, bytes out, no pandas/Spark types) is the
    deployment swap-point."""
    if not payload:
        return b""
    target = max(w * h, 1)
    reps = (target // len(payload)) + 1
    return (payload * reps)[:target]


def resize_images(df: DataFrame, width: int, height: int,
                  id_col: str = "doc_id") -> DataFrame:
    """Resize step over image payloads via mapInPandas: emits the resized
    payload and a metadata struct updated to the new dimensions.

    The plumbing is the real contract — Arrow batch iteration, binary
    in/out, metadata rewrite without touching the payload in JVM
    expressions — while the pixel work is the stubbed codec call.
    Payloads never enter a shuffle; this is a map-only stage, so at
    100 TB it scales with the scan like decode_features."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("media_meta", MEDIA_META_SCHEMA),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                _resize_stub(p if p is not None else b"", width, height)
                for p in pdf["payload"]
            ]
            metas = []
            for m in pdf["media_meta"]:
                d = dict(m) if isinstance(m, dict) else m.asDict()
                d["width"], d["height"] = width, height
                metas.append(d)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "payload": resized,
                 "media_meta": metas}
            )

    return df.select(id_col, "payload", "media_meta").mapInPandas(
        run, out_schema
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    offset, derived from metadata only (the decode of each frame is the
    stubbed step). Demonstrates the explode-by-metadata pattern that
    keeps payload bytes out of the shuffle."""
    offsets = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.col("media_meta.duration_ms"), F.lit(0)),
        F.lit(every_ms).cast("long"),
    )
    return df.withColumn("frame_offset_ms", F.explode(offsets))
