"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` stages.

The decode step is STUBBED (the container has no image/audio codecs):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder stands in so the Spark-side plumbing —
schema, batch shape, partitioning, UDF signature — is real and tested.

Scale notes: binary payloads ride the normal columnar path (parquet BYTE_ARRAY
with dictionary off); feature extraction is one Arrow batch -> numpy roundtrip
per ~10k rows, not per row. Large blobs should set
``spark.sql.files.maxPartitionBytes`` down so a partition holds a bounded
number of payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive an opaque binary column + typed metadata (stand-in for real
    media bytes; the testdata has no binary media column)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        "*",
        payload.alias("payload"),
        F.octet_length(payload).alias("byte_len"),
        F.sha2(payload, 256).alias("sha256"),
        F.lower(F.hex(F.substring(payload, 1, 4))).alias("magic"),
    )


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Decode an image payload to (height, width, channels).

    STUB: real decoding needs an image codec (PIL/opencv), absent from this
    environment. ``fake=True`` produces a deterministic fake decode derived
    from the payload bytes so downstream plumbing is testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires an image codec; not available in this "
            "environment — use fake=True for plumbing tests"
        )
    h = (payload[0] if payload else 0) % 64 + 1
    w = (payload[1] if len(payload) > 1 else 0) % 64 + 1
    return {"height": h, "width": w, "channels": 3}


def extract_features(
    df: DataFrame, payload_col: str = "payload", fake_decode: bool = True
) -> DataFrame:
    """mapInPandas feature-extraction stage: payload -> (height, width,
    channels, mean_byte). Arrow-batched; one numpy pass per batch."""
    import numpy as np

    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + ", height int, width int, channels int, mean_byte double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image(p, fake=fake_decode) for p in pdf[payload_col]]
            pdf = pdf.copy()
            pdf["height"] = [m["height"] for m in metas]
            pdf["width"] = [m["width"] for m in metas]
            pdf["channels"] = [m["channels"] for m in metas]
            pdf["mean_byte"] = [
                float(np.frombuffer(p, dtype=np.uint8).mean()) if len(p) else 0.0
                for p in pdf[payload_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(df: DataFrame, payload_col: str = "payload", every: int = 16) -> DataFrame:
    """Deterministic 'frame sampling' plumbing demo: slice every Nth byte of
    the payload (stand-in for video frame extraction), emitted as one row
    per sampled offset — the explode shape a real frame sampler produces."""
    n = F.octet_length(F.col(payload_col))
    offsets = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(every))
    return df.select(
        "*", F.posexplode(offsets).alias("frame_idx", "byte_offset")
    ).withColumn(
        "frame_byte", F.lower(F.hex(F.substring(F.col(payload_col), F.col("byte_offset"), 1)))
    )
