"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` stages.

The decode step auto-detects a codec: when Pillow (PIL) is importable the
real decode/resize paths run; in this container (no codecs) ``decode_image``
raises NotImplementedError unless ``fake=True``, in which case a
deterministic fake decoder stands in so the Spark-side plumbing — schema,
batch shape, partitioning, UDF signature — is real and tested either way.
The stage wrappers (``extract_features``/``resize``) default to
``fake_decode=None`` = "real if PIL is present, else fake".

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

try:  # optional codec — absent in this container, present in a real deploy
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False


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

    Real path (PIL importable): decode via ``Image.open``. Without a codec
    and without ``fake=True``: NotImplementedError. ``fake=True`` produces
    a deterministic fake decode derived from the payload bytes so
    downstream plumbing is testable in codec-less environments.
    """
    if not fake:
        if HAS_PIL:
            import io

            with _PILImage.open(io.BytesIO(payload)) as im:
                return {
                    "height": im.height,
                    "width": im.width,
                    "channels": len(im.getbands()),
                }
        raise NotImplementedError(
            "image decode requires an image codec; not available in this "
            "environment — use fake=True for plumbing tests"
        )
    h = (payload[0] if payload else 0) % 64 + 1
    w = (payload[1] if len(payload) > 1 else 0) % 64 + 1
    return {"height": h, "width": w, "channels": 3}


def extract_features(
    df: DataFrame, payload_col: str = "payload", fake_decode: bool | None = None
) -> DataFrame:
    """mapInPandas feature-extraction stage: payload -> (height, width,
    channels, mean_byte). Arrow-batched; one numpy pass per batch.
    ``fake_decode=None`` auto-selects: real decode when PIL is importable
    (payloads must then be actual encoded images), else the fake decoder."""
    import numpy as np

    if fake_decode is None:
        fake_decode = not HAS_PIL

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


def resize_image(
    payload: bytes, height: int, width: int, target: tuple[int, int], fake: bool = False
) -> bytes:
    """Resize an image payload to ``target`` (th, tw).

    Real path (PIL importable): decode, nearest-neighbor resize, return raw
    pixel bytes. The fake path is a deterministic nearest-neighbor
    downsample over the raw bytes treated as an h×w single-channel grid —
    wrong as image math, right as plumbing: output length is exactly th*tw
    and derives only from the input.
    """
    if not fake:
        if HAS_PIL:
            import io

            th, tw = target
            with _PILImage.open(io.BytesIO(payload)) as im:
                return im.resize((tw, th), _PILImage.NEAREST).tobytes()
        raise NotImplementedError(
            "image resize requires an image codec; not available in this "
            "environment — use fake=True for plumbing tests"
        )
    th, tw = target
    if not payload or height < 1 or width < 1:
        return bytes(th * tw)
    grid = payload[: height * width].ljust(height * width, b"\0")
    out = bytearray()
    for r in range(th):
        src_r = r * height // th
        for c in range(tw):
            out.append(grid[src_r * width + (c * width // tw)])
    return bytes(out)


def resize(
    df: DataFrame,
    target: tuple[int, int],
    payload_col: str = "payload",
    fake_decode: bool | None = None,
) -> DataFrame:
    """mapInPandas resize stage: payload + decoded dims -> fixed-size
    payload (the normalization step before batch feature models). Expects
    ``extract_features`` upstream (height/width columns present).
    ``fake_decode=None`` auto-selects like ``extract_features``."""
    if fake_decode is None:
        fake_decode = not HAS_PIL
    th, tw = target
    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + ", resized binary, resized_height int, resized_width int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["resized"] = [
                resize_image(p, h, w, (th, tw), fake=fake_decode)
                for p, h, w in zip(pdf[payload_col], pdf["height"], pdf["width"])
            ]
            pdf["resized_height"] = th
            pdf["resized_width"] = tw
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
