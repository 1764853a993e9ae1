"""Multimodal columns: opaque binary media + typed metadata (mission brief).

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the same pattern as the raster tile table.  The
image/audio codec libraries are NOT in the target runtime, so the decode
step is stubbed (NotImplementedError) behind an import-try, with a
deterministic fake decoder driving the tests — the Spark-side plumbing
(schema, partitioning, Arrow batch shape, UDF signatures) is real and
exercised end-to-end.

Schema: ``media: binary, media_type: string,
meta: struct<width:int, height:int, channels:int, sample_rate:int>``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", IntegerType()),
        StructField("media", BinaryType()),
        StructField("media_type", StringType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("channels", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                ]
            ),
        ),
    ]
)

try:  # pragma: no cover — codec libs absent in the target runtime
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_image(buf: bytes, meta) -> np.ndarray:
    """Real decode path: PNG, baseline+progressive JPEG, and TIFF via the
    pure-numpy codecs (engine/png.py, engine/jpeg.py, engine/tiff.py —
    always available), any other format via PIL when present; exotic
    formats without PIL raise (the documented stub path)."""
    buf = bytes(buf)
    if buf[:8] == _PNG_SIG:
        from engine import png

        arr = png.decode_png(buf)
        return arr[:, :, None] if arr.ndim == 2 else arr
    if buf[:2] == b"\xFF\xD8":
        from engine import jpeg

        return jpeg.decode_jpeg(buf)
    if buf[:4] in (b"II*\x00", b"MM\x00*"):
        from engine import tiff

        try:
            arr = tiff.decode_tiff(buf, expand_palette=True)
            return arr[:, :, None] if arr.ndim == 2 else arr
        except ValueError:
            if not _HAVE_PIL:     # TIFF variants outside the codec subset
                raise             # (1-bit/CCITT, JPEG-in-TIFF, YCbCr, ...)
    if not _HAVE_PIL:
        raise NotImplementedError(
            "non-PNG/JPEG/TIFF image codec not available in this runtime; "
            "encode fixtures as PNG (engine.png) / JPEG (engine.jpeg) / "
            "TIFF (engine.tiff) or use fake_decode"
        )
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(buf)))  # pragma: no cover


def encode_image(arr: np.ndarray) -> bytes:
    """uint8 (h, w[, c]) → PNG bytes (engine/png.py) — the sink-side codec
    for writing real image fixtures without PIL."""
    from engine import png

    return png.encode_png(arr)


def fake_decode(buf: bytes, meta) -> np.ndarray:
    """Deterministic stand-in decoder: bytes → (h, w, c) uint8 array by
    repeating/truncating the payload.  Stable for a given (buf, meta), so
    feature values are assertable."""
    h, w, c = int(meta["height"]), int(meta["width"]), int(meta["channels"])
    need = h * w * c
    raw = np.frombuffer(buf, dtype=np.uint8)
    tiled = np.resize(raw, need)
    return tiled.reshape(h, w, c)


def extract_image_features(
    media_df: DataFrame, decoder=fake_decode, grid: int = 4
) -> DataFrame:
    """Decode + pool each image into a (grid*grid*channels) float feature
    vector — the feature-extraction stage of a training-data pipeline.
    ``mapInPandas`` over full rows: binary column + struct metadata cross
    the Arrow boundary per batch, features come back as array<float>."""
    out_schema = StructType(
        [
            StructField("media_id", IntegerType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for r in pdf.itertuples():
                arr = decoder(r.media, r.meta if isinstance(r.meta, dict) else r.meta.asDict() if hasattr(r.meta, "asDict") else dict(r.meta)).astype(np.float64)
                h, w, c = arr.shape
                gh, gw = max(h // grid, 1), max(w // grid, 1)
                pooled = (
                    arr[: gh * grid, : gw * grid]
                    .reshape(grid, gh, grid, gw, c)
                    .mean(axis=(1, 3))
                )
                ids.append(r.media_id)
                feats.append(pooled.ravel().astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return media_df.mapInPandas(_feat, out_schema)


def resize_images(media_df: DataFrame, out_w: int, out_h: int, decoder=fake_decode) -> DataFrame:
    """Nearest-neighbor resize → new binary payload + updated metadata
    (the distributed form of a thumbnail stage)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                meta = r.meta if isinstance(r.meta, dict) else dict(r.meta)
                arr = decoder(r.media, meta)
                h, w, c = arr.shape
                yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
                xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
                small = arr[yi][:, xi]
                rows.append(
                    (
                        r.media_id,
                        small.tobytes(),
                        r.media_type,
                        {"width": out_w, "height": out_h, "channels": c, "sample_rate": meta.get("sample_rate")},
                    )
                )
            yield pd.DataFrame(rows, columns=["media_id", "media", "media_type", "meta"])

    return media_df.mapInPandas(_resize, MEDIA_SCHEMA)


def sample_frames(media_df: DataFrame, every_n: int = 4, decoder=fake_decode) -> DataFrame:
    """Frame sampling for video-like blobs: treat height as the frame axis
    and emit every Nth row-strip as its own media row (one→many explode in
    a single mapInPandas pass)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                meta = r.meta if isinstance(r.meta, dict) else dict(r.meta)
                arr = decoder(r.media, meta)
                h, w, c = arr.shape
                for fi, row0 in enumerate(range(0, h, every_n)):
                    frame = arr[row0 : row0 + 1]
                    rows.append(
                        (
                            int(r.media_id) * 10000 + fi,
                            frame.tobytes(),
                            "frame",
                            {"width": w, "height": 1, "channels": c, "sample_rate": meta.get("sample_rate")},
                        )
                    )
            yield pd.DataFrame(rows, columns=["media_id", "media", "media_type", "meta"])

    return media_df.mapInPandas(_frames, MEDIA_SCHEMA)


def make_media_fixture(n: int = 50, seed: int = 42) -> pd.DataFrame:
    """Deterministic media table: payload bytes derived from media_id."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w, h, c = int(rng.integers(8, 24)), int(rng.integers(8, 24)), 3
        payload = (np.arange(i + 1, i + 1 + 256, dtype=np.int64) % 251).astype(np.uint8).tobytes()
        rows.append(
            (i, payload, "image/fake", {"width": w, "height": h, "channels": c, "sample_rate": 0})
        )
    return pd.DataFrame(rows, columns=["media_id", "media", "media_type", "meta"])
