"""Multimodal (image/audio/video) column operators.

Binary payloads are opaque `binary` columns + typed metadata; all
compute flows through Arrow-batched mapInPandas so executors move whole
columnar batches, never per-row Python calls. The container has no real
codec libraries, so decode goes through the deterministic stand-in
(fakecodec); every Spark-side concern — schema, batch shape, column
pruning, partitioning — is real and tested. Swap `fakecodec.decode` for
a real decoder (PIL/ffmpeg) in production; the pipeline shape is
identical.

Real codec integration is stubbed exactly here:
    _decode_rgb() -> replace with PIL.Image.open / cv2.imdecode
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import fakecodec


def _decode_rgb(buf: bytes) -> np.ndarray:
    """STUB CODEC BOUNDARY: deterministic stand-in decode.
    Production: PIL.Image.open(io.BytesIO(buf)).convert('RGB')."""
    _fmt, _w, _h, px = fakecodec.decode(buf)
    return px


def _block_mean_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Box-filter resize via block means (pure numpy, deterministic)."""
    h, w, c = px.shape
    ys = (np.arange(out_h + 1) * h // out_h)
    xs = (np.arange(out_w + 1) * w // out_w)
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = px[ys[i]:max(ys[i + 1], ys[i] + 1),
                           xs[j]:max(xs[j + 1], xs[j] + 1)].mean(axis=(0, 1))
    return out


FEATURES_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("std_gray", T.DoubleType()),
    T.StructField("phash", T.LongType()),
    T.StructField("thumb8", T.ArrayType(T.DoubleType())),  # 8x8 gray thumb
])


def image_features(df: DataFrame, bytes_col: str = "bytes",
                   id_col: str = "image_id") -> DataFrame:
    """Decode + feature-extract: channel means, gray stddev, perceptual
    hash, 8x8 thumbnail vector (embedding-ish). Only (id, bytes) columns
    are read — everything else pruned at the scan."""
    from ..distribute import ensure_distributed
    ensure_distributed(df.sparkSession)
    narrow = df.select(id_col, bytes_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in FEATURES_SCHEMA.fields}
            for rid, buf in zip(pdf[id_col], pdf[bytes_col]):
                out["image_id"].append(str(rid))
                try:
                    px = _decode_rgb(bytes(buf))
                except Exception:
                    out["ok"].append(False)
                    for k in ("width", "height", "mean_r", "mean_g",
                              "mean_b", "std_gray", "phash", "thumb8"):
                        out[k].append(None)
                    continue
                g = px.astype(np.float64).mean(axis=2)
                thumb = _block_mean_resize(px, 8, 8).mean(axis=2)
                out["ok"].append(True)
                out["width"].append(int(px.shape[1]))
                out["height"].append(int(px.shape[0]))
                out["mean_r"].append(float(px[:, :, 0].mean()))
                out["mean_g"].append(float(px[:, :, 1].mean()))
                out["mean_b"].append(float(px[:, :, 2].mean()))
                out["std_gray"].append(float(g.std()))
                out["phash"].append(fakecodec.phash64(px))
                out["thumb8"].append([float(x) for x in thumb.ravel()])
            yield pd.DataFrame(out)

    return narrow.mapInPandas(run, schema=FEATURES_SCHEMA)


def thumbnails(df: DataFrame, out_w: int = 32, out_h: int = 32,
               bytes_col: str = "bytes", id_col: str = "image_id",
               fmt: str = "png") -> DataFrame:
    """Decode -> box resize -> re-encode thumbnails (batch transform).
    Returns (image_id, thumb binary, w, h)."""
    from ..distribute import ensure_distributed
    ensure_distributed(df.sparkSession)
    narrow = df.select(id_col, bytes_col)
    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, thumbs = [], []
            for rid, buf in zip(pdf[id_col], pdf[bytes_col]):
                ids.append(str(rid))
                try:
                    px = _decode_rgb(bytes(buf))
                    small = np.clip(_block_mean_resize(px, out_w, out_h),
                                    0, 255).astype(np.uint8)
                    thumbs.append(fakecodec.encode(small, fmt))
                except Exception:
                    thumbs.append(None)
            yield pd.DataFrame({"image_id": ids, "thumb": thumbs,
                                "w": out_w, "h": out_h})

    return narrow.mapInPandas(run, schema=schema)


def frame_sample_stub(df: DataFrame, every_n: int = 30,
                      bytes_col: str = "bytes",
                      id_col: str = "video_id") -> DataFrame:
    """Video frame sampling — pipeline shape only; the frame decoder is
    NOT implemented in this container (no ffmpeg). The mapInPandas
    contract (schema, batching, pruning) is the deliverable; production
    swaps the body for av/ffmpeg iteration."""
    schema = T.StructType([
        T.StructField("video_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video decode requires ffmpeg/av — not available in this "
            "environment; see frame_sample_stub docstring")

    return df.select(id_col, bytes_col).mapInPandas(run, schema=schema)


def audio_features_stub(df: DataFrame, every_ms: int = 1000,
                        bytes_col: str = "bytes",
                        id_col: str = "audio_id") -> DataFrame:
    """Audio feature extraction — pipeline shape only; no audio decoder
    in this container (no soundfile/librosa). Production swaps the body
    for frame decode + mel features; schema/batching/pruning are real."""
    schema = T.StructType([
        T.StructField("audio_id", T.StringType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("mel", T.ArrayType(T.DoubleType())),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "audio decode requires soundfile/librosa — not available in "
            "this environment; see audio_features_stub docstring")

    return df.select(id_col, bytes_col).mapInPandas(run, schema=schema)
