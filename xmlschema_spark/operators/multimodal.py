"""Multimodal (image/audio/video) column operators.

Binary payloads are opaque `binary` columns + typed metadata; all
compute flows through Arrow-batched mapInArrow so executors move whole
columnar batches, never per-row Python calls — bytes are read as
ZERO-COPY memoryview slices over the Arrow data buffer (same transport
as operators/payload; the mapInPandas round trip materialized a pandas
Series of binary objects per batch and measured ~2x slower on the
payload stage). The container has no real codec libraries, so decode
goes through the deterministic stand-in (fakecodec); every Spark-side
concern — schema, batch shape, column pruning, partitioning — is real
and tested. Swap `_decode_rgb` for a real decoder (PIL/ffmpeg) in
production; the pipeline shape is identical.

Real codec integration is stubbed exactly here:
    _decode_rgb() -> replace with PIL.Image.open / cv2.imdecode
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .. import fakecodec
from .payload import _binary_views


def _decode_rgb(buf) -> np.ndarray:
    """STUB CODEC BOUNDARY: deterministic stand-in decode (accepts any
    buffer-protocol object — memoryview slices included).
    Production: PIL.Image.open(io.BytesIO(buf)).convert('RGB')."""
    _fmt, _w, _h, px = fakecodec.decode(buf)
    return px


def _block_mean_resize(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Box-filter resize via block means — two axis-wise add.reduceat
    passes instead of out_h*out_w per-block np.mean calls (the loop form
    cost ~128us/row at 8x8). Bit-identical to the loop: every block sum
    is an exact integer in float64 (uint8 inputs), so summation order
    cannot change the quotient."""
    h, w, _c = px.shape
    ys = (np.arange(out_h + 1) * h // out_h)
    xs = (np.arange(out_w + 1) * w // out_w)
    a = px.astype(np.float64)
    rs = np.add.reduceat(a, np.maximum(ys[:-1], 0), axis=0)
    rs = np.add.reduceat(rs, np.maximum(xs[:-1], 0), axis=1)
    cnt = (np.maximum(np.diff(ys), 1)[:, None, None]
           * np.maximum(np.diff(xs), 1)[None, :, None])
    return rs / cnt


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

    def run(batches: Iterator) -> Iterator:
        import pyarrow as pa
        schema = pa.schema([
            ("image_id", pa.string()), ("ok", pa.bool_()),
            ("width", pa.int32()), ("height", pa.int32()),
            ("mean_r", pa.float64()), ("mean_g", pa.float64()),
            ("mean_b", pa.float64()), ("std_gray", pa.float64()),
            ("phash", pa.int64()), ("thumb8", pa.list_(pa.float64()))])
        for b in batches:
            ids = b.column(id_col).to_pylist()
            offsets, data, isnull = _binary_views(b.column(bytes_col))
            out = {k: [] for k in ("image_id", "ok", "width", "height",
                                   "mean_r", "mean_g", "mean_b",
                                   "std_gray", "phash", "thumb8")}
            for j in range(b.num_rows):
                out["image_id"].append(str(ids[j]))
                try:
                    if isnull is not None and isnull[j]:
                        raise ValueError("null payload")
                    px = _decode_rgb(data[offsets[j]:offsets[j + 1]])
                except Exception:
                    out["ok"].append(False)
                    for k in ("width", "height", "mean_r", "mean_g",
                              "mean_b", "std_gray", "phash", "thumb8"):
                        out[k].append(None)
                    continue
                g = px.astype(np.float64).mean(axis=2)
                means = px.reshape(-1, 3).mean(axis=0)
                thumb = _block_mean_resize(px, 8, 8).mean(axis=2)
                out["ok"].append(True)
                out["width"].append(int(px.shape[1]))
                out["height"].append(int(px.shape[0]))
                out["mean_r"].append(float(means[0]))
                out["mean_g"].append(float(means[1]))
                out["mean_b"].append(float(means[2]))
                out["std_gray"].append(float(g.std()))
                out["phash"].append(fakecodec.phash64(px))
                out["thumb8"].append([float(x) for x in thumb.ravel()])
            yield pa.RecordBatch.from_pydict(out, schema=schema)

    return narrow.mapInArrow(run, schema=FEATURES_SCHEMA)


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

    def run(batches: Iterator) -> Iterator:
        import pyarrow as pa
        out_schema = pa.schema([
            ("image_id", pa.string()), ("thumb", pa.binary()),
            ("w", pa.int32()), ("h", pa.int32())])
        for b in batches:
            rids = b.column(id_col).to_pylist()
            offsets, data, isnull = _binary_views(b.column(bytes_col))
            ids, thumbs = [], []
            for j in range(b.num_rows):
                ids.append(str(rids[j]))
                try:
                    if isnull is not None and isnull[j]:
                        raise ValueError("null payload")
                    px = _decode_rgb(data[offsets[j]:offsets[j + 1]])
                    small = np.clip(_block_mean_resize(px, out_w, out_h),
                                    0, 255).astype(np.uint8)
                    thumbs.append(fakecodec.encode(small, fmt))
                except Exception:
                    thumbs.append(None)
            yield pa.RecordBatch.from_pydict(
                {"image_id": ids, "thumb": thumbs,
                 "w": [out_w] * len(ids), "h": [out_h] * len(ids)},
                schema=out_schema)

    return narrow.mapInArrow(run, schema=schema)


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
