"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual decode/resample kernels need
codec libraries that are NOT in this container, so they are stubbed:
importable libs are used when present, otherwise either a clearly-marked
``NotImplementedError`` or a deterministic fake (for pipeline testing).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_T = T.StructType([
    T.StructField("media_type", T.StringType()),
    T.StructField("byte_size", T.LongType()),
    T.StructField("digest", T.StringType()),
])

IMAGE_FEATURES_T = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
])


def media_metadata(data: Column, media_type: str) -> Column:
    """Typed metadata struct for an opaque binary column — native exprs."""
    return F.struct(
        F.lit(media_type).alias("media_type"),
        F.length(data).cast("long").alias("byte_size"),
        F.md5(data).alias("digest"),
    )


def _decode_image_real(buf: bytes) -> np.ndarray:  # pragma: no cover
    try:
        from PIL import Image  # noqa: F401
        import io

        return np.asarray(Image.open(io.BytesIO(buf)))
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires Pillow, which is not in this container; "
            "use deterministic_fake=True to exercise the pipeline"
        ) from e


def _decode_image_fake(buf: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: bytes -> pseudo-image whose shape and
    pixels derive only from the payload (so tests are reproducible)."""
    h = 8 + (len(buf) % 8)
    w = 8 + (buf[0] % 8 if buf else 0)
    arr = np.frombuffer((buf * ((h * w * 3) // max(len(buf), 1) + 1))[: h * w * 3],
                        dtype=np.uint8)
    return arr.reshape(h, w, 3)


def extract_image_features(
    df: DataFrame,
    data_column: str = "data",
    feature_column: str = "image_features",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Decode -> (width, height, mean luminance) via Arrow-batched
    mapInPandas; the batch shape is what a real CV featurizer would use."""
    decode = _decode_image_fake if deterministic_fake else _decode_image_real
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(feature_column, IMAGE_FEATURES_T, True)]
    )
    idx = df.columns.index(data_column)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for buf in pdf.iloc[:, idx]:
                if buf is None:
                    feats.append(None)
                    continue
                img = decode(bytes(buf))
                luma = float(img.astype("f8").mean())
                feats.append({"width": int(img.shape[1]), "height": int(img.shape[0]),
                              "mean_luma": luma})
            pdf[feature_column] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    data_column: str = "data",
    every_n_bytes: int = 1024,
    frame_column: str = "frames",
    deterministic_fake: bool = False,
) -> DataFrame:
    """Video frame sampling stub: emits one binary 'frame' per N bytes of
    payload.  Real frame extraction needs pyav/ffmpeg (absent here); the
    partitioning/explode shape is the real one."""
    if not deterministic_fake:
        raise NotImplementedError(
            "video frame sampling requires pyav/ffmpeg, not in this container; "
            "pass deterministic_fake=True to exercise the pipeline"
        )
    n = F.greatest(F.floor(F.length(data_column) / every_n_bytes).cast("int"), F.lit(0))
    frames = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.substring(F.col(data_column), (i * every_n_bytes + 1).cast("int"), every_n_bytes),
    )
    return df.withColumn(frame_column, frames)
