"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` pipelines.

The container has no image/audio codecs, so the decode kernels are
STUBS: ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (seeded by
content hash) produces stable features — the Spark-side plumbing
(schema, batch iteration, partition sizing) is real and tested.

Scale notes: binary payloads dominate row size, so these operators
repartition by byte budget (``target_rows_per_batch``) before the
Python stage, select only the payload + id columns into the Arrow
boundary (column pruning), and return slim feature rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
    T.StructField("phash", T.LongType()),
])


def attach_binary_column(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testing helper: synthesize a deterministic binary payload column
    from text (stands in for real image bytes in fixtures)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")) \
             .withColumn("media_type", F.lit("image/fake"))


def _fake_decode(payload: bytes) -> tuple[int, int, float, int]:
    """Deterministic fake image decode: dimensions/luma/phash derived
    from the content digest, stable across runs and partitionings."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = h[2] / 255.0
    phash = int.from_bytes(h[4:12], "big", signed=True)
    return width, height, mean_luma, phash


def extract_image_features(df: DataFrame, id_col: str = "doc_id",
                           payload_col: str = "payload",
                           fake: bool = True,
                           target_rows_per_batch: int = 1024) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas.

    With real codecs installed this is where PIL/ffmpeg decode goes;
    here the kernel is the deterministic fake (or NotImplementedError
    with ``fake=False``), but batching, pruning and schema are real.
    """
    if not fake:
        raise NotImplementedError(
            "real image decoding requires codec libraries not present "
            "in this container; use fake=True for the plumbing path")

    from preql_spark.operators.text import ensure_parallelism
    # Arrow batch size bounds peak memory at the Python boundary
    # (payloads are MBs each in real pipelines); session-level knob,
    # applied here so callers get it without touching configs
    df.sparkSession.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch",
        str(target_rows_per_batch))
    slim = ensure_parallelism(
        df.select(F.col(id_col).alias("doc_id"), F.col(payload_col)))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "mean_luma": [f[2] for f in feats],
                "phash": [f[3] for f in feats],
            })

    return slim.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, id_col: str, n_frames: int) -> DataFrame:
    """Video frame-sampling plumbing: fan each payload row out into
    ``n_frames`` (frame_idx) rows *before* the decode stage so frame
    decodes parallelize across the cluster, not within one task."""
    return df.select(F.col(id_col),
                     F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1)))
                     .alias("frame_idx"))
