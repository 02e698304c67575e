"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extraction / resize / frame-sampling as
Arrow-batched kernels.

This mirrors the reference's raster handling — opaque pixel payloads
flowing between typed steps (pixel-type registry
`/root/reference/s1tiling/libs/configuration.py:58-70`, whole-image
kernels SURVEY §2.9) — with Spark's ``BinaryType`` as the payload and
``mapInPandas`` as the kernel boundary.

The image/audio codec libraries are not available in this container, so
the *codec* step is stubbed (`decode_backend="fake"`): a deterministic
byte-level interpretation stands in for JPEG/PCM decoding. Everything
Spark-side is real and load-bearing — schema, partitioning, Arrow batch
shape, UDF signatures, metadata propagation — so swapping in a real
codec is a one-function change (`_decode_payload`).

Synthetic media: payload bytes are derived deterministically from the
key (repeated md5 blocks via JVM expressions), so tests and benches are
reproducible with no external data (north rule: no external inputs).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_BYTE_BINS = 16
RESIZE_LEN = 64
FRAME_SIZE = 256

MEDIA_KINDS = ("image", "audio", "video")

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes int, byte_mean double, "
    "byte_std double, byte_hist array<long>, thumb array<double>, "
    "n_frames int, frame_checksums array<long>"
)


def synth_media(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic media table (media_id, kind, payload binary,
    meta struct) — payload = concatenated md5 blocks, 256-4096 bytes."""
    df = spark.range(0, n_rows)
    h = F.xxhash64(F.col("id"), F.lit(seed))
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.pmod(h, F.lit(len(MEDIA_KINDS))) + 1).cast("int"),
    )
    n_blocks = (F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(240)) + 16).cast(
        "int"
    )  # 16..255 blocks of 16 bytes
    payload = F.unhex(
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), n_blocks),
                lambda i: F.md5(F.concat(F.col("id").cast("string"), F.lit("#"), i.cast("string"))),
            ),
            "",
        )
    )
    return df.select(
        F.concat(F.lit("m-"), F.format_string("%08d", F.col("id"))).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            (n_blocks * 16).alias("n_bytes"),
            F.lit("fake/deterministic").alias("codec"),
            F.pmod(h, F.lit(1000)).cast("int").alias("width"),
            F.pmod(h, F.lit(800)).cast("int").alias("height"),
        ).alias("meta"),
    )


def _decode_payload(payload: bytes, kind: str) -> np.ndarray:
    """Codec boundary. Container has no PIL/libav, so 'decode' is the
    deterministic byte interpretation; a real deployment replaces this
    body with PIL.Image.open / av.open and keeps every signature."""
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + feature extraction over Arrow batches: byte stats,
    16-bin histogram, stride-resampled 'thumbnail', frame sampling for
    video-kind rows. One pass, no per-row Python at the Spark layer."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                arr = _decode_payload(bytes(row.payload), row.kind)
                n = len(arr)
                hist = np.bincount(arr >> 4, minlength=N_BYTE_BINS).astype(np.int64)
                # stride 'resize' to RESIZE_LEN points, normalized [0,1]
                idx = (np.arange(RESIZE_LEN) * n) // RESIZE_LEN
                thumb = (arr[idx] / 255.0) if n >= RESIZE_LEN else np.pad(
                    arr / 255.0, (0, RESIZE_LEN - n)
                )
                if row.kind == "video":
                    n_frames = n // FRAME_SIZE
                    frames = arr[: n_frames * FRAME_SIZE].reshape(n_frames, FRAME_SIZE)
                    checksums = frames[::4].sum(axis=1, dtype=np.int64)
                else:
                    n_frames = 0
                    checksums = np.array([], dtype=np.int64)
                out.append(
                    {
                        "media_id": row.media_id,
                        "kind": row.kind,
                        "n_bytes": n,
                        "byte_mean": float(arr.mean()) if n else 0.0,
                        "byte_std": float(arr.std()) if n else 0.0,
                        "byte_hist": hist,
                        "thumb": thumb.astype(np.float64),
                        "n_frames": n_frames,
                        "frame_checksums": checksums,
                    }
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, FEATURE_SCHEMA
    )


def media_stats_by_kind(features: DataFrame) -> DataFrame:
    """Downstream relational agg over extracted features (exact ints)."""
    return features.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("n_bytes").alias("min_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


# ship this module's kernel by value so any SparkSession can run it
import sys as _sys  # noqa: E402

from pyspark import cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
