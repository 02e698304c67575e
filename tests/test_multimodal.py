"""Multimodal plumbing: deterministic synth, Arrow-batched feature
kernel, schema/batch-shape invariants, numpy cross-check."""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from s1tiling_spark.operators.multimodal import (
    FRAME_SIZE,
    N_BYTE_BINS,
    RESIZE_LEN,
    extract_features,
    media_stats_by_kind,
    synth_media,
)


def _expected_payload(i: int, n_blocks: int) -> bytes:
    return b"".join(
        hashlib.md5(f"{i}#{j}".encode()).digest() for j in range(1, n_blocks + 1)
    )


def test_synth_media_deterministic(spark):
    a = synth_media(spark, 100).orderBy("media_id").collect()
    b = synth_media(spark, 100).orderBy("media_id").collect()
    assert [r["media_id"] for r in a] == [r["media_id"] for r in b]
    for ra, rb in zip(a, b):
        assert bytes(ra["payload"]) == bytes(rb["payload"])
    # payload matches the md5-block derivation exactly
    r0 = a[0]
    i = int(r0["media_id"].split("-")[1])
    assert bytes(r0["payload"]) == _expected_payload(i, r0["meta"]["n_bytes"] // 16)
    assert r0["meta"]["n_bytes"] == len(bytes(r0["payload"]))


def test_feature_kernel_values(spark):
    media = synth_media(spark, 60).cache()
    feats = extract_features(media).orderBy("media_id").collect()
    raw = {r["media_id"]: (bytes(r["payload"]), r["kind"]) for r in media.collect()}
    assert len(feats) == 60
    for f in feats:
        payload, kind = raw[f["media_id"]]
        arr = np.frombuffer(payload, dtype=np.uint8)
        assert f["n_bytes"] == len(arr)
        assert abs(f["byte_mean"] - arr.mean()) < 1e-9
        assert list(f["byte_hist"]) == list(
            np.bincount(arr >> 4, minlength=N_BYTE_BINS)
        )
        assert len(f["thumb"]) == RESIZE_LEN
        if kind == "video":
            assert f["n_frames"] == len(arr) // FRAME_SIZE
            assert len(f["frame_checksums"]) == (f["n_frames"] + 3) // 4
        else:
            assert f["n_frames"] == 0 and len(f["frame_checksums"]) == 0


def test_media_stats(spark):
    media = synth_media(spark, 120)
    stats = media_stats_by_kind(extract_features(media)).collect()
    assert sum(r["n_media"] for r in stats) == 120
    by_kind = {r["kind"] for r in stats}
    assert by_kind <= {"image", "audio", "video"} and len(by_kind) == 3
    # exact byte totals match the metadata (decode never altered sizes)
    meta_total = media.agg(F.sum(F.col("meta.n_bytes"))).collect()[0][0]
    assert sum(r["total_bytes"] for r in stats) == meta_total


def test_feature_kernel_exact_values_all_outputs(spark):
    """Exact per-row verification of EVERY kernel output — byte_std,
    thumb values, and frame_checksum values included (the vectorized
    rewrite's riskiest paths), over hand-built payloads covering the
    edges: empty payload, payload shorter than RESIZE_LEN, zero-length
    row LAST in the batch (the reduceat-clipping regression case), and
    a video row."""
    rows = [
        ("p-short", "image", bytes(range(10))),
        ("p-video", "video", bytes([i % 251 for i in range(5 * FRAME_SIZE + 37)])),
        ("p-exact64", "audio", bytes([200] * RESIZE_LEN)),
        ("p-long", "image", bytes([i % 256 for i in range(999)])),
        ("p-empty", "audio", b""),  # zero-length LAST in batch
    ]
    df = spark.createDataFrame(
        [(m, k, p) for m, k, p in rows], "media_id string, kind string, payload binary"
    ).coalesce(1)
    got = {r["media_id"]: r for r in extract_features(df).collect()}
    for media_id, kind, payload in rows:
        arr = np.frombuffer(payload, dtype=np.uint8)
        n = len(arr)
        f = got[media_id]
        assert f["n_bytes"] == n
        if n:
            assert abs(f["byte_mean"] - arr.mean()) < 1e-9
            assert abs(f["byte_std"] - arr.std()) < 1e-9
        else:
            assert f["byte_mean"] == 0.0 and f["byte_std"] == 0.0
        assert list(f["byte_hist"]) == list(
            np.bincount(arr >> 4, minlength=N_BYTE_BINS)
        )
        # thumb: stride resample if n >= RESIZE_LEN else prefix + pad
        if n >= RESIZE_LEN:
            idx = (np.arange(RESIZE_LEN) * n) // RESIZE_LEN
            want_thumb = arr[idx] / 255.0
        else:
            want_thumb = np.pad(arr / 255.0, (0, RESIZE_LEN - n))
        assert np.allclose(f["thumb"], want_thumb, atol=1e-12)
        if kind == "video":
            n_frames = n // FRAME_SIZE
            frames = arr[: n_frames * FRAME_SIZE].reshape(n_frames, FRAME_SIZE)
            want_ck = frames[::4].sum(axis=1, dtype=np.int64)
            assert f["n_frames"] == n_frames
            assert list(f["frame_checksums"]) == list(want_ck)
        else:
            assert f["n_frames"] == 0 and list(f["frame_checksums"]) == []
