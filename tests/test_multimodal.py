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
