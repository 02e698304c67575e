"""Codec correctness: encode∘decode == id (bit-exact), property-based +
DataFrame-level block round-trip through applyInPandas/mapInPandas."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from s1tiling_spark.functions.compression import (
    dod_decode,
    dod_encode,
    gorilla_decode,
    gorilla_encode,
)


def _roundtrip_floats(vals):
    arr = np.array(vals, dtype=np.float64)
    out = gorilla_decode(gorilla_encode(arr))
    assert out.view(np.uint64).tolist() == arr.view(np.uint64).tolist()


def _roundtrip_ts(vals):
    arr = np.array(vals, dtype=np.int64)
    out = dod_decode(dod_encode(arr))
    assert out.tolist() == arr.tolist()


def test_gorilla_basic():
    _roundtrip_floats([])
    _roundtrip_floats([1.5])
    _roundtrip_floats([1.5, 1.5, 1.5])
    _roundtrip_floats([0.0, -0.0, math.inf, -math.inf, math.nan, 1e-300, 1e300])
    _roundtrip_floats(np.linspace(-5, 5, 1000))


def test_dod_basic():
    _roundtrip_ts([])
    _roundtrip_ts([1700000000])
    _roundtrip_ts([0, 3600, 7200, 10800])  # constant delta → 1 bit/point
    _roundtrip_ts([0, 1, 100, 50, -3, 10**12])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True, width=64), max_size=300))
def test_gorilla_property(vals):
    _roundtrip_floats(vals)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=300))
def test_dod_property(vals):
    _roundtrip_ts(vals)


def test_dod_compresses_regular_grid():
    """Hourly grid must compress far below 8 bytes/point."""
    ts = np.arange(0, 3600 * 720, 3600, dtype=np.int64)
    enc = dod_encode(ts)
    assert len(enc) < len(ts) * 1.0 + 32  # ~1 bit per point + header


def test_gorilla_compresses_stable_series():
    vals = np.full(720, 42.5)
    enc = gorilla_encode(vals)
    assert len(enc) < 720 * 1.0 + 32


@pytest.mark.usefixtures("spark")
def test_block_roundtrip_dataframe(spark, sf_dir):
    from s1tiling_spark.operators.compress import compress_blocks, decompress_blocks
    from s1tiling_spark.operators.rollup import rollup_sequences
    from s1tiling_spark.sources.sequences import sequences_from_documents

    tier = rollup_sequences(sequences_from_documents(spark, sf_dir), "1h")
    blocks = compress_blocks(tier, "sum_n_tok")
    points = decompress_blocks(blocks).toPandas()
    expected = (
        tier.select("source", "bucket_start", "sum_n_tok")
        .toPandas()
        .astype({"sum_n_tok": "float64"})
        .rename(columns={"sum_n_tok": "value"})
    )
    a = points.sort_values(["source", "bucket_start"]).reset_index(drop=True)
    e = expected.sort_values(["source", "bucket_start"]).reset_index(drop=True)
    assert len(a) == len(e) > 0
    assert (a["source"].values == e["source"].values).all()
    assert (a["bucket_start"].values == e["bucket_start"].values).all()
    assert (a["value"].values == e["value"].values).all()

    # compression must actually compress vs raw 16 B/point
    sizes = blocks.toPandas()
    raw = 16 * sizes["n_points"].sum()
    enc = (sizes["ts_dod"].map(len) + sizes["val_gorilla"].map(len)).sum()
    assert enc < raw


def test_salted_blocks_same_points(spark, sf_dir):
    """Salted sub-blocks must decompress to the identical point set."""
    from s1tiling_spark.operators.compress import compress_blocks, decompress_blocks
    from s1tiling_spark.operators.rollup import rollup_sequences
    from s1tiling_spark.sources.sequences import sequences_from_documents

    tier = rollup_sequences(sequences_from_documents(spark, sf_dir), "1h")
    plain = decompress_blocks(compress_blocks(tier, "sum_n_tok")).toPandas()
    salted = decompress_blocks(
        compress_blocks(tier, "sum_n_tok", n_salts=4)
    ).toPandas()
    key = ["source", "bucket_start", "value"]
    a = plain.sort_values(key).reset_index(drop=True)
    b = salted.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
