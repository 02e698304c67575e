"""Z-order compaction: multi-dimension row-group pruning.

The claim under test is physical, so the assertions are physical: after
``compact(cluster_by=(x, y), zorder=True)`` the single output file's
row-group min/max stats must admit a narrow filter window on EITHER
column for only a fraction of the row groups, while the lexicographic
sort leaves the trailing column's stats spanning everything (each
leading-column run contains the full trailing range). Plus the
table-stakes invariant: a z-ordered rewrite changes layout, never
results.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from s1tiling_spark.operators.zorder import zorder_key
from s1tiling_spark.plans.store import TierStore

N = 40_000
DIM = 200  # x,y in [0, DIM)


def _morton_ref(vals: tuple[int, ...], bits: int) -> int:
    out = 0
    for j in range(bits):
        for k, v in enumerate(vals):
            out |= ((v >> j) & 1) << (j * len(vals) + k)
    return out


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(1, 0), (0, 1), (2, 3), (65535, 0), (0, 65535), (12345, 54321)]
    df = spark.createDataFrame(rows, "x long, y long")
    bounds = {"x": (0.0, 65535.0), "y": (0.0, 65535.0)}
    got = df.select(
        "x", "y", zorder_key(df, ("x", "y"), bounds).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton_ref((r["x"], r["y"]), 16), (r["x"], r["y"])


def test_zorder_key_many_columns_caps_bits_no_wraparound(spark):
    """5 columns at full 16-bit width would place bits at positions
    >= 64, which the JVM's shift wraps mod 64 onto the LOW bits —
    silently destroying the curve. The key must cap per-column width
    to 63 // n (12 bits at n=5) and stay non-negative."""
    top = (1 << 12) - 1  # 63 // 5 = 12 bits per column
    rows = [(top, 0, 0, 0, 0), (0, 0, 0, 0, top), (100, 200, 300, 400, 500)]
    cols = ("a", "b", "c", "d", "e")
    df = spark.createDataFrame(rows, "a long, b long, c long, d long, e long")
    bounds = {c: (0.0, float(top)) for c in cols}
    got = df.select(
        *cols, zorder_key(df, cols, bounds).alias("z")
    ).collect()
    for r in got:
        want = _morton_ref(tuple(r[c] for c in cols), 12)
        assert r["z"] == want and r["z"] >= 0, tuple(r[c] for c in cols)


def _tier_rows(spark):
    t0 = datetime(2024, 3, 1)
    data = [
        (
            t0 + timedelta(seconds=i % 86_400),
            f"s{i:06d}",  # unique natural key: nothing dedups away
            i % DIM,
            (i * 7919) % DIM,
        )
        for i in range(N)
    ]
    return spark.createDataFrame(
        data, "bucket_start timestamp, source string, x long, y long"
    )


def _rg_hit_fraction(parquet_file: str, col: str, lo: int, hi: int) -> float:
    """Fraction of row groups whose [min,max] intersects [lo, hi)."""
    pf = pq.ParquetFile(parquet_file)
    idx = pf.schema_arrow.names.index(col)
    hits = 0
    for g in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(g).column(idx).statistics
        if st is None or not st.has_min_max:
            return 1.0  # no stats -> nothing prunes
        if st.min < hi and st.max >= lo:
            hits += 1
    return hits / pf.metadata.num_row_groups


@pytest.fixture()
def small_row_groups(spark):
    hconf = spark._jsc.hadoopConfiguration()
    old = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 64 * 1024)
    yield
    if old is None:
        hconf.unset("parquet.block.size")
    else:
        hconf.set("parquet.block.size", old)


def _one_file(store: TierStore, tier: str) -> str:
    files = [f for f in store.read(tier).inputFiles() if f.endswith(".parquet")]
    assert len(files) == 1  # one p_date -> one compacted file
    return files[0].removeprefix("file:")


def _compacted_store(spark, tmp_path, name: str, **compact_kw) -> TierStore:
    store = TierStore(spark, str(tmp_path / name))
    store.append("1h", _tier_rows(spark), store.next_commit_seq(), "seed")
    store.compact("1h", cluster_by=("x", "y"), **compact_kw)
    return store


def test_zorder_prunes_both_dims_lexicographic_only_leading(
    spark, tmp_path, small_row_groups
):
    zstore = _compacted_store(spark, tmp_path, "z", zorder=True)
    lstore = _compacted_store(spark, tmp_path, "lex")

    before = {
        (str(r["bucket_start"]), r["source"], r["x"], r["y"])
        for r in _tier_rows(spark).collect()
    }
    after = {
        (str(r["bucket_start"]), r["source"], r["x"], r["y"])
        for r in zstore.read("1h")
        .select("bucket_start", "source", "x", "y")
        .collect()
    }
    assert after == before  # layout changed, results did not

    zfile, lfile = _one_file(zstore, "1h"), _one_file(lstore, "1h")
    assert pq.ParquetFile(zfile).metadata.num_row_groups >= 8

    window = (90, 110)  # 10% of the [0, DIM) domain
    z_x, z_y = (
        _rg_hit_fraction(zfile, "x", *window),
        _rg_hit_fraction(zfile, "y", *window),
    )
    l_x, l_y = (
        _rg_hit_fraction(lfile, "x", *window),
        _rg_hit_fraction(lfile, "y", *window),
    )
    # lexicographic: tight on the leading column, blind on the trailing
    assert l_x <= 0.5
    assert l_y >= 0.9
    # z-order: BOTH dimensions prune
    assert z_x <= 0.6
    assert z_y <= 0.6


def test_zorder_handles_strings_and_constant_columns(spark, tmp_path):
    """Strings hash (equality locality only), constant columns collapse
    to bucket 0 — neither crashes the key nor perturbs results."""
    store = TierStore(spark, str(tmp_path / "mixed"))
    df = _tier_rows(spark).withColumn("k", F.lit(7).cast("long"))
    store.append("1h", df, store.next_commit_seq(), "seed")
    rep = store.compact("1h", cluster_by=("source", "k"), zorder=True)
    assert rep["rows"] == N
    assert store.read("1h").count() == N
