"""Z-order (Morton) clustering key: multi-dimension row-group pruning.

``compact(cluster_by=...)`` sorts rows lexicographically, which makes
parquet row-group min/max stats tight for the LEADING column only: a
file sorted by (source, bucket_start) prunes perfectly on ``source``
but every row group spans the full bucket range, so a time-range
filter that doesn't also pin the source decodes everything. The
Iceberg/Delta answer is the z-order rewrite strategy: normalize each
cluster column to a fixed-width integer and interleave the bits, so
rows close in ANY dimension are close in the sort — every row group
gets a narrow min/max window in every z-ordered column at once, at the
price of none being perfectly tight.

Everything here is plan-side column algebra (shifts/masks folded by
whole-stage codegen — no UDF, no shuffle beyond the existing
per-partition sort):

- numeric/timestamp columns are range-normalized to 16 bits against
  min/max bounds (one small agg job over the compact input — the only
  extra cost, and compact is already a full rewrite);
- string columns hash to 16 bits (``xxhash64 & 0xffff``): hashing has
  no ORDER locality, but equal values still collapse into the same
  z-neighborhood, so the string column's own row-group min/max stays
  narrow and equality filters prune — the honest limit of z-ordering
  an unordered domain (Iceberg's behavior too: zorder on strings uses
  byte prefixes, likewise order-free beyond the prefix).

The reference has no analog — its products are one file per (tile,
date) with no intra-file layout control (GDAL block layout is fixed,
`/root/reference/s1tiling/libs/otbwrappers/s1_to_s2.py:124-133`); this
is engine-native machinery for the 10^12-row serving path, where a
day partition is hundreds of row groups and the scan's stats filter is
the difference between one decode and all of them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16
_MAX = (1 << BITS) - 1

def _as_double(col: str, dt: str) -> Column:
    if dt.startswith("timestamp") or dt == "date":
        return F.unix_timestamp(F.col(col).cast("timestamp")).cast("double")
    return F.col(col).cast("double")


def _normalized(df: DataFrame, col: str, lo: float, hi: float) -> Column:
    """Map ``col`` to a 16-bit integer: ranked by value for ordered
    domains (range-normalized against [lo, hi]), hashed for strings."""
    dt = dict(df.dtypes)[col]
    if dt == "string":
        return F.xxhash64(F.col(col)).bitwiseAND(F.lit(_MAX))
    v = _as_double(col, dt)
    if hi <= lo:  # constant column: every row is bucket 0
        return F.lit(0).cast("long")
    scaled = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(_MAX)))
    return F.greatest(F.lit(0), F.least(F.lit(_MAX), scaled)).cast("long")


def zorder_bounds(df: DataFrame, cols: tuple[str, ...]) -> dict[str, tuple]:
    """min/max per ordered column (strings need no bounds) — one agg."""
    dts = dict(df.dtypes)
    ordered = [c for c in cols if dts[c] != "string"]
    if not ordered:
        return {}
    aggs = []
    for c in ordered:
        v = _as_double(c, dts[c])
        aggs += [F.min(v).alias(f"_lo_{c}"), F.max(v).alias(f"_hi_{c}")]
    row = df.agg(*aggs).first()
    return {
        c: (row[f"_lo_{c}"], row[f"_hi_{c}"])
        for c in ordered
        if row[f"_lo_{c}"] is not None
    }


def zorder_key(
    df: DataFrame, cols: tuple[str, ...], bounds: dict[str, tuple]
) -> Column:
    """The Morton key: bit j of column k lands at position j*n + k, so
    all columns contribute equally at every scale. Pure bitwise column
    algebra — 16*n shift/mask/or terms, folded by codegen."""
    n = len(cols)
    norms = [
        _normalized(df, c, *(bounds.get(c) or (0.0, 0.0))) for c in cols
    ]
    key = F.lit(0).cast("long")
    for j in range(BITS):
        for k, nc in enumerate(norms):
            bit = F.shiftright(nc, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * n + k))
    return key
