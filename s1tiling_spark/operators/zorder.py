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

- numeric/timestamp columns are range-normalized against min/max
  bounds (the store derives them from parquet FOOTERS driver-side —
  zero extra Spark jobs; ``zorder_bounds`` is the one-agg fallback
  when a footer lacks stats). Width is 16 bits, capped at ``63 // n``
  columns-wide so no bit position reaches the long's sign bit — the
  JVM masks shift counts mod 64, so an uncapped 5-column key would
  silently WRAP its high bits onto the low positions;
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


def _normalized(
    df: DataFrame, col: str, lo: float, hi: float, bits: int = BITS
) -> Column:
    """Map ``col`` to a ``bits``-wide integer: ranked by value for
    ordered domains (range-normalized against [lo, hi]), hashed for
    strings."""
    top = (1 << bits) - 1
    dt = dict(df.dtypes)[col]
    if dt == "string":
        return F.xxhash64(F.col(col)).bitwiseAND(F.lit(top))
    v = _as_double(col, dt)
    if hi <= lo:  # constant column: every row is bucket 0
        return F.lit(0).cast("long")
    scaled = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(top)))
    return F.greatest(F.lit(0), F.least(F.lit(top), scaled)).cast("long")


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
    algebra — bits*n shift/mask/or terms, folded by codegen.

    Per-column width is ``min(16, 63 // n)`` so the highest position
    stays below the long's sign bit: the JVM masks shift counts mod 64,
    so positions ≥ 64 would silently WRAP onto the low-order bits and
    destroy the curve (and position 63 would flip the sort's sign).
    Wider column counts trade per-column resolution, never correctness."""
    n = len(cols)
    bits = min(BITS, 63 // n)
    norms = [
        _normalized(df, c, *(bounds.get(c) or (0.0, 0.0)), bits=bits)
        for c in cols
    ]
    key = F.lit(0).cast("long")
    for j in range(bits):
        for k, nc in enumerate(norms):
            bit = F.shiftright(nc, j).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, j * n + k))
    return key
