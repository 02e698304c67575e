"""Shared cache hygiene: every persist() the engine's operators take is
tracked here so library callers running many queries in one session can
free them all deterministically (bench.py's clearCache() also works,
but a library must not rely on callers nuking the whole cache).

Usage: ``persist_tracked(df)`` instead of ``df.persist()``;
``release_cached()`` unpersists everything tracked (idempotent).
Modules may keep their own ``release_cached`` aliases — they all drain
this one registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []
_PRUNE_AT = 64  # bound registry growth in long-lived sessions


def _prune() -> None:
    """Drop entries that are no longer cached (a caller used
    spark.catalog.clearCache() instead of release_cached()) so the
    registry — and the plan objects it pins — stays bounded."""
    live = []
    for df in _TRACKED:
        try:
            if df.storageLevel.useMemory or df.storageLevel.useDisk:
                live.append(df)
        except Exception:
            pass
    _TRACKED[:] = live


def persist_tracked(df: DataFrame) -> DataFrame:
    if len(_TRACKED) >= _PRUNE_AT:
        _prune()
    df = df.persist()
    _TRACKED.append(df)
    return df


def track(df: DataFrame) -> DataFrame:
    """Register an ALREADY-persisted relation for release."""
    _TRACKED.append(df)
    return df


def release_cached() -> None:
    while _TRACKED:
        try:
            _TRACKED.pop().unpersist()
        except Exception:
            pass
