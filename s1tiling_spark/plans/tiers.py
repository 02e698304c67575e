"""Incremental tier pipeline: plan → rollup → MERGE-append → checkpoint.

The planner is the Spark reincarnation of the reference's task pruning:
"Ignoring %s as the product already exists"
(`/root/reference/s1tiling/libs/otbpipeline.py:749-756`) plus
restart-from-existing-files (`otbpipeline.py:814-819`). Instead of
testing file existence per product, each tier keeps a per-source
watermark (start of the newest materialized bucket). A run:

1. reads watermarks, filters the raw table to ``event_ts >=
   watermark(source)`` (broadcast join against the tiny watermark dim —
   new sources pass entirely). The last committed bucket is recomputed
   in full, so late rows landing in it are MERGED idempotently — the
   north rule's late-data requirement, which the reference explicitly
   does NOT handle (`docs/dataflow-main.rst:148-155`).
2. rolls up only those rows (1h from raw; 1d/30d cascade from the tier
   below, same watermark logic on bucket_start);
3. appends with lineage columns (commit_seq, run_id) — dedup-on-read
   gives MERGE semantics;
4. commits the new watermarks ONLY after the data append. A crash
   between 3 and 4 re-runs the same buckets next time; dedup-on-read
   keeps the newest copy → byte-identical final state (the kill-resume
   guarantee, mirroring the reference's masks-only restart test
   `tests/test_0200306-NR.py:178-256`).

Skew: groupBy partial aggregation already collapses the hot source
map-side (the aggregate equivalent of salting), and AQE handles skewed
shuffle reads. Where partial agg can't help — grouped-map kernels like
block compression, where one (source, block) group is one Python worker
call — an explicit salt sub-splits hot groups (see
``operators/compress.py`` + ``salt_col``). MEASURED at an 80 %-hot
source (PERF.md §14, `tools/scaling_bench.py --mode skew`): cascade
1.15× hot-vs-uniform (neutral), salted compress 6.3× over unsalted,
AQE skew-join split 2.3× with `skew=true` in the final plan.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from s1tiling_spark.operators.compress import compress_blocks
from s1tiling_spark.operators.rollup import (
    merge_hist_long,
    rollup_from_lower,
    rollup_sequences,
    token_hist_long,
)
from s1tiling_spark.plans.store import TierStore, new_run_id


def salt_col(key: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from a high-cardinality key."""
    return F.pmod(F.xxhash64(key), F.lit(n_salts)).cast("int")


@dataclass
class TierPipelineConfig:
    tiers: tuple[str, ...] = ("1h", "1d", "30d")
    hist: bool = True
    compress: bool = True
    compress_value: str = "sum_n_tok"
    metrics: bool = True


@dataclass
class TierPipeline:
    store: TierStore
    cfg: TierPipelineConfig = field(default_factory=TierPipelineConfig)

    # ---------- planning ----------
    def _filter_new(self, df: DataFrame, ts_col: str, tier_key: str) -> DataFrame:
        """Keep rows at/after each source's watermark (whole table for
        unseen sources). Watermarks are tiny → broadcast join."""
        wm = self.store.read_watermarks(tier_key)
        if wm is None:
            return df
        return (
            df.join(F.broadcast(wm), "source", "left")
            .filter(F.col("watermark").isNull() | (F.col(ts_col) >= F.col("watermark")))
            .drop("watermark")
        )

    def _commit(self, tier_key: str, out: DataFrame, run_id: str,
                rows_in_obs: Observation | None, t0: float) -> dict:
        seq = self.store.next_commit_seq()
        # persist the tier rows across the two consumers (data append +
        # watermark max): without it the watermark aggregate re-runs
        # the whole rollup from raw a second time per commit
        out = out.persist()
        try:
            rows_out = self.store.append(tier_key, out, seq, run_id)
            if rows_out:
                wm = out.groupBy("source").agg(
                    F.max("bucket_start").alias("watermark")
                )
                self.store.commit_checkpoint(tier_key, wm, seq, run_id)
        finally:
            out.unpersist()
        wall_ms = int((time.time() - t0) * 1000)
        rows_in = int(rows_in_obs.get["rows_in"]) if rows_in_obs and rows_out else 0
        m = {
            "run_id": run_id,
            "tier": tier_key,
            "partition": "*",
            "rows_in": rows_in,
            "rows_out": rows_out,
            "errors": 0,
            "wall_ms": wall_ms,
        }
        if self.cfg.metrics:
            self.store.append_metrics([m])
        return m

    # ---------- stages ----------
    def _run_stat_tiers(self, seq: DataFrame, run_id: str) -> list[dict]:
        metrics = []
        # 1h from raw
        t0 = time.time()
        obs = Observation()
        fresh = self._filter_new(seq, "event_ts", "1h").observe(
            obs, F.count(F.lit(1)).alias("rows_in")
        )
        t1h_new = rollup_sequences(fresh, "1h")
        metrics.append(self._commit("1h", t1h_new, run_id, obs, t0))
        # cascade upward from the merged (deduped) tier below
        for lower, upper in zip(self.cfg.tiers, self.cfg.tiers[1:]):
            t0 = time.time()
            lower_df = self.store.read(lower)
            if lower_df is None:
                continue
            obs = Observation()
            fresh_lower = self._filter_new(
                lower_df.select("bucket_start", "source", "cnt", "sum_n_tok",
                                "min_n_tok", "max_n_tok"),
                "bucket_start",
                upper,
            ).observe(obs, F.count(F.lit(1)).alias("rows_in"))
            up = rollup_from_lower(fresh_lower, upper)
            metrics.append(self._commit(upper, up, run_id, obs, t0))
        return metrics

    def _run_hist_tiers(self, seq: DataFrame, run_id: str) -> list[dict]:
        metrics = []
        t0 = time.time()
        fresh = self._filter_new(seq, "event_ts", "hist_1d")
        h1d = token_hist_long(fresh, "1d")
        metrics.append(self._commit("hist_1d", h1d, run_id, None, t0))
        t0 = time.time()
        lower = self.store.read("hist_1d", keys=("bucket_start", "source", "bin"))
        if lower is not None:
            fresh_lower = self._filter_new(
                lower.select("bucket_start", "source", "bin", "tok_cnt"),
                "bucket_start",
                "hist_30d",
            )
            h30 = merge_hist_long(fresh_lower, "30d")
            metrics.append(self._commit("hist_30d", h30, run_id, None, t0))
        return metrics

    def _run_blocks(self, run_id: str) -> list[dict]:
        t0 = time.time()
        t1h = self.store.read("1h")
        if t1h is None:
            return []
        fresh = self._filter_new(
            t1h.select("bucket_start", "source", self.cfg.compress_value),
            "bucket_start",
            "blocks_1h",
        )
        blocks = compress_blocks(fresh, self.cfg.compress_value).withColumnRenamed(
            "block_start", "bucket_start"
        )
        return [self._commit("blocks_1h", blocks, run_id, None, t0)]

    # ---------- entry ----------
    def run(self, seq: DataFrame, run_id: str | None = None) -> dict:
        """One incremental run over the (possibly grown) raw table."""
        run_id = run_id or new_run_id()
        metrics = self._run_stat_tiers(seq, run_id)
        if self.cfg.hist:
            metrics += self._run_hist_tiers(seq, run_id)
        if self.cfg.compress:
            metrics += self._run_blocks(run_id)
        return {
            "run_id": run_id,
            "metrics": metrics,
            "rows_out_total": sum(m["rows_out"] for m in metrics),
        }
