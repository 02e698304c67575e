"""Store-lifecycle gated queries: end-to-end IVM through the TierStore.

BEYOND-WINDOW EXTRA (registered after the TPC-H demonstrations and the
driver's 50-entry correctness window — verify with
``python tools/check_oracle.py matview_daily_totals``).

``matview_daily_totals`` is the strongest statement the matview family
can make: a real TierStore lifecycle — partial append, superseding
append (updates + inserts), equality group-delete — maintained purely
INCREMENTALLY through the CDC changelog (three ``refresh`` calls, each
O(touched keys)), must equal a DuckDB full recompute of the final base
state. Any drift in the delete mask, the update_before/update_after
split, the signed delta algebra, or the additive fold shows up as a
hash mismatch.

Reference analog: the incremental re-run layer
(`/root/reference/s1tiling/libs/otbpipeline.py:749-756`) applied to a
downstream aggregate product.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s1tiling_spark.operators.rollup import bucket_sql, rollup_sequences
from s1tiling_spark.plans.matview import AdditiveMatView
from s1tiling_spark.plans.store import TierStore
from s1tiling_spark.registry import register
from s1tiling_spark.sources.sequences import SEQUENCES_ORACLE_CTE, sequences_from_documents

# Final base state after the lifecycle below: the FULL 1h rollup
# (batch 2 supersedes batch 1 everywhere — batch 1's keys are a subset)
# minus the deleted src_hot group. The view is its daily re-aggregate,
# which collapses to a direct daily aggregate of the raw rows.
_ORACLE = (
    f"WITH {SEQUENCES_ORACLE_CTE} "
    f"SELECT {bucket_sql('event_ts', '1d')} AS bucket_start, source, "
    "count(*) AS cnt, CAST(sum(n_tok) AS BIGINT) AS sum_n_tok "
    "FROM sequences WHERE source <> 'src_hot' GROUP BY 1, 2"
)


@register("matview_daily_totals", oracle=_ORACLE)
def matview_daily_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT persisted: the stat rollups prune to (event_ts, source,
    # n_tok) at the parquet scan, so two scans are cheaper than one
    # materialization of the token-bearing rows (measured: persisting
    # the full derivation made this query 4x slower)
    seq = sequences_from_documents(spark, sf_dir)
    base_dir = tempfile.mkdtemp(prefix="s1ts_mv_gate_")
    store = TierStore(spark, base_dir)
    mv = AdditiveMatView(
        store,
        name="daily_totals",
        base_tier="1h",
        base_keys=("bucket_start", "source"),
        group_cols={
            "bucket_start": F.date_trunc("day", F.col("bucket_start")),
            "source": F.col("source"),
        },
        sum_cols=("cnt", "sum_n_tok"),
    )
    # batch 1: rollup of HALF the rows (even doc ids) — wrong totals
    # that batch 2 must supersede via update deltas
    half = seq.filter(F.col("doc_id").substr(-1, 1).isin("0", "2", "4", "6", "8"))
    store.append(
        "1h",
        rollup_sequences(half, "1h").select(
            "bucket_start", "source", "cnt", "sum_n_tok"
        ),
        store.next_commit_seq(),
        "batch-1",
    )
    mv.refresh("mv-1")
    # batch 2: the full rollup — updates every batch-1 key, inserts the
    # buckets only odd rows produced
    store.append(
        "1h",
        rollup_sequences(seq, "1h").select(
            "bucket_start", "source", "cnt", "sum_n_tok"
        ),
        store.next_commit_seq(),
        "batch-2",
    )
    mv.refresh("mv-2")
    # batch 3: equality group-delete of the hot source → delete deltas
    # (base is None when the input tables are empty — zero-row appends
    # create no tier dir; the view must then be typed-empty, not crash)
    base = store.read("1h")
    if base is not None:
        store.delete(
            "1h",
            base.filter(F.col("source") == "src_hot"),
            store.next_commit_seq(),
            "batch-del",
            keys=("bucket_start", "source"),
        )
    mv.refresh("mv-3")
    view = mv.read()
    if view is None:
        out = spark.createDataFrame(
            [], "bucket_start timestamp, source string, cnt long, sum_n_tok long"
        )
    else:
        # the store dir is per-call scratch: pin the result off its
        # files (eager localCheckpoint) so the tree can be removed
        # immediately — repeated gate runs must not accumulate /tmp
        # parquet
        out = view.localCheckpoint(eager=True)
    shutil.rmtree(base_dir, ignore_errors=True)
    return out
