"""Concurrent write-audit-publish: two OS processes race stage→publish
on one tier.

test_multiwriter.py proves the commit-seq CAS and the meta mutex in
isolation; this proves the COMPOSITION — WAP's staged records live in
the shared metadata JSON (mutex-serialized read-modify-writes) and its
publishes mint seqs through the CAS — under real cross-process races.
Iceberg gets the same guarantee from the catalog's optimistic commit;
this is the file-store analog exercised end-to-end.

Reference analog: the reference validates each product before the
tmp→rename move (`/root/reference/s1tiling/libs/steps.py:123-145`) but
a single Dask client owns all orchestration
(`/root/reference/s1tiling/libs/api.py:220-223`) — two producers
auditing concurrently is exactly the case it never had to survive.
"""

from __future__ import annotations

import textwrap
from datetime import datetime

from s1tiling_spark.plans.store import TierStore

from test_multiwriter import _run_procs

WAP_JOB = textwrap.dedent(
    """
    import sys
    from datetime import datetime

    from s1tiling_spark.session import build_session
    from s1tiling_spark.plans.store import TierStore

    base, wid = sys.argv[1], sys.argv[2]
    spark = build_session(
        master="local[2]", app_name=f"wap-{wid}", shuffle_partitions=2,
        driver_memory="1500m",
    )
    store = TierStore(spark, base)
    t = datetime.fromisoformat("2024-01-01 00:00:00")
    df = spark.createDataFrame(
        [("k", t, int(wid))], "source string, bucket_start timestamp, v long"
    )
    store.stage("w", df, f"cand-{wid}", f"audit-{wid}")
    pub = store.publish("w", f"audit-{wid}")
    print(f"PUB={pub}")
    spark.stop()
    """
)


def test_two_process_stage_publish_race(spark, tmp_path):
    """Two OS processes (own SparkSessions/JVMs) each stage a candidate
    for the SAME key on one tier and publish concurrently: both
    publishes land with distinct re-minted seqs, newest-wins serves the
    later publisher, time travel to the earlier publish seq serves the
    earlier value, and a compact (baking the remaps physically) changes
    nothing a reader can see."""
    base = str(tmp_path / "wapmw")
    TierStore(None, base)
    job = tmp_path / "wap_worker.py"
    job.write_text(WAP_JOB)
    outs = _run_procs(
        [[str(job), base, "1"], [str(job), base, "2"]], timeout=420
    )
    pubs = {}
    for wid, out in zip((1, 2), outs):
        line = [l for l in out.splitlines() if l.startswith("PUB=")][0]
        pubs[wid] = int(line[4:])
    assert pubs[1] != pubs[2] and min(pubs.values()) > 0

    store = TierStore(spark, base)
    winner = max(pubs, key=pubs.get)
    loser = min(pubs, key=pubs.get)

    # raw read: both candidates live, each REMAPPED onto its publish seq
    raw = store.read("w", deduped=False).collect()
    assert sorted((r["v"], r["commit_seq"]) for r in raw) == sorted(
        (w, pubs[w]) for w in (1, 2)
    )
    # newest-wins: the later publish owns the key
    served = store.read("w", keys=("source", "bucket_start")).collect()
    assert [r["v"] for r in served] == [winner]
    # time travel to the earlier publish shows the earlier winner
    as_of = store.read(
        "w", keys=("source", "bucket_start"), as_of_seq=pubs[loser]
    ).collect()
    assert [r["v"] for r in as_of] == [loser]
    # no staged leftovers in 'staging'/'staged' limbo
    states = {e["state"] for e in store._staged_entries("w")}
    assert states == {"published"}

    # compaction bakes the remaps physically; the served state and the
    # staged records are unchanged for every reader
    store.compact("w", keys=("source", "bucket_start"))
    served2 = store.read("w", keys=("source", "bucket_start")).collect()
    assert [r["v"] for r in served2] == [winner]


def test_publish_races_concurrent_append(spark, tmp_path):
    """A writer appends to main BETWEEN another writer's stage and
    publish (same key): the publish re-mints a seq ABOVE the mid-audit
    append, so published-now means committed-now — in-process analog of
    the gate's ordering rule, kept here beside the cross-process race."""
    t = datetime.fromisoformat("2024-01-01 00:00:00")
    schema = "source string, bucket_start timestamp, v long"
    store = TierStore(spark, str(tmp_path / "waprace"))

    def one(v):
        return spark.createDataFrame([("k", t, v)], schema)

    store.stage("w", one(100), "cand", "audit-a")
    mid = store.next_commit_seq()
    store.append("w", one(7), mid, "mid-audit")
    pub = store.publish("w", "audit-a")
    assert pub > mid
    served = store.read("w", keys=("source", "bucket_start")).collect()
    assert [r["v"] for r in served] == [100]
