"""Native Structured Streaming source over a :class:`TierStore`
(the Iceberg ``spark.readStream.format("iceberg")`` analog), built on
PySpark 4's Python DataSource API.

The reference's daemon mode re-polls the product catalog and processes
whatever is new since the last run (`/root/reference/s1tiling/libs/api.py`
drives one full graph per invocation; incrementality is the
skip-existing-products rule, `meta.py:95-103`). This source generalizes
that pull loop into a real streaming relation: **offsets are commit
seqs**, so Spark's own checkpointing provides exactly-once offset
tracking, rate limiting, and restart — no hand-rolled poll loop.

Semantics (matching Iceberg's streaming read contract):

- **Appends-only.** Each micro-batch carries the surviving appended row
  versions whose effective ``commit_seq`` lies in ``(start, end]``.
  Consumers apply newest-wins by ``commit_seq`` exactly as the store's
  own reads do. Equality deletes and rollbacks *behind* the cursor are
  not retracted (Iceberg: ``streaming-skip-delete-snapshots``); commits
  already voided by a rollback at plan time are excluded.
- **WAP/branch aware.** Staged, abandoned, and unmerged-branch commits
  are invisible. A published WAP commit streams at its *publish* seq
  (the file keeps its staged name until compaction bakes the remap;
  the planner rewrites ``commit_seq`` to the publish seq in-flight).
- **Compaction-safe.** A cursor at or past ``min_as_of`` is exact even
  across compactions: compacted files are name-tagged ``m<maxseq>`` and
  row-filtered by seq range (superseded versions dropped by compaction
  were, by the horizon proof on ``read_incremental``, never net rows of
  any in-contract range). A cursor *behind* the horizon raises — never
  a silently thinned batch.
- **Schema pinned at stream start** (Spark streaming relations are
  fixed-schema): the newest data file's physical schema with recorded
  rename/drop/widen ops applied, plus the hive partition column
  ``p_date``. Older files are aligned per-batch: renames resolved,
  added columns null-filled, widened types upcast.

Scale shape: ``latestOffset``/``partitions`` are driver-side metadata
reads (O(new files) via the ``c<seq>-``/``m<maxseq>-`` name manifest —
never a table scan); each :meth:`read` opens exactly one parquet file
in the Arrow worker and yields RecordBatches (zero row-at-a-time
Python). ``maxCommitsPerBatch`` bounds a micro-batch the way Iceberg's
``streaming-max-files-per-micro-batch`` does.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import DateType, StructField, StructType

FORMAT_NAME = "tier_store"


def _store(path: str):
    # metadata-only handle: none of the planner calls touch .spark
    from s1tiling_spark.plans.store import TierStore

    return TierStore(None, path)


def _apply_ops_to_names(names: list[str], ops: list[dict]) -> list[str]:
    """Canonical current names for a physical column list: replay the
    recorded rename/drop history (seq-ascending) over it."""
    out = list(names)
    for op in ops:
        if op["kind"] == "rename" and op["from"] in out:
            out[out.index(op["from"])] = op["to"]
        elif op["kind"] == "drop" and op["col"] in out:
            out.remove(op["col"])
    return out


def _newest_data_file(store, tier: str) -> str | None:
    """Highest-seq live data file (schema authority). Staged/branch
    files are fine here — they share the tier's declared schema."""
    root = store.tier_path(tier)
    if not os.path.isdir(root):
        return None
    best, best_seq = None, -1
    for part in os.listdir(root):
        dpart = os.path.join(root, part)
        if not (part.startswith("p_date=") and os.path.isdir(dpart)):
            continue
        for fn in os.listdir(dpart):
            if not fn.endswith(".parquet"):
                continue
            m = store._FILE_SEQ_RE.match(fn)
            seq = int(m.group(1)) if m else 0
            if seq > best_seq:
                best, best_seq = os.path.join(dpart, fn), seq
    return best


def _pinned_arrow_schema(store, tier: str):
    """The stream's fixed emit schema: newest file's physical schema
    with schema ops applied (renames resolved, drops removed, widens
    upcast), ``p_date`` appended (date32, from the hive dir name)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = _newest_data_file(store, tier)
    if path is None:
        raise ValueError(
            f"tier {tier!r} in {store.base_dir!r} has no data files yet — "
            "the stream schema is pinned from the newest file; create the "
            "tier (one append) before starting the stream"
        )
    def _norm(t):
        # Spark's Arrow bridge takes µs timestamps only; parquet
        # footers report ns — the worker's cast() downscales exactly
        # (micro-bucketed data has no sub-µs component)
        if pa.types.is_timestamp(t) and t.unit == "ns":
            return pa.timestamp("us", tz=t.tz)
        if pa.types.is_list(t):
            return pa.list_(_norm(t.value_type))
        return t

    sch = pq.read_schema(path)
    ops = store._schema_ops(tier)
    fields = []
    for f in sch:
        name = _apply_ops_to_names([f.name], ops)
        if not name:  # dropped
            continue
        typ = _norm(f.type)
        for op in ops:
            if op["kind"] == "widen" and op["col"] == name[0]:
                typ = {"bigint": pa.int64(), "double": pa.float64(),
                       "int": pa.int32(), "smallint": pa.int16()}.get(op["to"], typ)
        fields.append(pa.field(name[0], typ))
    fields.append(pa.field("p_date", pa.date32()))
    return pa.schema(fields)


class _FilePartition(InputPartition):
    """One parquet data file of the micro-batch's commit range.
    Attributes: path, p_date (hive dir value), remap_seq
    (published-WAP commit_seq override), row_range ((start, end] filter
    for compact outputs), excluded (rollback ranges, (lo, hi]),
    rename_ops ((from, to) seq-ordered), ddl (pinned Arrow schema,
    hex-serialized IPC)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


class TierStoreStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema_json: str):
        self.path = options.get("path")
        self.tier = options.get("tier")
        if not self.path or not self.tier:
            raise ValueError(
                "tier_store stream requires .option('path', <store base dir>) "
                "and .option('tier', <tier name>)"
            )
        self.from_seq = str(options.get("from_seq", "0"))
        self.max_commits = int(options.get("maxcommitsperbatch", 0))
        self.schema_json = schema_json
        # admission-control cursor: the newest offset this reader has
        # handed the engine. latestOffset bounds its answer to
        # cursor+K (the Iceberg streaming-max-files-per-micro-batch
        # analog); the engine COMMITS whatever latestOffset returns,
        # so bounding must happen there — truncating in partitions()
        # would skip commits forever. Engine call order (traced on
        # Spark 4.1): fresh stream = latestOffset → initialOffset →
        # partitions; restart = partitions(ckpt, ckpt) replay →
        # latestOffset. So a None cursor inside latestOffset means a
        # FRESH stream, where resolving from_seq is exactly what
        # initialOffset is about to return; restarts re-learn the
        # cursor from the replayed partitions() call.
        self._cursor: int | None = None

    def _resolve_start(self, store) -> int:
        seq = (
            store.last_commit_seq()
            if self.from_seq == "latest"
            else int(self.from_seq)
        )
        horizon = store.min_as_of(self.tier)
        if seq < horizon:
            raise ValueError(
                f"tier {self.tier!r}: stream start seq {seq} predates the "
                f"compaction horizon min_as_of={horizon}; that history was "
                "expired (start from the horizon or re-bootstrap with a "
                "batch read)"
            )
        return seq

    # ---- offsets ----
    def initialOffset(self) -> dict:
        seq = self._resolve_start(_store(self.path))
        self._cursor = seq if self._cursor is None else max(self._cursor, seq)
        return {"seq": seq}

    def latestOffset(self) -> dict:
        store = _store(self.path)
        last = store.last_commit_seq()
        if self.max_commits > 0:
            if self._cursor is None:
                self._cursor = self._resolve_start(store)
            last = min(last, self._cursor + self.max_commits)
        return {"seq": last}

    def commit(self, end: dict) -> None:
        self._cursor = max(self._cursor or 0, int(end["seq"]))

    # ---- planning (driver-side, name-manifest only) ----
    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = int(start["seq"]), int(end["seq"])
        self._cursor = max(self._cursor or 0, lo, hi)
        store = _store(self.path)
        horizon = store.min_as_of(self.tier)
        if lo < horizon:
            raise ValueError(
                f"tier {self.tier!r}: stream cursor {lo} predates the "
                f"compaction horizon min_as_of={horizon}; superseded "
                "versions in that range were expired (restart the stream "
                "from a fresh checkpoint)"
            )
        staged = {int(e["seq"]): e for e in store._staged_entries(self.tier)}
        rb = tuple((int(a), int(b)) for a, b in store._rollback_ranges(self.tier))

        def voided(seq: int) -> bool:
            return any(a < seq <= b for a, b in rb)

        ops = store._schema_ops(self.tier)
        renames = tuple(
            (op["from"], op["to"]) for op in ops if op["kind"] == "rename"
        )
        root = store.tier_path(self.tier)
        parts: list[InputPartition] = []
        if not os.path.isdir(root):
            return parts
        for part in sorted(os.listdir(root)):
            dpart = os.path.join(root, part)
            if not (part.startswith("p_date=") and os.path.isdir(dpart)):
                continue
            p_date = part.split("=", 1)[1]
            for fn in sorted(os.listdir(dpart)):
                if not fn.endswith(".parquet"):
                    continue
                m = store._FILE_SEQ_RE.match(fn)
                if m is None:
                    # legacy unprefixed file: conservatively a compact
                    # output covering all history — row-filter it
                    parts.append(self._mk(dpart, fn, p_date, None, (lo, hi), rb, renames))
                    continue
                seq = int(m.group(1))
                if fn.startswith("c"):
                    entry = staged.get(seq)
                    if entry is not None:
                        if entry["state"] != "published":
                            continue  # staged/abandoned: invisible
                        eff = int(entry["pub_seq"])
                        if lo < eff <= hi and not voided(eff):
                            parts.append(
                                self._mk(dpart, fn, p_date, eff, None, (), renames)
                            )
                        continue
                    if lo < seq <= hi and not voided(seq):
                        parts.append(self._mk(dpart, fn, p_date, None, None, (), renames))
                else:  # m<maxseq>: compact output, may hold in-range rows
                    if seq > lo:
                        parts.append(self._mk(dpart, fn, p_date, None, (lo, hi), rb, renames))
        return parts

    def _mk(self, dpart, fn, p_date, remap, row_range, excluded, renames):
        return _FilePartition(
            path=os.path.join(dpart, fn),
            p_date=p_date,
            remap_seq=remap,
            row_range=row_range,
            excluded=tuple(excluded),
            rename_ops=tuple(renames),
            ddl=self.schema_json,
        )

    # ---- execution (Arrow worker, one file per partition) ----
    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        pinned = pa.ipc.read_schema(
            pa.BufferReader(bytes.fromhex(partition.ddl))
        )
        tbl = pq.read_table(partition.path)
        # resolve historical names to canonical (rename evolution)
        cur = list(tbl.schema.names)
        for old, new in partition.rename_ops:
            if old in cur and new not in cur:
                cur[cur.index(old)] = new
        tbl = tbl.rename_columns(cur)
        if partition.row_range is not None:
            import pyarrow.compute as pc

            lo, hi = partition.row_range
            mask = pc.and_(
                pc.greater(tbl["commit_seq"], pa.scalar(lo)),
                pc.less_equal(tbl["commit_seq"], pa.scalar(hi)),
            )
            for a, b in partition.excluded:
                inside = pc.and_(
                    pc.greater(tbl["commit_seq"], pa.scalar(a)),
                    pc.less_equal(tbl["commit_seq"], pa.scalar(b)),
                )
                mask = pc.and_(mask, pc.invert(inside))
            tbl = tbl.filter(mask)
        if tbl.num_rows == 0:
            return
        n = tbl.num_rows
        cols = []
        for f in pinned:
            if f.name == "p_date":
                import datetime as _dt

                cols.append(
                    pa.array([_dt.date.fromisoformat(partition.p_date)] * n,
                             type=pa.date32())
                )
            elif f.name == "commit_seq" and partition.remap_seq is not None:
                cols.append(pa.array([partition.remap_seq] * n).cast(f.type))
            elif f.name in tbl.schema.names:
                cols.append(tbl[f.name].combine_chunks().cast(f.type))
            else:
                # add-column evolution: older file lacks it → null-fill
                cols.append(pa.nulls(n, type=f.type))
        out = pa.table(cols, schema=pinned)
        yield from out.to_batches(max_chunksize=1 << 16)


class TierStoreDataSource(DataSource):
    """``spark.readStream.format("tier_store")`` — register once per
    session with ``register_tier_store_source(spark)``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        tier = self.options.get("tier")
        if not path or not tier:
            raise ValueError(
                "tier_store requires .option('path', ...) and .option('tier', ...)"
            )
        arrow = _pinned_arrow_schema(_store(path), tier)
        base = from_arrow_schema(
            arrow.remove(arrow.get_field_index("p_date"))
        )
        return StructType(base.fields + [StructField("p_date", DateType())])

    def streamReader(self, schema: StructType) -> TierStoreStreamReader:
        arrow = _pinned_arrow_schema(
            _store(self.options["path"]), self.options["tier"]
        )
        # ship the pinned schema to workers as hex'd Arrow IPC (the
        # partition object must be picklable and self-contained)
        ser = bytes(arrow.serialize()).hex()
        return TierStoreStreamReader(dict(self.options), ser)


def register_tier_store_source(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(TierStoreDataSource)
