"""``spark.readStream.format("snapshot_table")`` — a REAL Structured
Streaming source over the snapshot table format (VERDICT r16 stretch #9,
PySpark 4's Python DataSource API).

``stream_table_changes`` (streaming/jobs.py) is an availableNow-style
driver loop: sound, composable with the idempotent sinks, but outside
Spark's trigger scheduling.  This facade is the missing half — the
snapshot table becomes a first-class streaming SOURCE, so Iceberg's
``spark.readStream.format("iceberg")`` pattern
(/root/reference/telco_spark/append_telco_spark_iceberg.py:20-26 is the
reference's Spark-native wiring) works verbatim:

    spark.dataSource.register(SnapshotTableDataSource)
    (spark.readStream.format("snapshot_table").option("path", tbl.path)
        .load().writeStream.foreachBatch(sink)
        .trigger(availableNow=True).start())

Offset model: ``{"snapshot_id": N}`` — the same axis the driver loop
advances through; Spark owns the offset log (two-phase planned/committed
in its checkpoint), so the replay-determinism contract holds by
construction here.

Execution shape: ``partitions(start, end)`` plans ONE InputPartition per
new data FILE in the append range (manifest-only driver work — the
incremental-scan contract of ``read_incremental``); executors read their
file with pyarrow and yield Arrow record batches, so rows cross the
Python boundary vectorized, never row-at-a-time.  This is the Python
DataSource trade: the scan runs in Python workers (Arrow-batched) rather
than the JVM parquet reader — at 100 TB prefer the native JVM loop for
raw throughput and this facade for trigger/rate integration; both share
the manifest planner, so file pruning and batch extents are identical.
"""

from __future__ import annotations

import glob as _glob
import json
import os
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

MANIFEST = "_snapshots.json"  # formats.snapshot_parquet.MANIFEST (no import:
# this module must stay executor-picklable without pulling the format stack)


def _load_manifest(path: str) -> list[dict]:
    mf = os.path.join(path, MANIFEST)
    if not os.path.exists(mf):
        raise FileNotFoundError(f"not a snapshot table (no {MANIFEST}): {path}")
    with open(mf) as f:
        return json.load(f)


def _main_lineage(snaps: list[dict]) -> list[dict]:
    """Oldest-first snapshots along the current main ancestry — the same
    walk as ``SnapshotParquetTable.main_lineage`` (refs-aware tables keep
    ``main`` pointing at the head; manifest order is commit order and the
    head is the last main-lineage entry, whose ancestry we follow by
    parent id when present, manifest order otherwise)."""
    if not snaps:
        return []
    by_id = {s["snapshot_id"]: s for s in snaps}
    head = snaps[-1]
    if head.get("parent_snapshot_id") is None and len(snaps) > 1:
        # pre-lineage manifests: linear by construction
        return snaps
    chain: list[dict] = []
    cur: dict | None = head
    while cur is not None:
        chain.append(cur)
        pid = cur.get("parent_snapshot_id")
        cur = by_id.get(pid) if pid is not None else None
    return list(reversed(chain))


def _delta_dirs(lineage: list[dict], start_id: int, end_id: int, on_non_append: str):
    """[(snapshot_id, [new data dirs])] for the (start, end] range —
    the incremental-append contract: each append's delta is its
    ``data_dirs`` minus its parent's."""
    by_id = {s["snapshot_id"]: s for s in lineage}
    out: list[tuple[int, list[str]]] = []
    for s in lineage:
        sid = s["snapshot_id"]
        if not (start_id < sid <= end_id):
            continue
        if s["operation"] != "append":
            if on_non_append == "error":
                raise ValueError(
                    f"snapshot {sid} is {s['operation']!r}, not append — a table "
                    "stream only spans appends (option onNonAppend=skip for "
                    "content-neutral rewrites like compaction)"
                )
            continue
        parent = by_id.get(s.get("parent_snapshot_id"))
        seen = set(parent["data_dirs"]) if parent else set()
        out.append((sid, [d for d in s["data_dirs"] if d not in seen]))
    return out


def _spark_to_arrow_type(dt):
    """Arrow type for the stream schema — covers the table formats this
    source serves (scalars, date/timestamp, arrays thereof)."""
    import pyarrow as pa

    from pyspark.sql import types as T

    scalar = {
        T.LongType: pa.int64(),
        T.IntegerType: pa.int32(),
        T.ShortType: pa.int16(),
        T.ByteType: pa.int8(),
        T.DoubleType: pa.float64(),
        T.FloatType: pa.float32(),
        T.StringType: pa.string(),
        T.BooleanType: pa.bool_(),
        T.DateType: pa.date32(),
        T.TimestampType: pa.timestamp("us"),
        T.BinaryType: pa.binary(),
    }
    for cls, at in scalar.items():
        if isinstance(dt, cls):
            return at
    if isinstance(dt, T.ArrayType):
        return pa.list_(_spark_to_arrow_type(dt.elementType))
    if isinstance(dt, T.DecimalType):
        import pyarrow as pa

        return pa.decimal128(dt.precision, dt.scale)
    raise NotImplementedError(f"snapshot_table source: unsupported type {dt}")


class _FilePartition(InputPartition):
    def __init__(self, file: str, data_dir: str):
        self.file = file
        self.data_dir = data_dir


class SnapshotTableStreamReader(DataSourceStreamReader):
    """Offsets are snapshot ids; partitions are new data files."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("snapshot_table source requires .option('path', …)")
        self.on_non_append = options.get("onnonappend", "error")
        if self.on_non_append not in ("error", "skip"):
            raise ValueError(f"onNonAppend must be error|skip, got {self.on_non_append}")
        # rate control (Iceberg's max-files-per-micro-batch analogue /
        # the driver loop's batch_snapshots): cap how many snapshots a
        # STEADY-STATE micro-batch may advance — latestOffset() is the
        # only admission valve the Python DataSource API exposes, and
        # Spark calls it BEFORE initialOffset()/partitions() reveal the
        # committed position (verified empirically), so the first batch
        # of each run is an uncapped catch-up; every batch after it is
        # capped.  This bounds batch size exactly where it matters — a
        # long-running processingTime trigger over a table receiving
        # ongoing commits — without deadlocking availableNow restarts
        # (capping blindly from 0 would pin the availableNow target at or
        # below the committed offset and the run would process nothing).
        self.max_snapshots = int(options.get("maxsnapshotsperbatch", 0)) or None
        if self.max_snapshots is not None and self.max_snapshots <= 0:
            raise ValueError("maxSnapshotsPerBatch must be positive")
        self._last_planned = None  # driver-side cursor for the valve
        self._schema = schema

    # -- offsets (Spark owns the checkpoint; these are pure functions
    # except the rate valve's cursor) ----------------------------------------

    def initialOffset(self) -> dict:
        return {"snapshot_id": 0}

    def latestOffset(self) -> dict:
        lineage = _main_lineage(_load_manifest(self.path))
        head = lineage[-1]["snapshot_id"] if lineage else 0
        if self.max_snapshots is not None and self._last_planned is not None:
            # advance at most N lineage entries past the cursor (ids may be
            # sparse after expiration, so count entries, not id arithmetic)
            newer = [s["snapshot_id"] for s in lineage if s["snapshot_id"] > self._last_planned]
            if newer:
                head = newer[: self.max_snapshots][-1]
        return {"snapshot_id": head}

    def partitions(self, start: dict, end: dict):
        # arm the rate valve at the batch's far edge; max() guards the
        # stale-cursor case after a restart (start = Spark's committed
        # offset, the ground truth the API withholds from latestOffset)
        self._last_planned = max(start["snapshot_id"], end["snapshot_id"])
        lineage = _main_lineage(_load_manifest(self.path))
        parts: list[_FilePartition] = []
        for _sid, dirs in _delta_dirs(
            lineage, start["snapshot_id"], end["snapshot_id"], self.on_non_append
        ):
            for d in dirs:
                for f in sorted(
                    _glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
                ):
                    parts.append(_FilePartition(f, d))
        # Spark requires ≥1 partition; an all-skip range yields no rows
        return parts or [_FilePartition("", "")]

    def commit(self, end: dict) -> None:
        pass  # nothing table-side to release; Spark's offset log is the truth

    # -- executor-side scan (Arrow-batched, one file per task) --------------

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not partition.file:
            return iter(())
        tbl = pq.read_table(partition.file)
        # identity-partition values live only in dir names (hive layout) —
        # re-attach them; transform-derived hidden columns are NOT schema
        # columns and are simply ignored here
        hive: dict[str, str] = {}
        rel = os.path.relpath(os.path.dirname(partition.file), partition.data_dir)
        for seg in rel.split(os.sep):
            if "=" in seg:
                k, _, v = seg.partition("=")
                hive[unquote(k)] = unquote(v)
        arrays, names = [], []
        for field in self._schema.fields:
            at = _spark_to_arrow_type(field.dataType)
            if field.name in tbl.column_names:
                arrays.append(tbl.column(field.name).cast(at))
            elif field.name in hive:
                arrays.append(pa.array([hive[field.name]] * len(tbl)).cast(at))
            else:  # schema evolution: older file lacks the column
                arrays.append(pa.nulls(len(tbl), at))
            names.append(field.name)
        out = pa.table(arrays, names=names)
        return iter(out.to_batches(max_chunksize=1 << 16))


class _StagedFiles(WriterCommitMessage):
    def __init__(self, files: list[str]):
        self.files = files


class SnapshotTableStreamWriter(DataSourceStreamArrowWriter):
    """``writeStream.format("snapshot_table")`` — ONE snapshot per
    micro-batch, exactly-once, with no user-written foreachBatch code:
    executor tasks stream their Arrow batches into staged parquet files
    (the task side of Iceberg's writer split), and ``commit(messages,
    batchId)`` — which Spark runs once per epoch on the driver-side
    DataSource worker, where no SparkSession exists — performs the pure-
    metadata append (``commit_prewritten_append``: footer bounds, parent
    stats carry-forward, atomic manifest rename) stamped with the
    ``(query, batch)`` ledger entry, so a replayed epoch no-ops against
    ``prewritten_batch_committed`` — the same idempotent-writer contract
    as the foreachBatch sinks.  ``abort()`` deletes the staged files.

    Options: ``path`` (target table root; must exist — ``create()`` it,
    possibly empty-schema'd, before starting the stream), ``queryName``
    (ledger scope; REQUIRED so two different streams never collide),
    ``runId`` (optional ledger run scope — pass a fresh id per
    checkpoint lineage, exactly like the foreachBatch sinks derive one
    from the checkpoint's metadata file)."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("snapshot_table sink requires .option('path', …)")
        self.query_name = options.get("queryname")
        if not self.query_name:
            raise ValueError(
                "snapshot_table sink requires .option('queryName', …) — the "
                "idempotence ledger must be scoped to one logical stream"
            )
        self.run_id = options.get("runid")
        self._schema = schema

    # -- executor side -------------------------------------------------------

    def write(self, batches):
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        staging = os.path.join(self.path, "stream-staging")
        os.makedirs(staging, exist_ok=True)
        out = os.path.join(staging, f"task-{uuid.uuid4().hex}.parquet")
        writer = None
        rows = 0
        for rb in batches:
            if writer is None:
                writer = pq.ParquetWriter(out, rb.schema)
            writer.write_table(pa.Table.from_batches([rb]))
            rows += rb.num_rows
        if writer is None:
            return _StagedFiles([])  # empty task
        writer.close()
        return _StagedFiles([out])

    # -- driver-side (DataSource worker: NO SparkSession) --------------------

    def commit(self, messages, batchId: int) -> None:
        import shutil
        import uuid

        from ..formats.snapshot_parquet import (
            commit_prewritten_append,
            prewritten_batch_committed,
        )

        files = [f for m in messages if m is not None for f in m.files]
        mf = os.path.join(self.path, MANIFEST)
        if not os.path.exists(mf):  # CREATE-on-first-commit (standard sink UX)
            os.makedirs(self.path, exist_ok=True)
            tmp = mf + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as fh:
                fh.write("[]")
            os.replace(tmp, mf)
        if prewritten_batch_committed(self.path, self.query_name, batchId, self.run_id):
            for f in files:  # replayed epoch: drop the re-staged files
                if os.path.exists(f):
                    os.remove(f)
            return
        if not files:
            return  # nothing to commit for an empty batch
        # promote the staged files into this snapshot's data dir.
        # NO exist_ok: a crash between these moves and the manifest append
        # leaks the dir, and the replayed epoch recomputes the SAME sid —
        # merging into the leaked dir would silently double every row of
        # the crashed attempt inside one snapshot.  Failing loudly matches
        # the format's mode("errorifexists") write contract; recovery is
        # remove_orphan_files (which reclaims unreferenced data-snap-*
        # dirs), then the replay commits clean.
        raw_tail = _load_manifest(self.path)
        sid = (raw_tail[-1]["snapshot_id"] + 1) if raw_tail else 1
        data_dir = os.path.join(self.path, f"data-snap-{sid:06d}")
        try:
            os.makedirs(data_dir)
        except FileExistsError:
            raise RuntimeError(
                f"data dir {data_dir} already exists — a previous epoch "
                "crashed between staging and its manifest commit; run "
                "remove_orphan_files() on the table, then restart the stream"
            ) from None
        for f in files:
            shutil.move(f, os.path.join(data_dir, os.path.basename(f)))
        props = {
            "streaming_query_id": self.query_name,
            "batch_id": batchId,
            "source": "writeStream.snapshot_table",
        }
        if self.run_id is not None:
            props["streaming_run_id"] = self.run_id
        commit_prewritten_append(
            self.path, data_dir, self._schema.json(), commit_props=props
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            for f in m.files if m is not None else []:
                if os.path.exists(f):
                    os.remove(f)


class SnapshotTableDataSource(DataSource):
    """``format("snapshot_table")`` registration entry point — source AND
    sink halves of the facade."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("snapshot_table source requires .option('path', …)")
        lineage = _main_lineage(_load_manifest(path))
        head = lineage[-1] if lineage else None
        if head is None or not head.get("schema_json"):
            raise ValueError(f"snapshot table at {path} is empty / has no schema")
        return StructType.fromJson(json.loads(head["schema_json"]))

    def streamReader(self, schema: StructType) -> SnapshotTableStreamReader:
        return SnapshotTableStreamReader(schema, dict(self.options))

    def streamWriter(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError("snapshot_table sink is append-only (one snapshot per batch)")
        return SnapshotTableStreamWriter(schema, dict(self.options))
