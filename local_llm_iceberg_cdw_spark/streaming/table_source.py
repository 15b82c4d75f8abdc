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

r18 surface: the driver-side planner resolves main's head through
``_refs.json`` (``sessionless_main_lineage``) so WAP branches and
rollbacks stream the PUBLISHED lineage; source options
``startingSnapshotId=<id|latest>`` (bounded catch-up for fresh
checkpoints — the Python API's rate valve cannot cap a run's first
batch) and ``maxFilesPerBatch``/``maxRowsPerBatch`` (admission by
manifest file stats, Iceberg's streaming-max-files/rows analogs); the
sink supports PARTITIONED targets — identity fields (r18) and, since
r19, arithmetic hidden transforms (``days``/``months``/``years``/
``hours``/``truncate``; ``bucket`` stays foreachBatch-only) — via
per-task hive fanout and a layout-preserving sessionless epoch commit,
and detects concurrent commits instead of clobbering them (r19: the
recheck also compares the refs file, catching a concurrent
``rollback_to``).  The CDC twin — every verb class
as tagged change rows — is the driver-loop family's
``stream_table_cdc`` (streaming/jobs.py): its per-batch ``exceptAll``
reconstruction needs a SparkSession, which executor-side ``read()``
does not have.
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


def _main_lineage(path: str) -> list[dict]:
    """Oldest-first snapshots along the current MAIN ancestry — the
    format's own refs-aware walk (``sessionless_main_lineage``:
    ``refs['main']`` from ``_refs.json`` when present, manifest tail
    otherwise; exact ``_backfill_parents`` recovery for pre-lineage
    entries).  Lazy format import: this function runs only on the
    driver-side DataSource worker (``latestOffset``/``partitions``/
    ``schema``) — the same place the sink's ``commit()`` already imports
    the format — so the module's no-format-imports constraint, which
    binds the executor-side ``read()``, still holds.  Without the refs
    resolution a WAP branch append after main's head would stream
    UNPUBLISHED branch rows, and a ``rollback_to`` would keep streaming
    the undone lineage — the exact divergences from the driver loop
    (``stream_table_changes`` → ``main_lineage``) this facade must not
    have."""
    _load_manifest(path)  # keep the not-a-snapshot-table error contract
    from ..formats.snapshot_parquet import sessionless_main_lineage

    return sessionless_main_lineage(path)


def _append_delta_size(s: dict, by_id: dict) -> tuple[int, int]:
    """(new files, new rows) an append snapshot contributes — manifest
    metadata only: each commit recorded per-file stats for its new dir,
    so rate admission never touches data.  Non-appends contribute 0 (a
    rewrite adds no logical rows; skip/error is decided at planning).
    A stats-less legacy dir falls back to a file count via glob (one
    directory listing at planning time) and unknown rows (0 — the
    snapshot still advances, the row valve just can't see it)."""
    if s["operation"] != "append":
        return 0, 0
    parent = by_id.get(s.get("parent_snapshot_id"))
    seen = set(parent["data_dirs"]) if parent else set()
    stats = s.get("file_stats") or {}
    nf = nr = 0
    for d in s["data_dirs"]:
        if d in seen:
            continue
        entries = stats.get(d)
        if entries is None:
            nf += len(_glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))
        else:
            nf += len(entries)
            nr += sum(int(e.get("rows") or 0) for e in entries)
    return nf, nr


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
        T.TimestampNTZType: pa.timestamp("us"),
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
    def __init__(self, file: str, data_dir: str, tag: str | None = None, version: int = 0):
        self.file = file
        self.data_dir = data_dir
        self.tag = tag  # changelog mode: insert | delete_key
        self.version = version


CHANGELOG_COLS = ("_change_type", "_commit_version")


def _changelog_partitions(lineage: list[dict], start_id: int, end_id: int):
    """Tagged file partitions for the (start, end] range in CHANGELOG
    mode — the sessionless-PLANNABLE subset of the CDC surface (VERDICT
    r18 #7): the manifest + files alone determine what changed for

    - the ROOT commit (the initial snapshot: its data files, tagged
      ``insert``),
    - APPEND commits (the new data dir's files, tagged ``insert``), and
    - full-scope MOR equality-DELETE commits (``delete_where_mor``: the
      delete-keys parquet itself, tagged ``delete_key`` — its rows are
      the distinct key tuples of rows that MATCHED in the table, the
      format's equality-delete contract; non-key columns read as NULL).

    Everything else (COW rewrites, merges, compaction, positional
    deletes) needs the two-state ``exceptAll`` reconstruction, which
    requires a SparkSession the executor-side ``read()`` does not have —
    those verbs raise at planning, naming the driver-loop subscription
    ``stream_table_cdc`` (streaming/jobs.py) as the full surface.  At
    100 TB the dominant stream IS appends + MOR deletes, so the
    plannable subset is the operating envelope, not a toy."""
    by_id = {s["snapshot_id"]: s for s in lineage}

    def files_of(d: str) -> list[str]:
        return sorted(_glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))

    parts: list[_FilePartition] = []
    for s in lineage:
        sid = s["snapshot_id"]
        if not (start_id < sid <= end_id):
            continue
        parent = by_id.get(s.get("parent_snapshot_id"))
        if parent is None:
            for d in s["data_dirs"]:  # initial snapshot, insert-tagged
                parts.extend(_FilePartition(f, d, "insert", sid) for f in files_of(d))
            continue
        pdirs = list(parent["data_dirs"])
        pdels = {e["dir"] for e in (parent.get("delete_files") or [])}
        new_dirs = [d for d in s["data_dirs"] if d not in set(pdirs)]
        new_dels = [
            e for e in (s.get("delete_files") or []) if e["dir"] not in pdels
        ]
        if s["operation"] == "append" and new_dirs and not new_dels:
            for d in new_dirs:
                parts.extend(_FilePartition(f, d, "insert", sid) for f in files_of(d))
        elif (
            s["operation"] == "delete"
            and not new_dirs
            and list(s["data_dirs"]) == pdirs
            and len(new_dels) == 1
            and new_dels[0].get("kind") is None
            and os.path.basename(new_dels[0]["dir"]).startswith("delete-snap-")
            and set(new_dels[0].get("applies_to") or []) == set(pdirs)
        ):
            d = new_dels[0]["dir"]
            parts.extend(
                _FilePartition(f, d, "delete_key", sid) for f in files_of(d)
            )
        else:
            raise ValueError(
                f"snapshot {sid} ({s['operation']!r}) is not plannable as a "
                "sessionless changelog — the readStream changelog facade "
                "covers append and full-scope MOR equality-delete commits; "
                "use the driver-loop subscription stream_table_cdc "
                "(streaming/jobs.py) for the full verb surface"
            )
    return parts


class SnapshotTableStreamReader(DataSourceStreamReader):
    """Offsets are snapshot ids; partitions are new data files."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("snapshot_table source requires .option('path', …)")
        self.changelog = str(options.get("changelog", "")).lower() in ("true", "1")
        if self.changelog and options.get("onnonappend") is not None:
            raise ValueError(
                "onNonAppend does not apply in changelog mode — the changelog "
                "DEFINES what changed; non-plannable verbs error at planning "
                "(use the driver-loop stream_table_cdc for the full surface)"
            )
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
        # r18: Iceberg's real admission knobs — snapshots vary wildly in
        # size, so rating by FILES (streaming-max-files-per-micro-batch)
        # or ROWS (streaming-max-rows-per-micro-batch) is what actually
        # bounds executor work per trigger.  Both are manifest-metadata
        # decisions (per-file row counts live in each commit's
        # file_stats), same first-batch caveat as maxSnapshotsPerBatch,
        # and a batch always advances ≥1 snapshot even when that single
        # snapshot alone exceeds a cap (Iceberg's behavior: progress
        # beats starvation).
        self.max_files = int(options.get("maxfilesperbatch", 0)) or None
        if self.max_files is not None and self.max_files <= 0:
            raise ValueError("maxFilesPerBatch must be positive")
        self.max_rows = int(options.get("maxrowsperbatch", 0)) or None
        if self.max_rows is not None and self.max_rows <= 0:
            raise ValueError("maxRowsPerBatch must be positive")
        # bounded catch-up (Iceberg's stream-from-timestamp analogue):
        # because the rate valve above cannot cap the FIRST batch of a
        # run, a fresh checkpoint over a long-lived table would replay
        # the entire backlog.  startingSnapshotId=N starts a NEW
        # checkpoint lineage strictly AFTER snapshot N (exclusive, the
        # same (start, end] convention as the offset ranges);
        # startingSnapshotId=latest starts at main's current head, i.e.
        # new commits only.  Existing checkpoints are unaffected —
        # initialOffset is only consulted when the offset log is empty.
        start_opt = options.get("startingsnapshotid")
        if start_opt is None:
            self.starting_snapshot_id = None
        elif str(start_opt).lower() == "latest":
            self.starting_snapshot_id = "latest"
        else:
            try:
                self.starting_snapshot_id = int(start_opt)
            except ValueError:
                raise ValueError(
                    f"startingSnapshotId must be an integer or 'latest', got {start_opt!r}"
                ) from None
        self._last_planned = None  # driver-side cursor for the valve
        self._schema = schema

    # -- offsets (Spark owns the checkpoint; these are pure functions
    # except the rate valve's cursor) ----------------------------------------

    def initialOffset(self) -> dict:
        if self.starting_snapshot_id is None:
            return {"snapshot_id": 0}
        if self.starting_snapshot_id == "latest":
            lineage = _main_lineage(self.path)
            return {"snapshot_id": lineage[-1]["snapshot_id"] if lineage else 0}
        return {"snapshot_id": self.starting_snapshot_id}

    def latestOffset(self) -> dict:
        lineage = _main_lineage(self.path)
        head = lineage[-1]["snapshot_id"] if lineage else 0
        capped = (
            self.max_snapshots is not None
            or self.max_files is not None
            or self.max_rows is not None
        )
        if capped and self._last_planned is not None:
            # advance lineage entries past the cursor until a cap would be
            # crossed (ids may be sparse after expiration, so count
            # entries, not id arithmetic); always take ≥1 so a single
            # over-cap snapshot still progresses
            by_id = {s["snapshot_id"]: s for s in lineage}
            newer = [s for s in lineage if s["snapshot_id"] > self._last_planned]
            if newer:
                taken = files = rows = 0
                last = newer[0]["snapshot_id"]
                for s in newer:
                    nf, nr = _append_delta_size(s, by_id)
                    if taken >= 1 and (
                        (self.max_snapshots is not None and taken + 1 > self.max_snapshots)
                        or (self.max_files is not None and files + nf > self.max_files)
                        or (self.max_rows is not None and rows + nr > self.max_rows)
                    ):
                        break
                    taken += 1
                    files += nf
                    rows += nr
                    last = s["snapshot_id"]
                head = last
        return {"snapshot_id": head}

    def partitions(self, start: dict, end: dict):
        # arm the rate valve at the batch's far edge; max() guards the
        # stale-cursor case after a restart (start = Spark's committed
        # offset, the ground truth the API withholds from latestOffset)
        self._last_planned = max(start["snapshot_id"], end["snapshot_id"])
        lineage = _main_lineage(self.path)
        if self.changelog:
            parts = _changelog_partitions(
                lineage, start["snapshot_id"], end["snapshot_id"]
            )
            return parts or [_FilePartition("", "")]
        parts = []
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
        tag = getattr(partition, "tag", None)
        arrays, names = [], []
        for field in self._schema.fields:
            at = _spark_to_arrow_type(field.dataType)
            if tag is not None and field.name == "_change_type":
                arrays.append(pa.array([tag] * len(tbl), pa.string()))
                names.append(field.name)
                continue
            if tag is not None and field.name == "_commit_version":
                arrays.append(
                    pa.array([int(partition.version)] * len(tbl), pa.int64())
                )
                names.append(field.name)
                continue
            if field.name in tbl.column_names:
                arrays.append(tbl.column(field.name).cast(at))
            elif field.name in hive:
                # Spark encodes a NULL partition value as the hive default
                # sentinel dir — map it back to nulls, never the literal
                # string (or a cast failure on non-string columns)
                if hive[field.name] == "__HIVE_DEFAULT_PARTITION__":
                    arrays.append(pa.nulls(len(tbl), at))
                else:
                    arrays.append(pa.array([hive[field.name]] * len(tbl)).cast(at))
            else:  # schema evolution: older file lacks the column
                arrays.append(pa.nulls(len(tbl), at))
            names.append(field.name)
        out = pa.table(arrays, names=names)
        return iter(out.to_batches(max_chunksize=1 << 16))


_SINK_TIME_FORMATS = {
    "years": "%Y",
    "months": "%Y-%m",
    "days": "%Y-%m-%d",
    "hours": "%Y-%m-%d-%H",
}


def _derive_sink_partition_batch(batch, fields: list[dict]):
    """Append transform-derived hive columns to one Arrow record batch —
    the executor half of hidden partitioning on the sink path, in pure
    pyarrow (no SparkSession in a DataSource write task).  Must agree
    BYTE-FOR-BYTE with the format's Spark-side derivations
    (``partition_transform_expr`` → ``partitionBy`` dir names), pinned by
    ``test_round19_invariants``:

    - time transforms: ``pc.strftime`` with the same fixed-width pattern
      ``date_format`` uses (``days`` renders the same ``yyyy-MM-dd`` a
      DateType partition value does);
    - ``truncate(w)``: ints floor to a multiple of w via an explicit
      pmod (Arrow's integer division is C-truncating, Spark's ``pmod``
      is non-negative — ``-7`` must land in ``-8``, not ``-4``);
      strings take the w-codepoint prefix (``utf8_slice_codeunits``,
      matching ``F.substring``);
    - ``bucket(n)`` is rejected upstream: reproducing Spark's
      murmur3_x86_32 here without an exact cross-check would silently
      mis-prune.

    NULL source values derive NULL, which the hive fanout writes as the
    ``__HIVE_DEFAULT_PARTITION__`` sentinel dir — the same dir Spark's
    writer produces and both readers map back to NULL."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arrays = list(batch.columns)
    names = list(batch.schema.names)
    for f in fields:
        t = f["transform"]
        if t == "identity":
            continue
        src = batch.column(names.index(f["source"]))
        if t in _SINK_TIME_FORMATS:
            der = pc.strftime(src, format=_SINK_TIME_FORMATS[t])
        elif t == "truncate":
            if pa.types.is_string(src.type) or pa.types.is_large_string(src.type):
                der = pc.utf8_slice_codeunits(src, 0, f["param"])
            else:
                w = pa.scalar(f["param"], src.type)
                zero = pa.scalar(0, src.type)
                rem = pc.subtract(src, pc.multiply(pc.divide(src, w), w))
                pmod = pc.if_else(pc.less(rem, zero), pc.add(rem, w), rem)
                der = pc.subtract(src, pmod)
        else:  # pragma: no cover - ctor validation rejects these
            raise ValueError(f"unsupported sink transform {t!r}")
        arrays.append(der)
        names.append(f["name"])
    return pa.record_batch(arrays, names=names)


class _StagedFiles(WriterCommitMessage):
    def __init__(self, files: list[str], base: str = ""):
        self.files = files
        self.base = base  # the task's staging root: rel(file, base) is the
        # hive-layout path each file keeps inside the snapshot's data dir


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
    from the checkpoint's metadata file), ``partitionBy`` (comma-joined
    identity columns — only consulted when the sink CREATES the table on
    first commit; an existing table's own spec always governs).

    Partitioned targets (r18, VERDICT r17 #4): when the target's spec is
    IDENTITY fields, each task fans its Arrow stream out into a hive
    layout under its staging dir (``pyarrow.dataset.write_dataset`` —
    the task side of Iceberg's fanout writer; partition columns live in
    dir names, not files, exactly like the table class's
    ``_write_data_dir``), and the epoch commit moves each file under the
    snapshot's data dir PRESERVING its hive path.  A 100 TB sink is
    always partitioned — this keeps partition pruning alive on
    sink-written tables.

    Hidden-transform specs (r19, VERDICT r18 #4): ``days()``/``months()``
    /``years()``/``hours()``/``truncate(w)`` targets work too — each is
    pure arithmetic, derived per Arrow batch in the write task
    (``_derive_sink_partition_batch``) and pinned byte-for-byte against
    the format's Spark-side dir names; a 100 TB streaming sink is
    time-partitioned, so the facade must cover it.  ``bucket(n)`` stays
    foreachBatch-only: reproducing Spark's murmur3_x86_32 in pyarrow has
    no exact cross-check, and a wrong dir name would silently
    mis-prune."""

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
        # resolve the target's partition spec ONCE, driver-side (this
        # ctor runs in the driver's DataSource worker before the writer
        # is pickled to executors — the same place commit() already
        # imports the format): an existing table's head spec governs; a
        # yet-to-be-created table takes .option("partitionBy", "c1,c2").
        from ..formats.snapshot_parquet import parse_partition_field

        spec: list[str] | None = None
        head = None
        if os.path.exists(os.path.join(self.path, MANIFEST)):
            from ..formats.snapshot_parquet import (
                _sessionless_head,
                _sessionless_load,
            )

            head = _sessionless_head(self.path, _sessionless_load(self.path))
            spec = (head or {}).get("partition_by")
        opt_spec = [
            c.strip() for c in (options.get("partitionby") or "").split(",") if c.strip()
        ]
        if opt_spec:
            # an EXISTING table's spec always governs — including spec
            # None, which means "unpartitioned", not "unset" (a head with
            # no partition_by must not silently adopt the option and fan
            # out a layout the commit will then reject)
            if head is None:
                spec = opt_spec
            elif opt_spec != (spec or []):
                raise ValueError(
                    f"partitionBy option {opt_spec} conflicts with the existing "
                    f"table's spec {spec} — an existing table's spec governs"
                )
        schema_names = [f.name for f in schema.fields]
        fields: list[dict] = []
        for fld in spec or []:
            f = parse_partition_field(fld)  # raises on unknown fn(...) shapes
            if f["transform"] == "bucket":
                raise ValueError(
                    f"snapshot_table sink: partition field {fld!r} is not "
                    "supported on this path — deriving Spark's murmur3 bucket "
                    "in the Arrow writer has no exact cross-check; use a "
                    "foreachBatch sink with table.append() for bucket() layouts"
                )
            if f["source"] not in schema_names:
                raise ValueError(
                    f"partition source column {f['source']!r} is not in the "
                    f"stream schema ({schema_names})"
                )
            if f["transform"] != "identity" and f["name"] in schema_names:
                raise ValueError(
                    f"partition field {fld!r} derives hidden column "
                    f"{f['name']!r}, which already exists in the schema"
                )
            if f["transform"] in _SINK_TIME_FORMATS:
                st = schema[f["source"]].dataType.simpleString()
                if st not in ("timestamp", "timestamp_ntz", "date"):
                    raise ValueError(
                        f"partition field {fld!r} needs a timestamp/date "
                        f"source on the sink path, got {st}"
                    )
            fields.append(f)
        self.partition_by = spec or None
        self._spec_fields = fields or None

    # -- executor side -------------------------------------------------------

    def write(self, batches):
        import itertools
        import uuid

        import pyarrow as pa
        import pyarrow.dataset as pds

        it = iter(batches)
        try:
            first = next(it)
        except StopIteration:
            return _StagedFiles([])  # empty task
        task_dir = os.path.join(
            self.path, "stream-staging", f"task-{uuid.uuid4().hex}"
        )
        os.makedirs(task_dir, exist_ok=True)
        part = None
        if self._spec_fields:
            # hive fanout: partition values become k=v dirs (NULL → the
            # __HIVE_DEFAULT_PARTITION__ sentinel, which the source facade
            # and Spark's reader both map back to NULL); the layout columns
            # are dropped from the files, same as _write_data_dir.  For
            # transform fields the DERIVED column (ts_day=…) is the layout
            # column — it is appended per batch, fanned out on, and
            # dropped, while its SOURCE column stays in the files (the
            # "hidden" half of hidden partitioning)
            fields = self._spec_fields
            first = _derive_sink_partition_batch(first, fields)
            it = (_derive_sink_partition_batch(b, fields) for b in it)
            layout = [
                f["source"] if f["transform"] == "identity" else f["name"]
                for f in fields
            ]
            part = pds.partitioning(
                pa.schema([first.schema.field(c) for c in layout]),
                flavor="hive",
            )
        written: list[str] = []
        pds.write_dataset(
            itertools.chain([first], it),
            task_dir,
            format="parquet",
            schema=first.schema,
            partitioning=part,
            basename_template="part-{i}-" + uuid.uuid4().hex[:8] + ".parquet",
            file_visitor=lambda f: written.append(os.path.abspath(f.path)),
            existing_data_behavior="overwrite_or_ignore",
        )
        return _StagedFiles(written, task_dir)

    # -- driver-side (DataSource worker: NO SparkSession) --------------------

    def commit(self, messages, batchId: int) -> None:
        import shutil
        import uuid

        from ..formats.snapshot_parquet import (
            commit_prewritten_append,
            prewritten_batch_committed,
        )

        # (abs file, path it keeps under the snapshot's data dir): tasks
        # stage hive trees, so each file's layout path is its path
        # relative to the task's staging root
        files = [
            (f, os.path.relpath(f, m.base) if getattr(m, "base", "") else os.path.basename(f))
            for m in messages
            if m is not None
            for f in m.files
        ]
        mf = os.path.join(self.path, MANIFEST)
        if not os.path.exists(mf):  # CREATE-on-first-commit (standard sink UX)
            os.makedirs(self.path, exist_ok=True)
            tmp = mf + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as fh:
                fh.write("[]")
            os.replace(tmp, mf)
        if prewritten_batch_committed(self.path, self.query_name, batchId, self.run_id):
            for f, _rel in files:  # replayed epoch: drop the re-staged files
                if os.path.exists(f):
                    os.remove(f)
            self._drop_task_dirs(messages)
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
        for f, rel in files:
            dest = os.path.join(data_dir, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            shutil.move(f, dest)
        self._drop_task_dirs(messages)
        props = {
            "streaming_query_id": self.query_name,
            "batch_id": batchId,
            "source": "writeStream.snapshot_table",
        }
        if self.run_id is not None:
            props["streaming_run_id"] = self.run_id
        commit_prewritten_append(
            self.path,
            data_dir,
            self._schema.json(),
            commit_props=props,
            partition_by=self.partition_by,
        )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            for f in m.files if m is not None else []:
                if os.path.exists(f):
                    os.remove(f)
        self._drop_task_dirs(messages)

    @staticmethod
    def _drop_task_dirs(messages) -> None:
        """Remove a message's now-empty task-<uuid> staging tree once its
        files are gone (replay/abort) — otherwise stream-staging
        accumulates one dead dir per replayed or aborted task forever
        (ADVICE r18).  The successful-commit path moves the files out
        but keeps this sweep too, via the same helper, in commit()."""
        import shutil

        for m in messages:
            base = getattr(m, "base", "") if m is not None else ""
            if base and os.path.isdir(base):
                if not any(files for _r, _d, files in os.walk(base)):
                    shutil.rmtree(base, ignore_errors=True)


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
        lineage = _main_lineage(path)
        head = lineage[-1] if lineage else None
        if head is None or not head.get("schema_json"):
            raise ValueError(f"snapshot table at {path} is empty / has no schema")
        schema = StructType.fromJson(json.loads(head["schema_json"]))
        if str(self.options.get("changelog", "")).lower() in ("true", "1"):
            from pyspark.sql.types import LongType, StringType, StructField

            for name in CHANGELOG_COLS:
                if name in schema.fieldNames():
                    raise ValueError(
                        f"changelog mode reserves column {name!r}, which the "
                        "table schema already defines"
                    )
            schema = StructType(
                [
                    # every table column turns nullable: a delete_key row
                    # carries only the delete's key columns, everything
                    # else reads as NULL regardless of the table's flags
                    *(
                        StructField(f.name, f.dataType, True, f.metadata)
                        for f in schema.fields
                    ),
                    StructField("_change_type", StringType(), False),
                    StructField("_commit_version", LongType(), False),
                ]
            )
        return schema

    def streamReader(self, schema: StructType) -> SnapshotTableStreamReader:
        return SnapshotTableStreamReader(schema, dict(self.options))

    def streamWriter(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError("snapshot_table sink is append-only (one snapshot per batch)")
        return SnapshotTableStreamWriter(schema, dict(self.options))
