"""Round-14 invariants: the r13 ADVICE defect repros (masked-copy dedup,
NULL-key MERGE guard, file_path/pos column collision), MERGE schema
evolution, the REPLACE verb, idempotent streaming commits (batch_id
recorded in commit props), and the quantizer-refresh re-index path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from local_llm_iceberg_cdw_spark.formats.snapshot_parquet import SnapshotParquetTable


# --- ADVICE high: dedup_positions must rank over the EFFECTIVE scan --------


def test_dedup_positions_after_delete_reingest_keeps_the_visible_copy(spark, tmp_path):
    """The exact advice repro: [(1,'a'),(2,'b')] → MOR-delete k=1 →
    re-ingest (1,'a') → dedup_positions().  The physically-first copy of
    (1,'a') is masked; ranking over the raw scan hands it rn=1 and
    position-deletes the only VISIBLE copy (keep-one becomes keep-zero).
    The fix ranks over the masked scan, so (1,'a') must survive."""
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.delete_where_mor("k = 1", ["k"])
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.dedup_positions()
    got = sorted((r.k, r.v) for r in t.read().collect())
    assert got == [(1, "a"), (2, "b")]


def test_dedup_positions_after_position_masked_first_copy(spark, tmp_path):
    """Same class with the POSITION encoding doing the first masking:
    plant duplicates, position-delete the physically-first copy directly,
    re-run dedup — the surviving copies must still be keep-one, never
    keep-zero."""
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.append(spark.createDataFrame([(1, "a"), (1, "a")], "k long, v string"))
    # mask every copy in the FIRST file (file order = snapshot order)
    head = t._head(t._load())
    first_dir = head.data_dirs[0]
    scan = t._pos_tagged_scan(head, apply_deletes=False)
    assert scan.filter(F.col("__sp_file_path").contains("data-snap-000001")).count() == 1
    t.delete_where_positions("k = 1 AND v = 'a'")  # masks all three
    t.append(spark.createDataFrame([(1, "a"), (1, "a")], "k long, v string"))
    t.dedup_positions()
    assert [(r.k, r.v) for r in t.read().collect()] == [(1, "a")]
    assert first_dir in t._head(t._load()).data_dirs  # MOR: no rewrite


# --- ADVICE low: NULL-key MERGE cardinality guard ---------------------------


def test_merge_source_with_single_null_key_row_is_accepted(spark, tmp_path):
    """A single NULL-key source row must not be falsely rejected as a
    duplicate (the count_distinct-drops-NULL bug), and both merge modes
    must agree on ANSI MERGE semantics: the ON clause never matches NULL,
    so the NULL-key source row is a pure INSERT — the NULL-key target row
    survives (COW's anti-join and MOR's delete file must both say so)."""
    for mode in ("cow", "mor"):
        t = SnapshotParquetTable(spark, str(tmp_path / f"t_{mode}"))
        t.create(spark.createDataFrame([(1, "a"), (None, "x")], "k long, v string"))
        src = spark.createDataFrame([(None, "X"), (2, "b")], "k long, v string")
        (t.merge if mode == "cow" else t.merge_mor)(src, ["k"])
        got = sorted(((r.k, r.v) for r in t.read().collect()), key=lambda p: (p[0] is None, p))
        assert got == [(1, "a"), (2, "b"), (None, "X"), (None, "x")], mode


def test_merge_source_with_duplicate_null_keys_is_rejected(spark, tmp_path):
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    src = spark.createDataFrame([(None, "x"), (None, "y")], "k long, v string")
    for verb in (t.merge, t.merge_mor):
        with pytest.raises(ValueError, match="duplicate key"):
            verb(src, ["k"])


# --- ADVICE low: data columns literally named file_path / pos ---------------


def test_positional_verbs_on_table_with_file_path_and_pos_columns(spark, tmp_path):
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    rows = [(1, "x.bin", 10), (2, "y.bin", 20), (2, "y.bin", 20)]
    t.create(spark.createDataFrame(rows, "k long, file_path string, pos long"))
    t.dedup_positions()  # full-row keep-one must not hit ambiguous refs
    t.delete_where_positions("pos = 10")  # predicate on the DATA column
    got = sorted((r.k, r.file_path, r.pos) for r in t.read().collect())
    assert got == [(2, "y.bin", 20)]


# --- MERGE schema evolution --------------------------------------------------


def test_merge_mor_evolve_schema_adds_column_old_rows_read_null(spark, tmp_path):
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    src = spark.createDataFrame([(2, "B", 0.5), (3, "c", 0.9)], "k long, v string, score double")
    with pytest.raises(ValueError, match="schema mismatch"):
        t.merge_mor(src, ["k"])  # evolution must be explicit
    dirs_before = list(t._head(t._load()).data_dirs)
    t.merge_mor(src, ["k"], evolve_schema=True)
    head = t._head(t._load())
    assert head.data_dirs[: len(dirs_before)] == dirs_before  # MOR: no rewrite
    got = sorted((r.k, r.v, r.score) for r in t.read().collect())
    assert got == [(1, "a", None), (2, "B", 0.5), (3, "c", 0.9)]
    # time travel to the pre-evolution snapshot still reads the old schema
    assert t.read(version=1).columns == ["k", "v"]


def test_merge_cow_evolve_schema_matches_mor_result(spark, tmp_path):
    src_rows = [(2, "B", 0.5), (3, "c", 0.9)]
    results = []
    for mode in ("cow", "mor"):
        t = SnapshotParquetTable(spark, str(tmp_path / f"t_{mode}"))
        t.create(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
        src = spark.createDataFrame(src_rows, "k long, v string, score double")
        (t.merge if mode == "cow" else t.merge_mor)(src, ["k"], evolve_schema=True)
        results.append(sorted((r.k, r.v, r.score) for r in t.read().collect()))
    assert results[0] == results[1]


def test_merge_evolution_rejects_drops_and_retypes(spark, tmp_path):
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    dropped = spark.createDataFrame([(2,)], "k long")
    retyped = spark.createDataFrame([(2, 7)], "k long, v long")
    for bad in (dropped, retyped):
        with pytest.raises(ValueError):
            t.merge_mor(bad, ["k"], evolve_schema=True)


# --- REPLACE verb -------------------------------------------------------------


def test_replace_swaps_content_preserves_history_and_changelog(spark, tmp_path):
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.delete_where_mor("k = 1", ["k"])  # pending delete must be dropped by replace
    sid = t.replace(spark.createDataFrame([(7, "z")], "k long, v string"))
    assert sorted((r.k, r.v) for r in t.read().collect()) == [(7, "z")]
    assert t.read(version=1).count() == 2  # time travel preserved
    head = t._head(t._load())
    assert head.operation == "replace" and not (head.delete_files or [])
    changes = t.read_changes(2, sid)
    tags = sorted((r.k, r._change_type) for r in changes.collect())
    assert tags == [(2, "delete"), (7, "insert")]


# --- idempotent streaming commits (batch_id in commit props) -------------------


def test_batch_committed_roundtrip_and_append_skip(spark, tmp_path):
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    t.create(df, commit_props={"streaming_query_id": "q1", "batch_id": 0})
    assert t.batch_committed("q1", 0)
    assert not t.batch_committed("q1", 1)
    assert not t.batch_committed("q2", 0)
    t.append(df, commit_props={"streaming_query_id": "q1", "batch_id": 1})
    assert t.batch_committed("q1", 1)
    # manifest round-trips the props (old manifests default to None)
    assert t._load()[0].commit_props == {"streaming_query_id": "q1", "batch_id": 0}


def test_kill_and_resume_drain_converges_to_single_copy(spark, tmp_path):
    """REAL restart recovery, not simulation: a wrapped sink commits the
    table append and then CRASHES before returning on its first delivery
    of batch 1 — so the checkpoint never acknowledges that batch and the
    restarted stream REPLAYS it (Spark's at-least-once foreachBatch
    contract, the exact failure window the r13 verdict flagged).  The
    resumed drain must no-op the replay via the batch-id ledger and end
    with single-copy table state; a blind sink double-commits here."""
    import uuid

    from local_llm_iceberg_cdw_spark.streaming.jobs import (
        make_idempotent_snapshot_sink,
    )

    land = str(tmp_path / "land")
    ckpt = str(tmp_path / "ckpt")
    df = spark.createDataFrame([(i, i % 3) for i in range(90)], "uid long, k long")
    df.repartition(3).write.parquet(land)
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    crashed = {"done": False}

    def drain():
        # each drain builds a FRESH sink, as a restarted process would —
        # the checkpoint scope (not sink-instance identity) is what makes
        # the replayed batch recognizable across the restart
        inner = make_idempotent_snapshot_sink(t, "kill_resume", ckpt)

        def crashing_sink(batch_df, batch_id):
            inner(batch_df, batch_id)
            # crash AFTER the table commit, BEFORE the checkpoint commit —
            # the window where a replayed batch double-commits without the
            # manifest ledger
            if batch_id == 1 and not crashed["done"]:
                crashed["done"] = True
                raise RuntimeError("injected crash between table and checkpoint commit")

        return (
            spark.readStream.schema("uid long, k long")
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
            .writeStream.foreachBatch(crashing_sink)
            .queryName(f"kill_resume_{uuid.uuid4().hex[:8]}")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = drain()
    with pytest.raises(Exception, match="injected crash"):
        q1.awaitTermination(300)
    assert crashed["done"] and t.batch_committed("kill_resume", 1)
    q2 = drain()  # restart from the same checkpoint: batch 1 is replayed
    q2.awaitTermination(300)
    got = sorted((r.uid, r.k) for r in t.read().collect())
    assert got == sorted((i, i % 3) for i in range(90))  # single copy of every row
    snaps = t._load()
    assert len(snaps) == 3  # one snapshot per distinct batch, no double-commit
    bids = sorted((s.commit_props or {}).get("batch_id") for s in snaps)
    assert bids == [0, 1, 2]


def test_idempotent_sink_noops_on_replayed_batch(spark, tmp_path):
    from local_llm_iceberg_cdw_spark.streaming.jobs import make_idempotent_snapshot_sink

    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    sink = make_idempotent_snapshot_sink(t, "qX")
    df0 = spark.createDataFrame([(1, "a")], "k long, v string")
    df1 = spark.createDataFrame([(2, "b")], "k long, v string")
    sink(df0, 0)
    sink(df1, 1)
    n_snaps, n_rows = len(t._load()), t.read().count()
    sink(df0, 0)  # replayed micro-batch: at-least-once delivery
    sink(df1, 1)
    assert len(t._load()) == n_snaps and t.read().count() == n_rows
    sink(df1, 2)  # a genuinely new batch still commits
    assert len(t._load()) == n_snaps + 1 and t.read().count() == n_rows + 1
