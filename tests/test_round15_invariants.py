"""Round-15 invariants: the r14 ADVICE defect repros — run-scoped
streaming ledger (same query name, independent runs must not collide),
expire_snapshots ledger retention, bind_time_travel qualified names and
string literals — plus the Iceberg-façade ledger surface.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from local_llm_iceberg_cdw_spark.formats.snapshot_parquet import SnapshotParquetTable
from local_llm_iceberg_cdw_spark.streaming.jobs import (
    _checkpoint_run_id,
    make_idempotent_snapshot_sink,
)


# --- ADVICE medium: ledger keyed on query_name collides across runs --------


def test_two_independent_runs_same_name_both_commit(spark, tmp_path):
    """The exact r14 ADVICE hazard: run A commits batches 0..1 under name
    'ingest'; run B (fresh sink = fresh checkpoint lineage) starts at
    batch 0 under the SAME name.  The pre-r15 name-only ledger silently
    skipped B's batch 0 — data loss.  Run-scoped, both commit."""
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1,)], "k long")
    run_a = make_idempotent_snapshot_sink(t, "ingest")
    run_a(df, 0)
    run_a(df, 1)
    assert t.read().count() == 2
    run_b = make_idempotent_snapshot_sink(t, "ingest")
    run_b(df, 0)  # would be "already committed" under the old ledger
    assert t.read().count() == 3 and len(t._load()) == 3
    # in-run retry within EITHER run still no-ops
    run_b(df, 0)
    run_a(df, 1)
    assert t.read().count() == 3


def test_checkpoint_scoped_runs_share_identity_across_instances(spark, tmp_path):
    """Two sink INSTANCES over the same checkpoint are the same run (the
    restart case): instance 2 must skip instance 1's batches.  A third
    sink over a DIFFERENT checkpoint is a different run and appends."""
    ckpt_a = tmp_path / "ckpt_a"
    ckpt_a.mkdir()
    (ckpt_a / "metadata").write_text(json.dumps({"id": "run-aaaa"}))
    ckpt_b = tmp_path / "ckpt_b"
    ckpt_b.mkdir()
    (ckpt_b / "metadata").write_text(json.dumps({"id": "run-bbbb"}))
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1,)], "k long")
    make_idempotent_snapshot_sink(t, "q", str(ckpt_a))(df, 0)
    make_idempotent_snapshot_sink(t, "q", str(ckpt_a))(df, 0)  # restart replay
    assert t.read().count() == 1
    make_idempotent_snapshot_sink(t, "q", str(ckpt_b))(df, 0)  # new lineage
    assert t.read().count() == 2


def test_checkpoint_run_id_reads_spark_metadata_format(tmp_path):
    assert _checkpoint_run_id(str(tmp_path)) is None  # not started yet
    (tmp_path / "metadata").write_text(json.dumps({"id": "u-123"}))
    assert _checkpoint_run_id(str(tmp_path)) == "u-123"


def test_scoped_check_never_matches_unscoped_legacy_commit(spark, tmp_path):
    """A legacy manifest entry (no streaming_run_id) is ambiguous: a
    scoped probe must NOT treat it as committed (degrade to duplicate,
    never to silent skip); an unscoped legacy probe still matches it."""
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1,)], "k long")
    t.create(df, commit_props={"streaming_query_id": "q", "batch_id": 0})
    assert t.batch_committed("q", 0)  # legacy probe
    assert not t.batch_committed("q", 0, run_id="r1")  # scoped probe
    t.append(
        df,
        commit_props={
            "streaming_query_id": "q",
            "streaming_run_id": "r1",
            "batch_id": 1,
        },
    )
    assert t.batch_committed("q", 1, run_id="r1")
    assert not t.batch_committed("q", 1, run_id="r2")
    assert t.batch_committed("q", 1)  # unscoped probe matches any run


def test_sink_requires_ledger_surface():
    class NoLedger:
        def exists(self):
            return False

    with pytest.raises(TypeError, match="ledger surface"):
        make_idempotent_snapshot_sink(NoLedger(), "q")


# --- ADVICE low: expire_snapshots must not erase the replay ledger ---------


def test_expire_snapshots_retains_folded_ledger(spark, tmp_path):
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1,)], "k long")
    sink = make_idempotent_snapshot_sink(t, "q")
    for bid in range(4):
        sink(df, bid)
    t.expire_snapshots(keep_last=1)  # appends share dirs: 0 dirs removed
    assert len(t._load()) == 1
    # replays of EXPIRED batches still no-op: the same run's sink…
    n = t.read().count()
    for bid in range(4):
        sink(df, bid)
    assert t.read().count() == n
    # …and the retained ledger answers scoped and unscoped probes
    rid = (t._load()[-1].commit_props or {}).get("streaming_run_id")
    # (the kept snapshot is batch 3's own commit; 0..2 live in the fold)
    assert t.batch_committed("q", 0) and t.batch_committed("q", 2)
    assert t.batch_committed("q", 2, run_id=rid) if rid else True
    assert not t.batch_committed("q", 9)
    # a NEW run under the same name is still not skipped post-expire
    make_idempotent_snapshot_sink(t, "q")(df, 0)
    assert t.read().count() == n + 1


def test_expire_ledger_survives_repeated_expiration(spark, tmp_path):
    """The fold must carry forward when the anchor snapshot itself later
    expires (retained_ledger entries re-absorbed, max per run kept)."""
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1,)], "k long")
    sink = make_idempotent_snapshot_sink(t, "q")
    sink(df, 0)
    sink(df, 1)
    t.expire_snapshots(keep_last=1)
    sink(df, 2)
    sink(df, 3)
    t.expire_snapshots(keep_last=1)  # expires the first fold's anchor
    for bid in range(4):
        sink(df, bid)  # all replays: nothing may commit
    assert t.read().count() == 4  # one row per original batch


# --- VERDICT r14 #8 (stretch): crash-matrix property test -------------------
#
# The two hand-written kill tests (test_round14_invariants) pin single
# scenarios; this drives the idempotent sink with RANDOM sequences of
# delivery outcomes — clean ack, crash AFTER the table commit (replay on
# restart), crash BEFORE the commit (redelivery, nothing to skip),
# at-least-once double delivery, and mid-stream snapshot expiration
# followed by a full history replay — asserting single-copy convergence
# (content as a multiset AND one snapshot per batch) after every plan,
# the way the multiset model generalized the verb algebra.


def _crash_matrix_plan():
    from hypothesis import strategies as st

    return st.lists(
        st.sampled_from(
            ["ok", "crash_after_commit", "crash_before_commit", "replay_twice", "expire"]
        ),
        min_size=1,
        max_size=5,
    )


def test_crash_matrix_single_copy_convergence(spark, tmp_path):
    from collections import Counter

    from hypothesis import HealthCheck, given, settings

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(plan=_crash_matrix_plan())
    def run(plan):
        import uuid

        root = tmp_path / uuid.uuid4().hex
        ckpt = root / "ckpt"
        ckpt.mkdir(parents=True)
        (ckpt / "metadata").write_text(json.dumps({"id": f"run-{uuid.uuid4().hex}"}))
        t = SnapshotParquetTable(spark, str(root / "t"))

        def restart():
            # a restarted process constructs a NEW sink over the SAME
            # checkpoint — scope identity, not instance identity
            return make_idempotent_snapshot_sink(t, "q", str(ckpt))

        sink = restart()
        expected: Counter = Counter()
        n_snaps = 0
        committed_bids: list[int] = []
        for bid, action in enumerate(plan):
            rows = [(bid * 10 + j,) for j in range(2)]
            df = spark.createDataFrame(rows, "k long")
            if action == "expire":
                # retention maintenance mid-stream, then an adversarial
                # FULL history replay: every retired batch must still no-op
                if n_snaps:
                    t.expire_snapshots(keep_last=1)
                    n_snaps = 1
                    for old_bid in committed_bids:
                        sink(
                            spark.createDataFrame(
                                [(old_bid * 10 + j,) for j in range(2)], "k long"
                            ),
                            old_bid,
                        )
                # the expire slot still delivers its own batch cleanly
                sink(df, bid)
            elif action == "crash_before_commit":
                sink = restart()  # crashed before the table commit
                sink(df, bid)
            elif action == "crash_after_commit":
                sink(df, bid)  # commit landed, ack did not
                sink = restart()
                sink(df, bid)  # post-restart redelivery: must no-op
            elif action == "replay_twice":
                sink(df, bid)
                sink(df, bid)
            else:
                sink(df, bid)
            expected.update(k for (k,) in rows)
            n_snaps += 1
            committed_bids.append(bid)
            got = Counter(r.k for r in t.read().collect())
            assert got == expected, (plan, bid, action)
            assert len(t._load()) == n_snaps, (plan, bid, action)

    run()


# --- rename evolution (metadata-only ALTER TABLE RENAME COLUMN) -------------


def test_rename_column_reads_old_files_under_new_name(spark, tmp_path):
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, 10.0)], "k long, price double"))
    t.append(spark.createDataFrame([(2, 20.0)], "k long, price double"))
    v_pre = t._head(t._load()).snapshot_id
    t.rename_column("price", "amount")
    # pre-rename files read under the NEW name, values intact
    got = sorted((r.k, r.amount) for r in t.read().collect())
    assert got == [(1, 10.0), (2, 20.0)]
    assert t.read().columns == ["k", "amount"]
    # time travel to a pre-rename snapshot sees the OLD name
    assert t.read(version=v_pre).columns == ["k", "price"]
    # appends after the rename write the new name natively and mix fine
    t.append(spark.createDataFrame([(3, 30.0)], "k long, amount double"))
    got = sorted((r.k, r.amount) for r in t.read().collect())
    assert got == [(1, 10.0), (2, 20.0), (3, 30.0)]


def test_rename_column_chains_and_filters(spark, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.rename_column("v", "w")
    t.append(spark.createDataFrame([(3, "c")], "k long, w string"))
    t.rename_column("w", "x")  # second rename: composition, mixed dirs
    got = sorted((r.k, r.x) for r in t.read().collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # filters on the logical name reach every (mapped) branch
    assert t.read().filter(F.col("x") == "a").count() == 1


def test_rename_column_guards(spark, tmp_path):
    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    t.create(
        spark.createDataFrame([(1, "a", 1.0)], "k long, grp string, v double"),
        partition_by=["grp"],
    )
    with pytest.raises(ValueError, match="partition column"):
        t.rename_column("grp", "g2")
    t2 = SnapshotParquetTable(spark, str(tmp_path / "t2"))
    t2.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    t2.delete_where_mor("k = 0", ["k"])
    with pytest.raises(ValueError, match="pending merge-on-read"):
        t2.rename_column("v", "w")
    t2.compact()
    t2.rename_column("v", "w")  # compacted: allowed
    with pytest.raises(ValueError, match="unknown column"):
        t2.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t2.rename_column("k", "w")


def test_rename_interacts_with_verbs(spark, tmp_path):
    from pyspark.sql import functions as F

    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    v1 = t._head(t._load()).snapshot_id
    t.rename_column("v", "w")
    v_ren = t._head(t._load()).snapshot_id
    # positional verbs refuse until materialized
    with pytest.raises(ValueError, match="physical column names"):
        t.dedup_positions()
    # MOR merge AFTER the rename masks pre-rename files correctly
    t.merge_mor(spark.createDataFrame([(2, "B"), (3, "c")], "k long, w string"), ["k"])
    got = sorted((r.k, r.w) for r in t.read().collect())
    assert got == [(1, "a"), (2, "B"), (3, "c")]
    # compact materializes: positional verbs work again, mapping gone
    t.compact()
    assert not t._has_unmaterialized_renames()
    t.dedup_positions()
    # the changelog across the rename-only range is empty; across the
    # merge it reports the upsert under the new name
    assert t.read_changes(v1, v_ren).count() == 0
    ch = t.read_changes(v_ren, v_ren + 1)
    assert set(ch.columns) >= {"k", "w", "_change_type"}
    # rollback over the rename restores the old name
    t.rollback_to(v1)
    assert t.read().columns == ["k", "v"]
    assert sorted((r.k, r.v) for r in t.read().collect()) == [(1, "a"), (2, "b")]


def test_rename_survives_expire_and_orphan_cleanup(spark, tmp_path):
    import time

    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, 1.0)], "k long, price double"))
    t.rename_column("price", "amount")
    t.append(spark.createDataFrame([(2, 2.0)], "k long, amount double"))
    # orphan cleanup never touches the (shared) renamed dirs
    assert t.remove_orphan_files(older_than_ms=int(time.time() * 1000) + 60_000) == 0
    got = sorted((r.k, r.amount) for r in t.read().collect())
    assert got == [(1, 1.0), (2, 2.0)]
    # expiration drops the rename COMMIT but must not strand the
    # old-named file: the fold on the kept snapshot carries the mapping
    t.expire_snapshots(keep_last=1)
    assert len(t._load()) == 1
    got = sorted((r.k, r.amount) for r in t.read().collect())
    assert got == [(1, 1.0), (2, 2.0)]
    # and the fold survives a FURTHER rename + expire cycle (composition)
    t.rename_column("amount", "value")
    t.append(spark.createDataFrame([(3, 3.0)], "k long, value double"))
    t.expire_snapshots(keep_last=1)
    got = sorted((r.k, r.value) for r in t.read().collect())
    assert got == [(1, 1.0), (2, 2.0), (3, 3.0)]


# --- remove_orphan_files (Iceberg maintenance verb + crash recovery) --------


def test_remove_orphan_files_reclaims_only_unreferenced_dirs(spark, tmp_path):
    import os
    import time

    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    t.create(df)
    t.delete_where_mor("k = 0", ["k"])  # a live delete dir too
    live_dirs = set(t._head(t._load()).data_dirs) | {
        e["dir"] for e in (t._head(t._load()).delete_files or [])
    }
    orphan = os.path.join(t.path, "data-snap-000042")
    df.write.parquet(orphan)
    future = int(time.time() * 1000) + 60_000
    assert t.remove_orphan_files(older_than_ms=future) == 1
    assert not os.path.isdir(orphan)
    assert all(os.path.isdir(d) for d in live_dirs)  # never touches live
    assert [r.k for r in t.read().collect()] == [1]


def test_orphan_blocks_append_and_cleanup_recovers(spark, tmp_path):
    import os
    import time

    import pytest as _pytest

    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    t.create(df)
    next_sid = t._load()[-1].snapshot_id + 1
    df.write.parquet(os.path.join(t.path, f"data-snap-{next_sid:06d}"))
    with _pytest.raises(Exception):
        t.append(df)  # collides with the crash-leaked dir
    t.remove_orphan_files(older_than_ms=int(time.time() * 1000) + 60_000)
    t.append(df)  # recovered
    assert t.read().count() == 2


def test_remove_orphan_files_default_cutoff_guards_young_dirs(spark, tmp_path):
    import os

    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    t.create(df)
    young = os.path.join(t.path, "data-snap-000042")
    df.write.parquet(young)
    assert t.remove_orphan_files() == 0  # default 3-day cutoff keeps it
    assert os.path.isdir(young)
    # back-date it past the cutoff: now reclaimable under the default
    old = 4 * 86400
    os.utime(young, (os.path.getmtime(young) - old, os.path.getmtime(young) - old))
    assert t.remove_orphan_files() == 1


# --- streaming MERGE-upsert sink --------------------------------------------


def test_merge_sink_upserts_and_skips_replays(spark, tmp_path):
    from local_llm_iceberg_cdw_spark.streaming.jobs import (
        make_idempotent_merge_sink,
    )

    t = SnapshotParquetTable(spark, str(tmp_path / "t"))
    sink = make_idempotent_merge_sink(t, ["k"], "cdc")
    sink(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), 0)
    sink(spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"), 1)
    assert sorted((r.k, r.v) for r in t.read().collect()) == [
        (1, "a"),
        (2, "B"),
        (3, "c"),
    ]
    n_snaps = len(t._load())
    sink(spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"), 1)
    assert len(t._load()) == n_snaps  # replay: no extra MERGE commit
    # a NEW run under the same name is not skipped (same rule as append)
    sink2 = make_idempotent_merge_sink(t, ["k"], "cdc")
    sink2(spark.createDataFrame([(3, "C")], "k long, v string"), 0)
    assert sorted((r.k, r.v) for r in t.read().collect()) == [
        (1, "a"),
        (2, "B"),
        (3, "C"),
    ]


def test_merge_verbs_round_trip_commit_props(spark, tmp_path):
    for mode in ("cow", "mor"):
        t = SnapshotParquetTable(spark, str(tmp_path / f"t_{mode}"))
        t.create(spark.createDataFrame([(1, "a")], "k long, v string"))
        verb = t.merge if mode == "cow" else t.merge_mor
        verb(
            spark.createDataFrame([(1, "A")], "k long, v string"),
            ["k"],
            commit_props={"streaming_query_id": "q", "batch_id": 5},
        )
        assert t.batch_committed("q", 5), mode


# --- prescriptions #5 / ADVICE low: bind_time_travel edges ------------------


class _FakeTable:
    """read() recorder — bind_time_travel only needs .read → DataFrame."""

    def __init__(self, spark):
        self.spark = spark
        self.calls = []

    def read(self, as_of_timestamp_ms=None, version=None):
        self.calls.append((as_of_timestamp_ms, version))
        return self.spark.createDataFrame([(1,)], "k long")


def test_bind_time_travel_qualified_name_passes_through(spark):
    from local_llm_iceberg_cdw_spark.plans.sql import bind_time_travel

    t = _FakeTable(spark)
    sql = "SELECT * FROM db.orders TIMESTAMP AS OF '2024-01-01'"
    out = bind_time_travel(spark, sql, {"orders": t})
    assert out == sql  # db.orders is NOT the registered simple name
    assert t.calls == []


def test_bind_time_travel_qualified_name_binds_when_registered(spark):
    from local_llm_iceberg_cdw_spark.plans.sql import bind_time_travel

    t = _FakeTable(spark)
    out = bind_time_travel(
        spark, "SELECT * FROM db.orders VERSION AS OF 3", {"db.orders": t}
    )
    assert "db_orders__version_as_of_3" in out and "db." not in out
    assert t.calls == [(None, 3)]


def test_bind_time_travel_backticked_qualified_forms(spark):
    from local_llm_iceberg_cdw_spark.plans.sql import bind_time_travel

    t = _FakeTable(spark)
    out = bind_time_travel(
        spark, "SELECT * FROM `db`.`orders` VERSION AS OF 1", {"db.orders": t}
    )
    assert "db_orders__version_as_of_1" in out
    # a backticked single identifier CONTAINING a dot is one name
    t2 = _FakeTable(spark)
    out2 = bind_time_travel(
        spark, "SELECT * FROM `a.b` VERSION AS OF 2", {"a.b": t2}
    )
    assert "a_b__version_as_of_2" in out2 and t2.calls == [(None, 2)]


def test_bind_time_travel_skips_string_literals(spark):
    from local_llm_iceberg_cdw_spark.plans.sql import bind_time_travel

    t = _FakeTable(spark)
    sql = (
        "SELECT 'orders TIMESTAMP AS OF ''2024-01-01''' AS doc, k "
        "FROM orders VERSION AS OF 2"
    )
    out = bind_time_travel(spark, sql, {"orders": t})
    assert out.startswith("SELECT 'orders TIMESTAMP AS OF ''2024-01-01''' AS doc")
    assert "orders__version_as_of_2" in out
    assert t.calls == [(None, 2)]


def test_bind_time_travel_subquery_form(spark):
    from local_llm_iceberg_cdw_spark.plans.sql import bind_time_travel

    t = _FakeTable(spark)
    out = bind_time_travel(
        spark,
        "SELECT * FROM (SELECT k FROM orders VERSION AS OF 1) s JOIN orders o ON s.k = o.k",
        {"orders": t},
    )
    assert "(SELECT k FROM orders__version_as_of_1) s" in out
    assert "JOIN orders o" in out  # the plain scan is untouched


# --- prescription #6: Iceberg façade ledger surface (jar-free parts) --------


def test_iceberg_snapshot_property_options_shape():
    from local_llm_iceberg_cdw_spark.formats.iceberg import IcebergTable

    opts = IcebergTable.snapshot_property_options(
        {"streaming_query_id": "q", "streaming_run_id": "r", "batch_id": 7}
    )
    assert opts == {
        "snapshot-property.streaming_query_id": "q",
        "snapshot-property.streaming_run_id": "r",
        "snapshot-property.batch_id": "7",
    }
    assert IcebergTable.snapshot_property_options(None) == {}
