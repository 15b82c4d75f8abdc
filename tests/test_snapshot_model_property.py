"""Model-based property test for the snapshot table's verb algebra.

A random SEQUENCE of table verbs — append, duplicate re-append
(including re-ingest of a currently-MASKED row, the r13-advice case),
copy-on-write delete, merge-on-read equality delete, merge-on-read
POSITIONAL delete, keep-one positional dedup, COW and MOR MERGE,
rollback, compact, full-content REPLACE — runs against both the real
`SnapshotParquetTable`
and a ~40-line pure-Python reference model; after every step the
table's visible rows (WITH multiplicity — a Counter, so a leaked or
over-masked duplicate copy is observable) must equal the model's.
This is the test that checks the verbs COMPOSE (the per-verb unit tests
check each in isolation): MOR deletes must mask only files older than
the delete, positional deletes must mask every copy while keep-one
dedup keeps exactly one, the two MERGE modes must be interchangeable,
a rollback must discard exactly the undone suffix, a compact must be
invisible, and an append after any of them must land on the right
lineage.

Hypothesis drives the sequences; examples are few (Spark round-trips
dominate) but each sequence is 4-8 verbs deep, which is where the
r10-era fork/lineage bugs lived.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from local_llm_iceberg_cdw_spark.formats.snapshot_parquet import SnapshotParquetTable

_SPARK_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# verb encodings: ("append", [ids]) | ("append_dup",) | ("append_dup_any",) |
# ("cow_delete", id) | ("mor_delete", id) | ("pos_delete", id) |
# ("dedup_pos",) | ("merge_cow", {ids}) | ("merge_mor", {ids}) |
# ("rollback",) | ("compact",) | ("replace", [ids])
_VERB = st.one_of(
    st.tuples(st.just("append"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
    st.tuples(st.just("append_dup")),
    st.tuples(st.just("append_dup_any")),
    st.tuples(st.just("cow_delete"), st.integers(0, 9)),
    st.tuples(st.just("mor_delete"), st.integers(0, 9)),
    st.tuples(st.just("pos_delete"), st.integers(0, 9)),
    st.tuples(st.just("dedup_pos")),
    st.tuples(st.just("merge_cow"), st.sets(st.integers(0, 9), min_size=1, max_size=2)),
    st.tuples(st.just("merge_mor"), st.sets(st.integers(0, 9), min_size=1, max_size=2)),
    st.tuples(st.just("rollback")),
    st.tuples(st.just("compact")),
    st.tuples(st.just("replace"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
    st.tuples(st.just("orphan_cycle")),
)


# every verb once, in an order that makes each interact with pending MOR
# state from the previous ones — guaranteed coverage per suite run, where
# the hypothesis sampling below is probabilistic
_KITCHEN_SINK = [
    ("append", [3, 4]),
    ("append_dup",),
    ("mor_delete", 1),
    ("pos_delete", 3),
    ("append", [1]),
    # ADVICE r13 repro class: re-ingest a MASKED row (key 3 was
    # position-deleted above), then keep-one dedup — the kept copy must
    # be ranked over the EFFECTIVE scan or keep-one becomes keep-zero
    ("append_dup_any",),
    ("dedup_pos",),
    ("merge_mor", {2, 5}),
    ("orphan_cycle",),  # cleanup beside pending MOR delete files
    ("compact",),
    ("merge_cow", {4}),
    ("replace", [7, 8]),
    ("cow_delete", 0),
    ("rollback",),
    ("orphan_cycle",),  # cleanup after rollback: undone-but-referenced dirs live
]


def test_kitchen_sink_sequence_matches_model(spark, tmp_path_factory):
    _run_sequence(spark, _KITCHEN_SINK, tmp_path_factory)


def test_kitchen_sink_on_hidden_transform_spec(spark, tmp_path_factory):
    """The SAME verb algebra over a HIDDEN-partitioned table (r16:
    ``bucket(4, key)`` — the derived bucket lives only in the hive
    layout): every verb must compose with the transform layout exactly
    as with the flat one, the visible multiset must never see the
    hidden column, and the skipping planner's probe (which for
    hidden-only specs goes through bucket-literal projection) must
    still find every visible copy."""
    _run_sequence(spark, _KITCHEN_SINK, tmp_path_factory, partition_by=["bucket(4, key)"])


@_SPARK_SETTINGS
@given(verbs=st.lists(_VERB, min_size=4, max_size=8))
def test_verb_sequences_match_python_model(spark, verbs, tmp_path_factory):
    _run_sequence(spark, verbs, tmp_path_factory)


def _run_sequence(spark, verbs, tmp_path_factory, partition_by=None):
    tmp = tmp_path_factory.mktemp("snap_model")
    t = SnapshotParquetTable(spark, str(tmp / "t"))
    # seed state: rows are (uid, key) — uid unique per LOGICAL row so the
    # model can distinguish re-adds of the same key from survivors; the
    # append_dup verb re-appends an existing (uid, key) verbatim, which
    # only a multiplicity-aware model can see
    uid = [0]

    def rows_for(ids):
        out = [(uid[0] + i, k) for i, k in enumerate(ids)]
        uid[0] += len(ids)
        return out

    def track(batch):
        ever.update(batch)
        return batch

    seed = rows_for([0, 1, 2])
    t.create(spark.createDataFrame(seed, "uid long, key long"), partition_by=partition_by)
    model: Counter = Counter(seed)  # visible rows WITH multiplicity
    ever: set = set(seed)  # every (uid, key) ever written, masked or not
    history = [Counter(model)]  # model state per main snapshot (for rollback)

    def commit(new_model: Counter) -> None:
        nonlocal model
        model = new_model
        history.append(Counter(model))

    for verb in verbs:
        if verb[0] == "append":
            batch = track(rows_for(list(verb[1])))
            t.append(spark.createDataFrame(batch, "uid long, key long"))
            commit(model + Counter(batch))
        elif verb[0] == "append_dup":
            if not model:
                continue
            row = max(model)  # deterministic existing (uid, key)
            t.append(spark.createDataFrame([row], "uid long, key long"))
            commit(model + Counter([row]))
        elif verb[0] == "append_dup_any":
            # re-ingest a row that may currently be MASKED (prefer one):
            # the retry-after-delete case the r13 advice showed raw-scan
            # dedup ranking gets wrong.  The appended copy is always
            # visible (both delete encodings are sequence/file scoped).
            masked = ever - set(model)
            pool = masked or set(model)
            if not pool:
                continue
            row = max(pool)
            t.append(spark.createDataFrame([row], "uid long, key long"))
            commit(model + Counter([row]))
        elif verb[0] == "cow_delete":
            t.delete_where(f"key = {verb[1]}")
            commit(Counter({r: n for r, n in model.items() if r[1] != verb[1]}))
        elif verb[0] == "mor_delete":
            t.delete_where_mor(f"key = {verb[1]}", ["key"])
            # equality delete: masks CURRENT rows with the key (every
            # copy); later appends of the same key are unaffected (the
            # model applies it once, now — the sequence-number semantics)
            commit(Counter({r: n for r, n in model.items() if r[1] != verb[1]}))
        elif verb[0] == "pos_delete":
            t.delete_where_positions(f"key = {verb[1]}")
            # positional delete of a predicate: every physical copy of
            # every matching row is named by (file, pos) — all masked
            commit(Counter({r: n for r, n in model.items() if r[1] != verb[1]}))
        elif verb[0] == "dedup_pos":
            t.dedup_positions()  # full-row keep-one
            commit(Counter(dict.fromkeys(model, 1)))
        elif verb[0] in ("merge_cow", "merge_mor"):
            src = track(rows_for(sorted(verb[1])))
            sdf = spark.createDataFrame(src, "uid long, key long")
            (t.merge if verb[0] == "merge_cow" else t.merge_mor)(sdf, ["key"])
            keys = {k for _, k in src}
            survivors = Counter({r: n for r, n in model.items() if r[1] not in keys})
            commit(survivors + Counter(src))
        elif verb[0] == "replace":
            batch = track(rows_for(list(verb[1])))
            t.replace(spark.createDataFrame(batch, "uid long, key long"))
            commit(Counter(batch))
        elif verb[0] == "rollback":
            if len(history) < 2:
                continue  # nothing to undo
            snaps = t._load()
            by_id = {s.snapshot_id: s for s in snaps}
            head = t._head(snaps)
            parent = by_id.get(head.parent_snapshot_id)
            if parent is None:
                continue
            t.rollback_to(parent.snapshot_id)
            history.pop()
            model = Counter(history[-1])
        elif verb[0] == "orphan_cycle":
            # crash wreckage + remove_orphan_files is INVISIBLE at any
            # point in the algebra: the cleanup must reclaim exactly the
            # planted dir and never a live one — including MOR delete
            # dirs, rolled-back-but-still-referenced dirs, and compacted
            # predecessors (all stay manifest-referenced → live)
            import os as _os
            import time as _time

            sid = t._load()[-1].snapshot_id + 1
            orphan = _os.path.join(t.path, f"data-snap-{sid:06d}")
            spark.createDataFrame([(10**6, 0)], "uid long, key long").write.parquet(
                orphan
            )
            removed = t.remove_orphan_files(
                older_than_ms=int(_time.time() * 1000) + 60_000
            )
            assert removed == 1 and not _os.path.isdir(orphan), verb
            # no commit: no snapshot, the model is unchanged
        else:  # compact — visible-state identity
            t.compact()
            history.append(Counter(model))
        got = Counter((r.uid, r.key) for r in t.read().collect())
        assert got == model, (verb, sorted(got.items()), sorted(model.items()))
        # data-skipping invariants: every verb leaves manifest bounds
        # exactly for the current data dirs, and the skipping planner
        # never loses visible rows (probe one present key + one absent)
        head = t._head(t._load())
        if head.file_stats is not None:
            assert set(head.file_stats) == set(head.data_dirs), verb
        from local_llm_iceberg_cdw_spark.formats.snapshot_parquet import (
            parse_partition_field,
        )

        fields = [parse_partition_field(p) for p in (head.partition_by or [])]
        hidden_only = bool(fields) and all(
            f["transform"] != "identity" for f in fields
        )
        if (
            not head.delete_files
            and not head.mixed_layout
            and (not head.partition_by or hidden_only)
        ):
            probe = min((r[1] for r in model), default=99)
            df, _, _ = t.read_pruned([("key", "=", probe)])
            got_k = Counter((r.uid, r.key) for r in df.collect())
            expect_k = Counter({r: n for r, n in model.items() if r[1] == probe})
            assert got_k == expect_k, (verb, probe)
