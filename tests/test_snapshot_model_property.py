"""Model-based property test for the snapshot table's verb algebra.

A random SEQUENCE of table verbs — append, copy-on-write delete,
merge-on-read equality delete, rollback, compact — runs against both
the real `SnapshotParquetTable` and a ~30-line pure-Python reference
model; after every step the table's visible rows must equal the model's.
This is the test that checks the verbs COMPOSE (the per-verb unit tests
check each in isolation): MOR deletes must mask only files older than
the delete, a rollback must discard exactly the undone suffix, a compact
must be invisible, and an append after any of them must land on the
right lineage.

Hypothesis drives the sequences; examples are few (Spark round-trips
dominate) but each sequence is 4-8 verbs deep, which is where the
r10-era fork/lineage bugs lived.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from local_llm_iceberg_cdw_spark.formats.snapshot_parquet import SnapshotParquetTable

_SPARK_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# verb encodings: ("append", [ids]) | ("cow_delete", id) |
# ("mor_delete", id) | ("rollback",) | ("compact",)
_VERB = st.one_of(
    st.tuples(st.just("append"), st.lists(st.integers(0, 9), min_size=1, max_size=3)),
    st.tuples(st.just("cow_delete"), st.integers(0, 9)),
    st.tuples(st.just("mor_delete"), st.integers(0, 9)),
    st.tuples(st.just("rollback")),
    st.tuples(st.just("compact")),
)


@_SPARK_SETTINGS
@given(verbs=st.lists(_VERB, min_size=4, max_size=8))
def test_verb_sequences_match_python_model(spark, verbs, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("snap_model")
    t = SnapshotParquetTable(spark, str(tmp / "t"))
    # seed state: rows are (uid, key) — uid unique per physical row so the
    # model can distinguish re-adds of the same key from survivors
    uid = [0]

    def rows_for(ids):
        out = [(uid[0] + i, k) for i, k in enumerate(ids)]
        uid[0] += len(ids)
        return out

    seed = rows_for([0, 1, 2])
    t.create(spark.createDataFrame(seed, "uid long, key long"))
    model = set(seed)  # visible rows
    history = [set(seed)]  # model state per main snapshot (for rollback)

    for verb in verbs:
        if verb[0] == "append":
            batch = rows_for(list(verb[1]))
            t.append(spark.createDataFrame(batch, "uid long, key long"))
            model = model | set(batch)
            history.append(set(model))
        elif verb[0] == "cow_delete":
            t.delete_where(f"key = {verb[1]}")
            model = {r for r in model if r[1] != verb[1]}
            history.append(set(model))
        elif verb[0] == "mor_delete":
            t.delete_where_mor(f"key = {verb[1]}", ["key"])
            # equality delete: masks CURRENT rows with the key; later
            # appends of the same key are unaffected (the model applies
            # it once, now — exactly the sequence-number semantics)
            model = {r for r in model if r[1] != verb[1]}
            history.append(set(model))
        elif verb[0] == "rollback":
            if len(history) < 2:
                continue  # nothing to undo
            # undo the last verb: roll main to the previous snapshot
            snaps = t._load()
            by_id = {s.snapshot_id: s for s in snaps}
            head = t._head(snaps)
            parent = by_id.get(head.parent_snapshot_id)
            if parent is None:
                continue
            t.rollback_to(parent.snapshot_id)
            history.pop()
            model = set(history[-1])
        else:  # compact — visible-state identity
            t.compact()
            history.append(set(model))
        got = {(r.uid, r.key) for r in t.read().collect()}
        assert got == model, (verb, sorted(got), sorted(model))
        # data-skipping invariants: every verb leaves manifest bounds
        # exactly for the current data dirs, and the skipping planner
        # never loses visible rows (probe one present key + one absent)
        head = t._head(t._load())
        if head.file_stats is not None:
            assert set(head.file_stats) == set(head.data_dirs), verb
        if not head.delete_files and not head.partition_by and not head.mixed_layout:
            probe = min((r[1] for r in model), default=99)
            df, _, _ = t.read_pruned([("key", "=", probe)])
            got_k = {(r.uid, r.key) for r in df.collect()}
            assert got_k == {r for r in model if r[1] == probe}, (verb, probe)
