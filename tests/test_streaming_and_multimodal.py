"""Streaming jobs (batch queries as oracle) and multimodal plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from local_llm_iceberg_cdw_spark.catalog import load_table
from local_llm_iceberg_cdw_spark.operators.events import q_tumbling_window_daily
from local_llm_iceberg_cdw_spark.operators.multimodal import (
    extract_features,
    q_media_features,
    q_multimodal_metadata,
    synthesize_media,
)
from local_llm_iceberg_cdw_spark.streaming.jobs import (
    dedup_events_stream,
    run_to_memory_sink,
    stream_events_from_dir,
    tumbling_event_counts,
)

from conftest import SF_SMOKE


def _staged_events_dir(spark, tmp_path, n_files=4) -> str:
    """µs-normalized events staged as several files → several micro-batches."""
    path = str(tmp_path / "events_stream")
    load_table(spark, SF_SMOKE, "events").repartition(n_files).write.parquet(path)
    return path


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    """availableNow-drained streaming agg == batch q_tumbling_window_daily."""
    path = _staged_events_dir(spark, tmp_path)
    q = run_to_memory_sink(
        tumbling_event_counts(stream_events_from_dir(spark, path)),
        "tumbling_test",
        output_mode="complete",
    )
    q.awaitTermination(120)
    got = {
        (r.day_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("tumbling_test").collect()
    }
    want = {
        (r.day_start, r.event_type): (r.n_events, r.sum_value)
        for r in q_tumbling_window_daily(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """availableNow-drained session_window sessionization == batch
    q_sessionize (same gap, same money-exact value agg), keyed by the
    session's first event."""
    from local_llm_iceberg_cdw_spark.operators.events import q_sessionize
    from local_llm_iceberg_cdw_spark.streaming.jobs import session_counts_stream

    path = _staged_events_dir(spark, tmp_path)
    q = run_to_memory_sink(
        session_counts_stream(stream_events_from_dir(spark, path)),
        "session_test",
        output_mode="complete",
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start): (r.n_events, r.session_end, r.session_value)
        for r in spark.table("session_test").collect()
    }
    want = {
        (r.user_id, r.session_start): (r.n_events, r.session_end, r.session_value)
        for r in q_sessionize(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_session_window_exact_gap_boundary(spark, tmp_path):
    """Pin the session boundary semantics BOTH engines use (jobs.py
    docstring): an event arriving EXACTLY SESSION_GAP_MINUTES after its
    predecessor MERGES into the same session under streaming
    ``session_window`` (inclusive overlap of [ts, ts+gap] windows) —
    matching the batch lag rule, where only ``gap_us > gap`` breaks.
    User 7: t0 / t0+gap / t0+gap+1min → ONE session (both engines).
    User 8: t0 / t0+gap+1s → TWO sessions (both engines)."""
    import datetime as dt

    from pyspark.sql.window import Window

    from local_llm_iceberg_cdw_spark.operators.events import SESSION_GAP_MINUTES
    from local_llm_iceberg_cdw_spark.streaming.jobs import (
        EVENTS_STREAM_SCHEMA,
        session_counts_stream,
        stream_events_from_dir,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    gap = dt.timedelta(minutes=SESSION_GAP_MINUTES)
    rows = [
        (1, t0, 7, "click", 1.0, "{}"),
        (2, t0 + gap, 7, "click", 1.0, "{}"),  # exact gap → merges
        (3, t0 + gap + dt.timedelta(minutes=1), 7, "click", 1.0, "{}"),
        (4, t0, 8, "click", 1.0, "{}"),
        (5, t0 + gap + dt.timedelta(seconds=1), 8, "click", 1.0, "{}"),  # > gap → breaks
    ]
    df = spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA)
    path = str(tmp_path / "boundary_stream")
    df.coalesce(1).write.parquet(path)
    q = run_to_memory_sink(
        session_counts_stream(stream_events_from_dir(spark, path)),
        "session_boundary_test",
        output_mode="complete",
    )
    q.awaitTermination(120)
    per_user_stream = {}
    for r in spark.table("session_boundary_test").collect():
        per_user_stream[r.user_id] = per_user_stream.get(r.user_id, 0) + 1
    assert per_user_stream == {7: 1, 8: 2}

    # batch lag rule on the same rows agrees on both boundary sides
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_us = F.col("ts").cast("long") * 1_000_000 - (
        F.lag(F.col("ts").cast("long") * 1_000_000).over(w)
    )
    is_new = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_MINUTES * 60 * 1_000_000), 1
    ).otherwise(0)
    per_user_batch = {
        r.user_id: r.n
        for r in df.withColumn("is_new", is_new)
        .groupBy("user_id")
        .agg(F.sum("is_new").alias("n"))
        .collect()
    }
    assert per_user_batch == {7: 1, 8: 2}


def test_streaming_dedup_drops_replayed_file(spark, tmp_path):
    """Replaying the same events (duplicate event_ids across files) leaves
    exactly one row per event_id."""
    src = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "dup_stream")
    src.coalesce(1).write.parquet(path)
    src.coalesce(1).write.mode("append").parquet(path)  # replay = dup batch
    q = run_to_memory_sink(
        dedup_events_stream(stream_events_from_dir(spark, path)), "dedup_test"
    )
    q.awaitTermination(120)
    out = spark.table("dedup_test")
    n_ids = src.select("event_id").distinct().count()
    assert out.count() == n_ids
    assert out.select("event_id").distinct().count() == n_ids


def test_multimodal_metadata_is_binary_typed(spark):
    media = synthesize_media(spark, SF_SMOKE)
    assert dict(media.dtypes)["media"] == "binary"
    agg = q_multimodal_metadata(spark, SF_SMOKE).collect()
    assert {r.media_format for r in agg} == {"png", "jpeg", "wav"}
    assert all(r.total_bytes > 0 for r in agg)


def test_media_features_deterministic_and_complete(spark):
    a = {r.doc_id: (r.width, r.height, round(r.mean_byte, 9)) for r in q_media_features(spark, SF_SMOKE).collect()}
    b = {r.doc_id: (r.width, r.height, round(r.mean_byte, 9)) for r in q_media_features(spark, SF_SMOKE).collect()}
    assert a == b  # stub decode is deterministic across runs
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert len(a) == n_docs
    assert all(16 <= w < 80 and 16 <= h < 80 for w, h, _ in a.values())


def test_features_survive_repartition(spark):
    """mapInPandas output is partition-independent."""
    media = synthesize_media(spark, SF_SMOKE)
    one = extract_features(media.repartition(1)).orderBy("doc_id").collect()
    many = extract_features(media.repartition(7)).orderBy("doc_id").collect()
    assert one == many


def test_metadata_projection_prunes_payload(spark):
    """The metadata aggregate must not read the binary column from the
    scan (100 TB invariant: metadata queries never touch payloads)."""
    plan = q_multimodal_metadata(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln or "ReadSchema" in ln]
    assert scan_lines, plan
    assert not any("media" in ln for ln in scan_lines), scan_lines


def test_stateful_running_totals_match_batch(spark, tmp_path):
    """applyInPandasWithState final per-user totals == batch groupBy."""
    from local_llm_iceberg_cdw_spark.streaming.jobs import running_user_totals

    path = _staged_events_dir(spark, tmp_path, n_files=3)
    q = run_to_memory_sink(
        running_user_totals(stream_events_from_dir(spark, path)),
        "state_test",
        output_mode="update",
    )
    q.awaitTermination(180)
    # memory sink in update mode appends each update; last row per user wins
    updates = spark.table("state_test").collect()
    final = {}
    for r in updates:  # arrival order preserved per the sink's batch order
        final[r.user_id] = (r.n_events, r.total_value)
    batch = {
        r.user_id: (r.n, round(r.s, 2))
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert {u: v[0] for u, v in final.items()} == {u: v[0] for u, v in batch.items()}
    for u in batch:
        assert abs(final[u][1] - batch[u][1]) < 0.05  # per-batch rounding drift


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """availableNow-drained stream-stream interval join == batch
    q_click_purchase_attribution (pairs aggregated identically)."""
    from local_llm_iceberg_cdw_spark.operators.events import (
        q_click_purchase_attribution,
    )
    from local_llm_iceberg_cdw_spark.streaming.jobs import click_purchase_pairs_stream

    path = _staged_events_dir(spark, tmp_path)
    # files are staged unordered, so a micro-batch can carry events older
    # than the already-advanced watermark; a horizon wider than the fixture's
    # 30-day span keeps the equality against the batch oracle exact
    q = run_to_memory_sink(
        click_purchase_pairs_stream(stream_events_from_dir(spark, path), watermark="60 days"),
        "ss_join_test",
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.n_attributed, r.attributed_value)
        for r in spark.table("ss_join_test")
        .groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_attributed"),
            F.round(F.sum("purchase_value"), 2).alias("attributed_value"),
        )
        .collect()
    }
    want = {
        (r.user_id, r.n_attributed, r.attributed_value)
        for r in q_click_purchase_attribution(spark, SF_SMOKE).collect()
    }
    assert got == want and len(want) > 0


def test_error_rate_stream_matches_batch(spark, tmp_path):
    """availableNow-drained streaming error-rate monitor == batch twin."""
    from local_llm_iceberg_cdw_spark.operators.analytics import q_error_rate_windows
    from local_llm_iceberg_cdw_spark.streaming.jobs import (
        error_rate_stream,
        run_to_memory_sink,
        stream_events_from_dir,
    )

    path = _staged_events_dir(spark, tmp_path)
    q = run_to_memory_sink(
        error_rate_stream(stream_events_from_dir(spark, path)),
        "error_rate_test",
        output_mode="complete",
    )
    q.awaitTermination(120)
    got = {
        r.day_start: (r.n_events, r.n_errors, r.error_rate, r.is_spike)
        for r in spark.table("error_rate_test").collect()
    }
    want = {
        r.day_start: (r.n_events, r.n_errors, r.error_rate, r.is_spike)
        for r in q_error_rate_windows(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert any(v[3] for v in want.values()), "fixture should contain a spike day"


def test_stream_append_creates_one_snapshot_per_microbatch(spark, tmp_path):
    """Streaming CDC ingestion: draining a 3-file source with
    maxFilesPerTrigger=1 through stream_append_to_snapshot_table commits
    exactly three snapshots, the current read returns the full corpus,
    and the incremental read between snapshots 1 and 3 is exactly the
    rows of batches 2-3 (S2/S7++ on a live feed)."""
    from local_llm_iceberg_cdw_spark.formats.snapshot_parquet import SnapshotParquetTable
    from local_llm_iceberg_cdw_spark.streaming.jobs import (
        stream_append_to_snapshot_table,
        stream_events_from_dir,
    )

    src_dir = _staged_events_dir(spark, tmp_path, n_files=3)
    table = SnapshotParquetTable(spark, str(tmp_path / "events_snap"))
    q = stream_append_to_snapshot_table(
        stream_events_from_dir(spark, src_dir),
        table,
        query_name="snap_ingest_test",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)

    n_total = load_table(spark, SF_SMOKE, "events").count()
    assert table.snapshots().count() == 3
    assert table.read().count() == n_total
    v1 = table.read(version=1).count()
    assert 0 < v1 < n_total
    assert table.read_incremental(1, 3).count() == n_total - v1


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    """availableNow-drained stream-static broadcast enrichment == the
    same join run statically; every event survives (left join)."""
    from local_llm_iceberg_cdw_spark.streaming.jobs import enrich_events_stream

    path = _staged_events_dir(spark, tmp_path)
    customer = load_table(spark, SF_SMOKE, "customer")
    q = run_to_memory_sink(
        enrich_events_stream(stream_events_from_dir(spark, path), customer),
        "enrich_test",
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.segment, r.nationkey)
        for r in spark.table("enrich_test").collect()
    }
    events = load_table(spark, SF_SMOKE, "events")
    want = {
        (r.event_id, r.segment, r.nationkey)
        for r in enrich_events_stream(events, customer).collect()
    }
    assert got == want
    assert len(got) == events.count()  # left join keeps every event
    assert any(s != "UNKNOWN" for _, s, _ in got)  # dim actually matched


def test_streaming_with_rocksdb_state_store(spark, tmp_path):
    """The 100 TB streaming state backend: RocksDB state store (bounded
    heap, spill-to-disk, incremental checkpoints) must produce the same
    results as the default HDFS-backed store.  Session conf is restored
    afterwards so other tests keep the default."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        path = _staged_events_dir(spark, tmp_path)
        q = run_to_memory_sink(
            tumbling_event_counts(stream_events_from_dir(spark, path)),
            "rocksdb_test",
            output_mode="complete",
        )
        q.awaitTermination(120)
        got = {
            (r.day_start, r.event_type, r.n_events, r.sum_value)
            for r in spark.table("rocksdb_test").collect()
        }
        want = {
            (r.day_start, r.event_type, r.n_events, r.sum_value)
            for r in q_tumbling_window_daily(spark, SF_SMOKE).collect()
        }
        assert got == want and len(want) > 0
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_streaming_quality_gate_matches_batch(spark, tmp_path):
    """The streaming corpus-intake gate (Gopher rules + Bloom probe per
    micro-batch) must agree row-for-row with the batch ops it shares
    expressions with: gopher flags with q_gopher_quality_rules, and the
    Bloom flag must be TRUE for every doc the exact batch
    decontamination would quarantine (no false negatives — FALSE is a
    proof of cleanliness)."""
    from pyspark.sql import functions as F

    from local_llm_iceberg_cdw_spark.catalog import load_table
    from local_llm_iceberg_cdw_spark.operators.corpus import (
        DECONTAM_NGRAM_N,
        _build_bloom,
        _gram_array,
        _split_expr,
    )
    from local_llm_iceberg_cdw_spark.operators.text import q_gopher_quality_rules
    from local_llm_iceberg_cdw_spark.streaming.jobs import (
        quality_gate_stream,
        run_to_memory_sink,
        stream_documents_from_dir,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs_stream")
    docs.repartition(3).write.parquet(path)

    gh_arr = F.transform(
        _gram_array(F.col("text"), DECONTAM_NGRAM_N), lambda g: F.xxhash64(g)
    )
    eval_hashes = [
        r.gh
        for r in docs.filter(_split_expr(F.col("doc_id")) == "eval")
        .select(F.explode(gh_arr).alias("gh"))
        .distinct()
        .collect()
    ]
    bits, m = _build_bloom(eval_hashes)

    q = run_to_memory_sink(
        quality_gate_stream(stream_documents_from_dir(spark, path), bits, m),
        "quality_gate_test",
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.passes_gopher, r.maybe_contaminated)
        for r in spark.table("quality_gate_test").collect()
    }

    want_gopher = {
        r.doc_id: r.passes_gopher
        for r in q_gopher_quality_rules(spark, SF_SMOKE).collect()
    }
    assert len(got) == len(want_gopher)
    assert {k: v[0] for k, v in got.items()} == want_gopher

    # exact contaminated set (train docs sharing a gram with eval) must be
    # a SUBSET of the Bloom-flagged docs — the no-false-negative guarantee
    grams = docs.select(
        "doc_id", _split_expr(F.col("doc_id")).alias("split"), F.explode(gh_arr).alias("gh")
    )
    exact_contam = {
        r.doc_id
        for r in grams.filter(F.col("split") == "train")
        .join(
            grams.filter(F.col("split") == "eval").select("gh").distinct(),
            "gh",
            "left_semi",
        )
        .select("doc_id")
        .distinct()
        .collect()
    }
    flagged = {k for k, v in got.items() if v[1]}
    assert exact_contam <= flagged
