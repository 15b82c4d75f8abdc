"""CSV ingestion (S4/S5) — the reference's Spark-native path: stage CSVs,
read with header+inferSchema, correct types with explicit casts, append
as one snapshot (append_telco_spark_iceberg.py:40-67)."""

from __future__ import annotations

from pyspark.sql import functions as F

from local_llm_iceberg_cdw_spark.catalog import load_table, read_csv_with_casts
from local_llm_iceberg_cdw_spark.datagen.telco import generate_initial
from local_llm_iceberg_cdw_spark.formats.snapshot_parquet import Namespace
from local_llm_iceberg_cdw_spark.nl.chain import format_rows_markdown

from conftest import SF_SMOKE


def test_csv_roundtrip_with_casts(spark, tmp_path):
    src = generate_initial(spark)["customers"]
    csv_dir = str(tmp_path / "customers_csv")
    # stage: dates serialized as strings (S5)
    src.withColumn("registration_date", F.date_format("registration_date", "yyyy-MM-dd")).write.option(
        "header", "true"
    ).csv(csv_dir)
    # load: infer + explicit cast back to DATE (S4/P7)
    back = read_csv_with_casts(spark, csv_dir, date_cols={"registration_date": "yyyy-MM-dd"})
    assert dict(back.dtypes)["registration_date"] == "date"
    assert back.count() == src.count()
    a = {r.customer_id: r.registration_date for r in src.collect()}
    b = {r.customer_id: r.registration_date for r in back.collect()}
    assert a == b


def test_csv_to_snapshot_append_pipeline(spark, tmp_path):
    """Full reference pipeline: CSV → cast → append → verify count
    (append_telco_spark_iceberg.py:64-72)."""
    src = generate_initial(spark)["usage_records"].limit(500)
    csv_dir = str(tmp_path / "usage_csv")
    src.withColumn("usage_date", F.date_format("usage_date", "yyyy-MM-dd HH:mm:ss")).write.option(
        "header", "true"
    ).csv(csv_dir)
    loaded = read_csv_with_casts(
        spark, csv_dir, timestamp_cols={"usage_date": "yyyy-MM-dd HH:mm:ss"}
    )
    ns = Namespace(spark, str(tmp_path / "wh"), "ingest")
    t = ns.table("usage_records")
    t.create(loaded)
    t.append(loaded)
    assert t.read().count() == 2 * loaded.count()
    assert len(t._load()) == 2  # one snapshot per append


def test_markdown_rendering():
    md = format_rows_markdown(["a", "b"], [(1, "x"), (2, None)])
    assert md.splitlines()[0] == "| a | b |"
    assert "| 2 |  |" in md
    assert format_rows_markdown(["a"], []) == "_no matching records_"
    long = format_rows_markdown(["a"], [(i,) for i in range(60)])
    assert "10 more rows" in long


def test_jsonl_roundtrip_documents(spark, tmp_path):
    """JSONL sink → source round-trip preserves rows and schema (S5/S4
    analog for the document-corpus interchange format)."""
    from local_llm_iceberg_cdw_spark.sources import read_jsonl, write_jsonl

    src = load_table(spark, SF_SMOKE, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(src, path)
    back = read_jsonl(spark, path, src.schema)
    assert back.schema == src.schema
    a = sorted(tuple(r) for r in src.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_register_views_degrades_per_table(spark, tmp_path):
    """Harness fault-tolerance: one broken/missing table loses that one
    view, not the whole registration (round-3 lost a full bench to this)."""
    import shutil as _sh

    import pytest

    from local_llm_iceberg_cdw_spark.catalog import register_views

    part_dir = str(tmp_path / "partial_sf")
    _sh.copytree(SF_SMOKE, part_dir, ignore=_sh.ignore_patterns("customer.parquet"))
    failed = register_views(spark, part_dir, ["region", "customer"])
    assert set(failed) == {"customer"}
    assert spark.table("region").count() > 0  # good table still registered
    with pytest.raises(Exception):
        register_views(spark, part_dir, ["region", "customer"], strict=True)


def test_load_table_events_rejects_schema_drift(spark, tmp_path):
    """events.ts in an unexpected physical type fails loudly (TypeError),
    never a silent blind cast."""
    import pytest

    from local_llm_iceberg_cdw_spark.catalog import load_table

    drift_dir = str(tmp_path / "drift_sf")
    import os as _os

    _os.makedirs(drift_dir)
    spark.createDataFrame([("1.5",), ("2.5",)], "ts string").write.parquet(
        f"{drift_dir}/events.parquet"
    )
    with pytest.raises(TypeError, match="unexpected type"):
        load_table(spark, drift_dir, "events")


def test_jsonl_corrupt_records_are_captured(spark, tmp_path):
    """PERMISSIVE mode routes malformed lines to the corrupt column
    instead of failing the job."""
    import pyspark.sql.types as T

    from local_llm_iceberg_cdw_spark.sources import read_jsonl

    p = tmp_path / "mixed.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\n{not json at all\n{"doc_id": 2, "text": "fine"}\n')
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    df = read_jsonl(spark, str(p), schema, corrupt_column="_bad")
    rows = df.collect()
    assert len(rows) == 3
    assert sum(r._bad is not None for r in rows) == 1
    assert {r.doc_id for r in rows if r._bad is None} == {1, 2}


def test_orc_roundtrip_preserves_schema_and_values(spark, tmp_path):
    """ORC sink -> source round-trip: schema (names + types) and values
    survive; the explicit-schema read pins types against writer drift."""
    from local_llm_iceberg_cdw_spark.catalog import load_table
    from local_llm_iceberg_cdw_spark.sources import read_orc, write_orc

    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "docs_orc")
    write_orc(docs, out)

    back = read_orc(spark, out, schema=docs.schema)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    a = {r.doc_id: r.text for r in docs.collect()}
    b = {r.doc_id: r.text for r in back.collect()}
    assert a == b


def test_orc_scan_pushes_filters(spark, tmp_path):
    """The ORC scan must show PushedFilters for a doc_id predicate —
    stripe-level pruning at scale rides on this."""
    from local_llm_iceberg_cdw_spark.catalog import load_table
    from local_llm_iceberg_cdw_spark.sources import read_orc, write_orc

    out = str(tmp_path / "docs_orc")
    write_orc(load_table(spark, SF_SMOKE, "documents"), out)
    df = read_orc(spark, out).filter("doc_id < 10").select("doc_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "doc_id" in plan.split("PushedFilters")[1][:80], plan
    assert df.count() == 10
