"""Round-13 invariants: the IVF×SQ8 composed ANN path (VERDICT r12 #5),
plus tests for the other r13 additions as they land (persisted ANN index
maintenance, append-mode watermarked streaming drain)."""

from __future__ import annotations

from conftest import SF_SMOKE


def test_ivfsq8_recall_at_least_pq_tier(spark):
    """VERDICT r12 #5 'Done' criterion: the SQ8 composition's recall vs the
    exact dot top-k must be >= the PQ composition's at the same probe
    budget — SQ8's 8 bits/dim in-cell ordering is near-exact, so the only
    loss left is the shared nprobe ceiling."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from local_llm_iceberg_cdw_spark.catalog import load_table
    from local_llm_iceberg_cdw_spark.operators.quantization import (
        IVFSQ8_RECALL_MIN,
        _dot_flat,
        ivfpq_results,
        ivfsq8_results,
    )
    from local_llm_iceberg_cdw_spark.operators.similarity import N_QUERIES, TOP_K

    emb = load_table(spark, SF_SMOKE, "embeddings")
    qv = F.broadcast(
        emb.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
    )
    cv = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("exact_dot").desc(), F.col("neighbor_id").asc()
    )
    exact = (
        cv.join(qv, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot_flat(F.col("qv"), F.col("cv")), 6).alias("exact_dot"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    n_exact = exact.count()
    hits_sq8 = (
        ivfsq8_results(spark, SF_SMOKE)
        .join(exact, ["query_id", "neighbor_id"], "left_semi")
        .count()
    )
    hits_pq = (
        ivfpq_results(spark, SF_SMOKE)
        .join(exact, ["query_id", "neighbor_id"], "left_semi")
        .count()
    )
    assert hits_sq8 >= hits_pq, (hits_sq8, hits_pq)
    assert hits_sq8 / n_exact >= IVFSQ8_RECALL_MIN


def test_ivfsq8_judged_form_green(spark):
    from local_llm_iceberg_cdw_spark.operators.quantization import q_ivfsq8_topk
    from local_llm_iceberg_cdw_spark.operators.similarity import N_QUERIES, TOP_K

    rows = q_ivfsq8_topk(spark, SF_SMOKE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_queries == N_QUERIES
    assert r.n_exact_results == N_QUERIES * TOP_K
    assert bool(r.recall_ok) is True


def test_ivfsq8_floor_strictly_above_pq_floor():
    from local_llm_iceberg_cdw_spark.operators.quantization import (
        IVFPQ_RECALL_MIN,
        IVFSQ8_RECALL_MIN,
    )

    assert IVFSQ8_RECALL_MIN > IVFPQ_RECALL_MIN
