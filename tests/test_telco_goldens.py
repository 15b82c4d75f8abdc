"""Telco-domain golden queries (SURVEY §5 item 3): the reference's
demonstrated/placeholder questions replayed on the seeded telco schema via
Spark SQL, cross-checked against a DuckDB oracle over the same data."""

from __future__ import annotations

import duckdb
import pytest

from local_llm_iceberg_cdw_spark.datagen.telco import generate_initial
from local_llm_iceberg_cdw_spark.plans.sql import execute_sql

TABLES = ["customers", "plans", "subscriptions", "usage_records", "recharges"]


@pytest.fixture(scope="module")
def telco(spark):
    dfs = generate_initial(spark)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    con = duckdb.connect()
    for name, df in dfs.items():
        con.register(name, df.toPandas())
    return spark, con


# README.md:75-79 — "How many customers are subscribed to postpaid plans?"
GOLDEN_POSTPAID = """
SELECT COUNT(*) AS n FROM customers
JOIN subscriptions ON customers.customer_id = subscriptions.customer_id
WHERE subscriptions.plan_id IN (SELECT plan_id FROM plans WHERE plan_type = 'Postpaid')
"""

# README.md:113-117 — registration-date range count
GOLDEN_REGDATE = """
SELECT COUNT(*) AS n FROM customers WHERE registration_date >= '2024-06-01'
"""

# app-gradio.py:114 — "Compare total revenue between prepaid and postpaid plans"
GOLDEN_REVENUE = """
SELECT p.plan_type, ROUND(SUM(p.monthly_fee), 2) AS total_revenue,
       COUNT(*) AS n_subscriptions
FROM subscriptions s JOIN plans p ON s.plan_id = p.plan_id
WHERE s.status = 'Active'
GROUP BY p.plan_type ORDER BY p.plan_type
"""


@pytest.mark.parametrize("sql", [GOLDEN_POSTPAID, GOLDEN_REGDATE, GOLDEN_REVENUE])
def test_golden_matches_duckdb(telco, sql):
    spark, con = telco
    srows = [tuple(r) for r in execute_sql(spark, sql).collect()]
    orows = [tuple(r) for r in con.execute(sql).fetchall()]
    assert sorted(map(repr, srows)) == sorted(map(repr, orows))


def test_postpaid_count_positive(telco):
    spark, _ = telco
    n = execute_sql(spark, GOLDEN_POSTPAID).collect()[0][0]
    assert 0 < n <= 200


def test_revenue_has_both_plan_types(telco):
    spark, _ = telco
    rows = execute_sql(spark, GOLDEN_REVENUE).collect()
    assert [r.plan_type for r in rows] == ["Postpaid", "Prepaid"]
    assert all(r.total_revenue > 0 for r in rows)


def test_recharges_only_prepaid_customers(telco):
    """Generator invariant from create_iceberg.py:87-88."""
    spark, _ = telco
    bad = execute_sql(
        spark,
        """
        SELECT COUNT(*) FROM recharges r
        WHERE r.customer_id NOT IN (
          SELECT s.customer_id FROM subscriptions s
          JOIN plans p ON s.plan_id = p.plan_id WHERE p.plan_type = 'Prepaid')
        """,
    ).collect()[0][0]
    assert bad == 0


def test_unlimited_plan_null_allowances(telco):
    spark, _ = telco
    row = execute_sql(
        spark, "SELECT data_allowance_gb, voice_minutes, sms_allowance FROM plans WHERE plan_id = 6"
    ).collect()[0]
    assert row == (None, None, None)
