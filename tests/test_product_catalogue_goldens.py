"""Product-catalogue goldens — the reference's second deployment
(`iceberg-PC.py:97`, `all_in_one_PC.py:155-167`:
dim_product_catalogue/category/price) replayed on the seeded schema via
Spark SQL, cross-checked against a DuckDB oracle over the same data, plus
an NL-layer replay (AnswerPipeline with a scripted model) so a user
pointing the chat surface at the PC database gets the telco-parity
treatment."""

from __future__ import annotations

import duckdb
import pytest

from local_llm_iceberg_cdw_spark.datagen.product_catalogue import generate_catalogue
from local_llm_iceberg_cdw_spark.plans.sql import execute_sql

TABLES = ["dim_product_category", "dim_product_catalogue", "dim_product_price"]


@pytest.fixture(scope="module")
def pc(spark):
    dfs = generate_catalogue(spark)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    con = duckdb.connect()
    for name, df in dfs.items():
        con.register(name, df.toPandas())
    return spark, con


# all_in_one_PC.py query_box placeholder — "List all products"
GOLDEN_LIST_PRODUCTS = """
SELECT product_id, product_name, brand FROM dim_product_catalogue
ORDER BY product_id LIMIT 50
"""

# three-table join: current price per product with its category
GOLDEN_CURRENT_PRICES = """
SELECT c.product_name, cat.category_name, p.price
FROM dim_product_catalogue c
JOIN dim_product_category cat ON c.category_id = cat.category_id
JOIN dim_product_price p ON p.product_id = c.product_id
WHERE p.valid_to IS NULL
ORDER BY c.product_id
"""

# aggregate over the join: average current price by parent category
GOLDEN_AVG_BY_PARENT = """
SELECT cat.parent_category, ROUND(AVG(p.price), 2) AS avg_price,
       COUNT(*) AS n_products
FROM dim_product_catalogue c
JOIN dim_product_category cat ON c.category_id = cat.category_id
JOIN dim_product_price p ON p.product_id = c.product_id
WHERE p.valid_to IS NULL AND c.is_active
GROUP BY cat.parent_category ORDER BY cat.parent_category
"""

# effective-dated lookup: the price in force on a fixed past date
GOLDEN_ASOF_PRICE = """
SELECT COUNT(*) AS n, ROUND(SUM(price), 2) AS total
FROM dim_product_price
WHERE valid_from <= DATE '2024-06-01'
  AND (valid_to IS NULL OR valid_to > DATE '2024-06-01')
"""


@pytest.mark.parametrize(
    "sql",
    [GOLDEN_LIST_PRODUCTS, GOLDEN_CURRENT_PRICES, GOLDEN_AVG_BY_PARENT, GOLDEN_ASOF_PRICE],
)
def test_golden_matches_duckdb(pc, sql):
    spark, con = pc
    srows = [tuple(r) for r in execute_sql(spark, sql).collect()]
    orows = [tuple(r) for r in con.execute(sql).fetchall()]
    assert sorted(map(repr, srows)) == sorted(map(repr, orows))
    assert srows  # non-degenerate


def test_every_product_has_exactly_one_current_price(pc):
    """Generator invariant: the SCD-2 price dimension always carries one
    open (valid_to NULL) row per product."""
    spark, _ = pc
    bad = execute_sql(
        spark,
        """
        SELECT COUNT(*) FROM (
          SELECT product_id FROM dim_product_price
          WHERE valid_to IS NULL GROUP BY product_id HAVING COUNT(*) <> 1
        )
        """,
    ).collect()[0][0]
    n_products = execute_sql(
        spark, "SELECT COUNT(DISTINCT product_id) FROM dim_product_price"
    ).collect()[0][0]
    assert bad == 0 and n_products == 120


def test_nl_layer_replay_on_pc_schema(pc):
    """The chat surface (AnswerPipeline) answers a PC-domain question
    end-to-end: scripted SQL generation → spark.sql over the PC views →
    plot decision → summary, mirroring the telco NL replay."""
    from local_llm_iceberg_cdw_spark.nl.chain import AnswerPipeline, MockLLM

    spark, con = pc
    sql = (
        "SELECT cat.parent_category, COUNT(*) AS n FROM dim_product_catalogue c "
        "JOIN dim_product_category cat ON c.category_id = cat.category_id "
        "GROUP BY cat.parent_category ORDER BY cat.parent_category"
    )
    llm = MockLLM(
        [
            f"```sql\n{sql};\n```",
            '{"plottable": true, "chart_type": "bar", "title": "Products by area", '
            '"x_label": "parent_category", "y_label": "products"}',
            "Devices dominate the catalogue, followed by plans and accessories.",
        ]
    )
    pipe = AnswerPipeline(
        spark, llm, table_info="dim_product_catalogue(...), dim_product_category(...)"
    )
    ans = pipe.run("How many products do we sell per business area?")
    assert not ans.error
    assert ans.plot.plottable and ans.plot.chart_type == "bar"
    orows = [tuple(r) for r in con.execute(sql).fetchall()]
    assert sorted(map(repr, (tuple(r) for r in ans.rows))) == sorted(map(repr, orows))
