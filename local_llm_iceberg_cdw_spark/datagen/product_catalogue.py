"""Seeded product-catalogue schema generator — the reference's SECOND
deployment, deterministic.

The reference ships two NL→SQL deployments: the telco star schema
(``create_iceberg.py``) and a product-catalogue database
(``/root/reference/iceberg-PC.py:97``, ``all_in_one_PC.py:155-167``:
database ``mbb_product_catalogue``, tables ``dim_product_catalogue`` /
``dim_product_category`` / ``dim_product_price``).  The reference
publishes only the table NAMES for this schema — the data lives in its
warehouse — so the columns here are the minimal dimensional design its
demo questions ("List all products", joins across the three tables,
schema introspection via DESCRIBE) require:

- dim_product_category(category_id, category_name, parent_category) —
  a small two-level hierarchy.
- dim_product_catalogue(product_id, product_name, category_id, brand,
  sku, launch_date, is_active) — the product dimension; joins to
  category on category_id.
- dim_product_price(price_id, product_id, price, currency, valid_from,
  valid_to) — effective-dated prices (SCD-2 style): each product has a
  price history; the CURRENT price row has valid_to NULL.

Deterministic: fixed seed, fixed EPOCH, no external deps — the same
contract as ``datagen.telco``.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

CATEGORY_ROWS = [
    (1, "Smartphones", "Devices"),
    (2, "Tablets", "Devices"),
    (3, "Wearables", "Devices"),
    (4, "Broadband Routers", "Home Internet"),
    (5, "SIM-Only Plans", "Plans"),
    (6, "Device Bundles", "Plans"),
    (7, "Chargers & Cables", "Accessories"),
    (8, "Cases & Protection", "Accessories"),
]

BRANDS = ["Acme", "Borealis", "Cygnus", "Deltatech", "Everpeak"]

EPOCH = dt.date(2025, 1, 1)  # deterministic "today" (datagen.telco.EPOCH)


def generate_categories() -> pd.DataFrame:
    return pd.DataFrame(
        CATEGORY_ROWS, columns=["category_id", "category_name", "parent_category"]
    )


def generate_products(n: int = 120, start_id: int = 1, seed: int = 46) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        pid = start_id + i
        cat = rng.choice(CATEGORY_ROWS)
        brand = rng.choice(BRANDS)
        rows.append(
            {
                "product_id": pid,
                "product_name": f"{brand} {cat[1].rstrip('s')} {pid:04d}",
                "category_id": cat[0],
                "brand": brand,
                "sku": f"SKU-{cat[0]:02d}-{pid:05d}",
                "launch_date": EPOCH - dt.timedelta(days=rng.randint(0, 365 * 3)),
                "is_active": rng.random() < 0.9,
            }
        )
    return pd.DataFrame(rows)


def generate_prices(
    products: pd.DataFrame, start_id: int = 1, seed: int = 47
) -> pd.DataFrame:
    """1-3 effective-dated price rows per product; exactly one CURRENT row
    (valid_to NULL) each, later revisions are discounted or repriced."""
    rng = random.Random(seed)
    rows = []
    pid_counter = start_id
    for _, p in products.sort_values("product_id").iterrows():
        n_revisions = rng.randint(1, 3)
        base = round(rng.uniform(9.0, 1999.0), 2)
        start = p["launch_date"]
        for rev in range(n_revisions):
            is_last = rev == n_revisions - 1
            end = None if is_last else start + dt.timedelta(days=rng.randint(30, 240))
            rows.append(
                {
                    "price_id": pid_counter,
                    "product_id": int(p["product_id"]),
                    "price": round(base * (1 - 0.05 * rev), 2),
                    "currency": "USD",
                    "valid_from": start,
                    "valid_to": end,
                }
            )
            pid_counter += 1
            if not is_last:
                start = end
    return pd.DataFrame(rows)


PC_SCHEMAS = {
    "dim_product_category": "category_id int, category_name string, parent_category string",
    "dim_product_catalogue": (
        "product_id int, product_name string, category_id int, brand string, "
        "sku string, launch_date date, is_active boolean"
    ),
    "dim_product_price": (
        "price_id int, product_id int, price double, currency string, "
        "valid_from date, valid_to date"
    ),
}


def generate_catalogue(spark: SparkSession, n_products: int = 120) -> dict[str, DataFrame]:
    categories = generate_categories()
    products = generate_products(n_products)
    prices = generate_prices(products)
    pdfs = {
        "dim_product_category": categories,
        "dim_product_catalogue": products,
        "dim_product_price": prices,
    }
    return {
        name: spark.createDataFrame(pdf, schema=PC_SCHEMAS[name])
        for name, pdf in pdfs.items()
    }
