"""Seeded telco star-schema generator — reference semantics, deterministic.

Mirrors the reference's Faker-based generators
(``/root/reference/create_iceberg.py:19-104``) and append batches
(``append_iceberg.py:25-101``) with a fixed seed and no external deps:

- customers(customer_id, name, email, phone_number, address,
  registration_date) — sequential ids; append continues from MAX
  (``append_iceberg.py:104-123``).
- plans — the 6 fixed rows incl. the all-NULL-allowance "unlimited" plan
  (``create_iceberg.py:36-43``).
- subscriptions — 1:1 customer, plan uniform 1..6, status Active/Inactive/
  Suspended weighted 8:1:1, end_date NULL unless Inactive
  (``create_iceberg.py:47-66``).
- usage_records — per-customer timestamps, data 10–1024 MB 2dp, voice
  0–60, sms 0–20 (``create_iceberg.py:68-82``).
- recharges — prepaid customers only, amount ∈ {10,20,30,50,100}
  (``create_iceberg.py:84-104``).

Row counts default to the reference's (200/6/200/5000/1000 initial;
+50/+50/+1000/+200 append, ``append_iceberg.py:182-184``).
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PLAN_ROWS = [
    (1, "Basic Prepaid", "Prepaid", 10.0, 5, 100, 50),
    (2, "Standard Prepaid", "Prepaid", 20.0, 15, 300, 150),
    (3, "Premium Prepaid", "Prepaid", 35.0, 40, 600, 300),
    (4, "Basic Postpaid", "Postpaid", 30.0, 25, 500, 250),
    (5, "Standard Postpaid", "Postpaid", 50.0, 60, 1000, 500),
    (6, "Unlimited Postpaid", "Postpaid", 80.0, None, None, None),
]

STATUS_CHOICES = ["Active"] * 8 + ["Inactive", "Suspended"]
PAYMENT_METHODS = ["Credit Card", "Debit Card", "Online Wallet", "Voucher"]
RECHARGE_AMOUNTS = [10.0, 20.0, 30.0, 50.0, 100.0]

EPOCH = dt.date(2025, 1, 1)  # deterministic "today" for reproducible dates


def _rand_date(rng: random.Random, back_days: int) -> dt.date:
    return EPOCH - dt.timedelta(days=rng.randint(0, back_days))


def _rand_ts(rng: random.Random, back_days: int) -> dt.datetime:
    return dt.datetime.combine(
        _rand_date(rng, back_days), dt.time(rng.randint(0, 23), rng.randint(0, 59), rng.randint(0, 59))
    )


def generate_customers(n: int, start_id: int = 1, seed: int = 42, back_days: int = 365 * 5) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = [
        {
            "customer_id": start_id + i,
            "name": f"Customer {start_id + i:05d}",
            "email": f"user{start_id + i:05d}@example.com",
            "phone_number": f"+1-555-{rng.randint(1000000, 9999999)}",
            "address": f"{rng.randint(1, 999)} Main St, Town {rng.randint(1, 99)}",
            "registration_date": _rand_date(rng, back_days),
        }
        for i in range(n)
    ]
    return pd.DataFrame(rows)


def generate_plans() -> pd.DataFrame:
    df = pd.DataFrame(
        PLAN_ROWS,
        columns=["plan_id", "plan_name", "plan_type", "monthly_fee",
                 "data_allowance_gb", "voice_minutes", "sms_allowance"],
    )
    for c in ("data_allowance_gb", "voice_minutes", "sms_allowance"):
        df[c] = df[c].astype("Int64")  # nullable ints (plan 6 is NULL)
    return df


def generate_subscriptions(customer_ids: list[int], start_id: int = 1, seed: int = 43) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for i, cid in enumerate(customer_ids):
        status = rng.choice(STATUS_CHOICES)
        start = _rand_date(rng, 365 * 2)
        rows.append(
            {
                "subscription_id": start_id + i,
                "customer_id": cid,
                "plan_id": rng.randint(1, 6),
                "start_date": start,
                "end_date": start + dt.timedelta(days=rng.randint(30, 365)) if status == "Inactive" else None,
                "status": status,
            }
        )
    return pd.DataFrame(rows)


def generate_usage(customer_ids: list[int], n: int, start_id: int = 1, seed: int = 44) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = [
        {
            "usage_id": start_id + i,
            "customer_id": rng.choice(customer_ids),
            "usage_date": _rand_ts(rng, 365),
            "data_used_mb": round(rng.uniform(10, 1024), 2),
            "voice_minutes_used": rng.randint(0, 60),
            "sms_sent": rng.randint(0, 20),
        }
        for i in range(n)
    ]
    return pd.DataFrame(rows)


def generate_recharges(
    subscriptions: pd.DataFrame, n: int, start_id: int = 1, seed: int = 45
) -> pd.DataFrame:
    """Prepaid customers only (create_iceberg.py:87-88)."""
    prepaid_plan_ids = {p[0] for p in PLAN_ROWS if p[2] == "Prepaid"}
    prepaid_customers = sorted(
        subscriptions[subscriptions["plan_id"].isin(prepaid_plan_ids)]["customer_id"].tolist()
    )
    rng = random.Random(seed)
    rows = [
        {
            "recharge_id": start_id + i,
            "customer_id": rng.choice(prepaid_customers),
            "recharge_date": _rand_date(rng, 365),
            "amount": rng.choice(RECHARGE_AMOUNTS),
            "payment_method": rng.choice(PAYMENT_METHODS),
        }
        for i in range(n)
    ]
    return pd.DataFrame(rows)


TELCO_SCHEMAS = {
    "customers": (
        "customer_id int, name string, email string, phone_number string, "
        "address string, registration_date date"
    ),
    "plans": (
        "plan_id int, plan_name string, plan_type string, monthly_fee double, "
        "data_allowance_gb int, voice_minutes int, sms_allowance int"
    ),
    "subscriptions": (
        "subscription_id int, customer_id int, plan_id int, start_date date, "
        "end_date date, status string"
    ),
    "usage_records": (
        "usage_id int, customer_id int, usage_date timestamp, data_used_mb double, "
        "voice_minutes_used int, sms_sent int"
    ),
    "recharges": (
        "recharge_id int, customer_id int, recharge_date date, amount double, "
        "payment_method string"
    ),
}


def generate_initial(spark: SparkSession, scale: int = 1) -> dict[str, DataFrame]:
    """The reference's initial load: 200 customers / 6 plans / 200 subs /
    5000 usage / 1000 recharges (create_iceberg.py:227-231), × scale."""
    customers = generate_customers(200 * scale)
    plans = generate_plans()
    subs = generate_subscriptions(customers["customer_id"].tolist())
    usage = generate_usage(customers["customer_id"].tolist(), 5000 * scale)
    recharges = generate_recharges(subs, 1000 * scale)
    pdfs = {
        "customers": customers,
        "plans": plans,
        "subscriptions": subs,
        "usage_records": usage,
        "recharges": recharges,
    }
    return {
        name: spark.createDataFrame(pdf, schema=TELCO_SCHEMAS[name]) for name, pdf in pdfs.items()
    }


def generate_append(
    spark: SparkSession, max_ids: dict[str, int], n_customers: int = 50
) -> dict[str, DataFrame]:
    """The reference's append batch (+50 customers / +50 subs / +1000 usage /
    +200 recharges), continuing each id from MAX (append_iceberg.py:104-123)."""
    customers = generate_customers(n_customers, start_id=max_ids["customers"] + 1, seed=52, back_days=30)
    cids = customers["customer_id"].tolist()
    subs = generate_subscriptions(cids, start_id=max_ids["subscriptions"] + 1, seed=53)
    usage = generate_usage(cids, 1000, start_id=max_ids["usage_records"] + 1, seed=54)
    recharges = generate_recharges(subs, 200, start_id=max_ids["recharges"] + 1, seed=55)
    pdfs = {
        "customers": customers,
        "subscriptions": subs,
        "usage_records": usage,
        "recharges": recharges,
    }
    return {
        name: spark.createDataFrame(pdf, schema=TELCO_SCHEMAS[name]) for name, pdf in pdfs.items()
    }
